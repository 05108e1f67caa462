"""Physical sanity of the MD loop: momentum conservation (Newton pairs)
and approximate energy conservation with a soft potential."""

import jax.numpy as jnp
import numpy as np
import pytest

from zelll_tpu.core import build
from zelll_tpu.models.lj_md import MDState, md_step
from zelll_tpu.ops.lj import lj_force_factor
from zelll_tpu.ops.pallas_pairs import pair_lag_forces


def test_forces_sum_to_zero():
    # Newton's third law: total force vanishes
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 1, size=(400, 3)) * np.array([3.0, 3.0, 20.0]) + 0.05
    grid = build(jnp.asarray(pts), 1.0)
    f = pair_lag_forces(
        grid.sorted_pos, grid.bins.sorted_keys, grid.info.strides, 1.0,
        M=256, L=256, gfn=lj_force_factor, interpret=True,
    )
    total = np.asarray(jnp.sum(f, axis=0))
    scale = float(jnp.abs(f).max())
    np.testing.assert_allclose(total, 0.0, atol=1e-9 * max(scale, 1.0))


def test_md_momentum_conserved_over_steps():
    # jittered lattice: minimum separation ~0.8 so forces stay moderate
    # (uniform random points overlap, giving ~1e12 forces whose f64
    # cancellation noise swamps the check)
    rng = np.random.default_rng(1)
    g = np.stack(
        np.meshgrid(*[np.arange(6.0)] * 3, indexing="ij"), -1
    ).reshape(-1, 3) * 1.1
    pts = g + rng.uniform(-0.1, 0.1, g.shape)
    n = len(pts)
    vel = rng.normal(0, 0.05, (n, 3))
    p0 = vel.sum(axis=0)

    st = MDState(positions=jnp.asarray(pts), velocities=jnp.asarray(vel))
    for _ in range(10):
        st, ok = md_step(st, 1.2, 1e-5, M=256, L=256, interpret=True)
        assert bool(ok)
    p1 = np.asarray(jnp.sum(st.velocities, axis=0))
    np.testing.assert_allclose(p1, p0, rtol=0, atol=1e-10)


def test_md_energy_conserved_soft_start():
    # lattice start, small dt: total energy (KE + PE) drift stays tiny
    rng = np.random.default_rng(2)
    g = np.stack(
        np.meshgrid(*[np.arange(5.0)] * 3, indexing="ij"), -1
    ).reshape(-1, 3) * 1.12
    pts = g + rng.uniform(-0.05, 0.05, g.shape)
    n = len(pts)
    st = MDState(
        positions=jnp.asarray(pts),
        velocities=jnp.asarray(rng.normal(0, 0.05, (n, 3))),
    )

    from zelll_tpu.ops.fused import fused_lj_rebuild_energy

    def total_energy(s):
        pe, ok = fused_lj_rebuild_energy(
            s.positions, 1.2, M=256, L=256, interpret=True
        )
        ke = 0.5 * float(jnp.sum(s.velocities**2))
        assert bool(ok)
        return float(pe) + ke

    e0 = total_energy(st)
    for _ in range(20):
        st, ok = md_step(st, 1.2, 2e-4, M=256, L=256, interpret=True)
    e1 = total_energy(st)
    assert abs(e1 - e0) / abs(e0) < 5e-3, (e0, e1)


def _total_energy(st, cutoff):
    from zelll_tpu.ops.fused import fused_lj_rebuild_energy

    pe, ok = fused_lj_rebuild_energy(
        st.positions, cutoff, M=256, L=256, interpret=True
    )
    assert bool(ok)
    ke = 0.5 * float(jnp.sum(st.velocities**2))
    return float(pe) + ke


def test_vv_energy_drift_beats_euler():
    """Velocity Verlet (md_run_vv) is 2nd-order symplectic: at the same
    one-force-eval-per-step cost its energy error is O(dt^2) vs the
    semi-implicit Euler loop's O(dt). Fixture: a compact 27-atom cluster
    whose pairs all stay inside the cutoff (crossing the truncated,
    unshifted cutoff jumps the energy by lj(cutoff) — a potential
    discontinuity, not integrator error — which would swamp the check)."""
    from zelll_tpu.models.lj_md import md_run, md_run_vv

    rng = np.random.default_rng(3)
    g = np.stack(
        np.meshgrid(*[np.arange(3.0)] * 3, indexing="ij"), -1
    ).reshape(-1, 3) * 1.12
    pts = g + rng.uniform(-0.03, 0.03, g.shape)
    vel = rng.normal(0, 0.1, pts.shape)
    st0 = MDState(positions=jnp.asarray(pts), velocities=jnp.asarray(vel))
    cutoff, dt, steps = 5.0, 1e-3, 100
    e0 = _total_energy(st0, cutoff)

    st_e, ok_e, _ = md_run(st0, cutoff, dt, steps=steps, M=256, L=256,
                           interpret=True)
    st_v, ok_v, _ = md_run_vv(st0, cutoff, dt, steps=steps, M=256, L=256,
                              interpret=True)
    assert bool(ok_e) and bool(ok_v)
    drift_euler = abs(_total_energy(st_e, cutoff) - e0)
    drift_vv = abs(_total_energy(st_v, cutoff) - e0)
    # measured (f64 CPU): euler ~1.1e-2, vv ~2.5e-5 at this dt
    assert drift_vv < drift_euler / 10, (drift_vv, drift_euler)
    assert drift_vv < 2e-4


def test_vv_momentum_conserved():
    from zelll_tpu.models.lj_md import md_run_vv

    rng = np.random.default_rng(4)
    g = np.stack(
        np.meshgrid(*[np.arange(5.0)] * 3, indexing="ij"), -1
    ).reshape(-1, 3) * 1.1
    pts = g + rng.uniform(-0.05, 0.05, g.shape)
    vel = rng.normal(0, 0.05, pts.shape)
    p0 = vel.sum(axis=0)
    st0 = MDState(positions=jnp.asarray(pts), velocities=jnp.asarray(vel))
    st, ok, _ = md_run_vv(st0, 1.2, 1e-4, steps=20, M=256, L=256,
                          interpret=True)
    assert bool(ok)
    np.testing.assert_allclose(
        np.asarray(jnp.sum(st.velocities, axis=0)), p0, rtol=0, atol=1e-10
    )
