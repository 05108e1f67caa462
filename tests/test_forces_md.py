"""Forces lag kernel + MD loop correctness (interpret mode, CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from zelll_tpu.core import build
from zelll_tpu.models.lj_md import MDState, md_run, md_step
from zelll_tpu.ops.lj import lj_force_factor
from zelll_tpu.ops.pallas_pairs import pair_lag_forces, suggest_lag


def _brute_lj_forces(pts, cutoff):
    n = len(pts)
    d = pts[:, None, :] - pts[None, :, :]
    dsq = (d * d).sum(-1)
    mask = (dsq < cutoff**2) & ~np.eye(n, dtype=bool)
    inv = np.where(mask, 1.0 / np.where(mask, dsq, 1.0), 0.0)
    t = inv**3
    gf = np.where(mask, 24 * t * (2 * t - 1) * inv, 0.0)
    return (d * gf[..., None]).sum(axis=1)


@pytest.mark.parametrize("n,box,cutoff", [
    (900, (4.0, 4.0, 30.0), 1.0),
    (500, (8.0, 8.0, 8.0), 2.0),
    (257, (2.0, 2.0, 40.0), 1.5),  # odd n (tail-padding path)
])
def test_lag_forces_match_bruteforce(n, box, cutoff):
    rng = np.random.default_rng(n)
    pts = rng.uniform(0, 1, size=(n, 3)) * np.asarray(box)
    grid = build(jnp.asarray(pts), cutoff)
    L = suggest_lag(
        np.asarray(grid.bins.sorted_keys), np.asarray(grid.info.strides)
    )
    M = max(256, L)
    f = np.asarray(
        pair_lag_forces(
            grid.sorted_pos, grid.bins.sorted_keys, grid.info.strides,
            cutoff**2, M=M, L=L, gfn=lj_force_factor, interpret=True,
        )
    )
    f_ref = _brute_lj_forces(pts, cutoff)[np.asarray(grid.bins.perm)]
    scale = np.abs(f_ref).max() + 1e-30
    np.testing.assert_allclose(f, f_ref, rtol=1e-9, atol=1e-9 * scale)


def test_md_step_matches_manual_integration():
    rng = np.random.default_rng(1)
    n, cutoff, dt = 300, 1.0, 1e-5
    pts = rng.uniform(0, 1, size=(n, 3)) * np.array([3.0, 3.0, 12.0])
    vel = rng.normal(0, 0.1, (n, 3))

    st = MDState(positions=jnp.asarray(pts), velocities=jnp.asarray(vel))
    st2, ok = md_step(st, cutoff, dt, M=512, L=256, interpret=True)
    assert bool(ok)

    # the step operates in cell-key order with UNSPECIFIED tie order
    # (round 4: the hot sorts are unstable — ~15 ms faster at 1e7), so
    # map rows back by value: x2 - dt*v2 reconstructs the input position
    p2 = np.asarray(st2.positions)
    v2 = np.asarray(st2.velocities)
    orig = p2 - dt * v2
    d = ((orig[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    match = d.argmin(axis=1)
    assert len(set(match.tolist())) == n  # a bijection
    f = _brute_lj_forces(pts, cutoff)[match]
    v_ref = vel[match] + dt * f
    p_ref = pts[match] + dt * v_ref
    np.testing.assert_allclose(v2, v_ref, rtol=1e-9,
                               atol=1e-12 * max(1.0, np.abs(v_ref).max()))
    np.testing.assert_allclose(p2, p_ref, rtol=1e-9)


def test_md_run_conserves_particles_and_stays_covered():
    rng = np.random.default_rng(2)
    n, cutoff, dt = 256, 1.0, 1e-6
    # gentle gas: well-separated, tiny dt
    pts = rng.uniform(0, 1, size=(n, 3)) * np.array([8.0, 8.0, 8.0])
    st = MDState(
        positions=jnp.asarray(pts), velocities=jnp.zeros((n, 3))
    )
    st2, ok, energy = md_run(st, cutoff, dt, steps=5, M=512, L=512, interpret=True)
    assert bool(ok)
    assert np.isfinite(float(energy))
    assert st2.positions.shape == (n, 3)
    # particles barely moved with dt=1e-6
    assert float(jnp.abs(st2.positions).max()) < 20.0


def test_md_run_skin_matches_full_rebuild():
    """Verlet-skin grid reuse computes the same trajectory as rebuilding
    every step (same pair sets while the drift invariant holds), while
    actually skipping rebuilds."""
    from zelll_tpu.models.lj_md import md_run_skin

    rng = np.random.default_rng(3)
    cutoff, dt, steps = 1.0, 2e-4, 12
    # perturbed lattice at spacing 1.15: no overlapping pairs, mild forces,
    # so per-step drift stays far below skin/2
    g = np.stack(
        np.meshgrid(*(np.arange(s) for s in (3, 3, 32)), indexing="ij"), -1
    ).reshape(-1, 3) * 1.15
    pts = g + rng.uniform(-0.03, 0.03, g.shape)
    n = len(pts)
    vel = rng.normal(0, 0.05, (n, 3))
    st0 = MDState(positions=jnp.asarray(pts), velocities=jnp.asarray(vel))

    st_ref, ok_ref, e_ref = md_run(
        st0, cutoff, dt, steps=steps, M=512, L=512, interpret=True
    )
    st_skin, ok, e, nrb = md_run_skin(
        st0, cutoff, dt, steps=steps, skin=0.4, M=512, L=512, interpret=True
    )
    assert bool(ok_ref) and bool(ok)
    # max drift per step ~ |v|*dt ~ 1e-4 << skin/2: the initial build must
    # survive all steps
    assert int(nrb) == 0
    np.testing.assert_allclose(float(e), float(e_ref), rtol=1e-9)
    # trajectories agree up to sorted-slot permutation: compare as row sets
    a = np.asarray(st_skin.positions)
    b = np.asarray(st_ref.positions)
    order = lambda x: x[np.lexsort((x[:, 2], x[:, 1], x[:, 0]))]
    np.testing.assert_allclose(order(a), order(b), rtol=1e-9, atol=1e-12)


def test_md_run_skin_rebuilds_on_drift():
    """With a tiny skin and real velocities the drift bound trips and the
    loop re-sorts — and the result still matches the full-rebuild loop."""
    from zelll_tpu.models.lj_md import md_run_skin

    rng = np.random.default_rng(4)
    n, cutoff, dt, steps = 200, 1.0, 5e-3, 10
    pts = rng.uniform(0, 1, size=(n, 3)) * np.array([3.0, 3.0, 15.0])
    vel = rng.normal(0, 1.0, (n, 3))
    st0 = MDState(positions=jnp.asarray(pts), velocities=jnp.asarray(vel))

    st_ref, ok_ref, e_ref = md_run(
        st0, cutoff, dt, steps=steps, M=512, L=512, interpret=True
    )
    st_skin, ok, e, nrb = md_run_skin(
        st0, cutoff, dt, steps=steps, skin=0.05, M=512, L=512, interpret=True
    )
    assert bool(ok_ref) and bool(ok)
    assert int(nrb) >= 1  # drift bound actually trips
    np.testing.assert_allclose(float(e), float(e_ref), rtol=1e-9)


def test_md_step_cubic():
    from zelll_tpu.models.lj_md import md_step_cubic

    rng = np.random.default_rng(7)
    n = 400
    pts = rng.uniform(0, 1, size=(n, 3)) * 10.0  # cubic
    vel = rng.normal(0, 0.05, (n, 3))
    st = MDState(positions=jnp.asarray(pts), velocities=jnp.asarray(vel))
    st2, ok = md_step_cubic(st, 1.0, 1e-6, T=4, M=512, L=512, interpret=True)
    assert bool(ok)

    f_ref = _brute_lj_forces(pts, 1.0)
    v_ref = vel + 1e-6 * f_ref
    np.testing.assert_allclose(np.asarray(st2.velocities), v_ref, rtol=1e-9,
                               atol=1e-12 * max(1.0, np.abs(v_ref).max()))
    np.testing.assert_allclose(
        np.asarray(st2.positions), pts + 1e-6 * v_ref, rtol=1e-9
    )


def test_md_step_cubic_tile_matches_md_step_cubic():
    """Tile-kernel cubic MD step conserves the same dynamics as the column
    path: one step from identical states must agree (orders differ — the
    tile step returns sorted order; compare as sets via lexsort)."""
    import numpy as np
    from zelll_tpu.models.lj_md import MDState, md_step_cubic, md_step_cubic_tile

    rng = np.random.default_rng(17)
    n, cutoff, dt = 600, 1.0, 1e-4
    pts = rng.uniform(0, 1, (n, 3)) * 8.0
    vel = rng.normal(0, 0.1, (n, 3))
    st = MDState(jnp.asarray(pts, jnp.float32), jnp.asarray(vel, jnp.float32))

    s1, ok1 = md_step_cubic(st, cutoff, dt, interpret=True)
    s2, ok2 = md_step_cubic_tile(st, cutoff, dt, CB=2, MAXJ=6, interpret=True)
    assert bool(ok1) and bool(ok2)

    def canon(s):
        a = np.concatenate([np.asarray(s.positions), np.asarray(s.velocities)], 1)
        return a[np.lexsort(a.T[::-1])]

    np.testing.assert_allclose(canon(s1), canon(s2), rtol=2e-4, atol=2e-6)


def test_md_run_skin_tile_matches_skin_lag():
    """The cubic steady-state loop (tile forces + skin reuse) must track
    the lag-kernel skin loop: same trajectory (up to slot permutation),
    same energy, and the drift bound actually trips with a tiny skin.
    (A perturbed lattice, not uniform random: overlapping pairs make the
    trajectory explode and the key space overflow — which the coverage
    flag correctly refuses.)"""
    from zelll_tpu.models.lj_md import md_run_skin, md_run_skin_tile

    rng = np.random.default_rng(23)
    cutoff, dt, steps = 1.0, 2e-3, 8
    g = np.stack(
        np.meshgrid(*(np.arange(7),) * 3, indexing="ij"), -1
    ).reshape(-1, 3) * 1.15  # cubic lattice, no overlaps
    pts = g + rng.uniform(-0.03, 0.03, g.shape)
    vel = rng.normal(0, 0.3, pts.shape)
    st0 = MDState(positions=jnp.asarray(pts), velocities=jnp.asarray(vel))

    st_ref, ok_ref, e_ref, nrb_ref = md_run_skin(
        st0, cutoff, dt, steps=steps, skin=0.3, M=512, L=512, interpret=True
    )
    st_t, ok_t, e_t, nrb_t = md_run_skin_tile(
        st0, cutoff, dt, steps=steps, skin=0.3, CB=2, MAXJ=8, interpret=True
    )
    assert bool(ok_ref) and bool(ok_t)
    np.testing.assert_allclose(float(e_t), float(e_ref), rtol=1e-9)
    order = lambda x: x[np.lexsort((x[:, 2], x[:, 1], x[:, 0]))]
    np.testing.assert_allclose(
        order(np.asarray(st_t.positions)),
        order(np.asarray(st_ref.positions)),
        rtol=1e-8, atol=1e-11,
    )

    # tiny skin: rebuilds must actually fire and results must still agree
    st_t2, ok2, e2, nrb2 = md_run_skin_tile(
        st0, cutoff, dt, steps=steps, skin=0.02, CB=2, MAXJ=8, interpret=True
    )
    assert bool(ok2) and int(nrb2) >= 1
    np.testing.assert_allclose(float(e2), float(e_ref), rtol=1e-9)
