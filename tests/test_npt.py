"""NPT barostat (models.thermostats.md_run_npt) behavior tests.

An extension beyond the reference (zelll leaves simulation to the caller);
correctness criteria are physical: the Berendsen box rescale moves the
instantaneous virial pressure toward the target, beta=0 reduces exactly
to the NVE PBC trajectory, and positions stay wrapped."""

import jax.numpy as jnp
import numpy as np

from zelll_tpu.models.thermostats import berendsen_box_mu, md_run_npt
from zelll_tpu.ops.pbc import md_step_pbc


def make_gas(n=108, box=6.0, seed=0, v_scale=0.5):
    rng = np.random.default_rng(seed)
    # jittered lattice: no overlapping pairs, so LJ forces stay tame
    per = int(round(n ** (1 / 3)))
    g = (np.arange(per) + 0.5) * (box / per)
    pts = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)
    pts = pts[:n] + rng.uniform(-0.05, 0.05, size=(n, 3))
    vel = v_scale * rng.normal(size=(n, 3))
    vel -= vel.mean(0)
    return (
        jnp.asarray(pts),
        jnp.asarray(vel),
        jnp.zeros((3,)),
        jnp.full((3,), float(box)),
    )


def test_mu_direction_and_clip():
    # P above target -> expand (mu > 1); below -> shrink; clip bounds
    assert float(berendsen_box_mu(2.0, 1.0, 1.0, 0.01)) > 1.0
    assert float(berendsen_box_mu(0.5, 1.0, 1.0, 0.01)) < 1.0
    assert float(berendsen_box_mu(1e9, 1.0, 1.0, 1.0)) <= 1.02
    assert float(berendsen_box_mu(-1e9, 1.0, 1.0, 1.0)) >= 0.98
    # beta = 0 disables the barostat exactly
    assert float(berendsen_box_mu(5.0, 1.0, 1.0, 0.01, beta=0.0)) == 1.0


def test_npt_beta0_matches_nve_pbc():
    pos, vel, origin, box = make_gas()
    cutoff, dt, steps = 1.5, 1e-3, 5
    p1, v1, b1, ok = md_run_npt(
        pos, vel, origin, box, cutoff, dt, steps=steps,
        P_target=1.0, tau_p=1.0, beta=0.0,
        M=512, L=512, interpret=True,
    )
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(b1), np.asarray(box), rtol=0)
    p2, v2 = pos, vel
    for _ in range(steps):
        p2, v2, ok2 = md_step_pbc(
            p2, v2, origin, box, cutoff, dt, M=512, L=512, interpret=True
        )
        assert bool(ok2)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-12)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-12)


def test_npt_moves_pressure_toward_target():
    # hot dilute gas: kinetic pressure dominates and exceeds the target,
    # so the box must expand and the pressure must fall toward it
    pos, vel, origin, box = make_gas(v_scale=3.0)
    cutoff, dt = 1.5, 2e-3
    p, v, b, ok, rec = md_run_npt(
        pos, vel, origin, box, cutoff, dt, steps=40,
        P_target=0.05, tau_p=0.05, beta=1.0, record=True,
        M=512, L=512, interpret=True,
    )
    assert bool(ok)
    press = np.asarray(rec["pressure"])
    volume = np.asarray(rec["volume"])
    assert press[0] > 0.05
    assert volume[-1] > volume[0]          # expanded
    assert press[-1] < press[0]            # relaxing toward target
    # positions stay wrapped in the final box
    pn = np.asarray(p)
    assert (pn >= 0.0).all() and (pn <= np.asarray(b)).all()


def test_npt_thermostat_composes():
    pos, vel, origin, box = make_gas(v_scale=2.0, seed=1)
    cutoff, dt = 1.5, 1e-3
    kT = 0.25
    p, v, b, ok, rec = md_run_npt(
        pos, vel, origin, box, cutoff, dt, steps=30,
        P_target=0.2, tau_p=0.1, beta=1.0,
        kT_target=kT, tau_T=0.01, record=True,
        M=512, L=512, interpret=True,
    )
    assert bool(ok)
    temps = np.asarray(rec["temperature"])
    # strong coupling pulls the hot gas (T0 ~ 4) down toward kT
    assert abs(temps[-1] - kT) < abs(temps[0] - kT)
