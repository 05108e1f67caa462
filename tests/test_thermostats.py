"""NVT thermostats (interpret-mode kernels on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from zelll_tpu.models.lj_md import MDState, md_run
from zelll_tpu.models.thermostats import (
    berendsen_rescale,
    kinetic_temperature,
    md_run_langevin,
    ou_step,
)


def lattice(k=6, spacing=1.2, jitter=0.02, seed=0):
    rng = np.random.default_rng(seed)
    g = np.stack(
        np.meshgrid(*([np.arange(k)] * 3), indexing="ij"), -1
    ).reshape(-1, 3)
    pts = g * spacing + 0.5 * spacing
    pts += rng.uniform(-jitter, jitter, pts.shape) * spacing
    return pts


def test_zero_gamma_reduces_to_nve():
    pts = lattice()
    vel = np.random.default_rng(1).normal(0, 0.05, pts.shape)
    st0 = MDState(
        positions=jnp.asarray(pts, jnp.float32),
        velocities=jnp.asarray(vel, jnp.float32),
    )
    cutoff, dt, steps = 1.5, 1e-3, 5
    key = jax.random.PRNGKey(0)
    st_nvt, ok1 = md_run_langevin(
        st0, cutoff, dt, kT=0.1, gamma=0.0, key=key, steps=steps,
        interpret=True,
    )
    st_nve, ok2, _ = md_run(st0, cutoff, dt, steps=steps, interpret=True)
    assert bool(ok1) and bool(ok2)
    np.testing.assert_array_equal(
        np.asarray(st_nvt.positions), np.asarray(st_nve.positions)
    )


def test_ou_step_statistics():
    """The exact OU step equilibrates a large ensemble to kT."""
    key = jax.random.PRNGKey(42)
    v = jnp.zeros((20000, 3), jnp.float32)
    kT, gamma, dt = 0.35, 2.0, 0.5
    for i in range(40):
        v = ou_step(v, jax.random.fold_in(key, i), kT, gamma, dt)
    t = float(kinetic_temperature(v))
    assert abs(t - kT) < 0.02 * kT


def test_langevin_thermalizes_lattice():
    """A cold LJ lattice heats to the target temperature under Langevin
    (loose band: small system, short run)."""
    pts = lattice(k=5, spacing=1.1)
    st0 = MDState(
        positions=jnp.asarray(pts, jnp.float32),
        velocities=jnp.zeros((len(pts), 3), jnp.float32),
    )
    kT = 0.05
    st, ok, temps = md_run_langevin(
        st0, 1.4, 2e-3, kT=kT, gamma=20.0, key=jax.random.PRNGKey(3),
        steps=120, interpret=True, record_temperature=True,
    )
    assert bool(ok)
    tail = float(np.mean(np.asarray(temps)[-30:]))
    # virial sharing with the potential keeps T near (not exactly at) kT
    assert 0.4 * kT < tail < 2.5 * kT
    assert np.all(np.isfinite(np.asarray(st.positions)))


def test_berendsen_rescale_direction():
    rng = np.random.default_rng(5)
    v = jnp.asarray(rng.normal(0, 1.0, (500, 3)), jnp.float32)
    t0 = float(kinetic_temperature(v))
    v2 = berendsen_rescale(v, kT_target=0.5 * t0, tau=10.0, dt=1.0)
    t2 = float(kinetic_temperature(v2))
    assert t2 < t0  # cooling toward the target
    v3 = berendsen_rescale(v, kT_target=2.0 * t0, tau=10.0, dt=1.0)
    assert float(kinetic_temperature(v3)) > t0
