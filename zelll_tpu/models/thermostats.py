"""Thermostats for the MD workloads: NVT sampling on device.

An extension beyond the reference (zelll leaves all simulation to the
caller, README.md:41-42); production MD needs temperature control and
every piece here is elementwise — it composes with any of the `lj_md`
step/run loops without touching the fused kernels.

Implemented (unit mass, k_B = 1 reduced units, matching the
dimensionless LJ of `benches/lj.rs:42-47`):

* **Langevin (leapfrog OBA splitting).** One exact
  Ornstein-Uhlenbeck "O" step ``v <- c1 v + c2 xi`` with
  ``c1 = exp(-gamma dt)``, ``c2 = sqrt((1 - c1^2) kT)`` before each
  force kick — `md_run_langevin` runs the whole NVT trajectory in one
  scan (full rebuild per step, like `md_run`). ``gamma = 0`` reduces
  exactly to the NVE `md_step` trajectory.
* **Berendsen weak-coupling rescale** ``v *= sqrt(1 + dt/tau (T0/T-1))``
  (`berendsen_rescale`) — not canonical, standard for equilibration.
* `kinetic_temperature` — the instantaneous NVT observable
  ``T = <|v|^2> / dim``.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .lj_md import MDState, md_step

__all__ = [
    "kinetic_temperature",
    "ou_step",
    "berendsen_rescale",
    "md_run_langevin",
]


def kinetic_temperature(velocities: jax.Array):
    """Instantaneous kinetic temperature (unit mass, k_B = 1):
    ``T = sum |v|^2 / (dim * n)``."""
    n, dim = velocities.shape
    return jnp.sum(velocities * velocities) / (dim * n)


def ou_step(velocities: jax.Array, key, kT, gamma, dt):
    """Exact Ornstein-Uhlenbeck velocity update (the Langevin "O" step):
    ``v <- exp(-gamma dt) v + sqrt((1 - exp(-2 gamma dt)) kT) xi``."""
    dtype = velocities.dtype
    c1 = jnp.exp(-jnp.asarray(gamma, dtype) * jnp.asarray(dt, dtype))
    c2 = jnp.sqrt(jnp.maximum(1.0 - c1 * c1, 0.0) * jnp.asarray(kT, dtype))
    xi = jax.random.normal(key, velocities.shape, dtype)
    return c1 * velocities + c2 * xi


def berendsen_rescale(velocities: jax.Array, kT_target, tau, dt):
    """Berendsen weak-coupling rescale toward ``kT_target`` with time
    constant ``tau`` (equilibration only — not a canonical ensemble)."""
    t_now = kinetic_temperature(velocities)
    lam = jnp.sqrt(
        jnp.maximum(1.0 + dt / tau * (kT_target / (t_now + 1e-30) - 1.0), 0.0)
    )
    return velocities * lam


@partial(
    jax.jit,
    static_argnames=("steps", "M", "L", "interpret", "record_temperature"),
)
def md_run_langevin(
    state: MDState,
    cutoff,
    dt,
    kT,
    gamma,
    key,
    *,
    steps: int,
    M: int = 4096,
    L: int = 256,
    interpret: bool = False,
    record_temperature: bool = False,
):
    """NVT Langevin trajectory fully on device: per step, one OU velocity
    update then one full-rebuild LJ leapfrog step (`md_step`). Returns
    (state, all_covered[, temperatures (steps,)]).

    ``key``: a `jax.random` PRNG key; per-step keys are folded in so the
    trajectory is reproducible under the same key."""

    def body(carry, i):
        st, okacc = carry
        k = jax.random.fold_in(key, i)
        vel = ou_step(st.velocities, k, kT, gamma, dt)
        st = MDState(positions=st.positions, velocities=vel)
        st, ok = md_step(st, cutoff, dt, M=M, L=L, interpret=interpret)
        out = kinetic_temperature(st.velocities) if record_temperature else None
        return (st, okacc & ok), out

    (state, ok), temps = jax.lax.scan(
        body, (state, jnp.asarray(True)), jnp.arange(steps)
    )
    if record_temperature:
        return state, ok, temps
    return state, ok
