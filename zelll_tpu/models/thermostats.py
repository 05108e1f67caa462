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
    "berendsen_box_mu",
    "md_run_langevin",
    "md_run_npt",
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


def berendsen_box_mu(P_inst, P_target, tau_p, dt, *, beta: float = 1.0,
                     dim: int = 3, clip: float = 0.02):
    """Berendsen weak-coupling isotropic box scale factor per step:

        mu = (1 - beta * dt/tau_p * (P_target - P_inst))^(1/dim)

    ``beta`` is the (reduced) isothermal compressibility; only the ratio
    beta/tau_p matters. Clipped to [1-clip, 1+clip] so one noisy virial
    spike cannot collapse the box (standard practice). ``beta = 0``
    disables the barostat exactly (mu = 1)."""
    mu_d = 1.0 - beta * dt / tau_p * (P_target - P_inst)
    mu = jnp.clip(mu_d, 0.5, 2.0) ** (1.0 / dim)
    return jnp.clip(mu, 1.0 - clip, 1.0 + clip)


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


def md_run_npt(
    positions: jax.Array,
    velocities: jax.Array,
    origin,
    box,
    cutoff,
    dt,
    *,
    steps: int,
    P_target,
    tau_p,
    beta: float = 1.0,
    kT_target=None,
    tau_T=None,
    B: int | None = None,
    G: int | None = None,
    capacity_headroom: float = 1.5,
    path: str = "lag",
    M: int = 1024,
    L: int = 256,
    K: int = 32,
    chunk: int = 64,
    MAXJ=8,
    CB: int = 8,
    interpret: bool = False,
    record: bool = False,
):
    """NPT trajectory under cubic/orthorhombic PBC: per step one LJ force
    kick + drift (`ops.pbc.pbc_lj_forces` semantics), optional Berendsen
    velocity rescale toward ``kT_target``, then a Berendsen isotropic box
    rescale toward ``P_target`` driven by the instantaneous virial
    pressure P = (2 KE + W) / (dim V), with W the fused scalar pair
    virial (`ops.virial.pbc_virial` — same kernel path as the forces).
    Positions scale about ``origin`` with the box and are wrapped.

    Ghost capacities B/G are sized host-side from the INITIAL box with
    ``capacity_headroom`` margin (compression increases the boundary
    population; the ok flag still guards, never silently dropping pairs).
    The whole trajectory is one jitted scan. Returns
    (positions, velocities, box, ok[, {"pressure", "volume",
    "temperature"} (steps,) arrays when ``record=True``]).

    Cost note: forces and virial each run their own ghost extension +
    sort (~2x the NVE PBC step); fusing them into one pass is a kernel
    extension left for hardware-validated rounds.
    """
    import numpy as np

    from ..ops.pbc import suggest_pbc_capacity

    n, dim = positions.shape
    if B is None or G is None:
        # worst case over the barostat's reachable boxes: the per-step
        # clip bounds total compression, but size from a uniformly
        # denser box by `capacity_headroom` in particles-per-cell
        Bd, Gd = suggest_pbc_capacity(
            n, np.asarray(box, np.float64) / capacity_headroom ** (1 / dim),
            cutoff,
        )
        B = Bd if B is None else B
        G = Gd if G is None else G

    kw = dict(path=path, M=M, L=L, K=K, chunk=chunk, MAXJ=MAXJ, CB=CB,
              interpret=interpret, B=B, G=G)
    return _md_run_npt_jit(
        positions, velocities, origin, jnp.asarray(box, positions.dtype),
        cutoff, dt, P_target, tau_p, beta, kT_target, tau_T,
        steps=steps, record=record, **kw,
    )


@partial(
    jax.jit,
    static_argnames=(
        "steps", "record", "path", "M", "L", "K", "chunk", "MAXJ", "CB",
        "interpret", "B", "G",
    ),
)
def _md_run_npt_jit(
    positions, velocities, origin, box, cutoff, dt, P_target, tau_p, beta,
    kT_target, tau_T, *, steps, record, path, M, L, K, chunk, MAXJ, CB,
    interpret, B, G,
):
    from ..ops.pbc import pbc_lj_forces, wrap_positions
    from ..ops.virial import kinetic_energy, pbc_virial, pressure

    n, dim = positions.shape
    kw = dict(path=path, M=M, L=L, K=K, chunk=chunk, MAXJ=MAXJ, CB=CB,
              interpret=interpret, B=B, G=G)

    def body(carry, _):
        pos, vel, bx, okacc = carry
        f, ok1 = pbc_lj_forces(pos, origin, bx, cutoff, **kw)
        vel = vel + dt * f
        if kT_target is not None:
            vel = berendsen_rescale(vel, kT_target, tau_T, dt)
        pos = pos + dt * vel

        w, ok2 = pbc_virial(pos, origin, bx, cutoff, **kw)
        vol = jnp.prod(bx)
        p_inst = pressure(w, kinetic_energy(vel), vol, dim)
        mu = berendsen_box_mu(p_inst, P_target, tau_p, dt, beta=beta,
                              dim=dim)
        bx = mu * bx
        pos = origin + (pos - origin) * mu
        pos = wrap_positions(pos, origin, bx)

        # the minimum-image regime (box > 2*cutoff) must survive shrinking
        ok = ok1 & ok2 & jnp.all(bx > 2.0 * cutoff)
        out = (
            (p_inst, jnp.prod(bx), kinetic_temperature(vel))
            if record else None
        )
        return (pos, vel, bx, okacc & ok), out

    (pos, vel, bx, ok), rec = jax.lax.scan(
        body, (positions, velocities, box, jnp.asarray(True)),
        None, length=steps,
    )
    if record:
        p_s, v_s, t_s = rec
        return pos, vel, bx, ok, {
            "pressure": p_s, "volume": v_s, "temperature": t_s,
        }
    return pos, vel, bx, ok
