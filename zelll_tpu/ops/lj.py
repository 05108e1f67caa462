"""Lennard-Jones pair interaction, fused into the cell-list enumeration.

Dimensionless lj/cut as in the reference benchmark (benches/lj.rs:42-47,
matching LAMMPS `pair_style lj/cut` with epsilon = sigma = 1):

    V(r^2) = 4 ((1/r^2)^6 - (1/r^2)^3)       [as a function of squared dist]

The energy/force evaluations run as on-chip segment reductions inside the
pair-enumeration scan — the build -> iterate -> reduce loop never leaves the
device (BASELINE.json north star).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.grid import CellGridData
from ..core.pairs import pair_forces, pair_sum

__all__ = ["lj", "lj_force_factor", "lj_force_factor_fast", "lj_energy", "lj_forces"]


def lj(dsq):
    """4((1/r)^12 - (1/r)^6) from the squared distance (benches/lj.rs:42-47)."""
    t = (1.0 / dsq) ** 3
    return 4.0 * t * (t - 1.0)


def lj_force_factor(dsq):
    """Scalar f such that the force on i from j is f * (p_i - p_j).

    f = -2 dV/d(dsq) = 24 t (2t - 1) / dsq with t = dsq^-3.
    """
    inv = 1.0 / dsq
    t = inv**3
    return 24.0 * t * (2.0 * t - 1.0) * inv


def lj_force_factor_fast(dsq):
    """`lj_force_factor` with the divide replaced by rsqrt (hardware-fast
    on the VPU, ~2-3 ulp) — the forces sibling of
    `pallas_pairs.lj_term_fast`; for the f32 headline mode only."""
    import jax

    r = jax.lax.rsqrt(dsq)
    inv = r * r
    t = inv * inv * inv
    return 24.0 * t * (2.0 * t - 1.0) * inv


def lj_energy(
    grid: CellGridData,
    *,
    K: int,
    cutoff=None,
    chunk: int = 256,
    accum_dtype=None,
):
    """Total LJ potential energy over cutoff-filtered unique pairs.

    Distance filter is strict `<` like the reference benchmark
    (benches/lj.rs:83-90).
    """
    c = grid.info.cutoff if cutoff is None else cutoff
    return pair_sum(
        grid, lj, K=K, chunk=chunk, cutoff_sq=c * c, accum_dtype=accum_dtype
    )


def lj_forces(grid: CellGridData, *, K: int, cutoff=None, chunk: int = 256):
    """Per-particle LJ forces (input particle order)."""
    c = grid.info.cutoff if cutoff is None else cutoff
    return pair_forces(grid, lj_force_factor, K=K, chunk=chunk, cutoff_sq=c * c)
