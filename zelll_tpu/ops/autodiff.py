"""jax.grad-compatible cutoff-pair potentials (extension beyond the
reference).

The reference exposes no reverse-mode autodiff anywhere: the only
gradients it computes are forward-mode num-dual gradients of the psssh
SDF over QUERY points (surface-sampling/src/sdf/numdual.rs:67-86), and
pair iteration itself is an opaque Rust iterator a caller cannot
differentiate through. zelll_tpu's pair kernels are Pallas kernels, which
JAX cannot autodiff either — but the gradient of a pair potential has a
closed form that IS one of our kernels:

    E(p) = sum over unique cutoff pairs (i, j) of term(dsq_ij)
    dE/dp_i = sum_j term'(dsq_ij) * 2 (p_i - p_j) = -f_i

with the forces kernels' factor convention ``f_i = sum_j gfn(dsq) *
(p_i - p_j)``, i.e. ``gfn(dsq) = -2 * term'(dsq)``. So
`make_pair_potential` wires a `jax.custom_vjp` whose forward pass is the
fused energy kernel and whose backward pass is the fused forces kernel —
analytic pair forces in one dispatch, never differentiating through the
sort or the kernels.

The returned callable maps (n, dim) positions to ``(energy,
coverage_ok)`` and composes with ``jax.grad(pot, has_aux=True)`` /
``jax.value_and_grad(pot, has_aux=True)`` directly (energy is the scalar,
the coverage flag rides as aux). The never-silently-drop invariant holds
through differentiation: the forward flag covers the energy, and the
backward forces kernel runs in the same (or a caller-chosen) capacity
class.

Cutoff-boundary caveat: E is almost-everywhere differentiable; a pair
sitting exactly at dsq == cutoff^2 contributes a jump if term(cutoff^2)
!= 0 (true for LJ). This matches every MD code's convention (the
reference's LJ bench benches/lj.rs:42-47 has the same discontinuity).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..core.binning import bin_and_sort
from ..core.geometry import GridInfo, aabb_from_positions
from .lj import lj_force_factor
from .pallas_pairs import (
    lag_coverage_ok,
    lj_term,
    pair_lag_forces,
    pair_lag_reduce,
    split_f64,
)

__all__ = ["make_pair_potential", "gfn_from_term"]


def gfn_from_term(term: Callable) -> Callable:
    """Force factor ``gfn(dsq) = -2 * term'(dsq)`` derived from an
    elementwise energy term by autodiff (evaluated tile-wise inside the
    kernels; `jnp.vectorize` lowers to the same elementwise VPU ops)."""
    dterm = jnp.vectorize(jax.grad(lambda s: term(s)))

    def gfn(dsq):
        return -2.0 * dterm(dsq)

    return gfn


def make_pair_potential(
    cutoff,
    *,
    term: Callable = lj_term,
    gfn: Callable | None = None,
    path: str = "lag",
    M: int = 8192,
    L: int = 256,
    CB: int = 8,
    MAXJ: int | tuple = 8,
    MAXJ_F: int | tuple | None = None,
    kahan: bool = True,
    split: bool = False,
    interpret: bool = False,
) -> Callable:
    """Build a differentiable potential ``pot(positions) -> (E, ok)``.

    ``path='lag'`` uses the rolling-window lag kernels (3D, thin/benchmark
    boxes); ``path='tile'`` the segment-tile kernels (any box shape, 2D or
    3D). Capacity classes are static as everywhere in zelll_tpu: M/L for
    the lag path, CB/MAXJ (energy, 5 half bands) and MAXJ_F (forces, 9
    full bands; defaults to MAXJ's widest entry) for the tile path.

    ``gfn`` overrides the derived force factor (pass the handwritten
    `lj_force_factor` sibling for a custom term when you have one); the
    default LJ term uses the handwritten factor automatically.

    ``split=True`` enables split-precision pair separations: positions
    (pass them as f64, requires x64 enabled) are split into (hi, lo) f32
    planes carried through the sort, giving f64-grade energies AND
    gradients at f32 kernel speed (the same scheme as
    `fused_lj_rebuild_energy(positions_lo=...)`).

    Example::

        pot = make_pair_potential(cutoff, path="tile")
        (e, ok), g = jax.value_and_grad(pot, has_aux=True)(positions)
        forces = -g
    """
    if path not in ("lag", "tile"):
        raise ValueError(f"path must be 'lag' or 'tile', got {path!r}")
    if gfn is None:
        gfn = lj_force_factor if term is lj_term else gfn_from_term(term)
    if MAXJ_F is None:
        MAXJ_F = MAXJ if isinstance(MAXJ, int) else max(MAXJ)

    def _bin(pos, need_perm):
        """(bins, sorted_hi, sorted_lo|None) — split mode carries the f32
        low planes through the sort as payload columns (binning on the hi
        columns only, like `fused_lj_rebuild_energy`)."""
        dim = pos.shape[1]
        if not split:
            bins, sorted_pos = bin_and_sort(
                pos, cutoff, max_cells=1, need_perm=need_perm,
                auto_order=True,
            )
            return bins, sorted_pos, None
        hi, lo = split_f64(pos)
        info = GridInfo.create(
            aabb_from_positions(hi), cutoff, auto_order=True
        )
        bins, cols = bin_and_sort(
            jnp.concatenate([hi, lo], axis=1), cutoff, max_cells=1,
            need_perm=need_perm, info=info,
        )
        return bins, cols[:, :dim], cols[:, dim:]

    def _energy(pos):
        bins, sorted_pos, sorted_lo = _bin(pos, need_perm=False)
        csq = jnp.asarray(cutoff, sorted_pos.dtype) ** 2
        if path == "lag":
            e = pair_lag_reduce(
                sorted_pos, bins.sorted_keys, bins.info.strides, csq,
                sorted_lo, M=M, L=L, term=term, interpret=interpret,
            )
            ok = lag_coverage_ok(bins.sorted_keys, bins.info.strides, L)
        else:
            from .tile_pairs import tile_pair_reduce

            e, ok = tile_pair_reduce(
                sorted_pos, bins.sorted_keys, bins.info.strides, csq,
                sorted_lo, CB=CB, MAXJ=MAXJ, term=term, kahan=kahan,
                interpret=interpret,
            )
        return e, ok

    def _forces_input_order(pos):
        """Pair forces aligned with the INPUT order: forces come out of
        the kernels in sorted-slot order; a second multi-operand sort
        keyed on the permutation un-sorts them (never an n-sized gather,
        per the TPU performance rules)."""
        bins, sorted_pos, sorted_lo = _bin(pos, need_perm=True)
        csq = jnp.asarray(cutoff, sorted_pos.dtype) ** 2
        dim = pos.shape[1]
        if path == "lag":
            f = pair_lag_forces(
                sorted_pos, bins.sorted_keys, bins.info.strides, csq,
                sorted_lo, M=M, L=L, gfn=gfn, interpret=interpret,
            )
            ok = lag_coverage_ok(bins.sorted_keys, bins.info.strides, L)
        else:
            from .tile_pairs import tile_pair_forces

            f, ok = tile_pair_forces(
                sorted_pos, bins.sorted_keys, bins.info.strides, csq,
                sorted_lo, CB=CB, MAXJ=MAXJ_F, gfn=gfn,
                interpret=interpret,
            )
        # the backward pass has no channel for a coverage flag, so an
        # under-capacity forces kernel poisons the gradient with NaN
        # instead of silently dropping pairs
        f = jnp.where(ok, f, jnp.nan)
        unsorted = jax.lax.sort(
            [bins.perm] + [f[:, a] for a in range(dim)], num_keys=1
        )
        return jnp.stack(unsorted[1:], axis=-1)

    @jax.custom_vjp
    def pot(positions):
        return _energy(positions)

    def pot_fwd(positions):
        return _energy(positions), positions

    def pot_bwd(positions, ct):
        ct_e = ct[0]
        grad = ct_e * (-_forces_input_order(positions))
        return (grad.astype(positions.dtype),)

    pot.defvjp(pot_fwd, pot_bwd)
    return pot
