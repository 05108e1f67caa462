"""Virial, stress tensor, and pressure — the thermodynamic observables.

The scalar pair virial

    W = sum_pairs f_ij . r_ij = sum_pairs gfn(dsq) * dsq

is *a scalar pair term*, so it rides every existing fused reduction path
unchanged (lag kernel, segment-tile kernel, XLA bucketed path, PBC ghost
masking, multi-chip slab sharding): no kernel changes, same coverage
flags. The full configurational stress tensor

    sigma_ab = sum_pairs gfn(dsq) * dx_a * dx_b        (trace = W)

needs per-axis separations and runs on the XLA bucketed path
(`core.pairs.pair_stress`); under PBC each cross pair is counted once via
endpoint half-weights (real rows weight 1, ghost images 0 — pair (i, jg)
and its mirror (j, ig) each contribute half).

Pressure (instantaneous, per the standard virial theorem for pair
potentials, unit mass, dimensionless units):

    P = (2 * KE + W) / (dim * V)

The reference library exposes raw pair iteration from which users fold
such sums (zelll `src/cellgrid.rs:338-340`); here they are first-class
fused observables, feeding the NPT barostat in `models.thermostats`.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..core.grid import CellGridData
from .lj import lj_force_factor

__all__ = [
    "lj_virial_term",
    "virial_term_from_gfn",
    "fused_virial",
    "virial_rebuild",
    "pbc_virial",
    "pair_stress_open",
    "pbc_stress",
    "fused_stress_open",
    "pbc_stress_fused",
    "kinetic_energy",
    "kinetic_stress",
    "pressure",
    "pressure_tensor",
]


def lj_virial_term(dsq):
    """w(dsq) = lj_force_factor(dsq) * dsq = 24 t (2t - 1), t = dsq^-3.

    The per-pair virial f_ij . r_ij of the dimensionless LJ potential —
    algebraically simplified so the kernel does one fewer divide than
    composing `lj_force_factor` with a multiply.
    """
    t = (1.0 / dsq) ** 3
    return 24.0 * t * (2.0 * t - 1.0)


import weakref

# Weak VALUES (not keys): the cached wrapper closes over its gfn, so a
# WeakKeyDictionary could never collect (value -> key strong cycle) and a
# plain dict pins every gfn ever passed for the process lifetime. Here an
# entry lives exactly as long as something (the caller, a jit cache)
# holds the derived term; the closure keeps gfn alive that long, and
# dropping the term evaporates the entry and frees both.
_VIRIAL_TERMS: "weakref.WeakValueDictionary" = weakref.WeakValueDictionary()


def virial_term_from_gfn(gfn: Callable) -> Callable:
    """w(dsq) = gfn(dsq) * dsq for an arbitrary force factor.

    Cached per gfn identity: the fused reductions jit on term identity, so
    a fresh closure per call would retrace every time.
    """
    fn = _VIRIAL_TERMS.get(gfn)
    if fn is None:
        def fn(dsq):
            return gfn(dsq) * dsq

        _VIRIAL_TERMS[gfn] = fn
    return fn


def fused_virial(grid: CellGridData, *, gfn: Callable | None = None, **kw):
    """Scalar virial W over unique cutoff pairs of a built grid (open
    boundaries), on the fused lag kernel. Returns (W, coverage_ok)."""
    from .fused import fused_pair_sum

    term = lj_virial_term if gfn is None else virial_term_from_gfn(gfn)
    return fused_pair_sum(grid, term, **kw)


def virial_rebuild(positions: jax.Array, cutoff, positions_lo=None, **kw):
    """Full-pipeline scalar virial (keys -> sort -> fused reduction), the
    rebuild-per-step form used by MD observers. Returns (W, coverage_ok)."""
    from .fused import fused_lj_rebuild_energy

    gfn = kw.pop("gfn", None)
    term = lj_virial_term if gfn is None else virial_term_from_gfn(gfn)
    return fused_lj_rebuild_energy(
        positions, cutoff, positions_lo, term=term, **kw
    )


def pbc_virial(positions: jax.Array, origin, box, cutoff, *,
               gfn: Callable | None = None, **kw):
    """Scalar virial W over unique minimum-image cutoff pairs under
    orthorhombic PBC (any path: lag | tile | xla). Returns (W, ok)."""
    from .pbc import pbc_pair_sum

    term = lj_virial_term if gfn is None else virial_term_from_gfn(gfn)
    return pbc_pair_sum(positions, origin, box, cutoff, term=term, **kw)


def pair_stress_open(
    positions: jax.Array,
    cutoff,
    *,
    gfn: Callable | None = None,
    K: int | None = None,
    chunk: int = 256,
):
    """Configurational stress tensor under open boundaries.

    Builds the grid and folds sigma_ab = sum_pairs gfn(dsq) dx_a dx_b on
    the XLA bucketed path. ``K`` defaults to the data's max cell count
    (host-syncing; pass explicitly inside jit). Returns ((dim, dim), ok).
    """
    from ..core.grid import build
    from ..core.pairs import pair_stress

    grid = build(positions, cutoff)
    if K is None:
        K = int(grid.bins.max_cell_count())
    sigma = pair_stress(
        grid, gfn or lj_force_factor, K=K, chunk=chunk,
        cutoff_sq=jnp.asarray(cutoff, positions.dtype) ** 2,
    )
    ok = grid.bins.max_cell_count() <= K
    return sigma, ok


def pbc_stress(
    positions: jax.Array,
    origin,
    box,
    cutoff,
    *,
    gfn: Callable | None = None,
    B: int | None = None,
    G: int | None = None,
    K: int | None = None,
    chunk: int = 256,
):
    """Configurational stress tensor under orthorhombic PBC.

    Ghost-image extension + endpoint half-weights (see
    `core.pairs.pair_stress`): real rows weigh 1, ghost rows 0, so each
    minimum-image cross pair is counted exactly once and ghost-ghost
    pairs vanish. Returns ((dim, dim), ok).
    """
    from ..core.grid import build
    from ..core.pairs import pair_stress
    from .pbc import pbc_extend, suggest_pbc_capacity

    n = positions.shape[0]
    if B is None or G is None:
        Bd, Gd = suggest_pbc_capacity(n, box, cutoff)
        B = Bd if B is None else B
        G = Gd if G is None else G
    ext, _ext_lo, _w, valid, ok = pbc_extend(
        positions, origin, box, cutoff, B=B, G=G
    )
    grid = build(ext, cutoff, valid=valid)
    if K is None:
        K = int(grid.bins.max_cell_count())
    ok &= grid.bins.max_cell_count() <= K
    # sorted_ids < n <=> the slot holds a real (non-ghost, non-pad) row
    weights = (grid.sorted_ids < n).astype(positions.dtype)
    sigma = pair_stress(
        grid, gfn or lj_force_factor, K=K, chunk=chunk,
        cutoff_sq=jnp.asarray(cutoff, positions.dtype) ** 2,
        slot_weights=weights,
    )
    return sigma, ok


def _pbc_keep_mask(wi, wj):
    """PBC pair keep rule on the shift-sign payload plane (0 real, +/-1
    ghost, see `pbc.pbc_extend`): drop ghost-ghost pairs, count each
    minimum-image cross pair once via its lex-positive image. dx (x) dx
    is mirror-invariant, so this yields the full PBC stress in ONE
    kernel pass (the same rule the PBC energy path uses)."""
    return (wi * wj == 0) & (wi + wj >= 0)


def _stress_pass(positions, cutoff, *, gfn, path, M, L, MAXJ, CB,
                 interpret, valid=None, positions_lo=None, payload=None,
                 pair_mask=None):
    """One direct fused stress pass over unique cutoff pairs:
    sigma_ab = sum_pairs gfn(dsq) dx_a dx_b accumulated per component
    inside the kernel (`pallas_pairs.pair_lag_stress` /
    `tile_pairs.tile_pair_stress`). Every term is bounded by
    |gfn|*cutoff^2 — no box-scale cancellation, unlike the former
    forces-pass + r (x) f contraction whose f32 floor was ~3e-6.
    Returns ((dim, dim), ok)."""
    from ..core.binning import bin_and_sort
    from ..core.geometry import GridInfo, aabb_from_positions

    dim = positions.shape[1]
    gfn = gfn or lj_force_factor
    cols = [positions]
    if positions_lo is not None:
        cols.append(positions_lo)
    if payload is not None:
        cols.append(payload[:, None])
    if len(cols) > 1:
        info = GridInfo.create(
            aabb_from_positions(positions, valid=valid), cutoff,
            auto_order=True,
        )
        bins, sorted_cols = bin_and_sort(
            jnp.concatenate(cols, axis=1), cutoff, max_cells=1,
            need_perm=False, valid=valid, info=info,
        )
        sp = sorted_cols[:, :dim]
        slo = (
            sorted_cols[:, dim : 2 * dim]
            if positions_lo is not None else None
        )
        spay = sorted_cols[:, -1:] if payload is not None else None
    else:
        bins, sp = bin_and_sort(
            positions, cutoff, max_cells=1, need_perm=False, valid=valid,
            auto_order=True,
        )
        slo = spay = None
    csq = jnp.asarray(cutoff, positions.dtype) ** 2
    if path == "tile":
        from .tile_pairs import tile_pair_stress

        sigma, ok = tile_pair_stress(
            sp, bins.sorted_keys, bins.info.strides, csq, slo, spay,
            CB=CB, MAXJ=MAXJ, gfn=gfn, interpret=interpret,
            pair_mask=pair_mask,
        )
    elif path == "lag":
        from .pallas_pairs import lag_coverage_ok, pair_lag_stress

        sigma = pair_lag_stress(
            sp, bins.sorted_keys, bins.info.strides, csq, slo, spay,
            M=M, L=L, gfn=gfn, interpret=interpret, pair_mask=pair_mask,
        )
        ok = lag_coverage_ok(bins.sorted_keys, bins.info.strides, L)
    else:
        raise ValueError(f"unknown path {path!r} (lag | tile)")
    return sigma, ok


def fused_stress_open(
    positions: jax.Array,
    cutoff,
    *,
    gfn: Callable | None = None,
    path: str = "lag",
    M: int = 1024,
    L: int = 256,
    MAXJ=8,
    CB: int = 8,
    interpret: bool = False,
    positions_lo: jax.Array | None = None,
):
    """Configurational stress tensor at fused-kernel speed, open
    boundaries: ONE direct pair-sum pass (per-component Kahan
    accumulation inside the kernel; the pair list never materializes).
    ``path="lag"`` for thin boxes, ``"tile"`` for cubic/wide.
    ``positions_lo`` (split precision) reaches ~1e-7 relative error —
    f64-grade stress at f32 speed. Returns ((dim, dim), ok).

    Prefer this over `pair_stress_open` above ~1e5 particles; the XLA
    bucketed path remains the N-dimensional/arbitrary-weights fallback
    (dim != 3 dispatches there automatically — the fused kernels are
    3D-only, the reference is generic over N, lib.rs:132-135; a split
    request cannot be honored there, so it raises rather than silently
    degrade).
    """
    dim = positions.shape[1]
    if dim != 3:
        if positions_lo is not None:
            raise ValueError(
                "split-precision stress is only fused for dim == 3; the "
                "XLA fallback would silently drop positions_lo"
            )
        return pair_stress_open(positions, cutoff, gfn=gfn)
    return _stress_pass(
        positions, cutoff, gfn=gfn, path=path, M=M, L=L,
        MAXJ=MAXJ, CB=CB, interpret=interpret, positions_lo=positions_lo,
    )


def pbc_stress_fused(
    positions: jax.Array,
    origin,
    box,
    cutoff,
    *,
    gfn: Callable | None = None,
    path: str = "lag",
    B: int | None = None,
    G: int | None = None,
    M: int = 1024,
    L: int = 256,
    MAXJ=8,
    CB: int = 8,
    interpret: bool = False,
    positions_lo: jax.Array | None = None,
    minimage=False,
):
    """Configurational stress tensor at fused-kernel speed under
    orthorhombic PBC: ONE direct pair-sum pass over the ghost-image
    extension, with the shift-sign payload plane masking each
    minimum-image cross pair to count exactly once (`_pbc_keep_mask` —
    the identical rule the PBC energy path uses; dx (x) dx is
    mirror-invariant so one image of the pair carries the full term).
    Supersedes the round-8 three-pass (A - B + C)/2 ghost decomposition:
    one pass instead of three AND no box-scale contraction cancellation.
    ``positions_lo`` propagates split precision through the ghosts (exact
    two-sum residual of hi + shift*box). ``minimage`` ("auto" | False |
    per-axis mask; lag path only) folds narrow axes in-kernel instead of
    building their ghost images (`pbc._minimage_bins`): dx (x) dx on the
    FOLDED separation is exactly the image outer product, so only the
    still-ghosted axes need the shift-sign keep mask. Returns
    ((dim, dim), ok); the XLA `pbc_stress` stays as the N-dim fallback.
    """
    from .pallas_pairs import lag_coverage_ok, pair_lag_stress
    from .pbc import (_minimage_bins, _resolve_minimage, pbc_extend,
                      suggest_pbc_capacity)

    n, dim = positions.shape
    if dim != 3:
        if positions_lo is not None:
            raise ValueError(
                "split-precision PBC stress is only fused for dim == 3; "
                "the XLA fallback would silently drop positions_lo"
            )
        return pbc_stress(positions, origin, box, cutoff, gfn=gfn, B=B, G=G)
    mimask = _resolve_minimage(box, cutoff, minimage, dim)
    if mimask.any():
        if path != "lag":
            raise ValueError(
                "minimage is a lag-path feature (narrow axes are the lag "
                f"kernel's regime); got path={path!r}"
            )
        bins, sp, slo, payload, reach, mi_box, ok = _minimage_bins(
            positions, origin, box, cutoff, mimask, B=B, G=G,
            positions_lo=positions_lo, need_perm=False,
        )
        csq = jnp.asarray(cutoff, positions.dtype) ** 2
        sigma = pair_lag_stress(
            sp, bins.sorted_keys, bins.info.strides, csq, slo,
            sorted_payload=payload,
            pair_mask=None if payload is None else _pbc_keep_mask,
            M=M, L=L, gfn=gfn or lj_force_factor, interpret=interpret,
            mi_box=mi_box, key_reach=reach,
        )
        ok &= lag_coverage_ok(bins.sorted_keys, bins.info.strides, L,
                              reach=reach)
        return sigma, ok
    if B is None or G is None:
        Bd, Gd = suggest_pbc_capacity(n, box, cutoff)
        B = Bd if B is None else B
        G = Gd if G is None else G
    ext, ext_lo, w, valid, ok = pbc_extend(
        positions, origin, box, cutoff, B=B, G=G,
        positions_lo=positions_lo,
    )
    sigma, ok_k = _stress_pass(
        ext, cutoff, gfn=gfn, path=path, M=M, L=L, MAXJ=MAXJ, CB=CB,
        interpret=interpret, valid=valid, positions_lo=ext_lo,
        payload=w, pair_mask=_pbc_keep_mask,
    )
    return sigma, ok & ok_k


def kinetic_energy(velocities: jax.Array):
    """Total kinetic energy, unit mass: KE = 1/2 sum |v|^2."""
    dim = velocities.shape[1]
    # spatial axis unrolled: minor-dim-3 reductions lower pathologically
    total = jnp.sum(velocities[:, 0] * velocities[:, 0])
    for a in range(1, dim):
        total = total + jnp.sum(velocities[:, a] * velocities[:, a])
    return 0.5 * total


def kinetic_stress(velocities: jax.Array):
    """Kinetic stress tensor, unit mass: sum_i v_a v_b (trace = 2 KE)."""
    dim = velocities.shape[1]
    out = jnp.zeros((dim, dim), velocities.dtype)
    for a in range(dim):
        for b in range(a, dim):
            s = jnp.sum(velocities[:, a] * velocities[:, b])
            out = out.at[a, b].set(s)
            if b != a:
                out = out.at[b, a].set(s)
    return out


def pressure(virial_w, kinetic, volume, dim: int = 3):
    """Instantaneous scalar pressure P = (2 KE + W) / (dim V)."""
    return (2.0 * kinetic + virial_w) / (dim * volume)


def pressure_tensor(sigma_conf, sigma_kin, volume):
    """Instantaneous pressure tensor P_ab = (sigma_kin + sigma_conf) / V;
    its trace/dim is the scalar `pressure`."""
    return (sigma_kin + sigma_conf) / volume
