"""High-level fused pair reductions: grid in, scalar out, never a pair list.

Wraps the Pallas lag kernel (`pallas_pairs.pair_lag_reduce`) with:
* lag-bound selection + coverage verification,
* a full-rebuild convenience (`fused_lj_rebuild_energy`) that is the
  benchmark step: keys -> multi-operand sort -> fused kernel, skipping the
  occupied-cell table entirely (the kernel needs none),
* an XLA fallback for platforms without Mosaic (tests on CPU use
  interpret=True instead).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..core.binning import bin_and_sort
from ..core.grid import CellGridData
from .pallas_pairs import (
    count_term,
    lag_coverage_ok,
    lj_term,
    pair_lag_reduce,
)

__all__ = [
    "fused_pair_sum",
    "fused_lj_energy",
    "fused_count_pairs",
    "fused_lj_rebuild_energy",
]


def fused_pair_sum(
    grid: CellGridData,
    term: Callable,
    *,
    cutoff=None,
    M: int = 4096,
    L: int = 256,
    interpret: bool = False,
    out_dtype=None,
):
    """Sum term(dsq) over unique cutoff pairs. Returns (total, coverage_ok).

    coverage_ok False means the lag bound L is too small for this data's
    density — rerun with a larger L (the wrapper cannot resize under jit).
    """
    c = grid.info.cutoff if cutoff is None else cutoff
    total = pair_lag_reduce(
        grid.sorted_pos,
        grid.bins.sorted_keys,
        grid.info.strides,
        c * c,
        M=M,
        L=L,
        term=term,
        interpret=interpret,
        out_dtype=out_dtype,
    )
    ok = lag_coverage_ok(grid.bins.sorted_keys, grid.info.strides, L)
    return total, ok


def fused_lj_energy(grid: CellGridData, **kw):
    return fused_pair_sum(grid, lj_term, **kw)


def fused_count_pairs(grid: CellGridData, **kw):
    """Exact pair count. Returns (count: int, coverage_ok).

    Integer accumulation (counts exceed f32's 2^24 exact-integer range
    beyond ~1e6 particles), reconstructed host-side from two int32 planes
    so totals past 2^31 cannot wrap. Host-syncing by design; inside jit use
    `fused_pair_sum(grid, count_term, out_dtype=jnp.int32)` which returns
    the (hi, lo) planes for `combine_count`.
    """
    kw.setdefault("out_dtype", jnp.int32)
    packed, ok = fused_pair_sum(grid, count_term, **kw)
    from .pallas_pairs import combine_count

    return combine_count(packed), ok


def fused_lj_rebuild_energy(
    positions: jax.Array,
    cutoff,
    positions_lo: jax.Array | None = None,
    *,
    M: int = 4096,
    L: int = 256,
    term: Callable = lj_term,
    interpret: bool = False,
    out_dtype=None,
):
    """Full pipeline in one jittable step (the headline benchmark path):
    cell keys -> sort positions by key -> fused LJ reduction.

    No occupied-cell table is built — the lag kernel only needs the sorted
    planes. ``positions_lo`` (f32 low parts from `split_f64`) enables
    split-precision pair distances: f64-grade LJ parity at f32 speed.
    Returns (energy, coverage_ok).
    """
    dim = positions.shape[1]
    if positions_lo is not None:
        # bin on the true spatial columns: without an explicit info,
        # bin_and_sort treats min(total_cols, 3) leading columns as
        # spatial and would mis-bin 2D inputs on their lo payload plane
        from ..core.geometry import GridInfo, aabb_from_positions

        info = GridInfo.create(
            aabb_from_positions(positions), cutoff, auto_order=True
        )
        stacked = jnp.concatenate([positions, positions_lo], axis=1)
        bins, sorted_cols = bin_and_sort(
            stacked, cutoff, max_cells=1, need_perm=False, info=info
        )
        sorted_pos, sorted_lo = sorted_cols[:, :dim], sorted_cols[:, dim:]
    else:
        bins, sorted_pos = bin_and_sort(
            positions, cutoff, max_cells=1, need_perm=False, auto_order=True
        )
        sorted_lo = None
    total = pair_lag_reduce(
        sorted_pos,
        bins.sorted_keys,
        bins.info.strides,
        jnp.asarray(cutoff, positions.dtype) ** 2,
        sorted_lo,
        M=M,
        L=L,
        term=term,
        interpret=interpret,
        out_dtype=out_dtype,
    )
    ok = lag_coverage_ok(bins.sorted_keys, bins.info.strides, L)
    return total, ok


def auto_lj_energy(
    positions,
    cutoff,
    *,
    max_thin_lag: int = 2048,
    interpret: bool = False,
    split: bool = False,
):
    """Host-orchestrated 'just works' LJ energy: probes the data's lag
    requirement and dispatches to the thin-box fused path (tight sorted
    window) or the segment-tile kernel (cubic/wide boxes).

    ``split=True`` splits the (f64) input into hi/lo f32 planes for
    f64-grade pair distances (see `pallas_pairs.split_f64`) — use when the
    energy must match an f64 reference (cross-tool parity harness).

    Not jittable itself (it chooses static kernel parameters from the
    data); each dispatch target is one jitted graph. Returns
    (energy, path_name).
    """
    import numpy as np

    from ..core.binning import bin_and_sort
    from .pallas_pairs import suggest_lag

    if split:
        # the f64 host copy is only needed to derive the (hi, lo) planes
        pos64 = np.asarray(positions, np.float64)
        hi = pos64.astype(np.float32)
        positions = jnp.asarray(hi)
        pos_lo = jnp.asarray((pos64 - hi.astype(np.float64)).astype(np.float32))
    else:
        positions = jnp.asarray(positions)
        pos_lo = None
    bins, _ = bin_and_sort(positions, cutoff, max_cells=1, need_perm=False)
    L = suggest_lag(
        np.asarray(bins.sorted_keys), np.asarray(bins.info.strides)
    )
    if L <= max_thin_lag:
        M = max(1024, min(16384, L))
        e, ok = fused_lj_rebuild_energy(
            positions, cutoff, pos_lo, M=M, L=L, interpret=interpret
        )
        assert bool(ok)
        return float(e), f"fused(L={L})"
    if positions.shape[1] > 3:
        # segment bands are defined for dim <= 3; higher-N wide boxes fall
        # back to the XLA bucketed path (reference is generic over N,
        # lib.rs:132)
        from ..core.grid import build
        from ..core.pairs import pair_sum
        from .lj import lj

        grid = build(positions, cutoff)
        K = int(grid.bins.max_cell_count())
        e = pair_sum(
            grid, lj, K=K, chunk=min(256, grid.bins.max_cells),
            cutoff_sq=cutoff * cutoff,
        )
        return float(e), f"xla(K={K})"
    # wide/cubic boxes: segment-tile kernel. Probe the required window
    # capacity first (cheap host-side bounds pass on the keys already
    # computed above) so the first compile covers; the flag + growth loop
    # still guards density drift (never silently drop pairs).
    from ..ops.pallas_pairs import _pad_and_desentinel
    from .segments import CHUNK, segment_bands, suggest_maxj
    from .tile_pairs import tile_lj_rebuild_energy

    nk = bins.sorted_keys.shape[0]
    C = max(-(-nk // (CHUNK * 8)) * 8, 8) * CHUNK
    # key headroom is MAXJ-independent: growing the window cannot fix it,
    # so check it host-side first instead of burning recompiles
    max_key = int(np.max(np.asarray(bins.sorted_keys)))
    if max_key >= (1 << 24):
        raise ValueError(
            f"grid has flat keys up to {max_key} >= 2^24: beyond the "
            "packed tile kernel's f32-exact key range — shrink the grid "
            "or use ops.tile_pairs with packed=False"
        )
    maxj = suggest_maxj(
        _pad_and_desentinel(bins.sorted_keys, C),
        segment_bands(bins.info.strides),
        per_band=True,
    )
    while True:
        e, ok = tile_lj_rebuild_energy(
            positions, cutoff, pos_lo, MAXJ=maxj, interpret=interpret
        )
        if bool(ok):
            return float(e), f"tile(MAXJ={maxj})"
        if max(maxj) > 512:
            raise RuntimeError("tile window capacity still insufficient "
                               f"at MAXJ={maxj}")
        maxj = tuple(2 * m for m in maxj)
