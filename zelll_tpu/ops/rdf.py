"""Radial pair-distance histograms and the radial distribution function.

An extension beyond the reference: zelll users histogram distances in
their own pair-iterator closure (`/root/reference/src/cellgrid.rs:338-340`
feeds `benches/lj.rs:110-121`-style user code); here the histogram
accumulates *inside* the fused lag kernel (`pallas_pairs.pair_lag_hist`),
so the pair list never exists and a 64-bin histogram of 10^8 pairs costs
a few fused-energy passes (kernel cost is linear in the bin count).

Two entry points:

* `pair_distance_histogram` — open boundaries, exact integer shell
  counts of unique pairs with ``edges[k] <= r < edges[k+1]``.
* `rdf` — orthorhombic PBC (minimum image via the ghost-image machinery
  of `ops.pbc`, each cross pair counted exactly once by the shift-sign
  payload rule) plus ideal-gas shell normalization:
  ``g(r_k) = 2 V h_k / (N (N-1) Vshell_k)``.

Both verify coverage (never silently drop pairs): the returned flag goes
False when the lag bound L or the PBC capacities are too small — grow
and re-run.

Box-shape note: like every lag-kernel path, these suit thin/moderate
boxes; a cubic box whose x*y layer population is large needs a bigger L
(the flag stays honest). The r_max also sets the grid cell edge, so
histograms reaching several cutoffs widen the key window accordingly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.binning import bin_and_sort
from .pallas_pairs import (
    combine_count_vec,
    lag_coverage_ok,
    pair_lag_hist,
)

__all__ = ["pair_distance_histogram", "rdf", "rdf_normalize"]


def _cum_hist_lag(positions, edges, *, positions_lo, M, L, interpret):
    """(K,) cumulative pair counts (dsq < edges[k]^2) + coverage flag."""
    dim = positions.shape[1]
    cutoff = edges[-1]
    edges_sq = (jnp.asarray(edges, positions.dtype) ** 2).reshape(-1)
    if positions_lo is not None:
        from ..core.geometry import GridInfo, aabb_from_positions

        info = GridInfo.create(
            aabb_from_positions(positions), cutoff, auto_order=True
        )
        stacked = jnp.concatenate([positions, positions_lo], axis=1)
        bins, sorted_cols = bin_and_sort(
            stacked, cutoff, max_cells=1, need_perm=False, info=info
        )
        sp, slo = sorted_cols[:, :dim], sorted_cols[:, dim:]
    else:
        bins, sp = bin_and_sort(
            positions, cutoff, max_cells=1, need_perm=False, auto_order=True
        )
        slo = None
    packed = pair_lag_hist(
        sp, bins.sorted_keys, bins.info.strides, edges_sq, slo,
        M=M, L=L, interpret=interpret,
    )
    ok = lag_coverage_ok(bins.sorted_keys, bins.info.strides, L)
    return packed, ok


def pair_distance_histogram(
    positions: jax.Array,
    edges,
    *,
    positions_lo: jax.Array | None = None,
    M: int = 1024,
    L: int = 256,
    interpret: bool = False,
):
    """Histogram of unique pair distances over (K-1) shells
    ``edges[k] <= r < edges[k+1]`` (open boundaries; edges ascending,
    ``edges[-1]`` is the effective cutoff). Host-syncing; returns
    ((K-1,) int64 counts, coverage_ok). Exact integer counts — f32
    boundary ties follow the kernel's f32 (or split) distance rounding.

    ``positions_lo``: f32 low parts (`split_f64`) for f64-grade bin
    boundaries in large boxes."""
    packed, ok = _cum_hist_lag(
        positions, jnp.asarray(edges), positions_lo=positions_lo,
        M=M, L=L, interpret=interpret,
    )
    cum = combine_count_vec(packed)
    return cum[1:] - cum[:-1], bool(ok)


def _pbc_cum_hist(positions, origin, box, edges, *, positions_lo, B, G, M,
                  L, interpret):
    from .pbc import pbc_extend, suggest_pbc_capacity

    n = positions.shape[0]
    cutoff = edges[-1]
    edges_sq = (jnp.asarray(edges, positions.dtype) ** 2).reshape(-1)
    if B is None or G is None:
        Bd, Gd = suggest_pbc_capacity(n, box, cutoff)
        B = Bd if B is None else B
        G = Gd if G is None else G
    ext, ext_lo, w, valid, ok = pbc_extend(
        positions, origin, box, cutoff, B=B, G=G, positions_lo=positions_lo
    )
    cols = [ext]
    if ext_lo is not None:
        cols.append(ext_lo)
    cols.append(w[:, None])
    bins, sorted_cols = bin_and_sort(
        jnp.concatenate(cols, axis=1), cutoff,
        max_cells=1, need_perm=False, valid=valid, auto_order=True,
    )
    dim = positions.shape[1]
    sp = sorted_cols[:, :dim]
    slo = sorted_cols[:, dim : 2 * dim] if ext_lo is not None else None

    def keep(wi, wj):
        return (wi * wj == 0) & (wi + wj >= 0)

    packed = pair_lag_hist(
        sp, bins.sorted_keys, bins.info.strides, edges_sq, slo,
        sorted_payload=sorted_cols[:, -1:],
        M=M, L=L, interpret=interpret, pair_mask=keep,
    )
    ok &= lag_coverage_ok(bins.sorted_keys, bins.info.strides, L)
    return packed, ok


def rdf_normalize(counts, edges, n: int, volume: float):
    """Shell counts -> g(r): ``g_k = 2 V h_k / (N (N-1) Vshell_k)``
    (each unique pair counted once => factor 2). Returns (r_mid, g)."""
    import numpy as np

    e = np.asarray(edges, np.float64)
    h = np.asarray(counts, np.float64)
    vshell = 4.0 / 3.0 * np.pi * (e[1:] ** 3 - e[:-1] ** 3)
    g = 2.0 * float(volume) * h / (max(n, 1) * max(n - 1, 1) * vshell)
    return 0.5 * (e[1:] + e[:-1]), g


def rdf(
    positions: jax.Array,
    origin,
    box,
    edges,
    *,
    positions_lo: jax.Array | None = None,
    B: int | None = None,
    G: int | None = None,
    M: int = 1024,
    L: int = 256,
    interpret: bool = False,
):
    """Radial distribution function g(r) under orthorhombic PBC
    (minimum image; requires ``box > 2 * edges[-1]`` per axis like every
    `ops.pbc` path). Host-syncing; returns (r_mid, g, coverage_ok).

    Shell counts come from one fused histogram kernel pass over the
    ghost-extended sorted order; normalization is the ideal-gas shell
    count at the box density."""
    import numpy as np

    packed, ok = _pbc_cum_hist(
        positions, origin, box, jnp.asarray(edges),
        positions_lo=positions_lo, B=B, G=G, M=M, L=L, interpret=interpret,
    )
    cum = combine_count_vec(packed)
    counts = cum[1:] - cum[:-1]
    r_mid, g = rdf_normalize(
        counts, edges, positions.shape[0], float(np.prod(np.asarray(box)))
    )
    return r_mid, g, bool(ok)
