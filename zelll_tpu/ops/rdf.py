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

__all__ = ["pair_distance_histogram", "rdf", "rdf_normalize",
           "rdf_normalize_partial"]


_SPECIES_MASKS: dict = {}


def _species_mask(a: int, b: int):
    """Cached per-(a, b) pair mask (the kernels jit on mask identity):
    keeps exactly the unordered species pairs {a, b}."""
    fn = _SPECIES_MASKS.get((a, b))
    if fn is None:
        def fn(wi, wj):
            return ((wi == a) & (wj == b)) | ((wi == b) & (wj == a))

        _SPECIES_MASKS[(a, b)] = fn
    return fn


def _cum_hist(positions, edges, *, positions_lo, M, L, interpret, path,
              CB, MAXJ, species=None, pair=None):
    """(2, K) packed cumulative pair counts (dsq < edges[k]^2) + flag."""
    dim = positions.shape[1]
    cutoff = edges[-1]
    edges_sq = (jnp.asarray(edges, positions.dtype) ** 2).reshape(-1)
    cols = [positions]
    if positions_lo is not None:
        cols.append(positions_lo)
    if species is not None:
        cols.append(
            jnp.asarray(species, positions.dtype).reshape(-1, 1)
        )
    if len(cols) > 1:
        from ..core.geometry import GridInfo, aabb_from_positions

        info = GridInfo.create(
            aabb_from_positions(positions), cutoff, auto_order=True
        )
        bins, sorted_cols = bin_and_sort(
            jnp.concatenate(cols, axis=1), cutoff,
            max_cells=1, need_perm=False, info=info,
        )
        sp = sorted_cols[:, :dim]
        off = dim
        slo = None
        if positions_lo is not None:
            slo = sorted_cols[:, off : off + dim]
            off += dim
        spec = sorted_cols[:, off:] if species is not None else None
    else:
        bins, sp = bin_and_sort(
            positions, cutoff, max_cells=1, need_perm=False, auto_order=True
        )
        slo = spec = None
    mask = _species_mask(*pair) if species is not None else None
    if path == "tile":
        from .tile_pairs import tile_pair_hist

        return tile_pair_hist(
            sp, bins.sorted_keys, bins.info.strides, edges_sq, slo,
            sorted_payload=spec[:, 0] if spec is not None else None,
            CB=CB, MAXJ=MAXJ, interpret=interpret, pair_mask=mask,
        )
    packed = pair_lag_hist(
        sp, bins.sorted_keys, bins.info.strides, edges_sq, slo,
        sorted_payload=spec,
        M=M, L=L, interpret=interpret, pair_mask=mask,
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
    path: str = "lag",
    CB: int = 8,
    MAXJ: int | tuple = 8,
    species=None,
    pair: tuple[int, int] | None = None,
):
    """Histogram of unique pair distances over (K-1) shells
    ``edges[k] <= r < edges[k+1]`` (open boundaries; edges ascending,
    ``edges[-1]`` is the effective cutoff). Host-syncing; returns
    ((K-1,) int64 counts, coverage_ok). Exact integer counts — f32
    boundary ties follow the kernel's f32 (or split) distance rounding.

    ``positions_lo``: f32 low parts (`split_f64`) for f64-grade bin
    boundaries in large boxes. ``path="tile"`` (capacity ``MAXJ``) suits
    cubic/wide boxes where the lag bound L degenerates; "lag" (capacity
    ``L``) suits thin boxes.

    ``species`` ((n,) small non-negative ints) + ``pair=(a, b)`` restrict
    to unordered species pairs {a, b} — partial histograms g_AB via a
    payload pair mask, still one fused pass."""
    assert (species is None) == (pair is None), (
        "species and pair go together"
    )
    packed, ok = _cum_hist(
        positions, jnp.asarray(edges), positions_lo=positions_lo,
        M=M, L=L, interpret=interpret, path=path, CB=CB, MAXJ=MAXJ,
        species=species, pair=pair,
    )
    cum = combine_count_vec(packed)
    return cum[1:] - cum[:-1], bool(ok)


def _pbc_keep(wi, wj):
    """PBC image dedup: count each cross-boundary pair at its
    positive-shift appearance (ops.pbc shift-sign rule)."""
    return (wi * wj == 0) & (wi + wj >= 0)


_PBC_SPECIES_MASKS: dict = {}


def _pbc_species_mask(a: int, b: int):
    fn = _PBC_SPECIES_MASKS.get((a, b))
    if fn is None:
        sm = _species_mask(a, b)

        def fn(wi, si, wj, sj):
            return _pbc_keep(wi, wj) & sm(si, sj)

        _PBC_SPECIES_MASKS[(a, b)] = fn
    return fn


def _pbc_cum_hist(positions, origin, box, edges, *, positions_lo, B, G, M,
                  L, interpret, path="lag", CB=8, MAXJ=8, species=None,
                  pair=None, minimage=False):
    from .pbc import (_minimage_bins, _resolve_minimage, pbc_extend,
                      suggest_pbc_capacity)

    n = positions.shape[0]
    dim = positions.shape[1]
    cutoff = edges[-1]
    edges_sq = (jnp.asarray(edges, positions.dtype) ** 2).reshape(-1)
    mimask = _resolve_minimage(box, cutoff, minimage, dim)
    if mimask.any():
        if path != "lag":
            raise ValueError(
                "minimage is a lag-path feature (narrow axes are the lag "
                f"kernel's regime); got path={path!r}"
            )
        if species is None:
            bins, sp, slo, payload, reach, mi_box, ok = _minimage_bins(
                positions, origin, box, cutoff, mimask, B=B, G=G,
                positions_lo=positions_lo, need_perm=False,
            )
            mask = None if payload is None else _pbc_keep
        else:
            # species ride `_minimage_bins` extras (ghosts inherit their
            # parent's species); the pair mask composes with the
            # shift-sign plane only where ghost axes remain
            spec = jnp.asarray(species, positions.dtype).reshape(-1)
            bins, sp, slo, payload, reach, mi_box, ok, sspec = (
                _minimage_bins(
                    positions, origin, box, cutoff, mimask, B=B, G=G,
                    positions_lo=positions_lo, need_perm=False,
                    extra=spec,
                )
            )
            if payload is None:
                payload, mask = sspec, _species_mask(*pair)
            else:
                payload = jnp.concatenate([payload, sspec], axis=1)
                mask = _pbc_species_mask(*pair)
        packed = pair_lag_hist(
            sp, bins.sorted_keys, bins.info.strides, edges_sq, slo,
            sorted_payload=payload, pair_mask=mask,
            M=M, L=L, interpret=interpret, mi_box=mi_box,
            key_reach=reach,
        )
        ok &= lag_coverage_ok(bins.sorted_keys, bins.info.strides, L,
                              reach=reach)
        return packed, ok
    if B is None or G is None:
        Bd, Gd = suggest_pbc_capacity(n, box, cutoff)
        B = Bd if B is None else B
        G = Gd if G is None else G
    if species is not None:
        if path == "tile":
            # the packed block layout has exactly one free payload row,
            # taken by the shift-sign plane; species need the lag path
            raise ValueError("species-resolved PBC histograms need "
                             "path='lag' (one payload row on tile)")
        # ghost images inherit their parent's species via the parent
        # index (one G-sized gather — G << n, the md_run_skin_pbc
        # pattern; invalid ghost rows have far-spread coordinates and
        # never pair, so their species value is irrelevant)
        ext, ext_lo, w, valid, ok, gparent = pbc_extend(
            positions, origin, box, cutoff, B=B, G=G,
            positions_lo=positions_lo, return_parents=True,
        )
        spec = jnp.asarray(species, positions.dtype).reshape(-1)
        ext_spec = jnp.concatenate([spec, spec[gparent]])
    else:
        ext, ext_lo, w, valid, ok = pbc_extend(
            positions, origin, box, cutoff, B=B, G=G,
            positions_lo=positions_lo,
        )
        ext_spec = None
    cols = [ext]
    if ext_lo is not None:
        cols.append(ext_lo)
    cols.append(w[:, None])
    if ext_spec is not None:
        cols.append(ext_spec[:, None])
    bins, sorted_cols = bin_and_sort(
        jnp.concatenate(cols, axis=1), cutoff,
        max_cells=1, need_perm=False, valid=valid, auto_order=True,
    )
    dim = positions.shape[1]
    sp = sorted_cols[:, :dim]
    slo = sorted_cols[:, dim : 2 * dim] if ext_lo is not None else None
    pay0 = dim + (dim if ext_lo is not None else 0)

    if path == "tile":
        from .tile_pairs import tile_pair_hist

        packed, cov = tile_pair_hist(
            sp, bins.sorted_keys, bins.info.strides, edges_sq, slo,
            sorted_payload=sorted_cols[:, pay0],
            CB=CB, MAXJ=MAXJ, interpret=interpret, pair_mask=_pbc_keep,
        )
        return packed, ok & cov
    mask = (
        _pbc_species_mask(*pair) if ext_spec is not None else _pbc_keep
    )
    packed = pair_lag_hist(
        sp, bins.sorted_keys, bins.info.strides, edges_sq, slo,
        sorted_payload=sorted_cols[:, pay0:],
        M=M, L=L, interpret=interpret, pair_mask=mask,
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


def rdf_normalize_partial(counts, edges, na: int, nb: int, volume: float,
                          same: bool):
    """Partial-RDF normalization: ``g_AB = V h / (N_A N_B Vshell)`` for
    A != B (each unordered cross pair counted once), and the
    `rdf_normalize` same-species form when ``same``."""
    import numpy as np

    if same:
        return rdf_normalize(counts, edges, na, volume)
    e = np.asarray(edges, np.float64)
    h = np.asarray(counts, np.float64)
    vshell = 4.0 / 3.0 * np.pi * (e[1:] ** 3 - e[:-1] ** 3)
    g = float(volume) * h / (max(na, 1) * max(nb, 1) * vshell)
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
    path: str = "lag",
    CB: int = 8,
    MAXJ: int | tuple = 8,
    species=None,
    pair: tuple[int, int] | None = None,
    minimage=False,
):
    """Radial distribution function g(r) under orthorhombic PBC
    (minimum image; requires ``box > 2 * edges[-1]`` per axis like every
    `ops.pbc` path). Host-syncing; returns (r_mid, g, coverage_ok).

    Shell counts come from one fused histogram kernel pass over the
    ghost-extended sorted order; normalization is the ideal-gas shell
    count at the box density. ``path="tile"`` runs the segment-tile
    histogram (cubic/wide boxes — the realistic RDF geometry).

    ``species`` ((n,) small non-negative ints) + ``pair=(a, b)`` give the
    partial RDF g_AB (lag path; the species plane rides the kernel
    payload next to the PBC shift-sign plane).

    ``minimage`` ("auto" | False | per-axis mask; lag path) folds narrow
    axes in-kernel instead of building their ghost images
    (`pbc._minimage_bins`) — binned distances are image distances;
    species compose (they ride the binning as extra columns, ghosts on
    any remaining axes inheriting their parent's species)."""
    import numpy as np

    assert (species is None) == (pair is None), (
        "species and pair go together"
    )
    packed, ok = _pbc_cum_hist(
        positions, origin, box, jnp.asarray(edges),
        positions_lo=positions_lo, B=B, G=G, M=M, L=L, interpret=interpret,
        path=path, CB=CB, MAXJ=MAXJ, species=species, pair=pair,
        minimage=minimage,
    )
    cum = combine_count_vec(packed)
    counts = cum[1:] - cum[:-1]
    vol = float(np.prod(np.asarray(box)))
    if pair is None:
        r_mid, g = rdf_normalize(counts, edges, positions.shape[0], vol)
    else:
        sp = np.asarray(species)
        na = int((sp == pair[0]).sum())
        nb = int((sp == pair[1]).sum())
        r_mid, g = rdf_normalize_partial(
            counts, edges, na, nb, vol, same=pair[0] == pair[1]
        )
    return r_mid, g, bool(ok)
