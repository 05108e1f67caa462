"""Cubic/wide-box pair reductions via column decomposition.

The lag kernel's candidate window is the key range W = sum(strides[1:])+1,
which for a box with a large x*y cross-section spans an entire z-layer —
the one geometry where the plain sorted order loses (see
docs/DESIGN_NOTES.md). Fix: decompose the x-y plane into T x T cell
columns and give every particle one copy per column whose *extended*
region (owned cells plus a one-cell shell) contains its cell:

* a cell (cx, cy) belongs to the extended regions of the columns
  {(cx-1)//T, (cx+1)//T} x {(cy-1)//T, (cy+1)//T} — at most 4 distinct
  (exactly 4 copies emitted, duplicates invalidated), ~(1 + 2/T)^2
  valid copies per particle;
* copies sort by a composite key  col_id * COLSPAN + local_key  where the
  local key uses column-local padded strides (x, y fast; z slow), so the
  candidate window inside a column is one (T+2)^2-cell z-slab — thin-box
  economics regardless of the global box shape. Cross-column copy pairs
  differ by >= COLSPAN in key and are masked by the kernel's key window;
* each copy carries an `owner` payload flag (its cell lies in the column's
  owned T x T range). Every cutoff pair appears in exactly one column with
  its larger-slot endpoint owned... more precisely: for each unordered
  pair, the column owning the larger-slot endpoint's cell contains both
  endpoints (cells within +-1), so masking contributions by the
  larger-slot endpoint's owner flag counts each pair exactly once
  globally. This reuses the kernel's payload mechanism — no new Pallas.

Cost vs the thin-box fast path: ~2.25x copies and a somewhat larger L;
versus the naive full-layer window it is O(layer/T^2) faster.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from ..core.geometry import GridInfo, aabb_from_positions
from .pallas_pairs import LANES, count_term, lj_term, pair_lag_reduce

__all__ = ["column_expand", "column_pair_sum", "column_lj_energy"]

# Invalid (duplicate) copies get distinct ascending keys from this base:
# above every real composite key, below the lag kernel's tail-padding key,
# and spaced by 1 so sentinel blocks early-exit the lag loop after ~W
# iterations instead of running to L. Their pair contributions are masked
# by the owner flag regardless.
SENTINEL_BASE = 1 << 29


def column_expand(positions: jax.Array, cutoff, T: int = 4):
    """Expand (n, 3) positions into column copies.

    Returns (pos4 (4n, 3), keys (4n,), owner (4n,), local_strides (3,),
    valid (4n,), headroom_ok). Copies are unsorted; invalid (duplicate)
    copies carry SENTINEL keys.

    ``headroom_ok`` is False when composite keys run out of int32 headroom:
    real keys must stay a key-window W below SENTINEL_BASE, or duplicate-
    copy sentinels (which carry real coordinates) would fall inside the lag
    kernel's key window and contribute spurious pairs silently. Cubic grids
    around ~465^3 cells reach this; the caller must fail or re-grid, never
    proceed (the never-silently-drop invariant).
    """
    n = positions.shape[0]
    aabb = aabb_from_positions(positions)
    info = GridInfo.create(aabb, cutoff)
    cell = info.cell_index(positions)  # (n, 3)
    cx, cy, cz = cell[:, 0], cell[:, 1], cell[:, 2]

    # column-local grid: (T+2) x (T+2) x shape_z cells, +4-padded strides
    sx = jnp.asarray(T + 6, jnp.int32)
    s_local = jnp.stack([jnp.asarray(1, jnp.int32), sx, sx * sx])
    colspan = sx * sx * (info.shape[2] + 4)

    # candidate column coordinates (floor division, negative-safe)
    cxm = jnp.floor_divide(cx - 1, T)
    cxp = jnp.floor_divide(cx + 1, T)
    cym = jnp.floor_divide(cy - 1, T)
    cyp = jnp.floor_divide(cy + 1, T)
    ncols_x = jnp.floor_divide(info.shape[0] - 1, T) + 2  # +slack for edges

    outs = []
    max_col = jnp.asarray(-1, jnp.int32)
    for colx, dup_x in ((cxm, None), (cxp, cxm)):
        for coly, dup_y in ((cym, None), (cyp, cym)):
            dup = jnp.zeros((n,), jnp.bool_)
            if dup_x is not None:
                dup = dup | (colx == dup_x)
            if dup_y is not None:
                dup = dup | (coly == dup_y)
            if dup_x is not None and dup_y is not None:
                # the (cxp, cyp) copy duplicates earlier ones if either
                # axis collapsed
                dup = (colx == dup_x) | (coly == dup_y)
            lx = cx - colx * T + 1  # in [0, T+1]
            ly = cy - coly * T + 1
            lkey = lx + ly * sx + cz * (sx * sx)
            col_id = (colx + 1) + (coly + 1) * ncols_x  # shift: col >= -1
            key = col_id * colspan + lkey
            owner = (
                (cx >= colx * T) & (cx < (colx + 1) * T)
                & (cy >= coly * T) & (cy < (coly + 1) * T)
                & ~dup
            )
            max_col = jnp.maximum(
                max_col, jnp.max(jnp.where(dup, -1, col_id))
            )
            outs.append((key, owner, dup))

    keys = jnp.concatenate([k for k, _, _ in outs])
    owner = jnp.concatenate([o for _, o, _ in outs])
    dup = jnp.concatenate([d for _, _, d in outs])
    iota = jnp.arange(keys.shape[0], dtype=jnp.int32)
    # int32 headroom: the largest real composite key must sit a full key
    # window below the sentinel band. Bound it BEFORE the multiply (in f32,
    # with margin for its ~32-ulp rounding at 2^29) — the keys themselves
    # may already have wrapped int32, so max(keys) cannot be trusted.
    w = s_local[1] + s_local[2] + 1
    key_bound = (max_col.astype(jnp.float32) + 1.0) * colspan.astype(
        jnp.float32
    )
    headroom_ok = key_bound + w.astype(jnp.float32) < float(
        SENTINEL_BASE - 4096
    )
    assert SENTINEL_BASE + 4 * n < jnp.iinfo(jnp.int32).max // 2, (
        "column sentinel keys would collide with kernel padding keys"
    )
    keys = jnp.where(dup, SENTINEL_BASE + iota, keys)
    pos4 = jnp.tile(positions, (4, 1))
    return pos4, keys, owner, s_local, ~dup, headroom_ok, colspan


def _owner_from_keys(skeys, s_local, colspan, T: int):
    """Reconstruct the owner flag from sorted composite keys (valid copies
    own their cell iff the column-local cell coords sit in the owned T x T
    range). Sentinel copies (keys >= SENTINEL_BASE) are never owners.
    Deriving post-sort saves a sort operand AND a per-lag shifted plane."""
    sx = s_local[1]
    lkey = jnp.remainder(skeys, colspan)
    lx = jnp.remainder(lkey, sx)
    ly = jnp.remainder(lkey // sx, sx)
    return (
        (lx >= 1) & (lx <= T) & (ly >= 1) & (ly <= T)
        & (skeys < SENTINEL_BASE)
    )


def _slice_cap(n4: int, T: int, cap_frac: float) -> int:
    """Static row cap after sorting: valid copies (expected (1+2/T)^2 per
    particle) sort before the sentinel band, so the tail can be cut before
    the kernel. cap_frac is safety margin over the expectation."""
    frac = min(1.0, (1.0 + 2.0 / T) ** 2 / 4.0 * cap_frac)
    c = int(-(-int(n4 * frac) // LANES)) * LANES
    return min(n4, max(c, LANES))


@partial(
    jax.jit,
    static_argnames=("T", "M", "L", "term", "interpret", "out_dtype",
                     "cap_frac"),
)
def column_pair_sum(
    positions: jax.Array,
    cutoff,
    positions_lo: jax.Array | None = None,
    *,
    T: int = 3,
    M: int = 1024,
    L: int = 512,
    term: Callable = lj_term,
    interpret: bool = False,
    out_dtype=None,
    cap_frac: float = 1.25,
):
    """Sum term(dsq) over unique cutoff pairs for arbitrary box shapes.

    Full rebuild each call: column expansion -> one sort -> slice off the
    sentinel band -> lag kernel with the owner flag (derived from the
    sorted keys, not sorted along) as an i-side-only payload. Returns
    (total, coverage_ok); coverage_ok also covers the slice capacity
    (valid copies beyond the static cap flag false, never drop).
    """
    pos4, keys, owner, s_local, valid, headroom_ok, colspan = column_expand(
        positions, cutoff, T
    )

    n4 = pos4.shape[0]
    cols = [pos4[:, 0], pos4[:, 1], pos4[:, 2]]
    if positions_lo is not None:
        lo4 = jnp.tile(positions_lo, (4, 1))
        cols += [lo4[:, 0], lo4[:, 1], lo4[:, 2]]
    out = jax.lax.sort((keys, *cols), num_keys=1, is_stable=False)

    # valid copies sort below the sentinel band: cut the tail before the
    # kernel (~4n -> ~(1+2/T)^2 n rows)
    C = _slice_cap(n4, T, cap_frac)
    slice_ok = jnp.sum(valid, dtype=jnp.int32) <= C
    skeys = out[0][:C]
    spos = jnp.stack([c[:C] for c in out[1:4]], axis=-1)
    slo = (
        jnp.stack([c[:C] for c in out[4:7]], axis=-1)
        if positions_lo is not None
        else None
    )
    sflag = _owner_from_keys(skeys, s_local, colspan, T).astype(pos4.dtype)

    def owned_term(dsq, fi):
        # i is the larger-slot endpoint: count the pair iff i's copy owns
        # its cell in this column. Re-guard dsq where the flag masks the
        # pair: sentinel copies of one particle sit at dsq == 0 and
        # term(0) * 0 would produce inf * 0 = nan.
        safe = jnp.where(fi > 0, dsq, jnp.ones_like(dsq))
        return term(safe) * fi

    total = pair_lag_reduce(
        spos,
        skeys,
        jnp.stack(
            [jnp.asarray(1, jnp.int32), s_local[1], s_local[2]]
        ),
        jnp.asarray(cutoff, pos4.dtype) ** 2,
        slo,
        sflag[:, None],
        M=M,
        L=L,
        term=owned_term,
        interpret=interpret,
        out_dtype=out_dtype,
        payload_own_only=True,
    )

    # coverage: within-column window bound (sentinel keys ascend by 1 and
    # satisfy it over any L > W span automatically) + key headroom + slice
    w = s_local[1] + s_local[2] + 1
    if C > L:
        ok = jnp.all(skeys[L:] - skeys[:-L] > w)
    else:
        ok = jnp.asarray(True)
    return total, ok & headroom_ok & slice_ok


def column_lj_energy(positions, cutoff, positions_lo=None, **kw):
    return column_pair_sum(
        positions, cutoff, positions_lo, term=lj_term, **kw
    )


def column_lj_forces(
    positions: jax.Array,
    cutoff,
    positions_lo: jax.Array | None = None,
    *,
    T: int = 3,
    M: int = 1024,
    L: int = 512,
    gfn: Callable = None,
    interpret: bool = False,
    cap_frac: float = 1.25,
):
    """Per-particle pairwise forces for arbitrary box shapes, input order.

    Within a column, the forces kernel accumulates both force sides onto
    each copy's slot (i-side directly, j-side via the Horner shift). A
    particle's OWNER copy sees its complete stencil (the extended region
    covers owned cells +-1), so owner-copy sums are the exact full forces;
    ghost copies hold partial sums and are discarded. Extraction back to
    input order uses a second small sort keyed by (is_ghost, particle id),
    with the ghost flag derived from the sorted keys. Split-precision hi/lo
    planes are supported like the energy path.

    Returns ((n, 3) forces, coverage_ok).
    """
    from .lj import lj_force_factor
    from .pallas_pairs import pair_lag_forces

    if gfn is None:
        gfn = lj_force_factor
    n = positions.shape[0]
    pos4, keys, owner, s_local, valid, headroom_ok, colspan = column_expand(
        positions, cutoff, T
    )
    pid = jnp.tile(jnp.arange(n, dtype=jnp.int32), 4)

    cols = [pos4[:, 0], pos4[:, 1], pos4[:, 2]]
    if positions_lo is not None:
        lo4 = jnp.tile(positions_lo, (4, 1))
        cols += [lo4[:, 0], lo4[:, 1], lo4[:, 2]]
    out = jax.lax.sort((keys, *cols, pid), num_keys=1, is_stable=False)
    n4 = pos4.shape[0]
    C = _slice_cap(n4, T, cap_frac)
    slice_ok = jnp.sum(valid, dtype=jnp.int32) <= C
    skeys = out[0][:C]
    spos = jnp.stack([c[:C] for c in out[1:4]], axis=-1)
    slo = (
        jnp.stack([c[:C] for c in out[4:7]], axis=-1)
        if positions_lo is not None
        else None
    )
    spid = out[-1][:C]
    sghost = (~_owner_from_keys(skeys, s_local, colspan, T)).astype(jnp.int32)

    f = pair_lag_forces(
        spos,
        skeys,
        jnp.stack([jnp.asarray(1, jnp.int32), s_local[1], s_local[2]]),
        jnp.asarray(cutoff, pos4.dtype) ** 2,
        slo,
        M=M,
        L=L,
        gfn=gfn,
        interpret=interpret,
    )

    # owner copies first (ghost = 0), ordered by particle id
    order_key = sghost * jnp.asarray(n, jnp.int32) + spid
    out2 = jax.lax.sort(
        (order_key, f[:, 0], f[:, 1], f[:, 2]), num_keys=1, is_stable=False
    )
    forces = jnp.stack([out2[1][:n], out2[2][:n], out2[3][:n]], axis=-1)

    w = s_local[1] + s_local[2] + 1
    ok = (
        jnp.all(skeys[L:] - skeys[:-L] > w) if C > L else jnp.asarray(True)
    )
    return forces, ok & headroom_ok & slice_ok
