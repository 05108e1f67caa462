"""Periodic boundary conditions via ghost-image extension.

An extension beyond the reference (zelll is free-boundary only: its
LAMMPS harness pins ``boundary f f f``, more_benches/in.zelllbench.txt).
MD production runs need orthorhombic PBC, and the sorted-order design
admits it without touching any kernel:

* **Ghost images.** Every particle within ``cutoff`` of a box face gets
  image copies shifted by the box vector across that face (up to 7 for a
  corner particle — one per non-empty subset of its adjacent faces).
  Images land within ``cutoff`` *outside* the box, so the grid simply
  grows by one cell layer; binning, sorting, and the lag kernels are
  unchanged.
* **Forces need no masking at all.** `pallas_pairs.pair_lag_forces`
  evaluates each unique (slot-ordered) pair once and writes BOTH
  endpoints (Newton). A cross-boundary pair {i, j} appears twice in the
  extended array — as {real_i, image_j(s)} and {real_j, image_i(-s)} —
  and each real endpoint receives its full force from its own copy; the
  reactions land on ghost rows, which are dropped after un-sorting.
  Ghost-ghost pairs only ever write ghost rows.
* **Energies/counts are masked to count each pair once.** A payload
  plane ``w`` carries 0 for real rows and the lexicographic sign (+/-1)
  of the image shift for ghosts. Of the two appearances of a cross pair
  exactly one partners a positive-shift ghost, so
  ``keep = (w_i * w_j == 0) & (w_i + w_j >= 0)`` counts real-real pairs
  by the normal slot rule, cross pairs once, and ghost-ghost pairs
  (always a duplicate of some real-ghost pair) never.

Correctness bound: each axis must satisfy ``box > 2 * cutoff`` (the
minimum-image regime — at most one image of any particle can be within
cutoff of anything). The returned flag goes False otherwise, and when
the static boundary/ghost capacities ``B``/``G`` are exceeded (grow and
re-jit; never silently drop pairs).

Static shapes throughout: ghost construction compacts candidates with
multi-operand sorts (never an n-sized gather/scatter), invalid candidate
rows get far-apart spread coordinates so they cannot pair with anything
(their keys are SENTINEL and sort last, but padding keys are only
guaranteed non-pairing against *real* keys — coordinates are the
backstop for padding-vs-padding).

Dimensions: the fused kernel paths ("lag", "tile") are 3D; 2D periodic
boxes route to the XLA per-particle path automatically (``path="xla"``,
per-particle half-energies summed over real rows — the reference is
generic over N, lib.rs:132-135). `parallel.pbc` scales the 3D paths
over a device mesh.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp

from ..core.binning import bin_and_sort
from .pallas_pairs import (
    combine_count,
    count_term,
    lag_coverage_ok,
    lj_term,
    pair_lag_forces,
    pair_lag_reduce,
)

__all__ = [
    "wrap_positions",
    "suggest_pbc_capacity",
    "pbc_extend",
    "pbc_pair_sum",
    "pbc_lj_energy",
    "pbc_count_pairs",
    "pbc_lj_forces",
    "md_step_pbc",
    "minimage_axes",
]


def minimage_axes(box, cutoff, max_cells: int = 4):
    """Host-side per-axis choice: in-kernel minimum image vs ghost images.

    An axis spanning only a few cells (``ceil(box/cutoff) <= max_cells``)
    is cheaper to fold in-kernel: EVERY cell along it is wrap-adjacent to
    every other, so widening the key window by ``(ncells-1) * stride``
    admits all partners and `pallas_pairs._mi_pair_d` folds the
    separation — NO ghost rows at all. The reference benchmark box
    (30 x 30 x n/9, cutoff 10 — 3 cells in x/y) makes ~100% of particles
    boundary under ghost extension (G ~ 2.8n, the round-1 10.8x row);
    with x/y min-imaged only the long axis keeps its thin ghost shell.
    Wide axes stay ghost-imaged: their reach would multiply a large
    stride into the key window.

    The largest-extent axis is never min-imaged: under auto-ordered
    strides it carries the major stride, so its widened window
    ``(ncells-1) * stride_major`` would degenerate the lag window toward
    all-pairs (observed: a 4-cell cube flagged under-capacity at L=1024).
    Ghost-extending one axis is always cheap (a thin shell).

    Returns a (dim,) bool ndarray (True = fold in-kernel).
    """
    import numpy as np

    b = np.asarray(box, np.float64).reshape(-1)
    mask = np.ceil(b / float(cutoff)).astype(int) <= max_cells
    mask[int(np.argmax(b))] = False
    return mask


def _resolve_minimage(box, cutoff, minimage, dim):
    """-> (dim,) bool ndarray from a `minimage` spec (False | "auto" |
    explicit mask). Host-side: the split is static kernel configuration."""
    import numpy as np

    if minimage is False or minimage is None:
        return np.zeros(dim, bool)
    if minimage == "auto":
        # the fold is a 3D lag-kernel feature; "auto" degrades to the
        # ghost/XLA path elsewhere (an EXPLICIT mask on dim != 3 raises
        # at the path check instead — never silently ignored)
        if dim != 3:
            return np.zeros(dim, bool)
        return minimage_axes(box, cutoff)
    out = np.asarray(minimage, bool).reshape(dim)
    return out

def _subsets(dim: int):
    """Non-empty subsets of the axes (2^dim - 1): which of a particle's
    adjacent faces contribute to this image's shift vector."""
    from itertools import product

    return tuple(m for m in product((0, 1), repeat=dim) if any(m))


def wrap_positions(positions, origin, box):
    """Wrap positions into [origin, origin + box) per axis.

    In-box coordinates are returned bit-identically (the mod round trip
    is only applied where needed), so split-precision (hi, lo) planes of
    already-wrapped data stay exact.
    """
    origin = jnp.asarray(origin, positions.dtype)
    box = jnp.asarray(box, positions.dtype)
    inside = (positions >= origin) & (positions < origin + box)
    wrapped = origin + jnp.mod(positions - origin, box)
    # mod can return exactly box for tiny negative offsets; clamp back in
    wrapped = jnp.where(wrapped >= origin + box, origin, wrapped)
    return jnp.where(inside, positions, wrapped)


def suggest_pbc_capacity(
    n: int, box, cutoff, safety: float = 1.6, axes=None,
    with_multi: bool = False,
):
    """Host-side (B, G[, BE]) capacity estimate for `pbc_extend`.

    B bounds the boundary-particle count (fraction within cutoff of any
    face, assuming roughly uniform density), G the ghost-image count
    (faces dominate; edge/corner images are second order — the safety
    factor and the coverage flag absorb them). ``axes`` restricts the
    estimate to the axes that actually get images (min-imaged axes
    contribute no ghosts). ``with_multi=True`` additionally returns BE,
    the multi-face (edge/corner) row capacity: ~2% of B for cubic
    boxes, most of B for thin ones — `pbc_extend` only generates
    edge/corner image candidates for those rows.
    """
    import numpy as np

    box = np.asarray(box, np.float64)
    c = float(cutoff)
    frac_face = np.minimum(2.0 * c / box, 1.0)
    if axes is not None:
        frac_face = np.where(np.asarray(axes, bool), frac_face, 0.0)
    frac_any = 1.0 - np.prod(1.0 - frac_face)
    # expected images per particle: one per adjacent-face subset
    exp_images = np.prod(1.0 + frac_face) - 1.0
    n_img = 2 ** len(box) - 1
    B = int(np.ceil(n * min(1.0, frac_any * safety))) + 8
    G = int(np.ceil(n * min(float(n_img), exp_images * safety))) + 8
    round_up = lambda v: max(128, -(-v // 128) * 128)
    Bc, Gc = min(round_up(B), n), min(round_up(G), n_img * n)
    if not with_multi:
        return Bc, Gc
    # P(near >= 2 faces) = P(>= 1) - P(exactly 1)
    p_eq1 = sum(
        f * np.prod([1.0 - g for j, g in enumerate(frac_face) if j != a])
        for a, f in enumerate(frac_face)
    )
    p_multi = max(float(frac_any - p_eq1), 0.0)
    BE = int(np.ceil(n * min(1.0, p_multi * safety * 1.5))) + 8
    return Bc, Gc, min(round_up(BE), Bc)


def _twosum(a, b):
    """Error-free transform: a + b == s + err exactly (Knuth two-sum)."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


@functools.partial(
    jax.jit,
    static_argnames=("B", "G", "wrap", "return_parents", "axes", "BE"),
)
def pbc_extend(
    positions: jax.Array,  # (n, dim)
    origin,
    box,
    cutoff,
    *,
    B: int,
    G: int,
    positions_lo: jax.Array | None = None,
    wrap: bool = True,
    return_parents: bool = False,
    axes: tuple | None = None,
    BE: int | None = None,
):
    """Append ghost images of boundary particles for orthorhombic PBC.

    Returns ``(ext_pos (n+G, 3), ext_lo (n+G, 3) | None, w (n+G,),
    valid (n+G,), ok)`` where ``w`` is 0 for real rows and the
    lexicographic shift sign (+/-1, as ``positions.dtype``) for ghosts,
    ``valid`` marks real rows and live ghosts (feed it to
    `bin_and_sort`), and ``ok`` is False when any ``box <= 2 * cutoff``,
    more than ``B`` particles sit within cutoff of a face, or more than
    ``G`` images are needed.

    ``positions_lo`` (f32 low planes, see `pallas_pairs.split_f64`)
    propagates split precision: ghost low parts absorb the exact two-sum
    residual of ``hi + shift * box``, so split pair separations stay
    f64-grade across the boundary.

    ``return_parents=True`` appends a (G,) int32 array of each ghost's
    parent INPUT index (garbage for invalid rows) — the Verlet-skin PBC
    loop uses it to track ghost positions between rebuilds.
    """
    n, dim = positions.shape
    assert dim in (2, 3), "pbc_extend supports dim 2 and 3"
    subsets = _subsets(dim)
    n_img = len(subsets)  # 3 (2D) or 7 (3D)
    assert B >= 1 and G >= 1
    B = min(B, n)  # stage 1 slices the n-row boundary sort
    # multi-face (edge/corner) row capacity: geometry-dependent — ~2% of
    # B for cubic boxes, ~all of B for thin ones. Default SAFE (= B, the
    # old 7B-candidate behavior); `suggest_pbc_capacity(with_multi=True)`
    # provides the tight value and the flag below guards it.
    BE = B if BE is None else min(max(BE, 128), B)
    # ghosts only come from dim*B face + (n_img - dim)*BE multi candidates
    G = min(G, dim * B + (n_img - dim) * BE)
    dtype = positions.dtype
    split = positions_lo is not None
    origin = jnp.asarray(origin, dtype).reshape(dim)
    box = jnp.asarray(box, dtype).reshape(dim)
    cutoff = jnp.asarray(cutoff, dtype)

    pos = wrap_positions(positions, origin, box) if wrap else positions
    if split:
        # wrapping must not silently break the hi+lo decomposition: lo
        # planes are only meaningful for in-box input (wrap_positions
        # keeps those bit-identical)
        pos_lo = positions_lo.astype(dtype)

    # per-axis image shift: +1 near the low face (image beyond the high
    # face), -1 near the high face; box > 2*cutoff makes them exclusive.
    # Guarded to in-box coordinates per axis: with ``wrap=False`` (the
    # sharded pool path) out-of-box rows — ring-shifted halo ghosts,
    # partitioner pads — must never re-image back INTO the box (a
    # resurrected duplicate of a real particle would silently double
    # pairs); they may still take images along their other, in-box axes
    # (corner pairs across slab boundaries need exactly those).
    s = ((pos >= origin) & (pos < origin + cutoff)).astype(jnp.int32) - (
        (pos >= origin + box - cutoff) & (pos < origin + box)
    ).astype(jnp.int32)
    if axes is not None:
        # images only along the selected axes (min-imaged axes fold
        # in-kernel and must not also get ghost copies)
        s = s * jnp.asarray([int(bool(a)) for a in axes], jnp.int32)
    ok = jnp.all(box > 2 * cutoff)
    near = jnp.any(s != 0, axis=1)
    ok &= jnp.sum(near, dtype=jnp.int32) <= B

    # stage 1: locate boundary particles with a TWO-operand sort
    # (class key + row index) and gather only the B boundary rows'
    # data. The no-gather rule is about n-scale gathers (~7 ns/element);
    # B << n makes the gathers far cheaper than carrying coordinates
    # (+ split planes + shift codes) through the n-row sort — measured
    # ~25 ms off pbc_extend at n = 1e7.
    key1 = (~near).astype(jnp.int32)
    iota_n = jnp.arange(n, dtype=jnp.int32)
    out1 = jax.lax.sort((key1, iota_n), num_keys=1, is_stable=False)
    bvalid = out1[0][:B] == 0
    bpar = out1[1][:B]
    bpos = jnp.take(pos, bpar, axis=0)
    bs = jnp.take(s, bpar, axis=0)
    if split:
        blo = jnp.take(pos_lo, bpar, axis=0)

    # stage 2: images per boundary particle, compact to G. A multi-axis
    # subset (edge/corner image) is valid only for rows near >= 2 faces
    # — ~2% of boundary rows at cubic bench shapes — so generating all
    # 2^dim - 1 subsets for every row made ~91% of the 7B candidates
    # dead weight in the compaction sort (measured ~58 ms of the 83 ms
    # pbc_extend at n = 1e7). Compact the multi-face rows first (one
    # B-row 2-op sort + BE-sized gathers) and emit multi-axis candidates
    # only for them: candidates drop from 7B to 3B + 4*BE.
    lex = jnp.asarray([3 ** (dim - 1 - a) for a in range(dim)], jnp.int32)
    singles = [m for m in subsets if sum(m) == 1]
    multis = [m for m in subsets if sum(m) >= 2]
    nfaces = jnp.sum(bs != 0, axis=1)
    is_multi = bvalid & (nfaces >= 2)
    ok &= jnp.sum(is_multi, dtype=jnp.int32) <= BE
    oute = jax.lax.sort(
        ((~is_multi).astype(jnp.int32), jnp.arange(B, dtype=jnp.int32)),
        num_keys=1, is_stable=False,
    )
    evalid = oute[0][:BE] == 0
    eidx = oute[1][:BE]
    epos = jnp.take(bpos, eidx, axis=0)
    es = jnp.take(bs, eidx, axis=0)
    epar = jnp.take(bpar, eidx)
    if split:
        elo = jnp.take(blo, eidx, axis=0)

    cand_pos, cand_lo, cand_sign, cand_valid, cand_par = [], [], [], [], []

    def emit(m, mpos, mlo, ms_, mvalid, mpar):
        mv = jnp.asarray(m, jnp.int32)
        sv = ms_ * mv  # this image's shift vector
        v = mvalid & jnp.all((ms_ != 0) | (mv == 0), axis=1)
        shift = sv.astype(dtype) * box
        img, err = _twosum(mpos, shift)
        t = sv @ lex  # lexicographic order statistic, != 0 when v
        cand_pos.append(img)
        if split:
            cand_lo.append(mlo + err)
        cand_sign.append(jnp.where(t > 0, 1, -1).astype(jnp.int32))
        cand_valid.append(v)
        cand_par.append(mpar)

    for m in singles:
        emit(m, bpos, blo if split else None, bs, bvalid, bpar)
    for m in multis:
        emit(m, epos, elo if split else None, es, evalid, epar)
    cpos = jnp.concatenate(cand_pos)
    csign = jnp.concatenate(cand_sign)
    cvalid = jnp.concatenate(cand_valid)
    cpar = jnp.concatenate(cand_par)
    ok &= jnp.sum(cvalid, dtype=jnp.int32) <= G

    key2 = (~cvalid).astype(jnp.int32)
    ops2 = (key2,) + tuple(cpos[:, a] for a in range(dim)) + (csign, cpar)
    if split:
        clo = jnp.concatenate(cand_lo)
        ops2 = ops2 + tuple(clo[:, a] for a in range(dim))
    out2 = jax.lax.sort(ops2, num_keys=1, is_stable=False)
    gvalid = out2[0][:G] == 0
    gpos = jnp.stack([out2[1 + a][:G] for a in range(dim)], axis=-1)
    gsign = jnp.where(gvalid, out2[1 + dim][:G], 0)
    gparent = out2[2 + dim][:G]

    # invalid ghost rows carry stale (real-looking) coordinates; replace
    # with far-apart spread values so no padding row can pair with
    # anything. A 2D spread grid in this module's OWN coordinate family
    # (base 4e12 — the kernels' tail padding owns 7e12, api._pad_far owns
    # 1e12; families must never coincide at dsq == 0 because the energy
    # kernel has no dsq > 0 exclusion). Spacing 2^20 is an exact multiple
    # of the f32 ulp at 4e12 (2^19): rows stay >= 2^20 apart after
    # rounding instead of quantizing onto each other, and the grid extent
    # sqrt(G)*2^20 stays far inside the binade.
    k = jnp.arange(1, G + 1, dtype=dtype)
    side = float(int(G**0.5) + 2)
    s = jnp.asarray(2.0**20, dtype)
    base = jnp.asarray(4e12, dtype)
    gx = base + jnp.mod(k, side) * s
    gy = base + (jnp.floor_divide(k, side) + 1) * s
    rest = [jnp.full((G,), base, dtype)] * (dim - 2)
    spread = jnp.stack([gx, gy, *rest], axis=-1)
    gpos = jnp.where(gvalid[:, None], gpos, spread)
    ok &= 4 * cutoff <= 2.0**20

    ext_pos = jnp.concatenate([pos, gpos])
    w = jnp.concatenate(
        [jnp.zeros((n,), dtype), gsign.astype(dtype)]
    )
    valid = jnp.concatenate([jnp.ones((n,), jnp.bool_), gvalid])
    if split:
        glo = jnp.stack(
            [out2[3 + dim + a][:G] for a in range(dim)], axis=-1
        )
        glo = jnp.where(gvalid[:, None], glo, jnp.zeros_like(glo))
        ext_lo = jnp.concatenate([pos_lo, glo])
    else:
        ext_lo = None
    if return_parents:
        return ext_pos, ext_lo, w, valid, ok, gparent
    return ext_pos, ext_lo, w, valid, ok


# negative-key padding family for invalid prepend-ghost rows: strictly
# ascending keys far below any real key (real flat keys are >= -S_major
# for the single prepended image cell), so the concatenated key array
# stays ascending and `lag_coverage_ok` never sees a mid-array SENTINEL
# (which would flag the grid uncovered forever).
_NEG_PAD_KEY_BASE = -(2**28)


def _minimage_bins_sorted_extremes(positions, origin, box, cutoff, mimask,
                                   *, B, positions_lo, need_perm,
                                   stable: bool | None = None):
    """Fast `_minimage_bins` when the ONLY ghost axis is the major-stride
    axis (the ``minimage="auto"`` shape): the ghost axis's boundary rows
    are the two ENDS of the key-sorted array, so the periodic extension
    is slice + shift + concat — the n-row boundary-compaction sort of
    `pbc_extend` (and the larger n+G bin sort) disappear; only two
    B-row block sorts remain.

    Cells are exactly cutoff wide, so the low-face boundary rows
    (z < origin + c) are EXACTLY the z-cell-0 rows — a contiguous sorted
    prefix; the high-face rows are the top cell(s) — a contiguous
    suffix. Their images keep relative order up to cell-boundary
    reshuffling (box/cutoff is not integral), handled by one small sort
    per block; on the append side the images land in the same top cell
    as real rows (the grid anchors cells at the origin, so only the low
    face is cell-aligned), so the tail MERGE region (top real cell + the
    appended block) is re-sorted — capacity B2, flag-guarded.

    Returns the `_minimage_bins` tuple.
    """
    import numpy as np

    from ..core.binning import bin_and_sort
    from ..core.geometry import Aabb, GridInfo

    n, dim = positions.shape
    dtype = positions.dtype
    gaxis = int(np.flatnonzero(~mimask)[0])
    originj = jnp.asarray(origin, dtype).reshape(dim)
    boxj = jnp.asarray(box, dtype).reshape(dim)
    cutj = jnp.asarray(cutoff, dtype)
    pos = wrap_positions(positions, originj, boxj)
    ok = jnp.all(boxj > 2 * cutj)

    info = GridInfo.create(
        Aabb(originj, originj + boxj), cutoff, auto_order=True
    )
    split = positions_lo is not None
    cols = [pos] + ([positions_lo] if split else [])
    stacked = jnp.concatenate(cols, axis=1) if split else pos
    bins, sorted_cols = bin_and_sort(
        stacked, cutoff, max_cells=1, need_perm=need_perm, info=info,
        stable=stable,
    )
    sp = sorted_cols[:, :dim]
    slo = sorted_cols[:, dim : 2 * dim] if split else None
    keys = bins.sorted_keys
    perm = bins.perm if need_perm else None
    # append-side padding keys must stay above every real key
    ok &= keys[n - 1] < jnp.int32(_PAD_KEY_BASE_APPEND)

    B = min(B, n)
    # merge-region capacity: only containment matters (flagged below);
    # clamping to n keeps the region inside the real+append tail, so the
    # oversized-B-heuristic case (2B > n) no longer trips spuriously
    B2 = min(max(2 * B, 512), n)
    zg = sp[:, gaxis]
    low_face = originj[gaxis] + cutj
    high_face = originj[gaxis] + boxj[gaxis] - cutj
    # capacity flags (full-n compares are cheap; never silently drop).
    # Low face: cells are origin-anchored, so z < origin + c is EXACTLY
    # the cell-0 rows — a contiguous sorted prefix, and a count check is
    # a containment check.
    n_low = jnp.sum(zg < low_face, dtype=jnp.int32)
    # High face: when box/cutoff is non-integral the rows with
    # z >= box - c span the top TWO major cells (nz_top - 1 and nz_top)
    # and are interleaved by minor key with non-boundary rows of cell
    # nz_top - 1 — they are NOT a contiguous suffix. Flag CONTAINMENT,
    # not count: every row whose float-consistent major cell (the same
    # floor((z - origin)/c) the keys use) is >= nz_top - 1 must fit in
    # the sp[n - B:] slice, so no boundary row can sit outside it.
    zcell = jnp.floor((zg - originj[gaxis]) / cutj).astype(jnp.int32)
    nz_top = jnp.floor(boxj[gaxis] / cutj).astype(jnp.int32)
    n_face2 = jnp.sum(zcell >= nz_top - 1, dtype=jnp.int32)
    # top real cell index anchors the merge region: count rows whose
    # cell is >= floor(box/c), the lowest cell an appended image can
    # land in
    n_topcell = jnp.sum(zcell >= nz_top, dtype=jnp.int32)
    ok &= (n_low <= B) & (n_face2 <= B) & (n_topcell + B <= B2)

    iota_b = jnp.arange(B, dtype=jnp.int32)
    spacing = jnp.int32(2**10)

    def ghost_block(block_sp, block_slo, sign, pad_k):
        """Shift a B-row boundary slice by sign*box along gaxis, recompute
        keys, pad invalid rows (spread coords, family-disjoint), and sort
        the block by key. sign=+1: append block (images beyond the high
        face, from low-face rows); sign=-1: prepend block."""
        z = block_sp[:, gaxis]
        valid = (z < low_face) if sign > 0 else (z >= high_face)
        shift = sign * boxj[gaxis]
        zs, err = _twosum(z, shift)
        gsp = block_sp.at[:, gaxis].set(zs)
        if split:
            gslo = block_slo.at[:, gaxis].add(err)
        k = jax.vmap(info.flat_cell_index)(gsp)
        if sign > 0:
            padk = jnp.int32(_PAD_KEY_BASE_APPEND) + iota_b * spacing
        else:
            padk = jnp.int32(_NEG_PAD_KEY_BASE) + iota_b * spacing
        k = jnp.where(valid, k, padk)
        # invalid rows: far-spread coordinates in the module's 4e12
        # family, offset by pad_k*B so the two blocks stay disjoint
        kk = (iota_b + 1 + pad_k * B).astype(dtype)
        side = jnp.asarray(float(int((2 * B) ** 0.5) + 2), dtype)
        s_ = jnp.asarray(2.0**20, dtype)
        base = jnp.asarray(4e12, dtype)
        gx = base + jnp.mod(kk, side) * s_
        gy = base + (jnp.floor_divide(kk, side) + 1) * s_
        spread = jnp.stack(
            [gx, gy] + [jnp.full((B,), base, dtype)] * (dim - 2), axis=-1
        )
        gsp = jnp.where(valid[:, None], gsp, spread)
        w = jnp.where(valid, jnp.asarray(float(sign), dtype),
                      jnp.zeros((), dtype))
        ops = (k,) + tuple(gsp[:, a] for a in range(dim)) + (w,)
        if need_perm:
            ops = ops + (n + iota_b,)  # ghosts drop in the un-sort
        if split:
            gslo = jnp.where(valid[:, None], gslo, jnp.zeros_like(gslo))
            ops = ops + tuple(gslo[:, a] for a in range(dim))
        out = jax.lax.sort(ops, num_keys=1, is_stable=False)
        osp = jnp.stack(out[1 : 1 + dim], axis=-1)
        ow = out[1 + dim]
        operm = out[2 + dim] if need_perm else None
        off = (2 if need_perm else 1) + dim
        oslo = (
            jnp.stack(out[off + 1 : off + 1 + dim], axis=-1)
            if split else None
        )
        return out[0], osp, oslo, ow, operm

    pre_k, pre_sp, pre_slo, pre_w, pre_perm = ghost_block(
        sp[n - B :], slo[n - B :] if split else None, -1, 0
    )
    app_k, app_sp, app_slo, app_w, app_perm = ghost_block(
        sp[:B], slo[:B] if split else None, +1, 1
    )

    # concat; then re-sort the tail MERGE region (last B2 real rows +
    # appended block) — appended images share the top real cell
    ext_k = jnp.concatenate([pre_k, keys, app_k])
    ext_sp = jnp.concatenate([pre_sp, sp, app_sp])
    ext_w = jnp.concatenate(
        [pre_w, jnp.zeros((n,), dtype), app_w]
    )
    ext_perm = (
        jnp.concatenate([pre_perm, perm, app_perm]) if need_perm else None
    )
    ext_slo = (
        jnp.concatenate([pre_slo, slo, app_slo]) if split else None
    )
    T = B2 + B  # merge-region rows at the array tail
    mops = (ext_k[-T:],) + tuple(ext_sp[-T:, a] for a in range(dim)) + (
        ext_w[-T:],
    )
    if need_perm:
        mops = mops + (ext_perm[-T:],)
    if split:
        mops = mops + tuple(ext_slo[-T:, a] for a in range(dim))
    mout = jax.lax.sort(mops, num_keys=1, is_stable=False)
    ext_k = jnp.concatenate([ext_k[:-T], mout[0]])
    ext_sp = jnp.concatenate(
        [ext_sp[:-T], jnp.stack(mout[1 : 1 + dim], axis=-1)]
    )
    ext_w = jnp.concatenate([ext_w[:-T], mout[1 + dim]])
    off = (2 if need_perm else 1) + dim
    if need_perm:
        ext_perm = jnp.concatenate([ext_perm[:-T], mout[2 + dim]])
    if split:
        ext_slo = jnp.concatenate(
            [ext_slo[:-T], jnp.stack(mout[off + 1 : off + 1 + dim],
                                     axis=-1)]
        )

    b64 = np.asarray(box, np.float64).reshape(dim)
    reach = tuple(
        max(int(np.ceil(b64[a] / float(cutoff))) - 1, 1) if mimask[a] else 1
        for a in range(dim)
    )
    mi_box = jnp.where(jnp.asarray(mimask), boxj, jnp.zeros_like(boxj))

    class _Bins:
        pass

    out_bins = _Bins()
    out_bins.sorted_keys = ext_k
    out_bins.info = info
    out_bins.perm = ext_perm
    return out_bins, ext_sp, ext_slo, ext_w[:, None], reach, mi_box, ok


# append-side padding keys: above every shifted image key (images sit at
# most two cells beyond the top real cell) yet far below int32 overflow
# after per-row spacing; distinct from pallas_pairs._PAD_KEY_BASE (the
# kernels' own tail family, which `_pad_and_desentinel` appends LAST —
# these must stay below it so the tail padding remains the maximum).
_PAD_KEY_BASE_APPEND = 2**28


def _minimage_bins(positions, origin, box, cutoff, mimask, *, B, G,
                   positions_lo, need_perm, extra=None,
                   stable: bool | None = None):
    """Shared binning for the min-image lag paths: wrap, extend ghosts
    along the NON-min-imaged axes only (or skip extension entirely when
    every axis folds in-kernel), and bin on the box aabb (the full
    periodic extent — the grid must cover the box even where no particle
    sits, so wrap-adjacent reach math is exact).

    ``extra`` ((n, k) per-particle columns, e.g. species): rides the
    sort; ghost rows inherit their PARENT's values (one G-sized gather,
    G << n — the `_pbc_cum_hist` species pattern). Extras take the
    general path (the sorted-extremes fast path is a pure-coordinate
    machine; correctness first, it falls back).

    Returns (bins, sp, slo, payload, reach, mi_box, ok[, sorted_extra])
    — the trailing element only when ``extra`` is given."""
    import numpy as np

    from ..core.geometry import Aabb, GridInfo

    n, dim = positions.shape
    dtype = positions.dtype
    # fast path: one ghost axis and it is the largest-extent axis (the
    # `minimage="auto"` shape) — boundary rows are the sorted extremes,
    # so the n-row ghost-compaction sort disappears
    ghost_axes_idx = np.flatnonzero(~mimask)
    if (
        extra is None
        and len(ghost_axes_idx) == 1
        and ghost_axes_idx[0]
        == int(np.argmax(np.asarray(box, np.float64).reshape(-1)))
        and n >= 512
    ):
        if B is None:
            B = suggest_pbc_capacity(n, box, cutoff, axes=~mimask)[0]
        return _minimage_bins_sorted_extremes(
            positions, origin, box, cutoff, mimask, B=B,
            positions_lo=positions_lo, need_perm=need_perm, stable=stable,
        )
    originj = jnp.asarray(origin, dtype).reshape(dim)
    boxj = jnp.asarray(box, dtype).reshape(dim)
    cutj = jnp.asarray(cutoff, dtype)
    pos = wrap_positions(positions, originj, boxj)
    ok = jnp.all(boxj > 2 * cutj)
    ext_extra = None if extra is None else (
        jnp.asarray(extra, dtype).reshape(n, -1)
    )
    if bool(mimask.all()):
        ext, ext_lo, w, valid = pos, positions_lo, None, None
    else:
        ghost_axes = tuple(bool(x) for x in ~mimask)
        if B is None or G is None:
            Bd, Gd = suggest_pbc_capacity(n, box, cutoff, axes=~mimask)
            B = Bd if B is None else B
            G = Gd if G is None else G
        if extra is None:
            ext, ext_lo, w, valid, okx = pbc_extend(
                pos, originj, boxj, cutoff, B=B, G=G,
                positions_lo=positions_lo, wrap=False, axes=ghost_axes,
            )
        else:
            ext, ext_lo, w, valid, okx, gparent = pbc_extend(
                pos, originj, boxj, cutoff, B=B, G=G,
                positions_lo=positions_lo, wrap=False, axes=ghost_axes,
                return_parents=True,
            )
            ext_extra = jnp.concatenate([ext_extra, ext_extra[gparent]])
        ok &= okx
    info = GridInfo.create(
        Aabb(originj, originj + boxj), cutoff, auto_order=True
    )
    cols = [ext]
    if ext_lo is not None:
        cols.append(ext_lo)
    if w is not None:
        cols.append(w[:, None])
    n_extra = 0 if ext_extra is None else ext_extra.shape[1]
    if n_extra:
        cols.append(ext_extra)
    stacked = jnp.concatenate(cols, axis=1) if len(cols) > 1 else ext
    bins, sorted_cols = bin_and_sort(
        stacked, cutoff, max_cells=1, need_perm=need_perm, valid=valid,
        stable=stable,
        info=info,
    )
    sp = sorted_cols[:, :dim]
    slo = sorted_cols[:, dim : 2 * dim] if ext_lo is not None else None
    pay_end = sorted_cols.shape[1] - n_extra
    payload = sorted_cols[:, pay_end - 1 : pay_end] if w is not None else None
    sorted_extra = sorted_cols[:, pay_end:] if n_extra else None
    b64 = np.asarray(box, np.float64).reshape(dim)
    reach = tuple(
        max(int(np.ceil(b64[a] / float(cutoff))) - 1, 1) if mimask[a] else 1
        for a in range(dim)
    )
    mi_box = jnp.where(jnp.asarray(mimask), boxj, jnp.zeros_like(boxj))
    base = (bins, sp, slo, payload, reach, mi_box, ok)
    return base + (sorted_extra,) if extra is not None else base


def _minimage_pair_sum(positions, origin, box, cutoff, mimask, *, term,
                       B, G, M, L, interpret, out_dtype, positions_lo):
    """Lag-path pair sum with in-kernel minimum image on ``mimask`` axes
    (ghost extension only along the rest). Returns (total, ok)."""
    bins, sp, slo, payload, reach, mi_box, ok = _minimage_bins(
        positions, origin, box, cutoff, mimask, B=B, G=G,
        positions_lo=positions_lo, need_perm=False,
    )
    csq = jnp.asarray(cutoff, positions.dtype) ** 2
    eff_term = term if payload is None else _pbc_term(term)
    total = pair_lag_reduce(
        sp, bins.sorted_keys, bins.info.strides, csq, slo,
        sorted_payload=payload, M=M, L=L, term=eff_term,
        interpret=interpret, out_dtype=out_dtype, mi_box=mi_box,
        key_reach=reach,
    )
    ok &= lag_coverage_ok(bins.sorted_keys, bins.info.strides, L,
                          reach=reach)
    return total, ok


_MASKED_TERMS: dict = {}


def _pbc_term(term: Callable) -> Callable:
    """Cache the masked wrapper per term: `pair_lag_reduce` jits on term
    identity, so a fresh closure per call would retrace every time."""
    fn = _MASKED_TERMS.get(term)
    if fn is None:
        def fn(dsq, wi, wj):
            keep = (wi * wj == 0) & (wi + wj >= 0)
            v = term(dsq)
            return jnp.where(keep, v, jnp.zeros_like(v))

        _MASKED_TERMS[term] = fn
    return fn


def pbc_pair_sum(
    positions: jax.Array,
    origin,
    box,
    cutoff,
    *,
    term: Callable = lj_term,
    B: int | None = None,
    G: int | None = None,
    M: int = 4096,
    L: int = 256,
    path: str = "lag",
    CB: int = 8,
    MAXJ: int | tuple = 8,
    K: int = 32,
    chunk: int = 64,
    interpret: bool = False,
    out_dtype=None,
    positions_lo: jax.Array | None = None,
    minimage=False,
    bandmask: bool | None = None,
    kahan=True,
    BE: int | None = None,
):
    """Sum ``term(dsq)`` over unique minimum-image cutoff pairs under
    orthorhombic PBC. Returns (total, ok).

    ``ok`` folds the ghost capacity/regime flags with the kernel coverage
    flag; False means grow B/G/L (or MAXJ/K) and rerun (never silently
    dropped pairs). B and G default to `suggest_pbc_capacity` (host-side;
    pass them explicitly inside jit). ``path="lag"`` suits thin boxes,
    ``"tile"`` cubic/wide ones (the shift-sign plane rides the packed
    blocks' free row), ``"xla"`` any platform AND dim 2 (per-particle
    half-energies summed over real rows — no mask plane needed; the
    reference is generic over N, lib.rs:132-135). 2D inputs route to
    "xla" automatically.

    ``minimage`` ("auto" | False | per-axis bool mask; lag path only):
    folds narrow periodic axes IN-KERNEL instead of materializing ghost
    images (`minimage_axes`). The reference protocol box (30 x 30 x long,
    cutoff 10) is ~100% boundary under ghost extension — with its two
    3-cell axes min-imaged, only the long axis keeps a thin ghost shell
    and PBC costs about the same as open boundaries. Requires host
    ``box``/``cutoff`` (the axis split is static configuration).
    """
    n, dim = positions.shape
    if dim != 3:
        path = "xla"
    mimask = _resolve_minimage(box, cutoff, minimage, dim)
    if mimask.any():
        if path != "lag":
            raise ValueError(
                "minimage is a lag-path feature (narrow axes are the lag "
                f"kernel's regime); got path={path!r}"
            )
        # tile/extend-path options are inert under minimage (the fold
        # replaces ghost extension and runs the lag kernel) — raise
        # rather than silently ignore, mirroring the species+minimage
        # ValueError pattern
        if bandmask is not None or BE is not None or kahan is not True:
            raise ValueError(
                "bandmask/kahan/BE are tile/extend-path options with no "
                "effect under minimage; leave them at their defaults"
            )
        return _minimage_pair_sum(
            positions, origin, box, cutoff, mimask, term=term, B=B, G=G,
            M=M, L=L, interpret=interpret, out_dtype=out_dtype,
            positions_lo=positions_lo,
        )
    if B is None or G is None:
        Bd, Gd, BEd = suggest_pbc_capacity(n, box, cutoff, with_multi=True)
        B = Bd if B is None else B
        G = Gd if G is None else G
        if BE is None:
            BE = BEd  # geometry-aware edge/corner capacity (flag-guarded)
    ext, ext_lo, w, valid, ok = pbc_extend(
        positions, origin, box, cutoff, B=B, G=G,
        positions_lo=positions_lo, BE=BE,
    )
    csq = jnp.asarray(cutoff, positions.dtype) ** 2
    if path == "xla":
        from ..core.grid import build
        from ..core.pairs import pair_energy_per_particle

        grid = build(ext, cutoff, valid=valid)
        e_pp = pair_energy_per_particle(
            grid, term, K=K, chunk=chunk, cutoff_sq=csq
        )
        ok &= grid.bins.max_cell_count() <= K
        if out_dtype is not None and jnp.issubdtype(out_dtype, jnp.integer):
            # Integer counting: the per-particle halves are half-integral,
            # and `jnp.sum(..., dtype=int)` casts ELEMENTS before summing —
            # truncating 0.5 for every odd per-row count (silently low
            # totals). Doubled per-row counts are exact in the float dtype
            # (< 2^24 per row); accumulate them as (hi, lo) int32 planes
            # like the kernels and halve the 48-bit value so
            # `combine_count` reconstructs the pair count.
            cnt = jnp.round(2.0 * e_pp[:n]).astype(jnp.int32)
            lo = jnp.sum(cnt & 0xFFFF)
            hi = jnp.sum(cnt >> 16)
            half_lo = ((lo + ((hi & 1) << 16)) >> 1).astype(jnp.int32)
            return jnp.stack([hi >> 1, half_lo]), ok
        total = jnp.sum(e_pp[:n], dtype=out_dtype)
        return total, ok
    cols = [ext]
    if ext_lo is not None:
        cols.append(ext_lo)
    cols.append(w[:, None])
    bins, sorted_cols = bin_and_sort(
        jnp.concatenate(cols, axis=1), cutoff,
        max_cells=1, need_perm=False, valid=valid, auto_order=True,
    )
    sp = sorted_cols[:, :3]
    slo = sorted_cols[:, 3:6] if ext_lo is not None else None
    if path == "tile":
        from .tile_pairs import tile_pair_reduce

        total, cov = tile_pair_reduce(
            sp, bins.sorted_keys, bins.info.strides, csq, slo,
            sorted_cols[:, -1],
            CB=CB, MAXJ=MAXJ, term=_pbc_term(term), interpret=interpret,
            out_dtype=out_dtype,
            bandmask=False if bandmask is None else bandmask, kahan=kahan,
        )
        ok &= cov
    elif path == "lag":
        total = pair_lag_reduce(
            sp, bins.sorted_keys, bins.info.strides, csq, slo,
            sorted_payload=sorted_cols[:, -1:],
            M=M, L=L, term=_pbc_term(term), interpret=interpret,
            out_dtype=out_dtype,
        )
        ok &= lag_coverage_ok(bins.sorted_keys, bins.info.strides, L)
    else:
        raise ValueError(f"unknown path {path!r} (lag | tile | xla)")
    return total, ok


def pbc_lj_energy(positions, origin, box, cutoff, **kw):
    """Total LJ energy under orthorhombic PBC. Returns (energy, ok)."""
    return pbc_pair_sum(positions, origin, box, cutoff, term=lj_term, **kw)


def pbc_count_pairs(positions, origin, box, cutoff, **kw):
    """Exact minimum-image cutoff pair count. Returns (count, ok).
    Host-syncing (two-plane int32 reconstruction, safe past 2^31)."""
    kw.setdefault("out_dtype", jnp.int32)
    packed, ok = pbc_pair_sum(
        positions, origin, box, cutoff, term=count_term, **kw
    )
    return combine_count(packed), ok


def pbc_lj_forces(
    positions: jax.Array,
    origin,
    box,
    cutoff,
    *,
    gfn: Callable | None = None,
    B: int | None = None,
    G: int | None = None,
    M: int = 1024,
    L: int = 256,
    path: str = "lag",
    CB: int = 8,
    MAXJ: int | tuple = 8,
    K: int = 32,
    chunk: int = 64,
    interpret: bool = False,
    positions_lo: jax.Array | None = None,
    minimage=False,
    species: jax.Array | None = None,
    bandmask: bool | None = None,
    BE: int | None = None,
):
    """Per-particle forces under orthorhombic PBC, input order.

    No pair masking is needed (see module docstring): ghosts are included
    in the kernel, each real row accumulates its complete force, and
    ghost rows are discarded by the un-sort. ``path="lag"`` (thin boxes:
    half-space + Newton reactions, M/L capacities) or ``"tile"``
    (cubic/wide boxes: full mirrored bands, i-side accumulation, CB/MAXJ
    capacities — ghost reactions were never computed to begin with).
    ``minimage`` folds narrow axes in-kernel (lag path; see
    `pbc_pair_sum`) — Newton's +/- g*d on the FOLDED separation IS the
    minimum-image force, so the un-sort machinery is unchanged.

    ``species`` ((n,) small ints; lag path): multi-component forces —
    ghost images inherit their parent's species and ``gfn`` receives
    ``(dsq, s_i, s_j)`` (`ops.potentials.lennard_jones_mixed`).
    Returns ((n, 3) forces, ok).
    """
    n, dim = positions.shape
    if dim != 3:
        path = "xla"
    if species is not None and path != "lag":
        raise ValueError(
            "species-dependent PBC forces run on the lag path (payload "
            f"gfn); got path={path!r}"
        )
    mimask = _resolve_minimage(box, cutoff, minimage, dim)
    if mimask.any():
        if path != "lag":
            raise ValueError(
                "minimage is a lag-path feature (narrow axes are the lag "
                f"kernel's regime); got path={path!r}"
            )
        if bandmask is not None or BE is not None:
            raise ValueError(
                "bandmask/BE are tile/extend-path options with no effect "
                "under minimage; leave them at their defaults"
            )
        if species is None:
            bins, sp, slo, _payload, reach, mi_box, ok = _minimage_bins(
                positions, origin, box, cutoff, mimask, B=B, G=G,
                positions_lo=positions_lo, need_perm=True, stable=False,
            )
            spay = None
        else:
            bins, sp, slo, _payload, reach, mi_box, ok, spay = (
                _minimage_bins(
                    positions, origin, box, cutoff, mimask, B=B, G=G,
                    positions_lo=positions_lo, need_perm=True, stable=False,
                    extra=species,
                )
            )
        csq = jnp.asarray(cutoff, positions.dtype) ** 2
        f = pair_lag_forces(
            sp, bins.sorted_keys, bins.info.strides, csq, slo,
            sorted_payload=spay,
            M=M, L=L, gfn=gfn, interpret=interpret, mi_box=mi_box,
            key_reach=reach,
        )
        ok &= lag_coverage_ok(bins.sorted_keys, bins.info.strides, L,
                              reach=reach)
        _, fx, fy, fz = jax.lax.sort(
            (bins.perm, f[:, 0], f[:, 1], f[:, 2]), num_keys=1,
            is_stable=False,
        )
        return jnp.stack([fx[:n], fy[:n], fz[:n]], axis=-1), ok
    if B is None or G is None:
        Bd, Gd, BEd = suggest_pbc_capacity(n, box, cutoff, with_multi=True)
        B = Bd if B is None else B
        G = Gd if G is None else G
        if BE is None:
            BE = BEd
    if species is None:
        ext, ext_lo, _w, valid, ok = pbc_extend(
            positions, origin, box, cutoff, B=B, G=G,
            positions_lo=positions_lo, BE=BE,
        )
        ext_spec = None
    else:
        # ghost images inherit their parent's species (one G-sized
        # gather — the `_pbc_cum_hist` species pattern)
        ext, ext_lo, _w, valid, ok, gparent = pbc_extend(
            positions, origin, box, cutoff, B=B, G=G,
            positions_lo=positions_lo, return_parents=True, BE=BE,
        )
        spec = jnp.asarray(species, positions.dtype).reshape(-1)
        ext_spec = jnp.concatenate([spec, spec[gparent]])
    csq = jnp.asarray(cutoff, positions.dtype) ** 2
    if path == "xla":
        from ..core.grid import build
        from ..core.pairs import pair_forces
        from .lj import lj_force_factor

        grid = build(ext, cutoff, valid=valid)
        f = pair_forces(
            grid, gfn or lj_force_factor, K=K, chunk=chunk, cutoff_sq=csq
        )
        ok &= grid.bins.max_cell_count() <= K
        return f[:n], ok
    cols = [ext] if ext_lo is None else [ext, ext_lo]
    if ext_spec is not None:
        cols.append(ext_spec[:, None])
    bins, sorted_cols = bin_and_sort(
        jnp.concatenate(cols, axis=1) if len(cols) > 1 else ext,
        cutoff, max_cells=1, need_perm=True, stable=False, valid=valid, auto_order=True,
    )
    sp = sorted_cols[:, :3]
    slo = sorted_cols[:, 3:6] if ext_lo is not None else None
    spay = sorted_cols[:, -1:] if ext_spec is not None else None
    if path == "tile":
        from .tile_pairs import tile_pair_forces

        f, cov = tile_pair_forces(
            sp, bins.sorted_keys, bins.info.strides, csq, slo,
            CB=CB, MAXJ=MAXJ, gfn=gfn, interpret=interpret,
            bandmask=False if bandmask is None else bandmask,
        )
        ok &= cov
    elif path == "lag":
        f = pair_lag_forces(
            sp, bins.sorted_keys, bins.info.strides, csq, slo,
            sorted_payload=spay,
            M=M, L=L, gfn=gfn, interpret=interpret,
        )
        ok &= lag_coverage_ok(bins.sorted_keys, bins.info.strides, L)
    else:
        raise ValueError(f"unknown path {path!r} (lag | tile | xla)")
    # un-sort with a second multi-operand sort (never an n-sized gather);
    # ghosts carry perm >= n and land beyond the [:n] slice
    _, fx, fy, fz = jax.lax.sort(
        (bins.perm, f[:, 0], f[:, 1], f[:, 2]), num_keys=1, is_stable=False
    )
    forces = jnp.stack([fx[:n], fy[:n], fz[:n]], axis=-1)
    return forces, ok


def md_step_pbc(
    positions: jax.Array,
    velocities: jax.Array,
    origin,
    box,
    cutoff,
    dt,
    *,
    B: int | None = None,
    G: int | None = None,
    path: str = "lag",
    **kw,
):
    """One LJ MD step (semi-implicit Euler: v += dt f; x += dt v) under
    orthorhombic PBC, positions wrapped back into the box. State stays in
    input order (the ghost un-sort is the price of PBC). Returns
    (positions, velocities, ok). Keyword args forward to `pbc_lj_forces`.
    """
    f, ok = pbc_lj_forces(
        positions, origin, box, cutoff, B=B, G=G, path=path, **kw
    )
    vel_new = velocities + dt * f
    pos_new = wrap_positions(positions + dt * vel_new, origin, box)
    return pos_new, vel_new, ok
