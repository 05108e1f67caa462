"""Per-chunk lag-segment bounds for the tile pair kernel.

The lag kernel (`ops.pallas_pairs`) scans one contiguous window of lags,
which is tight for thin boxes but degenerates for cubic/wide boxes where
the key window spans a whole z-layer of mostly-irrelevant slots (see
docs/DESIGN_NOTES.md). The tile kernel (`ops.tile_pairs`) instead visits,
for every 128-slot chunk of the sorted order, only the few slot ranges
that can actually hold cutoff partners.

Those ranges come from the half-stencil structure (the same negation
trick as the reference's `Half::neighbors_as_slice`, zelll
src/cellgrid/iters.rs:58-63): with ascending strides (x fastest), the key
difference ``key_i - key_j`` of every half-stencil partner j falls in a
small set of disjoint *bands*:

    3D:  [0, 1]                        own row      (dz=0, dy=0, dx in {0,-1})
         [s_y-1, s_y+1]                y-1 row      (dz=0, dy=-1)
         [s_z-s_y-1, s_z-s_y+1]        z-1, y+1 row
         [s_z-1, s_z+1]                z-1, y   row
         [s_z+s_y-1, s_z+s_y+1]        z-1, y-1 row
    2D:  [0, 1], [s_y-1, s_y+1]
    1D:  [0, 1]

The +4 stride padding (GridInfo) makes the bands disjoint for every grid
shape, and their union is exactly the 3^N/2 half-stencil: every cutoff
pair lands in exactly one band.

For each chunk c (slots [128c, 128c+128)) and band s, the partner slots
form one contiguous range, located with two searchsorted calls on the
128-downsampled sorted keys — `jnp.searchsorted(..., method='sort')`, so
the whole bound computation is a couple of small sorts (no gathers, no
per-element host work).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

CHUNK = 128


def segment_bands(strides, full: bool = False) -> jnp.ndarray:
    """(S, 2) int32 [lo, hi] key-difference bands of the stencil for
    ascending `strides` (length = dim).

    Half-space (default): each unordered pair appears once (j behind i);
    S = 1, 2, 5 for dim = 1, 2, 3. ``full=True`` adds the mirrored bands
    (partners ahead of i too, [0,1] widening to [-1,1]) for per-particle
    full-stencil reductions (forces, coordination); S = 1, 3, 9.

    Strides are sorted on entry: the band set only depends on the stride
    VALUES (the stencil is axis-symmetric), so per-axis vectors from
    `GridInfo.create(auto_order=True)` work unchanged. Disjointness of
    the bands needs sy >= 3 and sz > 2*sy + 2, which padded cell counts
    (>= 5 per axis) always satisfy.
    """
    strides = jnp.sort(jnp.asarray(strides, jnp.int32))
    dim = strides.shape[0]
    one = jnp.asarray(1, jnp.int32)
    zero = jnp.asarray(0, jnp.int32)

    def band(lo, hi):
        return jnp.stack([jnp.asarray(lo, jnp.int32), jnp.asarray(hi, jnp.int32)])

    if dim == 1:
        bands = [band(-one if full else zero, one)]
    elif dim == 2:
        sy = strides[1]
        bands = [band(-one if full else zero, one), band(sy - 1, sy + 1)]
        if full:
            bands.append(band(-sy - 1, -sy + 1))
    elif dim == 3:
        sy, sz = strides[1], strides[2]
        bands = [
            band(-one if full else zero, one),
            band(sy - 1, sy + 1),
            band(sz - sy - 1, sz - sy + 1),
            band(sz - 1, sz + 1),
            band(sz + sy - 1, sz + sy + 1),
        ]
        if full:
            bands += [
                band(-sy - 1, -sy + 1),
                band(-sz + sy - 1, -sz + sy + 1),
                band(-sz - 1, -sz + 1),
                band(-sz - sy - 1, -sz - sy + 1),
            ]
    else:
        raise NotImplementedError("segment bands support dim <= 3")
    return jnp.stack(bands)


def num_segments(dim: int, full: bool = False) -> int:
    if full:
        return {1: 1, 2: 3, 3: 9}[dim]
    return {1: 1, 2: 2, 3: 5}[dim]


def suggest_maxj(sorted_keys_padded: jax.Array, bands: jax.Array,
                 half: bool = True, per_band: bool = False):
    """Smallest MAXJ capacity that covers every chunk's partner window for
    this data (host-syncing; use before jitting a tile kernel so the first
    compile already has a sufficient capacity class).

    ``per_band=True`` returns a tuple of per-band capacities instead of
    one shared scalar. The bands' true needs differ ~6x at reference
    density (the own-row band spans ~2 chunks; each z-layer row band
    spans the chunk-quantized row population), so per-band windows cut
    the DMA bytes the widest band would otherwise force on every band.
    """
    nc = sorted_keys_padded.shape[0] // CHUNK
    _, _, jnum, _ = chunk_bounds(sorted_keys_padded, bands, max_j=nc,
                                 half=half)
    if per_band:
        return tuple(
            max(int(v), 1) for v in np.asarray(jnp.max(jnum, axis=0))
        )
    return max(int(jnp.max(jnum)), 1)


def band_order(dim: int, full: bool = False) -> tuple:
    """Band indices sorted by DESCENDING window position in key space
    (ascending band-hi). Static: follows from the `segment_bands`
    construction and the stride bounds (sy >= 5, sz > 2*sy + 2), not
    from the data. Both window starts (kmin - hi_s) and ends
    (kmax - lo_s) are monotone along this order — the property
    `trim_windows_disjoint` relies on."""
    if not full:
        return tuple(range(num_segments(dim)))
    return {1: (0,), 2: (2, 0, 1), 3: (8, 7, 6, 5, 0, 1, 2, 3, 4)}[dim]


def trim_windows_disjoint(jlo, toff, jnum, order):
    """Make the executed windows pairwise disjoint BY CONSTRUCTION.

    Chunks straddling a y-row/z-layer key jump span tens of keys, so
    their band windows genuinely overlap — a maskless tile would then
    evaluate shared j-chunks once per band and double-count every
    distance-passing pair (and meet the own chunk without its triangle).
    Processing bands in descending window position (`band_order`), each
    band's executed end is clamped to the start of the nearest non-empty
    higher window. Both starts and ends are monotone along that order,
    so every trimmed-off region is covered by the higher band: the union
    of executed chunks — hence pair coverage — is unchanged.

    Returns (toff', jnum') with toff' >= toff (still inside each band's
    DMA window) and jnum' <= jnum.
    """
    start = (jlo + toff).astype(jnp.int32)
    end = start + jnum
    nc, S = start.shape
    run = jnp.full((nc,), jnp.int32(2 ** 30))
    s2 = [None] * S
    n2 = [None] * S
    for s in order:
        e = jnp.minimum(end[:, s], run)
        st = jnp.minimum(start[:, s], e)
        num = jnp.maximum(e - st, 0)
        run = jnp.where(num > 0, st, run)
        s2[s] = st
        n2[s] = num
    start2 = jnp.stack(s2, axis=-1)
    num2 = jnp.stack(n2, axis=-1)
    toff2 = jnp.maximum(start2 - jlo, 0)
    return toff2, num2


def windows_disjoint(jlo: jax.Array, toff: jax.Array,
                     jnum: jax.Array) -> jax.Array:
    """True iff every chunk's EXECUTED windows [jlo+toff, jlo+toff+jnum)
    are pairwise disjoint across bands — the maskless-kernel
    precondition (`tile_pairs` ``bandmask=False``): with no key-band
    test in the tile body, a j-chunk shared by two bands' windows would
    evaluate (and count) its pairs twice.

    At reference density the gap between adjacent bands' key ranges is
    ~(s_y - 3) keys ~ 1000 slots >> one 128-slot chunk, so windows are
    comfortably disjoint; small/dense grids trip this and must run with
    the band mask. Empty windows never overlap.
    """
    start = (jlo + toff).astype(jnp.int32)  # (NC, S)
    end = start + jnum
    S = start.shape[1]
    empty = jnum == 0
    ok = jnp.asarray(True)
    for a in range(S):
        for b in range(a + 1, S):
            sep = (end[:, a] <= start[:, b]) | (end[:, b] <= start[:, a])
            ok &= jnp.all(sep | empty[:, a] | empty[:, b])
    return ok


def join_bounds(q_keys: jax.Array, p_keys: jax.Array, bands: jax.Array,
                max_j: int | None = None):
    """Per-QUERY-chunk, per-band windows over a SECOND sorted array.

    The join sibling of `chunk_bounds`: i-side chunks come from `q_keys`
    (sorted query keys) and partner windows are located in `p_keys`
    (sorted particle keys). Both are (C,) int32 ascending with C a
    multiple of CHUNK; padding rows carry `_pad_and_desentinel` keys.

    With ``max_j=None`` (VMEM-resident particle side), returns
    (lo, num, coverage_ok):
      lo  (NCq, S) int32 — first partner particle chunk (ABSOLUTE chunk
          index: the join kernel keeps the whole particle array in VMEM,
          so there is no DMA window to offset into),
      num (NCq, S) int32 — number of partner chunks,
      coverage_ok — guards the key preconditions only (both arrays
          ascending, real keys below the padding base); there is no
          static window capacity to exceed.

    With ``max_j`` set (windowed kernel for particle arrays too large for
    VMEM residency), returns (jlo, toff, jnum, coverage_ok) exactly like
    `chunk_bounds`: jlo is the clamped DMA window base (the static window
    [jlo, jlo + max_j) always lies in array range; pass max_j <= NCp),
    toff the first partner chunk inside the window, and coverage_ok goes
    False iff some window needs more than max_j chunks (capacity
    exceeded — re-jit larger, never trust the output).

    A (query, particle) pair whose key difference q - p lies in band s
    satisfies lo[cq, s] <= c_p < lo[cq, s] + num[cq, s] by construction.
    """
    from .pallas_pairs import _PAD_KEY_BASE

    Cq, Cp = q_keys.shape[0], p_keys.shape[0]
    assert Cq % CHUNK == 0 and Cp % CHUNK == 0
    ncq, ncp = Cq // CHUNK, Cp // CHUNK
    b = bands.astype(jnp.int32)  # (S, 2)
    S = b.shape[0]

    kq = q_keys.reshape(ncq, CHUNK)
    realq = kq < jnp.int32(_PAD_KEY_BASE)
    q_has = realq[:, 0]
    q_kmax = jnp.max(jnp.where(realq, kq, jnp.int32(-(2 ** 31))), axis=1)
    q_kmin = kq[:, 0]

    kp = p_keys.reshape(ncp, CHUNK)
    realp = kp < jnp.int32(_PAD_KEY_BASE)
    p_has = realp[:, 0]
    p_kmax_real = jnp.max(jnp.where(realp, kp, jnp.int32(-(2 ** 31))), axis=1)
    p_real_max = jnp.max(p_kmax_real)
    # padding-only particle chunks keep their padding kmax so the array
    # searched by searchsorted stays ascending
    p_kmax_eff = jnp.where(p_has, p_kmax_real, kp[:, -1])
    p_kmin = kp[:, 0]

    # Real query keys must be used UNCLAMPED: out-of-box queries carry
    # keys legitimately outside the particle key range and clamping would
    # shift their windows (not just empty them). Only padding query
    # chunks (keys ~2^30, whose band offsets could overflow int32) are
    # replaced by a safe in-range constant — their windows are forced
    # empty below anyway. Real keys are grid-bounded (|key| < 2^24 is
    # enforced by the callers' f32-exactness flag), so band arithmetic
    # cannot overflow.
    safe = p_real_max + 1
    kmin_q = jnp.where(q_has, q_kmin, safe)
    kmax_q = jnp.where(q_has, q_kmax, safe)

    qlo = kmin_q[None, :] - b[:, 1][:, None]  # smallest partner key (S, NCq)
    qhi = kmax_q[None, :] - b[:, 0][:, None]  # largest partner key

    lo = jnp.searchsorted(p_kmax_eff, qlo.reshape(-1), side="left",
                          method="sort")
    hi = jnp.searchsorted(p_kmin, qhi.reshape(-1), side="right",
                          method="sort")
    lo = lo.reshape(S, ncq).T.astype(jnp.int32)  # (NCq, S)
    hi = hi.reshape(S, ncq).T.astype(jnp.int32) - 1  # inclusive
    hi = jnp.where(q_has[:, None], hi, lo - 1)  # padding query chunks: empty

    num = jnp.maximum(hi - lo + 1, 0)
    coverage_ok = (
        (p_real_max < jnp.int32(_PAD_KEY_BASE))
        & jnp.all(q_keys[1:] >= q_keys[:-1])
        & jnp.all(p_keys[1:] >= p_keys[:-1])
    )
    if max_j is None:
        return lo, num, coverage_ok

    assert max_j <= ncp, "clamp max_j to the particle chunk count first"
    coverage_ok = coverage_ok & (jnp.max(num) <= max_j)
    jnum = jnp.minimum(num, max_j)
    # clamp the DMA base so [jlo, jlo + max_j) stays in range; lo can
    # reach ncp (empty window past all particle keys), and whenever
    # jnum > 0 the clamped window still covers [lo, lo + jnum) because
    # its last partner chunk is <= ncp - 1 = (ncp - max_j) + max_j - 1
    jlo = jnp.clip(lo, 0, max(ncp - max_j, 0))
    toff = lo - jlo
    return jlo, toff, jnum, coverage_ok


def chunk_bounds(sorted_keys: jax.Array, bands: jax.Array,
                 max_j: int | tuple[int, ...],
                 half: bool = True, groups: int = 1):
    """Per-chunk, per-band j-chunk windows.

    sorted_keys: (C,) int32 ascending, C a multiple of CHUNK; padding rows
    (SENTINEL_KEY or any keys above all real keys) sort last and resolve to
    empty windows automatically.

    ``max_j`` is the static DMA window capacity in chunks — one shared
    scalar, or a length-S tuple of per-band capacities (see
    `suggest_maxj(per_band=True)`; "max_j" below means that band's entry).

    Returns (jlo, toff, jnum, coverage_ok):
      jlo  (NC, S) int32 — DMA window base chunk, clamped so the static
           window [jlo, jlo + max_j) is always in array range,
      toff (NC, S) int32 — offset of the first partner chunk inside the
           DMA window (toff + jnum <= max_j whenever coverage_ok),
      jnum (NC, S) int32 — number of j-chunks carrying partners,
      coverage_ok — False iff some window needs more than max_j chunks
           (static capacity exceeded: results would drop pairs; the caller
           must re-jit with a larger max_j — never proceed).

    A pair (i, j<i) with key difference inside band s lands in exactly one
    (band, j-chunk) with jlo+toff <= c_j < jlo+toff+jnum by construction:
    window keys are [kmin_i - hi_s, kmax_i - lo_s] and the chunk ranges
    come from exact searchsorted bounds on the downsampled keys.

    ``groups > 1`` additionally returns sub-chunk windows: each chunk is
    split into `groups` row groups of CHUNK/groups slots, and per
    (chunk, group, band) the tighter j-chunk window for just that group's
    keys is located (group key spans are ~groups x smaller, so their
    windows quantize to fewer chunks — the tile kernel evaluates
    proportionally fewer 128-lane columns per own row). Returns
    (jlo, toff, jnum, gtoff (NC, G, S), gjnum (NC, G, S), coverage_ok);
    group windows are clamped inside the parent DMA window [jlo,
    jlo+max_j) (a no-op whenever coverage_ok — group queries are
    sub-ranges of the chunk query).
    """
    C = sorted_keys.shape[0]
    assert C % CHUNK == 0
    nc = C // CHUNK
    k = sorted_keys.reshape(nc, CHUNK)
    kmin, kmax = k[:, 0], k[:, -1]
    b = bands.astype(jnp.int32)  # (S, 2)
    S = b.shape[0]

    # Padding keys (>= _PAD_KEY_BASE, see pallas_pairs._pad_and_desentinel)
    # sit far above every real key. Window bounds must come from the REAL
    # keys of each chunk: the one chunk straddling the real->padding
    # boundary would otherwise inherit a padding kmax and claim a window
    # spanning the whole real tail (observed: 70+ chunks at n=1e6). All
    # arithmetic stays int32 (int64 silently truncates on TPU backends).
    from .pallas_pairs import _PAD_KEY_BASE

    real = k < jnp.int32(_PAD_KEY_BASE)
    has_real = real[:, 0]  # keys ascend within a chunk
    kmax_real_chunk = jnp.max(jnp.where(real, k, jnp.int32(-1)), axis=1)
    kreal_max = jnp.max(kmax_real_chunk)
    # padding-only chunks keep their padding kmax so the array searched by
    # searchsorted stays ascending
    kmax_eff = jnp.where(has_real, kmax_real_chunk, kmax)
    # clamp query operands into the real-key range: band offsets then
    # cannot overflow int32, and padding chunks resolve to empty windows
    kmin_q = jnp.minimum(kmin, kreal_max + 1)
    kmax_q = jnp.minimum(kmax_eff, kreal_max)

    # queries, shaped (S, NC): window key range per chunk and band
    qlo = kmin_q[None, :] - b[:, 1][:, None]  # smallest partner key
    qhi = kmax_q[None, :] - b[:, 0][:, None]  # largest partner key

    # first chunk whose real kmax >= qlo / last chunk whose kmin <= qhi
    lo = jnp.searchsorted(kmax_eff, qlo.reshape(-1), side="left", method="sort")
    hi = jnp.searchsorted(kmin, qhi.reshape(-1), side="right", method="sort")
    lo = lo.reshape(S, nc).T.astype(jnp.int32)  # (NC, S)
    hi = hi.reshape(S, nc).T.astype(jnp.int32) - 1  # inclusive
    hi = jnp.where(has_real[:, None], hi, lo - 1)  # padding chunks: empty

    if half:
        # partners sit at j <= i: never look past the own chunk
        own = jnp.arange(nc, dtype=jnp.int32)[:, None]
        hi = jnp.minimum(hi, own)

    jnum = jnp.maximum(hi - lo + 1, 0)
    # the flag also guards the padding-key headroom: real keys at or above
    # _PAD_KEY_BASE would interleave with padding keys and corrupt windows,
    # and the ascending-key precondition itself (searchsorted windows are
    # meaningless on unsorted keys — e.g. ring-wraparound halo ghosts
    # prepended with the largest keys; flag, never silently drop)
    # static per-band capacities (scalar max_j broadcasts to every band)
    mj = np.broadcast_to(np.asarray(max_j, np.int32), (S,))
    mj_row = jnp.asarray(mj)[None, :]
    coverage_ok = (
        jnp.all(jnp.max(jnum, axis=0) <= jnp.asarray(mj))
        & (kreal_max < jnp.int32(_PAD_KEY_BASE))
        & jnp.all(sorted_keys[1:] >= sorted_keys[:-1])
    )
    jnum = jnp.minimum(jnum, mj_row)
    # clamp the DMA window into range: lo is never negative, and when lo
    # reaches past nc - max_j the window base backs up so [jlo, jlo+max_j)
    # still covers [lo, hi] (hi <= nc - 1 = jlo + max_j - 1)
    jlo = jnp.minimum(lo, jnp.asarray(np.maximum(nc - mj, 0))[None, :])
    toff = lo - jlo
    if groups == 1:
        return jlo, toff, jnum, coverage_ok

    assert CHUNK % groups == 0
    OH = CHUNK // groups
    kg = k.reshape(nc * groups, OH)
    gmin, gmax_raw = kg[:, 0], kg[:, -1]
    greal = kg < jnp.int32(_PAD_KEY_BASE)
    ghas = greal[:, 0]
    gmax_real = jnp.max(jnp.where(greal, kg, jnp.int32(-1)), axis=1)
    gmin_q = jnp.minimum(gmin, kreal_max + 1)
    gmax_q = jnp.minimum(jnp.where(ghas, gmax_real, gmax_raw), kreal_max)

    qlo_g = gmin_q[None, :] - b[:, 1][:, None]  # (S, NC*G)
    qhi_g = gmax_q[None, :] - b[:, 0][:, None]
    glo = jnp.searchsorted(kmax_eff, qlo_g.reshape(-1), side="left",
                           method="sort")
    ghi = jnp.searchsorted(kmin, qhi_g.reshape(-1), side="right",
                           method="sort")
    glo = glo.reshape(S, nc, groups).transpose(1, 2, 0).astype(jnp.int32)
    ghi = ghi.reshape(S, nc, groups).transpose(1, 2, 0).astype(jnp.int32) - 1

    if half:
        own = jnp.arange(nc, dtype=jnp.int32)[:, None, None]
        ghi = jnp.minimum(ghi, own)
    ghi = jnp.where(ghas.reshape(nc, groups, 1), ghi, glo - 1)

    parent = jlo[:, None, :]  # (NC, 1, S)
    mj_g = jnp.asarray(mj)[None, None, :]
    glo_c = jnp.clip(glo, parent, parent + mj_g)
    ghi_c = jnp.minimum(ghi, parent + mj_g - 1)
    gtoff = glo_c - parent
    gjnum = jnp.maximum(ghi_c - glo_c + 1, 0)
    return jlo, toff, jnum, gtoff, gjnum, coverage_ok
