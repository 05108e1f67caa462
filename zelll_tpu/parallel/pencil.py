"""2D (pencil) spatial domain decomposition over a ("z", "y") device mesh.

The 1D slab decomposition (`parallel.domain`) cuts space along the
sort-major (largest-extent) axis only; for a cubic box on many devices a
slab's boundary area — and so its halo volume — grows as n^(2/3) per
device. Pencils cut along the TWO largest axes: device (i, j) owns the
particles in z-slab i ∩ y-column j (SURVEY.md parallelism checklist; the
reference's only parallelism is shared-memory rayon,
/root/reference/src/cellgrid.rs:447-451).

Design (completeness-first; the slab path remains the tuned default):

* z (major stride): slot-granular blocks of the globally key-sorted
  order, exactly like the 1D slabs — phase-1 halos are head/tail slices
  exchanged with `ppermute` along "z".
* y (mid stride): CELL-granular columns shared by every slab (the host
  picks the split cells from the global y histogram), so a device's
  y-neighbors own exactly the adjacent cell columns. Phase-2 halos are
  the boundary CELL columns of [z-ghosts | own | z-ghosts], compacted to
  the front by one class-key sort (never a gather) and exchanged along
  "y". Running phase 2 on the phase-1 result forwards the z-neighbors'
  boundary columns too — that covers the DIAGONAL (corner) pencils, the
  classic two-phase trick of MD domain decomposition.
* The extended block is re-sorted by global cell key (y-ghost keys
  interleave with owned keys), and the fused kernels run unchanged.
* Global pair dedup is the ownership payload plane of `parallel.pbc`:
  every row carries o = 1 (owned) / 0 (ghost, pad), the summed term is
  ``0.5 * (o_i + o_j) * term(dsq)`` — own-own pairs count once here,
  own-ghost pairs count half here and half on the neighbor that owns the
  other endpoint, ghost-ghost pairs count nowhere.
* Never silently drop: coverage_ok folds the z-halo window check (both
  sides — the 0.5-weight rule needs each owned row's full neighborhood
  locally), the y-extraction capacities, and the kernel capacity flags,
  all-reduced over both mesh axes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..core.binning import bin_and_sort, compute_keys
from ..core.geometry import Aabb, GridInfo, key_window
from ..ops.pallas_pairs import lj_term, pair_lag_forces, pair_lag_reduce
from ..ops.lj import lj_force_factor

__all__ = [
    "make_pencil_mesh",
    "partition_by_pencil",
    "sharded_pencil_lj_energy",
    "sharded_pencil_md_step",
    "sharded_pencil_md_run",
    "sharded_pencil_stress",
    "sharded_pencil_pair_hist",
    "repartition_pencil",
    "partition_by_pencil_pbc",
    "sharded_pencil_pbc_lj_energy",
    "sharded_pencil_pbc_md_step",
    "sharded_pencil_pbc_md_run",
]

ZAX = "z"
YAX = "y"


def make_pencil_mesh(shape: tuple[int, int]) -> Mesh:
    """(a, b) device mesh: a z-slabs x b y-columns."""
    a, b = shape
    devs = np.array(jax.devices()[: a * b]).reshape(a, b)
    return Mesh(devs, axis_names=(ZAX, YAX))


def _host_order_info(pts, cutoff):
    """Host mirror of GridInfo.create(auto_order=True): strides, origin,
    and the axis order (ascending stride)."""
    inf = pts.min(axis=0)
    sup = pts.max(axis=0)
    shape = np.floor((sup - inf) / cutoff).astype(np.int64) + 1
    perm = np.argsort(shape, kind="stable")
    padded = shape[perm] + 4
    s = np.concatenate([[1], np.cumprod(padded[:-1])])
    strides = np.empty_like(s)
    strides[perm] = s
    return inf, sup, shape, strides, perm


def partition_by_pencil(positions, cutoff, shape: tuple[int, int],
                        n_payload: int = 0, slack: int = 0):
    """Host-side global pencil partition.

    Splits the key-sorted order into ``a`` equal z-blocks (slot
    granularity, like `partition_by_slab`), then each z-block by the
    GLOBAL y-cell split points (cell granularity, shared across slabs)
    into ``b`` columns. Blocks are padded to one common n_local with
    key-safe far rows beyond sup along the major axis.

    Returns (positions_out ((a*b*n_local, dim)), n_local,
    mid_bounds ((b+1,) int32 y-cell split points), n_real ((a*b,) int32
    real rows per device block — the rest are key-safe pads)). Feed
    mid_bounds and n_real to the sharded entry points (replicated; each
    device reads its own entries by `axis_index`).
    """
    a, b = shape
    rows = np.asarray(positions)
    n, width = rows.shape
    dim = width - n_payload
    if dim != 3:
        raise ValueError("pencil decomposition is 3D-only (use slabs)")
    pts = rows[:, :dim]
    inf, sup, gshape, strides, perm = _host_order_info(pts, cutoff)
    major = int(perm[-1])
    mid = int(perm[-2])

    cell = np.floor((pts - inf) / cutoff).astype(np.int64)
    keys = (cell * strides).sum(1)
    order = np.argsort(keys, kind="stable")
    pts_s = rows[order]
    cell_s = cell[order]

    # global y split points: ~equal counts at cell granularity
    nyc = int(gshape[mid])
    hist = np.bincount(cell_s[:, mid], minlength=nyc)
    cum = np.cumsum(hist)
    mid_bounds = [0]
    for j in range(1, b):
        target = j * n / b
        mid_bounds.append(int(np.searchsorted(cum, target) + 1))
    mid_bounds.append(nyc)
    mid_bounds = np.maximum.accumulate(np.asarray(mid_bounds, np.int64))
    if len(set(mid_bounds.tolist())) != b + 1:
        raise ValueError(
            f"cannot split {nyc} y-cells into {b} non-empty columns; "
            "use fewer y-devices or a bigger box"
        )

    # z splits: equal slot blocks of the sorted order
    zsplit = [0] + [(-(-n * i // a)) for i in range(1, a)] + [n]
    blocks = []
    for i in range(a):
        sl = slice(zsplit[i], zsplit[i + 1])
        ycells = cell_s[sl, mid]
        for j in range(b):
            m = (ycells >= mid_bounds[j]) & (ycells < mid_bounds[j + 1])
            blocks.append(pts_s[sl][m])
    # slack: per-block headroom so `repartition_pencil` can absorb
    # migration without an immediate host re-partition
    n_local = max(max(len(bk) for bk in blocks), 1) + slack

    # key-safe pads: distinct empty cells beyond sup along the major
    # axis, globally unique so pads never coincide anywhere. Pads sort
    # LAST within each block; the device side must exchange the REAL
    # tail (n_real below), not the pad tail.
    out = np.empty((a * b * n_local, width), rows.dtype)
    n_real = np.empty((a * b,), np.int32)
    pad_k = 2
    for d, bk in enumerate(blocks):
        out[d * n_local : d * n_local + len(bk)] = bk
        n_real[d] = len(bk)
        npad = n_local - len(bk)
        if npad:
            base = np.concatenate([inf, np.zeros(n_payload)])
            pad = np.tile(base, (npad, 1)).astype(rows.dtype)
            pad[:, major] = sup[major] + 2.0 * cutoff * np.arange(
                pad_k, pad_k + npad
            )
            pad_k += npad
            out[d * n_local + len(bk) : (d + 1) * n_local] = pad
    return (out, n_local, jnp.asarray(mid_bounds, jnp.int32),
            jnp.asarray(n_real))


def _global_info2(local_pos, cutoff, real, sdim=3):
    """Global grid geometry over the REAL rows' SPATIAL columns only:
    pads sit beyond sup along the major axis and must not inflate the
    box (their keys are computed off this grid and simply sort last);
    payload columns (ownership, species) never touch geometry."""
    sp = local_pos[:, :sdim]
    big = jnp.asarray(jnp.finfo(sp.dtype).max / 4, sp.dtype)
    lo = jnp.where(real[:, None], sp, big)
    hi = jnp.where(real[:, None], sp, -big)
    inf = jax.lax.pmin(jax.lax.pmin(jnp.min(lo, axis=0), ZAX), YAX)
    sup = jax.lax.pmax(jax.lax.pmax(jnp.max(hi, axis=0), ZAX), YAX)
    return GridInfo.create(Aabb(inf=inf, sup=sup), cutoff, auto_order=True)


def _axis_unit(strides, which: str, width=None):
    """One-hot (width,) float selecting the major/mid-stride axis (zeros
    over trailing payload columns). Stride values are distinct
    (1, >=5, >=25...), so exact even when traced."""
    s = strides
    if which == "major":
        u = (s == jnp.max(s)).astype(jnp.float32)
    else:
        top2 = jnp.sort(s)[-2]
        u = (s == top2).astype(jnp.float32)
    if width is not None and width > s.shape[0]:
        u = jnp.concatenate(
            [u, jnp.zeros((width - s.shape[0],), u.dtype)])
    return u


def _far_rows(info, cutoff, H, sign, dtype, salt, width=None):
    """(H, width) key-safe far rows: stacked beyond the box along the
    major axis (sign=+1 above, -1 below), mutually >= 2*cutoff apart.

    The offsets are ODD multiples of cutoff (c*(2r+5)) so this family is
    disjoint from `partition_by_pencil`'s pad family (EVEN multiples,
    sup + 2c*k) — a far row and a partitioner pad are always >= cutoff
    apart. `salt` offsets the z- and y-call sites; same-offset far rows
    from DIFFERENT devices still coincide exactly (dsq == 0), which is
    benign by construction: both rows are unowned ghosts, the energy
    weight 0.5*(o_i+o_j) == 0 selects the term out, and the forces
    kernels' dsq > 0 guards skip the pair — documented dependency, not
    an accident. ``width`` > dim appends zero payload columns."""
    dimsz = info.strides.shape[0]
    width = dimsz if width is None else width
    c = jnp.asarray(cutoff, dtype)
    unit = _axis_unit(info.strides, "major").astype(dtype)
    munit = _axis_unit(info.strides, "mid").astype(dtype)
    inf = info.aabb.inf.astype(dtype)
    sup = info.aabb.sup.astype(dtype)
    # 2D (major x mid) grid, 2*cutoff spacing: a 1D stack of H + salt
    # rows would reach ~2c*(H+salt) beyond the box — tens of thousands
    # of cells at pencil halo sizes, overflowing the tile path's f32
    # 2^24 key-exactness bound. The grid keeps both offsets ~sqrt(H).
    import math

    K = max(int(math.isqrt(max(H, 1))), 1)
    r = jnp.arange(H, dtype=dtype)
    i = jnp.floor(r / K) + jnp.asarray(salt, dtype)
    j = jnp.asarray(r % K, dtype)
    off_lo = -c * (2.0 * i + 5.0)
    off_hi = jnp.dot(sup - inf, unit) + c * (2.0 * i + 5.0)
    base = jnp.broadcast_to(inf, (H, dimsz))
    off = off_hi if sign > 0 else off_lo
    rows = (base + off[:, None] * unit[None, :]
            + (2.0 * c * j)[:, None] * munit[None, :])
    if width > dimsz:
        rows = jnp.concatenate(
            [rows, jnp.zeros((H, width - dimsz), dtype)], axis=1)
    return rows


def _zhalo(pos_s, H, info, cutoff, nreal):
    """Phase 1: exchange the REAL tail / head H rows along the z ring
    (pads sort last, so the raw tail would be pads); ring-wrap edges
    (slab 0's left, slab a-1's right) are replaced by far rows. Rows may
    carry payload columns (width > dim); far rows pad them with zeros."""
    nd = jax.lax.axis_size(ZAX)
    idx = jax.lax.axis_index(ZAX)
    dtype = pos_s.dtype
    if nd == 1 or H == 0:
        z = jnp.zeros((0, pos_s.shape[1]), dtype)
        return z, z
    fwd = [(i, (i + 1) % nd) for i in range(nd)]
    bwd = [(i, (i - 1) % nd) for i in range(nd)]
    tail0 = jnp.clip(nreal - H, 0, pos_s.shape[0] - H)
    tail = jax.lax.dynamic_slice(
        pos_s, (tail0, jnp.int32(0)), (H, pos_s.shape[1])
    )
    gl = jax.lax.ppermute(tail, ZAX, fwd)
    gr = jax.lax.ppermute(pos_s[:H], ZAX, bwd)
    below = _far_rows(info, cutoff, H, -1, dtype, 0, width=pos_s.shape[1])
    above = _far_rows(info, cutoff, H, +1, dtype, 0, width=pos_s.shape[1])
    gl = jnp.where(idx == 0, below, gl)
    gr = jnp.where(idx == nd - 1, above, gr)
    return gl, gr


def _extract_ycolumn(ext, ycell, target_cell, HY):
    """Compact the rows with y-cell == target_cell to the front by one
    class-key sort and return (rows (HY, width), count, ok).

    Rows beyond the true count are arbitrary non-boundary rows — safe by
    distance at the receiver (>= one full cell away from its column).
    Far-pad rows forwarded this way can coincide exactly with another
    device's far pads; that ghost-ghost coincidence is benign by the
    dsq > 0 force guards and the w > 0 energy select (see `_far_rows`)."""
    cls = jnp.where(ycell == target_cell, 0, 1).astype(jnp.int32)
    iota = jnp.arange(ext.shape[0], dtype=jnp.int32)
    ops = (cls, iota) + tuple(ext[:, a] for a in range(ext.shape[1]))
    out = jax.lax.sort(ops, num_keys=2, is_stable=False)
    rows = jnp.stack(out[2:], axis=-1)[:HY]
    cnt = jnp.sum(cls == 0)
    return rows, cnt, cnt <= HY


def _ycell_of(rows, info, cutoff):
    """Mid-axis cell index per row (payload columns ignored); junk rows
    outside the box along the MAJOR axis map to -9 (never a boundary
    column): a pad's mid coordinate is inf[mid] -> y == 0 == column 0's
    edge otherwise."""
    dtype = rows.dtype
    unit = _axis_unit(info.strides, "mid", width=rows.shape[1]).astype(dtype)
    org = jnp.dot(
        info.aabb.inf.astype(dtype),
        _axis_unit(info.strides, "mid").astype(dtype))
    c = jnp.asarray(cutoff, dtype)
    y = jnp.floor((jnp.dot(rows, unit) - org) / c).astype(jnp.int32)
    mu = _axis_unit(info.strides, "major", width=rows.shape[1]).astype(dtype)
    mu3 = _axis_unit(info.strides, "major").astype(dtype)
    mj = jnp.dot(rows, mu)
    inbox = (mj >= jnp.dot(info.aabb.inf.astype(dtype), mu3)) & (
        mj <= jnp.dot(info.aabb.sup.astype(dtype), mu3)
    )
    return jnp.where(inbox, y, jnp.int32(-9))


def _yhalo(ext1, info, cutoff, HY, mid_bounds):
    """Phase 2: exchange boundary cell columns along the y ring.

    Returns (ygl, ygr, ok): rows from the left/right column neighbors
    (mesh-edge neighbors replaced by far rows)."""
    nd = jax.lax.axis_size(YAX)
    idy = jax.lax.axis_index(YAX)
    dtype = ext1.dtype
    HY = min(HY, ext1.shape[0])  # a column can never exceed the pool
    if nd == 1 or HY == 0:
        z = jnp.zeros((0, ext1.shape[1]), dtype)
        return z, z, jnp.asarray(True)
    y = _ycell_of(ext1, info, cutoff)
    y_lo = mid_bounds[idy]
    y_hi = mid_bounds[idy + 1] - 1

    send_l, cnt_l, ok_l = _extract_ycolumn(ext1, y, y_lo, HY)
    send_r, cnt_r, ok_r = _extract_ycolumn(ext1, y, y_hi, HY)

    fwd = [(i, (i + 1) % nd) for i in range(nd)]
    bwd = [(i, (i - 1) % nd) for i in range(nd)]
    ygl = jax.lax.ppermute(send_r, YAX, fwd)   # left neighbor's top column
    ygr = jax.lax.ppermute(send_l, YAX, bwd)   # right neighbor's bottom
    # salt offsets the y family's major rows past the z family's
    # (z uses i in [0, ceil(H/K))); sqrt-grid keeps this ~sqrt(H)
    import math

    ysalt = int(math.isqrt(max(HY, 1))) + 3
    far_l = _far_rows(info, cutoff, HY, -1, dtype, ysalt,
                      width=ext1.shape[1])
    far_r = _far_rows(info, cutoff, HY, +1, dtype, ysalt,
                      width=ext1.shape[1])
    ygl = jnp.where(idy == 0, far_l, ygl)
    ygr = jnp.where(idy == nd - 1, far_r, ygr)
    return ygl, ygr, ok_l & ok_r


def _zhalo_ok(sorted_keys, strides, H, nreal, reach=None):
    """z-window coverage, both sides (the 0.5-ownership rule needs every
    owned row's full neighborhood locally) — `halo_coverage_ok` adapted
    to per-block pads: only the REAL rows (pads sort last) count, and
    the neighbor extremes are the real extremes. ``reach`` widens the
    window for min-imaged axes (`geometry.key_window`)."""
    nd = jax.lax.axis_size(ZAX)
    if nd == 1:
        return jnp.asarray(True)
    idx = jax.lax.axis_index(ZAX)
    w = key_window(strides, reach).astype(sorted_keys.dtype)
    real = jnp.arange(sorted_keys.shape[0]) < nreal
    fwd = [(i, (i + 1) % nd) for i in range(nd)]
    bwd = [(i, (i - 1) % nd) for i in range(nd)]
    kmax_real = sorted_keys[jnp.maximum(nreal - 1, 0)]
    right_min = jax.lax.ppermute(sorted_keys[0], ZAX, bwd)
    needed_r = jnp.sum((sorted_keys >= right_min - w) & real)
    ok = jnp.where(
        idx < nd - 1,
        (needed_r <= H) & ((needed_r < nreal) | (idx == 0)),
        True,
    )
    left_max = jax.lax.ppermute(kmax_real, ZAX, fwd)
    needed_l = jnp.sum((sorted_keys <= left_max + w) & real)
    ok &= jnp.where(
        idx > 0,
        (needed_l <= H) & ((needed_l < nreal) | (idx == nd - 1)),
        True,
    )
    # an empty block cannot vouch for its neighbors' windows
    return ok & (nreal > 0)


def _ydrift_ok(pos, info, cutoff, real, mid_bounds):
    """Geometric y-residency check: every REAL row's current y-cell must
    lie inside this device's column [mid_bounds[idy], mid_bounds[idy+1]).

    The z axis is data-driven (key-window checks), but y coverage is
    capacity-only — without this check a particle drifting across its
    pencil's y-cell boundary under repeated MD steps would silently lose
    its pairs with the next-over column on BOTH devices (it no longer
    matches the boundary-column extraction, and partners two cells over
    are never received). Trips coverage_ok instead; callers then
    repartition (`repartition_pencil`)."""
    idy = jax.lax.axis_index(YAX)
    y = _ycell_of(pos, info, cutoff)
    inside = (y >= mid_bounds[idy]) & (y < mid_bounds[idy + 1])
    return jnp.all(jnp.where(real, inside, True))


def _all_ok2(flag):
    f = jax.lax.pmin(flag.astype(jnp.int32), ZAX)
    return jax.lax.pmin(f, YAX) > 0


def _my_nreal(n_real):
    nb = jax.lax.axis_size(YAX)
    flat = jax.lax.axis_index(ZAX) * nb + jax.lax.axis_index(YAX)
    return n_real[flat]


def _build_ext2(pos, cutoff, HZ, HY, mid_bounds, n_real, need_slot,
                n_payload=0, coord_keys=False):
    """Shared pencil preamble: local sort, two-phase halos, one re-sort
    of the extended block. ``pos`` may carry ``n_payload`` trailing
    per-particle columns (species, ...) that ride every exchange.

    ``coord_keys=True`` sorts the extended block by (key, x.., -o)
    instead of key alone: every device then orders equal-key rows
    identically (halo copies are bitwise-equal across devices), so "the
    larger sorted slot" of any pair names the SAME particle on every
    device that realizes it — the boolean ownership rule integer
    observables (pair counts, histograms) need, where the fractional
    0.5*(o_i+o_j) weight cannot apply. The trailing -o tie key breaks
    bitwise-coincident real/ghost rows deterministically toward the
    ghost (such dsq == 0 cross pairs are dropped on every device rather
    than double-counted on some).

    Returns (ext2 sorted (nx, width), keys, o2 ownership plane,
    payload planes ((nx, n_payload) or None), slot (or None), info,
    flags, n_loc, Hg) — Hg is the ACTUAL z-ghost count (0 on a 1-device
    z axis, where `_zhalo` returns empty ghosts; sizing ownership or
    force slices by the requested HZ would misalign)."""
    n_loc = pos.shape[0]
    width = pos.shape[1]
    sdim = width - n_payload
    nreal = _my_nreal(n_real)
    real = jnp.arange(n_loc) < nreal
    info = _global_info2(pos, cutoff, real, sdim=sdim)
    # STABLE local sort: `_md_step_local` feeds an already key-sorted
    # block (velocities rode the outer sort) — this inner sort must then
    # be the identity permutation so the force un-sort lines up with the
    # outer (pos_s, vel_s) pairing; an unstable sort reorders equal-key
    # rows and silently mismatches forces to velocities (caught by
    # test_pencil_md_step_forces_match_oracle)
    bins, pos_s = bin_and_sort(pos, cutoff, max_cells=1, info=info)
    dtype = pos_s.dtype
    H = min(HZ, n_loc)

    gl, gr = _zhalo(pos_s, H, info, cutoff, nreal)
    Hg = gl.shape[0]  # 0 when the z axis has one device
    ext1 = jnp.concatenate([gl, pos_s, gr], axis=0)
    # ownership: my REAL rows own their pairs; pads (far rows, no pairs)
    # may carry either value — keep them owned=0 for hygiene
    o1 = jnp.concatenate([
        jnp.zeros((Hg,), dtype), real.astype(dtype),
        jnp.zeros((Hg,), dtype),
    ])
    ygl, ygr, y_ok = _yhalo(ext1, info, cutoff, HY, mid_bounds)
    ext2 = jnp.concatenate([ext1, ygl, ygr], axis=0)
    ny = ygl.shape[0] + ygr.shape[0]
    o2 = jnp.concatenate([o1, jnp.zeros((ny,), dtype)])

    keys2 = jax.vmap(info.flat_cell_index)(ext2[:, :sdim])
    if coord_keys:
        # (key, x.., -o) keys: equal-key order globally consistent
        ops = (
            (keys2,) + tuple(ext2[:, a] for a in range(sdim)) + (-o2,)
            + tuple(ext2[:, a] for a in range(sdim, width)) + (o2,)
        )
        nkeys = 2 + sdim
    else:
        ops = (keys2,) + tuple(ext2[:, a] for a in range(width)) + (o2,)
        nkeys = 1
    if need_slot:
        ops = ops + (jnp.arange(ext2.shape[0], dtype=jnp.int32),)
    out = jax.lax.sort(ops, num_keys=nkeys, is_stable=False)
    keys_s = out[0]
    ext_s = jnp.stack(out[1 : 1 + sdim], axis=-1)
    base = 1 + sdim + (1 if coord_keys else 0)
    pay_s = (
        jnp.stack(out[base : base + width - sdim], axis=-1)
        if n_payload else None
    )
    o_s = out[base + width - sdim]
    slot_s = out[base + width - sdim + 1] if need_slot else None

    z_ok = _zhalo_ok(bins.sorted_keys, info.strides, H, nreal)
    drift_ok = _ydrift_ok(pos_s, info, cutoff, real, mid_bounds)
    return (ext_s, keys_s, o_s, pay_s, slot_s, info,
            z_ok & y_ok & drift_ok, n_loc, Hg)


def _weighted_term(term, n_payload=0):
    """Ownership-halved term: payload layout per side is (o, p1..pk), so
    the wrapped ``term`` sees (dsq, p1_i..pk_i, p1_j..pk_j)."""
    def wterm(dsq, *pay):
        k = n_payload
        oi, pi = pay[0], pay[1 : 1 + k]
        oj, pj = pay[1 + k], pay[2 + k :]
        # select, not multiply: ghost-ghost far rows can coincide
        # (dsq == 0, term == inf) and 0 * inf would poison the sum
        w = 0.5 * (oi + oj)
        args = pi + pj
        return jnp.where(
            w > 0, w * term(jnp.where(w > 0, dsq, 1.0), *args),
            jnp.zeros_like(dsq))

    return wterm


def sharded_pencil_lj_energy(
    mesh: Mesh,
    *,
    cutoff: float,
    HZ: int,
    HY: int,
    M: int = 4096,
    L: int = 512,
    MAXJ: int = 8,
    use_tile: bool = False,
    term=lj_term,
    n_payload: int = 0,
    interpret: bool = False,
):
    """Jitted global pair energy over pencil-sharded positions.

    efn(positions, mid_bounds, n_real) -> (energy, coverage_ok):
    positions is the `partition_by_pencil` layout sharded
    P((ZAX, YAX), None) — optionally with ``n_payload`` trailing
    per-particle columns (e.g. species), in which case ``term`` receives
    (dsq, p_i..., p_j...) like `parallel.sharded_lj_energy(n_payload=)`;
    mid_bounds and n_real replicated. Every pair is counted exactly once
    globally by the 0.5*(o_i+o_j) ownership plane (module docstring).
    """
    if use_tile and n_payload:
        raise ValueError(
            "use_tile carries ONE packed payload row, already used by "
            "the ownership plane; payload columns need the lag path"
        )
    wterm = _weighted_term(term, n_payload)

    def local(pos, mid_bounds, n_real):
        ext_s, keys_s, o_s, pay_s, _, info, ok, n_loc, Hg = _build_ext2(
            pos, cutoff, HZ, HY, mid_bounds, n_real, need_slot=False,
            n_payload=n_payload,
        )
        csq = jnp.asarray(cutoff, pos.dtype) ** 2
        if use_tile:
            from ..ops.tile_pairs import tile_pair_reduce

            e_loc, cap = tile_pair_reduce(
                ext_s, keys_s, info.strides, csq, sorted_payload=o_s,
                MAXJ=MAXJ, term=wterm, interpret=interpret,
            )
        else:
            from ..ops.pallas_pairs import lag_coverage_ok

            payload = (
                o_s[:, None] if pay_s is None
                else jnp.concatenate([o_s[:, None], pay_s], axis=1)
            )
            e_loc = pair_lag_reduce(
                ext_s, keys_s, info.strides, csq,
                sorted_payload=payload, M=M, L=L, term=wterm,
                interpret=interpret,
            )
            cap = lag_coverage_ok(keys_s, info.strides, L)
        e = jax.lax.psum(jax.lax.psum(e_loc, ZAX), YAX)
        return e, _all_ok2(ok & cap)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P((ZAX, YAX), None), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def _md_step_local(pos, vel, mid_bounds, n_real, *, cutoff, HZ, HY, dt,
                   M, L, MAXJ, use_tile, interpret):
    """One pencil MD step on local blocks (shared by step and run)."""
    wterm = _weighted_term(lj_term)
    nreal = _my_nreal(n_real)
    real = jnp.arange(pos.shape[0]) < nreal
    info = _global_info2(pos, cutoff, real)
    # velocities ride the local sort as payload columns
    bins, cols = bin_and_sort(
        jnp.concatenate([pos, vel], axis=1), cutoff, max_cells=1,
        info=info,
    )
    dim = pos.shape[1]
    pos_s, vel_s = cols[:, :dim], cols[:, dim:]

    (ext_s, keys_s, o_s, _, slot_s, info, ok, n_loc, Hg) = _build_ext2(
        pos_s, cutoff, HZ, HY, mid_bounds, n_real, need_slot=True
    )
    csq = jnp.asarray(cutoff, pos.dtype) ** 2
    if use_tile:
        from ..ops.tile_pairs import tile_pair_forces, tile_pair_reduce

        f, cap_f = tile_pair_forces(
            ext_s, keys_s, info.strides, csq, MAXJ=MAXJ,
            gfn=lj_force_factor, interpret=interpret,
        )
        e_loc, cap_e = tile_pair_reduce(
            ext_s, keys_s, info.strides, csq, sorted_payload=o_s,
            MAXJ=MAXJ, term=wterm, interpret=interpret,
        )
        cap = cap_f & cap_e
    else:
        from ..ops.pallas_pairs import lag_coverage_ok

        f = pair_lag_forces(
            ext_s, keys_s, info.strides, csq, M=M, L=L,
            gfn=lj_force_factor, interpret=interpret,
        )
        cap = lag_coverage_ok(keys_s, info.strides, L)
        e_loc = pair_lag_reduce(
            ext_s, keys_s, info.strides, csq, sorted_payload=o_s[:, None],
            M=M, L=L, term=wterm, interpret=interpret,
        )
    # un-sort forces to pre-sort (concat) order, slice the owned rows
    uops = (slot_s,) + tuple(f[:, a] for a in range(dim))
    uout = jax.lax.sort(uops, num_keys=1, is_stable=False)
    f_own = jnp.stack(uout[1:], axis=-1)[Hg : Hg + n_loc]

    vel_new = vel_s + dt * f_own
    pos_new = pos_s + dt * vel_new
    e = jax.lax.psum(jax.lax.psum(e_loc, ZAX), YAX)
    return pos_new, vel_new, e, _all_ok2(ok & cap)


def sharded_pencil_md_step(
    mesh: Mesh,
    *,
    cutoff: float,
    HZ: int,
    HY: int,
    dt: float = 1e-4,
    M: int = 4096,
    L: int = 512,
    MAXJ: int = 8,
    use_tile: bool = False,
    interpret: bool = False,
):
    """Jitted MD step over the pencil mesh.

    step(positions, velocities, mid_bounds, n_real) -> (positions,
    velocities, energy, coverage_ok); state arrays keep the
    `partition_by_pencil` layout (each device's block re-sorted by key
    each step). Forces are full-stencil i-side sums over the extended
    sorted block — exact for owned rows whenever coverage_ok — then
    un-sorted back to block order by a second multi-operand sort (never
    a gather). coverage_ok folds the y-residency check (`_ydrift_ok`):
    once any particle drifts out of its pencil's y-column the flag trips
    and the caller must `repartition_pencil`. ``use_tile`` runs the
    segment-tile kernels (cubic/wide boxes) instead of the lag pair.
    """

    def local(pos, vel, mid_bounds, n_real):
        return _md_step_local(
            pos, vel, mid_bounds, n_real, cutoff=cutoff, HZ=HZ, HY=HY,
            dt=dt, M=M, L=L, MAXJ=MAXJ, use_tile=use_tile,
            interpret=interpret,
        )

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P((ZAX, YAX), None), P((ZAX, YAX), None), P(), P()),
        out_specs=(P((ZAX, YAX), None), P((ZAX, YAX), None), P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def sharded_pencil_md_run(
    mesh: Mesh,
    *,
    cutoff: float,
    HZ: int,
    HY: int,
    steps: int,
    dt: float = 1e-4,
    M: int = 4096,
    L: int = 512,
    MAXJ: int = 8,
    use_tile: bool = False,
    interpret: bool = False,
):
    """Whole pencil MD trajectory in ONE jitted dispatch (the pencil
    sibling of `parallel.sharded_md_run` / `sharded_pbc_md_run`): scans
    `sharded_pencil_md_step`'s local body, accumulating the coverage
    flag — including the per-step y-residency check, so a mid-trajectory
    drift out of a pencil column is reported, never silently wrong.

    run(positions, velocities, mid_bounds, n_real) -> (positions,
    velocities, final_energy, all_covered)."""

    def local(pos, vel, mid_bounds, n_real):
        def body(carry, _):
            p, v, okacc = carry
            p2, v2, _e, ok = _md_step_local(
                p, v, mid_bounds, n_real, cutoff=cutoff, HZ=HZ, HY=HY,
                dt=dt, M=M, L=L, MAXJ=MAXJ, use_tile=use_tile,
                interpret=interpret,
            )
            return (p2, v2, okacc & ok), None

        (p, v, ok), _ = jax.lax.scan(
            body, (pos, vel, jnp.asarray(True)), None, length=steps
        )
        _, _, e, ok_e = _md_step_local(
            p, v, mid_bounds, n_real, cutoff=cutoff, HZ=HZ, HY=HY,
            dt=0.0, M=M, L=L, MAXJ=MAXJ, use_tile=use_tile,
            interpret=interpret,
        )
        return p, v, e, ok & ok_e

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P((ZAX, YAX), None), P((ZAX, YAX), None), P(), P()),
        out_specs=(P((ZAX, YAX), None), P((ZAX, YAX), None), P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def _own_pair_mask(wi, wj):
    """Boolean ownership for integer observables on the pencil mesh:
    keep a pair iff its larger-slot endpoint (the kernels' own side) is
    one of MY real rows. Exact once-per-pair globally BECAUSE the
    extended block is sorted with coordinate tie keys
    (`_build_ext2(coord_keys=True)`): every device agrees on which
    endpoint is the larger slot."""
    return wi > 0.5


def sharded_pencil_stress(
    mesh: Mesh,
    *,
    cutoff: float,
    HZ: int,
    HY: int,
    gfn=None,
    M: int = 4096,
    L: int = 512,
    MAXJ: int = 8,
    use_tile: bool = False,
    interpret: bool = False,
):
    """Jitted global configurational stress tensor over pencil-sharded
    positions (open boundaries; the pencil sibling of
    `parallel.sharded_stress`). Each pair's g is scaled MULTIPLICATIVELY
    by the 0.5*(o_i + o_j) ownership rule (`pbc._half_own_weight` — the
    d (x) d outer product cannot absorb a term weighting), and the
    (3, 3) tensors psum over both mesh axes. ``use_tile=True`` runs the
    segment-tile stress kernel (`tile_pairs.tile_pair_stress` with
    ``pair_weight``). sfn(positions, mid_bounds, n_real) ->
    ((3, 3) stress, coverage_ok)."""
    from .pbc import _half_own_weight

    gfn_eff = gfn or lj_force_factor

    def local(pos, mid_bounds, n_real):
        ext_s, keys_s, o_s, _, _, info, ok, _, _ = _build_ext2(
            pos, cutoff, HZ, HY, mid_bounds, n_real, need_slot=False,
        )
        csq = jnp.asarray(cutoff, pos.dtype) ** 2
        if use_tile:
            from ..ops.tile_pairs import tile_pair_stress

            sig, cap = tile_pair_stress(
                ext_s, keys_s, info.strides, csq, sorted_payload=o_s,
                pair_weight=_half_own_weight, gfn=gfn_eff, MAXJ=MAXJ,
                interpret=interpret,
            )
        else:
            from ..ops.pallas_pairs import lag_coverage_ok, pair_lag_stress

            sig = pair_lag_stress(
                ext_s, keys_s, info.strides, csq,
                sorted_payload=o_s[:, None], pair_weight=_half_own_weight,
                gfn=gfn_eff, M=M, L=L, interpret=interpret,
            )
            cap = lag_coverage_ok(keys_s, info.strides, L)
        sig = jax.lax.psum(jax.lax.psum(sig, ZAX), YAX)
        return sig, _all_ok2(ok & cap)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P((ZAX, YAX), None), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def sharded_pencil_pair_hist(
    mesh: Mesh,
    edges,
    *,
    HZ: int,
    HY: int,
    M: int = 1024,
    L: int = 512,
    MAXJ: int = 8,
    use_tile: bool = False,
    interpret: bool = False,
):
    """Jitted global pair-distance histogram over pencil-sharded
    positions (the pencil sibling of `parallel.sharded_pair_hist`):
    cumulative int counts of unique pairs with ``dsq < edges[k]^2``,
    every pair counted exactly once globally. Integer counts cannot take
    the fractional 0.5-ownership weight, so the extended block is
    sorted with coordinate tie keys (`_build_ext2(coord_keys=True)`)
    and a pair is kept iff its larger-slot endpoint is a real row of
    the executing device (`_own_pair_mask`) — a globally consistent
    boolean rule. Bitwise-coincident real/ghost duplicate rows (dsq==0
    cross pairs) are deterministically dropped by the -o tie key.
    hfn(positions, mid_bounds, n_real) -> ((2, K) int32 hi/lo planes,
    coverage_ok); reconstruct with `pallas_pairs.combine_count_vec`.
    ``edges[-1]`` is the effective cutoff and must match the grid."""
    cutoff = float(np.asarray(edges)[-1])
    edges64 = np.asarray(edges, np.float64) ** 2

    def local(pos, mid_bounds, n_real):
        ext_s, keys_s, o_s, _, _, info, ok, _, _ = _build_ext2(
            pos, cutoff, HZ, HY, mid_bounds, n_real, need_slot=False,
            coord_keys=True,
        )
        edges_sq = jnp.asarray(edges64, pos.dtype)
        if use_tile:
            from ..ops.tile_pairs import tile_pair_hist

            packed, cap = tile_pair_hist(
                ext_s, keys_s, info.strides, edges_sq,
                sorted_payload=o_s, pair_mask=_own_pair_mask,
                MAXJ=MAXJ, interpret=interpret,
            )
        else:
            from ..ops.pallas_pairs import lag_coverage_ok, pair_lag_hist

            packed = pair_lag_hist(
                ext_s, keys_s, info.strides, edges_sq,
                sorted_payload=o_s[:, None], pair_mask=_own_pair_mask,
                M=M, L=L, interpret=interpret,
            )
            cap = lag_coverage_ok(keys_s, info.strides, L)
        packed = jax.lax.psum(jax.lax.psum(packed, ZAX), YAX)
        return packed, _all_ok2(ok & cap)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P((ZAX, YAX), None), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def repartition_pencil(
    mesh: Mesh,
    *,
    cutoff: float,
    shape: tuple[int, int],
    n_payload: int = 0,
    interpret: bool = False,
):
    """Jitted global repartition over the pencil mesh — the migration
    path `_ydrift_ok` trips toward (the pencil analogue of
    `parallel.repartition`; all_gather flavor: correctness-first,
    the O(A) exchange optimization is the slab path's specialty).

    repfn(positions, mid_bounds, n_real) -> (positions, mid_bounds,
    n_real, ok): re-sorts ALL real rows globally by cell key, re-splits
    into ``a`` equal slot z-blocks x the SAME y-cell columns
    (mid_bounds is kept — y splits are cell-granular configuration),
    and rebuilds each device's block with fresh key-safe pads. ``ok``
    goes False iff some block outgrows n_local (grow and re-jit;
    never silently dropped rows). Positions may carry ``n_payload``
    trailing columns (velocities, species) that ride the migration.
    """
    a, b = shape

    def local(pos, mid_bounds, n_real):
        n_loc = pos.shape[0]
        width = pos.shape[1]
        sdim = width - n_payload
        nreal = _my_nreal(n_real)
        real = jnp.arange(n_loc) < nreal
        info = _global_info2(pos, cutoff, real, sdim=sdim)

        # gather every device's block (z-major, then y) + real masks
        allp = jax.lax.all_gather(pos, ZAX, axis=0, tiled=False)
        allp = jax.lax.all_gather(allp, YAX, axis=1, tiled=False)
        allp = allp.reshape(a * b * n_loc, width)
        allreal = (
            jnp.arange(n_loc)[None, :] < n_real.reshape(a * b)[:, None]
        ).reshape(-1)

        keys = jax.vmap(info.flat_cell_index)(allp[:, :sdim])
        BIGK = jnp.int32(1 << 29)
        keys = jnp.where(allreal, keys, BIGK)
        ops = (keys,) + tuple(allp[:, c] for c in range(width))
        out = jax.lax.sort(ops, num_keys=1, is_stable=False)
        keys_s = out[0]
        rows_s = jnp.stack(out[1:], axis=-1)
        real_s = keys_s < BIGK
        N = jnp.sum(real_s)

        # z class: equal slot blocks of the real prefix; y class from
        # the mid-axis cell against mid_bounds
        slot = jnp.arange(rows_s.shape[0], dtype=jnp.int32)
        zc = jnp.clip((slot.astype(jnp.int64) * a) // jnp.maximum(N, 1),
                      0, a - 1).astype(jnp.int32)
        y = _ycell_of(rows_s[:, :sdim], info, cutoff)
        yc = jnp.clip(
            jnp.searchsorted(mid_bounds[1:-1], y, side="right"),
            0, b - 1,
        ).astype(jnp.int32)
        mine = (
            real_s
            & (zc == jax.lax.axis_index(ZAX))
            & (yc == jax.lax.axis_index(YAX))
        )
        cls = jnp.where(mine, 0, 1).astype(jnp.int32)
        ops2 = (cls, keys_s) + tuple(
            rows_s[:, c] for c in range(width))
        out2 = jax.lax.sort(ops2, num_keys=2, is_stable=False)
        blk = jnp.stack(out2[2:], axis=-1)[:n_loc]
        cnt = jnp.sum(mine).astype(jnp.int32)
        ok = cnt <= n_loc

        # fresh key-safe pads (device-unique EVEN-multiple family, like
        # the host partitioner)
        dtype = pos.dtype
        unit = _axis_unit(info.strides, "major", width=width).astype(dtype)
        inf3 = info.aabb.inf.astype(dtype)
        extent = jnp.dot(
            info.aabb.sup.astype(dtype) - inf3,
            _axis_unit(info.strides, "major").astype(dtype))
        dev = (jax.lax.axis_index(ZAX) * b
               + jax.lax.axis_index(YAX)).astype(dtype)
        k = jnp.arange(n_loc, dtype=dtype) + dev * n_loc
        pad_off = extent + 2.0 * jnp.asarray(cutoff, dtype) * (k + 2.0)
        base = jnp.concatenate(
            [inf3, jnp.zeros((width - sdim,), dtype)])
        pads = base[None, :] + pad_off[:, None] * unit[None, :]
        row_idx = jnp.arange(n_loc)[:, None]
        blk = jnp.where(row_idx < cnt, blk, pads)

        cnts = jax.lax.all_gather(cnt, ZAX, axis=0, tiled=False)
        cnts = jax.lax.all_gather(cnts, YAX, axis=1, tiled=False)
        return blk, mid_bounds, cnts.reshape(-1), _all_ok2(ok)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P((ZAX, YAX), None), P(), P()),
        out_specs=(P((ZAX, YAX), None), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


# ---------------------------------------------------------------------------
# Periodic boundary conditions on the pencil mesh (round 4): the pencil
# sibling of `parallel.pbc` — z (major) wraps around the z ring, y (mid)
# wraps around the y ring, corners ride the same two-phase forwarding,
# and the minor axis gets `ops.pbc.pbc_extend(axes=minor)` ghost images
# (including images OF halo rows — corner pairs across the wraps). The
# ownership plane 0.5*(o_i+o_j) needs no changes: wrapped halo rows and
# minor images are all unowned copies.
# ---------------------------------------------------------------------------


def _pencil_axes(box, cutoff):
    """Host (major, mid, minor) axis indices of the static extended
    grid (`parallel.pbc._static_info` ordering)."""
    shape = np.floor(
        (np.asarray(box, np.float64) + 4.0 * cutoff) / cutoff
    ).astype(np.int64) + 1
    order = np.argsort(shape, kind="stable")
    return int(order[-1]), int(order[-2]), int(order[0])


def partition_by_pencil_pbc(positions, origin, box, cutoff,
                            shape: tuple[int, int], n_payload: int = 0,
                            slack: int = 0):
    """Host-side pencil partition of a periodic box: wrap, key-sort with
    the STATIC extended grid ([origin - 2c, origin + box + 2c], matching
    `_static_info`), split into a equal slot z-blocks x b y-cell columns.
    y-cells are numbered relative to ``origin`` (cell = floor((y -
    origin_mid)/cutoff)), the numbering the device side reproduces.
    Returns (rows ((a*b*n_local, 3+n_payload)), n_local, mid_bounds,
    n_real)."""
    a, b = shape
    rows = np.asarray(positions, np.float64)
    n, width = rows.shape
    dim = width - n_payload
    if dim != 3:
        raise ValueError("pencil decomposition is 3D-only (use slabs)")
    origin = np.asarray(origin, np.float64).reshape(3)
    box = np.asarray(box, np.float64).reshape(3)
    pts = origin + np.mod(rows[:, :3] - origin, box)
    rows = rows.copy()
    rows[:, :3] = pts

    inf = origin - 2.0 * cutoff
    gshape = np.floor((box + 4.0 * cutoff) / cutoff).astype(np.int64) + 1
    perm = np.argsort(gshape, kind="stable")
    padded = gshape[perm] + 4
    s = np.concatenate([[1], np.cumprod(padded[:-1])])
    strides = np.empty_like(s)
    strides[perm] = s
    major, mid, _ = _pencil_axes(box, cutoff)

    cell = np.floor((pts - inf) / cutoff).astype(np.int64)
    keys = (cell * strides).sum(1)
    order = np.argsort(keys, kind="stable")
    rows_s = rows[order]
    ycell_s = np.floor(
        (rows_s[:, mid] - origin[mid]) / cutoff
    ).astype(np.int64)

    nyc = int(np.floor(box[mid] / cutoff)) + 1
    hist = np.bincount(np.clip(ycell_s, 0, nyc - 1), minlength=nyc)
    cum = np.cumsum(hist)
    mid_bounds = [0]
    for j in range(1, b):
        mid_bounds.append(int(np.searchsorted(cum, j * n / b) + 1))
    mid_bounds.append(nyc)
    mid_bounds = np.maximum.accumulate(np.asarray(mid_bounds, np.int64))
    if len(set(mid_bounds.tolist())) != b + 1:
        raise ValueError(
            f"cannot split {nyc} y-cells into {b} non-empty columns; "
            "use fewer y-devices or a bigger box"
        )

    zsplit = [0] + [(-(-n * i // a)) for i in range(1, a)] + [n]
    blocks = []
    for i in range(a):
        sl = slice(zsplit[i], zsplit[i + 1])
        yc = np.clip(ycell_s[sl], 0, nyc - 1)
        for j in range(b):
            m = (yc >= mid_bounds[j]) & (yc < mid_bounds[j + 1])
            blocks.append(rows_s[sl][m])
    n_local = max(max(len(bk) for bk in blocks), 1) + slack

    out = np.empty((a * b * n_local, width), np.float64)
    n_real = np.empty((a * b,), np.int32)
    pad_k = 2
    for d, bk in enumerate(blocks):
        out[d * n_local : d * n_local + len(bk)] = bk
        n_real[d] = len(bk)
        npad = n_local - len(bk)
        if npad:
            base = np.concatenate([origin, np.zeros(n_payload)])
            pad = np.tile(base, (npad, 1))
            pad[:, major] = origin[major] + box[major] \
                + 2.0 * cutoff * np.arange(pad_k, pad_k + npad)
            pad_k += npad
            out[d * n_local + len(bk) : (d + 1) * n_local] = pad
    return (out, n_local, jnp.asarray(mid_bounds, jnp.int32),
            jnp.asarray(n_real))


def _zhalo_pbc(pos_s, H, origin, box, major, nreal):
    """Phase-1 z-ring exchange with PERIODIC wrap: ring-edge halos are
    the opposite end's rows shifted by -/+ box[major] (the periodic
    images). Works for a 1-device z axis too (self-permutes: a block's
    own head/tail become its wrap images). Only in-box rows shift —
    partitioner pads would otherwise land back inside the box."""
    nd = jax.lax.axis_size(ZAX)
    idx = jax.lax.axis_index(ZAX)
    dtype = pos_s.dtype
    if H == 0:
        z = jnp.zeros((0, pos_s.shape[1]), dtype)
        return z, z
    fwd = [(i, (i + 1) % nd) for i in range(nd)]
    bwd = [(i, (i - 1) % nd) for i in range(nd)]
    tail0 = jnp.clip(nreal - H, 0, pos_s.shape[0] - H)
    tail = jax.lax.dynamic_slice(
        pos_s, (tail0, jnp.int32(0)), (H, pos_s.shape[1])
    )
    gl = jax.lax.ppermute(tail, ZAX, fwd)
    gr = jax.lax.ppermute(pos_s[:H], ZAX, bwd)
    shift = jnp.zeros((pos_s.shape[1],), dtype).at[major].set(
        jnp.asarray(box, dtype).reshape(3)[major])
    org_m = jnp.asarray(origin, dtype).reshape(3)[major]
    sup_m = org_m + jnp.asarray(box, dtype).reshape(3)[major]
    in_l = (gl[:, major] >= org_m) & (gl[:, major] < sup_m)
    in_r = (gr[:, major] >= org_m) & (gr[:, major] < sup_m)
    gl = jnp.where((idx == 0) & in_l[:, None], gl - shift, gl)
    gr = jnp.where((idx == nd - 1) & in_r[:, None], gr + shift, gr)
    return gl, gr


def _ycell_pbc(rows, origin, box, cutoff, major, mid):
    """Mid-axis cell index relative to ``origin`` (the partitioner's
    numbering); rows far outside the box along MAJOR (pads at >= 4c) map
    to -9, while wrapped z-ghosts (within ~H rows of the faces) keep
    their true column so corner forwarding sees them."""
    dtype = rows.dtype
    org = jnp.asarray(origin, dtype).reshape(3)
    bx = jnp.asarray(box, dtype).reshape(3)
    c = jnp.asarray(cutoff, dtype)
    y = jnp.floor((rows[:, mid] - org[mid]) / c).astype(jnp.int32)
    mj = rows[:, major]
    near = (mj >= org[major] - 1.5 * c) & (
        mj <= org[major] + bx[major] + 1.5 * c)
    return jnp.where(near, y, jnp.int32(-9))


def _yhalo_pbc(ext1, origin, box, cutoff, HY, mid_bounds, major, mid):
    """Phase-2 y-ring exchange with PERIODIC wrap: mesh-edge columns
    receive the opposite edge's boundary column shifted by -/+ box[mid].
    Forwarding the phase-1 result covers the (possibly wrapped) corner
    pencils exactly like the open-boundary two-phase trick."""
    nd = jax.lax.axis_size(YAX)
    idy = jax.lax.axis_index(YAX)
    dtype = ext1.dtype
    HY = min(HY, ext1.shape[0])  # a column can never exceed the pool
    if HY == 0:
        z = jnp.zeros((0, ext1.shape[1]), dtype)
        return z, z, jnp.asarray(True)
    y = _ycell_pbc(ext1, origin, box, cutoff, major, mid)
    y_lo = mid_bounds[idy]
    y_hi = mid_bounds[idy + 1] - 1

    send_l, cnt_l, ok_l = _extract_ycolumn(ext1, y, y_lo, HY)
    send_r, cnt_r, ok_r = _extract_ycolumn(ext1, y, y_hi, HY)

    fwd = [(i, (i + 1) % nd) for i in range(nd)]
    bwd = [(i, (i - 1) % nd) for i in range(nd)]
    ygl = jax.lax.ppermute(send_r, YAX, fwd)
    ygr = jax.lax.ppermute(send_l, YAX, bwd)
    shift = jnp.zeros((ext1.shape[1],), dtype).at[mid].set(
        jnp.asarray(box, dtype).reshape(3)[mid])
    # shift only rows near the box along major AND inside along mid —
    # junk rows (extraction overfill, pads) must not resurface in-box.
    org = jnp.asarray(origin, dtype).reshape(3)
    bx = jnp.asarray(box, dtype).reshape(3)
    c = jnp.asarray(cutoff, dtype)

    def shiftable(rows):
        md = rows[:, mid]
        mj = rows[:, major]
        return (
            (md >= org[mid]) & (md < org[mid] + bx[mid])
            & (mj >= org[major] - 1.5 * c)
            & (mj <= org[major] + bx[major] + 1.5 * c)
        )

    ygl = jnp.where((idy == 0) & shiftable(ygl)[:, None], ygl - shift, ygl)
    ygr = jnp.where((idy == nd - 1) & shiftable(ygr)[:, None],
                    ygr + shift, ygr)
    return ygl, ygr, ok_l & ok_r


def _build_ext2_pbc(pos, origin, box, cutoff, HZ, HY, B, G, mid_bounds,
                    n_real, need_slot, minimage=False):
    """Periodic pencil preamble: static grid, wrap z/y halos, minor-axis
    ghost images, one re-sort. ``minimage=True`` folds the MINOR axis
    in-kernel instead (no ghost rows at all — the round-9 narrow-axis
    rule applied to the pencil's minor axis; requires <= 4 cells): the
    returned (mi_box, reach) feed the lag kernels' in-kernel fold and
    every key-window coverage check. Returns (ext_s, keys_s, o_s,
    slot_s, info, ok, n_loc, Hg, mi_box, reach)."""
    from .pbc import _mi_reach, _static_info
    from ..ops.pbc import pbc_extend

    n_loc = pos.shape[0]
    dt = pos.dtype
    nreal = _my_nreal(n_real)
    real = jnp.arange(n_loc) < nreal
    org = jnp.asarray(origin, dt).reshape(3)
    bx = jnp.asarray(box, dt).reshape(3)
    info = _static_info(org, bx, cutoff, dt)
    major, mid, minor = _pencil_axes(box, cutoff)
    mimask = np.zeros(3, bool)
    if minimage:
        b64 = np.asarray(box, np.float64).reshape(3)
        if int(np.ceil(b64[minor] / float(cutoff))) > 4:
            raise ValueError(
                "pencil minimage: the minor axis spans more than 4 "
                "cells — use ghost images (minimage=False)"
            )
        mimask[minor] = True

    # stable: the md path feeds a pre-sorted block (see `_build_ext2`)
    bins, pos_s = bin_and_sort(pos, cutoff, max_cells=1, info=info)
    H = min(HZ, n_loc)
    if jax.lax.axis_size(ZAX) == 2:
        # head and tail halos both come from the one other device; keep
        # the slices disjoint or shared rows double their 1/2 ownership
        H = min(H, n_loc // 2)

    gl, gr = _zhalo_pbc(pos_s, H, origin, box, major, nreal)
    Hg = gl.shape[0]
    ext1 = jnp.concatenate([gl, pos_s, gr], axis=0)
    o1 = jnp.concatenate([
        jnp.zeros((Hg,), dt), real.astype(dt), jnp.zeros((Hg,), dt),
    ])
    ygl, ygr, y_ok = _yhalo_pbc(ext1, origin, box, cutoff, HY, mid_bounds,
                                major, mid)
    pool = jnp.concatenate([ext1, ygl, ygr], axis=0)
    ny = ygl.shape[0] + ygr.shape[0]
    o_pool = jnp.concatenate([o1, jnp.zeros((ny,), dt)])

    if minimage:
        # minor axis folds in-kernel: NO ghost rows; the widened key
        # window (reach) flows to the kernels and every coverage check
        ext, o, okg = pool, o_pool, jnp.asarray(True)
        valid = None
        reach = _mi_reach(box, cutoff, mimask)
        mi_box = jnp.where(jnp.asarray(mimask), bx, jnp.zeros_like(bx))
    else:
        # minor-axis periodic images (incl. images of wrapped halo rows)
        axes = tuple(a == minor for a in range(3))
        ext, _, _w, valid, okg = pbc_extend(
            pool, org, bx, cutoff, B=B, G=G, wrap=False, axes=axes,
        )
        o = jnp.concatenate(
            [o_pool, jnp.zeros((ext.shape[0] - pool.shape[0],), dt)])
        reach, mi_box = None, None

    from ..core.geometry import SENTINEL_KEY

    keys2 = jax.vmap(info.flat_cell_index)(ext)
    if valid is not None:
        keys2 = jnp.where(valid, keys2, SENTINEL_KEY)
    ops = (keys2,) + tuple(ext[:, a] for a in range(3)) + (o,)
    if need_slot:
        ops = ops + (jnp.arange(ext.shape[0], dtype=jnp.int32),)
    out = jax.lax.sort(ops, num_keys=1, is_stable=False)
    keys_s = out[0]
    ext_s = jnp.stack(out[1:4], axis=-1)
    o_s = out[4]
    slot_s = out[5] if need_slot else None

    # coverage: interior z key windows + ring faces + y capacity +
    # y residency + extend flags
    z_ok = _zhalo_ok(bins.sorted_keys, info.strides, H, nreal, reach=reach)
    # ring faces: rows within cutoff of a major face must fit in the
    # edge devices' halo slices. Unlike the slab check, pads never eat
    # halo slots here — `_zhalo_pbc` slices the REAL tail (nreal - H),
    # so only the face populations themselves bound H.
    maj = pos_s[:, major]
    in_box_maj = maj < org[major] + bx[major]
    cnt_lo = jnp.sum(maj < org[major] + cutoff)
    cnt_hi = jnp.sum(
        (maj >= org[major] + bx[major] - cutoff) & in_box_maj)
    nd = jax.lax.axis_size(ZAX)
    idx = jax.lax.axis_index(ZAX)
    ring_ok = jnp.where(
        nd > 1,
        jnp.where(idx == 0, cnt_lo <= H, cnt_lo == 0)
        & jnp.where(idx == nd - 1, cnt_hi <= H, cnt_hi == 0),
        (cnt_lo <= H) & (cnt_hi <= H),
    )
    y = _ycell_pbc(pos_s, origin, box, cutoff, major, mid)
    idy = jax.lax.axis_index(YAX)
    inside = (y >= mid_bounds[idy]) & (y < mid_bounds[idy + 1])
    drift_ok = jnp.all(jnp.where(real, inside, True))
    ok = z_ok & y_ok & okg & ring_ok & drift_ok
    return ext_s, keys_s, o_s, slot_s, info, ok, n_loc, Hg, mi_box, reach


def sharded_pencil_pbc_lj_energy(
    mesh: Mesh,
    *,
    origin,
    box,
    cutoff: float,
    HZ: int,
    HY: int,
    B: int,
    G: int,
    M: int = 4096,
    L: int = 512,
    MAXJ: int = 8,
    use_tile: bool = False,
    term=lj_term,
    interpret: bool = False,
    minimage: bool = False,
):
    """Global LJ energy under orthorhombic PBC over the pencil mesh.

    efn(positions, mid_bounds, n_real) -> (energy, ok): positions in the
    `partition_by_pencil_pbc` layout. All three boundary mechanisms
    compose under the one ownership plane: z wraps the z ring, y wraps
    the y ring, the minor axis gets ghost images — or, with
    ``minimage=True``, folds in-kernel (no ghost rows; minor axis must
    span <= 4 cells; lag path only)."""
    if use_tile and minimage:
        raise ValueError("minimage folding is a lag-kernel feature; "
                         "use_tile=False")
    wterm = _weighted_term(term)

    def local(pos, mid_bounds, n_real):
        ext_s, keys_s, o_s, _, info, ok, _, _, mi_box, reach = \
            _build_ext2_pbc(
                pos, origin, box, cutoff, HZ, HY, B, G, mid_bounds,
                n_real, need_slot=False, minimage=minimage,
            )
        csq = jnp.asarray(cutoff, pos.dtype) ** 2
        if use_tile:
            from ..ops.tile_pairs import tile_pair_reduce

            e_loc, cap = tile_pair_reduce(
                ext_s, keys_s, info.strides, csq, sorted_payload=o_s,
                MAXJ=MAXJ, term=wterm, interpret=interpret,
            )
        else:
            from ..ops.pallas_pairs import lag_coverage_ok

            e_loc = pair_lag_reduce(
                ext_s, keys_s, info.strides, csq,
                sorted_payload=o_s[:, None], M=M, L=L, term=wterm,
                interpret=interpret, mi_box=mi_box, key_reach=reach,
            )
            cap = lag_coverage_ok(keys_s, info.strides, L, reach=reach)
        e = jax.lax.psum(jax.lax.psum(e_loc, ZAX), YAX)
        return e, _all_ok2(ok & cap)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P((ZAX, YAX), None), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def _pbc_md_step_local(pos, vel, mid_bounds, n_real, *, origin, box,
                       cutoff, HZ, HY, B, G, dt, M, L, interpret,
                       minimage=False):
    from ..ops.pbc import wrap_positions

    wterm = _weighted_term(lj_term)
    nreal = _my_nreal(n_real)
    real = jnp.arange(pos.shape[0]) < nreal
    from .pbc import _static_info

    info0 = _static_info(
        jnp.asarray(origin, pos.dtype), jnp.asarray(box, pos.dtype),
        cutoff, pos.dtype)
    bins, cols = bin_and_sort(
        jnp.concatenate([pos, vel], axis=1), cutoff, max_cells=1,
        info=info0,
    )
    dim = pos.shape[1]
    pos_s, vel_s = cols[:, :dim], cols[:, dim:]

    ext_s, keys_s, o_s, slot_s, info, ok, n_loc, Hg, mi_box, reach = \
        _build_ext2_pbc(
            pos_s, origin, box, cutoff, HZ, HY, B, G, mid_bounds, n_real,
            need_slot=True, minimage=minimage,
        )
    csq = jnp.asarray(cutoff, pos.dtype) ** 2
    f = pair_lag_forces(
        ext_s, keys_s, info.strides, csq, M=M, L=L,
        gfn=lj_force_factor, interpret=interpret,
        mi_box=mi_box, key_reach=reach,
    )
    from ..ops.pallas_pairs import lag_coverage_ok

    cap = lag_coverage_ok(keys_s, info.strides, L, reach=reach)
    e_loc = pair_lag_reduce(
        ext_s, keys_s, info.strides, csq, sorted_payload=o_s[:, None],
        M=M, L=L, term=wterm, interpret=interpret,
        mi_box=mi_box, key_reach=reach,
    )
    uops = (slot_s,) + tuple(f[:, a] for a in range(dim))
    uout = jax.lax.sort(uops, num_keys=1, is_stable=False)
    f_own = jnp.stack(uout[1:], axis=-1)[Hg : Hg + n_loc]

    vel_new = vel_s + dt * jnp.where(real[:, None], f_own, 0.0)
    stepped = pos_s + dt * vel_new
    pos_new = jnp.where(
        real[:, None],
        wrap_positions(
            stepped, jnp.asarray(origin, pos.dtype),
            jnp.asarray(box, pos.dtype)),
        pos_s,
    )
    e = jax.lax.psum(jax.lax.psum(e_loc, ZAX), YAX)
    return pos_new, vel_new, e, _all_ok2(ok & cap)


def sharded_pencil_pbc_md_step(
    mesh: Mesh,
    *,
    origin,
    box,
    cutoff: float,
    HZ: int,
    HY: int,
    B: int,
    G: int,
    dt: float = 1e-4,
    M: int = 4096,
    L: int = 512,
    interpret: bool = False,
    minimage: bool = False,
):
    """One periodic MD step over the pencil mesh (positions wrapped back
    into the box; pads never integrate). coverage_ok folds the
    y-residency check — wrap-induced y migration trips it and
    `repartition_pencil` (with `partition_by_pencil_pbc` numbering) is
    the recovery path. ``minimage=True`` folds the minor axis in-kernel
    (see `sharded_pencil_pbc_lj_energy`)."""

    def local(pos, vel, mid_bounds, n_real):
        return _pbc_md_step_local(
            pos, vel, mid_bounds, n_real, origin=origin, box=box,
            cutoff=cutoff, HZ=HZ, HY=HY, B=B, G=G, dt=dt, M=M, L=L,
            interpret=interpret, minimage=minimage,
        )

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P((ZAX, YAX), None), P((ZAX, YAX), None), P(), P()),
        out_specs=(P((ZAX, YAX), None), P((ZAX, YAX), None), P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


def sharded_pencil_pbc_md_run(
    mesh: Mesh,
    *,
    origin,
    box,
    cutoff: float,
    HZ: int,
    HY: int,
    B: int,
    G: int,
    steps: int,
    dt: float = 1e-4,
    M: int = 4096,
    L: int = 512,
    interpret: bool = False,
    minimage: bool = False,
):
    """Whole periodic pencil trajectory in one dispatch (scan of
    `sharded_pencil_pbc_md_step`'s body + a final energy)."""

    def local(pos, vel, mid_bounds, n_real):
        def body(carry, _):
            p, v, okacc = carry
            p2, v2, _e, ok = _pbc_md_step_local(
                p, v, mid_bounds, n_real, origin=origin, box=box,
                cutoff=cutoff, HZ=HZ, HY=HY, B=B, G=G, dt=dt, M=M, L=L,
                interpret=interpret, minimage=minimage,
            )
            return (p2, v2, okacc & ok), None

        (p, v, ok), _ = jax.lax.scan(
            body, (pos, vel, jnp.asarray(True)), None, length=steps
        )
        _, _, e, ok_e = _pbc_md_step_local(
            p, v, mid_bounds, n_real, origin=origin, box=box,
            cutoff=cutoff, HZ=HZ, HY=HY, B=B, G=G, dt=0.0, M=M, L=L,
            interpret=interpret, minimage=minimage,
        )
        return p, v, e, ok & ok_e

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P((ZAX, YAX), None), P((ZAX, YAX), None), P(), P()),
        out_specs=(P((ZAX, YAX), None), P((ZAX, YAX), None), P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)
