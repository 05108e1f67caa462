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


def partition_by_pencil(positions, cutoff, shape: tuple[int, int]):
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
    pts = np.asarray(positions)
    n, dim = pts.shape
    if dim != 3:
        raise ValueError("pencil decomposition is 3D-only (use slabs)")
    inf, sup, gshape, strides, perm = _host_order_info(pts, cutoff)
    major = int(perm[-1])
    mid = int(perm[-2])

    cell = np.floor((pts - inf) / cutoff).astype(np.int64)
    keys = (cell * strides).sum(1)
    order = np.argsort(keys, kind="stable")
    pts_s = pts[order]
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
    n_local = max(max(len(bk) for bk in blocks), 1)

    # key-safe pads: distinct empty cells beyond sup along the major
    # axis, globally unique so pads never coincide anywhere. Pads sort
    # LAST within each block; the device side must exchange the REAL
    # tail (n_real below), not the pad tail.
    out = np.empty((a * b * n_local, dim), pts.dtype)
    n_real = np.empty((a * b,), np.int32)
    pad_k = 2
    for d, bk in enumerate(blocks):
        out[d * n_local : d * n_local + len(bk)] = bk
        n_real[d] = len(bk)
        npad = n_local - len(bk)
        if npad:
            pad = np.tile(inf, (npad, 1)).astype(pts.dtype)
            pad[:, major] = sup[major] + 2.0 * cutoff * np.arange(
                pad_k, pad_k + npad
            )
            pad_k += npad
            out[d * n_local + len(bk) : (d + 1) * n_local] = pad
    return (out, n_local, jnp.asarray(mid_bounds, jnp.int32),
            jnp.asarray(n_real))


def _global_info2(local_pos, cutoff, real):
    """Global grid geometry over the REAL rows only: pads sit beyond
    sup along the major axis and must not inflate the box (their keys
    are computed off this grid and simply sort last)."""
    big = jnp.asarray(jnp.finfo(local_pos.dtype).max / 4, local_pos.dtype)
    lo = jnp.where(real[:, None], local_pos, big)
    hi = jnp.where(real[:, None], local_pos, -big)
    inf = jax.lax.pmin(jax.lax.pmin(jnp.min(lo, axis=0), ZAX), YAX)
    sup = jax.lax.pmax(jax.lax.pmax(jnp.max(hi, axis=0), ZAX), YAX)
    return GridInfo.create(Aabb(inf=inf, sup=sup), cutoff, auto_order=True)


def _axis_unit(strides, which: str):
    """One-hot (dim,) float selecting the major/mid-stride axis. Stride
    values are distinct (1, >=5, >=25...), so exact even when traced."""
    s = strides
    if which == "major":
        return (s == jnp.max(s)).astype(jnp.float32)
    top2 = jnp.sort(s)[-2]
    return (s == top2).astype(jnp.float32)


def _far_rows(info, cutoff, H, sign, dtype, salt):
    """(H, dim) key-safe far rows: stacked beyond the box along the major
    axis (sign=+1 above, -1 below), mutually >= 2*cutoff apart, `salt`
    offsets families so different call sites never coincide."""
    dimsz = info.strides.shape[0]
    c = jnp.asarray(cutoff, dtype)
    unit = _axis_unit(info.strides, "major").astype(dtype)
    inf = info.aabb.inf.astype(dtype)
    sup = info.aabb.sup.astype(dtype)
    r = jnp.arange(H, dtype=dtype) + jnp.asarray(salt, dtype)
    off_lo = -2.0 * c * (r + 2.0)
    off_hi = jnp.dot(sup - inf, unit) + 2.0 * c * (r + 2.0)
    base = jnp.broadcast_to(inf, (H, dimsz))
    off = off_hi if sign > 0 else off_lo
    return base + off[:, None] * unit[None, :]


def _zhalo(pos_s, H, info, cutoff, nreal):
    """Phase 1: exchange the REAL tail / head H rows along the z ring
    (pads sort last, so the raw tail would be pads); ring-wrap edges
    (slab 0's left, slab a-1's right) are replaced by far rows."""
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
    below = _far_rows(info, cutoff, H, -1, dtype, 0)
    above = _far_rows(info, cutoff, H, +1, dtype, 0)
    gl = jnp.where(idx == 0, below, gl)
    gr = jnp.where(idx == nd - 1, above, gr)
    return gl, gr


def _extract_ycolumn(ext, ycell, target_cell, HY, salt):
    """Compact the rows with y-cell == target_cell to the front by one
    stable class-key sort and return (rows (HY, dim), count, ok).

    Rows beyond the true count are arbitrary non-boundary rows — safe by
    distance at the receiver (>= one full cell away from its column) —
    but rows that are anybody's FAR pads are re-salted so two devices'
    junk can never coincide within a cutoff of each other."""
    cls = jnp.where(ycell == target_cell, 0, 1).astype(jnp.int32)
    iota = jnp.arange(ext.shape[0], dtype=jnp.int32)
    ops = (cls, iota) + tuple(ext[:, a] for a in range(ext.shape[1]))
    out = jax.lax.sort(ops, num_keys=2, is_stable=False)
    rows = jnp.stack(out[2:], axis=-1)[:HY]
    cnt = jnp.sum(cls == 0)
    return rows, cnt, cnt <= HY


def _yhalo(ext1, info, cutoff, HY, mid_bounds):
    """Phase 2: exchange boundary cell columns along the y ring.

    Returns (ygl, ygr, ok): rows from the left/right column neighbors
    (mesh-edge neighbors replaced by far rows)."""
    nd = jax.lax.axis_size(YAX)
    idy = jax.lax.axis_index(YAX)
    dtype = ext1.dtype
    if nd == 1 or HY == 0:
        z = jnp.zeros((0, ext1.shape[1]), dtype)
        return z, z, jnp.asarray(True)
    unit = _axis_unit(info.strides, "mid").astype(dtype)
    org = jnp.dot(info.aabb.inf.astype(dtype), unit)
    c = jnp.asarray(cutoff, dtype)
    y = jnp.floor((jnp.dot(ext1, unit) - org) / c).astype(jnp.int32)
    # junk rows (pads, wrap-substituted far rows) sit outside the box
    # along the MAJOR axis; they must not be classified as boundary rows
    # (a pad's mid coordinate is inf[mid] -> y == 0 == column 0's edge)
    mu = _axis_unit(info.strides, "major").astype(dtype)
    mj = jnp.dot(ext1, mu)
    inbox = (mj >= jnp.dot(info.aabb.inf.astype(dtype), mu)) & (
        mj <= jnp.dot(info.aabb.sup.astype(dtype), mu)
    )
    y = jnp.where(inbox, y, jnp.int32(-9))
    y_lo = mid_bounds[idy]
    y_hi = mid_bounds[idy + 1] - 1

    send_l, cnt_l, ok_l = _extract_ycolumn(ext1, y, y_lo, HY, 1)
    send_r, cnt_r, ok_r = _extract_ycolumn(ext1, y, y_hi, HY, 2)

    fwd = [(i, (i + 1) % nd) for i in range(nd)]
    bwd = [(i, (i - 1) % nd) for i in range(nd)]
    ygl = jax.lax.ppermute(send_r, YAX, fwd)   # left neighbor's top column
    ygr = jax.lax.ppermute(send_l, YAX, bwd)   # right neighbor's bottom
    far_l = _far_rows(info, cutoff, HY, -1, dtype, 3 + 2 * HY)
    far_r = _far_rows(info, cutoff, HY, +1, dtype, 3 + 2 * HY)
    ygl = jnp.where(idy == 0, far_l, ygl)
    ygr = jnp.where(idy == nd - 1, far_r, ygr)
    return ygl, ygr, ok_l & ok_r


def _zhalo_ok(sorted_keys, strides, H, nreal):
    """z-window coverage, both sides (the 0.5-ownership rule needs every
    owned row's full neighborhood locally) — `halo_coverage_ok` adapted
    to per-block pads: only the REAL rows (pads sort last) count, and
    the neighbor extremes are the real extremes."""
    nd = jax.lax.axis_size(ZAX)
    if nd == 1:
        return jnp.asarray(True)
    idx = jax.lax.axis_index(ZAX)
    w = key_window(strides).astype(sorted_keys.dtype)
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


def _all_ok2(flag):
    f = jax.lax.pmin(flag.astype(jnp.int32), ZAX)
    return jax.lax.pmin(f, YAX) > 0


def _my_nreal(n_real):
    nb = jax.lax.axis_size(YAX)
    flat = jax.lax.axis_index(ZAX) * nb + jax.lax.axis_index(YAX)
    return n_real[flat]


def _build_ext2(pos, cutoff, HZ, HY, mid_bounds, n_real, need_slot):
    """Shared pencil preamble: local sort, two-phase halos, one re-sort
    of the extended block. Returns (ext2 sorted (nx, dim), keys, o2
    ownership plane, slot (or None), info, flags, n_loc, H)."""
    n_loc = pos.shape[0]
    nreal = _my_nreal(n_real)
    real = jnp.arange(n_loc) < nreal
    info = _global_info2(pos, cutoff, real)
    bins, pos_s = bin_and_sort(pos, cutoff, max_cells=1, info=info)
    dtype = pos_s.dtype
    H = min(HZ, n_loc)

    gl, gr = _zhalo(pos_s, H, info, cutoff, nreal)
    ext1 = jnp.concatenate([gl, pos_s, gr], axis=0)
    # ownership: my REAL rows own their pairs; pads (far rows, no pairs)
    # may carry either value — keep them owned=0 for hygiene
    o1 = jnp.concatenate([
        jnp.zeros((H,), dtype), real.astype(dtype),
        jnp.zeros((H,), dtype),
    ])
    ygl, ygr, y_ok = _yhalo(ext1, info, cutoff, HY, mid_bounds)
    ext2 = jnp.concatenate([ext1, ygl, ygr], axis=0)
    ny = ygl.shape[0] + ygr.shape[0]
    o2 = jnp.concatenate([o1, jnp.zeros((ny,), dtype)])

    keys2 = jax.vmap(info.flat_cell_index)(ext2)
    ops = (keys2,) + tuple(ext2[:, a] for a in range(ext2.shape[1])) + (o2,)
    if need_slot:
        ops = ops + (jnp.arange(ext2.shape[0], dtype=jnp.int32),)
    out = jax.lax.sort(ops, num_keys=1, is_stable=False)
    keys_s = out[0]
    dim = ext2.shape[1]
    ext_s = jnp.stack(out[1 : 1 + dim], axis=-1)
    o_s = out[1 + dim]
    slot_s = out[2 + dim] if need_slot else None

    z_ok = _zhalo_ok(bins.sorted_keys, info.strides, H, nreal)
    return ext_s, keys_s, o_s, slot_s, info, z_ok & y_ok, n_loc, H


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
    interpret: bool = False,
):
    """Jitted global pair energy over pencil-sharded positions.

    efn(positions, mid_bounds, n_real) -> (energy, coverage_ok):
    positions is the `partition_by_pencil` layout sharded
    P((ZAX, YAX), None); mid_bounds and n_real replicated. Every pair is counted exactly once globally
    by the 0.5*(o_i+o_j) ownership plane (see module docstring).
    """

    wterm = _weighted_term(term)

    def local(pos, mid_bounds, n_real):
        ext_s, keys_s, o_s, _, info, ok, n_loc, H = _build_ext2(
            pos, cutoff, HZ, HY, mid_bounds, n_real, need_slot=False
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


def _weighted_term(term):
    def wterm(dsq, oi, oj):
        # select, not multiply: ghost-ghost far rows can coincide
        # (dsq == 0, term == inf) and 0 * inf would poison the sum
        w = 0.5 * (oi + oj)
        return jnp.where(w > 0, w * term(jnp.where(w > 0, dsq, 1.0)),
                         jnp.zeros_like(dsq))

    return wterm


def sharded_pencil_md_step(
    mesh: Mesh,
    *,
    cutoff: float,
    HZ: int,
    HY: int,
    dt: float = 1e-4,
    M: int = 4096,
    L: int = 512,
    interpret: bool = False,
):
    """Jitted MD step over the pencil mesh.

    step(positions, velocities, mid_bounds, n_real) -> (positions,
    velocities, energy, coverage_ok); state arrays keep the `partition_by_pencil`
    layout (each device's block re-sorted by key each step). Forces are
    full-stencil i-side sums over the extended sorted block — exact for
    owned rows whenever coverage_ok — then un-sorted back to block
    order by a second multi-operand sort (never a gather).
    """
    wterm = _weighted_term(lj_term)

    def local(pos, vel, mid_bounds, n_real):
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

        ext_s, keys_s, o_s, slot_s, info, ok, n_loc, H = _build_ext2(
            pos_s, cutoff, HZ, HY, mid_bounds, n_real, need_slot=True
        )
        csq = jnp.asarray(cutoff, pos.dtype) ** 2
        f = pair_lag_forces(
            ext_s, keys_s, info.strides, csq, M=M, L=L,
            gfn=lj_force_factor, interpret=interpret,
        )
        from ..ops.pallas_pairs import lag_coverage_ok

        cap = lag_coverage_ok(keys_s, info.strides, L)
        e_loc = pair_lag_reduce(
            ext_s, keys_s, info.strides, csq, sorted_payload=o_s[:, None],
            M=M, L=L, term=wterm, interpret=interpret,
        )
        # un-sort forces to pre-sort (concat) order, slice the owned rows
        uops = (slot_s,) + tuple(f[:, a] for a in range(dim))
        uout = jax.lax.sort(uops, num_keys=1, is_stable=False)
        f_own = jnp.stack(uout[1:], axis=-1)[H : H + n_loc]

        vel_new = vel_s + dt * f_own
        pos_new = pos_s + dt * vel_new
        e = jax.lax.psum(jax.lax.psum(e_loc, ZAX), YAX)
        return pos_new, vel_new, e, _all_ok2(ok & cap)

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P((ZAX, YAX), None), P((ZAX, YAX), None), P(), P()),
        out_specs=(P((ZAX, YAX), None), P((ZAX, YAX), None), P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)
