"""Multi-chip spatial domain decomposition with halo exchange over ICI.

The reference's only parallelism is shared-memory rayon over cells
(zelll `src/cellgrid.rs:447-451`); its roadmap hints at merging grids
(README.md:148-152). The TPU-native scale-out is classic MD spatial domain
decomposition mapped onto a 1D device mesh:

* Space is sliced into slabs along the sort-major axis; each device
  owns one contiguous block of the globally key-sorted particle array, so
  slab partitioning IS block partitioning of the sorted order. Keys are
  auto-ordered (`GridInfo.create(auto_order=True)`: the largest box
  extent gets the largest stride), so the sort-major axis is the LONGEST
  box axis — slabs cut perpendicular to it, minimizing boundary area and
  halo size for any box orientation.
* The grid geometry is global: the AABB is reduced with `lax.pmin/pmax`
  over ICI so every device bins into the same key space.
* Halo exchange: each device sends the head/tail H particles of its sorted
  block to its neighbors with `lax.ppermute` (pure ICI neighbor traffic —
  the analogue of MD halo exchange). Ghosts concatenate cleanly: left
  ghosts have smaller keys than all owned keys, right ghosts larger, so
  the combined array is still sorted.
* Forces: computed over [left ghosts | own | right ghosts]; only the owned
  rows are kept, so each device gets exact forces for its particles.
* Energy: per-particle half-energies summed over owned rows, `psum`'d —
  every pair counted exactly once globally regardless of which devices see
  it.

Ring wraparound ghosts (device 0 <-> device D-1) are spatially distant and
get filtered by the cutoff; they cost bandwidth, not correctness.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.binning import bin_and_sort, compute_keys
from ..core.geometry import Aabb, GridInfo, key_window
from ..core.grid import build
from ..core.pairs import pair_energy_per_particle, pair_forces
from ..ops.lj import lj, lj_force_factor
from ..ops.pallas_pairs import (
    lj_term,
    pair_lag_forces,
    pair_lag_reduce,
)

__all__ = [
    "make_mesh",
    "partition_by_slab",
    "sharded_md_step",
    "sharded_lj_energy",
    "sharded_stress",
    "make_sharded_potential",
    "repartition",
    "repartition_exchange",
    "halo_coverage_ok",
]

AXIS = "z"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(devs[:n], axis_names=(AXIS,))


def partition_by_slab(positions, cutoff, n_devices: int):
    """Host-side global partition: sort particles by cell key and split the
    sorted order into equal blocks (= spatial slabs of the sort-major —
    largest-extent — axis). Returns (positions_sorted, n_local) with n
    padded to a multiple of the device count using far-away spread
    coordinates. Key order mirrors the device-side
    `GridInfo.create(auto_order=True)` binning exactly (stable argsort of
    the cell counts), so the slab invariant holds on-device.
    """
    import numpy as np

    pts = np.asarray(positions)
    n = pts.shape[0]
    n_local = -(-n // n_devices)
    n_pad = n_local * n_devices - n

    inf = pts.min(axis=0)
    sup = pts.max(axis=0)
    # auto-ordered padded-stride keys, same math as
    # GridInfo.create(auto_order=True) (host mirror)
    shape = np.floor((sup - inf) / cutoff).astype(np.int64) + 1
    perm = np.argsort(shape, kind="stable")
    padded = shape[perm] + 4
    s = np.concatenate([[1], np.cumprod(padded[:-1])])
    strides = np.empty_like(s)
    strides[perm] = s
    major = int(perm[-1])  # the largest extent carries the largest stride
    keys = (np.floor((pts - inf) / cutoff).astype(np.int64) * strides).sum(1)
    order = np.argsort(keys, kind="stable")
    out = pts[order]
    if n_pad:
        # key-safe padding: just beyond sup along the sort-major axis,
        # one empty cell apart, so pads sort last, land in distinct cells,
        # and stay > cutoff from everything — including each other.
        # (Coordinates ~1e12 would overflow the f32 flat-key conversion.)
        pad = np.tile(inf, (n_pad, 1)).astype(pts.dtype)
        pad[:, major] = sup[major] + 2.0 * cutoff * np.arange(2, n_pad + 2)
        out = np.vstack([out, pad])
    return out, n_local


def _global_grid_info(local_pos, cutoff):
    """Grid geometry from the global AABB (pmin/pmax over the mesh).

    Auto-ordered strides (largest extent -> largest stride) to match
    `partition_by_slab`'s host keys; both sides MUST agree or the slab
    invariant (ascending keys across device blocks) breaks.
    """
    inf = jax.lax.pmin(jnp.min(local_pos, axis=0), AXIS)
    sup = jax.lax.pmax(jnp.max(local_pos, axis=0), AXIS)
    return GridInfo.create(Aabb(inf=inf, sup=sup), cutoff, auto_order=True)


def _halo_exchange(arr, H: int):
    """Send tail H rows right, head H rows left around the ring.

    A single-device mesh needs no halo at all: the ghosts are empty
    (H must then be 0 — `_h_eff` enforces it). Far-away dummy coordinates
    are NOT used here: coordinates ~1e12 overflow the f32 -> int32 flat-key
    conversion into garbage cells that trip the capacity coverage flags.
    """
    nd = jax.lax.axis_size(AXIS)
    idx = jax.lax.axis_index(AXIS)
    if nd == 1:
        z = jnp.zeros((0, arr.shape[1]), arr.dtype)
        return z, z, idx, nd
    fwd = [(i, (i + 1) % nd) for i in range(nd)]
    bwd = [(i, (i - 1) % nd) for i in range(nd)]
    from_left = jax.lax.ppermute(arr[-H:], AXIS, fwd)
    from_right = jax.lax.ppermute(arr[:H], AXIS, bwd)
    return from_left, from_right, idx, nd


def _h_eff(H: int, n_loc: int) -> int:
    """Effective halo: 0 on a single-device mesh (no exchange), otherwise
    clamped to the local block (ghosts are head/tail slices of a
    neighbor's block, so the halo can never exceed the block itself;
    slicing with a larger H would silently clamp the ghosts while
    ownership offsets kept using H)."""
    if jax.lax.axis_size(AXIS) == 1:
        return 0
    return min(H, n_loc)


def halo_coverage_ok(sorted_keys_loc, strides, H_eff, *, both_sides=True,
                     reach=None):
    """Per-device halo capacity check — the slab-boundary analogue of
    `lag_coverage_ok` (one shifted key compare per direction).

    ``reach``: per-axis cell-distance multipliers for the widened
    minimum-image key window (see `geometry.key_window`) — min-imaged
    minor axes widen the window every coverage check must honor.

    A device's ghosts are the tail/head H_eff rows of its neighbors'
    key-sorted blocks. Every particle a neighbor could pair with must lie
    inside those rows, or boundary pairs are silently dropped:

    * needed-by-right = my rows with key >= right_min - W (a suffix of my
      ascending keys): count <= H_eff, and < n_local unless I am device 0
      (a fully-needed block means the window may reach past me to a
      device whose particles are never exchanged).
    * needed-by-left (mirrored) — only checked when ``both_sides`` (force
      paths need both halos; the Pallas energy path consumes left ghosts
      only, as pairs are owned by their larger-slot endpoint).

    Ring-wraparound edges (device 0 <-> D-1) are spatially distant by the
    slab invariant and excluded. Returns this device's flag; reduce with
    `lax.pmin`-style all-reduce for the global verdict.
    """
    nd = jax.lax.axis_size(AXIS)
    if nd == 1:
        return jnp.asarray(True)
    idx = jax.lax.axis_index(AXIS)
    w = key_window(strides, reach).astype(sorted_keys_loc.dtype)
    n_loc = sorted_keys_loc.shape[0]
    fwd = [(i, (i + 1) % nd) for i in range(nd)]
    bwd = [(i, (i - 1) % nd) for i in range(nd)]
    right_min = jax.lax.ppermute(sorted_keys_loc[0], AXIS, bwd)
    needed_r = jnp.sum(sorted_keys_loc >= right_min - w)
    ok_r = (needed_r <= H_eff) & ((needed_r < n_loc) | (idx == 0))
    ok = jnp.where(idx < nd - 1, ok_r, True)
    if both_sides:
        left_max = jax.lax.ppermute(sorted_keys_loc[-1], AXIS, fwd)
        needed_l = jnp.sum(sorted_keys_loc <= left_max + w)
        ok_l = (needed_l <= H_eff) & ((needed_l < n_loc) | (idx == nd - 1))
        ok = ok & jnp.where(idx > 0, ok_l, True)
    return ok


def _all_ok(flag):
    """All-reduce a per-device bool over the mesh axis."""
    return jax.lax.pmin(flag.astype(jnp.int32), AXIS) > 0


def _lag_ok_ext(keys_ext, strides, L, H_eff, n_loc):
    """`lag_coverage_ok` over the halo-extended block [gl | own | gr?].

    Ring-wraparound ghosts (device 0's left ghosts, device D-1's right
    ghosts) are spatially distant rows whose keys break the ascending-key
    proxy without ever forming real pairs (the cutoff filters them), so
    comparisons touching them are excluded.
    """
    nd = jax.lax.axis_size(AXIS)
    idx = jax.lax.axis_index(AXIS)
    ntot = keys_ext.shape[0]
    if ntot <= L:
        return jnp.asarray(True)
    w = key_window(strides)
    diff_ok = keys_ext[L:] - keys_ext[:-L] > w
    i = jnp.arange(L, ntot)
    genuine = ((idx > 0) | (i - L >= H_eff)) & (
        (idx < nd - 1) | (i < H_eff + n_loc)
    )
    return jnp.all(diff_ok | ~genuine)


def _wrap_safe_ghosts(gl, gr, info, cutoff, H_eff):
    """Replace ring-wraparound ghosts with key-safe out-of-box rows.

    Device 0's left ghosts come from device D-1 (and D-1's right ghosts
    from device 0): spatially distant rows whose keys break the
    ascending-key precondition of the tile kernel's searchsorted window
    bounds (`segments.chunk_bounds`). The lag kernel tolerates them (its
    key-difference filter excludes them); the tile kernel must not see
    them. Substitute rows stacked below the box along the sort-major axis
    (left) / above it (right), ascending in slot, mutually >= 2*cutoff
    apart and >= 4*cutoff from the box — so keys stay ascending and no
    pair within the cutoff can involve them. The major axis is picked by
    a one-hot over the (auto-ordered, hence data-dependent) strides —
    stride values are always distinct (1, >=5, >=25), so the one-hot is
    exact. Non-major coordinates sit at inf, whose key contribution is 0;
    a row m major-cells below inf keys at -m*S_major < every real key,
    and one above shape-1 keys above max real key (non-major real
    contributions sum to < S_major by the positional-system bound).
    """
    nd = jax.lax.axis_size(AXIS)
    idx = jax.lax.axis_index(AXIS)
    if nd == 1 or gl.shape[0] == 0:
        return gl, gr
    dt = gl.dtype
    c = jnp.asarray(cutoff, dt)
    r = jnp.arange(H_eff, dtype=dt)
    inf, sup = info.aabb.inf.astype(dt), info.aabb.sup.astype(dt)
    unit = (info.strides == jnp.max(info.strides)).astype(dt)  # (dim,)
    off_lo = -2.0 * c * (jnp.asarray(H_eff, dt) - r + 1.0)
    off_hi = jnp.dot(sup - inf, unit) + 2.0 * c * (r + 2.0)
    base = jnp.broadcast_to(inf, gl.shape)
    below = base + off_lo[:, None] * unit[None, :]
    above = base + off_hi[:, None] * unit[None, :]
    gl = jnp.where(idx == 0, below, gl)
    gr = jnp.where(idx == nd - 1, above, gr)
    return gl, gr


def _tile_energy_ext(gl, pos_s, info, csq, H_eff, MAXJ, interpret,
                     term=lj_term):
    """Owned-pair energy over [left ghosts | own] via the tile kernel
    (larger-slot ownership through min_islot)."""
    from ..ops.tile_pairs import tile_pair_reduce

    ext = jnp.concatenate([gl, pos_s], axis=0)
    keys_ext = compute_keys(ext, info)
    return tile_pair_reduce(
        ext, keys_ext, info.strides, csq, MAXJ=MAXJ, interpret=interpret,
        min_islot=H_eff, term=term,
    )


def sharded_md_step(
    mesh: Mesh,
    *,
    cutoff: float,
    H: int,
    K: int = 32,
    dt: float = 1e-4,
    chunk: int = 64,
    use_pallas: bool = False,
    use_tile: bool = False,
    MAXJ: int = 8,
    M: int = 4096,
    L: int = 256,
    interpret: bool = False,
):
    """Build a jitted velocity-Verlet-style MD step over the mesh.

    step(positions, velocities) -> (positions, velocities, energy,
    coverage_ok) where positions/velocities are (n, 3) sharded along axis 0
    ('z' slabs of the globally sorted order). H = halo capacity (particles
    per boundary).

    ``coverage_ok`` is the global AND of every static-capacity check —
    halo capacity H (`halo_coverage_ok`), the lag bound L (Pallas) or cell
    bucket capacity K (XLA). False means density growth outgrew a static
    parameter and pairs may be missing: the host must re-jit one capacity
    class up, never trust the step's outputs (the coverage-flag invariant;
    the single-device md_step returns the same kind of flag).

    ``use_pallas=True`` runs the fused lag kernels per shard (the TPU
    production path); the default XLA path works everywhere and is the
    parity reference. Energy uses the distributed ownership rule: each
    pair counted by the device owning its larger-slot endpoint
    (min_islot = H_eff over [left ghosts | owned]).
    """

    def local_step(pos, vel):
        H_eff = _h_eff(H, pos.shape[0])
        info = _global_grid_info(pos, cutoff)
        # keep the owned block sorted by key (cheap local sort; the global
        # order across devices is maintained by slab partitioning)
        bins, pos_s = bin_and_sort(pos, cutoff, max_cells=1, info=info)
        vel_s = vel[bins.perm]

        gl, gr, idx, nd = _halo_exchange(pos_s, H_eff)
        ext = jnp.concatenate([gl, pos_s, gr], axis=0)
        n_loc = pos_s.shape[0]
        csq = jnp.asarray(cutoff, pos.dtype) ** 2
        halo_ok = halo_coverage_ok(
            bins.sorted_keys, info.strides, H_eff, both_sides=True
        )

        if use_tile:
            from ..ops.tile_pairs import tile_pair_forces

            gl_s, gr_s = _wrap_safe_ghosts(gl, gr, info, cutoff, H_eff)
            ext_t = jnp.concatenate([gl_s, pos_s, gr_s], axis=0)
            keys_ext = compute_keys(ext_t, info)
            f, cap_ok_t = tile_pair_forces(
                ext_t, keys_ext, info.strides, csq, MAXJ=MAXJ,
                gfn=lj_force_factor, interpret=interpret,
            )
            f_own = f[H_eff : H_eff + n_loc]
            e_loc, cap_ok_e = _tile_energy_ext(
                gl_s, pos_s, info, csq, H_eff, MAXJ, interpret
            )
            energy = jax.lax.psum(e_loc, AXIS)
            coverage_ok = _all_ok(halo_ok & cap_ok_t & cap_ok_e)
            vel_new = vel_s + dt * f_own
            pos_new = pos_s + dt * vel_new
            return pos_new, vel_new, energy, coverage_ok
        if use_pallas:
            keys_ext = compute_keys(ext, info)
            f = pair_lag_forces(
                ext, keys_ext, info.strides, csq,
                M=M, L=L, gfn=lj_force_factor, interpret=interpret,
            )
            f_own = f[H_eff : H_eff + n_loc]
            keys_e = keys_ext[: H_eff + n_loc]
            e_loc = pair_lag_reduce(
                ext[: H_eff + n_loc], keys_e, info.strides, csq,
                M=M, L=L, term=lj_term, interpret=interpret,
                min_islot=H_eff,
            )
            energy = jax.lax.psum(e_loc, AXIS)
            cap_ok = _lag_ok_ext(keys_ext, info.strides, L, H_eff, n_loc)
        else:
            grid = build(ext, cutoff, info=info)
            forces = pair_forces(
                grid, lj_force_factor, K=K, chunk=chunk, cutoff_sq=csq
            )
            e_pp = pair_energy_per_particle(
                grid, lj, K=K, chunk=chunk, cutoff_sq=csq
            )
            f_own = forces[H_eff : H_eff + n_loc]
            energy = jax.lax.psum(jnp.sum(e_pp[H_eff : H_eff + n_loc]), AXIS)
            cap_ok = grid.bins.max_cell_count() <= K

        coverage_ok = _all_ok(halo_ok & cap_ok)
        vel_new = vel_s + dt * f_own
        pos_new = pos_s + dt * vel_new
        return pos_new, vel_new, energy, coverage_ok

    step = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(AXIS, None), P(AXIS, None)),
        out_specs=(P(AXIS, None), P(AXIS, None), P(), P()),
        check_vma=False,
    )
    return jax.jit(step)


def repartition(mesh: Mesh, *, cutoff: float):
    """Jitted global repartition: restore the slab invariant (globally
    key-sorted order, equal blocks per device) after particles drift.

    Uses all_gather + a global sort + local slice — O(n) replicated
    memory, fine up to ~1e7 per pod; a distributed sample-sort replaces
    this at larger scale. Returns a function (positions, velocities) ->
    (positions, velocities) with the same shardings.
    """

    def local(pos, vel):
        info = _global_grid_info(pos, cutoff)
        allp = jax.lax.all_gather(pos, AXIS, tiled=True)
        allv = jax.lax.all_gather(vel, AXIS, tiled=True)
        keys = compute_keys(allp, info)
        n = allp.shape[0]
        cols = tuple(allp[:, a] for a in range(3)) + tuple(
            allv[:, a] for a in range(3)
        )
        out = jax.lax.sort((keys, *cols), num_keys=1, is_stable=True)
        sp = jnp.stack(out[1:4], axis=-1)
        sv = jnp.stack(out[4:7], axis=-1)
        idx = jax.lax.axis_index(AXIS)
        n_loc = pos.shape[0]
        start = (idx * n_loc).astype(jnp.int32)
        zero = jnp.zeros((), jnp.int32)
        return (
            jax.lax.dynamic_slice(sp, (start, zero), (n_loc, 3)),
            jax.lax.dynamic_slice(sv, (start, zero), (n_loc, 3)),
        )

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P(AXIS, None), P(AXIS, None)),
            out_specs=(P(AXIS, None), P(AXIS, None)),
            check_vma=False,
        )
    )


def repartition_exchange(mesh: Mesh, *, cutoff: float, A: int | None = None):
    """Distributed repartition: restore the slab invariant (globally
    key-sorted order, exactly n_local per device) WITHOUT replicating the
    particle array — the sample-sort-class replacement for `repartition`
    promised in round 1.

    Algorithm (all static shapes, ICI-neighbor traffic only):

    1. Local sort by cell key (velocities ride as sort payload).
    2. Exact splitter selection: the global order statistic at every rank
       d*n_local is found by a ~31-step distributed binary search over the
       augmented key ``k2 = key*nd + device`` (each step: one local
       searchsorted + one psum). Ties of k2 are same-key same-device, so
       the residual tie split ``t_d`` is resolved by local position —
       the resulting global order is exactly `repartition`'s
       (key, device, local slot) order.
    3. Each particle's destination slab follows from the splitters;
       destinations are monotone in sorted order, so the outgoing
       particles form a head run (to the left neighbor) and a tail run
       (to the right neighbor), exchanged as fixed-capacity (A, 7)
       buffers via two `ppermute`s (7th column = validity).
    4. [received-left | kept | received-right] is locally re-sorted
       (invalid rows get sentinel keys and sort last); the first n_local
       rows are the new owned block.

    Static-capacity contract (the coverage-flag invariant): the returned
    ``ok`` is False iff a particle drifted beyond an adjacent slab, a run
    exceeded A, or keys overflow the k2 encoding — fall back to the exact
    all_gather `repartition` for that event; never trust outputs with a
    False flag. Returns step(positions, velocities) ->
    (positions, velocities, ok) with slab shardings.
    """

    def local(pos, vel):
        n_loc = pos.shape[0]
        cap = A if A is not None else max(n_loc // 4, 1)
        cap = min(cap, n_loc)
        info = _global_grid_info(pos, cutoff)
        return _repartition_exchange_local(pos, vel, info, cutoff, cap)

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P(AXIS, None), P(AXIS, None)),
            out_specs=(P(AXIS, None), P(AXIS, None), P()),
            check_vma=False,
        )
    )


def _repartition_exchange_local(pos, vel, info, cutoff, cap, ring=False):
    """Per-device body of the distributed repartition (inside shard_map):
    splitter selection by distributed binary search + fixed-capacity
    adjacent ppermute exchange. ``info`` fixes the key grid (data-AABB
    for open boundaries, the static extended grid under PBC).

    ``ring=True`` (PBC) treats the slab topology as a ring: a particle
    crossing a periodic face wraps to the opposite end of the key range,
    so its destination is linearly distant (|dest - idx| = nd - 1) but
    ring-adjacent. Destination classes are contiguous runs in the local
    sorted order (dest is monotone in key), so the outgoing buffers are
    fixed-capacity dynamic slices at searchsorted offsets — never a
    gather — and the two ppermutes use full ring permutations. With
    nd <= 2 the linear transport already covers the ring (each device
    has at most one distinct neighbor)."""
    nd = jax.lax.axis_size(AXIS)
    idx = jax.lax.axis_index(AXIS)
    n_loc = pos.shape[0]
    stacked = jnp.concatenate([pos, vel], axis=1)
    # STABLE: the documented contract is bit-identity with the
    # all_gather `repartition`, whose stable global sort keeps equal-key
    # rows in (device, input-slot) order — the source-device tie column
    # restores device order but only a stable local sort preserves the
    # intra-device input order (round-4 unstable default exempted here)
    bins, cols = bin_and_sort(
        stacked, cutoff, max_cells=1, info=info, need_perm=False,
        stable=True,
    )
    keys = bins.sorted_keys  # (n_loc,) ascending
    k2 = keys * nd + idx
    ok_enc = jnp.max(keys) <= (jnp.iinfo(jnp.int32).max - nd) // nd

    # --- exact splitter order statistics (distributed binary search)
    r = jnp.arange(1, nd, dtype=jnp.int32) * jnp.int32(n_loc)

    def bs_body(_, carry):
        lo, hi = carry
        mid = lo + (hi - lo) // 2
        c_le = jax.lax.psum(
            jnp.searchsorted(k2, mid, side="right").astype(jnp.int32),
            AXIS,
        )
        found = c_le >= r + 1
        return jnp.where(found, lo, mid + 1), jnp.where(found, mid, hi)

    lo0 = jnp.zeros((nd - 1,), jnp.int32)
    hi0 = jnp.full((nd - 1,), jnp.iinfo(jnp.int32).max, jnp.int32)
    v, _ = jax.lax.fori_loop(0, 32, bs_body, (lo0, hi0))
    cnt_lt = jax.lax.psum(
        jnp.searchsorted(k2, v, side="left").astype(jnp.int32), AXIS
    )
    t = r - cnt_lt  # tie-run elements going to the left side

    # --- destination slab per particle (monotone in sorted order)
    iota = jnp.arange(n_loc, dtype=jnp.int32)
    tie_pos = iota - jnp.searchsorted(k2, k2, side="left").astype(
        jnp.int32
    )
    past_cut = (k2[:, None] > v[None, :]) | (
        (k2[:, None] == v[None, :]) & (tie_pos[:, None] >= t[None, :])
    )
    dest = jnp.sum(past_cut.astype(jnp.int32), axis=1)
    # columns 0:6 payload, 6 source device (tie key: ring traffic arrives
    # out of device order, but the global tie order is (key, device,
    # slot) — the all_gather repartition's gathered order), 7 validity
    data7 = jnp.concatenate(
        [
            cols,
            jnp.full((n_loc, 1), idx, cols.dtype),
            jnp.ones((n_loc, 1), cols.dtype),
        ],
        axis=1,
    )
    ia = jnp.arange(cap, dtype=jnp.int32)
    if ring and nd > 2:
        # ring transport: destination classes (contiguous runs in the
        # monotone dest vector) extracted by padded dynamic slices
        tl = (idx - 1) % nd
        tr = (idx + 1) % nd
        ok_jump = jnp.all(
            (dest == idx) | (dest == tl) | (dest == tr)
        )
        sl = jnp.searchsorted(dest, tl, side="left").astype(jnp.int32)
        cl = jnp.searchsorted(dest, tl, side="right").astype(jnp.int32) - sl
        sr = jnp.searchsorted(dest, tr, side="left").astype(jnp.int32)
        cr = jnp.searchsorted(dest, tr, side="right").astype(jnp.int32) - sr
        ok_cap = (cl <= cap) & (cr <= cap)
        dpad = jnp.concatenate(
            [data7, jnp.zeros((cap, 8), data7.dtype)], axis=0
        )
        zero = jnp.zeros((), jnp.int32)
        lbuf = jnp.where(
            (ia < cl)[:, None],
            jax.lax.dynamic_slice(dpad, (sl, zero), (cap, 8)), 0.0,
        )
        rbuf = jnp.where(
            (ia < cr)[:, None],
            jax.lax.dynamic_slice(dpad, (sr, zero), (cap, 8)), 0.0,
        )
        recv_r = jax.lax.ppermute(
            lbuf, AXIS, [(d, (d - 1) % nd) for d in range(nd)]
        )
        recv_l = jax.lax.ppermute(
            rbuf, AXIS, [(d, (d + 1) % nd) for d in range(nd)]
        )
        vkeep = dest == idx
    else:
        # --- fixed-capacity adjacent exchange
        jump = dest - idx
        ok_jump = jnp.all((jump >= -1) & (jump <= 1))
        cl = jnp.sum((dest < idx).astype(jnp.int32))
        cr = jnp.sum((dest > idx).astype(jnp.int32))
        ok_cap = (cl <= cap) & (cr <= cap)
        lbuf = jnp.where((ia < cl)[:, None], data7[:cap], 0.0)
        rbuf = jnp.where((ia >= cap - cr)[:, None], data7[-cap:], 0.0)
        recv_r = jax.lax.ppermute(
            lbuf, AXIS, [(d, d - 1) for d in range(1, nd)]
        )
        recv_l = jax.lax.ppermute(
            rbuf, AXIS, [(d, d + 1) for d in range(nd - 1)]
        )
        vkeep = (iota >= cl) & (iota < n_loc - cr)
    kept = jnp.where(vkeep[:, None], data7, 0.0)

    ext = jnp.concatenate([recv_l, kept, recv_r], axis=0)
    valid_ext = ext[:, 7] > 0.5
    keys_ext = compute_keys(ext[:, :3], info, valid_ext)
    out = jax.lax.sort(
        (keys_ext, ext[:, 6], *(ext[:, a] for a in range(6))),
        num_keys=2,
        is_stable=True,
    )
    new_pos = jnp.stack(out[2:5], axis=-1)[:n_loc]
    new_vel = jnp.stack(out[5:8], axis=-1)[:n_loc]
    ok = jax.lax.pmin(
        (ok_enc & ok_jump & ok_cap).astype(jnp.int32), AXIS
    )
    return new_pos, new_vel, ok > 0


def sharded_lj_energy(
    mesh: Mesh,
    *,
    cutoff: float,
    H: int,
    K: int = 32,
    chunk: int = 64,
    use_pallas: bool = False,
    use_tile: bool = False,
    MAXJ: int = 8,
    M: int = 4096,
    L: int = 256,
    term=lj_term,
    interpret: bool = False,
    n_payload: int = 0,
):
    """Jitted global pair energy over slab-sharded positions (exact).

    Returns (energy, coverage_ok); see `sharded_md_step` for the flag's
    contract. The Pallas lag path (``use_pallas``) and the segment-tile
    path (``use_tile``, the cubic/wide-box kernel with MAXJ as its window
    capacity) consume left ghosts only (larger-slot ownership), so their
    halo check is one-sided. ``term`` is the elementwise pair term
    (default LJ), summed over unique cutoff pairs on every path.

    ``n_payload``: the input array carries that many extra per-particle
    columns after the coordinates ((n_local, dim + n_payload) per shard);
    they ride the local sort and the halo exchange, and ``term`` receives
    ``(dsq, own_0.., j_0..)`` — the multi-chip sibling of the species
    payload convention (`ops.potentials.lennard_jones_mixed`). Lag and
    tile paths only (the XLA fallback has no payload plumbing).
    """
    if n_payload and not (use_pallas or use_tile):
        raise ValueError("payload columns need use_pallas or use_tile")
    if n_payload and use_tile and n_payload > 1:
        raise ValueError("the packed tile layout carries one payload row")

    def local(pos):
        H_eff = _h_eff(H, pos.shape[0])
        dim = pos.shape[1] - n_payload
        coords = pos[:, :dim]
        info = _global_grid_info(coords, cutoff)
        bins, cols_s = bin_and_sort(
            pos, cutoff, max_cells=1, info=info
        )
        pos_s = cols_s[:, :dim]
        gl, gr, *_ = _halo_exchange(cols_s, H_eff)
        csq = jnp.asarray(cutoff, pos.dtype) ** 2
        n_loc = pos_s.shape[0]
        halo_ok = halo_coverage_ok(
            bins.sorted_keys, info.strides, H_eff,
            both_sides=not (use_pallas or use_tile),
        )
        if use_tile:
            gl_s, gr_s = _wrap_safe_ghosts(
                gl[:, :dim], gr[:, :dim], info, cutoff, H_eff
            )
            from ..ops.tile_pairs import tile_pair_reduce

            ext_t = jnp.concatenate([gl_s, pos_s], axis=0)
            keys_ext = compute_keys(ext_t, info)
            pay = None
            if n_payload:
                # wrap-substituted ghost rows keep their payload (their
                # far coordinates exclude every pair anyway)
                pay = jnp.concatenate([gl[:, dim], cols_s[:, dim]])
            e_loc, cap_ok = tile_pair_reduce(
                ext_t, keys_ext, info.strides, csq, None, pay,
                MAXJ=MAXJ, interpret=interpret, min_islot=H_eff, term=term,
            )
            return jax.lax.psum(e_loc, AXIS), _all_ok(halo_ok & cap_ok)
        if use_pallas:
            ext = jnp.concatenate([gl, cols_s], axis=0)
            keys_ext = compute_keys(ext[:, :dim], info)
            e_loc = pair_lag_reduce(
                ext[:, :dim], keys_ext, info.strides, csq,
                sorted_payload=ext[:, dim:] if n_payload else None,
                M=M, L=L, term=term, interpret=interpret,
                min_islot=H_eff,
            )
            cap_ok = _lag_ok_ext(keys_ext, info.strides, L, H_eff, n_loc)
            return jax.lax.psum(e_loc, AXIS), _all_ok(halo_ok & cap_ok)
        ext = jnp.concatenate([gl, pos_s, gr], axis=0)
        grid = build(ext, cutoff, info=info)
        e_pp = pair_energy_per_particle(grid, term, K=K, chunk=chunk,
                                        cutoff_sq=csq)
        cap_ok = grid.bins.max_cell_count() <= K
        return (
            jax.lax.psum(jnp.sum(e_pp[H_eff : H_eff + n_loc]), AXIS),
            _all_ok(halo_ok & cap_ok),
        )

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P(AXIS, None),),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )


def sharded_pair_hist(
    mesh: Mesh,
    edges,
    *,
    H: int,
    M: int = 1024,
    L: int = 256,
    use_tile: bool = False,
    MAXJ: int = 8,
    interpret: bool = False,
):
    """Jitted global pair-distance histogram over slab-sharded positions:
    cumulative counts of unique pairs with ``dsq < edges[k]^2``, every
    pair counted exactly once globally (larger-slot ownership over the
    left-ghost halo, ``min_islot`` — the same rule as the sharded
    energies). ``edges[-1]`` is the effective cutoff and sets the grid
    geometry. ``use_tile=True`` runs the segment-tile histogram kernel
    (cubic/wide boxes, capacity ``MAXJ``). Returns fn(positions) ->
    ((2, K) int32 hi/lo planes, coverage_ok); reconstruct with
    `pallas_pairs.combine_count_vec` and diff for shell counts
    (`ops.rdf` has the normalization)."""
    import numpy as np

    from ..ops.pallas_pairs import pair_lag_hist

    cutoff = float(np.asarray(edges)[-1])
    edges_sq = jnp.asarray(np.asarray(edges, np.float64) ** 2, jnp.float32)

    def local(pos):
        H_eff = _h_eff(H, pos.shape[0])
        info = _global_grid_info(pos, cutoff)
        bins, pos_s = bin_and_sort(pos, cutoff, max_cells=1, info=info)
        gl, gr, *_ = _halo_exchange(pos_s, H_eff)
        n_loc = pos_s.shape[0]
        halo_ok = halo_coverage_ok(
            bins.sorted_keys, info.strides, H_eff, both_sides=False
        )
        if use_tile:
            from ..ops.tile_pairs import tile_pair_hist

            gl_s, _ = _wrap_safe_ghosts(gl, gr, info, cutoff, H_eff)
            ext = jnp.concatenate([gl_s, pos_s], axis=0)
            keys_ext = compute_keys(ext, info)
            packed, cap_ok = tile_pair_hist(
                ext, keys_ext, info.strides, edges_sq.astype(pos.dtype),
                MAXJ=MAXJ, interpret=interpret, min_islot=H_eff,
            )
            return jax.lax.psum(packed, AXIS), _all_ok(halo_ok & cap_ok)
        ext = jnp.concatenate([gl, pos_s], axis=0)
        keys_ext = compute_keys(ext, info)
        packed = pair_lag_hist(
            ext, keys_ext, info.strides, edges_sq.astype(pos.dtype),
            M=M, L=L, interpret=interpret, min_islot=H_eff,
        )
        cap_ok = _lag_ok_ext(keys_ext, info.strides, L, H_eff, n_loc)
        # per-device (hi, lo) 16-bit plane sums are < 2^27 each; a psum
        # over any realistic mesh stays far from int32 overflow
        return jax.lax.psum(packed, AXIS), _all_ok(halo_ok & cap_ok)

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P(AXIS, None),),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )


def sharded_stress(
    mesh: Mesh,
    *,
    cutoff: float,
    H: int,
    gfn: Callable | None = None,
    M: int = 1024,
    L: int = 256,
    use_tile: bool = False,
    MAXJ: int | tuple = 8,
    interpret: bool = False,
):
    """Jitted global configurational stress tensor over slab-sharded
    positions (open boundaries): the direct fused pair-sum stress kernels
    run per device over [left ghosts | owned] with larger-slot ownership
    (``min_islot`` — the same rule as the sharded energies/histograms),
    and the (dim, dim) tensors psum. ``use_tile=True`` runs the
    segment-tile stress kernel (cubic/wide boxes). The tensor's trace is
    the scalar virial W (`ops.virial.pressure` folds it with the kinetic
    part). Returns fn(positions) -> ((3, 3) stress, coverage_ok)."""
    from ..ops.lj import lj_force_factor
    from ..ops.pallas_pairs import pair_lag_stress

    gfn = gfn or lj_force_factor

    def local(pos):
        H_eff = _h_eff(H, pos.shape[0])
        info = _global_grid_info(pos, cutoff)
        bins, pos_s = bin_and_sort(pos, cutoff, max_cells=1, info=info)
        gl, gr, *_ = _halo_exchange(pos_s, H_eff)
        csq = jnp.asarray(cutoff, pos.dtype) ** 2
        n_loc = pos_s.shape[0]
        halo_ok = halo_coverage_ok(
            bins.sorted_keys, info.strides, H_eff, both_sides=False
        )
        if use_tile:
            from ..ops.tile_pairs import tile_pair_stress

            gl_s, _ = _wrap_safe_ghosts(gl, gr, info, cutoff, H_eff)
            ext = jnp.concatenate([gl_s, pos_s], axis=0)
            keys_ext = compute_keys(ext, info)
            sig, cap_ok = tile_pair_stress(
                ext, keys_ext, info.strides, csq,
                gfn=gfn, MAXJ=MAXJ, interpret=interpret, min_islot=H_eff,
            )
            return jax.lax.psum(sig, AXIS), _all_ok(halo_ok & cap_ok)
        ext = jnp.concatenate([gl, pos_s], axis=0)
        keys_ext = compute_keys(ext, info)
        sig = pair_lag_stress(
            ext, keys_ext, info.strides, csq,
            gfn=gfn, M=M, L=L, interpret=interpret, min_islot=H_eff,
        )
        cap_ok = _lag_ok_ext(keys_ext, info.strides, L, H_eff, n_loc)
        return jax.lax.psum(sig, AXIS), _all_ok(halo_ok & cap_ok)

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P(AXIS, None),),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )


def _sharded_forces(
    mesh: Mesh,
    *,
    cutoff: float,
    H: int,
    K: int = 32,
    chunk: int = 64,
    use_pallas: bool = False,
    use_tile: bool = False,
    MAXJ=8,
    M: int = 4096,
    L: int = 256,
    gfn=lj_force_factor,
    interpret: bool = False,
):
    """Jitted global pair forces over slab-sharded positions, aligned with
    the INPUT order of each device's block (the local sort is undone by a
    second multi-operand sort keyed on the permutation — never an n-sized
    gather). Returns (forces, coverage_ok)."""

    def local(pos):
        H_eff = _h_eff(H, pos.shape[0])
        info = _global_grid_info(pos, cutoff)
        bins, pos_s = bin_and_sort(pos, cutoff, max_cells=1, info=info)
        gl, gr, *_ = _halo_exchange(pos_s, H_eff)
        csq = jnp.asarray(cutoff, pos.dtype) ** 2
        n_loc = pos_s.shape[0]
        dim = pos.shape[1]
        halo_ok = halo_coverage_ok(
            bins.sorted_keys, info.strides, H_eff, both_sides=True
        )
        if use_tile:
            from ..ops.tile_pairs import tile_pair_forces

            gl_s, gr_s = _wrap_safe_ghosts(gl, gr, info, cutoff, H_eff)
            ext = jnp.concatenate([gl_s, pos_s, gr_s], axis=0)
            keys_ext = compute_keys(ext, info)
            f, cap_ok = tile_pair_forces(
                ext, keys_ext, info.strides, csq, MAXJ=MAXJ, gfn=gfn,
                interpret=interpret,
            )
        elif use_pallas:
            ext = jnp.concatenate([gl, pos_s, gr], axis=0)
            keys_ext = compute_keys(ext, info)
            f = pair_lag_forces(
                ext, keys_ext, info.strides, csq,
                M=M, L=L, gfn=gfn, interpret=interpret,
            )
            cap_ok = _lag_ok_ext(keys_ext, info.strides, L, H_eff, n_loc)
        else:
            ext = jnp.concatenate([gl, pos_s, gr], axis=0)
            grid = build(ext, cutoff, info=info)
            f = pair_forces(grid, gfn, K=K, chunk=chunk, cutoff_sq=csq)
            cap_ok = grid.bins.max_cell_count() <= K
        f_own = f[H_eff : H_eff + n_loc]
        out = jax.lax.sort(
            [bins.perm] + [f_own[:, a] for a in range(dim)], num_keys=1
        )
        return (
            jnp.stack(out[1:], axis=-1),
            _all_ok(halo_ok & cap_ok),
        )

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P(AXIS, None),),
            out_specs=(P(AXIS, None), P()),
            check_vma=False,
        )
    )


def make_sharded_potential(
    mesh: Mesh,
    *,
    cutoff: float,
    H: int,
    K: int = 32,
    chunk: int = 64,
    use_pallas: bool = False,
    use_tile: bool = False,
    MAXJ=8,
    MAXJ_F=None,
    M: int = 4096,
    L: int = 256,
    term=None,
    gfn=None,
    interpret: bool = False,
):
    """Differentiable GLOBAL pair potential over slab-sharded positions —
    the multi-chip sibling of `ops.autodiff.make_pair_potential`.

    ``pot(positions) -> (energy, coverage_ok)`` where positions are (n, 3)
    sharded along axis 0 of the mesh ('z' slabs, `partition_by_slab`
    order). `jax.grad(pot, has_aux=True)` returns dE/dpositions with the
    SAME sharding and block-local input order: the backward pass is the
    sharded analytic forces pass (halo exchange + fused forces kernel +
    per-shard un-sort), one collective round, never a gather of the global
    array.

    ``term`` is the elementwise pair term (default LJ); ``gfn`` its force
    factor (derived by autodiff via `gfn_from_term` when omitted).
    ``MAXJ_F`` is the forces-kernel window capacity on the tile path (9
    full bands vs the energy's 5 half bands; defaults to MAXJ's widest
    entry). An under-capacity backward poisons the gradient with NaN
    (never silently drops pairs).
    """
    from ..ops.autodiff import gfn_from_term

    if term is None:
        term, gfn = lj_term, (gfn or lj_force_factor)
    elif gfn is None:
        gfn = gfn_from_term(term)
    if MAXJ_F is None:
        MAXJ_F = MAXJ if isinstance(MAXJ, int) else max(MAXJ)

    energy_fn = sharded_lj_energy(
        mesh, cutoff=cutoff, H=H, K=K, chunk=chunk, use_pallas=use_pallas,
        use_tile=use_tile, MAXJ=MAXJ, M=M, L=L, term=term,
        interpret=interpret,
    )
    forces_fn = _sharded_forces(
        mesh, cutoff=cutoff, H=H, K=K, chunk=chunk, use_pallas=use_pallas,
        use_tile=use_tile, MAXJ=MAXJ_F, M=M, L=L, gfn=gfn,
        interpret=interpret,
    )

    @jax.custom_vjp
    def pot(positions):
        return energy_fn(positions)

    def pot_fwd(positions):
        return energy_fn(positions), positions

    def pot_bwd(positions, ct):
        f, ok = forces_fn(positions)
        f = jnp.where(ok, f, jnp.nan)
        grad = ct[0] * (-f)
        return (grad.astype(positions.dtype),)

    pot.defvjp(pot_fwd, pot_bwd)
    return pot
