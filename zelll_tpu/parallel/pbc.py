"""Multi-chip orthorhombic PBC: slab decomposition of a periodic box.

Composes `parallel.domain`'s slab machinery with `ops.pbc`'s ghost-image
extension. The reference has neither distribution nor PBC; this module is
the production-MD combination of both extensions.

Design (per device, inside `shard_map`):

1. The grid geometry is STATIC (the box is a parameter, not data):
   `GridInfo.create` over [origin - 2c, origin + box + 2c], auto-ordered,
   so no pmin/pmax collective is needed and the host partitioner mirrors
   it exactly.
2. Sort the owned block locally; exchange head/tail halos around the
   ring (`domain._halo_exchange`). The ring-wrap edges (device 0 <->
   D-1) are REAL neighbors under PBC: their halo rows are shifted by
   -/+ box along the sort-major axis, turning the wraparound ghosts the
   open-boundary code must neutralize into exactly the periodic images
   the physics needs. Shifted rows sit outside the box (below origin /
   above sup); their flat keys extend monotonically past the real key
   range (floor is monotone; the lag kernel tolerates out-of-range and
   negative keys — only the f32-keyed tile path would not).
3. `ops.pbc.pbc_extend(pool, wrap=False)` over [gl | own | gr] creates
   the minor-axis images — including images OF halo rows (a neighbor's
   particle near both the slab boundary and a box face) and of
   ring-shifted rows (corner pairs across the wrap). The per-axis
   in-box guard keeps out-of-box rows from re-imaging into the box.
4. **Ownership is one payload plane.** Every row carries
   ``o = 1`` (owned real row) or ``0`` (halo copy, ring image, ghost
   image, partitioner pad). The summed term is
   ``0.5 * (o_i + o_j) * term(dsq)``: an owned-owned pair on one device
   contributes 1 there and 0 on every device that sees only copies; a
   cross-device or cross-boundary pair contributes 1/2 on each owner.
   No `min_islot`, no shift-sign plane, no case analysis — the global
   psum is exact as long as every owned row sees its complete
   minimum-image neighborhood locally, which is precisely the halo /
   ghost-capacity coverage the flags verify.

Coverage flags (never silently drop pairs): `halo_coverage_ok`
(both sides) for interior slab boundaries, a coordinate-based ring
check (rows within cutoff of the major faces must fit inside the
edge devices' halos), `pbc_extend`'s B/G/regime flags, and
`lag_coverage_ok` over the extended block. For a 2-device mesh the
head and tail halos both come from the same neighbor; overlapping rows
would defeat the ownership halving, so H is additionally clamped to
n_local // 2 there.
"""

from __future__ import annotations

import functools
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..core.binning import bin_and_sort
from ..core.geometry import Aabb, GridInfo
from ..ops.pallas_pairs import lag_coverage_ok, lj_term, pair_lag_forces, \
    pair_lag_reduce
from ..ops.lj import lj_force_factor
from ..ops.pbc import pbc_extend, suggest_pbc_capacity, wrap_positions
from .domain import AXIS, _all_ok, _halo_exchange, _h_eff, \
    _repartition_exchange_local, halo_coverage_ok

__all__ = [
    "partition_by_slab_pbc",
    "repartition_exchange_pbc",
    "repartition_pbc",
    "sharded_pbc_lj_energy",
    "sharded_pbc_md_step",
    "sharded_pbc_md_run",
    "sharded_pbc_stress",
]


def _static_info(origin, box, cutoff, dtype=jnp.float32):
    """Static extended grid info: [origin - 2c, origin + box + 2c]."""
    origin = jnp.asarray(origin, dtype).reshape(3)
    box = jnp.asarray(box, dtype).reshape(3)
    c = jnp.asarray(cutoff, dtype)
    return GridInfo.create(
        Aabb(inf=origin - 2 * c, sup=origin + box + 2 * c),
        cutoff,
        auto_order=True,
    )


def _major_axis(box, cutoff) -> int:
    """Sort-major axis of the static extended grid (host-side)."""
    shape = np.floor(
        (np.asarray(box, np.float64) + 4.0 * cutoff) / cutoff
    ).astype(np.int64) + 1
    return int(np.argsort(shape, kind="stable")[-1])


def partition_by_slab_pbc(positions, origin, box, cutoff, n_devices: int):
    """Host-side partition of a periodic box: wrap, key-sort with the
    static extended grid, split into equal blocks. Pads (beyond the high
    major face, 2*cutoff apart) sort last and — being out of the box —
    never spawn ghost images (the per-axis in-box guard).
    Returns (positions_sorted (nd*n_local, 3), n_local)."""
    pts = np.asarray(positions, np.float64)
    origin = np.asarray(origin, np.float64)
    box = np.asarray(box, np.float64)
    pts = origin + np.mod(pts - origin, box)
    n = pts.shape[0]
    n_local = -(-n // n_devices)
    n_pad = n_local * n_devices - n

    inf = origin - 2.0 * cutoff
    shape = np.floor((box + 4.0 * cutoff) / cutoff).astype(np.int64) + 1
    perm = np.argsort(shape, kind="stable")
    padded = shape[perm] + 4
    s = np.concatenate([[1], np.cumprod(padded[:-1])])
    strides = np.empty_like(s)
    strides[perm] = s
    major = int(perm[-1])
    keys = (np.floor((pts - inf) / cutoff).astype(np.int64) * strides).sum(1)
    order = np.argsort(keys, kind="stable")
    out = pts[order]
    if n_pad:
        pad = np.tile(origin, (n_pad, 1))
        pad[:, major] = origin[major] + box[major] + 2.0 * cutoff * np.arange(
            2, n_pad + 2
        )
        out = np.vstack([out, pad])
    return out.astype(np.asarray(positions).dtype), n_local


_OWN_TERMS: dict = {}


def _own_term(term: Callable) -> Callable:
    """0.5 * (o_i + o_j) * term(dsq) — cached so `pair_lag_reduce`'s
    static ``term`` doesn't retrace per call."""
    fn = _OWN_TERMS.get(term)
    if fn is None:
        def fn(dsq, oi, oj):
            return 0.5 * (oi + oj) * term(dsq)

        _OWN_TERMS[term] = fn
    return fn


def _mi_reach(box, cutoff, mimask):
    """Host-side per-axis key-window reach for min-imaged axes (wrap
    adjacency spans the occupied cells: ``ceil(box/cutoff) - 1``)."""
    b64 = np.asarray(box, np.float64).reshape(-1)
    return tuple(
        max(int(np.ceil(b64[a] / float(cutoff))) - 1, 1) if mimask[a] else 1
        for a in range(len(b64))
    )


def _pool_and_extend(pos, origin, box, cutoff, H, B, G, major, extra=None,
                     mimask=None):
    """Shared per-device pipeline: sort -> ring-shifted halos -> pool ->
    ghost extension -> globally consistent sorted block with the
    ownership plane. ``extra`` (n_loc, k) columns ride the local sort
    (never an n-sized gather). Returns
    (extra_s, bins, sp, so, ok, n_loc, H_eff, pos_s, mi_box, reach).

    ``mimask`` ((3,) host bool, never the major/slab axis): axes folded
    IN-KERNEL to the minimum image (`pallas_pairs._mi_pair_d`) instead
    of ghost-imaged — `pbc_extend` then images only the remaining axes,
    so the thin-box ghost blowup (G ~ 2.8n when every particle is
    boundary on two 3-cell axes) disappears per device exactly like the
    single-chip `ops.pbc` minimage path. The ownership 0.5*(o_i+o_j)
    rule is untouched: folded pairs appear as ONE candidate (no image
    rows), so no dedup plane is needed. The widened key window (reach)
    flows to every coverage check."""
    nd = jax.lax.axis_size(AXIS)
    idx = jax.lax.axis_index(AXIS)
    n_loc = pos.shape[0]
    H_eff = _h_eff(H, pos.shape[0])
    if nd == 2:
        # head and tail halos both come from the single other device;
        # overlapping rows would appear twice and double their 1/2
        # ownership shares — keep the slices disjoint
        H_eff = min(H_eff, n_loc // 2)
    dt = pos.dtype
    box_host = np.asarray(box, np.float64).reshape(3)
    origin = jnp.asarray(origin, dt).reshape(3)
    box = jnp.asarray(box, dt).reshape(3)
    info = _static_info(origin, box, cutoff, dt)

    stacked = pos if extra is None else jnp.concatenate([pos, extra], axis=1)
    bins0, cols0 = bin_and_sort(
        stacked, cutoff, max_cells=1, info=info, need_perm=False
    )
    pos_s, extra_s = cols0[:, :3], cols0[:, 3:]
    gl, gr, _, _ = _halo_exchange(pos_s, H_eff)
    shift = jnp.zeros((3,), dt).at[major].set(box[major])
    sup_maj = origin[major] + box[major]
    if H_eff:
        # ring edges: shift wrapped halo rows by -/+ box along the major
        # axis — but ONLY in-box rows. Partitioner pads (the only
        # out-of-box rows in `pos`) live beyond the high major face; a
        # shifted pad would land back INSIDE the box as a spurious
        # near-corner row. Unshifted they keep huge keys, sort last, and
        # pair with nothing (>= 2*cutoff from everything).
        in_l = (gl[:, major] >= origin[major]) & (gl[:, major] < sup_maj)
        in_r = (gr[:, major] >= origin[major]) & (gr[:, major] < sup_maj)
        gl = jnp.where((idx == 0) & in_l[:, None], gl - shift, gl)
        gr = jnp.where((idx == nd - 1) & in_r[:, None], gr + shift, gr)
    pool = jnp.concatenate([gl, pos_s, gr], axis=0)
    own = jnp.concatenate([
        jnp.zeros((H_eff,), dt),
        jnp.ones((n_loc,), dt),
        jnp.zeros((H_eff,), dt),
    ])

    if mimask is None:
        mimask = np.zeros(3, bool)
    mimask = np.asarray(mimask, bool).reshape(3)
    assert not mimask[major], (
        "the slab/ring axis is halo-handled; it can never fold in-kernel"
    )
    reach = _mi_reach(box_host, cutoff, mimask)
    mi_box = (
        jnp.asarray(np.where(mimask, box_host, 0.0), dt)
        if mimask.any() else None
    )
    ext, _, _w, valid, okg = pbc_extend(
        pool, origin, box, cutoff, B=B, G=G, wrap=False,
        axes=tuple(bool(x) for x in ~mimask) if mimask.any() else None,
    )
    o = jnp.concatenate([own, jnp.zeros((ext.shape[0] - pool.shape[0],), dt)])
    bins, cols = bin_and_sort(
        jnp.concatenate([ext, o[:, None]], axis=1), cutoff,
        max_cells=1, info=info, valid=valid, need_perm=True,
    )
    sp, so = cols[:, :3], cols[:, 3]

    # coverage: interior slab halos (key windows) + ring faces
    # (coordinate test: rows within cutoff of a major face must fit in
    # the edge device's halo slice)
    halo_ok = halo_coverage_ok(
        bins0.sorted_keys, info.strides, H_eff, both_sides=True,
        reach=reach if mimask.any() else None,
    )
    maj = pos_s[:, major]
    cnt_lo = jnp.sum(maj < origin[major] + cutoff)
    # high-face rows must fit in the tail halo slice TOGETHER with any
    # out-of-box pads behind them (pads have the largest keys and eat
    # tail slots); face counts exclude the pads themselves
    in_box_maj = maj < origin[major] + box[major]
    cnt_hi = jnp.sum((maj >= origin[major] + box[major] - cutoff) & in_box_maj)
    cnt_out = jnp.sum(~in_box_maj)
    ring_ok = jnp.where(
        nd > 1,
        # edge devices: face rows (plus tail pads on the high side) must
        # fit inside the exchanged halo slice; interior devices must have
        # no face rows at all (they could never reach the opposite edge)
        jnp.where(idx == 0, cnt_lo <= H_eff, cnt_lo == 0)
        & jnp.where(idx == nd - 1, cnt_hi + cnt_out <= H_eff, cnt_hi == 0),
        True,
    )
    ok = okg & halo_ok & ring_ok
    return extra_s, bins, sp, so, ok, n_loc, H_eff, pos_s, mi_box, reach


def sharded_pbc_lj_energy(
    mesh: Mesh,
    *,
    origin,
    box,
    cutoff: float,
    H: int,
    B: int | None = None,
    G: int | None = None,
    M: int = 4096,
    L: int = 256,
    term: Callable = lj_term,
    use_tile: bool = False,
    MAXJ: int = 8,
    interpret: bool = False,
    minimage=False,
):
    """Jitted global pair energy of a periodic box over slab-sharded
    positions (`partition_by_slab_pbc` order). ``use_tile=True`` runs the
    segment-tile kernel (cubic/wide boxes, where the lag kernel's key
    window degenerates; ``MAXJ`` = per-chunk partner-window capacity) —
    the ownership payload plane composes identically on both kernels.
    ``minimage`` ("auto" | False | per-axis mask; lag path only) folds
    narrow minor axes in-kernel per device instead of ghost-imaging them
    (`_pool_and_extend`); the slab/ring axis always keeps its halo
    machinery, so "auto" never selects it and an explicit mask that does
    raises. Returns (energy, ok)."""
    major = _major_axis(box, cutoff)
    mimask = _sharded_mimask(box, cutoff, minimage, major, use_tile)

    def local(pos):
        return _energy_local(
            pos, origin=origin, box=box, cutoff=cutoff, H=H, B=B, G=G,
            M=M, L=L, term=term, use_tile=use_tile, MAXJ=MAXJ,
            interpret=interpret, mimask=mimask,
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


def _sharded_mimask(box, cutoff, minimage, major, use_tile):
    """Host-side mimask for the sharded PBC paths: resolve the spec,
    force the slab/ring axis OFF for "auto" (its wrap is the ring's
    job), reject explicit masks that fold it, and reject the tile
    backend (minimage is a lag-kernel feature)."""
    from ..ops.pbc import _resolve_minimage

    mimask = _resolve_minimage(box, cutoff, minimage, 3)
    if not mimask.any():
        return mimask
    if use_tile:
        raise ValueError(
            "minimage is a lag-path feature; it does not compose with "
            "use_tile=True"
        )
    if minimage == "auto":
        mimask[major] = False
    elif mimask[major]:
        raise ValueError(
            f"axis {major} is the slab/ring axis (major stride); its wrap "
            "is handled by ring halos and cannot fold in-kernel"
        )
    return mimask


def _energy_local(pos, *, origin, box, cutoff, H, B, G, M, L, term,
                  interpret, use_tile=False, MAXJ=8, mimask=None):
    """Per-device body of the sharded PBC energy (inside shard_map)."""
    n_loc = pos.shape[0]
    np_pool = n_loc + 2 * min(H, n_loc)
    axes = None if mimask is None or not mimask.any() else ~mimask
    Bv = B or suggest_pbc_capacity(np_pool, box, cutoff, axes=axes)[0]
    Gv = G or suggest_pbc_capacity(np_pool, box, cutoff, axes=axes)[1]
    _, bins, sp, so, ok, n_loc, _, _, mi_box, reach = _pool_and_extend(
        pos, origin, box, cutoff, H, Bv, Gv, _major_axis(box, cutoff),
        mimask=mimask,
    )
    csq = jnp.asarray(cutoff, pos.dtype) ** 2
    if use_tile:
        from ..ops.tile_pairs import tile_pair_reduce

        e_loc, cov = tile_pair_reduce(
            sp, bins.sorted_keys, bins.info.strides, csq, None, so,
            MAXJ=MAXJ, term=_own_term(term), interpret=interpret,
        )
        ok &= cov
    else:
        e_loc = pair_lag_reduce(
            sp, bins.sorted_keys, bins.info.strides, csq,
            sorted_payload=so[:, None],
            M=M, L=L, term=_own_term(term), interpret=interpret,
            mi_box=mi_box, key_reach=reach if mi_box is not None else None,
        )
        ok &= lag_coverage_ok(
            bins.sorted_keys, bins.info.strides, L,
            reach=reach if mi_box is not None else None,
        )
    return jax.lax.psum(e_loc, AXIS), _all_ok(ok)


def sharded_pbc_md_step(
    mesh: Mesh,
    *,
    origin,
    box,
    cutoff: float,
    H: int,
    B: int | None = None,
    G: int | None = None,
    dt: float = 1e-4,
    M: int = 4096,
    L: int = 256,
    use_tile: bool = False,
    MAXJ: int = 8,
    interpret: bool = False,
    minimage=False,
):
    """Jitted LJ MD step of a periodic box over the mesh: forces from the
    ghost-extended block (every owned row sees its full minimum-image
    neighborhood), semi-implicit Euler, wrap. ``use_tile=True`` uses the
    segment-tile kernels (cubic/wide periodic boxes); ``minimage`` folds
    narrow minor axes in-kernel (lag path — Newton's +/- g*d on the
    FOLDED separation is the minimum-image force, see
    `ops.pbc.pbc_lj_forces`). State stays slab-sharded in block-sorted
    order. Returns step(positions, velocities) ->
    (positions, velocities, ok)."""
    major = _major_axis(box, cutoff)
    mimask = _sharded_mimask(box, cutoff, minimage, major, use_tile)

    def local(pos, vel):
        return _md_step_local(
            pos, vel, origin=origin, box=box, cutoff=cutoff, H=H, B=B,
            G=G, dt=dt, M=M, L=L, major=major, use_tile=use_tile,
            MAXJ=MAXJ, interpret=interpret, mimask=mimask,
        )

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P(AXIS, None), P(AXIS, None)),
            out_specs=(P(AXIS, None), P(AXIS, None), P()),
            check_vma=False,
        )
    )


def _md_step_local(pos, vel, *, origin, box, cutoff, H, B, G, dt, M, L,
                   major, interpret, use_tile=False, MAXJ=8, mimask=None):
    """Per-device body of one sharded PBC MD step (inside shard_map)."""
    n_loc = pos.shape[0]
    np_pool = n_loc + 2 * min(H, n_loc)
    axes = None if mimask is None or not mimask.any() else ~mimask
    Bv = B or suggest_pbc_capacity(np_pool, box, cutoff, axes=axes)[0]
    Gv = G or suggest_pbc_capacity(np_pool, box, cutoff, axes=axes)[1]
    vel_s, bins, sp, _so, ok, n_loc, H_eff, pos_s, mi_box, reach = (
        _pool_and_extend(
            pos, origin, box, cutoff, H, Bv, Gv, major, extra=vel,
            mimask=mimask,
        )
    )
    dtp = pos.dtype
    csq = jnp.asarray(cutoff, dtp) ** 2
    if use_tile:
        from ..ops.tile_pairs import tile_pair_forces

        f, cov = tile_pair_forces(
            sp, bins.sorted_keys, bins.info.strides, csq,
            MAXJ=MAXJ, gfn=lj_force_factor, interpret=interpret,
        )
        ok &= cov
    else:
        f = pair_lag_forces(
            sp, bins.sorted_keys, bins.info.strides, csq,
            M=M, L=L, gfn=lj_force_factor, interpret=interpret,
            mi_box=mi_box, key_reach=reach if mi_box is not None else None,
        )
        ok &= lag_coverage_ok(
            bins.sorted_keys, bins.info.strides, L,
            reach=reach if mi_box is not None else None,
        )
    # un-sort to pool order, slice the owned run [H_eff, H_eff+n_loc)
    _, fx, fy, fz = jax.lax.sort(
        (bins.perm, f[:, 0], f[:, 1], f[:, 2]), num_keys=1
    )
    f_own = jnp.stack(
        [fx[H_eff : H_eff + n_loc], fy[H_eff : H_eff + n_loc],
         fz[H_eff : H_eff + n_loc]], axis=-1
    )
    vel_new = vel_s + dt * f_own
    moved = pos_s + dt * vel_new
    # wrap only rows near the box (real particles drift <= cutoff per
    # step under the halo assumptions); partitioner pads sit beyond
    # origin + box + cutoff and must NEVER wrap back into the box
    org = jnp.asarray(origin, dtp).reshape(3)
    bx = jnp.asarray(box, dtp).reshape(3)
    c = jnp.asarray(cutoff, dtp)
    near = (moved >= org - c) & (moved < org + bx + c)
    pos_new = jnp.where(near, wrap_positions(moved, org, bx), moved)
    return pos_new, vel_new, _all_ok(ok)


def sharded_pbc_md_run(
    mesh: Mesh,
    *,
    origin,
    box,
    cutoff: float,
    H: int,
    steps: int,
    B: int | None = None,
    G: int | None = None,
    dt: float = 1e-4,
    M: int = 4096,
    L: int = 256,
    use_tile: bool = False,
    MAXJ: int = 8,
    interpret: bool = False,
    minimage=False,
):
    """Jitted ``steps``-step LJ MD trajectory of a periodic box over the
    mesh, scanned inside ONE shard_map dispatch — `sharded_pbc_md_step`
    pays a host round-trip per step (~30 ms through the axon tunnel),
    which dominates below ~1e6 particles/device; here the whole
    trajectory plus a final global energy is a single XLA program.

    Same per-step body as `sharded_pbc_md_step` (ring halos are
    re-exchanged every step, so slab drift up to the halo depth is
    absorbed and coverage-flagged, never silent). State stays
    slab-sharded in block-sorted order. Returns
    run(positions, velocities) -> (positions, velocities, ok, energy).
    """
    major = _major_axis(box, cutoff)
    mimask = _sharded_mimask(box, cutoff, minimage, major, use_tile)

    def local(pos, vel):
        def body(carry, _):
            p, v, ok = carry
            p2, v2, ok2 = _md_step_local(
                p, v, origin=origin, box=box, cutoff=cutoff, H=H, B=B,
                G=G, dt=dt, M=M, L=L, major=major, use_tile=use_tile,
                MAXJ=MAXJ, interpret=interpret, mimask=mimask,
            )
            return (p2, v2, ok & ok2), None

        (p, v, ok), _ = jax.lax.scan(
            body, (pos, vel, jnp.asarray(True)), None, length=steps
        )
        e, oke = _energy_local(
            p, origin=origin, box=box, cutoff=cutoff, H=H, B=B, G=G,
            M=M, L=L, term=lj_term, use_tile=use_tile, MAXJ=MAXJ,
            interpret=interpret, mimask=mimask,
        )
        return p, v, ok & oke, e

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P(AXIS, None), P(AXIS, None)),
            out_specs=(P(AXIS, None), P(AXIS, None), P(), P()),
            check_vma=False,
        )
    )


def _half_own_weight(oi, oj):
    """Distributed ownership weight on the o payload plane: an owned-owned
    pair weighs 1 on its (single) device, a pair with one halo/ghost/image
    endpoint weighs 1/2 on each of the two devices that realize it — the
    multiplicative-stress analogue of `_own_term`."""
    return 0.5 * (oi + oj)


def sharded_pbc_stress(
    mesh: Mesh,
    *,
    origin,
    box,
    cutoff: float,
    H: int,
    B: int | None = None,
    G: int | None = None,
    gfn: Callable | None = None,
    M: int = 4096,
    L: int = 256,
    use_tile: bool = False,
    MAXJ: int | tuple = 8,
    interpret: bool = False,
    minimage=False,
):
    """Jitted global configurational stress tensor of a periodic box over
    slab-sharded positions: the direct fused pair-sum stress kernel runs
    per device over the pooled+extended block with each pair's g scaled
    by the ownership rule ``0.5 * (o_i + o_j)`` (`_half_own_weight` — the
    exact plane the sharded PBC energies use, applied multiplicatively
    since stress terms carry d (x) d, not a scalar the term could
    absorb), and the (3, 3) tensors psum to the minimum-image global
    stress. ``minimage`` folds narrow minor axes in-kernel per device
    (`_pool_and_extend`; lag path only). ``use_tile=True`` runs the
    segment-tile stress kernel (round 13: `tile_pair_stress` grew the
    multiplicative ``pair_weight``, so cubic/wide periodic boxes now
    take the tile path here too). The trace is the scalar virial W; add
    the kinetic part via `ops.virial.pressure_tensor`. Returns
    fn(positions) -> ((3, 3) stress, ok)."""
    from ..ops.pallas_pairs import pair_lag_stress

    major = _major_axis(box, cutoff)
    mimask = _sharded_mimask(box, cutoff, minimage, major, use_tile)
    gfn = gfn or lj_force_factor

    def local(pos):
        n_loc = pos.shape[0]
        np_pool = n_loc + 2 * min(H, n_loc)
        axes = None if not mimask.any() else ~mimask
        Bv = B or suggest_pbc_capacity(np_pool, box, cutoff, axes=axes)[0]
        Gv = G or suggest_pbc_capacity(np_pool, box, cutoff, axes=axes)[1]
        _, bins, sp, so, ok, _, _, _, mi_box, reach = _pool_and_extend(
            pos, origin, box, cutoff, H, Bv, Gv, major, mimask=mimask,
        )
        csq = jnp.asarray(cutoff, pos.dtype) ** 2
        if use_tile:
            from ..ops.tile_pairs import tile_pair_stress

            sig, cov = tile_pair_stress(
                sp, bins.sorted_keys, bins.info.strides, csq,
                sorted_payload=so, pair_weight=_half_own_weight,
                gfn=gfn, MAXJ=MAXJ, interpret=interpret,
            )
            ok &= cov
        else:
            sig = pair_lag_stress(
                sp, bins.sorted_keys, bins.info.strides, csq,
                sorted_payload=so[:, None], pair_weight=_half_own_weight,
                gfn=gfn, M=M, L=L, interpret=interpret,
                mi_box=mi_box,
                key_reach=reach if mi_box is not None else None,
            )
            ok &= lag_coverage_ok(
                bins.sorted_keys, bins.info.strides, L,
                reach=reach if mi_box is not None else None,
            )
        return jax.lax.psum(sig, AXIS), _all_ok(ok)

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P(AXIS, None),),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )


def repartition_pbc(
    mesh: Mesh, *, origin, box, cutoff: float, n_valid: int | None = None
):
    """Jitted global repartition for a periodic box: wrap, re-key with
    the STATIC extended grid (the same one `partition_by_slab_pbc` and
    the sharded PBC steps use), globally sort, slice equal blocks.

    The open-boundary `repartition` keys on the data AABB, which drifts
    under PBC (wrapped coordinates span the box, pads sit beyond it) —
    here the grid is a parameter, so no pmin/pmax collective is needed
    and the result matches a fresh `partition_by_slab_pbc` up to
    wrap rounding. ``n_valid`` (the true particle count) guards the
    partitioner pads: pads are the globally LAST rows by construction
    (maximal keys, zero velocity — every sharded step re-sorts them to
    the tail of the last block) and a full mod-wrap would resurrect
    them inside the box as fake particles, so only the first ``n_valid``
    gathered rows are wrapped. Default None wraps everything (no pads:
    n divisible by the device count). all_gather-based (O(n)
    replicated, like `repartition`).

    Returns step(positions, velocities) -> (positions, velocities) with
    slab shardings.
    """

    def local(pos, vel):
        dt = pos.dtype
        org = jnp.asarray(origin, dt).reshape(3)
        bx = jnp.asarray(box, dt).reshape(3)
        info = _static_info(org, bx, cutoff, dt)
        allp = jax.lax.all_gather(pos, AXIS, tiled=True)
        allv = jax.lax.all_gather(vel, AXIS, tiled=True)
        n_tot = allp.shape[0]
        wrapped = wrap_positions(allp, org, bx)
        if n_valid is not None and n_valid < n_tot:
            real = jnp.arange(n_tot) < n_valid
            allp = jnp.where(real[:, None], wrapped, allp)
        else:
            allp = wrapped
        from ..core.binning import compute_keys

        keys = compute_keys(allp, info)
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

def repartition_exchange_pbc(
    mesh: Mesh, *, origin, box, cutoff: float, A: int | None = None
):
    """Distributed repartition for a periodic box: restore the slab
    invariant WITHOUT replicating the particle array — the PBC sibling of
    `domain.repartition_exchange` (same exact splitter binary search +
    fixed-capacity adjacent ppermute exchange, O(A) traffic).

    PBC differences: rows are wrapped into the box first, and keys come
    from the STATIC extended grid (the one `partition_by_slab_pbc` and
    every sharded PBC step use), so no pmin/pmax collective and the
    result is bit-identical to `repartition_pbc`'s global sort. The wrap
    is guarded by the near-box coordinate test (rows in
    [origin - cutoff, origin + box + cutoff)): real particles drift less
    than a cutoff past a face between repartitions (the halo assumption),
    while partitioner pads sit >= 2*cutoff beyond the high face and must
    NEVER wrap back into the box as fake particles — unwrapped they keep
    maximal keys and stay pinned to the tail of the last block.

    Slab adjacency is a RING here (``ring=True``): a particle crossing a
    periodic face wraps to the opposite end of the key range, which is
    linearly distant but ring-adjacent — the transport uses full ring
    ppermutes and contiguous-run buffer extraction (see
    `_repartition_exchange_local`).

    Returns step(positions, velocities) -> (positions, velocities, ok);
    ``ok`` False iff a particle out-drifted a ring-adjacent slab, a run
    exceeded A, or keys overflow — fall back to `repartition_pbc`,
    never trust outputs with a False flag.
    """

    def local(pos, vel):
        dtp = pos.dtype
        org = jnp.asarray(origin, dtp).reshape(3)
        bx = jnp.asarray(box, dtp).reshape(3)
        c = jnp.asarray(cutoff, dtp)
        info = _static_info(org, bx, cutoff, dtp)
        near = (pos >= org - c) & (pos < org + bx + c)
        pos = jnp.where(near, wrap_positions(pos, org, bx), pos)
        n_loc = pos.shape[0]
        cap = A if A is not None else max(n_loc // 4, 1)
        cap = min(cap, n_loc)
        return _repartition_exchange_local(pos, vel, info, cutoff, cap,
                                           ring=True)

    return jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P(AXIS, None), P(AXIS, None)),
            out_specs=(P(AXIS, None), P(AXIS, None), P()),
            check_vma=False,
        )
    )
