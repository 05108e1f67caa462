"""Generic fused cross-set neighbor reductions (query-particle join).

The reference exposes point queries one at a time (`query_neighbors`,
`/root/reference/src/cellgrid.rs:391-401`) and leaves every reduction to
the caller's loop. On TPU the natural shape is the batched join: sort the
queries by flat cell key and reduce each query's within-cutoff particles
in one fused kernel pass (`ops.sdf_join` is the specialized instance that
powers the psssh SDF workload). This module generalizes that machinery:

- `join_reduce` — the raw kernel: per SORTED query, accumulate
  ``n_out`` user-defined quantities over all within-cutoff particles,
  with a ``sum`` (deferred ones-vector MXU contraction, precision-safe:
  products form on the VPU) or ``min``/``max`` (lane reduction) combiner.
- `grid_join_reduce` — the user-facing wrapper: takes a built grid and
  raw query points, handles key assignment/sorting/unsorting and the
  `try_cell_index` validity rule (util.rs:245-256).
- `count_neighbors` / `nearest_dsq` — common instances: neighbor counts
  and nearest-particle squared distance per query.

The particle side (coordinates + optional payload planes, <= 4) is kept
entirely VMEM-resident like the SDF kernel, so there is no window
capacity class — the coverage flag guards key preconditions only.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_pairs import _pad_and_desentinel
from .segments import CHUNK, join_bounds, num_segments, segment_bands
from .tile_pairs import RB, _key_exact_f32, _pack_blocks

__all__ = [
    "JOIN_MAX_PARTICLES",
    "join_reduce",
    "query_join_reduce",
    "grid_join_reduce",
    "grid_join_reduce_auto",
    "count_neighbors",
    "nearest_dsq",
]

# particle-count ceiling for the VMEM-resident packed blocks: 131072
# rows x 8 planes x 4 B = 4 MB, leaving room in VMEM (tens of MB) for
# the query blocks, accumulators, and pipeline buffers. Callers must
# fall back to the XLA query path above this.
JOIN_MAX_PARTICLES = 131072

_IDENT = {"sum": 0.0, "min": float("inf"), "max": float("-inf")}


def _combine(reducer, a, b):
    if reducer == "sum":
        return a + b
    if reducer == "min":
        return jnp.minimum(a, b)
    return jnp.maximum(a, b)


def _make_join_kernel(CB: int, S: int, dtype, term: Callable, n_out: int,
                      npl: int, reducer: str, outrows: int, MAXJ: int = 0):
    """Generic join kernel; same structure as `_make_sdf_join_kernel`
    (query chunks x fully-resident particle blocks) with a pluggable
    per-tile term and combiner.

    ``MAXJ > 0`` selects the windowed variant for particle arrays too
    large for VMEM residency: the packed blocks stay in HBM (`pl.ANY`)
    and each (query chunk, band) window of at most MAXJ chunks is DMA'd
    into a scratch buffer, exactly like the tile pair kernels
    (`tile_pairs._make_tile_forces_kernel_packed`). Bounds then carry
    (jlo, toff, jnum) triples from `join_bounds(..., max_j=MAXJ)`."""
    ident = _IDENT[reducer]  # python scalar: must not be a traced constant
    krow = 3 + npl  # key row index in the packed particle blocks
    windowed = MAXJ > 0

    def kernel(bands_ref, csq_ref, bounds_ref, own8_ref, parr_ref,
               out_ref, facc, macc, *rest):
        csq = csq_ref[0]
        facc[...] = jnp.full_like(facc, ident)

        if windowed:
            jbuf, sems = rest

            def window(oc, s):
                return (bounds_ref[oc, 3 * s], bounds_ref[oc, 3 * s + 1],
                        bounds_ref[oc, 3 * s + 2])

            def copy_obj(oc, s, jlo):
                w = oc * S + s
                return pltpu.make_async_copy(
                    parr_ref.at[pl.ds(jlo * RB, MAXJ * RB), :],
                    jbuf.at[pl.ds(w * MAXJ * RB, MAXJ * RB), :],
                    sems.at[w],
                )

            # issue every window DMA up front; latency hides behind compute
            for oc in range(CB):
                for s in range(S):
                    jlo, _, jnum = window(oc, s)

                    @pl.when(jnum > 0)
                    def _(oc=oc, s=s, jlo=jlo):
                        copy_obj(oc, s, jlo).start()

        for oc in range(CB):
            o0 = oc * CHUNK
            blkT = jnp.transpose(own8_ref[oc * RB : (oc + 1) * RB, :])
            # hoisted lane broadcasts (see _make_tile_kernel_packed)
            qc = [
                jnp.broadcast_to(blkT[:, a : a + 1], (CHUNK, CHUNK))
                for a in range(3)
            ]
            qk = jnp.broadcast_to(blkT[:, 3:4], (CHUNK, CHUNK))

            macc[...] = jnp.full_like(macc, ident)

            for s in range(S):
                lo_s = bands_ref[s, 0]
                hi_s = bands_ref[s, 1]

                def tile_body(blk, lo_s=lo_s, hi_s=hi_s, qc=qc, qk=qk):
                    pk = blk[krow : krow + 1, :]
                    payload = [blk[3 + a : 4 + a, :] for a in range(npl)]

                    diff = qk - pk
                    m = (diff >= lo_s) & (diff <= hi_s)

                    d0 = qc[0] - blk[0:1, :]
                    d1 = qc[1] - blk[1:2, :]
                    d2 = qc[2] - blk[2:3, :]
                    dsq = d0 * d0 + d1 * d1 + d2 * d2
                    within = m & (dsq <= csq)  # inclusive, cellgrid.rs:398

                    vals = term(dsq, (d0, d1, d2), payload, within)
                    for q, vq in enumerate(vals):
                        sl = slice(q * CHUNK, (q + 1) * CHUNK)
                        macc[:, sl] = _combine(reducer, macc[:, sl], vq)

                if windowed:
                    jlo, toff, jnum = window(oc, s)
                    w0 = (oc * S + s) * MAXJ

                    @pl.when(jnum > 0)
                    def _(oc=oc, s=s, jlo=jlo):
                        copy_obj(oc, s, jlo).wait()

                    def tile(t, _, w0=w0, tile_body=tile_body):
                        tile_body(jbuf[pl.ds((w0 + t) * RB, RB), :])
                        return 0

                    jax.lax.fori_loop(toff, toff + jnum, tile, 0)
                else:
                    lo = bounds_ref[oc, 2 * s]
                    num = bounds_ref[oc, 2 * s + 1]

                    def tile(t, _, tile_body=tile_body):
                        tile_body(parr_ref[pl.ds(t * RB, RB), :])
                        return 0

                    jax.lax.fori_loop(lo, lo + num, tile, 0)

            if reducer == "sum":
                ones_row = jnp.ones((1, CHUNK), dtype)
                for q in range(n_out):
                    facc[o0 : o0 + CHUNK, q : q + 1] += jax.lax.dot_general(
                        macc[:, q * CHUNK : (q + 1) * CHUNK], ones_row,
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=dtype,
                    )
            else:
                for q in range(n_out):
                    red = (jnp.min if reducer == "min" else jnp.max)(
                        macc[:, q * CHUNK : (q + 1) * CHUNK],
                        axis=1, keepdims=True,
                    )
                    facc[o0 : o0 + CHUNK, q : q + 1] = _combine(
                        reducer, facc[o0 : o0 + CHUNK, q : q + 1], red
                    )

        for oc in range(CB):
            o0 = oc * CHUNK
            out_ref[oc] = jnp.transpose(facc[o0 : o0 + CHUNK, :])

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("term", "n_out", "reducer", "CB", "MAXJ", "interpret"),
)
def join_reduce(
    qplanes,  # 3 sorted (nq,) query coordinate planes
    qkeys,  # (nq,) int32 ascending query cell keys
    pplanes,  # 3 + npl sorted (np,) particle planes: x, y, z, payload...
    pkeys,  # (np,) int32 ascending particle cell keys
    strides,  # (3,) int32 grid strides (shared GridInfo)
    cutoff_sq,
    *,
    term: Callable,
    n_out: int,
    reducer: str = "sum",
    CB: int = 8,
    MAXJ: int | None = None,
    interpret: bool = False,
):
    """Reduce ``term`` over all within-cutoff particles per sorted query.

    ``term(dsq, (dx, dy, dz), payload_rows, within)`` receives
    (CHUNK, CHUNK) tiles (queries x particles) plus the (1, CHUNK)
    payload rows and must return ``n_out`` tiles already masked to the
    reducer identity (0 for sum, +/-inf for min/max) outside ``within``.
    Returns (out (nq, n_out), ok) in sorted query order.

    ``MAXJ=None`` (default) keeps the whole packed particle array
    VMEM-resident — fastest, but capped at `JOIN_MAX_PARTICLES`. Pass a
    window capacity MAXJ (in 128-slot chunks) to run the windowed kernel
    instead: particles stay in HBM and each (query chunk, band) window is
    DMA'd on demand, so there is no particle ceiling; the coverage flag
    then ALSO goes False when some window needs more than MAXJ chunks
    (re-jit one capacity class up, never trust a flagged result)."""
    if reducer not in _IDENT:
        raise ValueError(f"reducer must be one of {sorted(_IDENT)}")
    npl = len(pplanes) - 3
    if npl < 0 or npl > RB - 4:
        raise ValueError("pplanes must be 3 coordinates + at most "
                         f"{RB - 4} payload planes")
    if n_out > 2 * RB:
        raise ValueError(f"n_out must be <= {2 * RB}")
    nq = qplanes[0].shape[0]
    npart = pplanes[0].shape[0]
    dtype = qplanes[0].dtype
    S = num_segments(3, full=True)
    if CB % 8 and not interpret:
        raise ValueError("CB must be a multiple of 8 (SMEM sublane blocking)")
    if MAXJ is None and npart > JOIN_MAX_PARTICLES:
        raise ValueError(
            f"{npart} particles exceed the VMEM-resident ceiling "
            f"({JOIN_MAX_PARTICLES}); pass a window capacity MAXJ"
        )
    outrows = max(-(-n_out // RB) * RB, RB)

    ncq = max(-(-nq // (CHUNK * CB)) * CB, CB)
    Cq = ncq * CHUNK
    ncp = max(-(-npart // CHUNK), 1)
    Cp = ncp * CHUNK

    qkeys_p = _pad_and_desentinel(qkeys, Cq)
    pkeys_p = _pad_and_desentinel(pkeys, Cp)

    bands = segment_bands(strides, full=True)
    if MAXJ is None:
        lo, num, cov_ok = join_bounds(qkeys_p, pkeys_p, bands)
        bounds = jnp.stack([lo, num], axis=-1).reshape(ncq, 2 * S)
    else:
        MAXJ = min(MAXJ, ncp)
        jlo, toff, jnum, cov_ok = join_bounds(qkeys_p, pkeys_p, bands,
                                              max_j=MAXJ)
        bounds = jnp.stack([jlo, toff, jnum], axis=-1).reshape(ncq, 3 * S)

    qarr8 = _pack_blocks(list(qplanes), qkeys_p, cutoff_sq, nq, Cq, dtype)
    parr8 = _pack_blocks(list(pplanes), pkeys_p, cutoff_sq, npart, Cp, dtype)
    if dtype == jnp.float32:
        cov_ok = _key_exact_f32(qkeys_p, cov_ok)
        cov_ok = _key_exact_f32(pkeys_p, cov_ok)

    kernel = _make_join_kernel(CB, S, dtype, term, n_out, npl, reducer,
                               outrows, MAXJ=MAXJ or 0)
    scratch = [
        pltpu.VMEM((CB * CHUNK, outrows), dtype),
        pltpu.VMEM((CHUNK, n_out * CHUNK), dtype),
    ]
    if MAXJ is None:
        # whole packed particle array, VMEM-resident (constant block)
        parr_spec = pl.BlockSpec((ncp * RB, CHUNK), lambda p: (0, 0))
        bounds_cols = 2 * S
    else:
        parr_spec = pl.BlockSpec(memory_space=pl.ANY)
        bounds_cols = 3 * S
        scratch += [
            pltpu.VMEM((CB * S * MAXJ * RB, CHUNK), dtype),
            pltpu.SemaphoreType.DMA((CB * S,)),
        ]
    out = pl.pallas_call(
        kernel,
        grid=(ncq // CB,),
        in_specs=[
            pl.BlockSpec((S, 2), lambda p: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda p: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((CB, bounds_cols), lambda p: (p, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((CB * RB, CHUNK), lambda p: (p, 0)),
            parr_spec,
        ],
        out_specs=pl.BlockSpec((CB, outrows, CHUNK), lambda p: (p, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((ncq, outrows, CHUNK), dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(
        bands.astype(dtype),
        jnp.asarray(cutoff_sq, dtype).reshape(1),
        bounds,
        qarr8,
        parr8,
    )
    sums = out[:, :n_out, :].transpose(0, 2, 1).reshape(Cq, n_out)[:nq]
    return sums, cov_ok


@functools.partial(
    jax.jit,
    static_argnames=("term", "n_out", "reducer", "CB", "MAXJ", "interpret"),
)
def query_join_reduce(points, origin, shape, strides, cutoff, pplanes,
                      pkeys, *, term: Callable, n_out: int,
                      reducer: str = "sum", CB: int = 8,
                      MAXJ: int | None = None,
                      interpret: bool = False):
    """`join_reduce` for raw query points: key assignment, sorting, and
    un-sorting around the kernel (shared by `grid_join_reduce` and the
    SDF batch path).

    ``origin/shape/strides/cutoff`` is the particle grid's geometry
    (`GridInfo` fields). Returns (out (Q, n_out), valid (Q,), ok) in
    INPUT query order; ``valid`` follows the reference's
    `try_cell_index` rule (within one implicit padding layer,
    util.rs:245-256) — out-of-range queries still get reducer-identity
    outputs (no neighbors)."""
    dtype = pplanes[0].dtype
    points = jnp.atleast_2d(points).astype(dtype)
    Q = points.shape[0]

    idx = jnp.floor((points - origin) / cutoff).astype(jnp.int32)
    valid = jnp.all((idx >= -1) & (idx <= shape), axis=-1)
    # clamp far-away queries into key range (results are identity anyway:
    # padding-distance coordinates fail every cutoff check)
    idx = jnp.clip(idx, -1, shape)
    qkey = idx[:, 0] * strides[0]
    for a in range(1, 3):
        qkey = qkey + idx[:, a] * strides[a]

    iota = jnp.arange(Q, dtype=jnp.int32)
    sk, sx, sy, sz, sperm = jax.lax.sort(
        (qkey, points[:, 0], points[:, 1], points[:, 2], iota), num_keys=1
    )
    sums, ok = join_reduce(
        (sx, sy, sz), sk, pplanes, pkeys, strides,
        jnp.asarray(cutoff, dtype) ** 2,
        term=term, n_out=n_out, reducer=reducer, CB=CB, MAXJ=MAXJ,
        interpret=interpret,
    )
    # un-sort by a second multi-operand sort on sperm — a Q-sized
    # scatter costs ~7 ns/element (CLAUDE.md); the sort moves the
    # payload planes along for free
    unsorted = jax.lax.sort(
        (sperm,) + tuple(sums[:, q] for q in range(n_out)), num_keys=1
    )
    out = jnp.stack(unsorted[1:], axis=-1)
    return out, valid, ok


@functools.partial(
    jax.jit,
    static_argnames=("term", "n_out", "reducer", "CB", "MAXJ", "interpret"),
)
def grid_join_reduce(grid, points, *, term: Callable, n_out: int,
                     payload=(), reducer: str = "sum", CB: int = 8,
                     MAXJ: int | None = None, interpret: bool = False):
    """`query_join_reduce` against a built `core.grid.CellGridData`.

    ``payload`` are extra per-particle planes in SORTED slot order (e.g.
    ``radii[grid.bins.perm]``). Grids above `JOIN_MAX_PARTICLES`
    particles need a window capacity ``MAXJ`` (see `join_reduce`); the
    host-side `grid_join_reduce_auto` picks it by coverage-flag retry."""
    if grid.dim != 3:
        raise ValueError(
            f"the join kernel is 3D-only (grid dim {grid.dim}); use "
            "core.pairs.query_neighbors for other dimensions"
        )
    info = grid.info
    n = grid.n
    sp = grid.sorted_pos
    dtype = sp.dtype
    pplanes = (sp[:n, 0], sp[:n, 1], sp[:n, 2]) + tuple(
        p[:n].astype(dtype) for p in payload
    )
    return query_join_reduce(
        points, info.origin, info.shape, info.strides, info.cutoff,
        pplanes, grid.bins.sorted_keys[:n],
        term=term, n_out=n_out, reducer=reducer, CB=CB, MAXJ=MAXJ,
        interpret=interpret,
    )


def grid_join_reduce_auto(grid, points, *, maxj0: int = 8,
                          maxj_cap: int = 16, **kw):
    """`grid_join_reduce` with automatic windowed-kernel capacity.

    Grids at or below `JOIN_MAX_PARTICLES` run the VMEM-resident kernel
    unchanged. Larger grids run the windowed kernel, starting at window
    capacity ``maxj0`` chunks and re-jitting one capacity class up (x2)
    whenever the coverage flag fails — the host-side retry ladder of the
    static-shapes + coverage-flags invariant (host-syncing; call outside
    jit). ``maxj_cap`` bounds the ladder (the kernel's DMA scratch is
    ~0.3 MB per capacity unit — query chunks whose sorted keys span a
    large fraction of the grid can demand windows no VMEM budget covers);
    a flag still False at the cap is returned as-is — never trust a
    flagged result (fall back to `core.pairs.query_neighbors`, or
    localize/batch the queries so sorted chunks span fewer cells)."""
    n = int(grid.n)
    if n <= JOIN_MAX_PARTICLES:
        return grid_join_reduce(grid, points, **kw)
    ncp = -(-n // CHUNK)
    cap = min(ncp, maxj_cap)
    MAXJ = min(maxj0, cap)
    while True:
        out, valid, ok = grid_join_reduce(grid, points, MAXJ=MAXJ, **kw)
        if bool(ok) or MAXJ >= cap:
            return out, valid, ok
        MAXJ = min(2 * MAXJ, cap)


def _count_term(dsq, d, payload, within):
    return [within.astype(dsq.dtype)]


def _nearest_term(dsq, d, payload, within):
    return [jnp.where(within, dsq, jnp.inf)]


def count_neighbors(grid, points, *, CB: int = 8, interpret: bool = False):
    """Within-cutoff particle count per query point (one fused pass).

    Returns (counts (Q,) int32, valid (Q,), ok). The batched analogue of
    looping `query_neighbors` + count (cellgrid.rs:391-401). Handles any
    grid size (windowed kernel above `JOIN_MAX_PARTICLES` particles)."""
    out, valid, ok = grid_join_reduce_auto(
        grid, points, term=_count_term, n_out=1, CB=CB,
        interpret=interpret,
    )
    return out[:, 0].astype(jnp.int32), valid, ok


def nearest_dsq(grid, points, *, CB: int = 8, interpret: bool = False):
    """Squared distance to the nearest particle within the cutoff per
    query point; +inf when no particle is within the cutoff.

    Returns (dsq (Q,), valid (Q,), ok). Handles any grid size (windowed
    kernel above `JOIN_MAX_PARTICLES` particles)."""
    out, valid, ok = grid_join_reduce_auto(
        grid, points, term=_nearest_term, n_out=1, reducer="min", CB=CB,
        interpret=interpret,
    )
    return out[:, 0], valid, ok
