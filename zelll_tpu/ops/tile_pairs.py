"""Segment-tile pair kernel: box-shape-independent fused pair reductions.

The rolling-lag kernel (`ops.pallas_pairs`) is optimal for thin boxes but
its contiguous lag window degenerates on cubic/wide boxes (a full z-layer
of irrelevant slots between the true partner rows). This kernel visits,
for every 128-slot chunk of the key-sorted order, only the few slot
ranges that can hold cutoff partners:

* `ops.segments` decomposes the half-stencil into <= 5 disjoint
  key-difference bands (the negation-symmetry trick of the reference,
  zelll src/cellgrid/iters.rs:58-117, recast as key arithmetic) and
  locates, per chunk x band, the one contiguous j-chunk window holding
  all partners — exact bounds from the sorted keys, no fluctuation slack.
* The kernel walks own chunks in blocks; per (chunk, band) it DMAs the
  j-window (coordinate planes + keys, interleaved per chunk) from HBM at
  a dynamic chunk offset into VMEM, then evaluates 128x128 tiles:
  broadcast differences (own column (128,1) vs partner row (1,128)) give
  exact f32 pair separations — the same cancellation-free semantics as
  the lag kernel, unlike a matmul/norm expansion — masked by the key band
  (which IS the half-space + cell-adjacency test) and the cutoff.
* Total work is ~sum of true window populations + one-tile alignment
  slack per band: for a cubic box this is ~5 bands x ~(128 + band
  occupancy) evaluations per slot, independent of the box cross-section —
  the property the column path (`ops.columns`) bought with a 4x data
  blow-up and a 4x sort.

Every pair is counted exactly once: bands are disjoint and cover exactly
the half stencil; within the [0, 1] band a strict slot-order triangle
breaks same-cell/adjacent-cell ties (the "larger sorted slot owns the
pair" rule used across the repo).

Precision: split (hi, lo) coordinate planes are supported exactly like
`pair_lag_reduce` (dx = (hi_i - hi_j) + (lo_i - lo_j)); accumulation is
per-element Kahan within a program and compensated across programs.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_pairs import (
    _PAD_KEY_BASE,
    _pad_and_desentinel,
    combine_count,
    count_term,
    lj_term,
)
from ..core.binning import bin_and_sort
from .segments import CHUNK, chunk_bounds, num_segments, segment_bands

__all__ = [
    "tile_pair_reduce",
    "tile_lj_rebuild_energy",
    "tile_lj_energy",
    "tile_count_pairs",
    "tile_pair_forces",
    "tile_pair_stress",
]


def _make_tile_kernel(CB: int, S: int, MAXJ: int, D: int, term: Callable,
                      dtype, out_dtype, split: bool, kahan: bool,
                      distributed: bool, OH: int = CHUNK):
    """Kernel over a (NC/CB,) grid; per program: CB own chunks x S bands,
    each band one DMA'd j-window of MAXJ chunks, each occupied chunk one
    128x128 tile. Tiles run in a dynamic ``fori_loop`` over the true
    window [toff, toff+jnum) — compile-time code size is CB*S tile bodies
    and runtime work is proportional to occupied chunks, not to the
    static MAXJ capacity (the unrolled pl.when variant ran ~2x slower at
    MAXJ=12 purely from the dead static tiles). The j-side arrives as two
    windows per band — coordinate planes (nc, D, 128) and int32 keys
    (nc, 1, 128), dynamically indexed on the untiled leading dim — kept
    as separate typed DMAs (a bit-cast key row read back through a
    sublane slice miscompiles on real Mosaic while passing in interpret
    mode)."""
    kahan = kahan and jnp.issubdtype(out_dtype, jnp.floating)
    ncoord = D // 2 if split else D
    G = CHUNK // OH

    def kernel(bands_ref, csq_ref, mislot_ref, bounds_ref, gb_ref, own_ref,
               okey_ref, jarr_ref, jkey_ref, out_ref, comp_ref, acc_s,
               comp_s, jbuf, kbuf, sems, ksems):
        p = pl.program_id(0)
        num_p = pl.num_programs(0)
        csq = csq_ref[0]
        min_islot = mislot_ref[0]

        @pl.when(p == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)
            comp_ref[...] = jnp.zeros_like(comp_ref)

        # per-program accumulator lives in scratch: tile bodies run under
        # data-dependent control flow, so accumulation must be a ref store
        acc_s[...] = jnp.zeros_like(acc_s)
        if kahan:
            comp_s[...] = jnp.zeros_like(comp_s)

        def window(oc, s):
            jlo = bounds_ref[oc, 3 * s]
            toff = bounds_ref[oc, 3 * s + 1]
            jnum = bounds_ref[oc, 3 * s + 2]
            return jlo, toff, jnum

        def copy_obj(oc, s, jlo):
            w = oc * S + s
            return pltpu.make_async_copy(
                jarr_ref.at[pl.ds(jlo, MAXJ)],
                jbuf.at[pl.ds(w * MAXJ, MAXJ)],
                sems.at[w],
            )

        def kcopy_obj(oc, s, jlo):
            w = oc * S + s
            return pltpu.make_async_copy(
                jkey_ref.at[pl.ds(jlo, MAXJ)],
                kbuf.at[pl.ds(w * MAXJ, MAXJ)],
                ksems.at[w],
            )

        # issue every window DMA up front (bounds for the whole block are
        # in this program's SMEM slice); latency hides behind compute
        for oc in range(CB):
            for s in range(S):
                jlo, _, jnum = window(oc, s)

                @pl.when(jnum > 0)
                def _(oc=oc, s=s, jlo=jlo):
                    copy_obj(oc, s, jlo).start()
                    kcopy_obj(oc, s, jlo).start()

        row_g = [jax.lax.broadcasted_iota(jnp.int32, (OH, CHUNK), 0) + g * OH
                 for g in range(G)]
        lane_j = jax.lax.broadcasted_iota(jnp.int32, (OH, CHUNK), 1)
        tri_g = [r > lane_j for r in row_g]

        for oc in range(CB):
            o0 = oc * CHUNK
            if distributed:
                gslot0 = (p * CB + oc) * CHUNK
                # distributed ownership: pairs whose larger-slot endpoint
                # is below min_islot belong to another device (skipped
                # entirely on the single-device path: static flag)
                owned_g = [(row_g[g][:, 0:1] + gslot0) >= min_islot
                           for g in range(G)]

            for s in range(S):
                jlo, _, jnum = window(oc, s)
                lo_s = bands_ref[s, 0]
                hi_s = bands_ref[s, 1]
                w0 = (oc * S + s) * MAXJ

                @pl.when(jnum > 0)
                def _(oc=oc, s=s, jlo=jlo):
                    copy_obj(oc, s, jlo).wait()
                    kcopy_obj(oc, s, jlo).wait()

                for g in range(G):
                    r0 = o0 + g * OH
                    # hoisted column broadcasts (lane broadcasts are
                    # expensive; pay once per own group, not per tile)
                    own_cols = [
                        jnp.broadcast_to(own_ref[r0 : r0 + OH, a : a + 1],
                                         (OH, CHUNK))
                        for a in range(D)
                    ]
                    own_k = jnp.broadcast_to(okey_ref[r0 : r0 + OH, 0:1],
                                             (OH, CHUNK))
                    gtoff = gb_ref[oc, (g * S + s) * 2]
                    gjnum = gb_ref[oc, (g * S + s) * 2 + 1]

                    def tile(t, _, s=s, g=g, w0=w0, jlo=jlo, lo_s=lo_s,
                             hi_s=hi_s, own_cols=own_cols, own_k=own_k,
                             oc=oc):
                        jc = jbuf[w0 + t]  # (D, 128)
                        jk = kbuf[w0 + t]  # (1, 128)

                        # the key band IS the half-space + cell-adjacency
                        # test: disjoint bands count each pair once
                        diff = own_k - jk  # (OH, 128) int32
                        m = (diff >= lo_s) & (diff <= hi_s)
                        if distributed:
                            m = m & owned_g[g]
                        if s == 0:
                            # the [0,1] band includes same-cell pairs:
                            # strict slot order keeps each unordered pair
                            # exactly once (larger slot owns the pair)
                            jcg = jlo + t
                            ocg = p * CB + oc
                            m = m & (tri_g[g] | (jcg < ocg))

                        dsq = jnp.zeros((OH, CHUNK), dtype)
                        for a in range(ncoord):
                            d = own_cols[a] - jc[a : a + 1, :]
                            if split:
                                d = d + (own_cols[a + ncoord]
                                         - jc[a + ncoord : a + ncoord + 1, :])
                            dsq = dsq + d * d
                        m = m & (dsq < csq)
                        v = jnp.where(m,
                                      term(jnp.where(m, dsq, jnp.ones_like(dsq))),
                                      jnp.zeros((OH, CHUNK), dtype)).astype(out_dtype)
                        ab = acc_s[g * OH : (g + 1) * OH, :]
                        if kahan:
                            cb_ = comp_s[g * OH : (g + 1) * OH, :]
                            y = v - cb_
                            tt = ab + y
                            comp_s[g * OH : (g + 1) * OH, :] = (tt - ab) - y
                            acc_s[g * OH : (g + 1) * OH, :] = tt
                        else:
                            acc_s[g * OH : (g + 1) * OH, :] = ab + v
                        return 0

                    jax.lax.fori_loop(gtoff, gtoff + gjnum, tile, 0)

        if kahan:
            prev = out_ref[...]
            y = (acc_s[...] - comp_s[...]) - comp_ref[...]
            tt = prev + y
            comp_ref[...] = (tt - prev) - y
            out_ref[...] = tt

            @pl.when(p == num_p - 1)
            def _():
                out_ref[...] = out_ref[...] - comp_ref[...]

        else:
            out_ref[...] += acc_s[...]

    return kernel


RB = 8  # rows per chunk in the packed block layout (sublane tile height)


def _norm_maxj(MAXJ, S: int, nc_pad: int) -> tuple:
    """Normalize a MAXJ capacity spec to a length-S tuple of per-band
    window sizes, each clamped to the array's chunk count (a window wider
    than the whole array would DMA past the j buffer)."""
    if isinstance(MAXJ, int):
        MAXJ = (MAXJ,) * S
    MAXJ = tuple(int(m) for m in MAXJ)
    if len(MAXJ) != S:
        raise ValueError(
            f"per-band MAXJ needs {S} entries (one per stencil band), "
            f"got {len(MAXJ)}"
        )
    if any(m < 1 for m in MAXJ):
        raise ValueError(f"MAXJ entries must be >= 1, got {MAXJ}")
    return tuple(min(m, nc_pad) for m in MAXJ)


def _make_tile_kernel_packed(CB: int, S: int, MAXJ: tuple, D: int,
                             term: Callable, dtype, out_dtype, split: bool,
                             kahan, distributed: bool,
                             n_payload: int = 0, bandmask: bool = True,
                             safe_term: bool = True):
    """Packed-layout variant of `_make_tile_kernel`: each j chunk is ONE
    8-row f32 block [coords (D rows), key-as-f32, zero padding] in a flat
    (nc*8, 128) array, so a tile is one aligned dynamic sublane slice
    ``jbuf[pl.ds((w0+t)*8, 8)]`` and one DMA per window moves coordinates
    and keys together. Motivation (measured): the (nc, D, 128) dynamic
    leading-dim load costs ~200 extra cycles per tile — about 40% of
    kernel time at OH=128. Keys are exact in f32 below 2^24 (the wrapper's
    coverage flag enforces the bound); padding coordinate rows carry huge
    spread values so any padding pair fails the cutoff regardless of its
    (rounded) f32 key.

    ``MAXJ`` is a length-S tuple of per-band DMA window capacities: the
    bands' true window widths differ ~6x at reference density (own row
    ~2 chunks, z-layer rows ~row population), so per-band capacities cut
    DMA bytes vs the shared worst-case capacity.

    ``bandmask=False`` drops the key-band compare from the tile body
    (and the own-key lane broadcast from the chunk hoist): with cell
    edge == cutoff, any pair in non-stencil cells is >= cutoff apart, so
    the distance filter alone is exact PROVIDED the executed windows are
    pairwise disjoint (`segments.windows_disjoint` — the wrapper folds
    it into coverage_ok). ~20% fewer ops per lane at reference density.

    ``kahan``: True = per-tile compensated accumulation (tightest),
    "program" = plain adds in tiles + compensated cross-program folding
    (a lane sees only ~1 nonzero addend per chunk, so the extra error is
    ~eps per chunk partial — a few e-7 relative at n=1e7), False = plain
    everywhere. ``safe_term=False`` skips the inner masked-dsq guard
    (safe for terms whose value at dsq == 0 or huge dsq is finite-or-
    selected-out, e.g. LJ under the outer where)."""
    tile_kahan = (kahan is True) and jnp.issubdtype(out_dtype, jnp.floating)
    prog_kahan = (
        kahan in (True, "program")
        and jnp.issubdtype(out_dtype, jnp.floating)
    )
    kahan = tile_kahan
    ncoord = D // 2 if split else D
    TJ = sum(MAXJ)  # total window chunks per own chunk
    MOFF = tuple(sum(MAXJ[:s]) for s in range(S))  # band offsets in jbuf

    def kernel(bands_ref, csq_ref, mislot_ref, bounds_ref, own8_ref,
               jarr_ref, out_ref, comp_ref, acc_s, comp_s, jbuf,
               sems):
        p = pl.program_id(0)
        num_p = pl.num_programs(0)
        csq = csq_ref[0]
        min_islot = mislot_ref[0]

        @pl.when(p == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)
            comp_ref[...] = jnp.zeros_like(comp_ref)

        acc_s[...] = jnp.zeros_like(acc_s)
        if kahan:
            comp_s[...] = jnp.zeros_like(comp_s)

        def window(oc, s):
            return (bounds_ref[oc, 3 * s], bounds_ref[oc, 3 * s + 1],
                    bounds_ref[oc, 3 * s + 2])

        def copy_obj(oc, s, jlo):
            return pltpu.make_async_copy(
                jarr_ref.at[pl.ds(jlo * RB, MAXJ[s] * RB), :],
                jbuf.at[pl.ds((oc * TJ + MOFF[s]) * RB, MAXJ[s] * RB), :],
                sems.at[oc * S + s],
            )

        for oc in range(CB):
            for s in range(S):
                jlo, _, jnum = window(oc, s)

                @pl.when(jnum > 0)
                def _(oc=oc, s=s, jlo=jlo):
                    copy_obj(oc, s, jlo).start()

        row_i = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
        lane_j = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
        tri = row_i > lane_j

        for oc in range(CB):
            o0 = oc * CHUNK
            # own side comes from the same packed blocks as the j side:
            # one (8,128)->(128,8) transpose per chunk (a (C, D) pallas
            # operand would be lane-padded 3->128, 42x HBM). The column
            # broadcasts are hoisted here: a (128,1)->(128,128) lane
            # broadcast costs ~200 cycles, so pay it once per own chunk
            # (the ~11 tiles sharing it read cheap row ops)
            blkT = jnp.transpose(own8_ref[oc * RB : (oc + 1) * RB, :])
            own_cols = [
                jnp.broadcast_to(blkT[:, a : a + 1], (CHUNK, CHUNK))
                for a in range(D)
            ]
            own_k = (
                jnp.broadcast_to(blkT[:, D : D + 1], (CHUNK, CHUNK))
                if bandmask else None
            )  # f32 keys; maskless mode never reads them
            if n_payload:
                # payload row D+1; the own-side column broadcast is
                # hoisted with the others (per chunk, not per tile)
                own_w = jnp.broadcast_to(blkT[:, D + 1 : D + 2],
                                         (CHUNK, CHUNK))
            if distributed:
                gslot0 = (p * CB + oc) * CHUNK
                owned = (row_i[:, 0:1] + gslot0) >= min_islot

            for s in range(S):
                jlo, _, jnum = window(oc, s)
                lo_s = bands_ref[s, 0]  # f32 band bounds
                hi_s = bands_ref[s, 1]
                w0 = oc * TJ + MOFF[s]

                @pl.when(jnum > 0)
                def _(oc=oc, s=s, jlo=jlo):
                    copy_obj(oc, s, jlo).wait()

                gtoff = bounds_ref[oc, 3 * s + 1]
                gjnum = bounds_ref[oc, 3 * s + 2]

                def tile(t, _, s=s, w0=w0, jlo=jlo, lo_s=lo_s, hi_s=hi_s,
                         own_cols=own_cols, own_k=own_k, oc=oc,
                         own_w=own_w if n_payload else None, blkT=blkT):
                    blk = jbuf[pl.ds((w0 + t) * RB, RB), :]  # (8, 128)

                    dsq = jnp.zeros((CHUNK, CHUNK), dtype)
                    for a in range(ncoord):
                        d = own_cols[a] - blk[a : a + 1, :]
                        if split:
                            d = d + (own_cols[a + ncoord]
                                     - blk[a + ncoord : a + ncoord + 1, :])
                        dsq = dsq + d * d
                    m = dsq < csq
                    if bandmask:
                        # the key band IS the half-space + cell-adjacency
                        # test (f32 diffs of <2^24 int keys are exact);
                        # maskless mode relies on window disjointness +
                        # cell edge == cutoff (non-stencil cells fail the
                        # distance test)
                        jk = blk[D : D + 1, :]
                        diff = own_k - jk  # (128, 128) f32
                        m = m & (diff >= lo_s) & (diff <= hi_s)
                    if distributed:
                        m = m & owned
                    if s == 0:
                        jcg = jlo + t
                        ocg = p * CB + oc
                        m = m & (tri | (jcg < ocg))

                    safe = (
                        jnp.where(m, dsq, jnp.ones_like(dsq))
                        if safe_term else dsq
                    )
                    if n_payload:
                        tv = term(safe, own_w, blk[D + 1 : D + 2, :])
                    else:
                        tv = term(safe)
                    v = jnp.where(
                        m, tv, jnp.zeros((CHUNK, CHUNK), dtype)
                    ).astype(out_dtype)
                    if kahan:
                        acc, comp = acc_s[...], comp_s[...]
                        y = v - comp
                        tt = acc + y
                        comp_s[...] = (tt - acc) - y
                        acc_s[...] = tt
                    else:
                        acc_s[...] += v
                    return 0

                jax.lax.fori_loop(gtoff, gtoff + gjnum, tile, 0)

        if prog_kahan:
            contrib = (acc_s[...] - comp_s[...]) if kahan else acc_s[...]
            prev = out_ref[...]
            y = contrib - comp_ref[...]
            tt = prev + y
            comp_ref[...] = (tt - prev) - y
            out_ref[...] = tt

            @pl.when(p == num_p - 1)
            def _():
                out_ref[...] = out_ref[...] - comp_ref[...]

        else:
            out_ref[...] += acc_s[...]

    return kernel


def _make_tile_hist_kernel_packed(CB: int, S: int, MAXJ: tuple, D: int,
                                  K: int, dtype, split: bool,
                                  distributed: bool, n_payload: int,
                                  pair_mask, bandmask: bool = True):
    """Packed-layout histogram kernel: per tile, the masked candidate
    matrix is classified against K ascending squared-distance edges and
    counted CUMULATIVELY into K per-bin (128, 128) int32 planes living
    directly in the revisited VMEM output (rows [k*CHUNK, (k+1)*CHUNK)).
    Same windows/masking as `_make_tile_kernel_packed` — the tile sibling
    of `pallas_pairs._make_hist_kernel` for cubic/wide boxes. Cost is
    linear in K (one compare + one accumulate per bin per tile).

    ``pair_mask(own_payload, j_payload) -> bool`` masks candidates from
    the packed payload row (PBC shift-sign dedup). ``bandmask=False``
    drops the key-band compare (and the own-key lane broadcast) exactly
    as in `_make_tile_kernel_packed`: with cell edge == the outermost
    edge (the effective cutoff) and pairwise-disjoint executed windows
    (`segments.trim_windows_disjoint`), the distance classification
    alone is exact.

    Accumulation (round 13): per tile, 4 bins pack into 8-bit fields of
    one int32 plane (``jnp.where(ind, 1 << 8j, 0)`` adds), so a tile
    performs ceil(K/4) fused accumulator RMWs instead of K — the K
    separate (128,128) plane RMWs were the dominant cost of the round-8
    body (~4x the accumulator traffic of an energy tile at K=32). The
    packed planes flush into the full-width output once per own chunk;
    per-(lane, bin) counts within a chunk are bounded by the tile count
    sum(MAXJ), which the wrapper guards <= 255 (8-bit field capacity)."""
    TJ = sum(MAXJ)
    MOFF = tuple(sum(MAXJ[:s]) for s in range(S))
    ncoord = D // 2 if split else D
    Kp = (K + 3) // 4  # packed accumulator planes (4 bins x 8-bit fields)
    assert TJ <= 255, "packed hist accumulation needs sum(MAXJ) <= 255"

    def kernel(bands_ref, edges_ref, mislot_ref, bounds_ref, own8_ref,
               jarr_ref, out_ref, pacc, jbuf, sems):
        p = pl.program_id(0)
        csq = edges_ref[K - 1]
        min_islot = mislot_ref[0]

        @pl.when(p == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)

        def window(oc, s):
            return (bounds_ref[oc, 3 * s], bounds_ref[oc, 3 * s + 1],
                    bounds_ref[oc, 3 * s + 2])

        def copy_obj(oc, s, jlo):
            return pltpu.make_async_copy(
                jarr_ref.at[pl.ds(jlo * RB, MAXJ[s] * RB), :],
                jbuf.at[pl.ds((oc * TJ + MOFF[s]) * RB, MAXJ[s] * RB), :],
                sems.at[oc * S + s],
            )

        for oc in range(CB):
            for s in range(S):
                jlo, _, jnum = window(oc, s)

                @pl.when(jnum > 0)
                def _(oc=oc, s=s, jlo=jlo):
                    copy_obj(oc, s, jlo).start()

        row_i = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
        lane_j = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
        tri = row_i > lane_j
        big = jnp.asarray(jnp.finfo(dtype).max, dtype)

        for oc in range(CB):
            blkT = jnp.transpose(own8_ref[oc * RB : (oc + 1) * RB, :])
            own_cols = [
                jnp.broadcast_to(blkT[:, a : a + 1], (CHUNK, CHUNK))
                for a in range(D)
            ]
            own_k = (
                jnp.broadcast_to(blkT[:, D : D + 1], (CHUNK, CHUNK))
                if bandmask else None
            )
            if n_payload:
                own_w = jnp.broadcast_to(blkT[:, D + 1 : D + 2],
                                         (CHUNK, CHUNK))
            if distributed:
                gslot0 = (p * CB + oc) * CHUNK
                owned = (row_i[:, 0:1] + gslot0) >= min_islot

            pacc[...] = jnp.zeros_like(pacc)

            for s in range(S):
                jlo, _, jnum = window(oc, s)
                lo_s = bands_ref[s, 0]
                hi_s = bands_ref[s, 1]
                w0 = oc * TJ + MOFF[s]

                @pl.when(jnum > 0)
                def _(oc=oc, s=s, jlo=jlo):
                    copy_obj(oc, s, jlo).wait()

                gtoff = bounds_ref[oc, 3 * s + 1]
                gjnum = bounds_ref[oc, 3 * s + 2]

                def tile(t, _, s=s, w0=w0, jlo=jlo, lo_s=lo_s, hi_s=hi_s,
                         own_cols=own_cols, own_k=own_k, oc=oc,
                         own_w=own_w if n_payload else None):
                    blk = jbuf[pl.ds((w0 + t) * RB, RB), :]  # (8, 128)
                    dsq = jnp.zeros((CHUNK, CHUNK), dtype)
                    for a in range(ncoord):
                        d = own_cols[a] - blk[a : a + 1, :]
                        if split:
                            d = d + (own_cols[a + ncoord]
                                     - blk[a + ncoord : a + ncoord + 1, :])
                        dsq = dsq + d * d
                    m = dsq < csq
                    if bandmask:
                        jk = blk[D : D + 1, :]
                        diff = own_k - jk
                        m = m & (diff >= lo_s) & (diff <= hi_s)
                    if distributed:
                        m = m & owned
                    if s == 0:
                        jcg = jlo + t
                        ocg = p * CB + oc
                        m = m & (tri | (jcg < ocg))
                    if n_payload:
                        m = m & pair_mask(own_w, blk[D + 1 : D + 2, :])
                    safe = jnp.where(m, dsq, big)
                    packs = []
                    for kp in range(Kp):
                        v = None
                        for j in range(4):
                            k = kp * 4 + j
                            if k >= K:
                                break
                            c = jnp.where(safe < edges_ref[k],
                                          jnp.int32(1 << (8 * j)),
                                          jnp.int32(0))
                            v = c if v is None else v + c
                        packs.append(v)
                    pacc[...] += jnp.concatenate(packs, axis=1)
                    return 0

                jax.lax.fori_loop(gtoff, gtoff + gjnum, tile, 0)

            # flush the packed per-chunk counts into the K output planes
            # (logical shift: the j=3 field legitimately reaches bit 31)
            for kp in range(Kp):
                vp = pacc[:, kp * CHUNK : (kp + 1) * CHUNK]
                for j in range(4):
                    k = kp * 4 + j
                    if k >= K:
                        break
                    f = vp if j == 0 else jax.lax.shift_right_logical(
                        vp, jnp.int32(8 * j))
                    out_ref[k * CHUNK : (k + 1) * CHUNK] += f & 0xFF

    return kernel


def _packed_hist_core(planes, sorted_keys, strides, edges_sq, *, CB, MAXJ,
                      interpret, split, payload=None, pair_mask=None,
                      min_islot=0, distributed=False, bandmask=False):
    """Packed histogram pipeline (see `_packed_core`): returns
    ((2, K) int32 hi/lo cumulative count planes, coverage_ok)."""
    n = planes[0].shape[0]
    dtype = planes[0].dtype
    D = len(planes)
    dim = D // 2 if split else D
    S = num_segments(dim)
    K = edges_sq.shape[0]
    assert K <= 64, "tile histogram: K > 64 exceeds the VMEM budget"
    if CB % 8 and not interpret:
        raise ValueError("CB must be a multiple of 8 (SMEM sublane blocking)")

    nc_pad = max(-(-n // (CHUNK * CB)) * CB, CB)
    MAXJ = _norm_maxj(MAXJ, S, nc_pad)
    if sum(MAXJ) > 255:
        raise ValueError(
            "tile histogram: sum(MAXJ) > 255 exceeds the 8-bit packed "
            "accumulator field capacity — use smaller per-band capacities"
        )
    C = nc_pad * CHUNK
    keys_p = _pad_and_desentinel(sorted_keys, C)

    csq = edges_sq[K - 1]
    bands = segment_bands(strides)
    jlo, toff, jnum, cov_ok = chunk_bounds(keys_p, bands, MAXJ)
    if not bandmask:
        from .segments import trim_windows_disjoint, windows_disjoint

        order = tuple(range(S))
        toff, jnum = trim_windows_disjoint(jlo, toff, jnum, order)
        cov_ok = cov_ok & windows_disjoint(jlo, toff, jnum)
    bounds = jnp.stack([jlo, toff, jnum], axis=-1).reshape(nc_pad, 3 * S)

    jarr8 = _pack_blocks(planes, keys_p, csq, n, C, dtype, payload=payload)
    if dtype == jnp.float32:
        cov_ok = _key_exact_f32(keys_p, cov_ok)

    kernel = _make_tile_hist_kernel_packed(
        CB, S, MAXJ, D, K, dtype, split, distributed,
        0 if payload is None else 1, pair_mask, bandmask=bandmask,
    )
    out = pl.pallas_call(
        kernel,
        grid=(nc_pad // CB,),
        in_specs=[
            pl.BlockSpec((S, 2), lambda p: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((K,), lambda p: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda p: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((CB, 3 * S), lambda p: (p, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((CB * RB, CHUNK), lambda p: (p, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((K * CHUNK, CHUNK), lambda p: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K * CHUNK, CHUNK), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((CHUNK, ((K + 3) // 4) * CHUNK), jnp.int32),
            pltpu.VMEM((CB * sum(MAXJ) * RB, CHUNK), dtype),
            pltpu.SemaphoreType.DMA((CB * S,)),
        ],
        interpret=interpret,
    )(
        bands.astype(dtype),
        jnp.asarray(edges_sq, dtype).reshape(K),
        jnp.asarray(min_islot, jnp.int32).reshape(1),
        bounds,
        jarr8,
        jarr8,
    )
    per_bin = out.reshape(K, CHUNK, CHUNK)
    lo = jnp.sum(per_bin & 0xFFFF, axis=(1, 2))
    hi = jnp.sum(per_bin >> 16, axis=(1, 2))
    return jnp.stack([hi, lo]), cov_ok


def tile_pair_hist(
    sorted_pos: jax.Array,
    sorted_keys: jax.Array,
    strides: jax.Array,
    edges_sq: jax.Array,
    sorted_pos_lo: jax.Array | None = None,
    sorted_payload: jax.Array | None = None,
    *,
    CB: int = 8,
    MAXJ: int | tuple = 8,
    interpret: bool = False,
    min_islot=0,
    pair_mask=None,
    bandmask: bool = False,
):
    """Cumulative pair-distance histogram over unique cutoff pairs, any
    box shape (the tile sibling of `pallas_pairs.pair_lag_hist`; the
    effective cutoff is ``sqrt(edges_sq[-1])``, which the binning grid
    must have used). Returns ((2, K) int32 hi/lo planes — see
    `combine_count_vec` — , coverage_ok). K <= 64 (VMEM); cost is linear
    in K. ``sorted_payload`` + ``pair_mask`` mask candidate pairs (PBC
    image dedup); ``min_islot`` is the distributed ownership rule.
    ``bandmask=False`` (default, round 13) runs the maskless tile body
    over disjoint-trimmed windows (see `tile_pair_reduce`); small/dense
    grids that trip the disjointness flag must rerun with
    ``bandmask=True``."""
    n, dim = sorted_pos.shape
    split = sorted_pos_lo is not None
    assert (sorted_payload is None) == (pair_mask is None), (
        "pair_mask and sorted_payload go together"
    )
    planes = [sorted_pos[:, a] for a in range(dim)]
    if split:
        planes += [sorted_pos_lo[:, a] for a in range(dim)]
    payload = None
    if sorted_payload is not None:
        payload = sorted_payload.reshape(n)
    distributed = not (isinstance(min_islot, int) and min_islot == 0)
    return _packed_hist_core(
        planes, sorted_keys, strides, jnp.asarray(edges_sq), CB=CB,
        MAXJ=MAXJ, interpret=interpret, split=split, payload=payload,
        pair_mask=pair_mask, min_islot=min_islot, distributed=distributed,
        bandmask=bandmask,
    )


def _make_tile_stress_kernel_packed(CB: int, S: int, MAXJ: tuple, D: int,
                                    gfn: Callable, dtype, split: bool,
                                    distributed: bool, n_payload: int,
                                    pair_mask, bandmask: bool = True,
                                    safe_term: bool = True,
                                    pair_weight=None):
    """Packed-layout stress kernel: per tile, the ncomp upper-triangle
    components of sigma_ab = sum_pairs gfn(dsq) d_a d_b accumulate into
    ONE fused (128, ncomp*128) plane RMW (round 13 — the per-component
    sliced Kahan RMWs were ~24 plane ops per tile; the fused plain add
    is 2, with the compensation moved to the cross-program fold exactly
    like ``kahan="program"`` in `_make_tile_kernel_packed`: a lane sees
    ~1 nonzero addend per chunk, so the extra error is ~eps per chunk
    partial). Direct pair terms are bounded by |gfn|*cutoff^2, so there
    is no box-scale cancellation (see `pallas_pairs._make_stress_kernel`).
    Half bands: each unique pair contributes once.
    ``pair_mask(own_payload, j_payload)`` composes the PBC shift-sign
    dedup, making PBC stress a single pass. ``bandmask=False`` /
    ``safe_term=False`` follow `_make_tile_kernel_packed` (maskless
    body over disjoint-trimmed windows; the outer where discards the
    inf/NaN gfn values of unselected lanes)."""
    TJ = sum(MAXJ)
    MOFF = tuple(sum(MAXJ[:s]) for s in range(S))
    ncoord = D // 2 if split else D
    comps = [(a, b) for a in range(ncoord) for b in range(a, ncoord)]
    ncomp = len(comps)

    def kernel(bands_ref, csq_ref, mislot_ref, bounds_ref, own8_ref,
               jarr_ref, out_ref, comp_ref, acc_s, jbuf, sems):
        p = pl.program_id(0)
        num_p = pl.num_programs(0)
        csq = csq_ref[0]
        min_islot = mislot_ref[0]

        @pl.when(p == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)
            comp_ref[...] = jnp.zeros_like(comp_ref)

        acc_s[...] = jnp.zeros_like(acc_s)

        def window(oc, s):
            return (bounds_ref[oc, 3 * s], bounds_ref[oc, 3 * s + 1],
                    bounds_ref[oc, 3 * s + 2])

        def copy_obj(oc, s, jlo):
            return pltpu.make_async_copy(
                jarr_ref.at[pl.ds(jlo * RB, MAXJ[s] * RB), :],
                jbuf.at[pl.ds((oc * TJ + MOFF[s]) * RB, MAXJ[s] * RB), :],
                sems.at[oc * S + s],
            )

        for oc in range(CB):
            for s in range(S):
                jlo, _, jnum = window(oc, s)

                @pl.when(jnum > 0)
                def _(oc=oc, s=s, jlo=jlo):
                    copy_obj(oc, s, jlo).start()

        row_i = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
        lane_j = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
        tri = row_i > lane_j

        for oc in range(CB):
            blkT = jnp.transpose(own8_ref[oc * RB : (oc + 1) * RB, :])
            own_cols = [
                jnp.broadcast_to(blkT[:, a : a + 1], (CHUNK, CHUNK))
                for a in range(D)
            ]
            own_k = (
                jnp.broadcast_to(blkT[:, D : D + 1], (CHUNK, CHUNK))
                if bandmask else None
            )
            if n_payload:
                own_w = jnp.broadcast_to(blkT[:, D + 1 : D + 2],
                                         (CHUNK, CHUNK))
            if distributed:
                gslot0 = (p * CB + oc) * CHUNK
                owned = (row_i[:, 0:1] + gslot0) >= min_islot

            for s in range(S):
                jlo, _, jnum = window(oc, s)
                lo_s = bands_ref[s, 0]
                hi_s = bands_ref[s, 1]
                w0 = oc * TJ + MOFF[s]

                @pl.when(jnum > 0)
                def _(oc=oc, s=s, jlo=jlo):
                    copy_obj(oc, s, jlo).wait()

                gtoff = bounds_ref[oc, 3 * s + 1]
                gjnum = bounds_ref[oc, 3 * s + 2]

                def tile(t, _, s=s, w0=w0, jlo=jlo, lo_s=lo_s, hi_s=hi_s,
                         own_cols=own_cols, own_k=own_k, oc=oc,
                         own_w=own_w if n_payload else None):
                    blk = jbuf[pl.ds((w0 + t) * RB, RB), :]  # (8, 128)
                    d = []
                    dsq = jnp.zeros((CHUNK, CHUNK), dtype)
                    for a in range(ncoord):
                        da = own_cols[a] - blk[a : a + 1, :]
                        if split:
                            da = da + (own_cols[a + ncoord]
                                       - blk[a + ncoord : a + ncoord + 1, :])
                        d.append(da)
                        dsq = dsq + da * da
                    # dsq > 0 excludes self/coincident pairs: gfn(0) =
                    # inf (LJ) and inf * 0 = NaN would poison every
                    # component (forces-kernel semantics)
                    m = (dsq < csq) & (dsq > 0)
                    if bandmask:
                        jk = blk[D : D + 1, :]
                        diff = own_k - jk
                        m = m & (diff >= lo_s) & (diff <= hi_s)
                    if distributed:
                        m = m & owned
                    if s == 0:
                        jcg = jlo + t
                        ocg = p * CB + oc
                        m = m & (tri | (jcg < ocg))
                    if n_payload and pair_mask is not None:
                        m = m & pair_mask(own_w, blk[D + 1 : D + 2, :])
                    g = jnp.where(
                        m,
                        gfn(jnp.where(m, dsq, jnp.ones_like(dsq))
                            if safe_term else dsq),
                        jnp.zeros((CHUNK, CHUNK), dtype),
                    )
                    if n_payload and pair_weight is not None:
                        # MULTIPLICATIVE ownership weight (the d (x) d
                        # outer product cannot absorb a term-weighting;
                        # see parallel.pbc.sharded_pbc_stress)
                        g = g * pair_weight(own_w, blk[D + 1 : D + 2, :])
                    acc_s[...] += jnp.concatenate(
                        [(g * d[a]) * d[b] for (a, b) in comps], axis=1)
                    return 0

                jax.lax.fori_loop(gtoff, gtoff + gjnum, tile, 0)

        # compensated cross-program fold (kahan="program" semantics)
        prev = out_ref[...]
        y = acc_s[...] - comp_ref[...]
        tt = prev + y
        comp_ref[...] = (tt - prev) - y
        out_ref[...] = tt

        @pl.when(p == num_p - 1)
        def _():
            out_ref[...] = out_ref[...] - comp_ref[...]

    return kernel


def _packed_stress_core(planes, sorted_keys, strides, cutoff_sq, *, CB,
                        MAXJ, gfn, interpret, split, payload=None,
                        pair_mask=None, min_islot=0, distributed=False,
                        bandmask=False, safe_term=True, pair_weight=None):
    """Packed stress pipeline (see `_packed_core`): returns
    ((dim, dim) symmetric stress tensor, coverage_ok)."""
    n = planes[0].shape[0]
    dtype = planes[0].dtype
    D = len(planes)
    dim = D // 2 if split else D
    S = num_segments(dim)
    ncomp = dim * (dim + 1) // 2
    if CB % 8 and not interpret:
        raise ValueError("CB must be a multiple of 8 (SMEM sublane blocking)")

    nc_pad = max(-(-n // (CHUNK * CB)) * CB, CB)
    MAXJ = _norm_maxj(MAXJ, S, nc_pad)
    C = nc_pad * CHUNK
    keys_p = _pad_and_desentinel(sorted_keys, C)

    bands = segment_bands(strides)
    jlo, toff, jnum, cov_ok = chunk_bounds(keys_p, bands, MAXJ)
    if not bandmask:
        from .segments import trim_windows_disjoint, windows_disjoint

        order = tuple(range(S))
        toff, jnum = trim_windows_disjoint(jlo, toff, jnum, order)
        cov_ok = cov_ok & windows_disjoint(jlo, toff, jnum)
    bounds = jnp.stack([jlo, toff, jnum], axis=-1).reshape(nc_pad, 3 * S)

    jarr8 = _pack_blocks(planes, keys_p, cutoff_sq, n, C, dtype,
                         payload=payload)
    if dtype == jnp.float32:
        cov_ok = _key_exact_f32(keys_p, cov_ok)

    kernel = _make_tile_stress_kernel_packed(
        CB, S, MAXJ, D, gfn, dtype, split, distributed,
        0 if payload is None else 1, pair_mask, bandmask=bandmask,
        safe_term=safe_term, pair_weight=pair_weight,
    )
    out = pl.pallas_call(
        kernel,
        grid=(nc_pad // CB,),
        in_specs=[
            pl.BlockSpec((S, 2), lambda p: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda p: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda p: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((CB, 3 * S), lambda p: (p, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((CB * RB, CHUNK), lambda p: (p, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((CHUNK, ncomp * CHUNK), lambda p: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((CHUNK, ncomp * CHUNK), dtype),
        scratch_shapes=[
            pltpu.VMEM((CHUNK, ncomp * CHUNK), dtype),
            pltpu.VMEM((CHUNK, ncomp * CHUNK), dtype),
            pltpu.VMEM((CB * sum(MAXJ) * RB, CHUNK), dtype),
            pltpu.SemaphoreType.DMA((CB * S,)),
        ],
        interpret=interpret,
    )(
        bands.astype(dtype),
        jnp.asarray(cutoff_sq, dtype).reshape(1),
        jnp.asarray(min_islot, jnp.int32).reshape(1),
        bounds,
        jarr8,
        jarr8,
    )
    sums = jnp.sum(out.reshape(CHUNK, ncomp, CHUNK), axis=(0, 2))
    sig = jnp.zeros((dim, dim), dtype)
    k = 0
    for a in range(dim):
        for b in range(a, dim):
            sig = sig.at[a, b].set(sums[k])
            if b != a:
                sig = sig.at[b, a].set(sums[k])
            k += 1
    return sig, cov_ok


def tile_pair_stress(
    sorted_pos: jax.Array,
    sorted_keys: jax.Array,
    strides: jax.Array,
    cutoff_sq,
    sorted_pos_lo: jax.Array | None = None,
    sorted_payload: jax.Array | None = None,
    *,
    gfn: Callable | None = None,
    CB: int = 8,
    MAXJ: int | tuple = 8,
    interpret: bool = False,
    min_islot=0,
    pair_mask=None,
    bandmask: bool = False,
    safe_term: bool = True,
    pair_weight=None,
):
    """Configurational stress tensor over unique cutoff pairs as a direct
    fused pair sum, any box shape (the tile sibling of
    `pallas_pairs.pair_lag_stress`). Returns ((dim, dim), coverage_ok).
    ``sorted_payload`` + ``pair_mask`` mask candidate pairs (PBC image
    dedup); ``pair_weight(w_i, w_j)`` scales each pair's g
    MULTIPLICATIVELY (the pencil/slab 0.5*(o_i+o_j) ownership rule —
    term-weighting cannot absorb the d (x) d outer product);
    ``min_islot`` is the distributed ownership rule.
    ``bandmask=False`` (default, round 13) runs the maskless tile body
    over disjoint-trimmed windows; ``safe_term=False`` skips the inner
    masked-dsq guard (see `tile_pair_reduce`). The reference folds such
    sums in user iterator closures
    (`/root/reference/src/cellgrid.rs:338-340`)."""
    from .lj import lj_force_factor

    n, dim = sorted_pos.shape
    split = sorted_pos_lo is not None
    assert (sorted_payload is None) == (
        pair_mask is None and pair_weight is None
    ), "pair_mask/pair_weight and sorted_payload go together"
    planes = [sorted_pos[:, a] for a in range(dim)]
    if split:
        planes += [sorted_pos_lo[:, a] for a in range(dim)]
    payload = None
    if sorted_payload is not None:
        payload = sorted_payload.reshape(n)
    distributed = not (isinstance(min_islot, int) and min_islot == 0)
    return _packed_stress_core(
        planes, sorted_keys, strides, cutoff_sq, CB=CB, MAXJ=MAXJ,
        gfn=gfn or lj_force_factor, interpret=interpret, split=split,
        payload=payload, pair_mask=pair_mask, min_islot=min_islot,
        distributed=distributed, bandmask=bandmask, safe_term=safe_term,
        pair_weight=pair_weight,
    )


def _make_tile_forces_kernel_packed(CB: int, S: int, MAXJ: tuple, D: int,
                                    gfn: Callable, dtype, split: bool,
                                    bandmask: bool = True,
                                    safe_term: bool = True):
    """Packed-layout forces kernel: full (mirrored) bands, i-side
    accumulation, own-side broadcasts hoisted per chunk, 8-row j blocks
    (see `_make_tile_kernel_packed`). Tiles accumulate g*d into full
    (128,128) per-coordinate matrices; the per-partner row sums ride the
    MXU once per chunk ((128,128)x(128,1) ones-contraction per
    coordinate), not per tile.

    A "fast_form" variant — refactoring ``f_i = sum_j g*(own-j)`` into
    ``own * sum_j g - sum_j g*j`` so ONE ``g @ jblock`` contraction per
    tile replaces the three elementwise g*d products and skinny matmuls —
    was tried and REMOVED: Mosaic's default f32 matmul runs one bf16
    pass, which rounds the coordinate operand and amplifies through the
    O(|coord|)-term cancellation to ~0.5 relative force error (measured
    on hardware; interpret mode computes full f32 and cannot see it).
    ``Precision.HIGH`` is unimplemented in Mosaic, and ``HIGHEST``
    (6 bf16 passes, ~46 ms each at n=1e7) costs more than the elementwise
    work it saves (679 ms vs 575 ms per cubic MD step). Contractions with
    a ones vector (as used below) are precision-safe: the products are
    formed on the VPU in f32 and the MXU only sums.

    ``MAXJ`` is a length-S tuple of per-band DMA window capacities (see
    `_make_tile_kernel_packed`)."""
    ncoord = D // 2 if split else D
    TJ = sum(MAXJ)
    MOFF = tuple(sum(MAXJ[:s]) for s in range(S))

    def kernel(bands_ref, csq_ref, bounds_ref, own8_ref, jarr_ref,
               fout_ref, facc, macc, jbuf, sems):
        csq = csq_ref[0]
        facc[...] = jnp.zeros_like(facc)

        def window(oc, s):
            return (bounds_ref[oc, 3 * s], bounds_ref[oc, 3 * s + 1],
                    bounds_ref[oc, 3 * s + 2])

        def copy_obj(oc, s, jlo):
            return pltpu.make_async_copy(
                jarr_ref.at[pl.ds(jlo * RB, MAXJ[s] * RB), :],
                jbuf.at[pl.ds((oc * TJ + MOFF[s]) * RB, MAXJ[s] * RB), :],
                sems.at[oc * S + s],
            )

        for oc in range(CB):
            for s in range(S):
                jlo, _, jnum = window(oc, s)

                @pl.when(jnum > 0)
                def _(oc=oc, s=s, jlo=jlo):
                    copy_obj(oc, s, jlo).start()

        ones_row = jnp.ones((1, CHUNK), dtype)

        for oc in range(CB):
            o0 = oc * CHUNK
            # own side from the packed blocks: one transpose per chunk
            # (see _make_tile_kernel_packed), broadcasts hoisted
            blkT = jnp.transpose(own8_ref[oc * RB : (oc + 1) * RB, :])
            own_cols = [
                jnp.broadcast_to(blkT[:, a : a + 1], (CHUNK, CHUNK))
                for a in range(D)
            ]
            own_k = (
                jnp.broadcast_to(blkT[:, D : D + 1], (CHUNK, CHUNK))
                if bandmask else None
            )

            # per-tile row reductions are DEFERRED: tiles accumulate the
            # full (128,128) g*d matrices elementwise (cheap full-width
            # VMEM RMW) and the lane contraction runs ONCE per chunk —
            # three (128,128)x(128,1) MXU dots per tile were ~half the
            # tile body (measured: 485 -> ~330 ms forces at n=1e7)
            macc[...] = jnp.zeros_like(macc)

            for s in range(S):
                jlo, _, jnum = window(oc, s)
                lo_s = bands_ref[s, 0]
                hi_s = bands_ref[s, 1]
                w0 = oc * TJ + MOFF[s]

                @pl.when(jnum > 0)
                def _(oc=oc, s=s, jlo=jlo):
                    copy_obj(oc, s, jlo).wait()

                gtoff = bounds_ref[oc, 3 * s + 1]
                gjnum = bounds_ref[oc, 3 * s + 2]

                def tile(t, _, s=s, w0=w0, lo_s=lo_s, hi_s=hi_s,
                         own_cols=own_cols, own_k=own_k, blkT=blkT):
                    blk = jbuf[pl.ds((w0 + t) * RB, RB), :]  # (8, 128)

                    d = []
                    dsq = jnp.zeros((CHUNK, CHUNK), dtype)
                    for a in range(ncoord):
                        da = own_cols[a] - blk[a : a + 1, :]
                        if split:
                            da = da + (own_cols[a + ncoord]
                                       - blk[a + ncoord : a + ncoord + 1, :])
                        d.append(da)
                        dsq = dsq + da * da
                    # dsq > 0 excludes self and coincident particles
                    # (pair_lag_forces semantics; LJ diverges there)
                    m = (dsq < csq) & (dsq > 0)
                    if bandmask:
                        jk = blk[D : D + 1, :]
                        diff = own_k - jk
                        m = m & (diff >= lo_s) & (diff <= hi_s)
                    g = jnp.where(
                        m,
                        gfn(jnp.where(m, dsq, jnp.ones_like(dsq))
                            if safe_term else dsq),
                        jnp.zeros((CHUNK, CHUNK), dtype),
                    )
                    # one fused RMW of the (128, 3*128) accumulator
                    # (three sliced RMWs measured 281.9 -> 252.6 ms at
                    # n=1e7: slice RMW pays per-op overheads x3)
                    macc[...] += jnp.concatenate(
                        [g * d[a] for a in range(ncoord)], axis=1)
                    return 0

                jax.lax.fori_loop(gtoff, gtoff + gjnum, tile, 0)

            for a in range(ncoord):
                facc[o0 : o0 + CHUNK, a : a + 1] += jax.lax.dot_general(
                    macc[:, a * CHUNK : (a + 1) * CHUNK], ones_row,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=dtype,
                )  # (128, 1)

        # emit per-plane rows: the (C, dim) layout a 2D output would need
        # is lane-padded 3->128 by the pallas operand contract (42x HBM);
        # (nc, 8, 128) blocks are exactly tiled. One transpose per chunk.
        for oc in range(CB):
            o0 = oc * CHUNK
            fout_ref[oc] = jnp.transpose(facc[o0 : o0 + CHUNK, :])  # (8, 128)

    return kernel


def _pack_blocks(planes, keys_p, cutoff_sq, n, C, dtype, payload=None):
    """Pad the coordinate planes and interleave them with the f32 keys
    into 8-row blocks: (nc, RB, CHUNK) flattened to (nc*RB, CHUNK).

    Padding coordinates carry a spread so every pair touching a padding
    row fails the cutoff (packed keys are f32 and rounded for padding
    rows, so key windows alone cannot exclude padding-padding pairs);
    spacing > cutoff, base 1e6 keeps the f32 ulp far below the spacing.

    ``payload`` (one optional (n,) plane) lands at row D+1 — the layout
    has exactly one free row even in the split-3D case (6 coords + key).
    """
    D = len(planes)
    nc = C // CHUNK
    planes_p, pay_p = _pad_planes(planes, cutoff_sq, n, C, dtype,
                                  payload=payload)
    blocks = jnp.zeros((nc, RB, CHUNK), dtype)
    for a, pa in enumerate(planes_p):
        blocks = blocks.at[:, a].set(pa.reshape(nc, CHUNK))
    blocks = blocks.at[:, D].set(keys_p.astype(dtype).reshape(nc, CHUNK))
    if pay_p is not None:
        assert D + 1 < RB, "packed layout has no free row for a payload"
        blocks = blocks.at[:, D + 1].set(pay_p.reshape(nc, CHUNK))
    return blocks.reshape(nc * RB, CHUNK)


def _pad_planes(planes, cutoff_sq, n, C, dtype, payload=None):
    """Coordinate planes padded to C rows with the packed-block spread
    family (see `_pack_blocks`); shared by the block packer and the
    pre-broadcast own-side build so both sides agree on padding."""
    npad = C - n
    zpad = jnp.zeros((npad,), dtype)
    spacing = jnp.maximum(
        jnp.asarray(1e5, dtype), 4 * jnp.sqrt(jnp.asarray(cutoff_sq, dtype))
    )
    spread = jnp.asarray(1e6, dtype) + jnp.arange(npad, dtype=dtype) * spacing
    planes_p = [
        jnp.concatenate([pa, spread if a == 0 else zpad])
        for a, pa in enumerate(planes)
    ]
    pay_p = (
        jnp.concatenate([payload.astype(dtype), zpad])
        if payload is not None else None
    )
    return planes_p, pay_p


def _key_exact_f32(keys_p, cov_ok):
    """f32 keys are exact only below 2^24; negative keys (out-of-box halo
    ghost rows) must also stay exact."""
    kreal_max = jnp.max(
        jnp.where(keys_p < jnp.int32(_PAD_KEY_BASE), keys_p, -1)
    )
    return cov_ok & (kreal_max < (1 << 24)) & (jnp.min(keys_p) > -(1 << 24))


def _packed_forces_core(planes, sorted_keys, strides, cutoff_sq, *, CB,
                        MAXJ, gfn, interpret, split, bandmask=True,
                        safe_term=True):
    """Packed forces pipeline over per-coordinate planes; returns
    ([dim (n,) force planes], coverage_ok) — planes, so large-n callers
    never materialize a lane-padded (n, dim) pallas operand."""
    n = planes[0].shape[0]
    dtype = planes[0].dtype
    D = len(planes)
    dim = D // 2 if split else D
    S = num_segments(dim, full=True)
    from .segments import band_order

    order = band_order(dim, full=True)
    if CB % 8 and not interpret:
        raise ValueError("CB must be a multiple of 8 (SMEM sublane blocking)")

    nc_pad = max(-(-n // (CHUNK * CB)) * CB, CB)
    MAXJ = _norm_maxj(MAXJ, S, nc_pad)
    C = nc_pad * CHUNK
    keys_p = _pad_and_desentinel(sorted_keys, C)

    bands = segment_bands(strides, full=True)
    jlo, toff, jnum, cov_ok = chunk_bounds(keys_p, bands, MAXJ,
                                           half=False)
    if not bandmask:
        from .segments import trim_windows_disjoint, windows_disjoint

        toff, jnum = trim_windows_disjoint(jlo, toff, jnum, order)
        cov_ok = cov_ok & windows_disjoint(jlo, toff, jnum)
    bounds = jnp.stack([jlo, toff, jnum], axis=-1).reshape(nc_pad, 3 * S)

    jarr8 = _pack_blocks(planes, keys_p, cutoff_sq, n, C, dtype)
    if dtype == jnp.float32:
        cov_ok = _key_exact_f32(keys_p, cov_ok)

    kernel = _make_tile_forces_kernel_packed(CB, S, MAXJ, D, gfn, dtype,
                                             split, bandmask=bandmask,
                                             safe_term=safe_term)
    fout = pl.pallas_call(
        kernel,
        grid=(nc_pad // CB,),
        in_specs=[
            pl.BlockSpec((S, 2), lambda p: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda p: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((CB, 3 * S), lambda p: (p, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((CB * RB, CHUNK), lambda p: (p, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((CB, RB, CHUNK), lambda p: (p, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nc_pad, RB, CHUNK), dtype),
        scratch_shapes=[
            pltpu.VMEM((CB * CHUNK, RB), dtype),
            pltpu.VMEM((CHUNK, dim * CHUNK), dtype),
            pltpu.VMEM((CB * sum(MAXJ) * RB, CHUNK), dtype),
            pltpu.SemaphoreType.DMA((CB * S,)),
        ],
        interpret=interpret,
    )(
        bands.astype(dtype),
        jnp.asarray(cutoff_sq, dtype).reshape(1),
        bounds,
        jarr8,
        jarr8,
    )
    fplanes = [fout[:, a, :].reshape(C)[:n] for a in range(dim)]
    return fplanes, cov_ok



def _make_tile_forces_kernel(CB: int, S: int, MAXJ: int, D: int,
                             gfn: Callable, dtype, split: bool):
    """Full-stencil forces: f_i = sum_j gfn(dsq) * (p_i - p_j) over ALL
    stencil partners of i (mirrored bands), i-side accumulation only — no
    cross-program j-writes, so programs stay independent. The per-partner
    row sums ride the MXU (one (128,128)x(128,1) contraction per coord),
    and the pair separations stay exact broadcast differences (split-safe,
    unlike a sum-of-products expansion). Tiles run in a dynamic
    ``fori_loop`` over the true window (see `_make_tile_kernel`)."""
    ncoord = D // 2 if split else D

    def kernel(bands_ref, csq_ref, bounds_ref, own_ref, okey_ref, jarr_ref,
               jkey_ref, fout_ref, jbuf, kbuf, sems, ksems):
        csq = csq_ref[0]
        fout_ref[...] = jnp.zeros_like(fout_ref)

        def window(oc, s):
            return (bounds_ref[oc, 3 * s], bounds_ref[oc, 3 * s + 1],
                    bounds_ref[oc, 3 * s + 2])

        def copy_obj(oc, s, jlo):
            w = oc * S + s
            return pltpu.make_async_copy(
                jarr_ref.at[pl.ds(jlo, MAXJ)],
                jbuf.at[pl.ds(w * MAXJ, MAXJ)],
                sems.at[w],
            )

        def kcopy_obj(oc, s, jlo):
            w = oc * S + s
            return pltpu.make_async_copy(
                jkey_ref.at[pl.ds(jlo, MAXJ)],
                kbuf.at[pl.ds(w * MAXJ, MAXJ)],
                ksems.at[w],
            )

        for oc in range(CB):
            for s in range(S):
                jlo, _, jnum = window(oc, s)

                @pl.when(jnum > 0)
                def _(oc=oc, s=s, jlo=jlo):
                    copy_obj(oc, s, jlo).start()
                    kcopy_obj(oc, s, jlo).start()

        ones_row = jnp.ones((1, CHUNK), dtype)

        for oc in range(CB):
            o0 = oc * CHUNK
            # hoisted column broadcasts (see _make_tile_kernel_packed)
            own_cols = [
                jnp.broadcast_to(own_ref[o0 : o0 + CHUNK, a : a + 1],
                                 (CHUNK, CHUNK))
                for a in range(D)
            ]
            own_k = jnp.broadcast_to(okey_ref[o0 : o0 + CHUNK, 0:1],
                                     (CHUNK, CHUNK))

            for s in range(S):
                jlo, toff, jnum = window(oc, s)
                lo_s = bands_ref[s, 0]
                hi_s = bands_ref[s, 1]
                w0 = (oc * S + s) * MAXJ

                @pl.when(jnum > 0)
                def _(oc=oc, s=s, jlo=jlo):
                    copy_obj(oc, s, jlo).wait()
                    kcopy_obj(oc, s, jlo).wait()

                def tile(t, _, w0=w0, lo_s=lo_s, hi_s=hi_s, o0=o0,
                         own_cols=own_cols, own_k=own_k):
                    jc = jbuf[w0 + t]  # (D, 128)
                    jk = kbuf[w0 + t]  # (1, 128)

                    diff = own_k - jk
                    m = (diff >= lo_s) & (diff <= hi_s)
                    d = []
                    dsq = jnp.zeros((CHUNK, CHUNK), dtype)
                    for a in range(ncoord):
                        da = own_cols[a] - jc[a : a + 1, :]
                        if split:
                            da = da + (own_cols[a + ncoord]
                                       - jc[a + ncoord : a + ncoord + 1, :])
                        d.append(da)
                        dsq = dsq + da * da
                    # dsq > 0 excludes self and coincident particles
                    # (pair_lag_forces semantics; LJ diverges there)
                    m = m & (dsq < csq) & (dsq > 0)
                    g = jnp.where(
                        m,
                        gfn(jnp.where(m, dsq, jnp.ones_like(dsq))),
                        jnp.zeros((CHUNK, CHUNK), dtype),
                    )
                    for a in range(ncoord):
                        fa = jax.lax.dot_general(
                            g * d[a], ones_row,
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=dtype,
                        )  # (128, 1)
                        fout_ref[o0 : o0 + CHUNK, a : a + 1] += fa
                    return 0

                jax.lax.fori_loop(toff, toff + jnum, tile, 0)

    return kernel


def _packed_core(planes, sorted_keys, strides, cutoff_sq, *, CB, MAXJ, term,
                 interpret, out_dtype, min_islot, kahan, distributed, split,
                 payload=None, bandmask=True, safe_term=True):
    """Shared packed-layout pipeline: pad planes -> window bounds -> 8-row
    blocks -> kernel. ``planes`` is a list of D sorted (n,) coordinate
    planes (hi planes then lo planes when split) — the sort's native form,
    so no (n, D) stack/transpose round-trips through HBM. ``payload`` is
    one optional sorted (n,) plane packed at block row D+1; ``term`` then
    receives (dsq, own_payload (128,128), j_payload (1,128))."""
    n = planes[0].shape[0]
    dtype = planes[0].dtype
    D = len(planes)
    dim = D // 2 if split else D
    S = num_segments(dim)
    order = tuple(range(S))
    out_dtype = out_dtype or dtype
    if CB % 8 and not interpret:
        raise ValueError("CB must be a multiple of 8 (SMEM sublane blocking)")

    nc_pad = max(-(-n // (CHUNK * CB)) * CB, CB)
    MAXJ = _norm_maxj(MAXJ, S, nc_pad)
    C = nc_pad * CHUNK
    keys_p = _pad_and_desentinel(sorted_keys, C)

    bands = segment_bands(strides)
    jlo, toff, jnum, cov_ok = chunk_bounds(keys_p, bands, MAXJ)
    if not bandmask:
        # maskless tiles are only exact when no j-chunk is shared by
        # two bands' executed windows (a shared chunk would
        # double-count and meet the own chunk without its triangle):
        # trim the windows pairwise-disjoint (coverage-preserving)
        # and keep the invariant in the flag — never silently wrong
        from .segments import trim_windows_disjoint, windows_disjoint

        toff, jnum = trim_windows_disjoint(jlo, toff, jnum, order)
        cov_ok = cov_ok & windows_disjoint(jlo, toff, jnum)
    bounds = jnp.stack([jlo, toff, jnum], axis=-1).reshape(nc_pad, 3 * S)

    jarr8 = _pack_blocks(planes, keys_p, cutoff_sq, n, C, dtype,
                         payload=payload)
    if dtype == jnp.float32:
        cov_ok = _key_exact_f32(keys_p, cov_ok)

    kernel = _make_tile_kernel_packed(
        CB, S, MAXJ, D, term, dtype, out_dtype, split, kahan,
        distributed,
        n_payload=0 if payload is None else 1, bandmask=bandmask,
        safe_term=safe_term,
    )
    out = pl.pallas_call(
        kernel,
        grid=(nc_pad // CB,),
        in_specs=[
            pl.BlockSpec((S, 2), lambda p: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda p: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda p: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((CB, 3 * S), lambda p: (p, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((CB * RB, CHUNK), lambda p: (p, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((CHUNK, CHUNK), lambda p: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((CHUNK, CHUNK), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((CHUNK, CHUNK), out_dtype),
            pltpu.VMEM((CHUNK, CHUNK), out_dtype),
            pltpu.VMEM((CHUNK, CHUNK), out_dtype),
            pltpu.VMEM((CB * sum(MAXJ) * RB, CHUNK), dtype),
            pltpu.SemaphoreType.DMA((CB * S,)),
        ],
        interpret=interpret,
    )(
        bands.astype(dtype),
        jnp.asarray(cutoff_sq, dtype).reshape(1),
        jnp.asarray(min_islot, jnp.int32).reshape(1),
        bounds,
        jarr8,
        jarr8,
    )
    if jnp.issubdtype(out_dtype, jnp.integer):
        lo = jnp.sum(out & 0xFFFF)
        hi = jnp.sum(out >> 16)
        return jnp.stack([hi, lo]), cov_ok
    return jnp.sum(out), cov_ok


@functools.partial(
    jax.jit,
    static_argnames=("CB", "MAXJ", "term", "kahan", "interpret", "out_dtype",
                     "bandmask", "safe_term"),
)
def tile_lj_rebuild_energy(
    positions: jax.Array,
    cutoff,
    positions_lo: jax.Array | None = None,
    *,
    CB: int = 8,
    MAXJ: int | tuple = 8,
    term: Callable = lj_term,
    kahan=True,
    interpret: bool = False,
    out_dtype=None,
    bandmask: bool = False,
    safe_term: bool = True,
):
    """Full pipeline in one jittable step for cubic/wide boxes (the tile
    sibling of `fused_lj_rebuild_energy`): cell keys -> multi-operand sort
    (planes kept separate) -> packed tile reduction. ``positions_lo``
    enables split-precision pair distances. ``MAXJ`` may be a length-5
    per-band capacity tuple (`segments.suggest_maxj(per_band=True)`) —
    the bands' window needs differ ~6x, so per-band capacities cut DMA
    bytes. Returns (total, coverage_ok).
    """
    dim = positions.shape[1]
    split = positions_lo is not None
    cols = (
        jnp.concatenate([positions, positions_lo], axis=1)
        if split else positions
    )
    # bin on the true spatial columns: without an explicit info,
    # bin_and_sort treats min(total_cols, 3) leading columns as spatial,
    # which mis-bins 2D inputs carrying payload columns (lo planes)
    from ..core.geometry import GridInfo, aabb_from_positions

    info = GridInfo.create(
        aabb_from_positions(positions), cutoff, auto_order=True
    )
    bins, planes = bin_and_sort(
        cols, cutoff, max_cells=1, need_perm=False, stacked=False, info=info
    )
    csq = jnp.asarray(cutoff, positions.dtype) ** 2
    return _packed_core(
        list(planes), bins.sorted_keys, bins.info.strides, csq,
        CB=CB, MAXJ=MAXJ, term=term, interpret=interpret,
        out_dtype=out_dtype, min_islot=jnp.asarray(0, jnp.int32),
        kahan=kahan, distributed=False, split=split,
        bandmask=bandmask, safe_term=safe_term,
    )



@functools.partial(
    jax.jit, static_argnames=("CB", "MAXJ", "gfn", "interpret", "packed",
                              "bandmask", "safe_term")
)
def tile_pair_forces(
    sorted_pos: jax.Array,
    sorted_keys: jax.Array,
    strides: jax.Array,
    cutoff_sq,
    sorted_pos_lo: jax.Array | None = None,
    *,
    CB: int = 8,
    MAXJ: int | tuple = 6,
    gfn: Callable = None,
    interpret: bool = False,
    packed: bool = True,
    bandmask: bool | None = None,
    safe_term: bool = True,
):
    """Per-particle pairwise forces in sorted-slot order, any box shape.

    f_i = sum over cutoff partners j of ``gfn(dsq) * (p_i - p_j)``; the
    full (mirrored) stencil bands give each particle both pair sides
    directly — ~2x the half-space evaluations of `pair_lag_forces` but no
    Horner shift machinery and no cross-program writes. Split-precision
    low planes are supported like the energy kernel. ``MAXJ`` may be a
    length-9 per-band capacity tuple on the packed path
    (`segments.suggest_maxj(bands_full, half=False, per_band=True)`).

    Returns ((n, dim) forces, coverage_ok).
    """
    if gfn is None:
        from .lj import lj_force_factor as gfn

    n, dim = sorted_pos.shape
    split = sorted_pos_lo is not None
    if bandmask is None:
        bandmask = not packed  # packed path defaults to the maskless body
    if packed:
        planes = [sorted_pos[:, a] for a in range(dim)]
        if split:
            planes += [sorted_pos_lo[:, a] for a in range(dim)]
        fplanes, ok = _packed_forces_core(
            planes, sorted_keys, strides, cutoff_sq,
            CB=CB, MAXJ=MAXJ, gfn=gfn, interpret=interpret, split=split,
            bandmask=bandmask, safe_term=safe_term,
        )
        return jnp.stack(fplanes, axis=-1), ok
    if not bandmask or not safe_term:
        raise ValueError("bandmask=False / safe_term=False need the "
                         "packed layout; pass packed=True")
    dtype = sorted_pos.dtype
    D = 2 * dim if split else dim
    S = num_segments(dim, full=True)
    if not isinstance(MAXJ, int):
        raise ValueError("per-band MAXJ tuples need the packed layout; "
                         "pass packed=True")
    if CB % 8 and not interpret:
        raise ValueError("CB must be a multiple of 8 (SMEM sublane blocking)")

    nc_pad = max(-(-n // (CHUNK * CB)) * CB, CB)
    MAXJ = min(MAXJ, nc_pad)
    C = nc_pad * CHUNK
    keys_p = _pad_and_desentinel(sorted_keys, C)

    pos_p = jnp.zeros((C, D), dtype)
    pos_p = pos_p.at[:n, :dim].set(sorted_pos)
    if split:
        pos_p = pos_p.at[:n, dim:].set(sorted_pos_lo)

    bands = segment_bands(strides, full=True)
    jlo, toff, jnum, cov_ok = chunk_bounds(keys_p, bands, MAXJ, half=False)
    bounds = jnp.stack([jlo, toff, jnum], axis=-1).reshape(nc_pad, 3 * S)

    jarr = pos_p.reshape(nc_pad, CHUNK, D).transpose(0, 2, 1)
    jkeys = keys_p.reshape(nc_pad, 1, CHUNK)

    kernel = _make_tile_forces_kernel(CB, S, MAXJ, D, gfn, dtype, split)
    grid = (nc_pad // CB,)
    fout = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((S, 2), lambda p: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda p: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((CB, 3 * S), lambda p: (p, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((CB * CHUNK, D), lambda p: (p, 0)),
            pl.BlockSpec((CB * CHUNK, 1), lambda p: (p, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((CB * CHUNK, dim), lambda p: (p, 0)),
        out_shape=jax.ShapeDtypeStruct((C, dim), dtype),
        scratch_shapes=[
            pltpu.VMEM((CB * S * MAXJ, D, CHUNK), dtype),
            pltpu.VMEM((CB * S * MAXJ, 1, CHUNK), jnp.int32),
            pltpu.SemaphoreType.DMA((CB * S,)),
            pltpu.SemaphoreType.DMA((CB * S,)),
        ],
        interpret=interpret,
    )(
        bands.astype(jnp.int32),
        jnp.asarray(cutoff_sq, dtype).reshape(1),
        bounds,
        pos_p,
        keys_p[:, None],
        jarr,
        jkeys,
    )
    return fout[:n], cov_ok


def tile_pair_reduce(
    sorted_pos: jax.Array,
    sorted_keys: jax.Array,
    strides: jax.Array,
    cutoff_sq,
    sorted_pos_lo: jax.Array | None = None,
    sorted_payload: jax.Array | None = None,
    *,
    CB: int = 8,
    MAXJ: int = 4,
    term: Callable = lj_term,
    interpret: bool = False,
    out_dtype=None,
    min_islot=0,
    kahan=True,
    OH: int = 128,
    packed: bool = True,
    bandmask: bool | None = None,
    safe_term: bool = True,
):
    """Sum ``term(dsq)`` over all unique cutoff-filtered pairs, any box
    shape (the shape-robust sibling of `pair_lag_reduce`).

    ``sorted_payload`` (one (n,) plane in sorted order, packed layout
    only) rides block row D+1; ``term`` then receives
    (dsq, own_payload, j_payload) — the tile sibling of
    `pair_lag_reduce(sorted_payload=...)` (e.g. the PBC shift-sign mask).

    Returns (total, coverage_ok): coverage_ok is False iff some chunk's
    partner window needs more than MAXJ j-chunks — re-jit with a larger
    MAXJ; never trust a result with a false flag (the never-silently-drop
    invariant). MAXJ=4 covers reference density (~10/cell) with margin;
    integer outputs return (hi, lo) int32 planes (see `combine_count`).
    ``kahan``: True = per-tile compensated accumulation, ``"program"`` =
    plain tile adds + compensated cross-program folding (~equally tight
    in practice: a lane sees ~1 nonzero addend per chunk), False = plain
    everywhere (~15% faster than True). ``bandmask=False`` (packed only;
    the DEFAULT on the packed path since round 4) drops the key-band
    compare from the tile body — exact whenever the executed windows are
    pairwise disjoint, which `segments.trim_windows_disjoint` establishes
    by construction for +4-padded grids and the coverage flag then also
    guards (`segments.windows_disjoint` — on a False flag rerun with
    ``bandmask=True``). ``bandmask=None`` resolves to False on the packed
    path and True otherwise. ``safe_term=False`` (packed only)
    skips the masked-dsq guard inside ``term`` (safe for LJ-like terms
    whose value at garbage dsq is select-discarded). ``min_islot``
    enables distributed pair ownership; a concrete 0 (the default)
    compiles the mask out entirely. ``packed=True`` (default) uses an
    8-row block layout (coords + f32 key per chunk, one DMA per window)
    — measured 294 -> 233 ms at n=1e7 cubic vs the split-planes layout —
    and is capped at 2^24 flat keys by f32 key exactness (reflected in
    coverage_ok); ``packed=False`` keeps int32 keys for larger grids.
    ``OH`` (own-tile row-group height, non-packed path only) measured
    best at 128.
    """
    distributed = not (isinstance(min_islot, (int,)) and min_islot == 0)
    if bandmask is None:
        bandmask = not packed  # packed path defaults to the maskless body
    return _tile_pair_reduce_impl(
        sorted_pos, sorted_keys, strides, cutoff_sq, sorted_pos_lo,
        sorted_payload,
        CB=CB, MAXJ=MAXJ, term=term, interpret=interpret,
        out_dtype=out_dtype, min_islot=jnp.asarray(min_islot, jnp.int32),
        kahan=kahan, distributed=distributed, OH=OH, packed=packed,
        bandmask=bandmask, safe_term=safe_term,
    )


@functools.partial(
    jax.jit,
    static_argnames=("CB", "MAXJ", "term", "interpret", "out_dtype",
                     "kahan", "distributed", "OH", "packed", "bandmask",
                     "safe_term"),
)
def _tile_pair_reduce_impl(
    sorted_pos: jax.Array,  # (n, dim) cell-key-sorted positions (hi part)
    sorted_keys: jax.Array,  # (n,) ascending flat cell keys
    strides: jax.Array,  # (dim,) grid strides (ascending)
    cutoff_sq,
    sorted_pos_lo: jax.Array | None = None,  # (n, dim) f32x2 low parts
    sorted_payload: jax.Array | None = None,  # (n,) payload plane (packed)
    *,
    CB: int = 8,
    MAXJ: int = 4,
    term: Callable = lj_term,
    interpret: bool = False,
    out_dtype=None,
    min_islot=0,
    kahan=True,
    distributed: bool = False,
    OH: int = CHUNK,
    packed: bool = False,
    bandmask: bool = True,
    safe_term: bool = True,
):
    n, dim = sorted_pos.shape
    if sorted_payload is not None and not packed:
        raise ValueError("sorted_payload needs the packed layout")
    if not packed and (not bandmask or not safe_term or kahan == "program"):
        raise ValueError("bandmask=False / safe_term=False / "
                         'kahan="program" need the packed layout')
    split = sorted_pos_lo is not None
    dtype = sorted_pos.dtype
    out_dtype = out_dtype or dtype
    D = 2 * dim if split else dim
    S = num_segments(dim)
    if not packed and not isinstance(MAXJ, int):
        raise ValueError("per-band MAXJ tuples need the packed layout; "
                         "pass packed=True")
    if CB % 8 and not interpret:
        raise ValueError("CB must be a multiple of 8 (SMEM sublane blocking)")
    if CHUNK % OH or OH % 8:
        raise ValueError("OH must divide 128 and be a multiple of 8")
    G = CHUNK // OH

    if packed:
        if G != 1:
            raise ValueError("OH row groups apply to the non-packed layout "
                             "only; pass packed=False with OH != 128")
        planes = [sorted_pos[:, a] for a in range(dim)]
        if split:
            planes += [sorted_pos_lo[:, a] for a in range(dim)]
        return _packed_core(
            planes, sorted_keys, strides, cutoff_sq,
            CB=CB, MAXJ=MAXJ, term=term, interpret=interpret,
            out_dtype=out_dtype, min_islot=min_islot, kahan=kahan,
            distributed=distributed, split=split, payload=sorted_payload,
            bandmask=bandmask, safe_term=safe_term,
        )

    nc_pad = max(-(-n // (CHUNK * CB)) * CB, CB)
    MAXJ = min(MAXJ, nc_pad)
    C = nc_pad * CHUNK
    keys_p = _pad_and_desentinel(sorted_keys, C)

    pos_p = jnp.zeros((C, D), dtype)
    pos_p = pos_p.at[:n, :dim].set(sorted_pos)
    if split:
        pos_p = pos_p.at[:n, dim:].set(sorted_pos_lo)

    bands = segment_bands(strides)
    if G == 1:
        jlo, toff, jnum, cov_ok = chunk_bounds(keys_p, bands, MAXJ)
        gtoff, gjnum = toff[:, None, :], jnum[:, None, :]
    else:
        jlo, toff, jnum, gtoff, gjnum, cov_ok = chunk_bounds(
            keys_p, bands, MAXJ, groups=G
        )
    bounds = jnp.stack([jlo, toff, jnum], axis=-1).reshape(nc_pad, 3 * S)
    gbounds = jnp.stack([gtoff, gjnum], axis=-1).reshape(nc_pad, G * S * 2)

    # j-side arrays: coordinate planes (nc, D, 128) and keys (nc, 1, 128),
    # indexed per chunk on the untiled leading dim — separate typed DMAs
    jarr = pos_p.reshape(nc_pad, CHUNK, D).transpose(0, 2, 1)
    jkeys = keys_p.reshape(nc_pad, 1, CHUNK)

    kernel = _make_tile_kernel(CB, S, MAXJ, D, term, dtype, out_dtype, split,
                               kahan, distributed, OH)
    grid = (nc_pad // CB,)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((S, 2), lambda p: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda p: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda p: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((CB, 3 * S), lambda p: (p, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((CB, G * S * 2), lambda p: (p, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((CB * CHUNK, D), lambda p: (p, 0)),
            pl.BlockSpec((CB * CHUNK, 1), lambda p: (p, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((CHUNK, CHUNK), lambda p: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((CHUNK, CHUNK), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((CHUNK, CHUNK), out_dtype),  # cross-program Kahan
            pltpu.VMEM((CHUNK, CHUNK), out_dtype),  # per-program acc
            pltpu.VMEM((CHUNK, CHUNK), out_dtype),  # per-program comp
            pltpu.VMEM((CB * S * MAXJ, D, CHUNK), dtype),
            pltpu.VMEM((CB * S * MAXJ, 1, CHUNK), jnp.int32),
            pltpu.SemaphoreType.DMA((CB * S,)),
            pltpu.SemaphoreType.DMA((CB * S,)),
        ],
        interpret=interpret,
    )(
        bands.astype(jnp.int32),
        jnp.asarray(cutoff_sq, dtype).reshape(1),
        jnp.asarray(min_islot, jnp.int32).reshape(1),
        bounds,
        gbounds,
        pos_p,
        keys_p[:, None],
        jarr,
        jkeys,
    )
    if jnp.issubdtype(out_dtype, jnp.integer):
        lo = jnp.sum(out & 0xFFFF)
        hi = jnp.sum(out >> 16)
        return jnp.stack([hi, lo]), cov_ok
    return jnp.sum(out), cov_ok


def tile_lj_energy(sorted_pos, sorted_keys, strides, cutoff_sq,
                   sorted_pos_lo=None, **kw):
    return tile_pair_reduce(
        sorted_pos, sorted_keys, strides, cutoff_sq, sorted_pos_lo,
        term=lj_term, **kw
    )


def tile_count_pairs(sorted_pos, sorted_keys, strides, cutoff_sq, **kw):
    packed, ok = tile_pair_reduce(
        sorted_pos, sorted_keys, strides, cutoff_sq,
        term=count_term, out_dtype=jnp.int32, **kw
    )
    return packed, ok
