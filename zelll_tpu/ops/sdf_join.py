"""Fused SDF query-join kernel: sorted queries x grid particles.

The psssh workload evaluates the smooth distance field (models.sdf, the
TPU re-design of zelll `surface-sampling/src/sdf/numdual.rs:11-61`) on
large query batches (the `eval` CLI runs l^3 grids,
`surface-sampling/examples/cli.rs:150-195`). The XLA path materializes a
padded 3^N*K-candidate window per query (gathers) and autodiffs through
it — measured 5-53 us/query on v5e, i.e. ~4e7 candidate pairs/s, ~40x
below the pair kernels.

TPU-native design (docs/DESIGN_NOTES.md "Batched query / join kernel"):

- Queries are sorted by their flat cell key, so a chunk of 128 queries
  spans a narrow key range, exactly like particle chunks in the tile
  kernel (`ops.tile_pairs`).
- The particle side is packed once into 8-row blocks
  [x, y, z, r, 1/r, key] and kept ENTIRELY VMEM-resident (psssh-scale
  structures are <= ~1e5 atoms = 4 MB packed); tiles index it directly —
  no DMA windows, no static MAXJ capacity class, and the coverage flag
  only guards key preconditions, never capacity.
- Per query chunk and full-stencil key band (`segments.segment_bands`,
  S = 9 in 3D), the partner particle-chunk range comes from
  `segments.join_bounds` (two searchsorted calls — the join analogue of
  `chunk_bounds`). Every within-cutoff (query, particle) pair has a key
  difference in exactly one band (disjoint bands, +4-padded strides), so
  pairs are counted once.
- Instead of autodiff, each tile accumulates the 12 sufficient sums of
  the SDF and its analytic gradient:
      S1 = sum e1,  S2 = sum e3*r,  S3 = sum e3,
      A1 = sum (e1/r/d) * u,  A2 = sum (e3*r/d) * u,  A3 = sum (e3/d)*u
  with e1 = exp(-d/r), e3 = exp(-d), u = x_q - x_p (so A*/d terms are
  the unit-vector sums). Accumulation is deferred per chunk (round-3
  lesson): tiles do elementwise (128,128) VMEM RMWs and ONE ones-vector
  MXU contraction per quantity per chunk (precision-safe: products are
  formed on the VPU, the MXU only sums).
- d == 0 terms contribute (1, r, 1) to (S1, S2, S3) with zero gradient,
  exactly like the reference (numdual.rs:34-42).

`models.sdf` turns the sums into value + gradient in closed form:
    sigma = S2/S3, val = -sigma*ln(S1)
    grad  = lnS1 * (A2*S3 - S2*A3)/S3^2 + sigma*A1/S1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .segments import CHUNK, join_bounds, num_segments, segment_bands
from .pallas_pairs import _pad_and_desentinel
from .tile_pairs import RB, _key_exact_f32, _pack_blocks

__all__ = ["sdf_join_sums", "NACC"]

# accumulated quantities per query:
# 0 S1, 1 S2, 2 S3, 3-5 A1, 6-8 A2, 9-11 A3
NACC = 12
_OUTROWS = 16  # NACC padded to the f32 sublane tile


def _make_sdf_join_kernel(CB: int, S: int, dtype):
    """Join kernel: CB query chunks per program, particle blocks resident.

    Query blocks (own8_ref): rows [x, y, z, key]; particle blocks
    (parr_ref): rows [x, y, z, r, 1/r, key]. Bounds are ABSOLUTE particle
    chunk ranges (lo, num) per (query chunk, band)."""

    def kernel(bands_ref, csq_ref, bounds_ref, own8_ref, parr_ref,
               out_ref, facc, macc):
        csq = csq_ref[0]
        facc[...] = jnp.zeros_like(facc)

        for oc in range(CB):
            o0 = oc * CHUNK
            blkT = jnp.transpose(own8_ref[oc * RB : (oc + 1) * RB, :])
            # hoisted lane broadcasts (see _make_tile_kernel_packed)
            qc = [
                jnp.broadcast_to(blkT[:, a : a + 1], (CHUNK, CHUNK))
                for a in range(3)
            ]
            qk = jnp.broadcast_to(blkT[:, 3:4], (CHUNK, CHUNK))

            macc[...] = jnp.zeros_like(macc)

            for s in range(S):
                lo = bounds_ref[oc, 2 * s]
                num = bounds_ref[oc, 2 * s + 1]
                lo_s = bands_ref[s, 0]
                hi_s = bands_ref[s, 1]

                def tile(t, _, lo_s=lo_s, hi_s=hi_s, qc=qc, qk=qk):
                    blk = parr_ref[pl.ds(t * RB, RB), :]  # (8, 128)
                    pk = blk[5:6, :]
                    r = blk[3:4, :]
                    rinv = blk[4:5, :]

                    diff = qk - pk
                    m = (diff >= lo_s) & (diff <= hi_s)

                    d0 = qc[0] - blk[0:1, :]
                    d1 = qc[1] - blk[1:2, :]
                    d2 = qc[2] - blk[2:3, :]
                    dsq = d0 * d0 + d1 * d1 + d2 * d2
                    within = m & (dsq <= csq)  # inclusive, numdual.rs:16
                    iszero = within & (dsq == 0)
                    live = within & (dsq > 0)

                    # one rsqrt replaces sqrt+div; masked lanes use dsq=1
                    # so no inf/NaN is ever formed
                    rs = jax.lax.rsqrt(jnp.where(live, dsq, 1.0))
                    d = dsq * rs
                    zero = jnp.zeros((CHUNK, CHUNK), dtype)
                    e1 = jnp.where(live, jnp.exp(-d * rinv), zero)
                    e3 = jnp.where(live, jnp.exp(-d), zero)
                    z = jnp.where(iszero, jnp.ones((CHUNK, CHUNK), dtype),
                                  zero)

                    c1 = e1 * rs * rinv
                    c3 = e3 * rs
                    c2 = c3 * r

                    q0 = CHUNK
                    macc[:, 0:q0] += e1 + z
                    macc[:, q0 : 2 * q0] += (e3 + z) * r
                    macc[:, 2 * q0 : 3 * q0] += e3 + z
                    for a, da in enumerate((d0, d1, d2)):
                        macc[:, (3 + a) * q0 : (4 + a) * q0] += c1 * da
                        macc[:, (6 + a) * q0 : (7 + a) * q0] += c2 * da
                        macc[:, (9 + a) * q0 : (10 + a) * q0] += c3 * da
                    return 0

                jax.lax.fori_loop(lo, lo + num, tile, 0)

            ones_row = jnp.ones((1, CHUNK), dtype)
            for q in range(NACC):
                facc[o0 : o0 + CHUNK, q : q + 1] += jax.lax.dot_general(
                    macc[:, q * CHUNK : (q + 1) * CHUNK], ones_row,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=dtype,
                )

        for oc in range(CB):
            o0 = oc * CHUNK
            out_ref[oc] = jnp.transpose(facc[o0 : o0 + CHUNK, :])

    return kernel


@functools.partial(jax.jit, static_argnames=("CB", "interpret"))
def sdf_join_sums(
    qplanes,  # 3 sorted (nq,) query coordinate planes
    qkeys,  # (nq,) int32 ascending query cell keys
    pplanes,  # 5 sorted (np,) particle planes: x, y, z, r, 1/r
    pkeys,  # (np,) int32 ascending particle cell keys
    strides,  # (3,) int32 grid strides (shared GridInfo)
    cutoff_sq,
    *,
    CB: int = 8,
    interpret: bool = False,
):
    """The 12 per-query SDF sums over all within-cutoff particles.

    Returns (sums, ok): ``sums`` is a (nq, NACC) array ordered
    [S1, S2, S3, A1xyz, A2xyz, A3xyz] per SORTED query slot; ``ok`` is
    the coverage flag (key preconditions + f32 key exactness — never a
    capacity bound: the particle side is fully resident)."""
    nq = qplanes[0].shape[0]
    npart = pplanes[0].shape[0]
    dtype = qplanes[0].dtype
    S = num_segments(3, full=True)
    if CB % 8 and not interpret:
        raise ValueError("CB must be a multiple of 8 (SMEM sublane blocking)")

    ncq = max(-(-nq // (CHUNK * CB)) * CB, CB)
    Cq = ncq * CHUNK
    ncp = max(-(-npart // CHUNK), 1)
    Cp = ncp * CHUNK

    qkeys_p = _pad_and_desentinel(qkeys, Cq)
    pkeys_p = _pad_and_desentinel(pkeys, Cp)

    bands = segment_bands(strides, full=True)
    lo, num, cov_ok = join_bounds(qkeys_p, pkeys_p, bands)
    bounds = jnp.stack([lo, num], axis=-1).reshape(ncq, 2 * S)

    qarr8 = _pack_blocks(list(qplanes), qkeys_p, cutoff_sq, nq, Cq, dtype)
    parr8 = _pack_blocks(list(pplanes), pkeys_p, cutoff_sq, npart, Cp, dtype)
    if dtype == jnp.float32:
        cov_ok = _key_exact_f32(qkeys_p, cov_ok)
        cov_ok = _key_exact_f32(pkeys_p, cov_ok)

    kernel = _make_sdf_join_kernel(CB, S, dtype)
    out = pl.pallas_call(
        kernel,
        grid=(ncq // CB,),
        in_specs=[
            pl.BlockSpec((S, 2), lambda p: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1,), lambda p: (0,), memory_space=pltpu.SMEM),
            pl.BlockSpec((CB, 2 * S), lambda p: (p, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((CB * RB, CHUNK), lambda p: (p, 0)),
            # whole packed particle array, VMEM-resident (constant block:
            # the pipeline fetches it once, not per program)
            pl.BlockSpec((ncp * RB, CHUNK), lambda p: (0, 0)),
        ],
        out_specs=pl.BlockSpec((CB, _OUTROWS, CHUNK), lambda p: (p, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((ncq, _OUTROWS, CHUNK), dtype),
        scratch_shapes=[
            pltpu.VMEM((CB * CHUNK, _OUTROWS), dtype),
            pltpu.VMEM((CHUNK, NACC * CHUNK), dtype),
        ],
        interpret=interpret,
    )(
        bands.astype(dtype),
        jnp.asarray(cutoff_sq, dtype).reshape(1),
        bounds,
        qarr8,
        parr8,
    )
    # (ncq, 16, CHUNK) -> (nq, NACC)
    sums = (
        out[:, :NACC, :].transpose(0, 2, 1).reshape(Cq, NACC)[:nq]
    )
    return sums, cov_ok
