"""Fused SDF query-join: sorted queries x grid particles.

The psssh workload evaluates the smooth distance field (models.sdf, the
TPU re-design of zelll `surface-sampling/src/sdf/numdual.rs:11-61`) on
large query batches (the `eval` CLI runs l^3 grids,
`surface-sampling/examples/cli.rs:150-195`). The XLA path materializes a
padded 3^N*K-candidate window per query (gathers) and autodiffs through
it — measured 5-53 us/query on v5e, i.e. ~4e7 candidate pairs/s, ~40x
below the pair kernels.

This module is the SDF instance of the generic join machinery
(`ops.join.join_reduce`: queries sorted by flat cell key, the whole
packed particle array [x, y, z, r, 1/r, key] VMEM-resident, per-band
partner windows from `segments.join_bounds`, deferred per-chunk MXU
ones-contractions). Instead of autodiff, each tile accumulates the 12
sufficient sums of the SDF and its ANALYTIC gradient:

    S1 = sum e1,  S2 = sum e3*r,  S3 = sum e3,
    A1 = sum (e1/r/d) * u,  A2 = sum (e3*r/d) * u,  A3 = sum (e3/d)*u

with e1 = exp(-d/r), e3 = exp(-d), u = x_q - x_p (so A*/d terms are the
unit-vector sums). One rsqrt replaces sqrt+div; e1/e3 are shared across
all 12 outputs. d == 0 terms contribute (1, r, 1) to (S1, S2, S3) with
zero gradient, exactly like the reference (numdual.rs:34-42).

`models.sdf` turns the sums into value + gradient in closed form:
    sigma = S2/S3, val = -sigma*ln(S1)
    grad  = lnS1 * (A2*S3 - S2*A3)/S3^2 + sigma*A1/S1.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .join import join_reduce

__all__ = ["sdf_join_sums", "sdf_term", "NACC"]

# accumulated quantities per query:
# 0 S1, 1 S2, 2 S3, 3-5 A1, 6-8 A2, 9-11 A3
NACC = 12


def sdf_term(dsq, d, payload, within):
    """The 12 SDF tile quantities (see module docstring); payload rows
    are (r, 1/r) in sorted slot order."""
    r, rinv = payload
    iszero = within & (dsq == 0)
    live = within & (dsq > 0)
    zero = jnp.zeros_like(dsq)

    # one rsqrt replaces sqrt+div; masked lanes use dsq=1 so no inf/NaN
    # is ever formed
    rs = jax.lax.rsqrt(jnp.where(live, dsq, jnp.ones_like(dsq)))
    dist = dsq * rs
    e1 = jnp.where(live, jnp.exp(-dist * rinv), zero)
    e3 = jnp.where(live, jnp.exp(-dist), zero)
    z = jnp.where(iszero, jnp.ones_like(dsq), zero)

    c1 = e1 * rs * rinv
    c3 = e3 * rs
    c2 = c3 * r
    out = [e1 + z, (e3 + z) * r, e3 + z]
    for c in (c1, c2, c3):
        out.extend(c * da for da in d)
    return out


def sdf_join_sums(
    qplanes,  # 3 sorted (nq,) query coordinate planes
    qkeys,  # (nq,) int32 ascending query cell keys
    pplanes,  # 5 sorted (np,) particle planes: x, y, z, r, 1/r
    pkeys,  # (np,) int32 ascending particle cell keys
    strides,  # (3,) int32 grid strides (shared GridInfo)
    cutoff_sq,
    *,
    CB: int = 8,
    MAXJ: int | None = None,
    interpret: bool = False,
):
    """The 12 per-query SDF sums over all within-cutoff particles.

    Returns (sums, ok): ``sums`` is a (nq, NACC) array ordered
    [S1, S2, S3, A1xyz, A2xyz, A3xyz] per SORTED query slot; ``ok`` is
    the coverage flag (key preconditions + f32 key exactness; with
    ``MAXJ`` set — structures above `join.JOIN_MAX_PARTICLES` atoms run
    the windowed kernel — it also covers the window capacity)."""
    return join_reduce(
        qplanes, qkeys, pplanes, pkeys, strides, cutoff_sq,
        term=sdf_term, n_out=NACC, CB=CB, MAXJ=MAXJ, interpret=interpret,
    )
