"""Fused pair-interaction Pallas kernel over sorted particle order.

The TPU-native hot path, replacing the reference's lazy per-cell pair
iterators (zelll `src/cellgrid/iters.rs:218-241`). Two observations make
the kernel gather-free and layout-friendly:

1. After sorting by flat cell key, every cutoff pair partner j of particle
   i satisfies ``key_i - W <= key_j`` with ``W = strides_y + strides_z + 1``
   (strides ascending): all candidate partners j < i live within a bounded
   *lag* behind i in sorted slot order. Choosing L = max physical lag
   (host-verified with one shifted compare: ``all(key[i] - key[i-L] > W)``)
   turns half-space pair enumeration into a dense loop over lags:

       for lag in 1..L:  pairs (i, i - lag)  masked by
           key_{i-lag} >= key_i - W   (candidate window)
           dsq < cutoff^2             (the user's distance filter)

   The slot rule j = i - lag < i emits each unordered pair exactly once —
   the analogue of the reference's half-space stencil trick
   (iters.rs:58-63). Cell adjacency tests are redundant for distance-
   filtered reductions because the cell edge equals the cutoff.

2. Lag access patterns are shifted dense vector reads — no gather, no
   scatter, no transposes. Each program keeps a rolling VMEM window of the
   previous L slots plus its own M-slot block (blocks arrive via automatic
   BlockSpec pipelining), so every particle is read from HBM exactly once.

The pair list never exists anywhere: interaction terms fuse into the lag
loop (BASELINE.json north star: the build->iterate->reduce loop never
leaves the chip).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "pair_lag_reduce",
    "lag_coverage_ok",
    "suggest_lag",
    "lj_term",
    "count_term",
]

LANES = 128


def lj_term(dsq):
    t = 1.0 / dsq
    t3 = t * t * t
    return 4.0 * t3 * (t3 - 1.0)


def count_term(dsq):
    return jnp.ones_like(dsq)


def lag_coverage_ok(sorted_keys: jax.Array, strides: jax.Array, L: int):
    """True iff lag bound L covers every in-window pair:
    key[i] - key[i-L] > W for all i (padding keys included is conservative).
    """
    w = strides[1] + strides[2] + 1
    if sorted_keys.shape[0] <= L:
        return jnp.asarray(True)
    return jnp.all(sorted_keys[L:] - sorted_keys[:-L] > w)


def suggest_lag(sorted_keys_host, strides_host, granule: int = 128) -> int:
    """Smallest granule multiple L with full coverage (host-side helper)."""
    import numpy as np

    w = int(strides_host[1] + strides_host[2] + 1)
    n = len(sorted_keys_host)
    L = granule
    while L < n and not np.all(
        sorted_keys_host[L:] - sorted_keys_host[:-L] > w
    ):
        L *= 2
    return min(L, ((n + granule - 1) // granule) * granule)


def _make_kernel(M: int, L: int, term: Callable, dtype, out_dtype):
    Mr, Lr = M // LANES, L // LANES
    Wr = Mr + Lr  # rolling window rows

    def kernel(wkey_ref, csq_ref, xb, yb, zb, kb, out_ref, xw, yw, zw, kw):
        p = pl.program_id(0)
        w_key = wkey_ref[0]
        csq = csq_ref[0]

        @pl.when(p == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)
            # "nothing before the start": keys so small every real key is
            # out of the candidate window
            kw[0:Lr] = jnp.full((Lr, LANES), jnp.iinfo(jnp.int32).min // 2,
                                jnp.int32)
            xw[0:Lr] = jnp.zeros((Lr, LANES), dtype)
            yw[0:Lr] = jnp.zeros((Lr, LANES), dtype)
            zw[0:Lr] = jnp.zeros((Lr, LANES), dtype)

        @pl.when(p != 0)
        def _():
            # roll: keep the last L slots of the previous window
            kw[0:Lr] = kw[Wr - Lr : Wr]
            xw[0:Lr] = xw[Wr - Lr : Wr]
            yw[0:Lr] = yw[Wr - Lr : Wr]
            zw[0:Lr] = zw[Wr - Lr : Wr]

        xw[Lr:Wr] = xb[...]
        yw[Lr:Wr] = yb[...]
        zw[Lr:Wr] = zb[...]
        kw[Lr:Wr] = kb[...]

        own_x = xw[Lr:Wr]
        own_y = yw[Lr:Wr]
        own_z = zw[Lr:Wr]
        own_k = kw[Lr:Wr]

        # Working copies of the window, shifted right by `lag` in flattened
        # slot order (W^lag[f] == window[f - lag]). Incremental update per
        # lag: a lane roll plus a row roll patching lane 0 — no dynamic
        # slices, no relayouts. Wrap garbage lands in flat slots < lag,
        # which the lagged view (flat [L, L+M)) never touches since
        # lag <= L.
        lane = jax.lax.broadcasted_iota(jnp.int32, (Wr, LANES), 1)
        is_lane0 = lane == 0

        def shift_right_one(v):
            a = pltpu.roll(v, 1, axis=1)
            return jnp.where(is_lane0, pltpu.roll(a, 1, axis=0), a)

        def lag_body(lag, carry):
            sx, sy, sz, sk, acc = carry
            sx = shift_right_one(sx)
            sy = shift_right_one(sy)
            sz = shift_right_one(sz)
            sk = shift_right_one(sk)
            jx, jy, jz, jk = (v[Lr:Wr] for v in (sx, sy, sz, sk))
            dx = own_x - jx
            dy = own_y - jy
            dz = own_z - jz
            dsq = dx * dx + dy * dy + dz * dz
            mask = (jk >= own_k - w_key) & (dsq < csq)
            vals = term(jnp.where(mask, dsq, jnp.ones_like(dsq)))
            acc = acc + jnp.where(mask, vals, jnp.zeros_like(vals)).astype(
                out_dtype
            )
            return sx, sy, sz, sk, acc

        init = (
            xw[...],
            yw[...],
            zw[...],
            kw[...],
            jnp.zeros((Mr, LANES), out_dtype),
        )
        *_, acc = jax.lax.fori_loop(1, L + 1, lag_body, init)
        out_ref[...] += acc

    return kernel


@functools.partial(
    jax.jit, static_argnames=("M", "L", "term", "interpret", "out_dtype")
)
def pair_lag_reduce(
    sorted_pos: jax.Array,  # (n, 3) cell-key-sorted positions
    sorted_keys: jax.Array,  # (n,) ascending flat cell keys
    strides: jax.Array,  # (3,) grid strides (ascending)
    cutoff_sq,
    *,
    M: int = 1024,
    L: int = 256,
    term: Callable = lj_term,
    interpret: bool = False,
    out_dtype=None,
):
    """Sum ``term(dsq)`` over all unique cutoff-filtered pairs.

    L must satisfy `lag_coverage_ok` (host/XLA-checked separately; one
    shifted vector compare). M and L must be multiples of 128.
    """
    n = sorted_pos.shape[0]
    dtype = sorted_pos.dtype
    out_dtype = out_dtype or dtype
    assert M % LANES == 0 and L % LANES == 0 and L >= LANES
    assert L <= M, "rolling window requires L <= M"
    if not interpret:
        # Mosaic block tiling: (Mr, 128) blocks need Mr % 8 == 0 (f32)
        assert M % (8 * LANES) == 0, "compiled mode requires M % 1024 == 0"

    P = -(-n // M)
    tail = P * M - n

    # Tail padding: huge keys (always "in window" together) but spread-out
    # coordinates so every padded dsq exceeds any cutoff.
    big = jnp.asarray(jnp.iinfo(jnp.int32).max // 2, jnp.int32)
    keys_p = jnp.concatenate([sorted_keys, jnp.full((tail,), big, jnp.int32)])
    spread = (
        jnp.arange(1, tail + 1, dtype=dtype) * jnp.asarray(1e5, dtype)
        + jnp.asarray(1e12, dtype)
    )
    planes = [
        jnp.concatenate([sorted_pos[:, a], spread]).reshape(-1, LANES)
        for a in range(3)
    ]
    xp, yp, zp = planes
    kp = keys_p.reshape(-1, LANES)

    w_key = (strides[1] + strides[2] + 1).astype(jnp.int32).reshape(1)
    csq = jnp.asarray(cutoff_sq, dtype).reshape(1)

    Mr = M // LANES
    kernel = _make_kernel(M, L, term, dtype, out_dtype)
    bs = lambda dt: pl.BlockSpec((Mr, LANES), lambda p, s1, s2: (p, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(P,),
        in_specs=[bs(dtype), bs(dtype), bs(dtype), bs(jnp.int32)],
        out_specs=pl.BlockSpec(
            (Mr, LANES), lambda p, s1, s2: (0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((Mr + L // LANES, LANES), dtype),
            pltpu.VMEM((Mr + L // LANES, LANES), dtype),
            pltpu.VMEM((Mr + L // LANES, LANES), dtype),
            pltpu.VMEM((Mr + L // LANES, LANES), jnp.int32),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Mr, LANES), out_dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(w_key, csq, xp, yp, zp, kp)
    return jnp.sum(out)
