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

Precision: with f32 coordinates in a large box, ``x_i - x_j`` suffers
catastrophic cancellation (coordinates ~1e4 with ulp ~1e-3 destroy small
separations). ``split=True`` carries each coordinate as an (hi, lo) f32
pair splitting the f64 value; ``dx = (hi_i - hi_j) + (lo_i - lo_j)`` is
exact in the leading term for nearby pairs (Sterbenz), recovering ~f64
pair distances at f32 speed. This is how f64-grade LJ parity (1e-6,
BASELINE.json) is reached on a chip without fast f64.

The pair list never exists anywhere: interaction terms fuse into the lag
loop (the build->iterate->reduce loop never leaves the chip).
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.geometry import SENTINEL_KEY, key_window

__all__ = [
    "pair_lag_reduce",
    "pair_lag_hist",
    "pair_lag_stress",
    "lag_coverage_ok",
    "suggest_lag",
    "split_f64",
    "lj_term",
    "count_term",
    "combine_count",
    "combine_count_vec",
]

LANES = 128

# Base for padding-row keys inside the lag kernels: above every real key
# (real keys have int32 headroom below this; columns.py asserts it), below
# int32 overflow even after per-slot spacing.
_PAD_KEY_BASE = jnp.iinfo(jnp.int32).max // 2

# Coordinate value family for kernel tail-padding rows. Distinct from every
# other padding family in the repo (api._pad_far uses a 2D spread grid at
# 1e12 + 2^17*k spanning < 2e12; ops.pbc invalid-ghost rows use a 2D grid
# at 4e12 + 2^20*k; partition_by_slab pads just beyond sup instead) so
# padding rows from different stages can never coincide at dsq == 0 — the
# energy kernel has no dsq > 0 exclusion (coincident *real* particles are
# counted, matching the reference's iterator semantics).
_PAD_COORD_BASE = 7e12
# Spread spacing must survive f32 quantization at the base: ulp(7e12) is
# 2^19, so any spacing below that rounds consecutive padding rows onto the
# SAME f32 value — dsq == 0 — and whenever the padding-key spacing
# ((2^31/2)/ntot, see _pad_and_desentinel) is smaller than the key window
# those rows pair up and put lj(0) = inf into the sum. 2^20 is an exact
# multiple of the ulp (rows stay >= 2^20 apart, far above any cutoff) and
# tail <= M keeps the family inside its binade.
_PAD_COORD_SPACING = 2.0**20


def _tail_spread(tail: int, dtype) -> jax.Array:
    """(tail,) strictly-increasing f32-exact padding coordinates."""
    return (
        jnp.arange(1, tail + 1, dtype=dtype)
        * jnp.asarray(_PAD_COORD_SPACING, dtype)
        + jnp.asarray(_PAD_COORD_BASE, dtype)
    )


def lj_term(dsq):
    t = 1.0 / dsq
    t3 = t * t * t
    return 4.0 * t3 * (t3 - 1.0)


def lj_term_fast(dsq):
    """LJ via rsqrt (hardware-fast on the VPU) instead of a true divide:
    ~2-3 ulp on the reciprocal vs 0.5 — fine for the f32 headline mode
    (dominated by f32 coordinate rounding anyway); parity modes keep
    `lj_term`."""
    r = jax.lax.rsqrt(dsq)
    t = r * r
    t3 = t * t * t
    return 4.0 * t3 * (t3 - 1.0)


def count_term(dsq):
    return jnp.ones_like(dsq)


def split_f64(x64):
    """Split (..,) f64 values into (hi, lo) f32 planes with hi + lo == x64
    to f32x2 precision."""
    hi = x64.astype(jnp.float32)
    lo = (x64 - hi.astype(jnp.float64)).astype(jnp.float32)
    return hi, lo


def lag_coverage_ok(sorted_keys: jax.Array, strides: jax.Array, L: int,
                    reach=None):
    """True iff lag bound L covers every in-window pair:
    key[i] - key[i-L] > W for all *real* rows i.

    SENTINEL_KEY padding rows (capacity-class padding sorts last) are
    excluded: sentinel runs have zero key differences but no real pairs, so
    including them would force L toward the padded length and flag padded
    grids as uncovered forever.

    ``reach``: per-axis cell-distance multipliers for the widened
    minimum-image window (see `geometry.key_window`).
    """
    w = key_window(strides, reach)
    if sorted_keys.shape[0] <= L:
        return jnp.asarray(True)
    later = sorted_keys[L:]
    return jnp.all((later - sorted_keys[:-L] > w) | (later == SENTINEL_KEY))


def suggest_lag(sorted_keys_host, strides_host, granule: int = 128,
                reach=None) -> int:
    """Smallest granule multiple L with full coverage (host-side helper).
    SENTINEL_KEY padding rows are excluded like in `lag_coverage_ok`."""
    import numpy as np

    if reach is None:
        w = int(np.sum(strides_host))  # = key_window(strides)
    else:
        w = int(np.sum(np.asarray(strides_host) * np.asarray(reach)))
    keys = np.asarray(sorted_keys_host)
    n = len(keys)
    L = granule
    while L < n and not np.all(
        (keys[L:] - keys[:-L] > w) | (keys[L:] == SENTINEL_KEY)
    ):
        L *= 2
    return min(L, ((n + granule - 1) // granule) * granule)


def _pad_and_desentinel(sorted_keys: jax.Array, ntot: int) -> jax.Array:
    """Extend (n,) keys to ntot slots and replace every padding key
    (SENTINEL_KEY rows and the appended tail) with strictly ascending
    spaced keys starting at _PAD_KEY_BASE.

    Ascending spaced padding keys keep the kernels' early-exit alive: equal
    padding keys would hold the key window open forever (every lag "in
    window"), degrading padded grids to O(n*L). The spacing is the largest
    that cannot overflow int32, so a padding run expires after
    ceil(W / spacing) lags. Padding keys stay above every real key, so no
    real-vs-padding pair can enter the key window (real keys have headroom
    below _PAD_KEY_BASE)."""
    n = sorted_keys.shape[0]
    spacing = max(1, (jnp.iinfo(jnp.int32).max - _PAD_KEY_BASE - 1) // max(ntot, 1))
    keys_p = jnp.concatenate(
        [sorted_keys, jnp.full((ntot - n,), SENTINEL_KEY, jnp.int32)]
    )
    iota = jnp.arange(ntot, dtype=jnp.int32)
    return jnp.where(
        keys_p == SENTINEL_KEY,
        jnp.int32(_PAD_KEY_BASE) + iota * jnp.int32(spacing),
        keys_p,
    )


def _mi_pair_d(own, j, a, ncoord, split, mibox_ref, minimage):
    """Per-axis pair separation, optionally folded to the minimum image.

    ``minimage=True`` reads box[a] from the prefetched ``mibox_ref``
    (0 disables the axis: half = 0 makes both correction branches
    subtract a signed zero) and folds |d| > box/2 by one box length.
    The fold is EXACT in f32: the correcting branch has
    box/2 < |s| < 2*box, so Sterbenz applies to s -/+ box. In split
    mode the hi-difference across the wrap is no longer small, so its
    rounding error is recovered with an exact two-diff and carried into
    the lo term — split separations stay f64-grade through the wrap
    (the analogue of `pbc._twosum` ghost residuals, in-kernel).

    Requires box > 2*cutoff (the standard PBC regime flag): then at most
    one image of a pair is within cutoff, and pairs near |d| = box/2
    are beyond the cutoff under either image, so the fold direction for
    them is irrelevant.
    """
    if not minimage:
        d = own[a] - j[a]
        if split:
            d = d + (own[a + ncoord] - j[a + ncoord])
        return d
    bx = mibox_ref[a]
    half = 0.5 * bx
    s = own[a] - j[a]
    shift = jnp.where(
        s > half, bx, jnp.where(s < -half, -bx, jnp.zeros_like(s))
    )
    d = s - shift
    if split:
        z = s - own[a]
        e = (own[a] - (s - z)) - (j[a] + z)
        d = d + (e + (own[a + ncoord] - j[a + ncoord]))
    return d


def _make_kernel(M: int, L: int, term: Callable, n_planes: int, split: bool,
                 dtype, out_dtype, n_payload: int = 0,
                 payload_own_only: bool = False, minimage: bool = False):
    """Kernel over ``n_planes`` coordinate planes + ``n_payload`` payload
    planes + 1 key plane.

    Plane order: [x, y, z] (or [xh, yh, zh, xl, yl, zl] when split), then
    payload planes, then keys. With payload, ``term`` receives
    (dsq, own_payload_0.., j_payload_0..) and can implement
    species-dependent interactions.

    ``payload_own_only=True``: ``term`` only reads the i-side payloads
    (signature (dsq, own_payload_0..)), so the payload planes are excluded
    from the per-lag shift — the dominant per-lag cost is shifting planes,
    so every plane that doesn't need j-alignment is a direct saving (the
    column path's owner flag is the motivating case).
    """
    Mr, Lr = M // LANES, L // LANES
    Wr = Mr + Lr  # rolling window rows
    NP = n_planes + n_payload + 1  # + key plane
    # planes that must be shifted per lag (j-side access): coordinates +
    # key, plus payloads unless own-only
    n_shift = NP if not payload_own_only else n_planes + 1

    NS = 4 if minimage else 3  # scalar-prefetch count (+ mi box vector)

    def kernel(*refs):
        # refs: wkey, csq, min_islot, [mi_box], blocks (NP), out,
        #       window scratch (NP), kahan compensation scratch
        wkey_ref, csq_ref, mislot_ref = refs[0], refs[1], refs[2]
        mibox_ref = refs[3] if minimage else None
        blocks = refs[NS : NS + NP]
        out_ref = refs[NS + NP]
        wins = refs[NS + 1 + NP : NS + 1 + 2 * NP]
        comp_ref = refs[NS + 1 + 2 * NP]
        kb, kw = blocks[-1], wins[-1]

        p = pl.program_id(0)
        w_key = wkey_ref[0]
        csq = csq_ref[0]
        min_islot = mislot_ref[0]

        @pl.when(p == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)
            comp_ref[...] = jnp.zeros_like(comp_ref)
            # "nothing before the start": keys so small every real key is
            # out of the candidate window
            kw[0:Lr] = jnp.full(
                (Lr, LANES), jnp.iinfo(jnp.int32).min // 2, jnp.int32
            )
            for w in wins[:-1]:
                w[0:Lr] = jnp.zeros((Lr, LANES), dtype)

        @pl.when(p != 0)
        def _():
            # roll: keep the last L slots of the previous window
            for w in wins:
                w[0:Lr] = w[Wr - Lr : Wr]

        for w, b in zip(wins, blocks):
            w[Lr:Wr] = b[...]

        own = [w[Lr:Wr] for w in wins]
        own_k = own[-1]
        # ownership mask: only rows with global slot >= min_islot emit
        # pairs (distributed half-pair ownership: the device owning the
        # larger-slot endpoint counts the pair)
        own_slot = (
            jax.lax.broadcasted_iota(jnp.int32, (Mr, LANES), 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (Mr, LANES), 1)
            + p * M
        )
        own_owned = own_slot >= min_islot

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

        ncoord = n_planes // 2 if split else n_planes

        # Early-exit lag loop: the key window is monotone in lag — once no
        # own particle's lag-partner is key-in-window, no later lag can be
        # (j only gets older). Saves the padding between the data's true
        # max lag and the static bound L.
        def cond(carry):
            lag, active = carry[0], carry[1]
            return (lag <= L) & active

        kahan = jnp.issubdtype(out_dtype, jnp.floating)

        # planes carried through the per-lag shift: coordinates, payloads
        # (unless own-only), and the key plane (always last)
        if payload_own_only:
            shift_wins = list(wins[:n_planes]) + [wins[-1]]
        else:
            shift_wins = list(wins)

        def lag_body(carry):
            lag, active, *rest = carry
            *shifted, acc, comp = rest
            shifted = [shift_right_one(s) for s in shifted]
            j = [s[Lr:Wr] for s in shifted]
            jk = j[-1]
            dsq = jnp.zeros((Mr, LANES), dtype)
            for a in range(ncoord):
                d = _mi_pair_d(own, j, a, ncoord, split, mibox_ref,
                               minimage)
                dsq = dsq + d * d
            keymask = jk >= own_k - w_key
            mask = keymask & (dsq < csq) & own_owned
            safe = jnp.where(mask, dsq, jnp.ones_like(dsq))
            if n_payload and payload_own_only:
                vals = term(safe, *own[n_planes : n_planes + n_payload])
            elif n_payload:
                vals = term(
                    safe,
                    *own[n_planes : n_planes + n_payload],
                    *j[n_planes : n_planes + n_payload],
                )
            else:
                vals = term(safe)
            v = jnp.where(mask, vals, jnp.zeros_like(vals)).astype(out_dtype)
            if kahan:
                # Kahan-compensated per-lane accumulation: single pair terms
                # can exceed 1e14 while the ulp of a plain f32 accumulator
                # would then drop everything below ~1e7
                y = v - comp
                t = acc + y
                comp = (t - acc) - y
                acc = t
            else:
                acc = acc + v
            return (lag + 1, jnp.any(keymask), *shifted, acc, comp)

        init = (
            jnp.asarray(1, jnp.int32),
            jnp.asarray(True),
            *(w[...] for w in shift_wins),
            jnp.zeros((Mr, LANES), out_dtype),
            jnp.zeros((Mr, LANES), out_dtype),
        )
        *_, acc, comp = jax.lax.while_loop(cond, lag_body, init)
        if kahan:
            # compensated cross-program accumulation (programs are
            # sequential; comp_ref persists in scratch)
            prev = out_ref[...]
            y = (acc - comp) - comp_ref[...]
            t = prev + y
            comp_ref[...] = (t - prev) - y
            out_ref[...] = t

            @pl.when(p == pl.num_programs(0) - 1)
            def _():
                out_ref[...] = out_ref[...] - comp_ref[...]

        else:
            out_ref[...] += acc

    return kernel


def _make_per_particle_kernel(M: int, L: int, term: Callable, dtype):
    """Per-particle reduction kernel: out_i = sum over cutoff pairs (i, j)
    of term(dsq) — both endpoints receive the contribution (full-space
    per-particle sums: coordination numbers, per-particle energies with
    term/2, local densities). Same rolling-window + Horner machinery as the
    forces kernel with a single scalar accumulator plane.
    """
    Mr, Lr = M // LANES, L // LANES
    Wr = Mr + Lr

    def kernel(wkey_ref, csq_ref, xb, yb, zb, kb, out, xw, yw, zw, kw, fb):
        p = pl.program_id(0)
        num_p = pl.num_programs(0)
        w_key = wkey_ref[0]
        csq = csq_ref[0]

        @pl.when(p == 0)
        def _():
            kw[0:Lr] = jnp.full(
                (Lr, LANES), jnp.iinfo(jnp.int32).min // 2, jnp.int32
            )
            for w in (xw, yw, zw):
                w[0:Lr] = jnp.zeros((Lr, LANES), dtype)
            fb[...] = jnp.zeros((2 * Mr, LANES), dtype)

        @pl.when(p != 0)
        def _():
            fb[0:Mr] = fb[Mr : 2 * Mr]
            fb[Mr : 2 * Mr] = jnp.zeros((Mr, LANES), dtype)

        @pl.when((p != 0) & (p < num_p - 1))
        def _():
            for w in (xw, yw, zw, kw):
                w[0:Lr] = w[Wr - Lr : Wr]

        @pl.when(p < num_p - 1)
        def _():
            xw[Lr:Wr] = xb[...]
            yw[Lr:Wr] = yb[...]
            zw[Lr:Wr] = zb[...]
            kw[Lr:Wr] = kb[...]

        lane = jax.lax.broadcasted_iota(jnp.int32, (Wr, LANES), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (Wr, LANES), 0)
        is_lane0 = lane == 0
        is_flat0 = is_lane0 & (row == 0)

        def shift_right_one(v):
            a = pltpu.roll(v, 1, axis=1)
            return jnp.where(is_lane0, pltpu.roll(a, 1, axis=0), a)

        def shift_right_nowrap(v):
            return jnp.where(
                is_flat0, jnp.zeros((), v.dtype), shift_right_one(v)
            )

        @pl.when(p < num_p - 1)
        def _():
            own = [w[Lr:Wr] for w in (xw, yw, zw)]
            own_k = kw[Lr:Wr]
            padL = jnp.zeros((Lr, LANES), dtype)

            def lag_body(carry):
                lag, active, sx, sy, sz, sk, dj, ai = carry
                sx = shift_right_one(sx)
                sy = shift_right_one(sy)
                sz = shift_right_one(sz)
                sk = shift_right_one(sk)
                j = [s[Lr:Wr] for s in (sx, sy, sz)]
                jk = sk[Lr:Wr]
                dx = own[0] - j[0]
                dy = own[1] - j[1]
                dz = own[2] - j[2]
                dsq = dx * dx + dy * dy + dz * dz
                keymask = jk >= own_k - w_key
                mask = keymask & (dsq < csq) & (dsq > 0)
                c = jnp.where(
                    mask,
                    term(jnp.where(mask, dsq, jnp.ones_like(dsq))),
                    0.0,
                ).astype(dtype)
                ai += c
                dj = shift_right_nowrap(dj) + jnp.concatenate(
                    [c, padL], axis=0
                )
                return lag + 1, jnp.any(keymask), sx, sy, sz, sk, dj, ai

            init = (
                jnp.asarray(1, jnp.int32), jnp.asarray(True),
                xw[...], yw[...], zw[...], kw[...],
                jnp.zeros((Wr, LANES), dtype),
                jnp.zeros((Mr, LANES), dtype),
            )
            lag_end, _, *_r = full = jax.lax.while_loop(
                lambda c: (c[0] <= L) & c[1], lag_body, init
            )
            *_, dj, ai = full

            def tail_body(c):
                lag, dj = c
                return lag + 1, shift_right_nowrap(dj)

            _, dj = jax.lax.while_loop(
                lambda c: c[0] <= L, tail_body, (lag_end, dj)
            )
            fb[Mr - Lr : Mr + Mr] += dj  # j side (same sign: symmetric term)
            fb[Mr : 2 * Mr] += ai

        out[...] = fb[0:Mr]

    return kernel


@functools.partial(jax.jit, static_argnames=("M", "L", "term", "interpret"))
def pair_lag_per_particle(
    sorted_pos: jax.Array,
    sorted_keys: jax.Array,
    strides: jax.Array,
    cutoff_sq,
    *,
    M: int = 1024,
    L: int = 256,
    term: Callable = count_term,
    interpret: bool = False,
):
    """Per-particle sums over cutoff partners, sorted-slot order:
    out_i = sum_{j != i, dsq < cutoff_sq} term(dsq). Default term gives
    coordination numbers; use lj_term and multiply by 1/2 for per-particle
    energies. 3D only."""
    n = sorted_pos.shape[0]
    dtype = sorted_pos.dtype
    assert sorted_pos.shape[1] == 3
    assert M % LANES == 0 and L % LANES == 0 and L >= LANES and L <= M
    if not interpret:
        assert M % (8 * LANES) == 0, "compiled mode requires M % 1024 == 0"

    P = -(-n // M)
    tail = P * M - n
    keys_p = _pad_and_desentinel(sorted_keys, P * M)
    spread = _tail_spread(tail, dtype)
    planes = [
        jnp.concatenate([sorted_pos[:, a], spread]).reshape(-1, LANES)
        for a in range(3)
    ]
    kp = keys_p.reshape(-1, LANES)

    w_key = key_window(strides).astype(jnp.int32).reshape(1)
    csq = jnp.asarray(cutoff_sq, dtype).reshape(1)

    Mr = M // LANES
    kernel = _make_per_particle_kernel(M, L, term, dtype)
    bs = lambda: pl.BlockSpec(
        (Mr, LANES), lambda p, s1, s2: (jnp.minimum(p, P - 1), 0)
    )
    out_bs = pl.BlockSpec(
        (Mr, LANES),
        lambda p, s1, s2: (jnp.maximum(p - 1, 0), 0),
        memory_space=pltpu.VMEM,
    )
    win = lambda dt, rows: pltpu.VMEM((rows, LANES), dt)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(P + 1,),
        in_specs=[bs(), bs(), bs(), bs()],
        out_specs=out_bs,
        scratch_shapes=[
            win(dtype, Mr + L // LANES),
            win(dtype, Mr + L // LANES),
            win(dtype, Mr + L // LANES),
            win(jnp.int32, Mr + L // LANES),
            win(dtype, 2 * Mr),
        ],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((P * Mr, LANES), dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(w_key, csq, *planes, kp)
    return out.reshape(-1)[:n]


def _make_forces_kernel(M: int, L: int, gfn: Callable, dtype,
                        n_planes: int = 3, split: bool = False,
                        minimage: bool = False, n_payload: int = 0):
    """Forces kernel: per unique pair (i, j = i - lag), f_i += g(dsq) * d
    and f_j -= g(dsq) * d (Newton's third law).

    The j side lands at shifted window slots. A Horner-style accumulator
    collects all j contributions with one element shift per (ascending)
    lag: ``D <- shift_right_nowrap(D) + embed(c_lag)`` places c_lag (own
    position m, emitted at iteration lag) at final flat position
    m + (L - lag) ... shifted L - lag more times ... = L + m - lag, which
    is exactly j's window slot — no scatters, no misaligned stores. The
    shift zero-injects at flat 0 so roll wraparound never contaminates
    real slots.

    ``split=True`` takes 6 coordinate planes (hi, then lo f32 parts, see
    `split_f64`): pair separations are ``(hi_i - hi_j) + (lo_i - lo_j)``,
    exact in the leading term for nearby pairs — f64-grade forces at f32
    speed (same scheme as the energy kernel).

    Completed force blocks flush to HBM one block behind the compute
    (block p-1 is final once program p ends, since the backward reach is
    L <= M); the grid runs one extra program to flush the last block.

    ``n_payload`` per-particle payload planes (after the coordinate
    planes) parameterize the interaction: ``gfn`` then receives
    ``(dsq, own_0.., j_0..)`` — species-dependent force factors
    (e.g. `ops.potentials.lennard_jones_mixed`). One kernel evaluation
    serves both Newton sides, so action = reaction holds for ANY gfn;
    physical gfns should still be symmetric under (own, j) swap.
    """
    Mr, Lr = M // LANES, L // LANES
    Wr = Mr + Lr
    NP = n_planes + n_payload + 1  # + key plane
    ncoord = n_planes // 2 if split else n_planes

    NS = 3 if minimage else 2  # scalar-prefetch count (+ mi box vector)

    def kernel(*refs):
        # refs: wkey, csq, [mi_box], blocks (NP), force outs (3),
        #       window scratch (NP), force double-buffers (3)
        wkey_ref, csq_ref = refs[0], refs[1]
        mibox_ref = refs[2] if minimage else None
        blocks = refs[NS : NS + NP]
        fouts = refs[NS + NP : NS + 3 + NP]
        wins = refs[NS + 3 + NP : NS + 3 + 2 * NP]
        fbufs = refs[NS + 3 + 2 * NP : NS + 6 + 2 * NP]
        kb, kw = blocks[-1], wins[-1]

        p = pl.program_id(0)
        num_p = pl.num_programs(0)
        w_key = wkey_ref[0]
        csq = csq_ref[0]

        @pl.when(p == 0)
        def _():
            kw[0:Lr] = jnp.full(
                (Lr, LANES), jnp.iinfo(jnp.int32).min // 2, jnp.int32
            )
            for w in wins[:-1]:
                w[0:Lr] = jnp.zeros((Lr, LANES), dtype)
            for f in fbufs:
                f[...] = jnp.zeros((2 * Mr, LANES), dtype)

        # roll the force double-buffer: own block becomes "previous"
        @pl.when(p != 0)
        def _():
            for f in fbufs:
                f[0:Mr] = f[Mr : 2 * Mr]
                f[Mr : 2 * Mr] = jnp.zeros((Mr, LANES), dtype)

        @pl.when((p != 0) & (p < num_p - 1))
        def _():
            for w in wins:
                w[0:Lr] = w[Wr - Lr : Wr]

        @pl.when(p < num_p - 1)
        def _():
            for w, b in zip(wins, blocks):
                w[Lr:Wr] = b[...]

        lane = jax.lax.broadcasted_iota(jnp.int32, (Wr, LANES), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (Wr, LANES), 0)
        is_lane0 = lane == 0
        is_flat0 = is_lane0 & (row == 0)

        def shift_right_one(v):
            a = pltpu.roll(v, 1, axis=1)
            return jnp.where(is_lane0, pltpu.roll(a, 1, axis=0), a)

        def shift_right_nowrap(v):
            return jnp.where(
                is_flat0, jnp.zeros((), v.dtype), shift_right_one(v)
            )

        @pl.when(p < num_p - 1)
        def _():
            own = [w[Lr:Wr] for w in wins]
            own_k = own[-1]
            padL = jnp.zeros((Lr, LANES), dtype)

            def lag_body(carry):
                lag, active, *rest = carry
                shifted = [shift_right_one(s) for s in rest[:NP]]
                horner = list(rest[NP : NP + 3])
                acc = list(rest[NP + 3 : NP + 6])
                j = [s[Lr:Wr] for s in shifted]
                jk = j[-1]
                d = [
                    _mi_pair_d(own, j, a, ncoord, split, mibox_ref,
                               minimage)
                    for a in range(3)
                ]
                dsq = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
                keymask = jk >= own_k - w_key
                mask = keymask & (dsq < csq) & (dsq > 0)
                safe = jnp.where(mask, dsq, jnp.ones_like(dsq))
                if n_payload:
                    gv = gfn(
                        safe,
                        *own[n_planes : n_planes + n_payload],
                        *j[n_planes : n_planes + n_payload],
                    )
                else:
                    gv = gfn(safe)
                g = jnp.where(mask, gv, 0.0).astype(dtype)
                for a in range(3):
                    c = g * d[a]
                    acc[a] = acc[a] + c
                    # Horner accumulation of the j side: embed c at [0:Mr]
                    horner[a] = shift_right_nowrap(horner[a]) + jnp.concatenate(
                        [c, padL], axis=0
                    )
                return (
                    lag + 1, jnp.any(keymask), *shifted, *horner, *acc,
                )

            zW = jnp.zeros((Wr, LANES), dtype)
            zM = jnp.zeros((Mr, LANES), dtype)
            init = (
                jnp.asarray(1, jnp.int32), jnp.asarray(True),
                *(w[...] for w in wins),
                zW, zW, zW, zM, zM, zM,
            )
            # Phase 1: compute while any lag partner is key-in-window
            # (monotone, same early exit as the energy kernel).
            out = jax.lax.while_loop(
                lambda c: (c[0] <= L) & c[1], lag_body, init
            )
            lag_end = out[0]
            horner = list(out[2 + NP : 5 + NP])
            acc = out[5 + NP : 8 + NP]

            # Phase 2: the Horner accumulator still needs its remaining
            # L - (lag_end - 1) shifts to land contributions at their final
            # positions — shift-only, no pair compute.
            def tail_body(c):
                return (c[0] + 1, *(shift_right_nowrap(v) for v in c[1:]))

            _, *horner = jax.lax.while_loop(
                lambda c: c[0] <= L, tail_body, (lag_end, *horner)
            )
            # c_lag embeds at flat m, then receives (L - lag) shifts:
            # final flat = m + L - lag == j's window slot. D aligns with
            # window slots; window flat 0 is global p*M - L = force-buffer
            # row Mr - Lr.
            for f, c, a in zip(fbufs, horner, acc):
                f[Mr - Lr : Mr + Mr] += -c  # j side (Newton)
                f[Mr : 2 * Mr] += a

        # flush the completed previous block
        for fo, f in zip(fouts, fbufs):
            fo[...] = f[0:Mr]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("M", "L", "gfn", "interpret")
)
def pair_lag_forces(
    sorted_pos: jax.Array,  # (n, 3) cell-key-sorted positions
    sorted_keys: jax.Array,
    strides: jax.Array,
    cutoff_sq,
    sorted_pos_lo: jax.Array | None = None,  # (n, 3) f32x2 low parts
    sorted_payload: jax.Array | None = None,  # (n, P) per-particle payload
    *,
    M: int = 1024,
    L: int = 256,
    gfn: Callable = None,
    interpret: bool = False,
    mi_box: jax.Array | None = None,
    key_reach=None,
):
    """Per-particle pairwise forces in sorted-slot order.

    ``sorted_payload`` ((n, P), sorted order) parameterizes the
    interaction: ``gfn`` then receives ``(dsq, own_0.., j_0..)`` —
    species-dependent forces (`ops.potentials.lennard_jones_mixed`) in
    the same payload convention as `pair_lag_reduce`.

    ``mi_box``/``key_reach``: in-kernel minimum-image folding for narrow
    periodic axes (see `pair_lag_reduce`); Newton's +/- g*d uses the
    FOLDED separation, which is exactly the minimum-image force.

    f_i = sum over unique cutoff pairs of ``gfn(dsq) * (p_i - p_j)`` with
    the equal-and-opposite contribution on j. 3D only (the XLA
    `core.pairs.pair_forces` path is N-dimensional). Self/coincident particles
    (dsq == 0) are excluded (matching `pair_forces` semantics: the
    reference leaves r == 0 to the caller; LJ diverges there anyway).

    Passing ``sorted_pos_lo`` (f32 low parts from `split_f64`) enables
    split-precision pair separations — f64-grade force directions and
    magnitudes at f32 speed, removing the ~1e-2-class coordinate
    cancellation error in large boxes (same scheme as `pair_lag_reduce`).

    Returns (n, 3) forces aligned with `sorted_pos`.
    """
    if gfn is None:
        from .lj import lj_force_factor as gfn  # default LJ

    n = sorted_pos.shape[0]
    split = sorted_pos_lo is not None
    dtype = sorted_pos.dtype
    assert sorted_pos.shape[1] == 3, "pair_lag_forces is 3D-only"
    assert M % LANES == 0 and L % LANES == 0 and L >= LANES and L <= M
    if not interpret:
        assert M % (8 * LANES) == 0, "compiled mode requires M % 1024 == 0"

    P = -(-n // M)
    tail = P * M - n
    keys_p = _pad_and_desentinel(sorted_keys, P * M)
    spread = _tail_spread(tail, dtype)
    planes = [
        jnp.concatenate([sorted_pos[:, a], spread]).reshape(-1, LANES)
        for a in range(3)
    ]
    if split:
        planes += [
            jnp.concatenate(
                [sorted_pos_lo[:, a], jnp.zeros_like(spread)]
            ).reshape(-1, LANES)
            for a in range(3)
        ]
    n_planes = len(planes)
    n_payload = 0 if sorted_payload is None else sorted_payload.shape[1]
    for a in range(n_payload):
        planes.append(
            jnp.concatenate(
                [sorted_payload[:, a].astype(dtype), jnp.zeros_like(spread)]
            ).reshape(-1, LANES)
        )
    kp = keys_p.reshape(-1, LANES)

    w_key = key_window(strides, key_reach).astype(jnp.int32).reshape(1)
    csq = jnp.asarray(cutoff_sq, dtype).reshape(1)
    minimage = mi_box is not None
    scalars = [w_key, csq]
    if minimage:
        scalars.append(jnp.asarray(mi_box, dtype).reshape(3))

    Mr = M // LANES
    kernel = _make_forces_kernel(M, L, gfn, dtype, n_planes, split,
                                 minimage=minimage, n_payload=n_payload)
    # one extra program flushes the final block; its block reads clamp to
    # the last real block (compute masked off)
    bs = lambda: pl.BlockSpec(
        (Mr, LANES), lambda p, *s: (jnp.minimum(p, P - 1), 0)
    )
    out_bs = pl.BlockSpec(
        (Mr, LANES),
        lambda p, *s: (jnp.maximum(p - 1, 0), 0),
        memory_space=pltpu.VMEM,
    )
    win = lambda dt, rows: pltpu.VMEM((rows, LANES), dt)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(P + 1,),
        in_specs=[bs() for _ in range(n_planes + n_payload + 1)],
        out_specs=[out_bs, out_bs, out_bs],
        scratch_shapes=[win(dtype, Mr + L // LANES)
                        for _ in range(n_planes + n_payload)]
        + [
            win(jnp.int32, Mr + L // LANES),
            win(dtype, 2 * Mr),
            win(dtype, 2 * Mr),
            win(dtype, 2 * Mr),
        ],
    )
    fx, fy, fz = pl.pallas_call(
        kernel,
        out_shape=[jax.ShapeDtypeStruct((P * Mr, LANES), dtype)] * 3,
        grid_spec=grid_spec,
        interpret=interpret,
    )(*scalars, *planes, kp)
    forces = jnp.stack(
        [fx.reshape(-1)[:n], fy.reshape(-1)[:n], fz.reshape(-1)[:n]], axis=-1
    )
    return forces


@functools.partial(
    jax.jit,
    static_argnames=("M", "L", "term", "interpret", "out_dtype",
                     "payload_own_only"),
)
def pair_lag_reduce(
    sorted_pos: jax.Array,  # (n, 3) cell-key-sorted positions (hi part)
    sorted_keys: jax.Array,  # (n,) ascending flat cell keys
    strides: jax.Array,  # (3,) grid strides (ascending)
    cutoff_sq,
    sorted_pos_lo: jax.Array | None = None,  # (n, 3) f32x2 low parts
    sorted_payload: jax.Array | None = None,  # (n, P) per-particle payload
    *,
    M: int = 1024,
    L: int = 256,
    term: Callable = lj_term,
    interpret: bool = False,
    out_dtype=None,
    min_islot=0,
    payload_own_only: bool = False,
    mi_box: jax.Array | None = None,
    key_reach=None,
):
    """Sum ``term(dsq)`` over all unique cutoff-filtered pairs.

    ``mi_box``: optional (dim,) per-axis box lengths for IN-KERNEL
    minimum-image folding (0 disables an axis) — narrow periodic axes
    need no ghost images at all (see `_mi_pair_d`); pass ``key_reach``
    (per-axis cell spans, `geometry.key_window`) so the key window
    admits wrap-adjacent cells.

    L must satisfy `lag_coverage_ok` (host/XLA-checked separately; one
    shifted vector compare). M must be a multiple of 1024 (compiled), L a
    multiple of 128, L <= M.

    Passing ``sorted_pos_lo`` (the f32 low parts of the original f64
    coordinates, see `split_f64`) enables split-precision pair separations:
    ``dx = (hi_i - hi_j) + (lo_i - lo_j)`` — f64-grade distances at f32
    speed (see module docstring).

    ``min_islot``: only pairs whose larger-slot endpoint has sorted slot
    >= min_islot are counted — the distributed ownership rule for halo
    regions (a device reduces over [left ghosts | owned] with
    min_islot = #ghosts and each pair is counted exactly once globally).

    ``sorted_payload``: optional (n, P) per-particle payload in sorted
    order (carry it through `bin_and_sort` as extra columns); ``term``
    then receives (dsq, own_0..own_{P-1}, j_0..j_{P-1}) for species- or
    charge-dependent interactions (the analogue of the reference's
    arbitrary `P: ParticleLike` pair items).
    """
    n = sorted_pos.shape[0]
    split = sorted_pos_lo is not None
    dtype = sorted_pos.dtype
    out_dtype = out_dtype or dtype
    assert M % LANES == 0 and L % LANES == 0 and L >= LANES
    assert L <= M, "rolling window requires L <= M"
    if not interpret:
        # Mosaic block tiling: (Mr, 128) blocks need Mr % 8 == 0 (f32)
        assert M % (8 * LANES) == 0, "compiled mode requires M % 1024 == 0"

    P = -(-n // M)
    tail = P * M - n

    # Tail padding: ascending spaced keys above every real key (see
    # _pad_and_desentinel) with spread-out coordinates so every padded dsq
    # exceeds any cutoff.
    keys_p = _pad_and_desentinel(sorted_keys, P * M)
    spread = _tail_spread(tail, dtype)
    dim = sorted_pos.shape[1]
    planes = [
        jnp.concatenate([sorted_pos[:, a], spread]).reshape(-1, LANES)
        for a in range(dim)
    ]
    if split:
        planes += [
            jnp.concatenate(
                [sorted_pos_lo[:, a], jnp.zeros_like(spread)]
            ).reshape(-1, LANES)
            for a in range(dim)
        ]
    n_planes = len(planes)
    n_payload = 0 if sorted_payload is None else sorted_payload.shape[1]
    for a in range(n_payload):
        planes.append(
            jnp.concatenate(
                [sorted_payload[:, a].astype(dtype), jnp.zeros_like(spread)]
            ).reshape(-1, LANES)
        )
    kp = keys_p.reshape(-1, LANES)

    w_key = key_window(strides, key_reach).astype(jnp.int32).reshape(1)
    csq = jnp.asarray(cutoff_sq, dtype).reshape(1)
    mislot = jnp.asarray(min_islot, jnp.int32).reshape(1)
    minimage = mi_box is not None
    scalars = [w_key, csq, mislot]
    if minimage:
        scalars.append(jnp.asarray(mi_box, dtype).reshape(dim))

    Mr = M // LANES
    kernel = _make_kernel(
        M, L, term, n_planes, split, dtype, out_dtype, n_payload=n_payload,
        payload_own_only=payload_own_only, minimage=minimage,
    )
    bs = lambda: pl.BlockSpec((Mr, LANES), lambda p, *s: (p, 0))
    win = lambda dt: pltpu.VMEM((Mr + L // LANES, LANES), dt)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(P,),
        in_specs=[bs() for _ in range(n_planes + n_payload + 1)],
        out_specs=pl.BlockSpec(
            (Mr, LANES), lambda p, *s: (0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[win(dtype) for _ in range(n_planes + n_payload)]
        + [win(jnp.int32), pltpu.VMEM((Mr, LANES), out_dtype)],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Mr, LANES), out_dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(*scalars, *planes, kp)
    if jnp.issubdtype(out_dtype, jnp.integer):
        # Overflow-safe integer total: per-element block sums stay far below
        # 2^31, but the grand total wraps int32 near ~2.1e9 pairs (n~1e8 at
        # reference density is within 7%). Sum the 16-bit planes separately
        # and reconstruct host-side with `combine_count`.
        lo = jnp.sum(out & 0xFFFF)
        hi = jnp.sum(out >> 16)
        return jnp.stack([hi, lo])
    return jnp.sum(out)


def _make_stress_kernel(M: int, L: int, gfn: Callable, n_planes: int,
                        split: bool, dtype, n_payload: int, pair_mask,
                        minimage: bool = False, pair_weight=None):
    """Direct pair-sum stress kernel: accumulates the ncomp upper-triangle
    components of sigma_ab = sum_pairs gfn(dsq) * d_a * d_b, each
    Kahan-compensated, into a revisited (ncomp*Mr, LANES) VMEM block.

    Unlike the forces-pass + r (x) f contraction (`virial._rf_contract`),
    every accumulated term here is bounded by |gfn| * cutoff^2 — no
    box-scale cancellation — so split-precision inputs reach ~1e-7
    relative error where the contraction floor was ~3e-6 (the f32
    rounding of the stored forces re-amplified by |r| ~ box/2).

    Same rolling-window machinery as `_make_kernel`; ``pair_mask``
    (payload-based, hist-kernel style) composes the PBC image-dedup /
    ownership rules unchanged, so PBC stress is ONE pass (the fused
    three-pass ghost decomposition is superseded).
    """
    Mr, Lr = M // LANES, L // LANES
    Wr = Mr + Lr
    NP = n_planes + n_payload + 1  # + key plane
    ncoord = n_planes // 2 if split else n_planes
    comps = [(a, b) for a in range(ncoord) for b in range(a, ncoord)]
    ncomp = len(comps)

    NS = 4 if minimage else 3  # scalar-prefetch count (+ mi box vector)

    def kernel(*refs):
        # refs: wkey, csq, min_islot, [mi_box], blocks (NP),
        #       out (ncomp*Mr, LANES), window scratch (NP),
        #       comp scratch (ncomp*Mr, LANES)
        wkey_ref, csq_ref, mislot_ref = refs[0], refs[1], refs[2]
        mibox_ref = refs[3] if minimage else None
        blocks = refs[NS : NS + NP]
        out_ref = refs[NS + NP]
        wins = refs[NS + 1 + NP : NS + 1 + 2 * NP]
        comp_ref = refs[NS + 1 + 2 * NP]
        kw = wins[-1]

        p = pl.program_id(0)
        w_key = wkey_ref[0]
        csq = csq_ref[0]
        min_islot = mislot_ref[0]

        @pl.when(p == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)
            comp_ref[...] = jnp.zeros_like(comp_ref)
            kw[0:Lr] = jnp.full(
                (Lr, LANES), jnp.iinfo(jnp.int32).min // 2, jnp.int32
            )
            for w in wins[:-1]:
                w[0:Lr] = jnp.zeros((Lr, LANES), dtype)

        @pl.when(p != 0)
        def _():
            for w in wins:
                w[0:Lr] = w[Wr - Lr : Wr]

        for w, b in zip(wins, blocks):
            w[Lr:Wr] = b[...]

        own = [w[Lr:Wr] for w in wins]
        own_k = own[-1]
        own_slot = (
            jax.lax.broadcasted_iota(jnp.int32, (Mr, LANES), 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (Mr, LANES), 1)
            + p * M
        )
        own_owned = own_slot >= min_islot

        lane = jax.lax.broadcasted_iota(jnp.int32, (Wr, LANES), 1)
        is_lane0 = lane == 0

        def shift_right_one(v):
            a = pltpu.roll(v, 1, axis=1)
            return jnp.where(is_lane0, pltpu.roll(a, 1, axis=0), a)

        def cond(carry):
            lag, active = carry[0], carry[1]
            return (lag <= L) & active

        def lag_body(carry):
            lag, active, *rest = carry
            shifted = rest[:NP]
            accs = list(rest[NP : NP + ncomp])
            cmps = list(rest[NP + ncomp :])
            shifted = [shift_right_one(s) for s in shifted]
            j = [s[Lr:Wr] for s in shifted]
            jk = j[-1]
            d = []
            dsq = jnp.zeros((Mr, LANES), dtype)
            for a in range(ncoord):
                da = _mi_pair_d(own, j, a, ncoord, split, mibox_ref,
                                minimage)
                d.append(da)
                dsq = dsq + da * da
            keymask = jk >= own_k - w_key
            # dsq > 0 excludes self and coincident pairs: gfn(0) = inf
            # for LJ and inf * d_a * d_b = inf * 0 = NaN would poison
            # every accumulator component (the forces kernels have the
            # same guard; the energy path deliberately keeps inf)
            mask = keymask & (dsq < csq) & (dsq > 0) & own_owned
            if n_payload and pair_mask is not None:
                mask = mask & pair_mask(
                    *own[n_planes : n_planes + n_payload],
                    *j[n_planes : n_planes + n_payload],
                )
            safe = jnp.where(mask, dsq, jnp.ones_like(dsq))
            g = jnp.where(mask, gfn(safe), jnp.zeros_like(safe))
            if pair_weight is not None:
                g = g * pair_weight(
                    *own[n_planes : n_planes + n_payload],
                    *j[n_planes : n_planes + n_payload],
                )
            for k, (a, b) in enumerate(comps):
                # masked rows: g == 0 and d finite (padding coordinates
                # are large but < f32 max), so the product is exactly 0
                v = (g * d[a]) * d[b]
                y = v - cmps[k]
                t = accs[k] + y
                cmps[k] = (t - accs[k]) - y
                accs[k] = t
            return (lag + 1, jnp.any(keymask), *shifted, *accs, *cmps)

        zeros = [jnp.zeros((Mr, LANES), dtype) for _ in range(2 * ncomp)]
        init = (
            jnp.asarray(1, jnp.int32),
            jnp.asarray(True),
            *(w[...] for w in wins),
            *zeros,
        )
        out = jax.lax.while_loop(cond, lag_body, init)
        accs = out[2 + NP : 2 + NP + ncomp]
        cmps = out[2 + NP + ncomp :]
        for k in range(ncomp):
            rows = slice(k * Mr, (k + 1) * Mr)
            prev = out_ref[rows]
            y = (accs[k] - cmps[k]) - comp_ref[rows]
            t = prev + y
            comp_ref[rows] = (t - prev) - y
            out_ref[rows] = t

        @pl.when(p == pl.num_programs(0) - 1)
        def _():
            out_ref[...] = out_ref[...] - comp_ref[...]

    return kernel


def pair_lag_stress(
    sorted_pos: jax.Array,
    sorted_keys: jax.Array,
    strides: jax.Array,
    cutoff_sq,
    sorted_pos_lo: jax.Array | None = None,
    sorted_payload: jax.Array | None = None,
    *,
    gfn: Callable | None = None,
    M: int = 1024,
    L: int = 256,
    interpret: bool = False,
    min_islot=0,
    pair_mask=None,
    pair_weight=None,
    mi_box: jax.Array | None = None,
    key_reach=None,
):
    """Configurational stress tensor sigma_ab = sum_pairs gfn(dsq) d_a d_b
    over unique cutoff pairs, as a DIRECT fused pair sum (the pair list
    never materializes; each term is bounded by |gfn|*cutoff^2, so there
    is no box-scale cancellation — see `_make_stress_kernel`). Returns a
    symmetric (dim, dim) array; its trace is the scalar virial W.

    ``pair_mask`` + ``sorted_payload`` compose exactly like
    `pair_lag_hist` (PBC image dedup via the shift-sign plane, halo
    ownership via ``min_islot``). ``mi_box``/``key_reach`` enable
    in-kernel minimum-image folding for narrow periodic axes exactly
    like `pair_lag_reduce` (see `_mi_pair_d`: the folded separation
    feeds BOTH dsq and the d_a d_b outer product, so the stress of a
    wrapped pair uses the image vector — the correct configurational
    convention). ``pair_weight`` (payload-consuming, MULTIPLICATIVE —
    the stress analogue of the term-weighting trick the sharded energy
    paths use) scales each pair's g: the distributed ownership rule
    ``0.5 * (o_i + o_j)`` makes the global psum of per-device tensors
    exact. The reference exposes raw pair iteration from which users
    fold such sums (`/root/reference/src/cellgrid.rs:338-340`).
    """
    from .lj import lj_force_factor

    gfn = gfn or lj_force_factor
    n = sorted_pos.shape[0]
    split = sorted_pos_lo is not None
    dtype = sorted_pos.dtype
    assert M % LANES == 0 and L % LANES == 0 and L >= LANES
    assert L <= M, "rolling window requires L <= M"
    if not interpret:
        assert M % (8 * LANES) == 0, "compiled mode requires M % 1024 == 0"

    P = -(-n // M)
    tail = P * M - n

    keys_p = _pad_and_desentinel(sorted_keys, P * M)
    spread = _tail_spread(tail, dtype)
    dim = sorted_pos.shape[1]
    planes = [
        jnp.concatenate([sorted_pos[:, a], spread]).reshape(-1, LANES)
        for a in range(dim)
    ]
    if split:
        planes += [
            jnp.concatenate(
                [sorted_pos_lo[:, a], jnp.zeros_like(spread)]
            ).reshape(-1, LANES)
            for a in range(dim)
        ]
    n_planes = len(planes)
    n_payload = 0 if sorted_payload is None else sorted_payload.shape[1]
    assert (n_payload == 0) == (
        pair_mask is None and pair_weight is None
    ), "pair_mask/pair_weight and sorted_payload go together"
    for a in range(n_payload):
        planes.append(
            jnp.concatenate(
                [sorted_payload[:, a].astype(dtype), jnp.zeros_like(spread)]
            ).reshape(-1, LANES)
        )
    kp = keys_p.reshape(-1, LANES)

    w_key = key_window(strides, key_reach).astype(jnp.int32).reshape(1)
    csq = jnp.asarray(cutoff_sq, dtype).reshape(1)
    mislot = jnp.asarray(min_islot, jnp.int32).reshape(1)
    minimage = mi_box is not None
    scalars = [w_key, csq, mislot]
    if minimage:
        scalars.append(jnp.asarray(mi_box, dtype).reshape(dim))

    Mr = M // LANES
    ncomp = dim * (dim + 1) // 2
    kernel = _make_stress_kernel(
        M, L, gfn, n_planes, split, dtype, n_payload, pair_mask,
        minimage=minimage, pair_weight=pair_weight,
    )
    bs = lambda: pl.BlockSpec((Mr, LANES), lambda p, *s: (p, 0))
    win = lambda dt: pltpu.VMEM((Mr + L // LANES, LANES), dt)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(P,),
        in_specs=[bs() for _ in range(n_planes + n_payload + 1)],
        out_specs=pl.BlockSpec(
            (ncomp * Mr, LANES),
            lambda p, *s: (0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[win(dtype) for _ in range(n_planes + n_payload)]
        + [win(jnp.int32), pltpu.VMEM((ncomp * Mr, LANES), dtype)],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ncomp * Mr, LANES), dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(*scalars, *planes, kp)
    sums = jnp.sum(out.reshape(ncomp, Mr, LANES), axis=(1, 2))
    sig = jnp.zeros((dim, dim), dtype)
    k = 0
    for a in range(dim):
        for b in range(a, dim):
            sig = sig.at[a, b].set(sums[k])
            if b != a:
                sig = sig.at[b, a].set(sums[k])
            k += 1
    return sig


def combine_count(packed) -> int:
    """Reconstruct the exact pair count from the (hi, lo) int32 planes
    returned by `pair_lag_reduce` with an integer out_dtype. Also accepts
    a plain scalar count (float accumulation) for convenience."""
    import numpy as np

    v = np.asarray(packed)
    if v.ndim == 0:
        return int(round(float(v)))
    return (int(v[0]) << 16) + int(v[1])


def combine_count_vec(packed):
    """Vector sibling of `combine_count`: (2, K) int32 (hi, lo) planes ->
    (K,) int64 counts (overflow-safe past 2^31 per bin)."""
    import numpy as np

    v = np.asarray(packed, np.int64)
    return (v[0] << 16) + v[1]


def _make_hist_kernel(M: int, L: int, K: int, n_planes: int, split: bool,
                      dtype, n_payload: int, pair_mask,
                      minimage: bool = False):
    """Pair-distance histogram kernel: per lag, one masked candidate tile
    is classified against K ascending squared-distance edges and counted
    CUMULATIVELY (count_k = #pairs with dsq < edges[k]); the caller diffs
    adjacent bins for shell counts. Cumulative counting needs one compare
    per bin (a two-sided bin test would need two), and the K per-bin
    accumulator planes live directly in the revisited VMEM output block
    (rows [k*Mr, (k+1)*Mr)), so cost is linear in K with no extra scratch.

    Same rolling-window / shift machinery as `_make_kernel`; the pair mask
    (key window, cutoff = edges[-1], slot ownership, optional payload rule
    ``pair_mask``) is identical, so every masking invariant (PBC image
    dedup, halo ownership, padding exclusion) composes unchanged.

    The reference has no histogram support — users bin pairs in their own
    iterator closure (`/root/reference/src/cellgrid.rs:338-340`); here the
    bins accumulate inside the fused kernel so the pair list never exists.
    """
    Mr, Lr = M // LANES, L // LANES
    Wr = Mr + Lr
    NP = n_planes + n_payload + 1  # + key plane

    NS = 4 if minimage else 3  # scalar-prefetch count (+ mi box vector)

    def kernel(*refs):
        # refs: wkey, edges (K,), min_islot, [mi_box], blocks (NP),
        #       out (K*Mr, LANES), window scratch (NP)
        wkey_ref, edges_ref, mislot_ref = refs[0], refs[1], refs[2]
        mibox_ref = refs[3] if minimage else None
        blocks = refs[NS : NS + NP]
        out_ref = refs[NS + NP]
        wins = refs[NS + 1 + NP : NS + 1 + 2 * NP]
        kw = wins[-1]

        p = pl.program_id(0)
        w_key = wkey_ref[0]
        csq = edges_ref[K - 1]
        min_islot = mislot_ref[0]

        @pl.when(p == 0)
        def _():
            out_ref[...] = jnp.zeros_like(out_ref)
            kw[0:Lr] = jnp.full(
                (Lr, LANES), jnp.iinfo(jnp.int32).min // 2, jnp.int32
            )
            for w in wins[:-1]:
                w[0:Lr] = jnp.zeros((Lr, LANES), dtype)

        @pl.when(p != 0)
        def _():
            for w in wins:
                w[0:Lr] = w[Wr - Lr : Wr]

        for w, b in zip(wins, blocks):
            w[Lr:Wr] = b[...]

        own = [w[Lr:Wr] for w in wins]
        own_k = own[-1]
        own_slot = (
            jax.lax.broadcasted_iota(jnp.int32, (Mr, LANES), 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (Mr, LANES), 1)
            + p * M
        )
        own_owned = own_slot >= min_islot

        lane = jax.lax.broadcasted_iota(jnp.int32, (Wr, LANES), 1)
        is_lane0 = lane == 0

        def shift_right_one(v):
            a = pltpu.roll(v, 1, axis=1)
            return jnp.where(is_lane0, pltpu.roll(a, 1, axis=0), a)

        ncoord = n_planes // 2 if split else n_planes
        big = jnp.asarray(jnp.finfo(dtype).max, dtype)

        def cond(carry):
            lag, active = carry[0], carry[1]
            return (lag <= L) & active

        def lag_body(carry):
            lag, active, *shifted = carry
            shifted = [shift_right_one(s) for s in shifted]
            j = [s[Lr:Wr] for s in shifted]
            jk = j[-1]
            dsq = jnp.zeros((Mr, LANES), dtype)
            for a in range(ncoord):
                d = _mi_pair_d(own, j, a, ncoord, split, mibox_ref,
                               minimage)
                dsq = dsq + d * d
            keymask = jk >= own_k - w_key
            mask = keymask & (dsq < csq) & own_owned
            if n_payload:
                mask = mask & pair_mask(
                    *own[n_planes : n_planes + n_payload],
                    *j[n_planes : n_planes + n_payload],
                )
            # masked-out candidates compare above every edge
            safe = jnp.where(mask, dsq, big)
            for k in range(K):
                out_ref[k * Mr : (k + 1) * Mr] += (
                    safe < edges_ref[k]
                ).astype(jnp.int32)
            return (lag + 1, jnp.any(keymask), *shifted)

        init = (
            jnp.asarray(1, jnp.int32),
            jnp.asarray(True),
            *(w[...] for w in wins),
        )
        jax.lax.while_loop(cond, lag_body, init)

    return kernel


def pair_lag_hist(
    sorted_pos: jax.Array,
    sorted_keys: jax.Array,
    strides: jax.Array,
    edges_sq: jax.Array,  # (K,) ascending squared distance edges
    sorted_pos_lo: jax.Array | None = None,
    sorted_payload: jax.Array | None = None,
    *,
    M: int = 1024,
    L: int = 256,
    interpret: bool = False,
    min_islot=0,
    pair_mask=None,
    mi_box: jax.Array | None = None,
    key_reach=None,
):
    """Cumulative pair-distance histogram over unique cutoff pairs:
    ``out[k] = #pairs with dsq < edges_sq[k]`` (shell counts = adjacent
    diffs). The effective cutoff is ``sqrt(edges_sq[-1])`` — the grid the
    keys were built with must use a cutoff >= that. Returns (2, K) int32
    (hi, lo) 16-bit planes; reconstruct with `combine_count_vec`
    (overflow-safe past 2^31 pairs per bin).

    ``K = len(edges_sq)`` is static; kernel cost is linear in K (one
    compare + one accumulate per bin per lag), so a 64-bin histogram costs
    a few energy passes — still no pair list anywhere. ``pair_mask`` +
    ``sorted_payload`` mask candidate pairs exactly like the payload terms
    of `pair_lag_reduce` (PBC image dedup, species filters); ``min_islot``
    is the distributed halo ownership rule. ``mi_box``/``key_reach``
    enable in-kernel minimum-image folding for narrow periodic axes,
    exactly like `pair_lag_reduce` (binned distances are image
    distances).
    """
    n = sorted_pos.shape[0]
    split = sorted_pos_lo is not None
    dtype = sorted_pos.dtype
    K = edges_sq.shape[0]
    assert M % LANES == 0 and L % LANES == 0 and L >= LANES
    assert L <= M, "rolling window requires L <= M"
    if not interpret:
        assert M % (8 * LANES) == 0, "compiled mode requires M % 1024 == 0"

    P = -(-n // M)
    tail = P * M - n

    keys_p = _pad_and_desentinel(sorted_keys, P * M)
    spread = _tail_spread(tail, dtype)
    dim = sorted_pos.shape[1]
    planes = [
        jnp.concatenate([sorted_pos[:, a], spread]).reshape(-1, LANES)
        for a in range(dim)
    ]
    if split:
        planes += [
            jnp.concatenate(
                [sorted_pos_lo[:, a], jnp.zeros_like(spread)]
            ).reshape(-1, LANES)
            for a in range(dim)
        ]
    n_planes = len(planes)
    n_payload = 0 if sorted_payload is None else sorted_payload.shape[1]
    assert (n_payload == 0) == (pair_mask is None), (
        "pair_mask and sorted_payload go together"
    )
    for a in range(n_payload):
        planes.append(
            jnp.concatenate(
                [sorted_payload[:, a].astype(dtype), jnp.zeros_like(spread)]
            ).reshape(-1, LANES)
        )
    kp = keys_p.reshape(-1, LANES)

    w_key = key_window(strides, key_reach).astype(jnp.int32).reshape(1)
    edges = jnp.asarray(edges_sq, dtype).reshape(K)
    mislot = jnp.asarray(min_islot, jnp.int32).reshape(1)
    minimage = mi_box is not None
    scalars = [w_key, edges, mislot]
    if minimage:
        scalars.append(jnp.asarray(mi_box, dtype).reshape(dim))

    Mr = M // LANES
    kernel = _make_hist_kernel(
        M, L, K, n_planes, split, dtype, n_payload, pair_mask,
        minimage=minimage,
    )
    bs = lambda: pl.BlockSpec((Mr, LANES), lambda p, *s: (p, 0))
    win = lambda dt: pltpu.VMEM((Mr + L // LANES, LANES), dt)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(scalars),
        grid=(P,),
        in_specs=[bs() for _ in range(n_planes + n_payload + 1)],
        out_specs=pl.BlockSpec(
            (K * Mr, LANES),
            lambda p, *s: (0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[win(dtype) for _ in range(n_planes + n_payload)]
        + [win(jnp.int32)],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((K * Mr, LANES), jnp.int32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(*scalars, *planes, kp)
    per_bin = out.reshape(K, Mr, LANES)
    lo = jnp.sum(per_bin & 0xFFFF, axis=(1, 2))
    hi = jnp.sum(per_bin >> 16, axis=(1, 2))
    return jnp.stack([hi, lo])
