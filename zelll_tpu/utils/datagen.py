"""Benchmark data generation, bit-compatible with the reference protocol.

The reference benchmarks (zelll `benches/cellgrid.rs:16-35`, `benches/lj.rs`,
`examples/lammps_data.rs`) generate uniformly random points with Rust's
``rand 0.8`` ``StdRng`` (= ChaCha12) seeded via ``seed_from_u64`` with the
fixed seed 3079380797442975911. To make our benchmark inputs *identical* to
the reference/LAMMPS/CellListMap comparison data, this module reimplements
that exact RNG stack in vectorized numpy:

* ``seed_from_u64``: rand_core 0.6 fills the 32-byte ChaCha seed with PCG32
  (XSH-RR) outputs, 4 bytes at a time (little-endian).
* ``StdRng`` core: ChaCha with 12 rounds, 64-bit block counter in state
  words 12-13, stream id (0) in words 14-15; u32 output stream is the
  sequence of output blocks' words; ``next_u64`` = two consecutive u32
  (lo, hi).
* ``Standard`` distribution for f64: ``(next_u64 >> 11) * 2^-53``.
* point = ``(u3 - 0.5 + origin) * vol`` componentwise
  (benches/cellgrid.rs:25-30).

This is a clean-room reimplementation from the published algorithm
definitions (RFC 8439 ChaCha core; PCG32 output function), not a port of
any reference code.
"""

from __future__ import annotations

import numpy as np

__all__ = ["StdRng", "generate_points_random", "DEFAULT_SEED", "lj_box"]

DEFAULT_SEED = 3079380797442975911

_CHACHA_CONSTANTS = np.array(
    [0x61707865, 0x3320646E, 0x79622D32, 0x6B206574], dtype=np.uint32
)


def _pcg32_seed_fill(state: int, nwords: int) -> np.ndarray:
    """rand_core 0.6 `seed_from_u64`: PCG32 XSH-RR fills the seed words."""
    MUL = 6364136223846793005
    INC = 11634580027462260723
    mask = (1 << 64) - 1
    out = np.empty(nwords, dtype=np.uint32)
    for i in range(nwords):
        state = (state * MUL + INC) & mask
        xorshifted = (((state >> 18) ^ state) >> 27) & 0xFFFFFFFF
        rot = state >> 59
        out[i] = ((xorshifted >> rot) | (xorshifted << ((32 - rot) & 31))) & 0xFFFFFFFF
    return out


def _rotl(x: np.ndarray, k: int) -> np.ndarray:
    return (x << np.uint32(k)) | (x >> np.uint32(32 - k))


def _chacha_core(state: np.ndarray, rounds: int) -> np.ndarray:
    """ChaCha core over (B, 16) uint32 initial states -> output words."""
    x = state.copy()

    def qr(a, b, c, d):
        x[:, a] += x[:, b]
        x[:, d] = _rotl(x[:, d] ^ x[:, a], 16)
        x[:, c] += x[:, d]
        x[:, b] = _rotl(x[:, b] ^ x[:, c], 12)
        x[:, a] += x[:, b]
        x[:, d] = _rotl(x[:, d] ^ x[:, a], 8)
        x[:, c] += x[:, d]
        x[:, b] = _rotl(x[:, b] ^ x[:, c], 7)

    with np.errstate(over="ignore"):
        for _ in range(rounds // 2):
            qr(0, 4, 8, 12)
            qr(1, 5, 9, 13)
            qr(2, 6, 10, 14)
            qr(3, 7, 11, 15)
            qr(0, 5, 10, 15)
            qr(1, 6, 11, 12)
            qr(2, 7, 8, 13)
            qr(3, 4, 9, 14)
        return x + state


def _chacha_blocks(key: np.ndarray, counters: np.ndarray, rounds: int) -> np.ndarray:
    """rand_chacha state layout: 64-bit block counter in words 12-13,
    stream id (0) in words 14-15. Returns (B, 16) uint32 output words."""
    B = counters.shape[0]
    state = np.empty((B, 16), dtype=np.uint32)
    state[:, 0:4] = _CHACHA_CONSTANTS
    state[:, 4:12] = key
    state[:, 12] = (counters & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    state[:, 13] = (counters >> np.uint64(32)).astype(np.uint32)
    state[:, 14] = 0
    state[:, 15] = 0
    return _chacha_core(state, rounds)


class StdRng:
    """rand 0.8 `StdRng` (ChaCha12) u64/f64 stream, vectorized."""

    ROUNDS = 12

    def __init__(self, seed: int):
        self.key = _pcg32_seed_fill(seed, 8)
        self._consumed_u32 = 0

    def next_u64(self, n: int) -> np.ndarray:
        """The next n outputs of `next_u64` as a (n,) uint64 array.

        Uses the native C++ stream when available (~10x numpy) with the
        vectorized numpy implementation as fallback; both are bit-identical.
        """
        start = self._consumed_u32
        try:
            from .. import oracle

            if oracle.available():
                out = oracle.chacha12_u64(self.key, start, n)
                self._consumed_u32 = start + 2 * n
                return out
        except Exception:
            pass
        end = start + 2 * n
        b0, b1 = start // 16, (end + 15) // 16
        # chunk the block generation: cache-sized working sets are ~10x
        # faster than one giant pass at 1e8-point scale
        CHUNK = 1 << 20
        parts = []
        for cb in range(b0, b1, CHUNK):
            counters = np.arange(cb, min(cb + CHUNK, b1), dtype=np.uint64)
            parts.append(
                _chacha_blocks(self.key, counters, self.ROUNDS).reshape(-1)
            )
        words = np.concatenate(parts) if len(parts) > 1 else parts[0]
        words = words[start - b0 * 16 : end - b0 * 16]
        self._consumed_u32 = end
        lo = words[0::2].astype(np.uint64)
        hi = words[1::2].astype(np.uint64)
        return lo | (hi << np.uint64(32))

    def uniform_f64(self, n: int) -> np.ndarray:
        """n samples of rand's `Standard` for f64: 53 high bits / 2^53."""
        u = self.next_u64(n) >> np.uint64(11)
        return u.astype(np.float64) * (1.0 / (1 << 53))


def generate_points_random(
    n: int,
    vol,
    origin=(0.0, 0.0, 0.0),
    seed: int | None = None,
) -> np.ndarray:
    """Uniform random cloud identical to benches/cellgrid.rs:16-35.

    Each point consumes 3 consecutive f64 samples (x, y, z);
    ``p = (u - 0.5 + origin) * vol`` componentwise.
    """
    rng = StdRng(DEFAULT_SEED if seed is None else seed)
    u = rng.uniform_f64(3 * n).reshape(n, 3)
    return (u - 0.5 + np.asarray(origin, np.float64)) * np.asarray(vol, np.float64)


def lj_box(n: int, cutoff: float = 10.0) -> tuple[float, float, float]:
    """Benchmark cuboid for n particles (benches/lj.rs:60-64):
    30 x 30 x (n / (10/cutoff^3) / 900), i.e. mean ~10 particles/cell."""
    conc = 10.0 / cutoff**3
    a = 3.0 * cutoff
    b = 3.0 * cutoff
    c = (n / conc) / a / b
    return (a, b, c)
