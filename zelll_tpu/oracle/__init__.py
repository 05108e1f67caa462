"""Host-native C++ cell-lists oracle, loaded via ctypes.

The exact-f64 reference implementation (same algorithm spec as the Rust
reference's hashmap counting-sort design) used to validate the TPU engine
at particle counts where O(n^2) brute force is infeasible, and as a CPU
fallback. Compiled on demand with g++ (cached next to the source).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

import numpy as np

__all__ = ["available", "lj_energy", "pairs", "query_neighbors", "forces"]

_DIR = Path(__file__).parent
_SO = _DIR / "_cell_lists.so"
_SRC = _DIR / "cell_lists.cpp"
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
             str(_SRC), "-o", str(_SO)],
            check=True,
            capture_output=True,
        )
    lib = ctypes.CDLL(str(_SO))
    i64, f64p, i32p, i64p = (
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64),
    )
    lib.zelll_oracle_lj.argtypes = [f64p, i64, ctypes.c_double, f64p, i64p]
    lib.zelll_oracle_pairs.argtypes = [f64p, i64, ctypes.c_double, i32p, i32p, i64]
    lib.zelll_oracle_pairs.restype = i64
    lib.zelll_oracle_query.argtypes = [f64p, i64, ctypes.c_double, f64p, i32p, i64]
    lib.zelll_oracle_query.restype = i64
    lib.zelll_oracle_forces.argtypes = [f64p, i64, ctypes.c_double, f64p]
    u32p = ctypes.POINTER(ctypes.c_uint32)
    u64p = ctypes.POINTER(ctypes.c_uint64)
    lib.zelll_chacha12_u64.argtypes = [u32p, ctypes.c_uint64, i64, u64p]
    _lib = lib
    return lib


def available() -> bool:
    try:
        _load()
        return True
    except (OSError, subprocess.CalledProcessError, FileNotFoundError):
        return False


def _pos_ptr(positions):
    pos = np.ascontiguousarray(positions, np.float64)
    assert pos.ndim == 2 and pos.shape[1] == 3
    return pos, pos.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def lj_energy(positions, cutoff: float) -> tuple[float, int]:
    """Exact f64 (energy, cutoff-pair count)."""
    lib = _load()
    pos, ptr = _pos_ptr(positions)
    e = ctypes.c_double()
    p = ctypes.c_int64()
    lib.zelll_oracle_lj(ptr, pos.shape[0], cutoff, ctypes.byref(e), ctypes.byref(p))
    return e.value, p.value


def pairs(positions, cutoff: float, cap: int | None = None):
    """Cutoff-filtered unique pairs as (i, j) int32 arrays."""
    lib = _load()
    pos, ptr = _pos_ptr(positions)
    n = pos.shape[0]
    cap = cap or max(64, n * 40)
    i = np.empty(cap, np.int32)
    j = np.empty(cap, np.int32)
    total = lib.zelll_oracle_pairs(
        ptr, n, cutoff,
        i.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        j.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), cap,
    )
    if total > cap:
        return pairs(positions, cutoff, cap=int(total))
    return i[:total], j[:total]


def query_neighbors(positions, cutoff: float, q):
    """Full-space candidate neighbors of q, or None if too far outside."""
    lib = _load()
    pos, ptr = _pos_ptr(positions)
    qa = np.ascontiguousarray(q, np.float64)
    cap = pos.shape[0]
    out = np.empty(cap, np.int32)
    total = lib.zelll_oracle_query(
        ptr, pos.shape[0], cutoff,
        qa.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), cap,
    )
    if total < 0:
        return None
    return out[:total]


def chacha12_u64(key_words: np.ndarray, start_u32: int, n: int) -> np.ndarray:
    """Native ChaCha12 u64 stream (rand 0.8 StdRng layout)."""
    lib = _load()
    key = np.ascontiguousarray(key_words, np.uint32)
    out = np.empty(n, np.uint64)
    lib.zelll_chacha12_u64(
        key.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        ctypes.c_uint64(start_u32),
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
    )
    return out


def forces(positions, cutoff: float) -> np.ndarray:
    """Exact f64 per-particle LJ forces."""
    lib = _load()
    pos, ptr = _pos_ptr(positions)
    out = np.zeros_like(pos)
    lib.zelll_oracle_forces(
        ptr, pos.shape[0], cutoff,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out
