"""2D support: the reference is N-dimensional (CellGrid<_, 2, f32> in its
doc-tests); core pipeline and the lag kernel must work for N = 2."""

import jax.numpy as jnp
import numpy as np
import pytest

from zelll_tpu.core import build, count_pairs, materialize_pairs, pair_sum
from zelll_tpu.ops.pallas_pairs import (
    count_term,
    lag_coverage_ok,
    pair_lag_reduce,
    suggest_lag,
)


def brute_pairs_2d(pts, cutoff):
    d = pts[:, None, :] - pts[None, :, :]
    dsq = (d * d).sum(-1)
    n = len(pts)
    return {
        (i, j)
        for i in range(n)
        for j in range(i + 1, n)
        if dsq[i, j] < cutoff**2
    }


def test_2d_pairs_xla_path():
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 8, size=(200, 2))
    cutoff = 1.0
    grid = build(jnp.asarray(pts), cutoff)
    K = int(grid.bins.max_cell_count())
    i, j, total, overflow = materialize_pairs(
        grid, K=K, max_pairs=4000, cutoff_sq=cutoff**2, chunk=16
    )
    assert not bool(overflow)
    total = int(total)
    got = {tuple(sorted(p)) for p in zip(np.asarray(i)[:total], np.asarray(j)[:total])}
    got = {(int(a), int(b)) for a, b in got}
    assert got == brute_pairs_2d(pts, cutoff)


def test_2d_lag_kernel():
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 1, size=(500, 2)) * np.array([5.0, 40.0])
    cutoff = 1.0
    grid = build(jnp.asarray(pts), cutoff)
    L = suggest_lag(
        np.asarray(grid.bins.sorted_keys), np.asarray(grid.info.strides)
    )
    M = max(256, L)
    assert bool(lag_coverage_ok(grid.bins.sorted_keys, grid.info.strides, L))
    cnt = pair_lag_reduce(
        grid.sorted_pos, grid.bins.sorted_keys, grid.info.strides,
        cutoff**2, M=M, L=L, term=count_term, interpret=True,
    )
    assert int(cnt) == len(brute_pairs_2d(pts, cutoff))
