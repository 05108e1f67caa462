"""Lag-kernel correctness (interpret mode on CPU) vs brute force and vs the
XLA pair path. The compiled-TPU path is exercised by bench.py / verify."""

import jax.numpy as jnp
import numpy as np
import pytest

from zelll_tpu.core import build, pair_sum
from zelll_tpu.ops.fused import (
    fused_count_pairs,
    fused_lj_energy,
    fused_lj_rebuild_energy,
)
from zelll_tpu.ops.pallas_pairs import lag_coverage_ok, suggest_lag


def brute(pts, cutoff):
    d = pts[:, None, :] - pts[None, :, :]
    dsq = (d * d).sum(-1)
    iu = np.triu_indices(len(pts), 1)
    v = dsq[iu]
    return v[v < cutoff**2]


@pytest.mark.parametrize("n,box,cutoff,M,L", [
    (700, (6.0, 6.0, 6.0), 1.0, 512, 256),
    (400, (2.0, 2.0, 80.0), 2.0, 256, 128),     # thin (bench-like) box
    (300, (10.0, 10.0, 10.0), 3.0, 512, 512),   # big cutoff, heavy window
    (64, (1.0, 1.0, 1.0), 0.4, 256, 128),       # dense clump
])
def test_fused_count_and_energy_vs_bruteforce(n, box, cutoff, M, L):
    rng = np.random.default_rng(n)
    pts = rng.uniform(0, 1, size=(n, 3)) * np.asarray(box)
    grid = build(jnp.asarray(pts), cutoff)

    L = suggest_lag(
        np.asarray(grid.bins.sorted_keys), np.asarray(grid.info.strides)
    )
    L = min(L, M)
    assert bool(lag_coverage_ok(grid.bins.sorted_keys, grid.info.strides, L))

    v = brute(pts, cutoff)
    cnt, ok = fused_count_pairs(grid, M=M, L=L, interpret=True)
    assert bool(ok)
    assert int(cnt) == len(v)

    e, ok = fused_lj_energy(grid, M=M, L=L, interpret=True)
    t3 = (1.0 / v) ** 3
    np.testing.assert_allclose(float(e), (4.0 * t3 * (t3 - 1.0)).sum(), rtol=1e-11)


def test_fused_matches_xla_pair_sum():
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 5, size=(500, 3))
    cutoff = 1.0
    grid = build(jnp.asarray(pts), cutoff)
    K = int(grid.bins.max_cell_count())

    def lj(dsq):
        t3 = (1.0 / dsq) ** 3
        return 4.0 * t3 * (t3 - 1.0)

    want = float(pair_sum(grid, lj, K=K, chunk=16, cutoff_sq=cutoff**2))
    got, ok = fused_lj_energy(grid, M=512, L=512, interpret=True)
    assert bool(ok)
    np.testing.assert_allclose(float(got), want, rtol=1e-11)


def test_fused_full_rebuild_step():
    rng = np.random.default_rng(2)
    pts = rng.uniform(0, 4, size=(600, 3)) * np.asarray([1, 1, 20.0])
    cutoff = 1.5
    e, ok = fused_lj_rebuild_energy(
        jnp.asarray(pts), cutoff, M=512, L=256, interpret=True
    )
    assert bool(ok)
    v = brute(pts, cutoff)
    t3 = (1.0 / v) ** 3
    np.testing.assert_allclose(float(e), (4.0 * t3 * (t3 - 1.0)).sum(), rtol=1e-11)


def test_coverage_detects_undersized_lag():
    # all particles in one cell: every pair is in-window at any lag
    pts = np.random.default_rng(3).uniform(0, 0.9, size=(400, 3))
    grid = build(jnp.asarray(pts), 1.0)
    assert not bool(
        lag_coverage_ok(grid.bins.sorted_keys, grid.info.strides, 128)
    )
    assert bool(
        lag_coverage_ok(grid.bins.sorted_keys, grid.info.strides, 512)
    )


def test_padded_grid_sentinel_rows():
    """Capacity-class padding (valid=False rows -> SENTINEL_KEY) must not
    inflate the lag bound, flag coverage false, or contribute pairs — and
    padding coordinate families must never collide at dsq == 0 (the energy
    kernel has no dsq > 0 exclusion)."""
    from zelll_tpu.ops.fused import fused_count_pairs
    from zelll_tpu.ops.pallas_pairs import suggest_lag

    rng = np.random.default_rng(7)
    n, cutoff = 1500, 1.0
    pts = rng.uniform(0, 1, size=(n, 3)) * np.asarray([3.0, 3.0, 50.0])

    # api-style padding: capacity 2048, far-away spread coords, valid mask
    n_pad = 2048
    padded = np.empty((n_pad, 3))
    padded[:n] = pts
    padded[n:] = (1e12 + 1e5 * np.arange(1, n_pad - n + 1))[:, None]
    valid = jnp.arange(n_pad) < n

    grid_pad = build(jnp.asarray(padded), cutoff, valid=valid)
    grid = build(jnp.asarray(pts), cutoff)

    L_pad = suggest_lag(
        np.asarray(grid_pad.bins.sorted_keys), np.asarray(grid_pad.info.strides)
    )
    L = suggest_lag(
        np.asarray(grid.bins.sorted_keys), np.asarray(grid.info.strides)
    )
    assert L_pad == L, (L_pad, L)  # sentinel rows must not inflate the lag

    e_pad, ok_pad = fused_lj_energy(grid_pad, M=1024, L=L_pad, interpret=True)
    e, ok = fused_lj_energy(grid, M=1024, L=L, interpret=True)
    assert bool(ok_pad) and bool(ok)  # padded grids must not flag forever
    assert np.isfinite(float(e_pad))
    np.testing.assert_allclose(float(e_pad), float(e), rtol=1e-12)

    c_pad, ok1 = fused_count_pairs(grid_pad, M=1024, L=L_pad, interpret=True)
    c, ok2 = fused_count_pairs(grid, M=1024, L=L, interpret=True)
    assert bool(ok1) and bool(ok2) and c_pad == c
