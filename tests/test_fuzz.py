"""Randomized cross-path consistency fuzz: for random boxes/cutoffs/sizes,
the XLA pair path, the lag kernel, the column path and the C++ oracle must
agree on pair counts exactly and on LJ energies to f64 precision."""

import jax.numpy as jnp
import numpy as np
import pytest

from zelll_tpu import oracle
from zelll_tpu.core import build, count_pairs, pair_sum
from zelll_tpu.ops.columns import column_pair_sum
from zelll_tpu.ops.fused import fused_count_pairs, fused_lj_energy
from zelll_tpu.ops.pallas_pairs import combine_count, count_term, suggest_lag

pytestmark = pytest.mark.skipif(not oracle.available(), reason="needs g++")


def lj_np(v):
    t3 = (1.0 / v) ** 3
    return 4.0 * t3 * (t3 - 1.0)


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_cross_path(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(50, 900))
    box = rng.uniform(2.0, 40.0, size=3)
    cutoff = float(rng.uniform(0.5, 4.0))
    off = rng.uniform(-20.0, 20.0, size=3)
    pts = rng.uniform(0, 1, size=(n, 3)) * box + off

    e_ref, n_ref = oracle.lj_energy(pts, cutoff)

    # XLA path
    grid = build(jnp.asarray(pts), cutoff)
    K = int(grid.bins.max_cell_count())
    chunk = min(64, grid.bins.max_cells)
    assert int(count_pairs(grid, K=K, chunk=chunk, cutoff_sq=cutoff**2)) == n_ref
    e_xla = float(
        pair_sum(
            grid,
            lambda d: 4.0 * (1.0 / d) ** 3 * ((1.0 / d) ** 3 - 1.0),
            K=K, chunk=chunk, cutoff_sq=cutoff**2,
        )
    )
    np.testing.assert_allclose(e_xla, e_ref, rtol=1e-9)

    # lag kernel
    L = suggest_lag(np.asarray(grid.bins.sorted_keys), np.asarray(grid.info.strides))
    M = max(256, L)
    c, ok = fused_count_pairs(grid, M=M, L=L, interpret=True)
    assert bool(ok) and int(c) == n_ref
    e_lag, ok = fused_lj_energy(grid, M=M, L=L, interpret=True)
    assert bool(ok)
    np.testing.assert_allclose(float(e_lag), e_ref, rtol=1e-9)

    # column path
    c2, ok = column_pair_sum(
        jnp.asarray(pts), cutoff, T=4, M=1024, L=1024,
        term=count_term, interpret=True, out_dtype=jnp.int32,
    )
    assert bool(ok) and combine_count(c2) == n_ref


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_pbc_paths(seed):
    """Random periodic boxes: lag, tile and xla PBC paths vs an f64
    minimum-image brute force — counts exact, energies to f64, forces
    agree between paths."""
    from zelll_tpu.ops.pbc import (
        pbc_count_pairs, pbc_lj_energy, pbc_lj_forces,
    )

    rng = np.random.default_rng(100 + seed)
    n = int(rng.integers(60, 500))
    cutoff = float(rng.uniform(0.5, 2.0))
    # minimum-image regime requires box > 2*cutoff per axis
    box = rng.uniform(2.2 * cutoff, 12.0 * cutoff, size=3)
    pts = rng.uniform(0, 1, size=(n, 3)) * box

    d = pts[:, None] - pts[None, :]
    d -= box * np.round(d / box)
    dsq = (d * d).sum(-1)
    np.fill_diagonal(dsq, np.inf)
    within = dsq < cutoff**2
    e_ref = float(lj_np(np.where(within, dsq, 1.0))[within].sum()) / 2.0
    n_ref = int(within.sum()) // 2

    p = jnp.asarray(pts)
    o, bj = jnp.zeros(3), jnp.asarray(box)
    L = 512
    while True:
        e, ok = pbc_lj_energy(p, o, bj, cutoff, M=1024, L=L, interpret=True)
        if bool(ok):
            break
        L *= 2
    assert abs(float(e) - e_ref) <= 1e-9 * max(1.0, abs(e_ref))
    cnt, ok = pbc_count_pairs(p, o, bj, cutoff, M=1024, L=L, interpret=True)
    assert bool(ok) and cnt == n_ref

    maxj = 8
    while True:
        e_t, ok = pbc_lj_energy(p, o, bj, cutoff, path="tile", MAXJ=maxj,
                                interpret=True)
        if bool(ok):
            break
        maxj *= 2
    assert abs(float(e_t) - e_ref) <= 1e-9 * max(1.0, abs(e_ref))

    e_x, ok = pbc_lj_energy(p, o, bj, cutoff, path="xla", K=64)
    assert bool(ok)
    assert abs(float(e_x) - e_ref) <= 1e-9 * max(1.0, abs(e_ref))

    f_lag, ok1 = pbc_lj_forces(p, o, bj, cutoff, M=1024, L=L,
                               interpret=True)
    f_tile, ok2 = pbc_lj_forces(p, o, bj, cutoff, path="tile", MAXJ=maxj,
                                interpret=True)
    assert bool(ok1) and bool(ok2)
    np.testing.assert_allclose(np.asarray(f_lag), np.asarray(f_tile),
                               rtol=1e-9, atol=1e-9)
