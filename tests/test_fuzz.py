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
