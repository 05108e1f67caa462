"""C++ oracle vs brute force, and TPU engine vs oracle at medium scale."""

import jax.numpy as jnp
import numpy as np
import pytest

from zelll_tpu import oracle
from zelll_tpu.core import build
from zelll_tpu.ops.fused import fused_count_pairs, fused_lj_energy
from zelll_tpu.ops.pallas_pairs import suggest_lag
from zelll_tpu.utils.datagen import generate_points_random, lj_box

pytestmark = pytest.mark.skipif(not oracle.available(), reason="needs g++")


def test_oracle_matches_bruteforce():
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 5, size=(300, 3))
    cutoff = 1.0
    e, npairs = oracle.lj_energy(pts, cutoff)
    i, j = oracle.pairs(pts, cutoff)

    d = pts[:, None] - pts[None]
    dsq = (d * d).sum(-1)
    iu = np.triu_indices(len(pts), 1)
    v = dsq[iu]
    within = v < cutoff**2
    assert npairs == within.sum() == len(i)
    t3 = (1.0 / v[within]) ** 3
    np.testing.assert_allclose(e, (4 * t3 * (t3 - 1)).sum(), rtol=1e-12)
    got = {tuple(sorted(p)) for p in zip(i.tolist(), j.tolist())}
    want = {
        (a, b) for a in range(len(pts)) for b in range(a + 1, len(pts))
        if dsq[a, b] < cutoff**2
    }
    assert got == want

    f = oracle.forces(pts, cutoff)
    mask = (dsq < cutoff**2) & ~np.eye(len(pts), dtype=bool)
    inv = np.where(mask, 1.0 / np.where(mask, dsq, 1.0), 0.0)
    t = inv**3
    gf = np.where(mask, 24 * t * (2 * t - 1) * inv, 0.0)
    f_ref = (d * gf[..., None]).sum(axis=1)
    np.testing.assert_allclose(f, f_ref, rtol=1e-10, atol=1e-10)


def test_oracle_query():
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 4, size=(200, 3))
    q = np.array([2.0, 2.0, 2.0])
    ids = oracle.query_neighbors(pts, 1.0, q)
    dsq = ((pts - q) ** 2).sum(-1)
    within = set(np.nonzero(dsq <= 1.0)[0].tolist())
    assert within <= set(ids.tolist())
    assert oracle.query_neighbors(pts, 1.0, np.array([99.0, 99.0, 99.0])) is None


def test_engine_matches_oracle_benchmark_data():
    """The real parity check: identical ChaCha bench data, engine (fused
    kernel, interpret on CPU) vs C++ f64 oracle — the stand-in for the
    'LJ energy within 1e-6 of the Rust reference' target at a size where
    O(n^2) is infeasible."""
    n, cutoff = 20_000, 10.0
    pts = generate_points_random(n, lj_box(n, cutoff))
    e_ref, n_ref = oracle.lj_energy(pts, cutoff)

    grid = build(jnp.asarray(pts), cutoff)
    L = suggest_lag(np.asarray(grid.bins.sorted_keys), np.asarray(grid.info.strides))
    M = max(1024, L)
    cnt, ok = fused_count_pairs(grid, M=M, L=L, interpret=True)
    assert bool(ok)
    assert int(cnt) == n_ref
    e, ok = fused_lj_energy(grid, M=M, L=L, interpret=True)
    assert bool(ok)
    np.testing.assert_allclose(float(e), e_ref, rtol=1e-9)  # f64 on CPU
