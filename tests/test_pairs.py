"""Pair enumeration correctness: reference counting invariants
(iters.rs:334-387) plus brute-force O(n^2) set equality (an oracle the
reference itself lacks; SURVEY §4 implication iii)."""

import jax.numpy as jnp
import numpy as np
import pytest

from zelll_tpu.core import (
    build,
    count_pairs,
    generate_pointcloud,
    materialize_pairs,
    pair_forces,
    pair_sum,
    query_neighbors,
    rebuild,
)


def brute_pairs(points: np.ndarray, cutoff_sq: float | None) -> set:
    d = points[:, None, :] - points[None, :, :]
    dsq = (d * d).sum(-1)
    n = len(points)
    out = set()
    for i in range(n):
        for j in range(i + 1, n):
            if cutoff_sq is None or dsq[i, j] < cutoff_sq:
                out.add((i, j))
    return out


def materialized_set(grid, K, max_pairs, cutoff_sq=None, chunk=8):
    i, j, total, overflow = materialize_pairs(
        grid, K=K, max_pairs=max_pairs, cutoff_sq=cutoff_sq, chunk=chunk
    )
    assert not bool(overflow)
    total = int(total)
    i = np.asarray(i)[:total]
    j = np.asarray(j)[:total]
    assert (i < grid.n).all() and (j < grid.n).all()
    pairs = [tuple(sorted(p)) for p in zip(i.tolist(), j.tolist())]
    s = set(pairs)
    assert len(s) == len(pairs), "duplicate pairs emitted"
    return s


def test_chessboard_2x2x2_counts():
    # iters.rs:334-356: intra = 4, inter = 24 candidate pairs
    points = jnp.asarray(generate_pointcloud([2, 2, 2], 1.0, [0.0, 0.0, 0.0]))
    grid = build(points, 1.0)
    total = int(count_pairs(grid, K=8, chunk=4))
    assert total == 28  # 4 intra + 24 inter

    # half-space == full-space / 2 (iters.rs:358-387): every unordered pair
    # exactly once is equivalent; verified via set equality below.
    s = materialized_set(grid, K=8, max_pairs=64)
    assert len(s) == 28


@pytest.mark.parametrize("n,box,cutoff", [
    (40, (5.0, 5.0, 5.0), 1.0),
    (200, (10.0, 10.0, 10.0), 2.5),
    (150, (30.0, 30.0, 2.0), 1.0),   # flat box
    (100, (2.0, 2.0, 100.0), 3.0),   # elongated box (bench geometry)
    (64, (1.0, 1.0, 1.0), 0.3),      # dense
])
def test_filtered_pairs_match_bruteforce(n, box, cutoff):
    rng = np.random.default_rng(n)
    pts = rng.uniform(0, 1, size=(n, 3)) * np.asarray(box)
    grid = build(jnp.asarray(pts), cutoff)
    K = int(grid.bins.max_cell_count())
    got = materialized_set(grid, K=K + 3, max_pairs=n * n, cutoff_sq=cutoff**2)
    want = brute_pairs(pts, cutoff**2)
    assert got == want


def test_candidate_set_superset_and_count():
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 6, size=(120, 3))
    cutoff = 1.0
    grid = build(jnp.asarray(pts), cutoff)
    K = int(grid.bins.max_cell_count())
    cand = materialized_set(grid, K=K, max_pairs=120 * 120)
    want = brute_pairs(pts, cutoff**2)
    assert want <= cand
    assert len(cand) == int(count_pairs(grid, K=K, chunk=8))


def test_pair_sum_matches_bruteforce_energy():
    rng = np.random.default_rng(11)
    pts = rng.uniform(0, 8, size=(300, 3))
    cutoff = 1.5
    grid = build(jnp.asarray(pts), cutoff)
    K = int(grid.bins.max_cell_count())

    def lj(dsq):
        t = (1.0 / dsq) ** 3
        return 4.0 * t * (t - 1.0)

    got = float(pair_sum(grid, lj, K=K, chunk=16, cutoff_sq=cutoff**2))

    d = pts[:, None, :] - pts[None, :, :]
    dsq = (d * d).sum(-1)
    iu = np.triu_indices(len(pts), 1)
    v = dsq[iu]
    want = lj(v[v < cutoff**2]).sum()
    np.testing.assert_allclose(got, want, rtol=1e-12)


def test_pair_forces_match_autodiff_bruteforce():
    rng = np.random.default_rng(5)
    pts = rng.uniform(0, 4, size=(60, 3)) + 0.05
    cutoff = 1.2
    grid = build(jnp.asarray(pts), cutoff)
    K = int(grid.bins.max_cell_count())

    # soft pair potential, zero at the cutoff so the filter is smooth
    csq = cutoff**2

    def v(dsq):
        return (csq - dsq) ** 2

    def g(dsq):
        # force factor = -2 dV/d(dsq)
        return 4.0 * (csq - dsq)

    got = np.asarray(pair_forces(grid, g, K=K, chunk=16, cutoff_sq=csq))

    # brute-force via numpy
    d = pts[:, None, :] - pts[None, :, :]
    dsq = (d * d).sum(-1)
    mask = (dsq < csq) & ~np.eye(len(pts), dtype=bool)
    gf = np.where(mask, 4.0 * (csq - dsq), 0.0)
    want = (d * gf[..., None]).sum(axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-10)


def test_rebuild_fast_and_slow_paths():
    rng = np.random.default_rng(2)
    pts = rng.uniform(0, 5, size=(80, 3))
    cutoff = 1.0
    grid = build(jnp.asarray(pts), cutoff)
    K0 = int(grid.bins.max_cell_count())

    # tiny perturbation: no particle changes cell *and* aabb unchanged only
    # if extremes hold; just check pair correctness either way
    pts2 = pts + rng.uniform(-0.01, 0.01, size=pts.shape)
    grid2 = rebuild(grid, jnp.asarray(pts2))
    K = max(K0, int(grid2.bins.max_cell_count()))
    got = materialized_set(grid2, K=K, max_pairs=80 * 80, cutoff_sq=cutoff**2)
    assert got == brute_pairs(pts2, cutoff**2)

    # big shuffle: slow path
    pts3 = rng.uniform(0, 5, size=(80, 3))
    grid3 = rebuild(grid2, jnp.asarray(pts3))
    K = int(grid3.bins.max_cell_count())
    got = materialized_set(grid3, K=K, max_pairs=80 * 80, cutoff_sq=cutoff**2)
    assert got == brute_pairs(pts3, cutoff**2)

    # cutoff change
    grid4 = rebuild(grid3, jnp.asarray(pts3), cutoff=2.0)
    K = int(grid4.bins.max_cell_count())
    got = materialized_set(grid4, K=K, max_pairs=80 * 80, cutoff_sq=4.0)
    assert got == brute_pairs(pts3, 4.0)


def test_rebuild_identical_positions_reuses_tables():
    pts = jnp.asarray(generate_pointcloud([3, 3, 3], 1.0, [0.0, 0.0, 0.0]))
    grid = build(pts, 1.0)
    grid2 = rebuild(grid, pts)
    np.testing.assert_array_equal(np.asarray(grid.bins.perm), np.asarray(grid2.bins.perm))
    np.testing.assert_array_equal(
        np.asarray(grid.bins.cell_keys), np.asarray(grid2.bins.cell_keys)
    )


def test_query_neighbors_bruteforce():
    rng = np.random.default_rng(9)
    pts = rng.uniform(0, 5, size=(150, 3))
    cutoff = 1.0
    grid = build(jnp.asarray(pts), cutoff)
    K = int(grid.bins.max_cell_count())

    queries = np.vstack([
        rng.uniform(-0.5, 5.5, size=(20, 3)),
        pts[:5],                      # on-particle queries
        np.array([[50.0, 50.0, 50.0]]),  # far outside -> invalid
    ])
    res = query_neighbors(grid, jnp.asarray(queries), K=K)
    ids, mask, ok = np.asarray(res.ids), np.asarray(res.mask), np.asarray(res.valid)

    assert not ok[-1]  # far-away query invalid (reference returns None)
    for q in range(len(queries) - 1):
        got = set(ids[q][mask[q]].tolist())
        assert len(got) == mask[q].sum(), "duplicate neighbor ids"
        dsq = ((pts - queries[q]) ** 2).sum(-1)
        within = set(np.nonzero(dsq <= cutoff**2)[0].tolist())
        if ok[q]:
            assert within <= got
        else:
            assert not within  # invalid queries have no in-range particles
