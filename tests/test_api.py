"""User-facing CellGrid API parity tests (reference python/zelll.pyi,
python/src/lib.rs semantics)."""

import pickle

import numpy as np
import pytest

from zelll_tpu.api import CellGrid


def test_construct_and_basics():
    pts = np.random.default_rng(0).random((50, 3))
    cg = CellGrid(pts, 0.5)
    assert cg.cutoff() == 0.5
    inf, sup = cg.aabb()
    np.testing.assert_allclose(inf, pts.min(axis=0))
    np.testing.assert_allclose(sup, pts.max(axis=0))


def test_empty_then_rebuild():
    cg = CellGrid()
    assert cg.cutoff() == 1.0
    assert list(cg) == []
    pts = np.random.default_rng(1).random((20, 3))
    cg.rebuild(pts, 0.5)
    assert cg.cutoff() == 0.5
    assert len(list(cg)) > 0


def test_iterator_protocol_pairs():
    rng = np.random.default_rng(2)
    pts = rng.random((60, 3)) * 3.0
    cutoff = 1.0
    cg = CellGrid(pts, cutoff)
    seen = set()
    for (i, p), (j, q) in cg:
        np.testing.assert_allclose(p, pts[i])
        np.testing.assert_allclose(q, pts[j])
        key = (min(i, j), max(i, j))
        assert key not in seen
        seen.add(key)
    # candidate set must cover all pairs within cutoff
    d = pts[:, None] - pts[None]
    dsq = (d * d).sum(-1)
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            if dsq[i, j] < cutoff**2:
                assert (i, j) in seen


def test_generic_iterable_skips_bad_items():
    # reference lib.rs:40-58: silently skip inconvertible items
    items = [[0.0, 0.0, 0.0], "garbage", [1.0, 1.0, 1.0], [1, 2], None,
             (0.5, 0.5, 0.5)]
    cg = CellGrid(iter(items), 1.0)
    assert len(cg.positions) == 3


def test_query_neighbors_and_neighbors():
    rng = np.random.default_rng(3)
    pts = rng.random((80, 3)) * 4.0
    cg = CellGrid(pts, 1.0)
    q = [2.0, 2.0, 2.0]
    got = {i for i, _ in cg.query_neighbors(q)}
    dsq = ((pts - q) ** 2).sum(-1)
    within = set(np.nonzero(dsq <= 1.0)[0].tolist())
    assert within <= got

    filtered = cg.neighbors(q)
    assert {i for i, _ in filtered} == within

    assert cg.query_neighbors([99.0, 99.0, 99.0]) is None
    assert cg.neighbors([99.0, 99.0, 99.0]) is None


def test_pickle_roundtrip():
    pts = np.random.default_rng(4).random((30, 3))
    cg = CellGrid(pts, 0.7)
    cg2 = pickle.loads(pickle.dumps(cg))
    assert cg2.cutoff() == 0.7
    np.testing.assert_array_equal(cg2.positions, cg.positions)
    assert sorted(
        (min(i, j), max(i, j)) for (i, _), (j, _) in cg
    ) == sorted((min(i, j), max(i, j)) for (i, _), (j, _) in cg2)


def test_rebuild_same_capacity_class_fast_path():
    rng = np.random.default_rng(5)
    pts = rng.random((200, 3)) * 3.0
    cg = CellGrid(pts, 1.0)
    pts2 = pts + rng.normal(0, 0.05, pts.shape)
    cg.rebuild(pts2)
    # correctness after rebuild
    d = pts2[:, None] - pts2[None]
    dsq = (d * d).sum(-1)
    want = {
        (i, j)
        for i in range(len(pts2))
        for j in range(i + 1, len(pts2))
        if dsq[i, j] < 1.0
    }
    got = {(min(i, j), max(i, j)) for (i, _), (j, _) in cg}
    assert want <= got


def test_lj_energy_method():
    rng = np.random.default_rng(6)
    pts = rng.random((100, 3)) * 3.0
    cg = CellGrid(pts, 1.0)
    d = pts[:, None] - pts[None]
    dsq = (d * d).sum(-1)
    iu = np.triu_indices(len(pts), 1)
    v = dsq[iu]
    v = v[v < 1.0]
    t3 = (1.0 / v) ** 3
    np.testing.assert_allclose(
        cg.lj_energy(), (4 * t3 * (t3 - 1)).sum(), rtol=1e-9
    )


def test_pairs_method():
    rng = np.random.default_rng(7)
    pts = rng.random((80, 3)) * 3.0
    cg = CellGrid(pts, 1.0)
    i, j = cg.pairs(within_cutoff=True)
    got = {(min(a, b), max(a, b)) for a, b in zip(i.tolist(), j.tolist())}
    d = pts[:, None] - pts[None]
    dsq = (d * d).sum(-1)
    want = {
        (a, b)
        for a in range(80)
        for b in range(a + 1, 80)
        if dsq[a, b] < 1.0
    }
    assert got == want
    ic, jc = cg.pairs()
    assert len(ic) >= len(i)


def test_coordination_numbers():
    rng = np.random.default_rng(9)
    # non-power-of-two n exercises the padding path
    pts = rng.random((300, 3)) * 4.0
    cg = CellGrid(pts, 1.0)
    got = cg.coordination_numbers()
    d = pts[:, None] - pts[None]
    dsq = (d * d).sum(-1)
    want = ((dsq < 1.0) & ~np.eye(300, dtype=bool)).sum(1)
    np.testing.assert_array_equal(got, want)


def test_distance_histogram():
    rng = np.random.default_rng(13)
    pts = rng.random((250, 3)) * 4.0
    cg = CellGrid(pts, 1.0)
    edges = np.linspace(0.0, 2.5, 11)  # beyond the grid cutoff on purpose
    got = cg.distance_histogram(edges)
    d = pts[:, None] - pts[None]
    dist = np.sqrt((d * d).sum(-1))
    want, _ = np.histogram(dist[np.triu_indices(250, 1)], bins=edges)
    np.testing.assert_array_equal(got, want)


def test_distance_histogram_wide_box():
    """A wide/cubic box (huge lag requirement) dispatches to the tile
    histogram path."""
    rng = np.random.default_rng(17)
    pts = rng.random((1500, 3)) * 30.0  # 30^3 box, cutoff range ~3
    cg = CellGrid(pts, 1.0)
    edges = np.linspace(0.0, 3.0, 7)
    got = cg.distance_histogram(edges)
    d = pts[:, None] - pts[None]
    dist = np.sqrt((d * d).sum(-1))
    want, _ = np.histogram(dist[np.triu_indices(len(pts), 1)], bins=edges)
    np.testing.assert_array_equal(got, want)
