"""Per-cell public API (`api.CellGrid.query/cells` + `api.GridCell`) —
the analogue of the reference's GridCell handles and occupied-cell
iteration (src/cellgrid/iters.rs:121-291), validated against numpy
groupby and the chessboard fixture's closed-form counts."""

import numpy as np
import pytest

from zelll_tpu.api import CellGrid, GridCell
from zelll_tpu.core.geometry import generate_pointcloud


def _case(n=300, seed=0, box=(5.0, 6.0, 7.0), cutoff=1.0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(0, 1, (n, 3)) * np.asarray(box)
    return CellGrid(pts, cutoff=cutoff), pts, cutoff


def test_cells_partition_particles():
    """Occupied cells partition the particle set; per-cell members match
    a numpy groupby on the flat keys."""
    cg, pts, cutoff = _case()
    seen = {}
    for cell in cg.cells():
        assert len(cell) > 0  # cells() yields OCCUPIED cells only
        for i, p in cell:
            assert i not in seen
            seen[i] = cell.index
            np.testing.assert_allclose(p, pts[i], rtol=0, atol=0)
    assert sorted(seen) == list(range(len(pts)))
    # groupby oracle: same flat key per cell member
    snap = cg._cell_snapshot()
    c = np.floor((pts - snap["origin"]) / cutoff).astype(np.int64)
    keys = c @ snap["strides"]
    for i, k in seen.items():
        assert keys[i] == k


def test_query_returns_containing_cell():
    cg, pts, cutoff = _case(seed=1)
    for i in [0, 7, 123, 299]:
        cell = cg.query(pts[i])
        assert cell is not None
        members = [j for j, _ in cell]
        assert i in members
        # every member really is in the same cell
        snap = cg._cell_snapshot()
        c = np.floor((pts - snap["origin"]) / cutoff).astype(np.int64)
        keys = c @ snap["strides"]
        assert all(keys[j] == cell.index for j in members)


def test_query_empty_cell_and_out_of_range():
    """Empty-cell queries give a live, empty handle (iters.rs:154-168);
    more than one cell layer outside gives None (util.rs:245-256)."""
    rng = np.random.default_rng(2)
    # two distant occupied corners leave plenty of empty cells between
    pts = np.concatenate([
        rng.uniform(0, 1, (50, 3)),
        rng.uniform(0, 1, (50, 3)) + 8.0,
    ])
    cg = CellGrid(pts, cutoff=1.0)
    mid = cg.query([4.5, 4.5, 4.5])
    assert mid is not None and len(mid) == 0
    assert list(mid) == []
    assert mid.particle_pairs() == []
    # one layer outside is allowed...
    edge = cg.query(np.min(pts, axis=0) - 0.5)
    assert edge is not None
    # ...two layers is not
    assert cg.query(np.min(pts, axis=0) - 2.5) is None
    assert cg.query(np.max(pts, axis=0) + 2.5) is None


def test_cell_neighbors_full_and_half():
    """Full-space neighbors come in +/- pairs; half is one of each pair
    (the half-space trick, iters.rs:58-117)."""
    cg, pts, cutoff = _case(n=500, seed=3, box=(4.0, 4.0, 4.0))
    cell = cg.query(pts[0])
    full = {c.index for c in cell.neighbors("full")}
    half = {c.index for c in cell.neighbors("half")}
    assert half <= full
    assert cell.index not in full
    # each full neighbor is occupied
    for c in cell.neighbors("full"):
        assert len(c) > 0
    with pytest.raises(ValueError):
        cell.neighbors("diagonal")


def test_particle_pairs_cover_grid_iteration():
    """Union of per-cell particle_pairs over occupied cells == the
    grid-level candidate pair set, each unique pair exactly once
    (cellgrid.rs:338-340 contract)."""
    cg, pts, cutoff = _case(n=200, seed=4, box=(3.5, 3.5, 3.5))
    per_cell = set()
    for cell in cg.cells():
        for (i, _p), (j, _q) in cell.particle_pairs():
            key = (min(i, j), max(i, j))
            assert key not in per_cell, "pair emitted twice"
            per_cell.add(key)
    i, j = cg.pairs(within_cutoff=False)
    grid_level = {(min(a, b), max(a, b)) for a, b in zip(i, j)}
    assert per_cell == grid_level


def test_chessboard_cell_counts():
    """Chessboard fixture (util.rs:309-340): every occupied cell holds
    exactly 2 particles, intra pairs = #occupied cells, and the per-cell
    pair union reproduces the 4/24/28 golden counts scaled to the board
    (iters.rs:293-388 transfers: 2x2x2 -> 4 intra + 24 inter = 28)."""
    pts = generate_pointcloud((2, 2, 2), 1.0, (0.0, 0.0, 0.0))
    cg = CellGrid(pts, cutoff=1.0)
    cells = list(cg.cells())
    assert len(cells) == 4  # even-index cells of a 2x2x2 board
    assert all(len(c) == 2 for c in cells)
    intra = inter = 0
    for cell in cells:
        for (i, _), (j, _) in cell.particle_pairs():
            ci = np.floor(pts[i] / 1.0).astype(int)
            cj = np.floor(pts[j] / 1.0).astype(int)
            if np.array_equal(ci, cj):
                intra += 1
            else:
                inter += 1
    assert intra == 4
    assert inter == 24


def test_handles_survive_rebuild():
    """Rebuild leaves existing handles iterating their snapshot (the
    documented deviation from the reference's RuntimeError)."""
    cg, pts, cutoff = _case(n=100, seed=5)
    cell = cg.query(pts[0])
    before = list(cell)
    cg.rebuild(pts + 100.0)
    assert list(cell) == before
    fresh = cg.query(pts[0] + 100.0)
    assert fresh is not None and len(fresh) >= 1


def test_api_generic_dimension():
    """`CellGrid` accepts (n, dim) arrays for any dim >= 2 (the reference
    type is const-generic over N, lib.rs:132-135): pair sets and
    neighbor queries are exact vs brute force; the grid bins on
    min(dim, 3) axes with exact N-D distance filtering on top."""
    rng = np.random.default_rng(6)
    for dim in (2, 4, 5):
        pts = rng.uniform(0, 1, (120, dim)) * 3.0
        cg = CellGrid(pts, cutoff=1.0)
        d = pts[:, None] - pts[None, :]
        dsq = (d * d).sum(-1)
        np.fill_diagonal(dsq, np.inf)
        i, j = cg.pairs(within_cutoff=True)
        got = {(min(a, b), max(a, b)) for a, b in zip(i, j)}
        iu, ju = np.nonzero(np.triu(dsq < 1.0))
        assert got == set(zip(iu.tolist(), ju.tolist()))
        # per-cell enumeration covers the same candidate set
        per_cell = sum(len(c.particle_pairs()) for c in cg.cells())
        assert per_cell == len(cg.pairs()[0])
        # eager neighbors (<= cutoff) vs brute force
        nb = {k for k, _ in cg.neighbors(pts[7]) if k != 7}
        want = set(np.nonzero(np.sqrt(dsq[7]) <= 1.0)[0].tolist())
        assert nb == want
        # aabb has dim entries
        lo, hi = cg.aabb()
        assert len(lo) == dim and len(hi) == dim
