"""Dense cell-table backend: the wired form of the reference's
sparse-vs-dense GridStorage axis (storage.rs:172-302, never wired there).

Equality contract: every pair/query API must produce identical results
with `dense=` as with the default binary-search lookup."""

import jax.numpy as jnp
import numpy as np
import pytest

from zelll_tpu.core import (
    build,
    build_dense_table,
    count_pairs,
    generate_pointcloud,
    pair_forces,
    pair_sum,
    query_neighbors,
)
from zelll_tpu.ops.lj import lj, lj_force_factor


def _capacity(grid):
    padded = np.asarray(grid.info.shape) + 4
    return int(np.prod(padded))


def _cloud(n=500, seed=3, box=(6.0, 5.0, 7.0)):
    rng = np.random.default_rng(seed)
    return rng.uniform(0, 1, (n, 3)) * np.asarray(box)


def test_dense_matches_sparse_pair_sum_and_count():
    pts = _cloud()
    cutoff = 1.0
    grid = build(jnp.asarray(pts), cutoff)
    K = int(grid.bins.max_cell_count())
    table = build_dense_table(grid.bins, _capacity(grid))
    assert bool(table.fits)

    e_sparse = pair_sum(grid, lj, K=K, chunk=32, cutoff_sq=cutoff**2)
    e_dense = pair_sum(grid, lj, K=K, chunk=32, cutoff_sq=cutoff**2, dense=table)
    np.testing.assert_allclose(float(e_dense), float(e_sparse), rtol=1e-12)

    c_sparse = count_pairs(grid, K=K, cutoff_sq=cutoff**2)
    c_dense = count_pairs(grid, K=K, cutoff_sq=cutoff**2, dense=table)
    assert int(c_dense) == int(c_sparse)


def test_dense_matches_sparse_forces():
    pts = _cloud(n=300, seed=11)
    cutoff = 1.0
    grid = build(jnp.asarray(pts), cutoff)
    K = int(grid.bins.max_cell_count())
    table = build_dense_table(grid.bins, _capacity(grid))
    f_s = pair_forces(grid, lj_force_factor, K=K, chunk=32, cutoff_sq=cutoff**2)
    f_d = pair_forces(
        grid, lj_force_factor, K=K, chunk=32, cutoff_sq=cutoff**2, dense=table
    )
    np.testing.assert_allclose(np.asarray(f_d), np.asarray(f_s), rtol=1e-12)


def test_dense_query_neighbors_matches():
    pts = _cloud(n=400, seed=5)
    cutoff = 1.0
    grid = build(jnp.asarray(pts), cutoff)
    K = int(grid.bins.max_cell_count())
    table = build_dense_table(grid.bins, _capacity(grid))
    # in-box, boundary-cell, and out-of-range query points
    q = jnp.asarray(
        np.vstack([pts[:10], [[0.01, 0.01, 0.01]], [[50.0, 50.0, 50.0]]])
    )
    r_s = query_neighbors(grid, q, K=K)
    r_d = query_neighbors(grid, q, K=K, dense=table)
    np.testing.assert_array_equal(np.asarray(r_d.valid), np.asarray(r_s.valid))
    np.testing.assert_array_equal(np.asarray(r_d.mask), np.asarray(r_s.mask))
    np.testing.assert_array_equal(
        np.sort(np.where(np.asarray(r_d.mask), np.asarray(r_d.ids), -1), axis=1),
        np.sort(np.where(np.asarray(r_s.mask), np.asarray(r_s.ids), -1), axis=1),
    )


def test_dense_chessboard_counts():
    """Closed-form chessboard fixture through the dense path (the fixture
    the reference's own tests rely on, util.rs:309-340)."""
    pts = generate_pointcloud((2, 2, 2), 1.0, (0.0, 0.0, 0.0))
    grid = build(jnp.asarray(pts), 1.0)
    K = int(grid.bins.max_cell_count())
    table = build_dense_table(grid.bins, _capacity(grid))
    assert bool(table.fits)
    total = count_pairs(grid, K=K, dense=table)
    intra = count_pairs(
        grid, K=K, cutoff_sq=jnp.asarray(0.0), dense=table
    )  # dsq < 0 never true: 0 pairs sanity
    assert int(intra) == 0
    # candidate pairs = 28 on the 2-per-even-cell 2x2x2 board (4 intra + 24 inter)
    assert int(total) == 28


def test_dense_capacity_flag():
    pts = _cloud(n=200, seed=9)
    grid = build(jnp.asarray(pts), 1.0)
    table = build_dense_table(grid.bins, 8)  # deliberately tiny
    assert not bool(table.fits)


def test_api_dense_option():
    """api.CellGrid(dense=True) must agree with the sparse default and
    survive pickle."""
    import pickle

    from zelll_tpu.api import CellGrid

    pts = _cloud(n=120, seed=21, box=(4.0, 4.0, 4.0))
    a = CellGrid(pts, cutoff=1.0)
    b = CellGrid(pts, cutoff=1.0, dense=True)
    assert b._dense is not None
    ia, ja = a.pairs(within_cutoff=True)
    ib, jb = b.pairs(within_cutoff=True)
    assert set(zip(ia.tolist(), ja.tolist())) == set(zip(ib.tolist(), jb.tolist()))
    na = a.neighbors(pts[0])
    nb = b.neighbors(pts[0])
    assert sorted(i for i, _ in na) == sorted(i for i, _ in nb)

    c = pickle.loads(pickle.dumps(b))
    assert c._use_dense and c._dense is not None
    ic, jc = c.pairs(within_cutoff=True)
    assert set(zip(ic.tolist(), jc.tolist())) == set(zip(ib.tolist(), jb.tolist()))

    # rebuild keeps the dense table fresh
    b.rebuild(pts + 0.25)
    a.rebuild(pts + 0.25)
    ia, ja = a.pairs(within_cutoff=True)
    ib, jb = b.pairs(within_cutoff=True)
    assert set(zip(ia.tolist(), ja.tolist())) == set(zip(ib.tolist(), jb.tolist()))
