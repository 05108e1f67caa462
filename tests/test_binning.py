"""Binning pipeline tests: occupancy invariants from the reference
(iters.rs:298-331) plus padding/validity behavior new to the array design."""

import jax.numpy as jnp
import numpy as np

from zelll_tpu.core import build, build_bins, generate_pointcloud
from zelll_tpu.core.geometry import SENTINEL_KEY


def test_chessboard_occupancy():
    points = jnp.asarray(generate_pointcloud([3, 3, 3], 1.0, [0.0, 0.0, 0.0]))
    bins = build_bins(points, 1.0)
    assert int(bins.num_cells) == 14  # iters.rs:304
    counts = np.asarray(bins.cell_counts)
    assert counts.sum() == points.shape[0]  # particle conservation
    assert (counts[:14] == 2).all()  # two points per occupied cell
    assert (counts[14:] == 0).all()
    assert not bool(bins.overflow)


def test_cell_table_sorted_and_consistent():
    rng = np.random.default_rng(7)
    pts = jnp.asarray(rng.uniform(0, 10, size=(500, 3)))
    bins = build_bins(pts, 1.3)
    nc = int(bins.num_cells)
    keys = np.asarray(bins.cell_keys)
    starts = np.asarray(bins.cell_starts)
    counts = np.asarray(bins.cell_counts)
    sorted_keys = np.asarray(bins.sorted_keys)

    assert (np.diff(keys[:nc]) > 0).all()  # strictly ascending, unique
    assert (keys[nc:] == SENTINEL_KEY).all()
    assert counts[:nc].sum() == 500
    # CSR layout: starts/counts tile the sorted array exactly
    np.testing.assert_array_equal(starts[:nc], np.cumsum(counts[:nc]) - counts[:nc])
    for c in range(nc):
        seg = sorted_keys[starts[c] : starts[c] + counts[c]]
        assert (seg == keys[c]).all()


def test_stable_sort_preserves_input_order_within_cell():
    # the reference scatters particles in input order (cellgrid.rs:215-231)
    points = jnp.asarray(generate_pointcloud([3, 3, 3], 1.0, [0.0, 0.0, 0.0]))
    grid = build(points, 1.0)
    perm = np.asarray(grid.bins.perm)
    keys = np.asarray(grid.bins.keys)
    # within each cell, sorted ids are increasing input indices
    sorted_keys = keys[perm]
    for c in np.unique(sorted_keys):
        ids = perm[sorted_keys == c]
        assert (np.diff(ids) > 0).all()


def test_padding_rows_excluded():
    rng = np.random.default_rng(3)
    real = rng.uniform(0, 5, size=(100, 3))
    pad = np.full((28, 3), 1e9)  # garbage placed far away
    pts = jnp.asarray(np.vstack([real, pad]))
    valid = jnp.asarray(np.arange(128) < 100)
    bins = build_bins(pts, 1.0, valid=valid)
    assert int(bins.num_valid) == 100
    counts = np.asarray(bins.cell_counts)
    assert counts.sum() == 100
    # bounding box ignores padding
    np.testing.assert_allclose(np.asarray(bins.info.origin), real.min(axis=0))
    # padded grid matches unpadded grid cell-for-cell
    ref = build_bins(jnp.asarray(real), 1.0)
    nc = int(bins.num_cells)
    assert nc == int(ref.num_cells)
    np.testing.assert_array_equal(
        np.asarray(bins.cell_keys)[:nc], np.asarray(ref.cell_keys)[:nc]
    )
    np.testing.assert_array_equal(
        np.asarray(bins.cell_counts)[:nc], np.asarray(ref.cell_counts)[:nc]
    )


def test_zero_and_one_particle():
    bins = build_bins(jnp.zeros((0, 3)), 1.0)
    assert int(bins.num_cells) == 0
    grid = build(jnp.asarray([[1.0, 2.0, 3.0]]), 1.0)
    assert int(grid.num_cells) == 1
    assert int(grid.bins.cell_counts[0]) == 1
