"""Geometry golden-value tests, transferred from the reference unit tests
(util.rs:342-431, flatindex.rs:156-193)."""

import jax.numpy as jnp
import numpy as np
import pytest

from zelll_tpu.core import (
    GridInfo,
    aabb_from_positions,
    build,
    full_stencil,
    generate_pointcloud,
    half_stencil,
)


def test_generate_pointcloud_golden():
    # util.rs:347-379
    expected = np.array(
        [
            [0.0, 0.0, 0.0], [0.5, 0.5, 0.5],
            [0.0, 0.0, 2.0], [0.5, 0.5, 2.5],
            [0.0, 1.0, 1.0], [0.5, 1.5, 1.5],
            [0.0, 2.0, 0.0], [0.5, 2.5, 0.5],
            [0.0, 2.0, 2.0], [0.5, 2.5, 2.5],
            [1.0, 0.0, 1.0], [1.5, 0.5, 1.5],
            [1.0, 1.0, 0.0], [1.5, 1.5, 0.5],
            [1.0, 1.0, 2.0], [1.5, 1.5, 2.5],
            [1.0, 2.0, 1.0], [1.5, 2.5, 1.5],
            [2.0, 0.0, 0.0], [2.5, 0.5, 0.5],
            [2.0, 0.0, 2.0], [2.5, 0.5, 2.5],
            [2.0, 1.0, 1.0], [2.5, 1.5, 1.5],
            [2.0, 2.0, 0.0], [2.5, 2.5, 0.5],
            [2.0, 2.0, 2.0], [2.5, 2.5, 2.5],
        ]
    )
    np.testing.assert_array_equal(
        generate_pointcloud([3, 3, 3], 1.0, [0.0, 0.0, 0.0]), expected
    )


def test_grid_info_golden():
    # util.rs:382-430
    points = generate_pointcloud([3, 3, 3], 1.0, [0.2, 0.25, 0.3])
    assert points.shape[0] == 28

    aabb = aabb_from_positions(jnp.asarray(points))
    np.testing.assert_allclose(np.asarray(aabb.inf), [0.2, 0.25, 0.3])
    np.testing.assert_allclose(np.asarray(aabb.sup), [2.7, 2.75, 2.8])

    info = GridInfo.create(aabb, 1.0)
    np.testing.assert_allclose(np.asarray(info.origin), [0.2, 0.25, 0.3])
    np.testing.assert_array_equal(np.asarray(info.shape), [3, 3, 3])
    # strides for shape + [4, 4, 4]
    np.testing.assert_array_equal(np.asarray(info.strides), [1, 7, 49])

    # float-imprecision tolerance case: 2.3 - 0.3 = 1.9999999999999998
    idx, ok = info.try_cell_index(jnp.asarray([2.7, 2.75, 2.3]))
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(idx), [2, 2, 1])
    assert int(info.flat_cell_index(jnp.asarray([2.7, 2.75, 2.3]))) == 65

    idx, ok = info.try_cell_index(jnp.asarray([2.7, 2.75, 2.8]))
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(idx), [2, 2, 2])
    assert int(info.flat_cell_index(jnp.asarray([2.7, 2.75, 2.8]))) == 114


def test_try_cell_index_bounds():
    # util.rs doc-tests: [-1;3] is allowed, [-2;3] is not (cell index
    # panics <-> validity mask False).
    data = jnp.asarray([[0.0, 0.0, 0.0], [1.0, 2.0, 0.0], [0.0, 0.1, 0.2]])
    info = GridInfo.create(aabb_from_positions(data), 1.0)
    _, ok = info.try_cell_index(jnp.asarray([-1.0, -1.0, -1.0]))
    assert bool(ok)
    _, ok = info.try_cell_index(jnp.asarray([-2.0, -2.0, -2.0]))
    assert not bool(ok)
    # flat_cell_index never bounds-checks
    p = jnp.asarray([-1.0, -1.0, -1.0])
    idx, _ = info.try_cell_index(p)
    assert int(info.flat_cell_index(p)) == int(info.flatten_index(idx))


def test_neighbor_indices_2d_golden():
    # flatindex.rs:163-171: 2-particle 2D grid -> 8x8 padded board
    points = jnp.asarray([[0.0, 0.0], [3.0, 3.0]])
    info = GridInfo.create(aabb_from_positions(points), 1.0)
    np.testing.assert_array_equal(
        np.asarray(full_stencil(info)), [-9, -1, 7, -8, 8, -7, 1, 9]
    )
    np.testing.assert_array_equal(np.asarray(half_stencil(info)), [-9, -1, 7, -8])


def test_stencil_negation_symmetry():
    points = jnp.asarray(generate_pointcloud([3, 3, 3], 1.0, [0.0, 0.0, 0.0]))
    info = GridInfo.create(aabb_from_positions(points), 1.0)
    full = np.asarray(full_stencil(info))
    assert full.shape == (26,)
    np.testing.assert_array_equal(full, -full[::-1])
    assert 0 not in full
    assert len(set(full.tolist())) == 26


def test_flatindex_per_particle():
    # flatindex.rs:174-192: keys in input order match flatten(cell multi-index)
    points = generate_pointcloud([3, 3, 3], 1.0, [0.0, 0.0, 0.0])
    grid = build(jnp.asarray(points), 1.0)
    expected = []
    info = grid.info
    strides = np.asarray(info.strides)
    for x in range(3):
        for y in range(3):
            for z in range(3):
                if (x + y + z) % 2 == 0:
                    k = int(np.dot([x, y, z], strides))
                    expected += [k, k]
    np.testing.assert_array_equal(np.asarray(grid.bins.keys), expected)
