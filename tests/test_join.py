"""Generic cross-set join reductions (`ops.join`) vs numpy brute force."""

import numpy as np
import pytest

import jax.numpy as jnp

from zelll_tpu.core.grid import build
from zelll_tpu.ops.join import (
    count_neighbors, grid_join_reduce, nearest_dsq,
)


def _cloud(n, box, seed):
    rng = np.random.default_rng(seed)
    return rng.uniform(0, 1, (n, 3)) * np.asarray(box)


@pytest.mark.parametrize("box,cutoff", [
    ((10.0, 10.0, 10.0), 1.5),   # cubic
    ((30.0, 30.0, 2.0), 1.0),    # thin
])
def test_count_neighbors_matches_bruteforce(box, cutoff):
    pos = _cloud(700, box, 0)
    rng = np.random.default_rng(1)
    queries = np.concatenate([
        _cloud(150, box, 2),
        pos[:5],                       # coincident: dsq == 0 counts
        rng.uniform(-50, 50, (10, 3)),  # mostly out of range
    ])
    grid = build(jnp.asarray(pos), cutoff)
    counts, valid, ok = count_neighbors(grid, jnp.asarray(queries),
                                        interpret=True)
    assert bool(ok)

    dsq = ((queries[:, None, :] - pos[None, :, :]) ** 2).sum(-1)
    ref = (dsq <= cutoff**2).sum(1)
    v = np.asarray(valid)
    np.testing.assert_array_equal(np.asarray(counts)[v], ref[v])
    # out-of-range queries have no neighbors by construction of the grid
    assert (np.asarray(counts)[~v] == 0).all()


def test_nearest_dsq_matches_bruteforce():
    pos = _cloud(500, (8.0, 8.0, 8.0), 3)
    queries = np.concatenate([
        _cloud(120, (8.0, 8.0, 8.0), 4),
        pos[:3],  # dsq == 0
    ])
    cutoff = 1.2
    grid = build(jnp.asarray(pos), cutoff)
    nd, valid, ok = nearest_dsq(grid, jnp.asarray(queries), interpret=True)
    assert bool(ok)

    dsq = ((queries[:, None, :] - pos[None, :, :]) ** 2).sum(-1)
    dsq = np.where(dsq <= cutoff**2, dsq, np.inf)
    ref = dsq.min(1)
    nd = np.asarray(nd)
    has = np.isfinite(ref)
    np.testing.assert_allclose(nd[has], ref[has], rtol=1e-12)
    assert np.isinf(nd[~has]).all()
    assert nd[len(queries) - 3 :].max() == 0.0


def test_join_payload_weighted_sum():
    """User-defined term with a payload plane: mass-weighted density
    sum(m_j * (csq - dsq)) over neighbors."""
    pos = _cloud(400, (6.0, 6.0, 6.0), 5)
    mass = np.random.default_rng(6).uniform(0.5, 2.0, 400)
    queries = _cloud(90, (6.0, 6.0, 6.0), 7)
    cutoff = 1.5
    grid = build(jnp.asarray(pos), cutoff)
    csq = cutoff**2

    def term(dsq, d, payload, within):
        w = jnp.where(within, csq - dsq, 0.0)
        return [w * payload[0]]

    mass_sorted = jnp.asarray(mass)[grid.bins.perm]
    out, valid, ok = grid_join_reduce(
        grid, jnp.asarray(queries), term=term, n_out=1,
        payload=(mass_sorted,), interpret=True,
    )
    assert bool(ok)

    dsq = ((queries[:, None, :] - pos[None, :, :]) ** 2).sum(-1)
    ref = (np.where(dsq <= csq, csq - dsq, 0.0) * mass).sum(1)
    np.testing.assert_allclose(np.asarray(out)[:, 0], ref, rtol=1e-9)


def test_join_multi_output_max():
    """n_out > 1 with the max reducer: componentwise max of |d| over
    neighbors (bounding-box half-extent of each query's neighborhood)."""
    pos = _cloud(300, (5.0, 5.0, 5.0), 8)
    queries = _cloud(60, (5.0, 5.0, 5.0), 9)
    cutoff = 1.4
    grid = build(jnp.asarray(pos), cutoff)

    def term(dsq, d, payload, within):
        return [jnp.where(within, jnp.abs(da), -jnp.inf) for da in d]

    out, valid, ok = grid_join_reduce(
        grid, jnp.asarray(queries), term=term, n_out=3, reducer="max",
        interpret=True,
    )
    assert bool(ok)

    dvec = queries[:, None, :] - pos[None, :, :]
    dsq = (dvec**2).sum(-1)
    w = dsq <= cutoff**2
    ref = np.where(w[..., None], np.abs(dvec), -np.inf).max(1)
    has = w.any(1)
    np.testing.assert_allclose(np.asarray(out)[has], ref[has], rtol=1e-12)
    assert np.isneginf(np.asarray(out)[~has]).all()


def test_join_empty_and_single_particle():
    grid = build(jnp.asarray([[1.0, 1.0, 1.0]]), 1.0)
    q = jnp.asarray([[1.2, 1.0, 1.0], [50.0, 0.0, 0.0]])
    counts, valid, ok = count_neighbors(grid, q, interpret=True)
    assert bool(ok)
    np.testing.assert_array_equal(np.asarray(counts), [1, 0])
    np.testing.assert_array_equal(np.asarray(valid), [True, False])


def test_api_count_and_nearest_match_neighbors():
    from zelll_tpu.api import CellGrid

    pos = _cloud(300, (6.0, 6.0, 6.0), 10)
    cg = CellGrid(pos, cutoff=1.3)
    rng = np.random.default_rng(11)
    queries = np.concatenate([_cloud(40, (6.0, 6.0, 6.0), 12),
                              rng.uniform(-40, 40, (5, 3))])
    counts, valid = cg.count_neighbors_batch(queries)
    dists, valid2 = cg.nearest_neighbor_distances(queries)
    np.testing.assert_array_equal(valid, valid2)
    for qi, q in enumerate(queries):
        nb = cg.neighbors(q)
        if nb is None:
            assert not valid[qi]
            continue
        assert counts[qi] == len(nb)
        if len(nb):
            ref = min(np.linalg.norm(np.asarray(p) - q) for _, p in nb)
            np.testing.assert_allclose(dists[qi], ref, rtol=1e-12)
        else:
            assert np.isinf(dists[qi])


def test_api_count_nearest_empty_grid():
    from zelll_tpu.api import CellGrid

    cg = CellGrid(np.zeros((0, 3)), cutoff=1.0)
    counts, valid = cg.count_neighbors_batch(np.zeros((3, 3)))
    dists, _ = cg.nearest_neighbor_distances(np.zeros((3, 3)))
    np.testing.assert_array_equal(counts, [0, 0, 0])
    assert np.isinf(dists).all() and not valid.any()


@pytest.mark.parametrize("trial", range(6))
def test_join_fuzz_random_configs(trial):
    """Random boxes/densities/query mixes vs brute force: exercises
    join_bounds edges (queries before/after all particle keys, empty
    bands, single-chunk particle arrays, coincident points)."""
    rng = np.random.default_rng(100 + trial)
    n = int(rng.integers(1, 900))
    box = rng.uniform(1.0, 25.0, 3)
    cutoff = float(rng.uniform(0.5, 4.0))
    pos = rng.uniform(0, 1, (n, 3)) * box
    nq = int(rng.integers(1, 300))
    queries = np.concatenate([
        rng.uniform(-0.3, 1.3, (nq, 3)) * box,  # straddle the box edges
        pos[rng.integers(0, n, 3)],             # coincident
    ])
    grid = build(jnp.asarray(pos), cutoff)
    counts, valid, ok = count_neighbors(grid, jnp.asarray(queries),
                                        interpret=True)
    assert bool(ok)
    dsq = ((queries[:, None, :] - pos[None, :, :]) ** 2).sum(-1)
    ref = (dsq <= cutoff**2).sum(1)
    v = np.asarray(valid)
    np.testing.assert_array_equal(np.asarray(counts)[v], ref[v],
                                  err_msg=f"trial {trial} n={n} "
                                          f"cutoff={cutoff} box={box}")
    assert (np.asarray(counts)[~v] == 0).all()
