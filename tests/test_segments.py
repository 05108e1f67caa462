"""Segment bands + per-chunk bounds for the tile kernel (CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from zelll_tpu.core import build
from zelll_tpu.core.geometry import SENTINEL_KEY
from zelll_tpu.ops.segments import CHUNK, chunk_bounds, segment_bands


def _padded_keys(grid):
    keys = np.asarray(grid.bins.sorted_keys)
    n = len(keys)
    C = -(-n // CHUNK) * CHUNK
    out = np.full(C, np.iinfo(np.int32).max, np.int32)
    out[:n] = keys
    return jnp.asarray(out)


@pytest.mark.parametrize("n,box,cutoff", [
    (4000, (20.0, 20.0, 20.0), 1.0),   # cubic — the motivating shape
    (1500, (3.0, 3.0, 60.0), 1.0),     # thin
    (900, (50.0, 50.0, 2.0), 1.5),     # flat
])
def test_every_cutoff_pair_in_exactly_one_band_window(n, box, cutoff):
    rng = np.random.default_rng(n)
    pts = rng.uniform(0, 1, (n, 3)) * np.asarray(box)
    grid = build(jnp.asarray(pts), cutoff)
    keys = _padded_keys(grid)
    strides = np.asarray(grid.info.strides)
    bands = np.asarray(segment_bands(strides))
    max_j = 8
    jlo, toff, jnum, ok = chunk_bounds(keys, jnp.asarray(bands), max_j)
    jlo, toff, jnum = map(np.asarray, (jlo, toff, jnum))
    assert bool(ok)

    spos = np.asarray(grid.sorted_pos)
    k = np.asarray(keys)[: len(spos)]
    d = spos[:, None] - spos[None, :]
    dsq = (d * d).sum(-1)
    ii, jj = np.nonzero((dsq < cutoff**2) & np.tri(len(spos), k=-1, dtype=bool))
    assert len(ii) > 100
    for i, j in zip(ii, jj):
        diff = int(k[i]) - int(k[j])
        in_band = (bands[:, 0] <= diff) & (diff <= bands[:, 1])
        assert in_band.sum() == 1, (diff, bands)
        s = int(np.argmax(in_band))
        ci, cj = i // CHUNK, j // CHUNK
        lo = jlo[ci, s] + toff[ci, s]
        assert lo <= cj <= lo + jnum[ci, s] - 1, (i, j, s, cj, lo, jnum[ci, s])


def test_bands_disjoint_and_2d():
    strides = jnp.asarray([1, 9], jnp.int32)
    b = np.asarray(segment_bands(strides))
    assert b.shape == (2, 2)
    assert b[0].tolist() == [0, 1] and b[1].tolist() == [8, 10]

    strides3 = jnp.asarray([1, 7, 49], jnp.int32)
    b3 = np.asarray(segment_bands(strides3))
    # disjoint, ascending
    flat = b3.reshape(-1)
    assert np.all(np.diff(flat) >= 1)


def test_coverage_flag_trips_on_small_max_j():
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 1, (4000, 3)) * 20.0
    grid = build(jnp.asarray(pts), 1.0)
    keys = _padded_keys(grid)
    bands = segment_bands(grid.info.strides)
    *_, ok1 = chunk_bounds(keys, bands, 1)
    *_, ok8 = chunk_bounds(keys, bands, 8)
    assert not bool(ok1)
    assert bool(ok8)


def test_sentinel_padding_gives_empty_windows():
    # a fully padded chunk must produce jnum == 0 everywhere
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 1, (CHUNK + 7, 3)) * 5.0  # 2 chunks, 121 pad rows
    grid = build(jnp.asarray(pts), 1.0)
    keys = _padded_keys(grid)
    bands = segment_bands(grid.info.strides)
    jlo, toff, jnum, ok = chunk_bounds(keys, bands, 4)
    assert bool(ok)
    jnum = np.asarray(jnum)
    # the last chunk is mostly sentinels; its own-row window must not
    # include sentinel-sentinel "pairs" beyond its own chunk — only checks
    # that nothing exploded
    assert jnum.max() <= 4
