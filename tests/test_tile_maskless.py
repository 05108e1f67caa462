"""Maskless tile kernels (``bandmask=False``, round 3): with cell edge
== cutoff, pairs in non-stencil cells fail the distance test, so the
key-band compare can be dropped from the tile body once the executed
windows are made pairwise disjoint — which `trim_windows_disjoint` now
guarantees BY CONSTRUCTION (chunks straddling a y-row/z-layer key jump
have genuinely overlapping band windows; the trim assigns the overlap
to the higher band, coverage-preserving). Also covers
``kahan="program"`` and ``safe_term=False``.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from zelll_tpu.core.binning import bin_and_sort
from zelll_tpu.ops.pallas_pairs import combine_count, count_term
from zelll_tpu.ops.tile_pairs import tile_pair_forces, tile_pair_reduce


def _grid(pts):
    return bin_and_sort(jnp.asarray(pts), 1.0, max_cells=1,
                        need_perm=False, auto_order=False)


@pytest.fixture(scope="module")
def straddle_grid():
    """12x12x3 cells at exactly 40/cell: every ~8th chunk straddles a
    y-row (and some a z-layer) key jump, spanning 20-70+ keys — the
    shape whose overlapping windows broke the untrimmed maskless mode."""
    rng = np.random.default_rng(0)
    base = np.stack(
        np.meshgrid(np.arange(12), np.arange(12), np.arange(3),
                    indexing="ij"), -1
    ).reshape(-1, 3)
    pts = np.repeat(base, 40, axis=0) + rng.uniform(
        0.02, 0.98, (len(base) * 40, 3)
    )
    return _grid(pts)


def _compare(bins, sp, MAXJ):
    kw = dict(MAXJ=MAXJ, interpret=True)
    args = (sp, bins.sorted_keys, bins.info.strides, 1.0)

    e1, ok1 = tile_pair_reduce(*args, **kw)
    e2, ok2 = tile_pair_reduce(*args, bandmask=False, **kw)
    assert bool(ok1) and bool(ok2)
    # f64 interpret: pruned lanes fail the distance test anyway, so the
    # sums agree term-for-term
    assert float(e1) == pytest.approx(float(e2), rel=1e-12)

    c1, _ = tile_pair_reduce(*args, term=count_term, out_dtype=jnp.int32,
                             **kw)
    c2, okc = tile_pair_reduce(*args, term=count_term, out_dtype=jnp.int32,
                               bandmask=False, **kw)
    assert bool(okc)
    assert int(combine_count(c1)) == int(combine_count(c2))

    f1, _ = tile_pair_forces(*args, **kw)
    f2, okf = tile_pair_forces(*args, bandmask=False, **kw)
    assert bool(okf)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2),
                               rtol=1e-12, atol=1e-12)
    return e1


def test_maskless_matches_masked_on_straddling_chunks(straddle_grid):
    bins, sp = straddle_grid
    e = _compare(bins, sp, MAXJ=24)

    args = (sp, bins.sorted_keys, bins.info.strides, 1.0)
    e3, ok3 = tile_pair_reduce(*args, kahan="program", bandmask=False,
                               safe_term=False, MAXJ=24, interpret=True)
    assert bool(ok3)
    assert float(e3) == pytest.approx(float(e), rel=1e-9)


def test_maskless_small_dense_box_vs_brute_force():
    """Small sparse box: every band window overlaps every other before
    trimming; the trimmed maskless kernel must still be EXACT."""
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 4, (600, 3))
    bins, sp = _grid(pts)
    _compare(bins, sp, MAXJ=8)

    c2, ok = tile_pair_reduce(
        sp, bins.sorted_keys, bins.info.strides, 1.0, term=count_term,
        out_dtype=jnp.int32, bandmask=False, MAXJ=8, interpret=True,
    )
    assert bool(ok)
    d = pts[:, None, :] - pts[None, :, :]
    dsq = (d * d).sum(-1)
    np.fill_diagonal(dsq, np.inf)
    ref = int(np.triu(dsq < 1.0).sum())
    assert int(combine_count(c2)) == ref
