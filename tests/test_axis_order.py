"""Axis auto-ordering: stride assignment by ascending cell count.

The lag/tile kernels' candidate window is `key_window(strides)`, which
depends on the two smallest stride-generating extents. The reference keys
cells in fixed axis order (util.rs:191-220), so an x-elongated box keys
pathologically (the huge axis lands in every stride product). With
`GridInfo.create(auto_order=True)` the largest extent always gets the
largest stride: orientation no longer matters. These tests pin

* the per-axis stride vector semantics (scattered back to axis order),
* `key_window`'s order-free form (sum(strides), == sum(strides[1:]) + 1
  for identity ordering),
* end-to-end energy/count invariance of the fused and tile paths under
  axis permutation of the SAME physical point set.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from zelll_tpu.core.geometry import Aabb, GridInfo, key_window
from zelll_tpu.ops.fused import fused_lj_rebuild_energy
from zelll_tpu.ops.pallas_pairs import combine_count, count_term, suggest_lag
from zelll_tpu.ops.tile_pairs import tile_lj_rebuild_energy


def _info(box, cutoff, auto_order):
    aabb = Aabb(
        inf=jnp.zeros(3, jnp.float64), sup=jnp.asarray(box, jnp.float64)
    )
    return GridInfo.create(aabb, cutoff, auto_order=auto_order)


def test_auto_order_strides_are_orientation_free():
    # z-elongated (the friendly orientation) vs x-elongated (the adverse
    # one): auto_order gives the same stride SET, so the same key window
    cutoff = 1.0
    friendly = _info((3.0, 4.0, 500.0), cutoff, auto_order=False)
    adverse_fixed = _info((500.0, 4.0, 3.0), cutoff, auto_order=False)
    adverse_auto = _info((500.0, 4.0, 3.0), cutoff, auto_order=True)

    np.testing.assert_array_equal(
        np.sort(np.asarray(adverse_auto.strides)),
        np.sort(np.asarray(friendly.strides)),
    )
    # the adverse fixed-order window is far larger (62x for this box;
    # the ratio grows with the elongated extent)
    assert int(key_window(adverse_fixed.strides)) > 10 * int(
        key_window(adverse_auto.strides)
    )
    assert int(key_window(adverse_auto.strides)) == int(
        key_window(friendly.strides)
    )
    # smallest extent gets stride 1; largest extent the largest stride
    s = np.asarray(adverse_auto.strides)
    assert s[2] == 1 and s[0] == s.max()


def test_auto_order_identity_on_friendly_and_tied_boxes():
    # already-ascending extents and full ties keep the reference strides
    # (argsort is stable), so golden values like (1, 7, 49) are unchanged
    for box in [(2.5, 2.5, 2.5), (3.0, 4.0, 500.0)]:
        a = _info(box, 1.0, auto_order=False)
        b = _info(box, 1.0, auto_order=True)
        np.testing.assert_array_equal(
            np.asarray(a.strides), np.asarray(b.strides)
        )
    np.testing.assert_array_equal(
        np.asarray(_info((2.5, 2.5, 2.5), 1.0, True).strides), [1, 7, 49]
    )


def test_key_window_matches_historical_form():
    info = _info((3.0, 4.0, 500.0), 1.0, auto_order=False)
    s = np.asarray(info.strides)
    assert int(key_window(info.strides)) == int(s[1:].sum() + 1) == s.sum()


def _cloud(n, box, seed):
    rng = np.random.default_rng(seed)
    return rng.uniform(0, 1, (n, 3)) * np.asarray(box)


def _brute_lj(pts, cutoff):
    d = pts[:, None] - pts[None, :]
    dsq = (d * d).sum(-1)
    m = (dsq < cutoff**2) & np.tri(len(pts), k=-1, dtype=bool).T
    inv = np.where(m, 1.0 / np.where(m, dsq, 1.0), 0.0)
    t = inv**3
    return int(m.sum()), float((4 * t * (t - 1)).sum())


def test_fused_energy_is_orientation_invariant():
    """The lag path on an x-elongated box: with auto_order the same L
    that covers the z-elongated orientation covers it too, and the
    energy matches brute force."""
    cutoff = 1.0
    pts = _cloud(1500, (3.0, 3.0, 160.0), 11)
    n_ref, e_ref = _brute_lj(pts, cutoff)
    for orient in [pts, pts[:, ::-1].copy()]:
        x = jnp.asarray(orient)
        e, ok = fused_lj_rebuild_energy(
            x, cutoff, M=2048, L=256, interpret=True
        )
        assert bool(ok), "lag coverage must hold in BOTH orientations"
        np.testing.assert_allclose(float(e), e_ref, rtol=1e-9)
        packed, ok2 = fused_lj_rebuild_energy(
            x, cutoff, M=2048, L=256, term=count_term,
            out_dtype=jnp.int32, interpret=True,
        )
        assert bool(ok2)
        assert combine_count(np.asarray(packed)) == n_ref


def test_fused_lag_requirement_is_orientation_free():
    """suggest_lag on the auto-ordered binning is identical across
    orientations (the adverse one needed L ~ n with fixed order)."""
    from zelll_tpu.core.binning import bin_and_sort

    cutoff = 1.0
    pts = _cloud(4000, (3.0, 3.0, 420.0), 12)
    lags = []
    for orient in [pts, pts[:, ::-1].copy()]:
        bins, _ = bin_and_sort(
            jnp.asarray(orient), cutoff, max_cells=1, need_perm=False,
            auto_order=True,
        )
        lags.append(
            suggest_lag(
                np.asarray(bins.sorted_keys), np.asarray(bins.info.strides)
            )
        )
    assert lags[0] == lags[1] <= 256


@pytest.mark.parametrize("box", [(40.0, 12.0, 12.0), (1.5, 40.0, 40.0)])
def test_tile_energy_is_orientation_invariant(box):
    cutoff = 1.2
    pts = _cloud(900, box, 13)
    n_ref, e_ref = _brute_lj(pts, cutoff)
    e, ok = tile_lj_rebuild_energy(
        jnp.asarray(pts), cutoff, CB=2, MAXJ=8, interpret=True
    )
    assert bool(ok)
    np.testing.assert_allclose(float(e), e_ref, rtol=1e-9)


def test_md_step_tile_adverse_orientation():
    """The packed tile MD step binned with auto_order: forces under axis
    reversal are the reversed-axis forces of the original system."""
    from zelll_tpu.models.lj_md import MDState, md_step_cubic_tile

    cutoff = 1.2
    pts = _cloud(700, (30.0, 9.0, 9.0), 14)
    vel = np.zeros_like(pts)
    s1, ok1 = md_step_cubic_tile(
        MDState(jnp.asarray(pts), jnp.asarray(vel)), cutoff, 1e-3,
        CB=2, MAXJ=8, interpret=True,
    )
    s2, ok2 = md_step_cubic_tile(
        MDState(jnp.asarray(pts[:, ::-1].copy()), jnp.asarray(vel)),
        cutoff, 1e-3, CB=2, MAXJ=8, interpret=True,
    )
    assert bool(ok1) and bool(ok2)
    # same particles, different sort orders: compare as sorted sets of rows
    a = np.asarray(s1.positions)
    b = np.asarray(s2.positions)[:, ::-1]
    a = a[np.lexsort(a.T)]
    b = b[np.lexsort(b.T)]
    np.testing.assert_allclose(a, b, rtol=1e-12, atol=1e-12)
