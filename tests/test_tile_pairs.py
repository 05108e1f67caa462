"""Segment-tile pair kernel correctness (interpret mode, CPU, f64-off).

The tile kernel must agree with brute force / the lag kernel on every box
shape — cubic is the shape it exists for."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zelll_tpu.core import build
from zelll_tpu.ops.pallas_pairs import combine_count, split_f64
from zelll_tpu.ops.tile_pairs import tile_count_pairs, tile_lj_energy


def _brute(pts, cutoff):
    d = pts[:, None] - pts[None, :]
    dsq = (d * d).sum(-1)
    m = (dsq < cutoff**2) & np.tri(len(pts), k=-1, dtype=bool).T
    inv = np.where(m, 1.0 / np.where(m, dsq, 1.0), 0.0)
    t = inv**3
    return int(m.sum()), float((4 * t * (t - 1)).sum())


CASES = [
    (2000, (12.0, 12.0, 12.0), 1.0),   # cubic
    (1200, (3.0, 3.0, 45.0), 1.0),     # thin (lag-kernel home turf)
    (800, (40.0, 40.0, 1.5), 1.2),     # flat slab
    (777, (9.0, 9.0, 9.0), 1.5),       # odd n (padding path)
]


@pytest.mark.parametrize("n,box,cutoff", CASES)
def test_tile_counts_and_energy_match_bruteforce(n, box, cutoff):
    rng = np.random.default_rng(n)
    pts = rng.uniform(0, 1, (n, 3)) * np.asarray(box)
    grid = build(jnp.asarray(pts), cutoff)

    packed, ok = tile_count_pairs(
        grid.sorted_pos, grid.bins.sorted_keys, grid.info.strides,
        cutoff**2, CB=2, MAXJ=6, interpret=True,
    )
    n_ref, e_ref = _brute(np.asarray(grid.sorted_pos, np.float64), cutoff)
    assert bool(ok)
    assert combine_count(np.asarray(packed)) == n_ref

    e, ok = tile_lj_energy(
        grid.sorted_pos, grid.bins.sorted_keys, grid.info.strides,
        cutoff**2, CB=2, MAXJ=6, interpret=True,
    )
    assert bool(ok)
    np.testing.assert_allclose(float(e), e_ref, rtol=1e-9)


def test_tile_split_precision_large_box():
    # coordinates ~1e4: plain f32 differences stay exact (Sterbenz), and
    # the split planes must reproduce f64 pair distances
    rng = np.random.default_rng(5)
    n, cutoff = 1500, 10.0
    pts = rng.uniform(0, 1, (n, 3)) * np.array([30.0, 30.0, 1.6e4])
    pts[:, 2] += 1.0e4  # large offset: f32 ulp ~1e-3 out here
    grid = build(jnp.asarray(pts), cutoff)
    hi, lo = split_f64(jnp.asarray(np.asarray(grid.sorted_pos), jnp.float64))

    e, ok = tile_lj_energy(
        hi, grid.bins.sorted_keys, grid.info.strides, cutoff**2, lo,
        CB=2, MAXJ=6, interpret=True,
    )
    assert bool(ok)
    _, e_ref = _brute(np.asarray(grid.sorted_pos, np.float64), cutoff)
    np.testing.assert_allclose(float(e), e_ref, rtol=1e-6)


def test_tile_2d():
    rng = np.random.default_rng(9)
    n, cutoff = 900, 1.0
    pts = rng.uniform(0, 1, (n, 2)) * 15.0
    grid = build(jnp.asarray(pts), cutoff)
    packed, ok = tile_count_pairs(
        grid.sorted_pos, grid.bins.sorted_keys, grid.info.strides,
        cutoff**2, CB=2, MAXJ=6, interpret=True,
    )
    assert bool(ok)
    d = np.asarray(grid.sorted_pos)[:, None] - np.asarray(grid.sorted_pos)[None, :]
    m = ((d * d).sum(-1) < cutoff**2) & np.tri(n, k=-1, dtype=bool)
    assert combine_count(np.asarray(packed)) == int(m.sum())


def test_tile_coverage_flag_never_silently_drops():
    rng = np.random.default_rng(3)
    pts = rng.uniform(0, 1, (3000, 3)) * 10.0  # dense cubic
    grid = build(jnp.asarray(pts), 1.0)
    packed, ok = tile_count_pairs(
        grid.sorted_pos, grid.bins.sorted_keys, grid.info.strides,
        1.0, CB=2, MAXJ=1, interpret=True,
    )
    assert not bool(ok)  # MAXJ=1 cannot cover this density


def _brute_lj_forces(pts, cutoff):
    n = len(pts)
    d = pts[:, None, :] - pts[None, :, :]
    dsq = (d * d).sum(-1)
    m = (dsq < cutoff**2) & ~np.eye(n, dtype=bool)
    inv = np.where(m, 1.0 / np.where(m, dsq, 1.0), 0.0)
    t = inv**3
    gf = np.where(m, 24 * t * (2 * t - 1) * inv, 0.0)
    return (d * gf[..., None]).sum(axis=1)


@pytest.mark.parametrize("n,box,cutoff", CASES[:3])
def test_tile_forces_match_bruteforce(n, box, cutoff):
    from zelll_tpu.ops.tile_pairs import tile_pair_forces

    rng = np.random.default_rng(n + 1)
    pts = rng.uniform(0, 1, (n, 3)) * np.asarray(box)
    grid = build(jnp.asarray(pts), cutoff)
    f, ok = tile_pair_forces(
        grid.sorted_pos, grid.bins.sorted_keys, grid.info.strides,
        cutoff**2, CB=2, MAXJ=6, interpret=True,
    )
    assert bool(ok)
    f_ref = _brute_lj_forces(np.asarray(grid.sorted_pos, np.float64), cutoff)
    scale = np.abs(f_ref).max() + 1e-30
    np.testing.assert_allclose(np.asarray(f), f_ref, rtol=1e-9,
                               atol=1e-9 * scale)


def test_tile_forces_split_precision():
    from zelll_tpu.ops.tile_pairs import tile_pair_forces

    rng = np.random.default_rng(6)
    n, cutoff = 1200, 10.0
    pts = rng.uniform(0, 1, (n, 3)) * np.array([30.0, 30.0, 1.3e4])
    pts[:, 2] += 1.0e4
    grid = build(jnp.asarray(pts), cutoff)
    hi, lo = split_f64(jnp.asarray(np.asarray(grid.sorted_pos), jnp.float64))
    f, ok = tile_pair_forces(
        hi, grid.bins.sorted_keys, grid.info.strides, cutoff**2, lo,
        CB=2, MAXJ=6, interpret=True,
    )
    assert bool(ok)
    f_ref = _brute_lj_forces(np.asarray(grid.sorted_pos, np.float64), cutoff)
    scale = np.abs(f_ref).max() + 1e-30
    np.testing.assert_allclose(np.asarray(f), f_ref, rtol=1e-6,
                               atol=1e-6 * scale)


def test_tile_forces_fast_gfn():
    # the `fast` MD mode swaps the exact force factor for the
    # rsqrt-polynomial one; forces must stay within ~1e-6 of exact
    from zelll_tpu.ops.lj import lj_force_factor_fast
    from zelll_tpu.ops.tile_pairs import tile_pair_forces

    n, box, cutoff = CASES[0]
    rng = np.random.default_rng(n + 1)
    pts = rng.uniform(0, 1, (n, 3)) * np.asarray(box)
    grid = build(jnp.asarray(pts, jnp.float32), cutoff)
    f_fast, ok = tile_pair_forces(
        grid.sorted_pos, grid.bins.sorted_keys, grid.info.strides,
        cutoff**2, gfn=lj_force_factor_fast, CB=2, MAXJ=6, interpret=True,
    )
    assert bool(ok)
    f_ref = _brute_lj_forces(np.asarray(grid.sorted_pos, np.float64), cutoff)
    scale = np.abs(f_ref).max() + 1e-30
    np.testing.assert_allclose(np.asarray(f_fast), f_ref, rtol=1e-4,
                               atol=1e-4 * scale)


def test_tile_min_islot_splits_ownership():
    # pairs owned by the larger-slot endpoint: counts with min_islot=k and
    # the complement (ghost region) must add up to the total
    from zelll_tpu.ops.tile_pairs import tile_pair_reduce
    from zelll_tpu.ops.pallas_pairs import count_term

    rng = np.random.default_rng(11)
    pts = rng.uniform(0, 1, (1000, 3)) * 10.0
    grid = build(jnp.asarray(pts), 1.0)
    args = (grid.sorted_pos, grid.bins.sorted_keys, grid.info.strides, 1.0)
    kw = dict(term=count_term, out_dtype=jnp.int32, CB=2, MAXJ=6,
              interpret=True)
    all_p, ok0 = tile_pair_reduce(*args, **kw)
    own_p, ok1 = tile_pair_reduce(*args, min_islot=500, **kw)
    assert bool(ok0) and bool(ok1)
    n_all = combine_count(np.asarray(all_p))
    n_own = combine_count(np.asarray(own_p))
    # complement: pairs whose larger endpoint sits below slot 500
    spos = np.asarray(grid.sorted_pos)
    d = spos[:, None] - spos[None, :]
    m = ((d * d).sum(-1) < 1.0) & np.tri(len(spos), k=-1, dtype=bool)
    n_low = int(m[:500].sum())
    assert n_own == n_all - n_low


def test_rebuild_entry_small_n_large_maxj():
    """MAXJ larger than the chunk count must clamp, not DMA out of bounds
    (review finding: 600 points, MAXJ=12 > nc_pad=8)."""
    from zelll_tpu.ops.tile_pairs import tile_lj_rebuild_energy

    rng = np.random.default_rng(4)
    pts = rng.uniform(0, 1, (600, 3)) * 8.0
    e, ok = tile_lj_rebuild_energy(
        jnp.asarray(pts, jnp.float32), 1.0, MAXJ=12, CB=2, interpret=True
    )
    assert bool(ok)
    _, e_ref = _brute(pts, 1.0)
    np.testing.assert_allclose(float(e), e_ref, rtol=1e-4)


def test_rebuild_entry_2d_split_bins_on_spatial_columns():
    """2D positions with split lo planes: binning must use the two spatial
    columns, not treat lo_x as a z coordinate (review finding)."""
    from zelll_tpu.ops.pallas_pairs import split_f64
    from zelll_tpu.ops.tile_pairs import tile_lj_rebuild_energy

    rng = np.random.default_rng(12)
    n, cutoff = 700, 1.0
    pts = rng.uniform(0, 1, (n, 2)) * 14.0
    hi, lo = split_f64(jnp.asarray(pts))
    e, ok = tile_lj_rebuild_energy(hi, cutoff, lo, MAXJ=6, CB=2,
                                   interpret=True)
    assert bool(ok)
    d = pts[:, None] - pts[None, :]
    dsq = (d * d).sum(-1)
    m = (dsq < cutoff**2) & np.tri(n, k=-1, dtype=bool)
    inv = np.where(m, 1.0 / np.where(m, dsq, 1.0), 0.0)
    t = inv**3
    e_ref = float((4 * t * (t - 1)).sum())
    np.testing.assert_allclose(float(e), e_ref, rtol=1e-6)


def test_md_step_cubic_tile_2d():
    """2D MD state: velocity payload columns must not leak into binning."""
    from zelll_tpu.models.lj_md import MDState, md_step_cubic_tile

    rng = np.random.default_rng(13)
    n = 400
    pts = rng.uniform(0, 1, (n, 2)) * 10.0
    vel = rng.normal(0, 0.1, (n, 2))
    st = MDState(jnp.asarray(pts, jnp.float32), jnp.asarray(vel, jnp.float32))
    s2, ok = md_step_cubic_tile(st, 1.0, 1e-4, CB=2, MAXJ=6, interpret=True)
    assert bool(ok)
    assert s2.positions.shape == (n, 2)


def test_per_band_maxj_matches_scalar():
    """Per-band MAXJ capacities (round 5): same counts/energy/forces as
    the shared scalar capacity, at a fraction of the window bytes."""
    from zelll_tpu.ops.pallas_pairs import _pad_and_desentinel
    from zelll_tpu.ops.segments import CHUNK, segment_bands, suggest_maxj
    from zelll_tpu.ops.tile_pairs import (
        tile_count_pairs, tile_lj_energy, tile_pair_forces,
    )

    rng = np.random.default_rng(21)
    n, cutoff = 8000, 1.0
    pts = rng.uniform(0, 1, (n, 3)) * 8.0  # cubic, ~16/cell
    grid = build(jnp.asarray(pts), cutoff)

    C = max(-(-n // (CHUNK * 2)) * 2, 2) * CHUNK
    keys_p = _pad_and_desentinel(grid.bins.sorted_keys, C)
    mj_half = suggest_maxj(
        keys_p, segment_bands(grid.info.strides), per_band=True
    )
    mj_full = suggest_maxj(
        keys_p, segment_bands(grid.info.strides, full=True), half=False,
        per_band=True,
    )
    assert len(mj_half) == 5 and len(mj_full) == 9
    # the own-row band needs a far smaller window than the z-layer bands
    assert mj_half[0] < max(mj_half)

    n_ref, e_ref = _brute(np.asarray(grid.sorted_pos, np.float64), cutoff)
    args = (grid.sorted_pos, grid.bins.sorted_keys, grid.info.strides,
            cutoff**2)

    packed, ok = tile_count_pairs(*args, CB=2, MAXJ=mj_half, interpret=True)
    assert bool(ok)
    assert combine_count(np.asarray(packed)) == n_ref

    e, ok = tile_lj_energy(*args, CB=2, MAXJ=mj_half, interpret=True)
    assert bool(ok)
    np.testing.assert_allclose(float(e), e_ref, rtol=1e-9)

    f_pb, ok_pb = tile_pair_forces(*args, CB=2, MAXJ=mj_full, interpret=True)
    f_sc, ok_sc = tile_pair_forces(*args, CB=2, MAXJ=max(mj_full),
                                   interpret=True)
    assert bool(ok_pb) and bool(ok_sc)
    np.testing.assert_array_equal(np.asarray(f_pb), np.asarray(f_sc))


def test_per_band_maxj_coverage_flag():
    """A single under-sized band flips the flag even when the other bands
    have plenty of capacity (never silently drop pairs)."""
    rng = np.random.default_rng(22)
    pts = rng.uniform(0, 1, (3000, 3)) * 10.0
    grid = build(jnp.asarray(pts), 1.0)
    packed, ok = tile_count_pairs(
        grid.sorted_pos, grid.bins.sorted_keys, grid.info.strides, 1.0,
        CB=2, MAXJ=(8, 8, 1, 8, 8), interpret=True,
    )
    assert not bool(ok)


def test_per_band_maxj_rejected_on_unpacked_paths():
    from zelll_tpu.ops.tile_pairs import tile_pair_forces, tile_pair_reduce

    rng = np.random.default_rng(23)
    pts = rng.uniform(0, 1, (300, 3)) * 5.0
    grid = build(jnp.asarray(pts), 1.0)
    args = (grid.sorted_pos, grid.bins.sorted_keys, grid.info.strides, 1.0)
    with pytest.raises(ValueError, match="packed"):
        tile_pair_reduce(*args, MAXJ=(4, 4, 4, 4, 4), packed=False,
                         interpret=True)
    with pytest.raises(ValueError, match="packed"):
        tile_pair_forces(*args, MAXJ=(4,) * 9, packed=False, interpret=True)
