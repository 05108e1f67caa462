"""Column decomposition: cutoff pair reductions for cubic/wide boxes."""

import jax.numpy as jnp
import numpy as np
import pytest

from zelll_tpu.ops.columns import column_lj_energy, column_pair_sum
from zelll_tpu.ops.pallas_pairs import combine_count, count_term


def brute(pts, cutoff):
    d = pts[:, None] - pts[None]
    dsq = (d * d).sum(-1)
    iu = np.triu_indices(len(pts), 1)
    v = dsq[iu]
    return v[v < cutoff**2]


@pytest.mark.parametrize("n,box,cutoff,T", [
    (800, (20.0, 20.0, 20.0), 1.0, 4),    # cubic — the target geometry
    (600, (30.0, 30.0, 4.0), 1.0, 4),     # flat box
    (500, (12.0, 12.0, 12.0), 2.0, 3),    # coarser cells, T=3
    (400, (3.0, 40.0, 40.0), 1.0, 4),     # wide in y,z
    (300, (6.0, 6.0, 6.0), 1.0, 8),       # T larger than the grid
])
def test_column_counts_and_energy_vs_bruteforce(n, box, cutoff, T):
    rng = np.random.default_rng(n)
    pts = rng.uniform(0, 1, size=(n, 3)) * np.asarray(box)
    v = brute(pts, cutoff)

    cnt, ok = column_pair_sum(
        jnp.asarray(pts), cutoff, T=T, M=1024, L=1024,
        term=count_term, interpret=True, out_dtype=jnp.int32,
    )
    assert bool(ok)
    assert combine_count(cnt) == len(v)

    e, ok = column_lj_energy(
        jnp.asarray(pts), cutoff, T=T, M=1024, L=1024, interpret=True
    )
    assert bool(ok)
    t3 = (1.0 / v) ** 3
    np.testing.assert_allclose(float(e), (4 * t3 * (t3 - 1)).sum(), rtol=1e-10)


def test_column_matches_thin_box_path():
    from zelll_tpu.ops.fused import fused_lj_rebuild_energy

    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 1, size=(700, 3)) * np.array([4.0, 4.0, 40.0])
    e1, ok1 = column_lj_energy(jnp.asarray(pts), 1.0, T=4, L=1024, interpret=True)
    e2, ok2 = fused_lj_rebuild_energy(jnp.asarray(pts), 1.0, M=1024, L=256,
                                      interpret=True)
    assert bool(ok1) and bool(ok2)
    np.testing.assert_allclose(float(e1), float(e2), rtol=1e-12)


def test_column_split_precision():
    """Split coordinates compose with the column path (f32 hi/lo planes,
    f64 oracle check on CPU)."""
    rng = np.random.default_rng(4)
    pts = rng.uniform(0, 1, size=(500, 3)) * 20.0
    v = brute(pts, 1.0)
    hi = pts.astype(np.float32)
    lo = (pts - hi.astype(np.float64)).astype(np.float32)
    e, ok = column_lj_energy(
        jnp.asarray(hi), 1.0, jnp.asarray(lo), T=4, L=1024, interpret=True
    )
    assert bool(ok)
    t3 = (1.0 / v) ** 3
    np.testing.assert_allclose(
        float(e), (4 * t3 * (t3 - 1)).sum(), rtol=2e-5
    )


def test_column_forces_cubic_vs_bruteforce():
    from zelll_tpu.ops.columns import column_lj_forces

    rng = np.random.default_rng(5)
    n, cutoff = 500, 1.0
    pts = rng.uniform(0, 1, size=(n, 3)) * 12.0 + 0.01  # cubic
    f, ok = column_lj_forces(
        jnp.asarray(pts), cutoff, T=4, M=1024, L=1024, interpret=True
    )
    assert bool(ok)
    d = pts[:, None] - pts[None]
    dsq = (d * d).sum(-1)
    mask = (dsq < cutoff**2) & ~np.eye(n, dtype=bool)
    inv = np.where(mask, 1.0 / np.where(mask, dsq, 1.0), 0.0)
    t = inv**3
    gf = np.where(mask, 24 * t * (2 * t - 1) * inv, 0.0)
    f_ref = (d * gf[..., None]).sum(axis=1)
    scale = np.abs(f_ref).max() + 1e-30
    np.testing.assert_allclose(np.asarray(f), f_ref, rtol=1e-9, atol=1e-9 * scale)


def test_column_negative_origin():
    rng = np.random.default_rng(6)
    pts = rng.uniform(-1, 1, size=(400, 3)) * 8.0  # spans negative coords
    v = brute(pts, 1.0)
    cnt, ok = column_pair_sum(
        jnp.asarray(pts), 1.0, T=4, M=1024, L=1024,
        term=count_term, interpret=True, out_dtype=jnp.int32,
    )
    assert bool(ok)
    assert combine_count(cnt) == len(v)


def test_auto_dispatch():
    from zelll_tpu.ops.fused import auto_lj_energy

    rng = np.random.default_rng(8)

    def ref(pts, cutoff):
        v = brute(pts, cutoff)
        t3 = (1.0 / v) ** 3
        return (4 * t3 * (t3 - 1)).sum()

    thin = rng.uniform(0, 1, size=(500, 3)) * np.array([3.0, 3.0, 60.0])
    e, path = auto_lj_energy(thin, 1.0, interpret=True)
    assert path.startswith("fused")
    np.testing.assert_allclose(e, ref(thin, 1.0), rtol=1e-10)

    # dense cube: each z-layer holds ~500 particles, far beyond the lag cap
    cube = rng.uniform(0, 1, size=(4000, 3)) * 8.0
    e, path = auto_lj_energy(
        cube, 1.0, max_thin_lag=256, interpret=True
    )
    assert path.startswith("tile")
    np.testing.assert_allclose(e, ref(cube, 1.0), rtol=1e-10)


def test_headroom_flag_on_huge_grid():
    """Composite keys past the sentinel band must flip the flag, never
    silently interleave sentinel copies with real keys (ADVICE round 1)."""
    from zelll_tpu.ops.columns import column_expand

    # two distant points spanning ~600^3 cells at cutoff 1: key bound
    # ~(602/4)^2 * 100 * 606 > 2^29
    pts = jnp.asarray([[0.0, 0.0, 0.0], [600.0, 600.0, 600.0]])
    *_, headroom_ok, _colspan = column_expand(pts, 1.0, T=4)
    assert not bool(headroom_ok)

    # a normal box keeps headroom
    pts2 = jnp.asarray(
        np.random.default_rng(0).uniform(0, 20.0, size=(100, 3))
    )
    *_, ok2, _cs = column_expand(pts2, 1.0, T=4)
    assert bool(ok2)
