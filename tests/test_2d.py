"""2D support: the reference is N-dimensional (CellGrid<_, 2, f32> in its
doc-tests); core pipeline and the lag kernel must work for N = 2."""

import jax.numpy as jnp
import numpy as np
import pytest

from zelll_tpu.core import build, count_pairs, materialize_pairs, pair_sum
from zelll_tpu.ops.pallas_pairs import (
    count_term,
    lag_coverage_ok,
    pair_lag_reduce,
    suggest_lag,
)


def brute_pairs_2d(pts, cutoff):
    d = pts[:, None, :] - pts[None, :, :]
    dsq = (d * d).sum(-1)
    n = len(pts)
    return {
        (i, j)
        for i in range(n)
        for j in range(i + 1, n)
        if dsq[i, j] < cutoff**2
    }


def test_2d_pairs_xla_path():
    rng = np.random.default_rng(0)
    pts = rng.uniform(0, 8, size=(200, 2))
    cutoff = 1.0
    grid = build(jnp.asarray(pts), cutoff)
    K = int(grid.bins.max_cell_count())
    i, j, total, overflow = materialize_pairs(
        grid, K=K, max_pairs=4000, cutoff_sq=cutoff**2, chunk=16
    )
    assert not bool(overflow)
    total = int(total)
    got = {tuple(sorted(p)) for p in zip(np.asarray(i)[:total], np.asarray(j)[:total])}
    got = {(int(a), int(b)) for a, b in got}
    assert got == brute_pairs_2d(pts, cutoff)


def test_2d_lag_kernel():
    rng = np.random.default_rng(1)
    pts = rng.uniform(0, 1, size=(500, 2)) * np.array([5.0, 40.0])
    cutoff = 1.0
    grid = build(jnp.asarray(pts), cutoff)
    L = suggest_lag(
        np.asarray(grid.bins.sorted_keys), np.asarray(grid.info.strides)
    )
    M = max(256, L)
    assert bool(lag_coverage_ok(grid.bins.sorted_keys, grid.info.strides, L))
    cnt = pair_lag_reduce(
        grid.sorted_pos, grid.bins.sorted_keys, grid.info.strides,
        cutoff**2, M=M, L=L, term=count_term, interpret=True,
    )
    assert int(cnt) == len(brute_pairs_2d(pts, cutoff))


def test_2d_public_fused_api():
    """The public fused entry points work for N = 2 (VERDICT round-1 item
    8): the rebuild-energy path runs the lag kernel directly (dim-generic),
    auto_lj_energy dispatches wide 2D boxes to the tile kernel."""
    from zelll_tpu.ops.fused import auto_lj_energy, fused_lj_rebuild_energy

    rng = np.random.default_rng(2)
    cutoff = 1.0

    def ref(pts):
        d = pts[:, None, :] - pts[None, :, :]
        dsq = (d * d).sum(-1)
        iu = np.triu_indices(len(pts), 1)
        v = dsq[iu]
        v = v[v < cutoff**2]
        t3 = (1.0 / v) ** 3
        return (4.0 * t3 * (t3 - 1.0)).sum()

    thin = rng.uniform(0, 1, size=(400, 2)) * np.array([3.0, 50.0])
    e, ok = fused_lj_rebuild_energy(
        jnp.asarray(thin), cutoff, M=256, L=256, interpret=True
    )
    assert bool(ok)
    np.testing.assert_allclose(float(e), ref(thin), rtol=1e-10)

    e2, path = auto_lj_energy(thin, cutoff, interpret=True)
    assert path.startswith("fused")
    np.testing.assert_allclose(e2, ref(thin), rtol=1e-10)

    # wide 2D box: lag blows past the cap -> segment-tile kernel
    wide = rng.uniform(0, 1, size=(3000, 2)) * 30.0
    e3, path = auto_lj_energy(wide, cutoff, max_thin_lag=128, interpret=True)
    assert path.startswith("tile")
    np.testing.assert_allclose(e3, ref(wide), rtol=1e-10)


def test_2d_md_step_and_coordination():
    # api.CellGrid stays 3D-only on purpose (parity with the PyO3 binding's
    # CellGrid<(usize, [f64; 3])> monomorphization, python/src/lib.rs:98);
    # N-dim support lives in the library layers exercised here.
    from zelll_tpu.core.pairs import pair_energy_per_particle
    from zelll_tpu.models.lj_md import MDState, md_step

    rng = np.random.default_rng(3)
    cutoff = 1.0
    pts = rng.uniform(0, 1, size=(300, 2)) * np.array([4.0, 30.0])

    # coordination numbers in 2D (XLA per-particle path)
    grid = build(jnp.asarray(pts), cutoff)
    K = int(grid.bins.max_cell_count())
    counts = pair_energy_per_particle(
        grid, lambda d: jnp.full_like(d, 2.0), K=K, chunk=16,
        cutoff_sq=cutoff**2,
    )
    got = np.rint(np.asarray(counts)).astype(np.int64)
    d = np.linalg.norm(pts[:, None] - pts[None], axis=-1)
    expect = ((d < cutoff) & ~np.eye(len(pts), dtype=bool)).sum(1)
    np.testing.assert_array_equal(got, expect)

    # one MD step in 2D matches a brute-force force evaluation
    dt = 1e-9
    st, ok = md_step(
        MDState(positions=jnp.asarray(pts), velocities=jnp.zeros_like(jnp.asarray(pts))),
        cutoff, dt, K=64,
    )
    assert bool(ok)
    dsq = (np.linalg.norm(pts[:, None] - pts[None], axis=-1)) ** 2
    mask = (dsq < cutoff**2) & ~np.eye(len(pts), dtype=bool)
    inv = np.where(mask, 1.0 / np.where(mask, dsq, 1.0), 0.0)
    t = inv**3
    gf = np.where(mask, 24 * t * (2 * t - 1) * inv, 0.0)
    dvec = pts[:, None] - pts[None]
    f_ref = (dvec * gf[..., None]).sum(axis=1)
    v_ref = dt * f_ref
    got_v = np.asarray(st.velocities)
    np.testing.assert_allclose(
        np.sort(got_v, axis=0), np.sort(v_ref, axis=0), rtol=1e-7,
        atol=1e-9 * np.abs(v_ref).max(),
    )
