"""Virial / stress-tensor / pressure observables (ops.virial) vs f64
brute-force oracles. An extension beyond the reference (which exposes raw
pair iteration, src/cellgrid.rs:338-340, from which users fold such sums);
correctness is defined by the standard pair-virial theorem."""

import jax.numpy as jnp
import numpy as np
import pytest

from zelll_tpu.core.grid import build
from zelll_tpu.ops.virial import (
    fused_virial,
    kinetic_energy,
    kinetic_stress,
    lj_virial_term,
    pair_stress_open,
    pbc_stress,
    pbc_virial,
    pressure,
    pressure_tensor,
)


def oracle_open(pts, cutoff):
    """Open-boundary virial scalar + stress tensor (f64 numpy, O(n^2))."""
    pts = np.asarray(pts, np.float64)
    d = pts[:, None, :] - pts[None, :, :]
    dsq = (d * d).sum(-1)
    np.fill_diagonal(dsq, np.inf)
    within = np.triu(dsq < cutoff * cutoff)
    t = 1.0 / np.where(within, dsq, 1.0)
    t3 = t * t * t
    g = np.where(within, 24.0 * t3 * (2.0 * t3 - 1.0) * t, 0.0)
    sigma = np.einsum("ij,ija,ijb->ab", g, d, d)
    dsq_safe = np.where(within, dsq, 0.0)
    return float((g * dsq_safe).sum()), sigma


def oracle_pbc(pts, box, cutoff):
    """Minimum-image virial scalar + stress tensor (f64 numpy, O(n^2))."""
    pts = np.asarray(pts, np.float64)
    box = np.asarray(box, np.float64)
    d = pts[:, None, :] - pts[None, :, :]
    d -= box * np.round(d / box)
    dsq = (d * d).sum(-1)
    np.fill_diagonal(dsq, np.inf)
    within = np.triu(dsq < cutoff * cutoff)
    t = 1.0 / np.where(within, dsq, 1.0)
    t3 = t * t * t
    g = np.where(within, 24.0 * t3 * (2.0 * t3 - 1.0) * t, 0.0)
    sigma = np.einsum("ij,ija,ijb->ab", g, d, d)
    dsq_safe = np.where(within, dsq, 0.0)
    return float((g * dsq_safe).sum()), sigma


def make_open(n=400, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(0, 1, size=(n, 3)) * np.array([6.0, 7.0, 8.0])
    return jnp.asarray(pts), 1.0


def make_pbc(n=256, box=(4.3, 5.1, 6.7), cutoff=1.0, seed=0):
    rng = np.random.default_rng(seed)
    box = np.asarray(box, np.float64)
    pts = rng.uniform(0, 1, size=(n, 3)) * box
    return jnp.asarray(pts), jnp.zeros((3,)), jnp.asarray(box), cutoff


def test_fused_virial_vs_oracle():
    pts, cutoff = make_open()
    w_ref, _ = oracle_open(pts, cutoff)
    grid = build(pts, cutoff)
    w, ok = fused_virial(grid, M=512, L=256, interpret=True)
    assert bool(ok)
    assert abs(float(w) - w_ref) <= 1e-9 * max(1.0, abs(w_ref))


@pytest.mark.parametrize("path,kw", [
    ("lag", dict(M=512, L=512)),
    ("tile", dict(MAXJ=32)),
    ("xla", dict(K=32)),
])
def test_pbc_virial_all_paths(path, kw):
    pts, origin, box, cutoff = make_pbc(seed=1)
    w_ref, _ = oracle_pbc(pts, box, cutoff)
    w, ok = pbc_virial(
        pts, origin, box, cutoff, path=path, interpret=True, **kw
    )
    assert bool(ok)
    assert abs(float(w) - w_ref) <= 1e-9 * max(1.0, abs(w_ref))


def test_open_stress_vs_oracle_and_trace():
    pts, cutoff = make_open(seed=2)
    w_ref, sigma_ref = oracle_open(pts, cutoff)
    sigma, ok = pair_stress_open(pts, cutoff)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(sigma), sigma_ref, rtol=1e-9,
                               atol=1e-9)
    assert abs(float(jnp.trace(sigma)) - w_ref) <= 1e-9 * max(1.0, abs(w_ref))


def test_pbc_stress_vs_oracle_and_trace():
    pts, origin, box, cutoff = make_pbc(seed=3)
    w_ref, sigma_ref = oracle_pbc(pts, box, cutoff)
    sigma, ok = pbc_stress(pts, origin, box, cutoff)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(sigma), sigma_ref, rtol=1e-9,
                               atol=1e-9)
    assert abs(float(jnp.trace(sigma)) - w_ref) <= 1e-9 * max(1.0, abs(w_ref))


def test_pbc_stress_dense_corners():
    # dense cubic box: many corner ghosts exercise the half-weight rule
    pts, origin, box, cutoff = make_pbc(n=200, box=(3.0, 3.0, 3.0),
                                        cutoff=1.2, seed=4)
    _, sigma_ref = oracle_pbc(pts, box, cutoff)
    sigma, ok = pbc_stress(pts, origin, box, cutoff)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(sigma), sigma_ref, rtol=1e-9,
                               atol=1e-9)


def test_kinetic_and_pressure_ideal_gas():
    # interaction-free limit: P V = (2/3) KE exactly
    rng = np.random.default_rng(5)
    v = jnp.asarray(rng.normal(size=(1000, 3)))
    ke = kinetic_energy(v)
    np.testing.assert_allclose(
        float(ke), 0.5 * float((np.asarray(v) ** 2).sum()), rtol=1e-12
    )
    sk = kinetic_stress(v)
    np.testing.assert_allclose(
        float(jnp.trace(sk)), 2.0 * float(ke), rtol=1e-12
    )
    vol = 123.0
    p = pressure(0.0, ke, vol)
    np.testing.assert_allclose(
        float(p), 2.0 * float(ke) / (3.0 * vol), rtol=1e-12
    )
    pt = pressure_tensor(jnp.zeros((3, 3)), sk, vol)
    np.testing.assert_allclose(
        float(jnp.trace(pt)) / 3.0, float(p), rtol=1e-12
    )


def test_virial_term_matches_force_factor():
    from zelll_tpu.ops.lj import lj_force_factor
    from zelll_tpu.ops.virial import virial_term_from_gfn

    dsq = jnp.asarray(np.random.default_rng(6).uniform(0.5, 2.0, 64))
    np.testing.assert_allclose(
        np.asarray(lj_virial_term(dsq)),
        np.asarray(lj_force_factor(dsq) * dsq),
        rtol=1e-12,
    )
    # the generic wrapper is cached per gfn identity (no retrace per call)
    assert virial_term_from_gfn(lj_force_factor) is virial_term_from_gfn(
        lj_force_factor
    )


def test_sharded_virial_open_matches_oracle():
    """Multi-chip scalar virial: `sharded_lj_energy(term=lj_virial_term)`
    on the 8-device mesh vs the f64 O(n^2) oracle (the virial is a plain
    pair term, so the slab machinery needs no changes)."""
    import jax

    from zelll_tpu.parallel import (
        make_mesh,
        partition_by_slab,
        sharded_lj_energy,
    )

    rng = np.random.default_rng(7)
    n, cutoff = 512, 1.0
    pts = rng.uniform(0, 1, size=(n, 3)) * np.array([3.0, 3.0, 24.0])
    w_ref, _ = oracle_open(pts, cutoff)

    mesh = make_mesh(8)
    parts, n_local = partition_by_slab(pts, cutoff, 8)
    pos = jax.device_put(
        jnp.asarray(parts),
        jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("z", None)
        ),
    )
    efn = sharded_lj_energy(
        mesh, cutoff=cutoff, H=n_local, M=512, L=512,
        term=lj_virial_term, interpret=True,
    )
    w, ok = efn(pos)
    assert bool(ok)
    assert abs(float(w) - w_ref) <= 1e-9 * max(1.0, abs(w_ref))


def test_sharded_virial_pbc_matches_oracle():
    """Multi-chip PBC scalar virial over the slab ring."""
    import jax

    from zelll_tpu.parallel import make_mesh
    from zelll_tpu.parallel.pbc import (
        partition_by_slab_pbc,
        sharded_pbc_lj_energy,
    )

    rng = np.random.default_rng(8)
    n, cutoff = 512, 1.0
    box = np.array([4.1, 4.7, 30.0])
    pts = rng.uniform(0, 1, size=(n, 3)) * box
    w_ref, _ = oracle_pbc(pts, box, cutoff)

    mesh = make_mesh(8)
    parts, n_local = partition_by_slab_pbc(pts, np.zeros(3), box, cutoff, 8)
    pos = jax.device_put(
        jnp.asarray(parts),
        jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("z", None)
        ),
    )
    efn = sharded_pbc_lj_energy(
        mesh, origin=np.zeros(3), box=box, cutoff=cutoff, H=n_local,
        M=512, L=512, term=lj_virial_term, interpret=True,
    )
    w, ok = efn(pos)
    assert bool(ok)
    assert abs(float(w) - w_ref) <= 1e-9 * max(1.0, abs(w_ref))


@pytest.mark.parametrize("path,kw", [
    ("lag", dict(M=512, L=512)),
    ("tile", dict(MAXJ=32)),
])
def test_fused_stress_open_vs_oracle(path, kw):
    """Direct pair-sum stress kernel == sum g dx (x) dx (f64 oracle)."""
    from zelll_tpu.ops.virial import fused_stress_open

    pts, cutoff = make_open(seed=9)
    w_ref, sigma_ref = oracle_open(pts, cutoff)
    sigma, ok = fused_stress_open(
        pts, cutoff, path=path, interpret=True, **kw
    )
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(sigma), sigma_ref, rtol=1e-9,
                               atol=1e-9)
    assert abs(float(jnp.trace(sigma)) - w_ref) <= 1e-9 * max(1.0, abs(w_ref))


@pytest.mark.parametrize("path,kw,case", [
    ("lag", dict(M=512, L=512), dict(seed=10)),
    ("tile", dict(MAXJ=32), dict(seed=11)),
    ("lag", dict(M=512, L=512),
     dict(n=200, box=(3.0, 3.0, 3.0), cutoff=1.2, seed=12)),  # corner ghosts
])
def test_pbc_stress_fused_vs_oracle(path, kw, case):
    """One-pass shift-sign-masked stress kernel == minimum-image
    sum g dx (x) dx, on both fused kernels (each cross pair counted once
    via its lex-positive image; dx (x) dx is mirror-invariant)."""
    from zelll_tpu.ops.virial import pbc_stress_fused

    pts, origin, box, cutoff = make_pbc(**case)
    w_ref, sigma_ref = oracle_pbc(pts, box, cutoff)
    sigma, ok = pbc_stress_fused(
        pts, origin, box, cutoff, path=path, interpret=True, **kw
    )
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(sigma), sigma_ref, rtol=1e-9,
                               atol=1e-9)
    assert abs(float(jnp.trace(sigma)) - w_ref) <= 1e-9 * max(1.0, abs(w_ref))


@pytest.mark.parametrize("path,kw", [
    ("lag", dict(M=512, L=512)),
    ("tile", dict(MAXJ=32)),
])
def test_fused_stress_split_precision(path, kw):
    """Split (hi, lo f32) stress reaches f64-grade parity where plain f32
    loses to coordinate rounding: a large coordinate offset makes f32
    coords ~1e-3-lossy, yet the split pass must stay <= 2e-6 relative
    (the direct pair-sum terms are bounded by |g|*cutoff^2 — no
    box-scale contraction cancellation)."""
    from zelll_tpu.ops.virial import fused_stress_open, pbc_stress_fused

    rng = np.random.default_rng(21)
    n, cutoff = 400, 1.0
    box = np.array([7.0, 6.0, 8.0])
    pts64 = rng.uniform(0, 1, size=(n, 3)) * box + 4096.0
    hi = pts64.astype(np.float32)
    lo = (pts64 - hi.astype(np.float64)).astype(np.float32)
    _, sigma_ref = oracle_open(pts64, cutoff)
    sscale = np.abs(sigma_ref).max()
    sigma, ok = fused_stress_open(
        jnp.asarray(hi), cutoff, path=path, interpret=True,
        positions_lo=jnp.asarray(lo), **kw
    )
    assert bool(ok)
    assert np.abs(np.asarray(sigma, np.float64) - sigma_ref).max() <= (
        2e-6 * sscale
    )
    # sanity that the fixture is actually f32-lossy: the plain-f32 pass
    # must be visibly worse than the split bound
    sigma32, ok = fused_stress_open(
        jnp.asarray(hi), cutoff, path=path, interpret=True, **kw
    )
    assert bool(ok)
    assert np.abs(np.asarray(sigma32, np.float64) - sigma_ref).max() > (
        5e-6 * sscale
    )
    # PBC: split planes propagate through the ghost images (two-sum
    # residual of hi + shift*box)
    pts_p = rng.uniform(0, 1, size=(n, 3)) * box
    hi_p = pts_p.astype(np.float32)
    lo_p = (pts_p - hi_p.astype(np.float64)).astype(np.float32)
    _, sigma_ref_p = oracle_pbc(pts_p, box, cutoff)
    sscale_p = np.abs(sigma_ref_p).max()
    sigma, ok = pbc_stress_fused(
        jnp.asarray(hi_p), jnp.zeros(3, jnp.float32),
        jnp.asarray(box, jnp.float32), cutoff, path=path, interpret=True,
        positions_lo=jnp.asarray(lo_p), **kw
    )
    assert bool(ok)
    assert np.abs(np.asarray(sigma, np.float64) - sigma_ref_p).max() <= (
        2e-6 * sscale_p
    )


def test_fused_stress_split_2d_raises():
    """dim != 3 cannot honor positions_lo — must raise, never silently
    degrade (the library-wide convention)."""
    from zelll_tpu.ops.virial import fused_stress_open, pbc_stress_fused

    rng = np.random.default_rng(22)
    pts2 = jnp.asarray(rng.uniform(0, 1, size=(64, 2)), jnp.float32)
    lo2 = jnp.zeros_like(pts2)
    with pytest.raises(ValueError, match="split"):
        fused_stress_open(pts2, 0.3, positions_lo=lo2)
    with pytest.raises(ValueError, match="split"):
        pbc_stress_fused(
            pts2, jnp.zeros(2), jnp.ones(2), 0.3, positions_lo=lo2
        )


def test_fused_stress_2d_falls_back_to_xla():
    """dim != 3 dispatches to the N-dim XLA bucketed path."""
    from zelll_tpu.ops.virial import fused_stress_open, pbc_stress_fused

    rng = np.random.default_rng(13)
    pts2 = jnp.asarray(rng.uniform(0, 1, size=(128, 2)) * 5.0)
    cutoff = 1.0
    # open: oracle in 2D
    p = np.asarray(pts2, np.float64)
    d = p[:, None, :] - p[None, :, :]
    dsq = (d * d).sum(-1)
    np.fill_diagonal(dsq, np.inf)
    within = np.triu(dsq < cutoff * cutoff)
    t = 1.0 / np.where(within, dsq, 1.0)
    t3 = t * t * t
    g = np.where(within, 24.0 * t3 * (2.0 * t3 - 1.0) * t, 0.0)
    sigma_ref = np.einsum("ij,ija,ijb->ab", g, d, d)
    sigma, ok = fused_stress_open(pts2, cutoff)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(sigma), sigma_ref, rtol=1e-9,
                               atol=1e-9)
    # PBC 2D
    box = np.array([5.0, 5.0])
    dp = p[:, None, :] - p[None, :, :]
    dp -= box * np.round(dp / box)
    dsq = (dp * dp).sum(-1)
    np.fill_diagonal(dsq, np.inf)
    within = np.triu(dsq < cutoff * cutoff)
    t = 1.0 / np.where(within, dsq, 1.0)
    t3 = t * t * t
    g = np.where(within, 24.0 * t3 * (2.0 * t3 - 1.0) * t, 0.0)
    sigma_ref = np.einsum("ij,ija,ijb->ab", g, dp, dp)
    sigma, ok = pbc_stress_fused(pts2, jnp.zeros(2), jnp.asarray(box), cutoff)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(sigma), sigma_ref, rtol=1e-9,
                               atol=1e-9)


def test_api_virial_stress_methods():
    from zelll_tpu.api import CellGrid

    pts, cutoff = make_open(n=200, seed=14)
    w_ref, sigma_ref = oracle_open(pts, cutoff)
    cg = CellGrid(np.asarray(pts), cutoff=cutoff)
    assert abs(cg.virial() - w_ref) <= 1e-9 * max(1.0, abs(w_ref))
    np.testing.assert_allclose(cg.stress(), sigma_ref, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(np.trace(cg.stress()), cg.virial(), rtol=1e-9)
    # degenerate: empty grid
    assert CellGrid([], cutoff=1.0).virial() == 0.0


# -- in-kernel minimum image (narrow axes; round 9) --------------------------


@pytest.mark.parametrize("case,mi", [
    # protocol-shaped slab: x/y folded in-kernel, z keeps its ghost shell
    (dict(n=256, box=(2.5, 2.5, 40.0), cutoff=1.0, seed=40), "auto"),
    # every axis narrow -> full fold, no ghost extension at all
    (dict(n=200, box=(3.1, 3.3, 3.7), cutoff=1.2, seed=41), "auto"),
    # explicit single-axis fold (y and z keep ghost images)
    (dict(n=256, box=(2.5, 2.5, 40.0), cutoff=1.0, seed=42),
     (True, False, False)),
])
def test_pbc_stress_minimage_vs_oracle(case, mi):
    """Min-image stress == ghost-extension == oracle: dx (x) dx on the
    FOLDED separation is the image outer product, so the shift-sign keep
    mask is only needed on the still-ghosted axes."""
    from zelll_tpu.ops.pbc import minimage_axes
    from zelll_tpu.ops.virial import pbc_stress_fused

    pts, origin, box, cutoff = make_pbc(**case)
    if mi == "auto":
        assert minimage_axes(np.asarray(box), cutoff).any()
    w_ref, sigma_ref = oracle_pbc(pts, box, cutoff)
    sigma, ok = pbc_stress_fused(
        pts, origin, box, cutoff, M=512, L=512, interpret=True, minimage=mi
    )
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(sigma), sigma_ref, rtol=1e-9,
                               atol=1e-9)
    assert abs(float(jnp.trace(sigma)) - w_ref) <= 1e-9 * max(1.0, abs(w_ref))
    # and bit-match the ghost-extension path's convention (same pairs,
    # same fold tolerances at f64 interpret)
    sigma_g, ok_g = pbc_stress_fused(
        pts, origin, box, cutoff, M=512, L=512, interpret=True
    )
    assert bool(ok_g)
    np.testing.assert_allclose(np.asarray(sigma), np.asarray(sigma_g),
                               rtol=1e-9, atol=1e-12)


def test_pbc_stress_minimage_split_exact():
    """Split (hi, lo) planes stay f64-grade THROUGH the wrap: the
    two-diff residual of the folded hi difference carries into the lo
    term (`_mi_pair_d`), so a 4096-offset box keeps <= 2e-6 relative."""
    from zelll_tpu.ops.virial import pbc_stress_fused

    rng = np.random.default_rng(43)
    n, cutoff = 256, 1.0
    box = np.array([2.5, 2.5, 40.0])
    pts64 = rng.uniform(0, 1, size=(n, 3)) * box + 4096.0
    origin = np.full(3, 4096.0)
    hi = pts64.astype(np.float32)
    lo = (pts64 - hi.astype(np.float64)).astype(np.float32)
    _, sigma_ref = oracle_pbc(pts64 - origin, box, cutoff)
    sscale = np.abs(sigma_ref).max()
    sigma, ok = pbc_stress_fused(
        jnp.asarray(hi), jnp.asarray(origin), jnp.asarray(box), cutoff,
        M=512, L=512, interpret=True, minimage="auto",
        positions_lo=jnp.asarray(lo),
    )
    assert bool(ok)
    assert np.abs(np.asarray(sigma, np.float64) - sigma_ref).max() <= (
        2e-6 * sscale
    )


def test_pbc_stress_minimage_tile_raises():
    from zelll_tpu.ops.virial import pbc_stress_fused

    pts, origin, box, cutoff = make_pbc(n=64, box=(2.5, 2.5, 40.0),
                                        cutoff=1.0, seed=44)
    with pytest.raises(ValueError, match="lag-path"):
        pbc_stress_fused(pts, origin, box, cutoff, path="tile",
                         minimage=(True, True, False))
