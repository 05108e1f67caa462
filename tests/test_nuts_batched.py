"""Device-side batched NUTS (`models.nuts.nuts_sample_batched`).

The sampler is the TPU-native analogue of the reference's nuts-rs chain
loop (surface-sampling/examples/cli.rs:87-122): iterative tree doubling
under one jit. Statistical correctness is pinned on Gaussians with known
moments (an error in the U-turn/multinomial logic shows up as biased
variances), plus integration with the SDF surface workload.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zelll_tpu.models.nuts import hmc_sample_batched, nuts_sample_batched


def test_nuts_recovers_anisotropic_gaussian():
    stds = jnp.array([0.2, 0.5, 1.0, 2.0, 3.0])

    def logp(x):
        return -0.5 * jnp.sum((x / stds) ** 2)

    C = 64
    q0 = jax.random.normal(jax.random.PRNGKey(1), (C, 5)) * 0.1
    samples, acc = nuts_sample_batched(
        logp, q0, jax.random.PRNGKey(0), num_warmup=300, num_samples=400
    )
    assert samples.shape == (400, C, 5)
    s = np.asarray(samples).reshape(-1, 5)
    # 25600 draws: relative std error well under 5%
    np.testing.assert_allclose(s.std(0), np.asarray(stds), rtol=0.05)
    assert np.abs(s.mean(0) / np.asarray(stds)).max() < 0.05
    assert 0.5 < float(np.asarray(acc).mean()) <= 1.0


def test_nuts_recovers_correlated_gaussian():
    cov = jnp.array([[1.0, 0.9], [0.9, 1.0]])
    prec = jnp.linalg.inv(cov)

    def logp(x):
        return -0.5 * x @ prec @ x

    C = 64
    q0 = jax.random.normal(jax.random.PRNGKey(3), (C, 2)) * 0.1
    samples, _ = nuts_sample_batched(
        logp, q0, jax.random.PRNGKey(2), num_warmup=300, num_samples=500
    )
    s = np.asarray(samples).reshape(-1, 2)
    emp = np.cov(s.T)
    np.testing.assert_allclose(emp, np.asarray(cov), atol=0.08)


def test_nuts_matches_hmc_posterior():
    """Both batched samplers target the same donut density; their radial
    posterior moments must agree (cross-validation, no analytic form)."""

    def logp(x):
        r = jnp.sqrt(jnp.sum(x**2))
        return -0.5 * ((r - 3.0) / 0.25) ** 2

    C = 64
    q0 = 3.0 + jax.random.normal(jax.random.PRNGKey(5), (C, 3)) * 0.05
    kw = dict(num_warmup=300, num_samples=300)
    sn, _ = nuts_sample_batched(logp, q0, jax.random.PRNGKey(4), **kw)
    sh, _ = hmc_sample_batched(logp, q0, jax.random.PRNGKey(4), **kw)
    rn = np.linalg.norm(np.asarray(sn).reshape(-1, 3), axis=1)
    rh = np.linalg.norm(np.asarray(sh).reshape(-1, 3), axis=1)
    assert abs(rn.mean() - rh.mean()) < 0.05
    assert abs(rn.std() - rh.std()) < 0.05
    # radial law: mean r ~ 3, std ~ 0.25 (slightly inflated by curvature)
    assert abs(rn.mean() - 3.0) < 0.1


def test_nuts_out_of_support_chain_stays_put():
    """A chain starting at logp = -inf (outside the grid in the SDF
    workload, surface.rs:10-14) must not move or produce NaNs."""

    def logp(x):
        return jnp.where(x[0] > 0, -0.5 * jnp.sum(x**2), -jnp.inf)

    q0 = jnp.array([[1.0, 0.0], [-5.0, 2.0]])
    samples, acc = nuts_sample_batched(
        logp, q0, jax.random.PRNGKey(0), num_warmup=50, num_samples=50
    )
    s = np.asarray(samples)
    assert np.isfinite(s).all()
    # dead chain frozen at its start
    np.testing.assert_array_equal(s[:, 1, :], np.broadcast_to([-5.0, 2.0], (50, 2)))
    # live chain moves and stays in the half-space
    assert (s[:, 0, 0] > 0).all()
    assert np.std(s[:, 0, 0]) > 0.1


def test_nuts_deterministic_same_key():
    def logp(x):
        return -0.5 * jnp.sum(x**2)

    q0 = jnp.zeros((4, 3))
    a, _ = nuts_sample_batched(
        logp, q0, jax.random.PRNGKey(7), num_warmup=20, num_samples=20
    )
    b, _ = nuts_sample_batched(
        logp, q0, jax.random.PRNGKey(7), num_warmup=20, num_samples=20
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_nuts_max_treedepth_flat_density():
    """On a flat density nothing ever U-turns: every draw must stop at
    max_treedepth (2^d - 1 leapfrogs) without hanging or overflowing."""

    def logp(x):
        return jnp.zeros(())

    q0 = jnp.zeros((4, 2))
    samples, acc = nuts_sample_batched(
        logp, q0, jax.random.PRNGKey(0), num_warmup=10, num_samples=10,
        max_treedepth=4,
    )
    s = np.asarray(samples)
    assert np.isfinite(s).all()
    # free particle: positions wander
    assert np.abs(s).max() > 0.1


def test_nuts_on_sdf_surface():
    """End-to-end: NUTS draws concentrate near the iso-surface of a small
    structure, matching the batched-HMC draws (the psssh sample path with
    sampler='nuts-batched')."""
    from zelll_tpu.models.psssh import sample_surface
    from zelll_tpu.models.sdf import SmoothDistanceField

    rng = np.random.default_rng(0)
    pos = rng.uniform(0, 4, (60, 3))
    sdf = SmoothDistanceField(pos, np.full(60, 1.7), cutoff=4.0)
    pts_n = sample_surface(
        sdf, chains=32, burnin=150, draws=10, sampler="nuts-batched"
    )
    pts_h = sample_surface(sdf, chains=32, burnin=150, draws=10)
    vn, _, okn = sdf.evaluate(pts_n)
    vh, _, okh = sdf.evaluate(pts_h)
    dn = np.abs(vn[okn] - sdf.surface_radius).mean()
    dh = np.abs(vh[okh] - sdf.surface_radius).mean()
    assert okn.mean() > 0.9
    # NUTS concentrates at least as well as HMC (generous factor: both
    # are stochastic)
    assert dn < dh * 1.5 + 0.1


def test_sample_surface_sharded_quality():
    """Chain-parallel sampling over the 8-device mesh (XLA gradient
    path): draws concentrate near the iso-surface and the device streams
    are independent (key folded with the axis index)."""
    from zelll_tpu.models.psssh import sample_surface_sharded
    from zelll_tpu.models.sdf import SmoothDistanceField

    rng = np.random.default_rng(0)
    pos = rng.uniform(0, 4, (50, 3))
    sdf = SmoothDistanceField(pos, np.full(50, 1.7), cutoff=4.0)
    pts = sample_surface_sharded(sdf, chains=16, burnin=100, draws=6,
                                 sampler="nuts-batched")
    assert pts.shape == (6 * 16, 3)
    v, _, ok = sdf.evaluate(pts)
    assert ok.mean() > 0.9
    assert np.abs(v[ok] - sdf.surface_radius).mean() < 0.5

    blk = pts.reshape(6, 8, 2, 3)  # (draws, device, local chains, 3)
    assert not np.allclose(blk[:, 0], blk[:, 1])


def test_sample_surface_sharded_join_vgrad_smoke():
    """The fused join-kernel vgrad inside shard_map (closure-captured
    replicated particle planes). Tiny sizes: on the CPU backend every
    leapfrog is one interpret-mode kernel call per device."""
    from zelll_tpu.models.psssh import sample_surface_sharded
    from zelll_tpu.models.sdf import SmoothDistanceField

    rng = np.random.default_rng(1)
    pos = rng.uniform(0, 3, (30, 3))
    sdf = SmoothDistanceField(pos, np.full(30, 1.7), cutoff=4.0,
                              method="join")
    pts = sample_surface_sharded(sdf, chains=8, burnin=6, draws=3,
                                 sampler="nuts-batched", max_treedepth=2)
    assert pts.shape == (3 * 8, 3)
    assert np.isfinite(pts).all()
    _, _, ok = sdf.evaluate(pts)
    assert ok.mean() > 0.8
