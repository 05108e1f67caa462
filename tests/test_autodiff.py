"""Differentiable pair potentials (`ops.autodiff.make_pair_potential`):
jax.grad through the custom_vjp must equal -forces (analytic and brute
force), on both kernel paths, for the stock LJ term and for a custom term
whose force factor is derived by autodiff."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from zelll_tpu.ops.autodiff import gfn_from_term, make_pair_potential
from zelll_tpu.ops.pallas_pairs import lj_term


def brute_energy_forces(pts, cutoff, term, dterm):
    """O(n^2) f64 oracle: E = sum term(dsq), f_i = -dE/dp_i."""
    n = len(pts)
    d = pts[:, None, :] - pts[None, :, :]
    dsq = (d * d).sum(-1)
    mask = (dsq < cutoff**2) & ~np.eye(n, dtype=bool)
    e = 0.5 * (np.where(mask, term(np.where(mask, dsq, 1.0)), 0.0)).sum()
    # dE/dp_i = sum_j term'(dsq_ij) * 2 (p_i - p_j)
    w = np.where(mask, dterm(np.where(mask, dsq, 1.0)), 0.0)
    grad = 2.0 * (w[:, :, None] * d).sum(axis=1)
    return e, -grad


def lj_np(dsq):
    inv = 1.0 / dsq
    i6 = inv * inv * inv
    return 4.0 * (i6 * i6 - i6)


def dlj_np(dsq):
    # dV/d(dsq) with V = 4 (t^2 - t), t = dsq^-3: -12 t (2t - 1) / dsq
    inv = 1.0 / dsq
    i6 = inv * inv * inv
    return -12.0 * i6 * (2.0 * i6 - 1.0) * inv


@pytest.mark.parametrize("path", ["lag", "tile"])
def test_grad_is_minus_forces_lj(path):
    rng = np.random.default_rng(7)
    n, cutoff = 500, 1.0
    pts = rng.uniform(0, 1, (n, 3)) * np.array([4.0, 4.0, 6.0])
    e_ref, f_ref = brute_energy_forces(pts, cutoff, lj_np, dlj_np)

    pot = make_pair_potential(
        cutoff, path=path, M=512, L=512, MAXJ=8, interpret=True
    )
    (e, ok), g = jax.value_and_grad(pot, has_aux=True)(jnp.asarray(pts))
    assert bool(ok)
    np.testing.assert_allclose(float(e), e_ref, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(g), -f_ref, rtol=1e-8, atol=1e-10)


def test_custom_term_derived_gfn():
    """A soft-sphere term with gfn derived by `gfn_from_term` matches the
    f64 brute-force gradient."""

    def soft(dsq):
        return (1.0 - dsq) ** 2

    def dsoft(dsq):
        return -2.0 * (1.0 - dsq)

    rng = np.random.default_rng(11)
    n, cutoff = 300, 1.0
    pts = rng.uniform(0, 1, (n, 3)) * 4.0
    e_ref, f_ref = brute_energy_forces(pts, cutoff, soft, dsoft)

    pot = make_pair_potential(
        cutoff, term=soft, path="tile", MAXJ=8, interpret=True
    )
    (e, ok), g = jax.value_and_grad(pot, has_aux=True)(jnp.asarray(pts))
    assert bool(ok)
    np.testing.assert_allclose(float(e), e_ref, rtol=1e-9)
    np.testing.assert_allclose(np.asarray(g), -f_ref, rtol=1e-8, atol=1e-12)


def test_gfn_from_term_matches_handwritten():
    from zelll_tpu.ops.lj import lj_force_factor

    dsq = jnp.asarray(np.linspace(0.3, 2.0, 64))
    got = gfn_from_term(lj_term)(dsq)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(lj_force_factor(dsq)), rtol=1e-12
    )


def test_grad_2d_tile_path():
    rng = np.random.default_rng(13)
    n, cutoff = 250, 1.0
    pts = rng.uniform(0, 1, (n, 2)) * 5.0
    d = pts[:, None, :] - pts[None, :, :]
    dsq = (d * d).sum(-1)
    mask = (dsq < 1.0) & ~np.eye(n, dtype=bool)
    w = np.where(mask, dlj_np(np.where(mask, dsq, 1.0)), 0.0)
    f_ref = -2.0 * (w[:, :, None] * d).sum(axis=1)

    pot = make_pair_potential(cutoff, path="tile", MAXJ=8, interpret=True)
    (e, ok), g = jax.value_and_grad(pot, has_aux=True)(jnp.asarray(pts))
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(g), -f_ref, rtol=1e-8, atol=1e-10)


def test_undersized_backward_poisons_grad():
    """An under-capacity forces kernel must yield NaN gradients, never a
    silently wrong gradient (the never-silently-drop invariant)."""
    rng = np.random.default_rng(17)
    pts = rng.uniform(0, 1, (1500, 3)) * 5.0  # dense: windows need > 1
    pot = make_pair_potential(
        1.0, path="tile", MAXJ=8, MAXJ_F=1, interpret=True
    )
    (e, ok), g = jax.value_and_grad(pot, has_aux=True)(jnp.asarray(pts))
    assert bool(ok)  # the ENERGY capacity is fine...
    assert np.isnan(np.asarray(g)).all()  # ...the forces capacity is not


@pytest.mark.parametrize("path", ["lag", "tile"])
def test_split_precision_grad(path):
    """split=True must recover f64-grade gradients in a large box where
    plain f32 coordinates lose ~1e-2 to cancellation."""
    rng = np.random.default_rng(23)
    n, cutoff = 400, 1.0
    pts = rng.uniform(0, 1, (n, 3)) * np.array([3.0, 3.0, 40.0])
    pts[:, 2] += 1e4  # large offset: f32 coords cancel catastrophically
    e_ref, f_ref = brute_energy_forces(pts, cutoff, lj_np, dlj_np)

    pot = make_pair_potential(
        cutoff, path=path, M=256, L=128, MAXJ=8, split=True,
        interpret=True,
    )
    (e, ok), g = jax.value_and_grad(pot, has_aux=True)(jnp.asarray(pts))
    assert bool(ok)
    np.testing.assert_allclose(float(e), e_ref, rtol=1e-6)
    scale = np.abs(f_ref).max()
    np.testing.assert_allclose(
        np.asarray(g) / scale, -f_ref / scale, atol=2e-6
    )


def test_grad_composes_under_jit():
    rng = np.random.default_rng(19)
    pts = jnp.asarray(rng.uniform(0, 1, (200, 3)) * 4.0)
    pot = make_pair_potential(1.0, path="lag", M=256, L=128, interpret=True)

    @jax.jit
    def loss(p):
        e, ok = pot(p)
        return e, ok

    g = jax.jit(jax.grad(lambda p: loss(p)[0]))(pts)
    (e, ok), g2 = jax.value_and_grad(pot, has_aux=True)(pts)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g2), rtol=1e-12)
