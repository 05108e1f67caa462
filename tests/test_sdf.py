"""Smooth-distance-field golden values from the reference
(surface-sampling/src/sdf/numdual.rs:107-192, 10-point cube fixture)."""

import numpy as np
import pytest

from zelll_tpu.models.sdf import ELEMENT_RADII, SmoothDistanceField

POINTS = np.array(
    [
        [0.0, 0.0, 0.0],
        [0.0, 0.0, 1.0],
        [0.0, 1.0, 0.0],
        [1.0, 0.0, 0.0],
        [1.0, 1.0, 0.0],
        [0.0, 1.0, 1.0],
        [1.0, 0.0, 1.0],
        [1.0, 1.0, 1.0],
        [0.5, 0.5, 0.5],
        [1.5, 1.5, 1.5],
    ]
)

REF_VALUES = [
    -2.012457244274712,
    -2.012457244274712,
    -2.012457244274712,
    -2.012457244274712,
    -2.012457244274712,
    -2.012457244274712,
    -2.012457244274712,
    -2.2994776285300675,
    -2.990326826730122,
    -0.7998983683589523,
]

REF_GRADS = [
    [-0.2761763132292168, -0.2761763132292168, -0.2761763132292168],
    [-0.2761763132292168, -0.2761763132292168, 0.2761763132292168],
    [-0.2761763132292168, 0.2761763132292168, -0.2761763132292168],
    [0.2761763132292168, -0.2761763132292168, -0.2761763132292168],
    [0.2761763132292168, 0.2761763132292168, -0.2761763132292168],
    [-0.2761763132292168, 0.2761763132292168, 0.2761763132292168],
    [0.2761763132292168, -0.2761763132292168, 0.2761763132292168],
    [0.14357909754235015, 0.14357909754235015, 0.14357909754235015],
    [6.651802279961878e-17, -0.0, -0.0],
    [0.21669568034989597, 0.21669568034989597, 0.21669568034989597],
]


def test_sdf_golden_values_and_gradients():
    # all atoms default element (Carbon, r = 1.70), cutoff 1.0
    # (numdual.rs:167-180)
    sdf = SmoothDistanceField(
        POINTS, radii=np.full(10, ELEMENT_RADII["C"]), cutoff=1.0
    )
    vals, grads, ok = sdf.evaluate(POINTS)
    assert ok.all()
    np.testing.assert_allclose(vals, REF_VALUES, rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(grads, REF_GRADS, rtol=1e-10, atol=1e-12)


def test_hmc_gradient_is_harmonic_potential():
    sdf = SmoothDistanceField(
        POINTS, radii=np.full(10, 1.70), cutoff=1.0,
        surface_radius=1.05, k_force=10.0,
    )
    vals, grads, ok = sdf.hmc_gradient(POINTS)
    # V = -k (sdf - iso)^2; dV/dx = -2k (sdf - iso) d(sdf)/dx
    sv = np.asarray(REF_VALUES)
    sg = np.asarray(REF_GRADS)
    np.testing.assert_allclose(vals, -10.0 * (sv - 1.05) ** 2, rtol=1e-10)
    np.testing.assert_allclose(
        grads, -2 * 10.0 * (sv - 1.05)[:, None] * sg, rtol=1e-8, atol=1e-12
    )


def test_far_query_invalid():
    sdf = SmoothDistanceField(POINTS, cutoff=1.0)
    _, _, ok = sdf.evaluate(np.array([[50.0, 50.0, 50.0]]))
    assert not ok[0]


def test_mixed_radii_differ():
    r = np.full(10, 1.70)
    r[0] = 1.09  # hydrogen
    a = SmoothDistanceField(POINTS, radii=r, cutoff=1.0)
    b = SmoothDistanceField(POINTS, cutoff=1.0)
    va, _, _ = a.evaluate(POINTS[:1])
    vb, _, _ = b.evaluate(POINTS[:1])
    assert abs(float(va[0]) - float(vb[0])) > 1e-6
