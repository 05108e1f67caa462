"""Split-precision (f32x2) pair distances: f64-grade LJ parity from f32
planes. On CPU (x64) we can compare directly against the f64 oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from zelll_tpu import oracle
from zelll_tpu.ops.fused import fused_lj_rebuild_energy
from zelll_tpu.ops.pallas_pairs import count_term, split_f64
from zelll_tpu.utils.datagen import generate_points_random, lj_box


@pytest.mark.skipif(not oracle.available(), reason="needs g++")
def test_split_precision_recovers_f64_parity():
    # large-coordinate box (bench geometry): plain f32 coordinates lose
    # ~1e-3 absolute -> O(1e-3) energy error; split mode must reach ~1e-7
    n, cutoff = 20_000, 10.0
    pts = generate_points_random(n, lj_box(n, cutoff))  # z up to ~1100
    e_ref, n_ref = oracle.lj_energy(pts, cutoff)

    hi = pts.astype(np.float32)
    lo = (pts - hi.astype(np.float64)).astype(np.float32)

    e_plain, ok1 = fused_lj_rebuild_energy(
        jnp.asarray(hi), cutoff, M=1024, L=256, interpret=True
    )
    e_split, ok2 = fused_lj_rebuild_energy(
        jnp.asarray(hi), cutoff, jnp.asarray(lo), M=1024, L=256, interpret=True
    )
    assert bool(ok1) and bool(ok2)
    err_plain = abs(float(e_plain) - e_ref) / abs(e_ref)
    err_split = abs(float(e_split) - e_ref) / abs(e_ref)
    assert err_split < 2e-6, f"split err {err_split}"
    assert err_split < err_plain / 10, (err_plain, err_split)

    c, _ = fused_lj_rebuild_energy(
        jnp.asarray(hi), cutoff, jnp.asarray(lo), M=1024, L=256,
        term=count_term, interpret=True,
    )
    # split distances resolve the cutoff boundary at f64 grade: counts match
    assert int(c) == n_ref


def test_split_f64_identity():
    x = jnp.asarray(np.random.default_rng(0).uniform(-5e3, 5e3, 1000))
    hi, lo = split_f64(x)
    np.testing.assert_allclose(
        np.asarray(hi, np.float64) + np.asarray(lo, np.float64),
        np.asarray(x),
        rtol=0,
        atol=1e-10,
    )
