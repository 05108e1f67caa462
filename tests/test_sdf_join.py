"""Fused SDF join kernel (ops.sdf_join) vs brute force and the XLA path.

The join kernel is the batched-query hot path for the psssh workload;
these tests pin (i) the 12 accumulated sums against a numpy O(nq*np)
oracle, (ii) end-to-end value/gradient parity with the autodiff XLA
gather path, and (iii) the golden reference values through the join
method explicitly (the reference fixture queries atom positions, so the
d == 0 singularity handling is exercised)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from zelll_tpu.core.grid import build
from zelll_tpu.models.sdf import (
    ELEMENT_RADII, SmoothDistanceField, _sdf_join_batch,
)
from zelll_tpu.ops.sdf_join import NACC, sdf_join_sums

from test_sdf import POINTS, REF_GRADS, REF_VALUES


def _protein(n=400, radius=8.0, seed=0):
    rng = np.random.default_rng(seed)
    r = radius * rng.random(n) ** (1 / 3)
    theta = np.arccos(2 * rng.random(n) - 1)
    phi = 2 * np.pi * rng.random(n)
    pos = np.stack(
        [
            r * np.sin(theta) * np.cos(phi),
            r * np.sin(theta) * np.sin(phi),
            r * np.cos(theta),
        ],
        -1,
    )
    radii = rng.choice([1.7, 1.55, 1.52, 1.09], n)
    return pos, radii


def _brute_sums(queries, pos, radii, cutoff):
    """The 12 sums straight from the math (numdual.rs:11-61)."""
    out = np.zeros((len(queries), NACC))
    for qi, x in enumerate(queries):
        d_vec = x[None, :] - pos
        dsq = (d_vec**2).sum(-1)
        within = dsq <= cutoff**2
        iszero = within & (dsq == 0)
        live = within & (dsq > 0)
        d = np.sqrt(np.where(live, dsq, 1.0))
        e1 = np.where(live, np.exp(-d / radii), 0.0)
        e3 = np.where(live, np.exp(-d), 0.0)
        z = iszero.astype(float)
        u = d_vec / d[:, None]
        out[qi, 0] = (e1 + z).sum()
        out[qi, 1] = ((e3 + z) * radii).sum()
        out[qi, 2] = (e3 + z).sum()
        out[qi, 3:6] = ((e1 / radii)[:, None] * u).sum(0)
        out[qi, 6:9] = ((e3 * radii)[:, None] * u).sum(0)
        out[qi, 9:12] = (e3[:, None] * u).sum(0)
    return out


def test_join_sums_match_bruteforce():
    pos, radii = _protein(300)
    cutoff = 2.0
    grid = build(jnp.asarray(pos), cutoff)
    rng = np.random.default_rng(1)
    queries = np.concatenate(
        [
            rng.uniform(-9, 9, (100, 3)),
            pos[:5],  # exact atom positions: d == 0 terms
            pos[5:10] + 1e-3,
        ]
    )

    n = pos.shape[0]
    r_sorted = np.asarray(radii)[np.asarray(grid.bins.perm)]
    sp = grid.sorted_pos
    info = grid.info
    idx = jnp.floor(
        (jnp.asarray(queries) - info.origin) / info.cutoff
    ).astype(jnp.int32)
    idx = jnp.clip(idx, -1, info.shape)
    qkey = info.flatten_index(idx)
    order = np.argsort(np.asarray(qkey), kind="stable")
    qs = queries[order]

    sums, ok = sdf_join_sums(
        (jnp.asarray(qs[:, 0]), jnp.asarray(qs[:, 1]), jnp.asarray(qs[:, 2])),
        jnp.asarray(np.asarray(qkey)[order]),
        (sp[:, 0], sp[:, 1], sp[:, 2], jnp.asarray(r_sorted),
         1.0 / jnp.asarray(r_sorted)),
        grid.bins.sorted_keys,
        info.strides,
        cutoff**2,
        interpret=True,
    )
    assert bool(ok)
    ref = _brute_sums(qs, pos, radii, cutoff)
    scale = np.abs(ref).max(axis=0) + 1e-30
    np.testing.assert_allclose(
        np.asarray(sums) / scale, ref / scale, atol=1e-9
    )


@pytest.mark.parametrize("cutoff", [1.0, 2.0, 5.0])
def test_join_batch_matches_xla_path(cutoff):
    pos, radii = _protein(350, seed=2)
    rng = np.random.default_rng(3)
    queries = np.concatenate(
        [
            rng.uniform(-9, 9, (80, 3)),
            rng.uniform(-30, 30, (10, 3)),  # mostly invalid
            pos[:3],  # d == 0
        ]
    )
    a = SmoothDistanceField(pos, radii, cutoff=cutoff, method="join")
    b = SmoothDistanceField(pos, radii, cutoff=cutoff, method="xla")
    va, ga, oka = a.evaluate(queries)
    vb, gb, okb = b.evaluate(queries)
    np.testing.assert_array_equal(oka, okb)
    # compare only where the field is defined (has neighbors) and valid
    defined = oka & ~np.isnan(vb)
    np.testing.assert_array_equal(defined, oka & ~np.isnan(va))
    np.testing.assert_allclose(va[defined], vb[defined], rtol=1e-9)
    np.testing.assert_allclose(
        ga[defined], gb[defined], rtol=1e-7, atol=1e-12
    )

    pa, gpa, _ = a.hmc_gradient(queries)
    pb, gpb, _ = b.hmc_gradient(queries)
    np.testing.assert_allclose(pa[defined], pb[defined], rtol=1e-9)
    np.testing.assert_allclose(
        gpa[defined], gpb[defined], rtol=1e-6, atol=1e-12
    )


def test_join_golden_values():
    sdf = SmoothDistanceField(
        POINTS, radii=np.full(10, ELEMENT_RADII["C"]), cutoff=1.0,
        method="join",
    )
    vals, grads, ok = sdf.evaluate(POINTS)
    assert ok.all()
    np.testing.assert_allclose(vals, REF_VALUES, rtol=1e-12, atol=1e-15)
    np.testing.assert_allclose(grads, REF_GRADS, rtol=1e-10, atol=1e-12)


def test_evaluate_sharded_matches_single_device():
    """Query-sharded multi-chip evaluate == single-device join path.

    8 virtual devices (conftest); query count deliberately NOT a
    multiple of the device count so the padding lane is exercised."""
    pos, radii = _protein(200, seed=5)
    rng = np.random.default_rng(6)
    queries = np.concatenate(
        [rng.uniform(-9, 9, (91, 3)), pos[:2]]  # 93 = 8*11 + 5
    )
    sdf = SmoothDistanceField(pos, radii, cutoff=3.0, method="join")
    v1, g1, ok1 = sdf.evaluate(queries)
    vs, gs, oks = sdf.evaluate_sharded(queries)
    np.testing.assert_array_equal(ok1, oks)
    defined = ok1 & ~np.isnan(v1)
    np.testing.assert_allclose(vs[defined], v1[defined], rtol=1e-12)
    np.testing.assert_allclose(
        gs[defined], g1[defined], rtol=1e-12, atol=1e-15
    )


def test_far_query_key_overflow_is_safe():
    """Padding/far queries with coords far past int32 key range must not
    contribute pairs: the distance filter, not the key window, is the
    correctness backstop (clip-after-convert in _sdf_join_batch)."""
    pos, radii = _protein(50, seed=8)
    sdf = SmoothDistanceField(pos, radii, cutoff=2.0, method="join")
    v, g, ok = sdf.evaluate(
        np.array([[1e9, -1e9, 1e9], [0.0, 0.0, 0.0]])
    )
    assert not ok[0] and ok[1]


def test_join_far_query_invalid_and_clamped():
    sdf = SmoothDistanceField(POINTS, cutoff=1.0, method="join")
    v, g, ok = sdf.evaluate(
        np.array([[1e9, 1e9, 1e9], [0.5, 0.5, 0.5]])
    )
    assert not ok[0] and ok[1]
    assert np.isfinite(v[1])
