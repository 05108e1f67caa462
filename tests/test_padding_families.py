"""Padding-coordinate family invariants.

Every padding scheme must keep rows far apart AFTER f32 rounding: the
energy kernels have no dsq > 0 exclusion, so two padding rows that
quantize onto the same f32 value contribute lj(0) = inf whenever their
(desentineled) padding keys fall inside the key window — which happens
exactly at large n, where no CPU test ever looks. These tests pin the
arithmetic instead: spacings must be exact multiples of the ulp at each
family's base, and families must not overlap.
"""

import jax.numpy as jnp
import numpy as np

from zelll_tpu.api import _pad_far
from zelll_tpu.ops.pallas_pairs import (
    _PAD_COORD_BASE,
    _PAD_COORD_SPACING,
    _tail_spread,
)


def test_tail_spread_f32_distinct_and_far():
    tail = 16384  # the largest possible tail (M cap)
    v = np.asarray(_tail_spread(tail, jnp.float32), np.float64)
    d = np.diff(v)
    assert d.min() >= _PAD_COORD_SPACING  # no f32 quantization collapse
    assert v.min() > 6.9e12 and v.max() < 7.1e12  # stays in its family


def test_pad_far_f32_distinct_and_inside_family():
    pts = np.zeros((0, 3), np.float32)
    out = _pad_far(pts, 70000)
    rows = out.astype(np.float32)
    # all rows pairwise >= 2^17 apart: distinct grid nodes with exact
    # f32 spacing => uniqueness is enough
    uniq = np.unique(rows, axis=0)
    assert uniq.shape[0] == rows.shape[0]
    dx = np.unique(rows[:, 0])
    if dx.size > 1:
        assert np.diff(np.sort(dx)).min() >= 2.0**17
    assert rows.max() < 2e12  # never crosses into the 7e12 tail family


def test_pbc_spread_f32_distinct():
    from zelll_tpu.ops.pbc import pbc_extend

    # 2 boundary particles but a huge G: almost all ghost rows invalid
    pts = jnp.asarray(
        np.float32([[0.1, 2.0, 2.0], [3.9, 2.0, 2.0], [2.0, 2.0, 2.0]])
    )
    ext, _, _, valid, ok = pbc_extend(
        pts, jnp.zeros(3, jnp.float32), jnp.full(3, 4.0, jnp.float32),
        jnp.float32(0.5), B=3, G=21,
    )
    assert bool(ok)
    pad = np.asarray(ext, np.float32)[3:][~np.asarray(valid)[3:]]
    uniq = np.unique(pad, axis=0)
    assert uniq.shape[0] == pad.shape[0]
    assert pad.min() > 3.9e12 and pad.max() < 4.1e12  # own family
