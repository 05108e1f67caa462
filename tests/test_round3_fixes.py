"""Round-3 advisor-finding regressions (ADVICE.md round 2).

1. `_minimage_bins_sorted_extremes` high-face capacity flag must check
   CONTAINMENT (all top-two-cell rows inside the sp[n-B:] slice), not a
   boundary-row count: with non-integral box/cutoff the z >= box-cutoff
   rows interleave with non-boundary rows of cell nz_top-1 and a
   count-only flag silently dropped wrap images.
2. Stress kernels exclude coincident pairs (dsq > 0): gfn(0) = inf for
   LJ and inf * d_a * d_b = NaN poisoned the whole tensor.
3. `potentials.shifted` raises clearly for payload-parameterized
   potentials instead of an opaque arity TypeError.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from zelll_tpu.ops.pbc import _minimage_bins_sorted_extremes
from zelll_tpu.ops.potentials import lennard_jones, lennard_jones_mixed, shifted
from zelll_tpu.ops.virial import fused_stress_open


def _interleaved_face_cloud():
    """Box (3, 3, 6.5), cutoff 1: nz_top = 6, so the high-face rows
    (z >= 5.5) live in cells 5 AND 6, and the cell-5 boundary rows are
    interleaved by (y, x) minor key with the cell-5 non-boundary rows."""
    rng = np.random.default_rng(7)
    pts = []
    # bulk: keeps n >= 512 (the fast path needs B2 = max(2B, 512) <= n)
    # and stays out of cell 0 (z >= 1.5) and the face cells (z < 5)
    bulk = rng.uniform([0, 0, 1.5], [3, 3, 5.0], size=(520, 3))
    pts.append(bulk)
    # cell 5, non-boundary (z < 5.5) and boundary (z >= 5.5) rows on the
    # same 3x3 xy cell grid -> same minor keys -> interleaved suffix
    xy = np.array([[x + 0.5, y + 0.5] for y in range(3) for x in range(3)])
    for z in (5.2, 5.3):
        pts.append(np.concatenate([xy[:6], np.full((6, 1), z)], axis=1))
    for z in (5.7, 5.8):
        pts.append(np.concatenate([xy[3:9], np.full((6, 1), z)], axis=1))
    # top cell 6 rows (z in [6, 6.5))
    pts.append(np.concatenate([xy[:6], np.full((6, 1), 6.2)], axis=1))
    pts = np.concatenate(pts)
    n_boundary = int(np.sum(pts[:, 2] >= 5.5))  # the OLD (unsound) count
    n_face2 = int(np.sum(np.floor(pts[:, 2] / 1.0) >= 5))  # containment
    assert n_boundary < n_face2
    return jnp.asarray(pts), n_boundary, n_face2


def test_sorted_extremes_flag_checks_containment():
    pts, n_boundary, n_face2 = _interleaved_face_cloud()
    mimask = np.array([True, True, False])

    def run(B):
        out = _minimage_bins_sorted_extremes(
            pts, np.zeros(3), np.array([3.0, 3.0, 6.5]), 1.0, mimask,
            B=B, positions_lo=None, need_perm=False,
        )
        return bool(out[-1])

    # B large enough for every top-two-cell row: flag passes
    assert run(n_face2) is True
    # B covering only the boundary-row COUNT: cell-5 boundary rows fall
    # outside sp[n-B:], so the flag must trip (it used to stay True)
    assert run(n_boundary) is False


@pytest.mark.parametrize("path", ["lag", "tile"])
def test_stress_finite_with_coincident_pair(path):
    # jittered lattice: bounded minimum separation keeps |gfn| sane so
    # f32 vs f64 agreement is meaningful (a random cloud's closest pair
    # dominates the tensor through the r^-14 force factor)
    rng = np.random.default_rng(3)
    g = np.stack(np.meshgrid(*[np.arange(5)] * 3, indexing="ij"), -1)
    pts = g.reshape(-1, 3) * 0.8 + rng.uniform(-0.15, 0.15, (125, 3))
    pts = np.concatenate([pts, pts[:1]])  # exact duplicate -> dsq == 0
    cutoff = 1.2

    sigma, ok = fused_stress_open(
        jnp.asarray(pts, jnp.float32), cutoff, path=path, interpret=True,
        MAXJ=16, L=512,
    )
    assert bool(ok)
    assert bool(jnp.all(jnp.isfinite(sigma)))

    # oracle: same exclusion semantics (coincident pairs contribute 0,
    # matching the forces kernels)
    d = pts[:, None, :] - pts[None, :, :]
    dsq = (d * d).sum(-1)
    np.fill_diagonal(dsq, np.inf)
    within = np.triu((dsq < cutoff * cutoff) & (dsq > 0))
    t = 1.0 / np.where(within, dsq, 1.0)
    t3 = t * t * t
    g = np.where(within, 24.0 * t3 * (2.0 * t3 - 1.0) * t, 0.0)
    ref = np.einsum("ij,ija,ijb->ab", g, d, d)
    np.testing.assert_allclose(np.asarray(sigma), ref, rtol=2e-5, atol=1e-5)


def test_shifted_rejects_payload_potentials():
    pot = lennard_jones_mixed((1.0, 0.5), (1.0, 0.8))
    with pytest.raises(ValueError, match="scalar-dsq"):
        shifted(pot, 2.5)
    # scalar potentials still shift
    sp = shifted(lennard_jones(1.0, 1.0), 2.5)
    v = float(sp.term(jnp.asarray(2.5**2)))
    assert abs(v) < 1e-12
