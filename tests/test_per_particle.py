"""Per-particle lag reductions: coordination numbers and per-particle
energies vs brute force."""

import jax.numpy as jnp
import numpy as np

from zelll_tpu.core import build
from zelll_tpu.ops.pallas_pairs import lj_term, pair_lag_per_particle


def test_coordination_numbers():
    rng = np.random.default_rng(0)
    n, cutoff = 600, 1.0
    pts = rng.uniform(0, 1, size=(n, 3)) * np.array([4.0, 4.0, 25.0])
    grid = build(jnp.asarray(pts), cutoff)
    out = np.asarray(
        pair_lag_per_particle(
            grid.sorted_pos, grid.bins.sorted_keys, grid.info.strides,
            cutoff**2, M=256, L=256, interpret=True,
        )
    )
    d = pts[:, None] - pts[None]
    dsq = (d * d).sum(-1)
    coord = ((dsq < cutoff**2) & ~np.eye(n, dtype=bool)).sum(1)
    np.testing.assert_array_equal(out, coord[np.asarray(grid.bins.perm)])


def test_per_particle_lj_energy():
    rng = np.random.default_rng(1)
    n, cutoff = 400, 1.2
    pts = rng.uniform(0, 1, size=(n, 3)) * np.array([3.0, 3.0, 15.0]) + 0.02
    grid = build(jnp.asarray(pts), cutoff)
    out = 0.5 * np.asarray(
        pair_lag_per_particle(
            grid.sorted_pos, grid.bins.sorted_keys, grid.info.strides,
            cutoff**2, M=256, L=256, term=lj_term, interpret=True,
        )
    )
    d = pts[:, None] - pts[None]
    dsq = (d * d).sum(-1)
    mask = (dsq < cutoff**2) & ~np.eye(n, dtype=bool)
    t3 = np.where(mask, (1.0 / np.where(mask, dsq, 1.0)) ** 3, 0.0)
    e_pp = 0.5 * np.where(mask, 4 * t3 * (t3 - 1), 0.0).sum(1)
    np.testing.assert_allclose(
        out, e_pp[np.asarray(grid.bins.perm)], rtol=1e-9,
        atol=1e-9 * np.abs(e_pp).max(),
    )
    # halves sum to the total energy
    iu = np.triu_indices(n, 1)
    v = dsq[iu]
    v = v[v < cutoff**2]
    t3 = (1 / v) ** 3
    np.testing.assert_allclose(out.sum(), (4 * t3 * (t3 - 1)).sum(), rtol=1e-9)
