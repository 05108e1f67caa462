"""Smooth distance field over a point cloud — the psssh case study.

Re-design of the reference `surface-sampling` crate (zelll
`surface-sampling/src/sdf.rs`, `sdf/numdual.rs`): a smooth signed-distance-
like field over protein atoms, queried through the cell grid, with exact
gradients. The reference uses forward-mode dual numbers (num-dual); here
the whole field is a pure JAX function of the query point, so `jax.grad`
provides the gradient and `vmap` batches thousands of queries into one
device pass (the reference evaluates one point at a time, cli.rs:150-195).

Math (numdual.rs:11-61): over neighbors within cutoff of query x,
    S1 = sum exp(-d_i / r_i),  S2 = sum exp(-d_i) r_i,  S3 = sum exp(-d_i)
    sigma = S2 / S3           (exp-weighted mean vdW radius)
    sdf(x) = -sigma * ln(S1)
with the d == 0 singularity handled exactly like the reference: such terms
contribute the constants (1, r_i, 1) with zero gradient (numdual.rs:34-42).

Element vdW radii follow atom.rs:14-28.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..core.grid import CellGridData, build
from ..core.pairs import query_neighbors

__all__ = ["ELEMENT_RADII", "SmoothDistanceField", "element_radius"]

# van-der-Waals radii in Angstrom (reference atom.rs:17-27)
ELEMENT_RADII = {
    "C": 1.70,
    "H": 1.09,
    "O": 1.52,
    "N": 1.55,
    "S": 1.80,
    "SE": 1.90,
}
DEFAULT_ELEMENT = "C"


def element_radius(symbol: str) -> float:
    return ELEMENT_RADII[symbol.upper()]


def _sdf_from_neighbors(x, nb_pos, nb_radii, nb_mask, cutoff):
    """Differentiable SDF given padded neighbor candidates of one query."""
    diff = x - nb_pos  # (S, 3)
    dsq = jnp.sum(diff * diff, axis=-1)
    within = nb_mask & (dsq <= cutoff * cutoff)
    is_zero = dsq == 0.0
    live = within & ~is_zero

    # gradient-safe distance: sqrt argument is 1 wherever masked out
    d = jnp.sqrt(jnp.where(live, dsq, 1.0))
    e1 = jnp.where(live, jnp.exp(-d / nb_radii), 0.0)
    e3 = jnp.where(live, jnp.exp(-d), 0.0)
    zero_term = (within & is_zero).astype(d.dtype)

    s1 = jnp.sum(e1 + zero_term)
    s2 = jnp.sum(e3 * nb_radii + zero_term * nb_radii)
    s3 = jnp.sum(e3 + zero_term)
    sigma = s2 / s3
    return -sigma * jnp.log(s1)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SdfData:
    """Device-side field state (pytree)."""

    grid: CellGridData
    radii_sorted: jax.Array  # (n,) vdW radius per *sorted* slot
    cutoff: jax.Array


class SmoothDistanceField:
    """Smooth distance field with cell-grid-accelerated queries.

    Mirrors `SmoothDistanceField` (sdf.rs:13-45): fields `surface_radius`
    (default 1.05) and `k_force` (default 10.0), builders
    `with_surface_radius`/`with_k_force`, plus batched `evaluate` and
    `hmc_gradient` (numdual.rs:67-86).
    """

    def __init__(self, positions, radii=None, cutoff: float = 4.0,
                 surface_radius: float = 1.05, k_force: float = 10.0):
        positions = np.asarray(positions, np.float64)
        n = positions.shape[0]
        if radii is None:
            radii = np.full(n, ELEMENT_RADII[DEFAULT_ELEMENT])
        radii = np.asarray(radii, np.float64)
        self.surface_radius = float(surface_radius)
        self.k_force = float(k_force)
        self._cutoff = float(cutoff)

        grid = build(jnp.asarray(positions), cutoff)
        # radii in sorted-slot order so neighbor slots index directly;
        # one extra entry for the padding slot n
        radii_sorted = jnp.concatenate(
            [jnp.asarray(radii)[grid.bins.perm], jnp.ones((1,))]
        )
        self.data = SdfData(
            grid=grid,
            radii_sorted=radii_sorted,
            cutoff=jnp.asarray(cutoff, grid.sorted_pos.dtype),
        )
        self._K = int(grid.bins.max_cell_count())

    def with_surface_radius(self, r: float) -> "SmoothDistanceField":
        self.surface_radius = float(r)
        return self

    def with_k_force(self, k: float) -> "SmoothDistanceField":
        self.k_force = float(k)
        return self

    # -- batched field evaluation -------------------------------------------

    def evaluate(self, points):
        """(Q, 3) queries -> (values (Q,), grads (Q, 3), valid (Q,)).

        Batched analogue of `evaluate` (numdual.rs:67-70); `valid` False
        corresponds to the reference returning None for far-away queries.
        """
        points = jnp.atleast_2d(jnp.asarray(points))
        v, g, ok = _evaluate_batch(self.data, points, self._K)
        return np.asarray(v), np.asarray(g), np.asarray(ok)

    def hmc_gradient(self, points, isoradius: float | None = None):
        """(value, grad) of the harmonic iso-surface log-density
        -k (sdf(x) - isoradius)^2 (numdual.rs:72-86, 98-104)."""
        iso = self.surface_radius if isoradius is None else float(isoradius)
        points = jnp.atleast_2d(jnp.asarray(points))
        v, g, ok = _hmc_gradient_batch(
            self.data, points, self._K, iso, self.k_force
        )
        return np.asarray(v), np.asarray(g), np.asarray(ok)

    def logdensity_fn(self, isoradius: float | None = None):
        """Pure jittable per-point log density (for samplers)."""
        iso = self.surface_radius if isoradius is None else float(isoradius)
        data, K, k_force = self.data, self._K, self.k_force

        def logp(x):
            val, ok = _sdf_point(data, x, K)
            pot = -k_force * (val - iso) ** 2
            return jnp.where(ok, pot, -jnp.inf)

        return logp


def _sdf_point(data: SdfData, x, K: int):
    """SDF value at one point via grid query. Returns (value, valid).

    The neighbor-candidate query (grid lookup, slot gather) does not depend
    differentiably on x in a useful way within a cell, matching the
    reference where the neighborhood is selected by the real part only
    (numdual.rs:16-21); gradients flow through the distance terms.
    """
    res = query_neighbors(data.grid, x[None, :], K=K)
    radii = data.radii_sorted[jax.lax.stop_gradient(res.slots[0])]
    nb_pos = jax.lax.stop_gradient(res.pos[0])
    val = _sdf_from_neighbors(x, nb_pos, radii, res.mask[0], data.cutoff)
    return val, res.valid[0]


# queries are processed in chunks: each query materializes a padded
# (3^N * K)-candidate window, so an unchunked vmap over ~1e5 queries with
# large K would allocate tens of GB
_QCHUNK = 4096


@partial(jax.jit, static_argnames=("K",))
def _evaluate_batch(data: SdfData, points, K: int):
    def one(x):
        (val, ok), grad = jax.value_and_grad(
            lambda y: _sdf_point(data, y, K), has_aux=True
        )(x)
        return val, grad, ok

    return jax.lax.map(
        one, points, batch_size=min(_QCHUNK, points.shape[0])
    )


@partial(jax.jit, static_argnames=("K",))
def _hmc_gradient_batch(data: SdfData, points, K: int, iso: float, k: float):
    def pot(x):
        val, ok = _sdf_point(data, x, K)
        return -k * (val - iso) ** 2, ok

    def one(x):
        (val, ok), grad = jax.value_and_grad(pot, has_aux=True)(x)
        return val, grad, ok

    return jax.lax.map(
        one, points, batch_size=min(_QCHUNK, points.shape[0])
    )
