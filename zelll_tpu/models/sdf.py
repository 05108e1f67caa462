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

from ..ops.join import JOIN_MAX_PARTICLES as _JOIN_MAX_ATOMS

# windowed-join capacity ceiling (in 128-slot particle chunks): bounds the
# kernel's per-program DMA scratch (CB*S*MAXJ*8 rows x 128 lanes x 4 B =
# ~0.3 MB per capacity unit) well inside VMEM
_JOIN_LADDER_CAP = 16

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


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class _JoinData:
    """Particle side prepared for the fused join kernel (pytree)."""

    pplanes: tuple  # 5 sorted (n,) planes: x, y, z, r, 1/r
    pkeys: jax.Array  # (n,) int32 ascending cell keys
    shape: jax.Array  # grid shape (3,) int32
    strides: jax.Array  # grid strides (3,) int32
    origin: jax.Array  # grid origin (3,)
    cutoff: jax.Array  # scalar, grid dtype


class SmoothDistanceField:
    """Smooth distance field with cell-grid-accelerated queries.

    Mirrors `SmoothDistanceField` (sdf.rs:13-45): fields `surface_radius`
    (default 1.05) and `k_force` (default 10.0), builders
    `with_surface_radius`/`with_k_force`, plus batched `evaluate` and
    `hmc_gradient` (numdual.rs:67-86).
    """

    def __init__(self, positions, radii=None, cutoff: float = 4.0,
                 surface_radius: float = 1.05, k_force: float = 10.0,
                 method: str = "auto"):
        positions = np.asarray(positions, np.float64)
        n = positions.shape[0]
        if radii is None:
            radii = np.full(n, ELEMENT_RADII[DEFAULT_ELEMENT])
        radii = np.asarray(radii, np.float64)
        self.surface_radius = float(surface_radius)
        self.k_force = float(k_force)
        self._cutoff = float(cutoff)
        if method not in ("auto", "join", "xla"):
            raise ValueError("method must be 'auto', 'join' or 'xla'")
        self._method = method

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

        sp = grid.sorted_pos
        r_sorted = radii_sorted[:n].astype(sp.dtype)
        self._join = _JoinData(
            pplanes=(sp[:, 0], sp[:, 1], sp[:, 2], r_sorted, 1.0 / r_sorted),
            pkeys=grid.bins.sorted_keys,
            shape=grid.info.shape,
            strides=grid.info.strides,
            origin=grid.info.origin,
            cutoff=jnp.asarray(cutoff, sp.dtype),
        )
        # structures above the VMEM-residency ceiling run the windowed
        # join kernel; the capacity class is learned by coverage-flag
        # retry and remembered across calls
        self._join_maxj = 8 if n > _JOIN_MAX_ATOMS else None

    def _use_join(self) -> bool:
        if self._method == "xla":
            return False
        if self._method == "join":
            return True
        # auto: the join kernel wins on a compiled accelerator backend;
        # on CPU it would run in (slow, per-call) Pallas interpret mode,
        # which would cripple e.g. the psssh NUTS loop's one-query
        # hmc_gradient calls — the jitted XLA gather path is the right
        # CPU default (method='join' still forces it, as the tests do)
        return (
            self.data.grid.dim == 3
            and self.data.grid.n > 0
            and jax.default_backend() != "cpu"
        )

    def _join_batch_auto(self, points):
        """`_sdf_join_batch` with the windowed-capacity retry ladder.

        Structures at or below `_JOIN_MAX_ATOMS` run the VMEM-resident
        kernel; larger ones run the windowed kernel, doubling the window
        capacity while the coverage flag fails, up to `_JOIN_LADDER_CAP`
        (a VMEM bound: very spread-out query chunks can demand windows
        larger than the scratch buffer can hold). Returns
        (vals, grads, valid) or None — the caller falls back to the XLA
        gather path, which is always correct."""
        interpret = jax.default_backend() == "cpu"
        n = self.data.grid.n
        if self._join_maxj is None:
            v, g, valid, ok = _sdf_join_batch(
                self._join, points, interpret=interpret
            )
            return (v, g, valid) if bool(ok) else None
        ncp = -(-n // 128)
        cap = min(ncp, _JOIN_LADDER_CAP)
        while True:
            v, g, valid, ok = _sdf_join_batch(
                self._join, points, MAXJ=self._join_maxj,
                interpret=interpret,
            )
            if bool(ok):
                return v, g, valid
            if self._join_maxj >= cap:
                return None
            self._join_maxj = min(2 * self._join_maxj, cap)

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

        Large batches run through the fused join kernel (`ops.sdf_join`:
        sorted queries x particle blocks — VMEM-resident up to
        `_JOIN_MAX_ATOMS` atoms, HBM-windowed above — with analytic
        gradients); the XLA gather path is the fallback (``method='xla'``
        forces it).
        """
        points = jnp.atleast_2d(
            jnp.asarray(points, self.data.grid.sorted_pos.dtype)
        )
        if self._use_join():
            res = self._join_batch_auto(points)
            if res is not None:
                v, g, valid = res
                return np.asarray(v), np.asarray(g), np.asarray(valid)
        v, g, ok = _evaluate_batch(self.data, points, self._K)
        return np.asarray(v), np.asarray(g), np.asarray(ok)

    def hmc_gradient(self, points, isoradius: float | None = None):
        """(value, grad) of the harmonic iso-surface log-density
        -k (sdf(x) - isoradius)^2 (numdual.rs:72-86, 98-104)."""
        iso = self.surface_radius if isoradius is None else float(isoradius)
        points = jnp.atleast_2d(
            jnp.asarray(points, self.data.grid.sorted_pos.dtype)
        )
        if self._use_join():
            res = self._join_batch_auto(points)
            if res is not None:
                v, g, valid = res
                # compose the harmonic potential in closed form
                pot = -self.k_force * (v - iso) ** 2
                gpot = (-2.0 * self.k_force) * (v - iso)[:, None] * g
                return np.asarray(pot), np.asarray(gpot), np.asarray(valid)
        v, g, ok = _hmc_gradient_batch(
            self.data, points, self._K, iso, self.k_force
        )
        return np.asarray(v), np.asarray(g), np.asarray(ok)

    def evaluate_sharded(self, points, mesh=None):
        """Multi-chip batched evaluate: queries sharded over the mesh.

        The psssh ``eval`` workload (l^3 query grids,
        ``surface-sampling/examples/cli.rs:150-195``) is embarrassingly
        parallel along the query axis: the structure's particle planes
        are replicated to every device, queries are block-sharded, and
        each device runs the fused join kernel (`ops.sdf_join`) on its
        block — no collectives on the hot path. Structures above
        `_JOIN_MAX_ATOMS` atoms run the windowed kernel per device with
        the capacity retry ladder. Returns (values, grads, valid)
        exactly like `evaluate`.
        """
        import numpy as np

        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        from ..parallel import make_mesh

        if self.data.grid.dim != 3 or self.data.grid.n == 0:
            raise ValueError("evaluate_sharded needs a 3D non-empty grid")
        mesh = mesh if mesh is not None else make_mesh()
        ndev = int(mesh.devices.size)
        axis = mesh.axis_names[0]
        dtype = self.data.grid.sorted_pos.dtype
        interpret = jax.default_backend() == "cpu"

        pts = np.atleast_2d(np.asarray(points)).astype(dtype)
        Q = pts.shape[0]
        Qp = max(-(-Q // ndev) * ndev, ndev)
        # pad by repeating the last real query: its results are sliced
        # off below, and a REAL point keeps the padded chunk's key span
        # tight — far-away padding (e.g. 1e9) would clamp to the grid
        # corner and blow the windowed kernel's capacity for the mixed
        # chunk. With no real queries at all, any point works.
        fill = pts[-1] if Q else np.full(3, 1e9, dtype)
        pad = np.broadcast_to(fill, (Qp - Q, 3)).astype(dtype)
        pts_p = jnp.asarray(np.concatenate([pts, pad]) if Qp > Q else pts)

        ncp = -(-self.data.grid.n // 128)
        cap = min(ncp, _JOIN_LADDER_CAP)
        while True:
            MAXJ = self._join_maxj

            def body(jd, p):
                v, g, valid, ok = _sdf_join_batch(
                    jd, p, MAXJ=MAXJ, interpret=interpret
                )
                return v, g, valid, ok.reshape(1)

            v, g, valid, oks = jax.jit(
                shard_map(
                    body,
                    mesh=mesh,
                    in_specs=(P(), P(axis)),
                    out_specs=(P(axis), P(axis), P(axis), P(axis)),
                    check_vma=False,  # pallas_call outputs carry no vma
                )
            )(self._join, pts_p)
            if bool(jnp.all(oks)):
                break
            if MAXJ is None or MAXJ >= cap:
                raise RuntimeError(
                    "join coverage flag false on at least one device "
                    "(key preconditions violated, or windowed capacity "
                    "exhausted — localize the per-device query blocks)"
                )
            self._join_maxj = min(2 * MAXJ, cap)
        return (
            np.asarray(v[:Q]),
            np.asarray(g[:Q]),
            np.asarray(valid[:Q]),
        )

    def logdensity_fn(self, isoradius: float | None = None):
        """Pure jittable per-point log density (for samplers)."""
        iso = self.surface_radius if isoradius is None else float(isoradius)
        data, K, k_force = self.data, self._K, self.k_force

        def logp(x):
            val, ok = _sdf_point(data, x, K)
            pot = -k_force * (val - iso) ** 2
            return jnp.where(ok, pot, -jnp.inf)

        return logp

    def hmc_vgrad_fn(self, isoradius: float | None = None):
        """Batched jittable (logp, grad) of the iso-surface density.

        Returns ``f(points (C, 3)) -> (logp (C,), grad (C, 3))`` backed by
        the fused join kernel (`ops.sdf_join`) with the ANALYTIC gradient
        — no autodiff, one kernel dispatch per call. This is the sampler
        hot path: `nuts.hmc_sample_batched(value_and_grad_fn=...)` calls
        it once per leapfrog step for all chains at once, entirely
        on-device. Out-of-grid or neighborless points get logp = -inf and
        zero gradient (the reference's recoverable SurfaceSdfError,
        surface.rs:10-14).

        The join coverage flag depends only on the grid's key structure
        (ascending, f32-exact) and the RANGE of clamped query keys —
        never on the actual query values, because queries are clamped to
        [-1, shape] before key assignment. It is therefore verified ONCE
        here eagerly, probing the two extreme grid corners (the largest
        and smallest clamped key any future query can produce), and the
        returned function is flag-free.
        """
        iso = self.surface_radius if isoradius is None else float(isoradius)
        jd, k_force = self._join, self.k_force
        interpret = jax.default_backend() == "cpu"
        if self.data.grid.n > _JOIN_MAX_ATOMS:
            # the windowed kernel's capacity flag depends on the query
            # VALUES (their key spread per chunk), so a flag-free function
            # cannot be certified by a one-time probe
            raise ValueError(
                f"hmc_vgrad_fn needs a VMEM-resident structure "
                f"(<= {_JOIN_MAX_ATOMS} atoms); use logdensity_fn or "
                "evaluate/hmc_gradient (windowed kernel with per-call "
                "coverage flags) for larger structures"
            )

        dtype = self.data.grid.sorted_pos.dtype
        corner_hi = (jd.origin + (jd.shape + 2) * jd.cutoff).astype(dtype)
        corner_lo = (jd.origin - 2.0 * jd.cutoff).astype(dtype)
        probe = jnp.concatenate([
            jnp.broadcast_to(corner_hi, (4, 3)),
            jnp.broadcast_to(corner_lo, (4, 3)),
        ])
        _, _, _, ok = _sdf_join_batch(jd, probe, interpret=interpret)
        if not bool(ok):
            raise RuntimeError(
                "join kernel key preconditions fail for this grid "
                "(keys not f32-exact?) — use logdensity_fn instead"
            )

        def vgrad(q):
            v, g, valid, _ = _sdf_join_batch(jd, q, interpret=interpret)
            defined = valid & jnp.isfinite(v)
            pot = -k_force * (v - iso) ** 2
            logp = jnp.where(defined, pot, -jnp.inf)
            gpot = jnp.where(
                defined[:, None],
                (-2.0 * k_force) * (v - iso)[:, None] * g,
                0.0,
            )
            return logp, gpot

        return vgrad


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


@partial(jax.jit, static_argnames=("CB", "MAXJ", "interpret"))
def _sdf_join_batch(jd: _JoinData, points, CB: int = 8,
                    MAXJ: int | None = None, interpret: bool = False):
    """Batched SDF value + analytic gradient via the fused join kernel.

    Returns (vals (Q,), grads (Q, 3), valid (Q,), ok). Queries run
    through the shared join preamble (`ops.join.query_join_reduce`:
    key-assign, sort, kernel, sort-based unsort) with the SDF term, and
    the 12 accumulated sums close over value and gradient:
        sigma = S2/S3, val = -sigma*ln(S1)
        grad  = ln(S1)*(A2*S3 - S2*A3)/S3^2 + sigma*A1/S1
    (the derivative of `_sdf_from_neighbors` with nabla S1 = -A1 etc.).
    """
    from ..ops.join import query_join_reduce
    from ..ops.sdf_join import NACC, sdf_term

    sums, valid, ok = query_join_reduce(
        points, jd.origin, jd.shape, jd.strides, jd.cutoff,
        jd.pplanes, jd.pkeys,
        term=sdf_term, n_out=NACC, CB=CB, MAXJ=MAXJ, interpret=interpret,
    )
    S1, S2, S3 = sums[:, 0], sums[:, 1], sums[:, 2]
    A1, A2, A3 = sums[:, 3:6], sums[:, 6:9], sums[:, 9:12]
    sigma = S2 / S3
    lnS1 = jnp.log(S1)
    vals = -sigma * lnS1
    grads = (
        lnS1[:, None] * (A2 * S3[:, None] - S2[:, None] * A3)
        / (S3 * S3)[:, None]
        + (sigma / S1)[:, None] * A1
    )
    return vals, grads, valid, ok


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
