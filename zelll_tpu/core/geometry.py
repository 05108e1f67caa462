"""Geometry primitives: axis-aligned bounding boxes, grid geometry, stencils.

TPU-native re-design of the reference's L1 geometry layer
(reference: zelll `src/cellgrid/util.rs`, `src/cellgrid/flatindex.rs`).
Everything here is pure `jnp` array code, jit-friendly, shape-polymorphic in
the spatial dimension N (static) and dtype-polymorphic (f32/f64).

Key semantics carried over from the reference (so flat cell keys, stencil
offsets and unit-test golden values transfer unchanged):

* cell edge length == cutoff; ``shape = floor((sup - inf)/cutoff) + 1``
  (util.rs:198)
* strides are computed with **+4 padding per axis** — two implicit padding
  layers around the grid — so the 3^N-1 relative neighbor offsets are unique
  integers and no helical wraparound can occur for cells up to one layer
  outside the box (util.rs:201-212)
* flat cell key == ``floor((p - origin)/cutoff) . strides`` with no bounds
  check (util.rs:291-297)
* the relative stencil is the lexicographic cartesian product of
  ``(-1, 0, 1)^N`` with the center removed (flatindex.rs:55-65); the
  *half-space* stencil is its first half (iters.rs:58-63), which is valid
  because the product order makes the sequence negation-symmetric.
"""

from __future__ import annotations

import dataclasses
import itertools
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "Aabb",
    "GridInfo",
    "aabb_from_positions",
    "rel_offsets",
    "full_stencil",
    "half_stencil",
    "generate_pointcloud",
    "key_window",
]

# Sentinel flat key used for padded / invalid particles. Chosen so that
# sentinel keys sort after every real key (real keys are < 2^31 - 1 by the
# i32 particle-count cap mirrored from flatindex.rs:87).
SENTINEL_KEY = np.int32(np.iinfo(np.int32).max)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Aabb:
    """Axis-aligned bounding box described by componentwise infimum/supremum.

    Mirrors reference `Aabb` (util.rs:21-70): computed by a fold (here: a
    masked min/max reduction) over particle coordinates.
    """

    inf: jax.Array  # (N,)
    sup: jax.Array  # (N,)

    @property
    def dim(self) -> int:
        return self.inf.shape[-1]


def aabb_from_positions(positions: jax.Array, valid: jax.Array | None = None) -> Aabb:
    """Componentwise min/max over ``positions`` of shape (n, N).

    ``valid`` optionally masks out padding rows. With zero particles the box
    degenerates to the origin (reference folds from ``[0; N]`` in that case,
    util.rs:38-41).
    """
    n = positions.shape[0]
    if n == 0:
        z = jnp.zeros((positions.shape[1],), dtype=positions.dtype)
        return Aabb(inf=z, sup=z)
    if valid is None:
        return Aabb(inf=jnp.min(positions, axis=0), sup=jnp.max(positions, axis=0))
    big = jnp.asarray(jnp.finfo(positions.dtype).max, positions.dtype)
    v = valid[:, None]
    inf = jnp.min(jnp.where(v, positions, big), axis=0)
    sup = jnp.max(jnp.where(v, positions, -big), axis=0)
    any_valid = jnp.any(valid)
    zero = jnp.zeros_like(inf)
    return Aabb(inf=jnp.where(any_valid, inf, zero), sup=jnp.where(any_valid, sup, zero))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GridInfo:
    """Grid geometry: origin, cutoff, integer shape and padded strides.

    All fields are (traced) arrays so a `GridInfo` can be produced inside a
    jitted rebuild step from data-dependent bounding boxes. Mirrors reference
    `GridInfo` (util.rs:82-298).

    Runnable contract (executed by ``tests/test_doctests.py``; golden
    values transfer from the reference unit test, util.rs:342-431 —
    shape [3, 3, 3] gets +4-padded strides [1, 7, 49]):

    >>> import numpy as np
    >>> import jax.numpy as jnp
    >>> aabb = Aabb(jnp.zeros(3), jnp.asarray([2.5, 2.5, 2.5]))
    >>> info = GridInfo.create(aabb, 1.0)
    >>> np.asarray(info.shape).tolist()
    [3, 3, 3]
    >>> np.asarray(info.strides).tolist()
    [1, 7, 49]
    >>> int(info.flat_cell_index(jnp.asarray([1.2, 0.1, 2.3])))  # 1 + 0 + 2*49
    99
    """

    aabb: Aabb
    cutoff: jax.Array  # scalar
    shape: jax.Array  # (N,) int32
    strides: jax.Array  # (N,) int32

    @property
    def dim(self) -> int:
        return self.shape.shape[-1]

    @property
    def origin(self) -> jax.Array:
        return self.aabb.inf

    @classmethod
    def create(cls, aabb: Aabb, cutoff, auto_order: bool = False) -> "GridInfo":
        """Build grid geometry from a bounding box and a cutoff.

        ``shape[i] = floor((sup - inf)/cutoff) + 1`` and strides are the
        exclusive cumulative product of ``shape + 4`` (axis 0 fastest),
        mirroring util.rs:191-220 exactly: for shape (3,3,3) the strides are
        (1, 7, 49).

        ``auto_order=True`` assigns strides in ascending order of cell
        count instead of axis order (largest axis gets the largest
        stride), so the stencil key window ``key_window(strides)`` — which
        the lag/tile kernels' cost scales with — depends on the two
        SMALLEST box extents regardless of how the box happens to be
        oriented. An x-elongated box then keys exactly like the same box
        elongated along z. ``strides`` stays a per-axis vector (axis a's
        key contribution is ``idx[a] * strides[a]``), so every consumer
        that dots cell indices with strides is unaffected; consumers that
        assume ascending stride VALUES must sort them first (the key
        window and `segments.segment_bands` do).
        """
        cutoff = jnp.asarray(cutoff, aabb.inf.dtype)
        extent = (aabb.sup - aabb.inf) / cutoff
        shape = jnp.floor(extent).astype(jnp.int32) + 1
        if auto_order:
            perm = jnp.argsort(shape)  # stable: ties keep axis order
            padded = shape[perm] + 4
        else:
            padded = shape + 4
        # exclusive cumprod: strides = [1, p0, p0*p1, ...]
        strides = jnp.concatenate(
            [jnp.ones((1,), jnp.int32), jnp.cumprod(padded[:-1], dtype=jnp.int32)]
        )
        if auto_order:
            strides = jnp.zeros_like(strides).at[perm].set(strides)
        return cls(aabb=aabb, cutoff=cutoff, shape=shape, strides=strides)

    # -- index math ---------------------------------------------------------

    def cell_index(self, coords: jax.Array) -> jax.Array:
        """Integer cell coordinates of (.., N) points (util.rs:229-247).

        No bounds check (the panicking behavior of the reference maps to
        `try_cell_index`'s validity mask here).
        """
        return jnp.floor((coords - self.origin) / self.cutoff).astype(jnp.int32)

    def try_cell_index(self, coords: jax.Array) -> tuple[jax.Array, jax.Array]:
        """Cell coordinates plus validity mask.

        Valid iff every component is within ``[-1, shape]`` — one implicit
        padding layer around the box may be queried (util.rs:245-256).
        """
        idx = self.cell_index(coords)
        ok = jnp.all((idx >= -1) & (idx <= self.shape), axis=-1)
        return idx, ok

    def flatten_index(self, idx: jax.Array) -> jax.Array:
        """Dot with strides: (.., N) int -> (..,) flat key (util.rs:171-176).

        Unrolled per axis: XLA:TPU lowers a broadcast-multiply + minor-dim
        reduce against a *traced* strides vector pathologically (~800x slower
        than this form, measured on v5e).
        """
        total = idx[..., 0] * self.strides[0]
        for a in range(1, self.dim):
            total = total + idx[..., a] * self.strides[a]
        return total

    def flat_cell_index(self, coords: jax.Array) -> jax.Array:
        """Direct coordinates -> flat key, no bounds check (util.rs:291-297)."""
        return self.flatten_index(self.cell_index(coords))


def key_window(strides, reach=None) -> jax.Array:
    """Max |flat key difference| over the rank-1 stencil: sum(strides).

    Every cutoff pair sits within +/-1 cells per axis, so its key
    difference is bounded by ``sum(strides)`` for ANY per-axis stride
    assignment. For the default axis-ordered strides (strides[0] == 1)
    this equals the historical ``sum(strides[1:]) + 1``; the sum form is
    additionally correct for `GridInfo.create(auto_order=True)` strides,
    where the 1-stride need not sit at index 0.

    ``reach`` (per-axis int, default 1) widens the per-axis cell
    distance: minimum-image periodic axes treat EVERY cell along the
    axis as adjacent (wrap adjacency), so their reach is the occupied
    cell span (``ceil(box/cutoff) - 1``) instead of 1 — the window
    becomes ``sum(strides * reach)``. For a narrow axis (a few cells)
    on a minor stride this widens the window by only a few strides.
    """
    strides = jnp.asarray(strides)
    if reach is None:
        return jnp.sum(strides)
    return jnp.sum(strides * jnp.asarray(reach, strides.dtype))


# -- stencils ----------------------------------------------------------------


def rel_offsets(dim: int) -> np.ndarray:
    """Static (3^N - 1, N) int32 array of relative neighbor cell coordinates.

    Lexicographic order of the cartesian product of (-1, 0, 1) per axis with
    the all-zero center removed — matches itertools' multi_cartesian_product
    order used in flatindex.rs:55-65. The sequence is negation-symmetric:
    entry k == -entry[-1-k], which is what makes the half-space trick valid.
    """
    offs = [o for o in itertools.product((-1, 0, 1), repeat=dim) if any(o)]
    return np.asarray(offs, dtype=np.int32)


def full_stencil(info: GridInfo) -> jax.Array:
    """(3^N - 1,) flat relative neighbor keys (flatindex.rs:55-65).

    For the 8x8-padded 2D board of the reference unit test this yields
    [-9, -1, 7, -8, 8, -7, 1, 9].
    """
    rel = jnp.asarray(rel_offsets(info.dim))
    return rel @ info.strides


def half_stencil(info: GridInfo) -> jax.Array:
    """First half of the full stencil — one of each +/- offset pair
    (iters.rs:58-63)."""
    full = full_stencil(info)
    return full[: full.shape[0] // 2]


# -- test fixture -------------------------------------------------------------


def generate_pointcloud(shape, cutoff: float, origin) -> np.ndarray:
    """Deterministic chessboard point cloud (util.rs:309-340).

    Cells with even linear index (x+y+z even) contain two points: one at the
    cell origin, one at the cell center. Returns (n, 3) float64. The closed
    form occupancy makes pair counts exactly predictable in tests.
    """
    pts = []
    for x in range(shape[0]):
        for y in range(shape[1]):
            for z in range(shape[2]):
                if (x + y + z) % 2 == 0:
                    pts.append(
                        [
                            cutoff * x + origin[0],
                            cutoff * y + origin[1],
                            cutoff * z + origin[2],
                        ]
                    )
                    pts.append(
                        [
                            cutoff * x + (cutoff * 0.5 + origin[0]),
                            cutoff * y + (cutoff * 0.5 + origin[1]),
                            cutoff * z + (cutoff * 0.5 + origin[2]),
                        ]
                    )
    return np.asarray(pts, dtype=np.float64).reshape(-1, 3)
