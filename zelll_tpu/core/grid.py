"""Functional cell-grid state and (re)build pipeline.

The reference's `CellGrid` (zelll `src/cellgrid.rs:114-312`) is a mutable
struct {hashmap cells, flat particle storage, FlatIndex}. The TPU-native
equivalent is an immutable pytree `CellGridData` produced by a pure, jittable
`build` / `rebuild` function:

* `build(positions, cutoff)`       == `CellGrid::new` (cellgrid.rs:166-172)
* `rebuild(grid, positions, ...)`  == `CellGrid::rebuild_mut`
  (cellgrid.rs:264-312) including its fast path: when no particle changed
  cells (and the grid geometry is unchanged) the sort permutation and the
  occupied-cell table are reused and only the sorted coordinates are
  re-gathered — the analogue of the reference reusing hashmap topology when
  `FlatIndex::rebuild_mut` reports no change (flatindex.rs:113-153).

All shapes static; pad the particle array and pass `valid` to vary counts
without recompiling.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .binning import Bins, bin_and_sort, compute_keys
from .geometry import GridInfo, aabb_from_positions

__all__ = ["CellGridData", "build", "rebuild"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CellGridData:
    """Immutable cell-grid state.

    ``sorted_pos``/``sorted_ids`` are the flat contiguous particle storage
    grouped by cell — the analogue of the reference's `CellStorage` flat
    buffer (storage.rs:48-112) — with `bins.cell_starts`/`cell_counts` as the
    slice metadata (`CellSliceMeta`, storage.rs:117-167).
    """

    bins: Bins
    sorted_pos: jax.Array  # (n, N) positions grouped by cell
    sorted_ids: jax.Array  # (n,) original particle index per sorted slot

    @property
    def info(self) -> GridInfo:
        return self.bins.info

    @property
    def n(self) -> int:
        return self.sorted_pos.shape[0]

    @property
    def dim(self) -> int:
        return self.sorted_pos.shape[1]

    @property
    def num_cells(self) -> jax.Array:
        return self.bins.num_cells

    def unsort(self, per_slot: jax.Array) -> jax.Array:
        """Re-order a per-sorted-slot array back to input particle order."""
        out_shape = per_slot.shape
        inv = jnp.zeros((self.n,), jnp.int32).at[self.bins.perm].set(
            jnp.arange(self.n, dtype=jnp.int32)
        )
        return per_slot[inv].reshape(out_shape)


def build(
    positions: jax.Array,
    cutoff,
    *,
    max_cells: int | None = None,
    valid: jax.Array | None = None,
    info: GridInfo | None = None,
) -> CellGridData:
    """Construct a cell grid from (n, N) positions (cellgrid.rs:166-172)."""
    bins, sorted_pos = bin_and_sort(
        positions, cutoff, max_cells=max_cells, valid=valid, info=info
    )
    return CellGridData(bins=bins, sorted_pos=sorted_pos, sorted_ids=bins.perm)


def rebuild(
    grid: CellGridData,
    positions: jax.Array,
    cutoff=None,
    *,
    valid: jax.Array | None = None,
) -> CellGridData:
    """Rebuild from new positions, reusing sort order when no key changed.

    Cheap pass: recompute the bounding box, grid geometry and per-particle
    keys; if geometry and every key are unchanged, skip the sort and table
    scatter entirely (runtime-skipped via `lax.cond`), mirroring the
    reference's `rebuild_mut` fast path (cellgrid.rs:264-286).

    ``positions`` must have the same (static) shape as the grid's.
    """
    if cutoff is None:
        cutoff = grid.info.cutoff
    max_cells = grid.bins.max_cells

    aabb = aabb_from_positions(positions, valid)
    info = GridInfo.create(aabb, cutoff)
    new_keys = compute_keys(positions, info, valid)

    same_geom = (
        jnp.all(info.shape == grid.info.shape)
        & jnp.all(info.strides == grid.info.strides)
        & jnp.all(info.origin == grid.info.origin)
        & (info.cutoff == grid.info.cutoff)
    )
    unchanged = same_geom & jnp.all(new_keys == grid.bins.keys)

    def fast(_):
        # Same topology: reuse the occupied-cell table (the analogue of the
        # reference reusing hashmap topology); re-group only the coordinates.
        # On TPU the cheapest regrouping is another multi-operand sort by
        # the (unchanged) keys — a stable sort reproduces the same perm and
        # beats a row gather by ~3x at 1e7 particles (measured on v5e).
        b = grid.bins
        n, dim = positions.shape
        iota0 = jnp.arange(n, dtype=jnp.int32)
        cols = tuple(positions[:, a] for a in range(dim))
        out = jax.lax.sort((b.keys, *cols, iota0), num_keys=1, is_stable=True)
        sorted_pos = jnp.stack(out[1:-1], axis=-1)
        bins = Bins(
            info=info,
            keys=new_keys,
            perm=out[-1],
            sorted_keys=b.sorted_keys,
            cell_keys=b.cell_keys,
            cell_starts=b.cell_starts,
            cell_counts=b.cell_counts,
            num_cells=b.num_cells,
            num_valid=b.num_valid,
            overflow=b.overflow,
        )
        return CellGridData(bins=bins, sorted_pos=sorted_pos, sorted_ids=out[-1])

    def slow(_):
        bins, sorted_pos = bin_and_sort(
            positions, cutoff, max_cells=max_cells, valid=valid, info=info
        )
        return CellGridData(bins=bins, sorted_pos=sorted_pos, sorted_ids=bins.perm)

    return jax.lax.cond(unchanged, fast, slow, None)
