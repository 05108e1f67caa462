"""Dense cell-table backend: the second grid-storage axis.

The reference sketches a sparse-vs-dense storage design axis with a
`GridStorage` trait and an experimental `DenseMap` (a ``Vec<Option<(K,V)>>``
indexed by flat key, zelll `src/cellgrid/storage.rs:172-302`) — but never
wires it into `CellGrid` (which hardcodes hashbrown,
`src/cellgrid.rs:120`). Here the axis is real and wired: a `DenseTable`
maps flat cell keys *directly* to occupied-cell-table rows, replacing the
per-stencil-offset binary search (`pairs._neighbor_rows`, the hashmap-
lookup analogue) with one O(1) gather per neighbor cell.

Trade-off, same as the reference intended: O(prod(padded_shape)) memory
against O(1) lookups — only sensible for compact boxes where the key space
is bounded (a cube at reference density has ~n/10 cells; the headline
thin-box bench would need an ever-growing table and must stay sparse).
Static shapes + coverage flag: ``capacity`` is a static parameter and
`DenseTable.fits` is False iff some occupied cell's key falls outside the
table — results from a non-fitting table must not be trusted (the
never-silently-drop invariant); re-jit with a larger capacity.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from .binning import Bins
from .geometry import SENTINEL_KEY

__all__ = ["DenseTable", "build_dense_table", "dense_rows_for_keys"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DenseTable:
    """Flat-key-indexed view of the occupied-cell table.

    ``rows[k]`` is the row of cell key ``k`` in the `Bins` cell table, or
    ``max_cells`` when cell ``k`` is empty / out of table range. ``fits``
    is the coverage flag: True iff every occupied cell key landed inside
    ``[0, capacity)``.
    """

    rows: jax.Array  # (capacity,) int32
    fits: jax.Array  # scalar bool

    @property
    def capacity(self) -> int:
        return self.rows.shape[0]


def build_dense_table(bins: Bins, capacity: int) -> DenseTable:
    """Invert the occupied-cell table into a dense key-indexed array.

    One scatter of ``max_cells`` values (cell-table sized, never
    n-sized). Keys at or beyond ``capacity`` are dropped by scatter OOB
    semantics and reported through ``fits``.
    """
    mc = bins.max_cells
    real = bins.cell_keys != SENTINEL_KEY
    kmax = jnp.max(jnp.where(real, bins.cell_keys, -1))
    tgt = jnp.where(
        real & (bins.cell_keys >= 0) & (bins.cell_keys < capacity),
        bins.cell_keys,
        capacity,
    )
    rows = (
        jnp.full((capacity,), mc, jnp.int32)
        .at[tgt]
        .set(jnp.arange(mc, dtype=jnp.int32), mode="drop")
    )
    return DenseTable(rows=rows, fits=kmax < capacity)


def dense_rows_for_keys(table: DenseTable, qkeys: jax.Array, mc) -> jax.Array:
    """Cell-table rows for query keys: the O(1) replacement of the
    binary-search lookup. Out-of-range keys (including the negative keys a
    boundary cell's stencil produces) resolve to ``mc`` (empty)."""
    cap = table.capacity
    in_range = (qkeys >= 0) & (qkeys < cap)
    r = table.rows[jnp.clip(qkeys, 0, cap - 1)]
    return jnp.where(in_range, r, mc)
