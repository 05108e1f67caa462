"""Functional core: geometry, binning, grid state, pair enumeration."""

from .geometry import (
    Aabb,
    GridInfo,
    aabb_from_positions,
    full_stencil,
    generate_pointcloud,
    half_stencil,
    rel_offsets,
)
from .binning import Bins, build_bins, compute_keys
from .dense import DenseTable, build_dense_table, dense_rows_for_keys
from .grid import CellGridData, build, rebuild
from .pairs import (
    PairBlock,
    count_pairs,
    materialize_pairs,
    pair_forces,
    pair_sum,
    query_neighbors,
    scan_cell_chunks,
)

__all__ = [
    "Aabb",
    "GridInfo",
    "aabb_from_positions",
    "full_stencil",
    "half_stencil",
    "rel_offsets",
    "generate_pointcloud",
    "Bins",
    "build_bins",
    "compute_keys",
    "DenseTable",
    "build_dense_table",
    "dense_rows_for_keys",
    "CellGridData",
    "build",
    "rebuild",
    "PairBlock",
    "scan_cell_chunks",
    "pair_sum",
    "pair_forces",
    "count_pairs",
    "materialize_pairs",
    "query_neighbors",
]
