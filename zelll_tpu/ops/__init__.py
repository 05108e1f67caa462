"""Fused interaction kernels (XLA + Pallas)."""

from .autodiff import gfn_from_term, make_pair_potential
from .columns import column_lj_energy, column_lj_forces, column_pair_sum
from .fused import (
    auto_lj_energy,
    fused_count_pairs,
    fused_lj_energy,
    fused_lj_rebuild_energy,
    fused_pair_sum,
)
from .lj import lj, lj_energy, lj_force_factor, lj_forces
from .pbc import (
    md_step_pbc,
    pbc_count_pairs,
    pbc_extend,
    pbc_lj_energy,
    pbc_lj_forces,
    pbc_pair_sum,
    suggest_pbc_capacity,
    wrap_positions,
)
from .rdf import pair_distance_histogram, rdf
from .tile_pairs import (
    tile_count_pairs,
    tile_lj_energy,
    tile_pair_forces,
    tile_pair_reduce,
)
from .pallas_pairs import (
    count_term,
    lag_coverage_ok,
    lj_term,
    pair_lag_forces,
    pair_lag_per_particle,
    pair_lag_reduce,
    split_f64,
    suggest_lag,
)

__all__ = [
    "auto_lj_energy",
    "make_pair_potential",
    "gfn_from_term",
    "tile_pair_reduce",
    "tile_lj_energy",
    "tile_count_pairs",
    "tile_pair_forces",
    "lj",
    "lj_energy",
    "lj_force_factor",
    "lj_forces",
    "fused_pair_sum",
    "fused_lj_energy",
    "fused_count_pairs",
    "fused_lj_rebuild_energy",
    "column_pair_sum",
    "column_lj_energy",
    "column_lj_forces",
    "pair_lag_reduce",
    "pair_lag_forces",
    "pair_lag_per_particle",
    "lag_coverage_ok",
    "suggest_lag",
    "split_f64",
    "lj_term",
    "count_term",
    "pair_distance_histogram",
    "rdf",
    "pbc_pair_sum",
    "pbc_lj_energy",
    "pbc_count_pairs",
    "pbc_lj_forces",
    "pbc_extend",
    "md_step_pbc",
    "wrap_positions",
    "suggest_pbc_capacity",
]
