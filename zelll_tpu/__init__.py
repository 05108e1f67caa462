"""zelll_tpu: a TPU-native cell-lists framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
`microscopic-image-analysis/zelll` (a Rust cell-lists library): linear-time
enumeration of particle pairs within a cutoff over a sparse spatial grid,
point neighborhood queries, rebuild loops for simulation, plus the
downstream workloads (Lennard-Jones benchmarks, protein-surface sampling).

Layers:
  core/      functional, jit-pure geometry + binning + pair enumeration
  ops/       fused interaction kernels (XLA + Pallas)
  parallel/  multi-chip spatial sharding and halo exchange
  models/    end-to-end workloads (LJ MD, smooth-distance-field sampling)
  utils/     data generation, PDB I/O, profiling
  api        the user-facing CellGrid class mirroring the reference Python API
"""

from .api import CellGrid
from .config import ZelllConfig
from .core import (
    Aabb,
    CellGridData,
    GridInfo,
    build,
    count_pairs,
    generate_pointcloud,
    materialize_pairs,
    pair_forces,
    pair_sum,
    query_neighbors,
    rebuild,
)

__version__ = "0.1.0"
