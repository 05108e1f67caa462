"""Multi-chip spatial sharding: slab domain decomposition + halo exchange."""

from .domain import (
    make_mesh,
    make_sharded_potential,
    partition_by_slab,
    repartition,
    repartition_exchange,
    sharded_lj_energy,
    sharded_md_step,
    sharded_pair_hist,
    sharded_stress,
)
from .pencil import (
    make_pencil_mesh,
    partition_by_pencil,
    sharded_pencil_lj_energy,
    sharded_pencil_md_step,
)
from .pbc import (
    partition_by_slab_pbc,
    repartition_pbc,
    sharded_pbc_lj_energy,
    sharded_pbc_md_run,
    sharded_pbc_md_step,
    sharded_pbc_stress,
)

__all__ = [
    "make_mesh",
    "make_pencil_mesh",
    "partition_by_pencil",
    "sharded_pencil_lj_energy",
    "sharded_pencil_md_step",
    "make_sharded_potential",
    "partition_by_slab",
    "partition_by_slab_pbc",
    "repartition_pbc",
    "repartition",
    "repartition_exchange",
    "sharded_md_step",
    "sharded_lj_energy",
    "sharded_pair_hist",
    "sharded_pbc_lj_energy",
    "sharded_pbc_md_run",
    "sharded_pbc_md_step",
    "sharded_pbc_stress",
    "sharded_stress",
]
