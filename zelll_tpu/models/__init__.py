"""End-to-end workloads: LJ molecular dynamics, smooth-distance-field
surface sampling (psssh), samplers."""

from .lj_md import MDState, md_run, md_step
from .sdf import ELEMENT_RADII, SmoothDistanceField
from .thermostats import (
    berendsen_box_mu,
    berendsen_rescale,
    kinetic_temperature,
    md_run_langevin,
    md_run_npt,
    ou_step,
)
