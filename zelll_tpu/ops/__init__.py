"""Fused interaction kernels (XLA + Pallas)."""

from .lj import lj, lj_energy, lj_force_factor, lj_forces

__all__ = ["lj", "lj_energy", "lj_force_factor", "lj_forces"]
