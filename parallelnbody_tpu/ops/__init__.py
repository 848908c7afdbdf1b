"""Compute ops: force kernels, integrators, diagnostics, tree building."""

from parallelnbody_tpu.ops.direct import direct_accel, direct_accel_tile
from parallelnbody_tpu.ops.integrators import get_integrator
from parallelnbody_tpu.ops.energy import (
    kinetic_energy,
    potential_energy,
    total_energy,
    momentum,
    angular_momentum,
    diagnostics,
)

__all__ = [
    "direct_accel",
    "direct_accel_tile",
    "get_integrator",
    "kinetic_energy",
    "potential_energy",
    "total_energy",
    "momentum",
    "angular_momentum",
    "diagnostics",
]
