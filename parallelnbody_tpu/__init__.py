"""parallelnbody_tpu — a TPU-native N-body simulation framework.

A from-scratch JAX / XLA / Pallas / pjit re-design of the capabilities of the
reference ParallelNbody project (UE4 CPU Barnes-Hut octree N-body sim,
reference: Source/NBody/OctreeSearch.h, OctreeSearch.cpp):

  * SoA particle state (positions / velocities / masses) as jnp arrays
    (replacing reference FParticle AoS, OctreeSearch.h:8-18)
  * softened direct-sum gravity as a VMEM-tiled Pallas kernel
  * Barnes-Hut rebuilt as Morton sort + linear octree + vectorized theta-MAC
    (replacing the recursive pointer octree, OctreeSearch.h:21-109)
  * symplectic integrators (leapfrog KDK / semi-implicit Euler compat profile)
    fused into one jitted step (replacing the per-frame Tick, OctreeSearch.cpp:21-34)
  * multi-chip scaling: particles sharded over a jax.sharding.Mesh with a
    ppermute ring all-pairs schedule over ICI
  * snapshot/trajectory export for an external renderer (replacing UE4
    debug-draw, OctreeSearch.cpp:36-45)
"""

from parallelnbody_tpu.config import SimConfig, reference_compat_config
from parallelnbody_tpu.state import SimState
from parallelnbody_tpu.api import (Simulation, make_step, init_simulation,
                                   prepare_simulation, calibrate_budgets)

__version__ = "0.1.0"

__all__ = [
    "SimConfig",
    "SimState",
    "Simulation",
    "make_step",
    "init_simulation",
    "prepare_simulation",
    "calibrate_budgets",
    "reference_compat_config",
    "__version__",
]
