"""Multi-chip parallelism: device meshes, ring all-pairs schedule, sharded step.

The reference has zero distributed code (SURVEY.md §2 checklist) — this package
is the TPU-native design: particles are sharded over a jax.sharding.Mesh axis
("ring"), and the O(N^2) interaction is computed with a ppermute ring of
(position, mass) source tiles over ICI — the ring-attention schedule with
acceleration as the reduction. XLA collectives only; no hand-written
networking.
"""

from parallelnbody_tpu.parallel.mesh import make_ring_mesh, shard_state, state_pspecs
from parallelnbody_tpu.parallel.ring import ring_accel
from parallelnbody_tpu.parallel.sharded import make_sharded_step, make_sharded_run
from parallelnbody_tpu.parallel.distributed import (
    dist_bh_accel, make_distributed_run)

__all__ = [
    "make_ring_mesh",
    "shard_state",
    "state_pspecs",
    "ring_accel",
    "make_sharded_step",
    "make_sharded_run",
    "dist_bh_accel",
    "make_distributed_run",
]
