"""Initial-condition model families (scene generators).

The reference has exactly one scene: a uniform random slab with a heavy
central body (CreateSpacePoints, OctreeSearch.cpp:58-72), reproduced here as
`reference_slab`. The TPU build adds the standard astrophysical families used
by the BASELINE.md configs: Plummer sphere, Hernquist sphere, uniform
cube/sphere, cold-collapse sphere, rotating disk, and the two-Plummer galaxy
collision scene.

Every generator has the signature

    gen(key: jax.Array, cfg: SimConfig) -> (pos (N,3), vel (N,3), mass (N,))
"""

from parallelnbody_tpu.models.registry import get_ic, register_ic, IC_REGISTRY

# Importing registers the built-in families.
from parallelnbody_tpu.models import spheres as _spheres  # noqa: F401
from parallelnbody_tpu.models import disk as _disk  # noqa: F401
from parallelnbody_tpu.models import scenes as _scenes  # noqa: F401

__all__ = ["get_ic", "register_ic", "IC_REGISTRY"]
