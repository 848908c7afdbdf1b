"""Mesh construction and state sharding helpers."""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from parallelnbody_tpu.state import SimState

RING_AXIS = "ring"


def make_ring_mesh(n_devices: int | None = None, axis: str = RING_AXIS) -> Mesh:
    """1-D mesh over the first n devices; the all-pairs ring rides this axis.

    On a real TPU slice JAX orders devices so neighboring mesh positions are
    ICI neighbors for a 1-D mesh, which is exactly what the ppermute ring wants.
    """
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if n_devices > len(devs):
        raise ValueError(f"requested {n_devices} devices, have {len(devs)}")
    return jax.make_mesh((n_devices,), (axis,), devices=devs[:n_devices])


def state_pspecs(axis: str = RING_AXIS) -> SimState:
    """PartitionSpecs for a SimState: particle arrays sharded along the ring
    axis, scalars (time/step) and the PRNG key replicated."""
    return SimState(
        pos=P(axis), vel=P(axis), mass=P(axis), acc=P(axis), pot=P(axis),
        time=P(), step=P(), key=P(),
    )


def shard_state(state: SimState, mesh: Mesh, axis: str = RING_AXIS) -> SimState:
    """Place a (host or single-device) state onto the mesh, particle-sharded.

    Requires N divisible by the ring size (pad upstream if needed; the IC
    generators produce exact N, and configs choose N as a multiple of the
    mesh size)."""
    n = state.n
    n_dev = mesh.devices.size
    if n % n_dev:
        raise ValueError(f"N={n} not divisible by mesh size {n_dev}")
    specs = state_pspecs(axis)
    return jax.tree.map(
        lambda x, spec: jax.device_put(x, NamedSharding(mesh, spec)), state, specs
    )
