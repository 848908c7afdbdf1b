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


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Opt-in multi-host bootstrap: jax.distributed.initialize().

    After this, jax.devices() spans every process's chips and the mesh
    builders below place global meshes (SURVEY.md §5 distributed-backend row:
    XLA collectives over ICI within a slice and DCN across slices). With no
    arguments, coordinator/rank come from the TPU environment. Idempotent;
    single-process behavior is unchanged if never called. Untestable on this
    single-chip rig — exercised on real multi-host pods only."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:  # already initialized -> idempotent no-op
        if "already" not in str(e).lower():
            raise


def make_multislice_ring_mesh(ici: int, dcn: int, axis: str = RING_AXIS) -> Mesh:
    """1-D ring mesh over ici*dcn devices, ordered slice-major: consecutive
    ring positions are ICI neighbors inside a slice, so a full ppermute
    rotation crosses DCN only `dcn` times (once per slice boundary) instead
    of on every hop. Devices are grouped by their hardware slice
    (`device.slice_index` on multi-slice TPU; contiguous partition fallback
    elsewhere, which keeps this testable on the virtual CPU mesh)."""
    devs = jax.devices()
    need = ici * dcn
    if need > len(devs):
        raise ValueError(f"requested {need} devices, have {len(devs)}")
    groups: dict[int, list] = {}
    for d in devs:
        groups.setdefault(getattr(d, "slice_index", 0) or 0, []).append(d)
    if len(groups) >= dcn and all(len(g) >= ici for g in
                                  list(groups.values())[:dcn]):
        ordered = [d for k in sorted(groups)[:dcn]
                   for d in groups[k][:ici]]
    else:  # single-slice / CPU: contiguous pretend-slices
        ordered = devs[:need]
    return jax.make_mesh((need,), (axis,), devices=ordered)


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
