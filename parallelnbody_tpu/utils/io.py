"""Snapshot / trajectory / checkpoint IO.

The reference's only "output" is per-frame debug-draw of particle positions
(DrawOctreeBoxes, OctreeSearch.cpp:36-45) and its only persistence is none —
state dies with the actor (CleanParticles, .cpp:91-97). Here:

  * Snapshots: npz files of the SoA state (positions/velocities/masses/...)
    — the renderer-bridge format an external UE4-style viewer replays
    (BASELINE.json config 5 "trajectory snapshot export").
  * Checkpoints: snapshot + config + PRNG key; a run restarted from a
    checkpoint is bit-identical to one that never stopped (tested).
  * TrajectoryWriter: rolling snapshot series with a JSON manifest.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

import jax
import numpy as np

from parallelnbody_tpu.config import SimConfig
from parallelnbody_tpu.state import SimState, make_state


def _state_to_arrays(state: SimState) -> dict:
    out = {}
    for name, val in state._asdict().items():
        if name == "key":
            # typed PRNG keys aren't directly serializable; store raw data
            out["key"] = np.asarray(jax.random.key_data(val))
        else:
            out[name] = np.asarray(jax.device_get(val))
    return out


def save_snapshot(path, state: SimState, extra: dict | None = None) -> Path:
    """Write one snapshot as .npz. Returns the path."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    arrays = _state_to_arrays(state)
    if extra:
        arrays.update({f"extra_{k}": np.asarray(v) for k, v in extra.items()})
    with open(path, "wb") as f:
        np.savez_compressed(f, **arrays)
    return path


def load_snapshot(path) -> SimState:
    with np.load(path) as z:
        key = jax.random.wrap_key_data(jax.numpy.asarray(z["key"]))
        state = make_state(z["pos"], z["vel"], z["mass"], key=key,
                           dtype=z["pos"].dtype)
        return state._replace(
            acc=jax.numpy.asarray(z["acc"]),
            pot=jax.numpy.asarray(z["pot"]),
            time=jax.numpy.asarray(z["time"]),
            step=jax.numpy.asarray(z["step"]),
        )


# ----------------------------------------------------------------- checkpoint
def save_checkpoint(ckpt_dir, state: SimState, cfg: SimConfig) -> Path:
    """Checkpoint = snapshot + config, named by step."""
    ckpt_dir = Path(ckpt_dir)
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    step = int(jax.device_get(state.step))
    path = ckpt_dir / f"ckpt_{step:010d}.npz"
    save_snapshot(path, state)
    (ckpt_dir / f"ckpt_{step:010d}.json").write_text(cfg.to_json())
    return path


def latest_checkpoint(ckpt_dir) -> Path | None:
    ckpt_dir = Path(ckpt_dir)
    if not ckpt_dir.is_dir():
        return None
    ckpts = sorted(ckpt_dir.glob("ckpt_*.npz"))
    return ckpts[-1] if ckpts else None


def load_checkpoint(path) -> tuple[SimState, SimConfig]:
    path = Path(path)
    state = load_snapshot(path)
    cfg = SimConfig.from_json(path.with_suffix(".json").read_text())
    return state, cfg


# ----------------------------------------------------------------- trajectory
class TrajectoryWriter:
    """Rolling series of snapshots + manifest.json, for the external renderer.

    Layout: <dir>/manifest.json, <dir>/snap_<step>.npz. The manifest lists
    frames in order with sim time, so a viewer can replay positions exactly
    as the reference's per-frame debug-draw did (OctreeSearch.cpp:41).
    """

    def __init__(self, directory, cfg: SimConfig | None = None,
                 positions_only: bool = True):
        self.dir = Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.positions_only = positions_only
        self.frames: list[dict] = []
        self._cfg = cfg
        # A resumed run pointing at an existing snapshot dir appends to the
        # replay sequence instead of truncating it (frames past the resume
        # step are dropped: the rerun overwrites them).
        manifest = self.dir / "manifest.json"
        if manifest.is_file():
            try:
                self.frames = json.loads(manifest.read_text()).get("frames", [])
            except (json.JSONDecodeError, OSError):
                self.frames = []

    def append(self, state: SimState) -> Path:
        step = int(jax.device_get(state.step))
        self.frames = [f for f in self.frames if f["step"] < step]
        return self._append(state, step)

    def _append(self, state: SimState, step: int) -> Path:
        t = float(jax.device_get(state.time))
        path = self.dir / f"snap_{step:010d}.npz"
        if self.positions_only:
            arrays = {
                "pos": np.asarray(jax.device_get(state.pos)),
                "mass": np.asarray(jax.device_get(state.mass)),
            }
            with open(path, "wb") as f:
                np.savez_compressed(f, **arrays)
        else:
            save_snapshot(path, state)
        self.frames.append({"step": step, "time": t, "file": path.name})
        self._write_manifest()
        return path

    def _write_manifest(self):
        manifest = {
            "frames": self.frames,
            "config": json.loads(self._cfg.to_json()) if self._cfg else None,
        }
        (self.dir / "manifest.json").write_text(json.dumps(manifest, indent=2))
