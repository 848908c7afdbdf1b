"""Snapshot / checkpoint / trajectory IO tests."""

import json

import jax
import numpy as np

from parallelnbody_tpu.config import SimConfig
from parallelnbody_tpu.api import init_simulation, make_step, make_run
from parallelnbody_tpu.utils.io import (
    save_snapshot, load_snapshot, save_checkpoint, load_checkpoint,
    latest_checkpoint, TrajectoryWriter,
)

CFG = SimConfig(n=128, ic="plummer", dt=1e-3, softening=0.02, force="direct",
                dtype="float64")


def test_snapshot_roundtrip(tmp_path):
    state = init_simulation(CFG)
    state = make_step(CFG)(state)
    p = save_snapshot(tmp_path / "s.npz", state)
    loaded = load_snapshot(p)
    for a, b in zip(state[:-1], loaded[:-1]):  # all but key
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_resume_bit_identical(tmp_path):
    """Resume from checkpoint == never stopping (determinism, SURVEY.md §5)."""
    state = init_simulation(CFG)
    step = make_step(CFG)

    # 10 continuous steps
    ref = state
    for _ in range(10):
        ref = step(ref)

    # 5 steps, checkpoint, load, 5 more
    s = state
    for _ in range(5):
        s = step(s)
    save_checkpoint(tmp_path, s, CFG)
    ckpt = latest_checkpoint(tmp_path)
    assert ckpt is not None
    s2, cfg2 = load_checkpoint(ckpt)
    assert cfg2 == CFG
    for _ in range(5):
        s2 = step(s2)

    np.testing.assert_array_equal(np.asarray(ref.pos), np.asarray(s2.pos))
    np.testing.assert_array_equal(np.asarray(ref.vel), np.asarray(s2.vel))
    assert int(s2.step) == 10


def test_trajectory_writer(tmp_path):
    state = init_simulation(CFG)
    step = make_step(CFG)
    w = TrajectoryWriter(tmp_path / "traj", CFG)
    for _ in range(3):
        state = step(state)
        w.append(state)
    manifest = json.loads((tmp_path / "traj" / "manifest.json").read_text())
    assert len(manifest["frames"]) == 3
    assert manifest["frames"][0]["step"] == 1
    with np.load(tmp_path / "traj" / manifest["frames"][-1]["file"]) as z:
        assert z["pos"].shape == (128, 3)
        assert z["mass"].shape == (128,)


def test_trajectory_writer_appends_on_resume(tmp_path):
    """A second writer on the same dir extends the manifest instead of
    truncating it (ADVICE r1), dropping only replayed-over frames."""
    state = init_simulation(CFG)
    step = make_step(CFG)
    w = TrajectoryWriter(tmp_path / "traj", CFG)
    for _ in range(3):
        state = step(state)
        w.append(state)          # steps 1, 2, 3

    resumed = TrajectoryWriter(tmp_path / "traj", CFG)
    assert [f["step"] for f in resumed.frames] == [1, 2, 3]
    # Re-run from step 2: frame 3 is replayed-over and must be dropped.
    state3 = state
    resumed.append(state3._replace(step=state3.step * 0 + 3))
    state4 = step(state3)._replace()
    resumed.append(state4._replace(step=state4.step * 0 + 4))
    manifest = json.loads((tmp_path / "traj" / "manifest.json").read_text())
    assert [f["step"] for f in manifest["frames"]] == [1, 2, 3, 4]
