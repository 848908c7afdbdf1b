"""Debug checks, renderer, metrics tests."""

import json

import jax.numpy as jnp
import numpy as np
import pytest

from parallelnbody_tpu.config import SimConfig
from parallelnbody_tpu.api import init_simulation, make_step
from parallelnbody_tpu.utils.debug import (
    validate_state, StateValidationError, debug_nans)
from parallelnbody_tpu.utils.render import render_ppm, export_ply, render_trajectory
from parallelnbody_tpu.utils.io import TrajectoryWriter
from parallelnbody_tpu.utils.metrics import MetricsLogger

CFG = SimConfig(n=128, ic="plummer", softening=0.02, force="direct")


def test_validate_state_ok():
    validate_state(init_simulation(CFG))


def test_validate_state_catches_nan():
    state = init_simulation(CFG)
    bad = state._replace(pos=state.pos.at[3, 1].set(jnp.nan))
    with pytest.raises(StateValidationError, match="non-finite"):
        validate_state(bad)


def test_debug_nans_context():
    import jax

    with debug_nans(True):
        assert jax.config.jax_debug_nans
    assert not jax.config.jax_debug_nans


def test_render_ppm(tmp_path):
    state = init_simulation(CFG)
    img = render_ppm(np.asarray(state.pos), np.asarray(state.mass),
                     size=64, path=tmp_path / "f.ppm")
    assert img.shape == (64, 64, 3)
    assert img.max() > 0
    data = (tmp_path / "f.ppm").read_bytes()
    assert data.startswith(b"P6 64 64 255\n")
    assert len(data) == len(b"P6 64 64 255\n") + 64 * 64 * 3


def test_export_ply(tmp_path):
    state = init_simulation(CFG)
    p = export_ply(tmp_path / "p.ply", np.asarray(state.pos),
                   np.asarray(state.mass))
    lines = p.read_text().splitlines()
    assert lines[0] == "ply"
    assert f"element vertex {CFG.n}" in lines[2]
    assert len(lines) > CFG.n


def test_render_trajectory_cli(tmp_path, capsys):
    state = init_simulation(CFG)
    step = make_step(CFG)
    w = TrajectoryWriter(tmp_path / "traj", CFG)
    for _ in range(2):
        state = step(state)
        w.append(state)
    from parallelnbody_tpu.cli import main

    assert main(["render", str(tmp_path / "traj"), "--size", "32"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["frames_rendered"] == 2


def test_metrics_logger(tmp_path):
    with MetricsLogger(tmp_path / "m.jsonl") as m:
        m.log({"step": 1, "energy": -0.25})
        m.log({"step": 2, "energy": -0.26})
    lines = [json.loads(l) for l in (tmp_path / "m.jsonl").read_text().splitlines()]
    assert lines[1]["step"] == 2 and "wall_time" in lines[0]


def test_compile_cache_config_wiring(tmp_path):
    """cfg.compile_cache_dir routes to jax's persistent compilation cache
    (idempotently); '' stays disabled. The 22x cold-process win is a TPU
    measurement (utils/cache.py docstring) — here we pin the wiring."""
    import jax

    from parallelnbody_tpu.utils.cache import enable_compile_cache
    from parallelnbody_tpu.config import SimConfig
    from parallelnbody_tpu.api import init_simulation, make_step

    d = str(tmp_path / "xla_cache")
    cfg = SimConfig(n=64, force="direct", compile_cache_dir=d)
    make_step(cfg)(init_simulation(cfg))
    assert jax.config.jax_compilation_cache_dir == d
    enable_compile_cache(d)  # idempotent re-enable
    assert jax.config.jax_compilation_cache_dir == d
    # config round-trips through JSON like every other field
    assert SimConfig.from_json(cfg.to_json()).compile_cache_dir == d
