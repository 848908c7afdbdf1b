"""CLI tests (in-process via cli.main)."""

import json

import pytest

from parallelnbody_tpu.cli import main


def test_info(capsys):
    assert main(["info"]) == 0
    out = json.loads(capsys.readouterr().out)
    assert out["backend"] == "cpu"
    assert "config" in out


def test_run_plummer(capsys, tmp_path):
    rc = main([
        "run", "--n", "256", "--steps", "20", "--dt", "0.001",
        "--softening", "0.02", "--force", "direct", "--log-every", "10",
        "--metrics", str(tmp_path / "m.jsonl"), "--quiet",
        "--snapshot-every", "10", "--snapshot-dir", str(tmp_path / "snaps"),
    ])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["steps"] == 20
    assert abs(summary["energy_drift"]) < 1e-3
    lines = (tmp_path / "m.jsonl").read_text().strip().splitlines()
    assert len(lines) >= 2
    assert (tmp_path / "snaps" / "manifest.json").exists()


def test_run_compat_profile(capsys):
    rc = main(["run", "--compat", "--n", "64", "--steps", "5", "--quiet"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["steps"] == 5


def test_run_checkpoint_resume(capsys, tmp_path):
    common = [
        "run", "--n", "128", "--steps", "10", "--dt", "0.001",
        "--softening", "0.02", "--force", "direct", "--quiet",
        "--checkpoint-every", "5", "--checkpoint-dir", str(tmp_path / "ck"),
        "--dtype", "float64",
    ]
    assert main(common) == 0
    out1 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # Resume: picks up at step 10, runs 10 more
    assert main(common + ["--resume"]) == 0
    _ = capsys.readouterr()
    from parallelnbody_tpu.utils.io import latest_checkpoint, load_checkpoint

    state, _cfg = load_checkpoint(latest_checkpoint(tmp_path / "ck"))
    assert int(state.step) == 20


def test_resume_cli_overrides_win(capsys, tmp_path):
    """Explicit CLI flags override the checkpointed config on --resume
    (ADVICE r1: overrides were silently lost)."""
    common = [
        "run", "--n", "128", "--steps", "4", "--dt", "0.001",
        "--softening", "0.02", "--force", "direct", "--quiet",
        "--checkpoint-every", "4", "--checkpoint-dir", str(tmp_path / "ck"),
    ]
    assert main(common) == 0
    _ = capsys.readouterr()
    assert main(common + ["--resume", "--steps", "6", "--dt", "0.002"]) == 0
    _ = capsys.readouterr()
    from parallelnbody_tpu.utils.io import latest_checkpoint, load_checkpoint

    state, cfg = load_checkpoint(latest_checkpoint(tmp_path / "ck"))
    assert cfg.dt == 0.002          # CLI override survived the resume
    assert cfg.steps == 6


def test_auto_force_crossover():
    """force='auto' is scale-aware: Barnes-Hut above the measured crossover,
    direct below it (VERDICT r1 weak #7)."""
    from parallelnbody_tpu.config import SimConfig

    assert SimConfig(n=1024, force="auto").resolve_force("cpu") == "direct"
    big = SimConfig(n=SimConfig.AUTO_BH_CROSSOVER, force="auto")
    assert big.resolve_force("cpu") == "barnes_hut"
    assert big.resolve_force("tpu") == "barnes_hut"
    assert SimConfig(n=4096, force="auto").resolve_force("tpu") == "direct_pallas"


def test_bench_cmd(capsys):
    rc = main(["bench", "--n", "512", "--force", "direct", "--iters", "2",
               "--softening", "0.02"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["steps_per_sec"] > 0


def test_oracle_cmd(capsys):
    rc = main(["oracle", "--n", "128", "--steps", "100", "--dt", "0.001",
               "--softening", "0.05", "--force", "direct", "--trajectory"])
    out = json.loads(capsys.readouterr().out)
    assert rc == 0, out
    assert out["pass"] is True
    assert out["trajectory_rel_err"] < 0.01


def test_run_sharded(capsys, eight_devices):
    rc = main(["run", "--n", "256", "--steps", "10", "--dt", "0.001",
               "--softening", "0.02", "--force", "direct", "--devices", "8",
               "--quiet", "--dtype", "float64"])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["steps"] == 10
    assert abs(summary["energy_drift"]) < 1e-4
