"""Example-config schema tests.

The shipped examples/ configs are the user-facing entry points (SURVEY.md
C20 — the reference ships its scene as a .umap level; here it is JSON).
They must stay loadable as the SimConfig schema evolves: r5 removed every
hand-tuned list budget from the single-chip examples when auto-calibration
landed (api.calibrate_budgets), and a renamed or deleted knob would
otherwise only be caught when a user hits `SimConfig(**data)` at runtime.
"""

import glob
import json
import os

import pytest

from parallelnbody_tpu.config import SimConfig
from parallelnbody_tpu.api import init_simulation, make_step

EXAMPLES = sorted(glob.glob(
    os.path.join(os.path.dirname(__file__), "..", "examples", "*.json")))


def test_examples_present():
    assert len(EXAMPLES) >= 10


@pytest.mark.parametrize("path", EXAMPLES, ids=os.path.basename)
def test_example_parses_as_simconfig(path):
    # SimConfig(**data) raises TypeError on any unknown/renamed field, so
    # this pins the examples to the live schema.
    cfg = SimConfig.from_json(open(path).read())
    assert cfg.n > 0
    assert cfg.dt > 0
    # Resolvers must accept every shipped operating point.
    assert cfg.resolve_bh_leaf_size() in (128, 256, 512)
    assert cfg.resolve_force(cfg.n) in (
        "direct", "direct_pallas", "barnes_hut")


@pytest.mark.parametrize("path", EXAMPLES, ids=os.path.basename)
def test_single_chip_examples_carry_no_hand_budgets(path):
    """r5 invariant: auto-calibration owns every single-chip budget.

    Distributed/sharded CLI paths skip the single-chip calibration pass
    (the measurement would not see the partitioned geometry), so examples
    with a device mesh may pin measured budgets; everything else must ship
    budget=0 (= calibrate from the actual t=0 geometry)."""
    data = json.loads(open(path).read())
    cfg = SimConfig.from_json(open(path).read())
    if cfg.n_devices > 1 or cfg.bh_distributed:
        return
    for field in ("bh_near_budget", "bh_far_budget", "bh_cand_budget",
                  "bh_cand2_budget", "bh_import_budget"):
        assert data.get(field, 0) == 0, (
            f"{os.path.basename(path)} pins {field}={data[field]}; "
            "single-chip examples must use auto budgets")


def test_smallest_example_runs_end_to_end():
    cfg = SimConfig.from_json(
        open(os.path.join(os.path.dirname(__file__), "..", "examples",
                          "plummer_4k.json")).read())
    state = init_simulation(cfg)
    out = make_step(cfg)(state)
    import jax
    assert float(jax.device_get(out.time)) > 0.0
