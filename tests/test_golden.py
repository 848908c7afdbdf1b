"""Golden trajectory test (SURVEY.md §4): a checked-in 64-body snapshot.

The golden file pins the exact float64 direct-sum leapfrog trajectory; any
change to force law, integrator ordering, or IC sampling shows up as a diff.
Regenerate (deliberately!) with:

    python tests/test_golden.py regenerate
"""

from pathlib import Path

import numpy as np

from parallelnbody_tpu.config import SimConfig
from parallelnbody_tpu.api import init_simulation, make_run

GOLDEN = Path(__file__).parent / "golden" / "plummer64_100steps.npz"
CFG = SimConfig(n=64, ic="plummer", dt=1e-3, softening=0.05,
                integrator="leapfrog", force="direct", dtype="float64",
                seed=42)


def _run():
    state = init_simulation(CFG)
    out = make_run(CFG, 100)(state)
    return np.asarray(out.pos), np.asarray(out.vel)


def test_golden_trajectory():
    assert GOLDEN.exists(), "golden file missing — run `python tests/test_golden.py regenerate`"
    pos, vel = _run()
    with np.load(GOLDEN) as z:
        np.testing.assert_allclose(pos, z["pos"], rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(vel, z["vel"], rtol=1e-10, atol=1e-12)


if __name__ == "__main__":
    import sys

    if len(sys.argv) > 1 and sys.argv[1] == "regenerate":
        GOLDEN.parent.mkdir(parents=True, exist_ok=True)
        pos, vel = _run()
        np.savez_compressed(GOLDEN, pos=pos, vel=vel)
        print(f"wrote {GOLDEN}")
