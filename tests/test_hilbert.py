"""Hilbert curve tests: bijectivity and the adjacency property."""

import jax.numpy as jnp
import numpy as np

from parallelnbody_tpu.ops.hilbert import hilbert_encode


def _grid_positions(bits):
    n = 1 << bits
    cells = np.stack(np.meshgrid(np.arange(n), np.arange(n), np.arange(n),
                                 indexing="ij"), axis=-1).reshape(-1, 3)
    # cell centers in [-1, 1]
    pos = (cells + 0.5) / n * 2.0 - 1.0
    return cells, jnp.asarray(pos, jnp.float32)


def test_bijection_small_grid():
    for bits in (1, 2, 3):
        _, pos = _grid_positions(bits)
        keys = np.asarray(hilbert_encode(pos, jnp.zeros(3), 1.0, bits=bits))
        assert sorted(keys.tolist()) == list(range(8**bits)), f"bits={bits}"


def test_adjacency_property():
    """THE Hilbert property: consecutive keys are face-adjacent cells
    (|cell_a - cell_b| is exactly one unit step along one axis)."""
    for bits in (2, 3):
        cells, pos = _grid_positions(bits)
        keys = np.asarray(hilbert_encode(pos, jnp.zeros(3), 1.0, bits=bits))
        order = np.argsort(keys)
        walk = cells[order]
        steps = np.abs(np.diff(walk, axis=0))
        assert np.all(steps.sum(axis=1) == 1), f"bits={bits}: curve has jumps"


def test_locality_beats_morton():
    """Mean spatial distance between curve-consecutive random points must be
    smaller under Hilbert than Morton ordering."""
    from parallelnbody_tpu.ops.morton import morton_encode

    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(-1, 1, (20000, 3)), jnp.float32)
    d = {}
    for name, enc in (("h", hilbert_encode), ("m", morton_encode)):
        keys = np.asarray(enc(pos, jnp.zeros(3), 1.0))
        order = np.argsort(keys)
        p = np.asarray(pos)[order]
        d[name] = np.linalg.norm(np.diff(p, axis=0), axis=1).mean()
    assert d["h"] < d["m"]


def test_clamps_out_of_box():
    pos = jnp.asarray([[5.0, -7.0, 0.0]], jnp.float32)
    k = int(hilbert_encode(pos, jnp.zeros(3), 1.0)[0])
    assert 0 <= k < 2**30
