"""Morton encode/decode tests, including the reference octant-bit convention."""

import jax.numpy as jnp
import numpy as np

from parallelnbody_tpu.ops.morton import morton_encode, morton_decode


def _py_morton(ix, iy, iz, bits=10):
    """Bit-by-bit python reference."""
    key = 0
    for b in range(bits):
        key |= ((ix >> b) & 1) << (3 * b + 2)
        key |= ((iy >> b) & 1) << (3 * b + 1)
        key |= ((iz >> b) & 1) << (3 * b)
    return key


def test_encode_matches_python_reference():
    rng = np.random.default_rng(0)
    cells = rng.integers(0, 1024, size=(256, 3))
    center = jnp.zeros(3)
    half = 1.0
    # Place points at cell centers of the 1024^3 grid over [-1, 1]^3.
    pos = (cells + 0.5) / 1024.0 * 2.0 - 1.0
    keys = np.asarray(morton_encode(jnp.asarray(pos, jnp.float32), center, half))
    expected = np.array([_py_morton(*c) for c in cells])
    np.testing.assert_array_equal(keys, expected)


def test_decode_roundtrip():
    rng = np.random.default_rng(1)
    cells = rng.integers(0, 1024, size=(512, 3), dtype=np.int32)
    keys = jnp.asarray([_py_morton(*c) for c in cells], jnp.int32)
    out = np.asarray(morton_decode(keys))
    np.testing.assert_array_equal(out, cells)


def test_octant_bit_convention_matches_reference():
    """First 3-bit group = reference GetOctant of the root (X->4, Y->2, Z->1,
    OctreeSearch.h:50-56): key's top group for a point in the +x,-y,+z octant
    of a centered cube must be 4|0|1 = 5."""
    pos = jnp.asarray([[0.5, -0.5, 0.5]], jnp.float32)
    key = int(morton_encode(pos, jnp.zeros(3), 1.0)[0])
    top_group = (key >> 27) & 0b111
    assert top_group == 0b101


def test_out_of_box_points_clamp():
    pos = jnp.asarray([[10.0, -10.0, 0.0]], jnp.float32)
    key = int(morton_encode(pos, jnp.zeros(3), 1.0)[0])
    assert 0 <= key < 2**30


def test_sorted_keys_group_spatially():
    """Points in the same octant share the leading bit group after sort."""
    rng = np.random.default_rng(2)
    pos = jnp.asarray(rng.uniform(-1, 1, (1000, 3)), jnp.float32)
    keys = np.asarray(morton_encode(pos, jnp.zeros(3), 1.0))
    octant = (keys >> 27) & 7
    px = np.asarray(pos)
    expected = ((px[:, 0] >= 0) * 4 + (px[:, 1] >= 0) * 2 + (px[:, 2] >= 0)).astype(int)
    np.testing.assert_array_equal(octant, expected)
