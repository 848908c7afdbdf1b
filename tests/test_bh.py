"""Barnes-Hut tests: tree invariants, MAC limit behavior, accuracy vs direct."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from parallelnbody_tpu.config import SimConfig
from parallelnbody_tpu.models import get_ic
from parallelnbody_tpu.ops.bh import bh_accel, build_tree, plan_tree, traverse
from parallelnbody_tpu.ops.direct import direct_accel
from parallelnbody_tpu.ops.morton import morton_encode


def _plummer(n, seed=0, dtype="float32"):
    cfg = SimConfig(n=n, ic="plummer", dtype=dtype)
    return get_ic("plummer")(jax.random.key(seed), cfg)


def test_plan_tree():
    assert plan_tree(2048, 32) == (64, 2048, 3)
    assert plan_tree(2000, 32) == (64, 2048, 3)
    assert plan_tree(1_000_000, 256) == (4096, 1048576, 5)
    # Mixed radix at the top: 32768/256 = 128 leaves -> 128, 16, 2, 1.
    assert plan_tree(32768, 256) == (128, 32768, 4)


def test_tree_mass_conservation():
    """Parent mass = sum of child masses at every level (C5 semantics,
    OctreeSearch.h:83-97)."""
    pos, _, mass = _plummer(2048)
    keys = morton_encode(pos, jnp.zeros(3), jnp.max(jnp.abs(pos)) + 1e-3)
    perm = jnp.argsort(keys)
    tree = build_tree(pos[perm], mass[perm], 32, jnp.asarray([10.0, 10.0, 10.0]))
    total = float(jnp.sum(mass))
    for k in range(tree.n_levels):
        np.testing.assert_allclose(float(jnp.sum(tree.mass[k])), total, rtol=1e-5)
    # CoM of root == global CoM
    com = np.asarray(jnp.sum(mass[:, None] * pos, 0) / jnp.sum(mass))
    np.testing.assert_allclose(np.asarray(tree.com[-1][0]), com, atol=1e-5)


def test_tree_radius_bounds_members():
    pos, _, mass = _plummer(2048, seed=3)
    keys = morton_encode(pos, jnp.zeros(3), jnp.max(jnp.abs(pos)) + 1e-3)
    perm = jnp.argsort(keys)
    ps, ms = pos[perm], mass[perm]
    tree = build_tree(ps, ms, 32, jnp.asarray([10.0, 10.0, 10.0]))
    # Every particle lies within its leaf's (com, radius) sphere.
    p = ps.reshape(64, 32, 3)
    d = jnp.linalg.norm(p - tree.com[0][:, None, :], axis=-1)
    assert float(jnp.max(d - tree.radius[0][:, None])) <= 1e-5
    # And within the root sphere.
    d_root = jnp.linalg.norm(ps - tree.com[-1][0][None, :], axis=-1)
    assert float(jnp.max(d_root)) <= float(tree.radius[-1][0]) + 1e-5


def test_traversal_covers_every_pair_exactly_once():
    """Every (target leaf, source particle) interaction is accounted for by
    exactly one accepted node, one leaf monopole, or one near pair."""
    from parallelnbody_tpu.ops.bh import leaf_interactions

    pos, _, mass = _plummer(2048, seed=1)
    keys = morton_encode(pos, jnp.zeros(3), jnp.max(jnp.abs(pos)) + 1e-3)
    perm = jnp.argsort(keys)
    tree = build_tree(pos[perm], mass[perm], 32, jnp.asarray([10.0, 10.0, 10.0]))
    far, rejects_l1 = traverse(tree, theta=0.5)
    n_leaves = tree.com[0].shape[0]
    near_idx, near_valid, far0_idx, far0_valid, overflow = leaf_interactions(
        tree, rejects_l1, 0.5, start_leaf=0, n_slice=n_leaves,
        near_budget=n_leaves, far0_budget=n_leaves)
    assert int(overflow) == 0
    # Count source leaves covered per target: accepted node at level k covers
    # (n_leaves / n_k) leaves; far0 + near cover 1 each. Must equal n_leaves.
    cover = near_valid.astype(jnp.int32).sum(1) + far0_valid.astype(jnp.int32).sum(1)
    for k in range(1, tree.n_levels):
        leaves_per_node = n_leaves // tree.com[k].shape[0]
        cover = cover + far[k].astype(jnp.int32).sum(1) * leaves_per_node
    np.testing.assert_array_equal(np.asarray(cover), n_leaves)
    # And no duplicate leaf ids within any target's combined lists.
    both = np.concatenate([
        np.where(np.asarray(near_valid), np.asarray(near_idx), -1),
        np.where(np.asarray(far0_valid), np.asarray(far0_idx), -2),
    ], axis=1)
    for row in both:
        real = row[row >= 0]
        assert len(set(real.tolist())) == len(real)


@pytest.mark.parametrize("theta,tol", [(0.0, 5e-5), (0.3, 5e-3), (0.7, 3e-2)])
def test_bh_accuracy_vs_direct(theta, tol):
    """theta -> 0 recovers direct sum; larger theta keeps bounded error
    (the theta->0 convergence requirement of SURVEY.md §4)."""
    pos, _, mass = _plummer(4096, seed=2, dtype="float64")
    acc_d, pot_d = direct_accel(pos, mass, g=1.0, softening=0.02)
    acc, pot, overflow = bh_accel(pos, mass, leaf_size=32, theta=theta,
                                  g=1.0, softening=0.02, near_budget=512)
    assert int(overflow) == 0
    scale = float(jnp.max(jnp.linalg.norm(acc_d, axis=1)))
    err = float(jnp.max(jnp.linalg.norm(acc - acc_d, axis=1))) / scale
    assert err < tol, f"theta={theta}: rel accel err {err}"
    pot_err = float(jnp.max(jnp.abs(pot - pot_d)) / jnp.max(jnp.abs(pot_d)))
    assert pot_err < max(tol, 1e-4), f"theta={theta}: pot err {pot_err}"


def test_bh_nonuniform_distribution():
    """Two widely separated clusters — the far one must collapse to a few
    monopoles and still be accurate."""
    rng = np.random.default_rng(5)
    a = rng.standard_normal((1024, 3)) * 0.1
    b = rng.standard_normal((1024, 3)) * 0.1 + np.array([50.0, 0.0, 0.0])
    pos = jnp.asarray(np.concatenate([a, b]), jnp.float64)
    mass = jnp.asarray(rng.uniform(0.5, 1.5, 2048), jnp.float64)
    acc_d, _ = direct_accel(pos, mass, g=1.0, softening=0.01)
    acc, _, overflow = bh_accel(pos, mass, leaf_size=32, theta=0.5,
                                g=1.0, softening=0.01, near_budget=128)
    assert int(overflow) == 0
    scale = float(jnp.max(jnp.linalg.norm(acc_d, axis=1)))
    err = float(jnp.max(jnp.linalg.norm(acc - acc_d, axis=1))) / scale
    assert err < 1e-2, err


def test_bh_momentum_approximately_conserved():
    pos, _, mass = _plummer(2048, seed=7, dtype="float64")
    acc, _, _ = bh_accel(pos, mass, leaf_size=32, theta=0.5, g=1.0,
                         softening=0.02, near_budget=256)
    f = np.asarray(jnp.sum(mass[:, None] * acc, axis=0))
    fscale = float(jnp.sum(mass * jnp.linalg.norm(acc, axis=1)))
    assert np.linalg.norm(f) / fscale < 2e-3


def test_reference_octree_fixture_theta0_is_direct():
    """The Python port of the reference pointer octree (tests/ref_octree.py)
    converges to the exact unsoftened direct sum at theta -> 0 — validates
    the fixture itself (OctreeSearch.h:99-108 semantics)."""
    import numpy as np
    from tests.ref_octree import ref_bh_forces

    rng = np.random.default_rng(3)
    pos = rng.uniform(-200, 200, (256, 3))
    pos[:, 2] *= 0.1
    mass = rng.uniform(1.0, 5000.0, 256)
    acc_ref, _ = ref_bh_forces(pos, mass, theta=1e-12, g=1e4)

    d = pos[None, :, :] - pos[:, None, :]
    r = np.linalg.norm(d, axis=-1)
    w = np.where(r > 0, 1e4 * mass[None, :] / np.where(r > 0, r, 1.0) ** 3, 0.0)
    acc_d = np.einsum("ij,ijc->ic", w, d)
    np.testing.assert_allclose(acc_ref, acc_d, rtol=1e-10, atol=1e-6)


def test_compat_bh_parity_with_reference_octree():
    """Apples-to-apples vs the reference ALGORITHM (VERDICT r1 missing #3):
    the compat profile's Barnes-Hut against the reference octree fixture at
    theta=1.0 on the slab IC (G=1e4, unsoftened).

    Bitwise equality is impossible by design — the reference uses a pointer
    octree with a cell-halfwidth MAC (Size/d < theta, h:103) and a
    prev-CoM-rooted tree (.cpp:79), this framework a Hilbert linear tree with
    a conservative bounding-radius group MAC — so the assertion is: BOTH
    approximate the same direct sum, the fixture within classic theta=1 BH
    error, and ours at least as accurately (the group MAC is strictly
    conservative)."""
    import numpy as np
    import jax
    from tests.ref_octree import ref_bh_forces
    from parallelnbody_tpu.config import reference_compat_config
    from parallelnbody_tpu.models import get_ic

    cfg = reference_compat_config(n=512).replace(
        force="barnes_hut", bh_leaf_size=8, bh_near_budget=512,
        bh_far_budget=512, dtype="float64")
    k_ic, _ = jax.random.split(jax.random.key(cfg.seed))
    pos, _, mass = get_ic(cfg.ic)(k_ic, cfg)
    pos64 = jnp.asarray(pos, jnp.float64)
    mass64 = jnp.asarray(mass, jnp.float64)

    acc_ref, _ = ref_bh_forces(np.asarray(pos64), np.asarray(mass64),
                               theta=1.0, g=1e4)
    acc_bh, _, ovf = bh_accel(pos64, mass64, leaf_size=8, theta=1.0, g=1e4,
                              softening=0.0, near_budget=512, far0_budget=512)
    assert int(ovf) == 0
    acc_d, _ = direct_accel(pos64, mass64, g=1e4, softening=0.0)
    acc_d = np.asarray(acc_d)

    def med_rel(a, b):
        return float(np.median(np.linalg.norm(a - b, axis=1)
                               / np.linalg.norm(b, axis=1)))

    err_ref = med_rel(acc_ref, acc_d)            # measured ~0.51
    err_ours = med_rel(np.asarray(acc_bh), acc_d)  # measured ~0.024
    # The reference's hardcoded theta=1.0 against its half-width MAC is a
    # very crude approximation (median per-particle force error ~50% vs the
    # direct sum — its own true behavior, verified by the theta->0 test
    # above). Parity assertions: the fixture behaves like that known
    # reference, and this framework's conservative group MAC is strictly
    # more accurate at the same theta (>10x here), approximating the same
    # field.
    assert 0.2 < err_ref < 0.8, err_ref
    assert err_ours < err_ref / 5.0, (err_ours, err_ref)
    assert err_ours < 0.05, err_ours


def test_bh_max_levels_cap():
    """A capped pyramid (top level holds many nodes) stays correct: the
    traversal starts from whatever the top level is (cfg.bh_max_levels)."""
    from parallelnbody_tpu.ops.bh import plan_tree

    pos, _, mass = _plummer(2048, seed=11, dtype="float64")
    acc_full, _, _ = bh_accel(pos, mass, leaf_size=32, theta=0.3, g=1.0,
                              softening=0.02, near_budget=512)
    n_leaves, _, levels = plan_tree(2048, 32, max_levels=2)
    assert levels == 2
    acc_cap, _, ovf = bh_accel(pos, mass, leaf_size=32, theta=0.3, g=1.0,
                               softening=0.02, near_budget=512, max_levels=2)
    assert int(ovf) == 0
    acc_d, _ = direct_accel(pos, mass, g=1.0, softening=0.02)
    scale = float(jnp.max(jnp.linalg.norm(acc_d, axis=1)))
    for acc in (acc_full, acc_cap):
        err = float(jnp.max(jnp.linalg.norm(acc - acc_d, axis=1))) / scale
        assert err < 5e-3, err


def test_bh_overflow_reported():
    """A tiny near budget must be reported, not silently wrong."""
    pos, _, mass = _plummer(2048, seed=8)
    _, _, overflow = bh_accel(pos, mass, leaf_size=32, theta=0.1,
                              g=1.0, softening=0.02, near_budget=2)
    assert int(overflow) > 0


def test_bh_padding_n_not_multiple():
    """N that doesn't fill the leaf grid: padded particles must not affect
    real ones."""
    pos, _, mass = _plummer(1500, seed=9, dtype="float64")
    acc_d, _ = direct_accel(pos, mass, g=1.0, softening=0.02)
    acc, _, overflow = bh_accel(pos, mass, leaf_size=32, theta=0.4,
                                g=1.0, softening=0.02, near_budget=256)
    assert int(overflow) == 0
    scale = float(jnp.max(jnp.linalg.norm(acc_d, axis=1)))
    err = float(jnp.max(jnp.linalg.norm(acc - acc_d, axis=1))) / scale
    assert err < 1e-2, err


def test_bh_step_integration():
    """BH force method drives the integrator through the standard API."""
    from parallelnbody_tpu.api import init_simulation, make_step

    cfg = SimConfig(n=2048, ic="plummer", force="barnes_hut", theta=0.5,
                    softening=0.02, dt=1e-3, bh_leaf_size=32,
                    bh_near_budget=256, dtype="float64")
    state = init_simulation(cfg)
    from parallelnbody_tpu.ops.energy import total_energy

    e0 = float(total_energy(state.vel, state.mass, state.pot))
    step = make_step(cfg)
    for _ in range(20):
        state = step(state)
    e1 = float(total_energy(state.vel, state.mass, state.pot))
    assert abs((e1 - e0) / e0) < 1e-3
    assert np.all(np.isfinite(np.asarray(state.pos)))


def test_bh_pallas_path_matches_jnp():
    """The Pallas far/near kernels (interpret mode on CPU) must match the jnp
    reference path."""
    pos, _, mass = _plummer(2048, seed=11)
    a0, p0, of0 = bh_accel(pos, mass, leaf_size=32, theta=0.5, g=1.0,
                           softening=0.02, near_budget=64, use_pallas=False)
    a1, p1, of1 = bh_accel(pos, mass, leaf_size=32, theta=0.5, g=1.0,
                           softening=0.02, near_budget=64, use_pallas=True)
    assert int(of0) == int(of1) == 0
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a0), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p0), rtol=2e-4, atol=2e-5)


def test_near_kernel_multi_segment():
    """The near kernel's segmented VMEM table: forcing several table segments
    (tiny seg_bytes) must give identical results to one segment — covers the
    per-segment [lo, hi) range arithmetic the N=1M TPU path relies on."""
    from parallelnbody_tpu.ops.bh import _prepare, traverse, leaf_interactions
    from parallelnbody_tpu.ops.pallas_bh import near_field_pallas

    pos, _, mass = _plummer(2048, seed=17)
    pos_s, mass_s, _, tree, _, n_pad = _prepare(pos, mass, leaf_size=32,
                                                curve="hilbert")
    n_leaves = n_pad // 32
    _, rej = traverse(tree, 0.5)
    idx, valid, _, _, _ = leaf_interactions(
        tree, rej, 0.5, start_leaf=0, n_slice=n_leaves, near_budget=64,
        far0_budget=256)
    tgt = pos_s.reshape(n_leaves, 32, 3)
    one = near_field_pallas(pos_s, mass_s, tgt, idx, valid, 32, 1.0, 0.02,
                            False, interpret=True)
    few = near_field_pallas(pos_s, mass_s, tgt, idx, valid, 32, 1.0, 0.02,
                            False, interpret=True,
                            seg_bytes=8 * 4 * 128 * 4)  # 8 rows/segment
    # Segment count changes the summation order: fp32 reassociation only.
    np.testing.assert_allclose(np.asarray(few[0]), np.asarray(one[0]),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(few[1]), np.asarray(one[1]),
                               rtol=1e-4, atol=1e-6)


def test_bh_compute_pot_false_same_acc():
    """compute_pot=False must not change accelerations (pot returns zeros on
    the Pallas path)."""
    pos, _, mass = _plummer(2048, seed=19)
    a1, p1, _ = bh_accel(pos, mass, leaf_size=32, theta=0.5, g=1.0,
                         softening=0.02, near_budget=64, use_pallas=True)
    a0, p0, _ = bh_accel(pos, mass, leaf_size=32, theta=0.5, g=1.0,
                         softening=0.02, near_budget=64, use_pallas=True,
                         compute_pot=False)
    np.testing.assert_allclose(np.asarray(a0), np.asarray(a1), rtol=1e-6,
                               atol=1e-7)
    assert float(jnp.max(jnp.abs(p0))) == 0.0
    assert float(jnp.max(jnp.abs(p1))) > 0.0


def test_bh_unsoftened_compat():
    """BH with softening=0 (reference-compat force law) must stay finite and
    match direct within MAC tolerance — exercises the guard_zero paths in
    every kernel."""
    pos, _, mass = _plummer(2048, seed=13, dtype="float64")
    acc_d, _ = direct_accel(pos, mass, g=1e4, softening=0.0)
    for use_pallas in (False, True):
        acc, _, of = bh_accel(pos, mass, leaf_size=32, theta=0.4, g=1e4,
                              softening=0.0, near_budget=256,
                              use_pallas=use_pallas)
        assert int(of) == 0
        assert np.all(np.isfinite(np.asarray(acc)))
        scale = float(jnp.max(jnp.linalg.norm(acc_d, axis=1)))
        err = float(jnp.max(jnp.linalg.norm(acc - acc_d, axis=1))) / scale
        assert err < 2e-2, (use_pallas, err)


def test_quadrupole_two_mass_node():
    """A two-point-mass node evaluated with its quadrupole must be ~300x more
    accurate than the monopole alone (both kernels and the jnp path)."""
    from parallelnbody_tpu.ops.bh import _quad_about, _far0_jnp
    from parallelnbody_tpu.ops.pallas_bh import far_field_pallas

    rng = np.random.default_rng(1)
    tgt = jnp.asarray(rng.uniform(0.9, 1.1, (1, 8, 3)), jnp.float64)
    s = np.array([0.03, -0.02, 0.05])
    m = 1.3
    pts, ms = np.array([s, -s]), np.array([m, m])
    x = np.asarray(tgt[0])
    a_ex = np.zeros((8, 3))
    for p, w in zip(pts, ms):
        d = p[None] - x
        r = np.linalg.norm(d, axis=1, keepdims=True)
        a_ex += w * d / r**3

    q5 = _quad_about(jnp.asarray(pts)[None], jnp.asarray(ms)[None])  # (1, 5)
    nodes = jnp.concatenate(
        [jnp.zeros((1, 3)), jnp.asarray([[2 * m]]), q5], axis=1)  # (1, 9)
    idx = jnp.zeros((1, 8), jnp.int32)
    valid = jnp.zeros((1, 8), bool).at[0, 0].set(True)
    acc_q, _, _ = far_field_pallas(tgt, nodes, idx, valid, 1.0, 0.0, False,
                                   interpret=True)
    acc_m, _, _ = far_field_pallas(tgt, nodes[:, :4], idx, valid, 1.0, 0.0,
                                   False, interpret=True)
    err_q = np.max(np.abs(np.asarray(acc_q) - a_ex))
    err_m = np.max(np.abs(np.asarray(acc_m) - a_ex))
    assert err_q < err_m / 100, (err_q, err_m)

    acc_j, _ = _far0_jnp(tgt, jnp.zeros((1, 1, 3)), jnp.asarray([[2 * m]]),
                         1.0, 0.0, False, 1, node_quad=q5[None])
    np.testing.assert_allclose(np.asarray(acc_j), np.asarray(acc_q),
                               rtol=1e-10, atol=1e-12)


def test_quadrupole_improves_bh_accuracy():
    """multipole=2 must beat multipole=1 at the same theta (both paths)."""
    pos, _, mass = _plummer(2048, seed=2, dtype="float64")
    acc_d, _ = direct_accel(pos, mass, g=1.0, softening=0.02)
    scale = float(jnp.max(jnp.linalg.norm(acc_d, axis=1)))
    rms_d = float(jnp.sqrt(jnp.mean(jnp.sum(acc_d**2, 1))))
    errs = {}
    for mp in (1, 2):
        for up in (False, True):
            acc, _, of = bh_accel(pos, mass, leaf_size=32, theta=0.6, g=1.0,
                                  softening=0.02, near_budget=256,
                                  use_pallas=up, multipole=mp)
            assert int(of) == 0
            errs[(mp, up)] = float(
                jnp.sqrt(jnp.mean(jnp.sum((acc - acc_d) ** 2, 1)))) / rms_d
    assert errs[(2, False)] < errs[(1, False)] / 2.5, errs
    assert errs[(2, True)] < errs[(1, True)] / 2.5, errs
    np.testing.assert_allclose(errs[(2, True)], errs[(2, False)], rtol=0.2)


def test_upper_far_list_not_front_packed():
    """The upper-level far 'list' is a raw scattered mask; sources past the
    per-target count must NOT be chunk-skipped. Regression test: a single
    far source with a high node id and a budget > chunk size."""
    from parallelnbody_tpu.ops.pallas_bh import far_field_pallas

    rng = np.random.default_rng(3)
    tgt = jnp.asarray(rng.uniform(-0.1, 0.1, (1, 8, 3)), jnp.float64)
    n_nodes = 700  # > the 512 chunk size
    nodes = jnp.zeros((n_nodes, 4), jnp.float64)
    nodes = nodes.at[600, :3].set(jnp.asarray([2.0, 0.0, 0.0]))
    nodes = nodes.at[600, 3].set(5.0)
    idx = jnp.broadcast_to(jnp.arange(n_nodes, dtype=jnp.int32)[None], (1, n_nodes))
    valid = jnp.zeros((1, n_nodes), bool).at[0, 600].set(True)

    acc, _, _ = far_field_pallas(tgt, nodes, idx, valid, 1.0, 0.0, False,
                                 interpret=True, front_packed=False)
    # count=1 with front-packed skipping would have missed the only source.
    assert float(jnp.min(jnp.abs(acc[:, 0]))) > 0.5


def test_near_kernel_shard_windows_sum_to_full():
    """The ring-pass building block (near_field_pallas leaf_lo): evaluating
    each shard's leaf-id window against its particle shard, summed over all
    shards, must equal the single full-table evaluation. This is the pallas
    path the distributed near ring (parallel/distributed.py) runs per
    ppermute pass — the CPU-mesh distributed tests only exercise the jnp
    branch, so this covers the kernel-side window arithmetic."""
    from parallelnbody_tpu.ops.bh import _prepare, traverse, leaf_interactions
    from parallelnbody_tpu.ops.pallas_bh import near_field_pallas

    pos, _, mass = _plummer(2048, seed=23)
    pos_s, mass_s, _, tree, _, n_pad = _prepare(pos, mass, leaf_size=32,
                                                curve="hilbert")
    n_leaves = n_pad // 32
    _, rej = traverse(tree, 0.5)
    idx, valid, _, _, _ = leaf_interactions(
        tree, rej, 0.5, start_leaf=0, n_slice=n_leaves, near_budget=64,
        far0_budget=256)
    tgt = pos_s.reshape(n_leaves, 32, 3)
    full = near_field_pallas(pos_s, mass_s, tgt, idx, valid, 32, 1.0, 0.02,
                             False, interpret=True)

    n_sh = 4
    nl_sh = n_leaves // n_sh
    acc = jnp.zeros_like(full[0])
    pot = jnp.zeros_like(full[1])
    for s in range(n_sh):
        sh_pos = pos_s[s * nl_sh * 32:(s + 1) * nl_sh * 32]
        sh_mass = mass_s[s * nl_sh * 32:(s + 1) * nl_sh * 32]
        a, p = near_field_pallas(sh_pos, sh_mass, tgt, idx, valid, 32, 1.0,
                                 0.02, False, interpret=True,
                                 leaf_lo=jnp.int32(s * nl_sh))
        acc = acc + a
        pot = pot + p
    np.testing.assert_allclose(np.asarray(acc), np.asarray(full[0]),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(pot), np.asarray(full[1]),
                               rtol=1e-4, atol=1e-6)


def test_far_eval_row_chunking_matches(monkeypatch):
    """The target-row chunking that bounds the gathered buffer (N=4M fix)
    must not change results: force tiny chunks and compare."""
    import parallelnbody_tpu.ops.pallas_bh as pb
    from parallelnbody_tpu.ops.bh import (_prepare, traverse,
                                          leaf_interactions)

    pos, _, mass = _plummer(1024, seed=31)
    pos_s, mass_s, _, tree, _, n_pad = _prepare(pos, mass, leaf_size=32,
                                                curve="hilbert",
                                                multipole_order=2)
    n_leaves = n_pad // 32
    _, rej = traverse(tree, 0.5)
    _, _, f_idx, f_valid, _ = leaf_interactions(
        tree, rej, 0.5, start_leaf=0, n_slice=n_leaves, near_budget=64,
        far0_budget=256)
    nodes = jnp.concatenate(
        [tree.com[0], tree.mass[0][:, None], tree.quad[0]], axis=1)
    tgt = pos_s.reshape(n_leaves, 32, 3)
    one, _, _ = pb.far_field_pallas(tgt, nodes, f_idx, f_valid, 1.0, 0.02,
                                    False, interpret=True)
    monkeypatch.setattr(pb, "_FAR_GATHER_BYTES", 8 * 256 * 512)  # ~8 rows
    pb.far_field_pallas._clear_cache()
    chunked, _, _ = pb.far_field_pallas(tgt, nodes, f_idx, f_valid, 1.0,
                                        0.02, False, interpret=True)
    pb.far_field_pallas._clear_cache()
    np.testing.assert_allclose(np.asarray(chunked), np.asarray(one),
                               rtol=1e-6, atol=1e-9)


def test_midrun_overflow_reported():
    """A state engineered to start clipping only after a few steps must
    surface the overflow through make_step/make_run report_overflow
    (VERDICT r2 #3): 32 tight clusters — one per leaf — converge on the
    origin, so t=0 has zero overflow (near list = self leaf only) but the
    merged blob blows a near budget of 2. This is the contract at
    ops/bh.py ("overflow is reported, never silently dropped") end-to-end:
    the t=0 CLI audit alone cannot catch a collapsing system."""
    from parallelnbody_tpu.api import make_accel_fn, make_run, make_step
    from parallelnbody_tpu.state import make_state

    n_cl, per = 32, 8
    # bh_rebuild_every=1: the default rebuild interval (8) freezes list
    # membership per block, so mid-block onset surfaces at the NEXT block's
    # plan (delay <= k-1 steps) — this test pins the per-step semantics.
    cfg = SimConfig(n=n_cl * per, force="barnes_hut", bh_leaf_size=per,
                    bh_near_budget=2, bh_far_budget=64, theta=0.5,
                    softening=1e-2, dt=0.25, integrator="leapfrog",
                    bh_multipole=1, dtype="float64", bh_rebuild_every=1)
    # Cluster centers on a well-separated lattice; members jittered +-0.1.
    ii = jnp.arange(n_cl)
    centers = 100.0 * jnp.stack(
        [ii % 4, (ii // 4) % 4, ii // 16], axis=1).astype(jnp.float64)
    centers = centers - jnp.mean(centers, axis=0)
    jit = 0.1 * jax.random.uniform(jax.random.key(7), (n_cl, per, 3),
                                   dtype=jnp.float64, minval=-1.0, maxval=1.0)
    pos = (centers[:, None, :] + jit).reshape(-1, 3)
    vel = -pos  # all clusters meet at the origin at t = 1 (step 4)
    # Tiny masses: dynamics are pure ballistics (intra-cluster kicks would
    # otherwise scatter the clusters); the MAC and budgets are geometric,
    # so overflow behavior is identical.
    mass = jnp.full(cfg.n, 1e-6, jnp.float64)
    state = make_state(pos, vel, mass, key=jax.random.key(0),
                       dtype=jnp.float64)
    acc, pot = make_accel_fn(cfg, state.mass)(state.pos)
    state = state._replace(acc=acc, pot=pot)

    _, of0 = make_step(cfg, report_overflow=True)(state)
    assert int(of0) == 0, int(of0)

    out, of = make_run(cfg, 6, report_overflow=True)(state)
    assert int(of) > 0
    assert bool(jnp.all(jnp.isfinite(out.pos)))
    # report_overflow=False keeps the legacy single-state return
    out2 = make_run(cfg, 2)(state)
    assert out2.pos.shape == state.pos.shape


# ------------------------------------------------- staged (hierarchical) lists
def test_staged_lists_cover_every_pair_exactly_once():
    """The staged refinement (traverse stop_level=2 + two gather stages) must
    satisfy the same exact-coverage invariant as the dense plane: every
    (target leaf, source leaf) pair covered by exactly one accepted node
    (weighted by its leaf count), one far leaf, or one near pair."""
    from parallelnbody_tpu.ops.bh import build_interaction_lists_staged

    pos, _, mass = _plummer(16384, seed=1, dtype="float64")
    keys = morton_encode(pos, jnp.zeros(3), jnp.max(jnp.abs(pos)) + 1e-3)
    perm = jnp.argsort(keys)
    tree = build_tree(pos[perm], mass[perm], 32,
                      jnp.asarray([10.0, 10.0, 10.0]))
    n_leaves = tree.com[0].shape[0]
    widths = [c.shape[0] for c in tree.com]
    assert len(widths) == 4  # a real 2-stage refine (l2 is not the root)
    far, rej2 = traverse(tree, 0.5, stop_level=2)
    ni, nv, fi, fv, nodes_all, of = build_interaction_lists_staged(
        tree, far, rej2, theta=0.5, start_leaf=0, n_slice=n_leaves,
        near_budget=n_leaves, far_budget=2 * n_leaves,
        cand2_budget=widths[2], cand1_budget=widths[1], dtype=jnp.float64)
    assert int(of) == 0
    # leaves-per-node weight for every global id in nodes_all
    w = np.zeros(sum(widths), np.int64)
    off = 0
    for k, wk in enumerate(widths):
        w[off:off + wk] = n_leaves // wk
        off += wk
    cover = (np.asarray(nv).sum(1)
             + (w[np.asarray(fi)] * np.asarray(fv)).sum(1))
    np.testing.assert_array_equal(cover, n_leaves)
    # near ids ascending per row (the near kernel's [lo, hi) segment bounds
    # depend on it) and no duplicates across near + far
    ni_np, nv_np = np.asarray(ni), np.asarray(nv)
    for r in range(n_leaves):
        row = ni_np[r][nv_np[r]]
        assert np.all(np.diff(row) > 0)
    both = np.concatenate([
        np.where(nv_np, ni_np, -1),
        np.where(np.asarray(fv), np.asarray(fi) + sum(widths), -2),
    ], axis=1)
    for row in both:
        real = row[row >= 0]
        assert len(set(real.tolist())) == len(real)


def test_staged_matches_dense_forces():
    """Staged and dense refinement make identical MAC decisions, so forces
    must agree to summation-order fp tolerance; clipped candidate stages
    must report overflow."""
    pos, _, mass = _plummer(8192, seed=11, dtype="float64")
    kwargs = dict(leaf_size=32, theta=0.6, g=1.0, softening=0.02,
                  near_budget=512, far0_budget=1024, multipole=2)
    a_d, p_d, of_d = bh_accel(pos, mass, refine="dense", **kwargs)
    a_s, p_s, of_s = bh_accel(pos, mass, refine="staged", **kwargs)
    assert int(of_d) == 0 and int(of_s) == 0
    np.testing.assert_allclose(np.asarray(a_s), np.asarray(a_d),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(p_s), np.asarray(p_d),
                               rtol=1e-9, atol=1e-12)
    # starved candidate budgets are counted, never silent
    _, _, of_t = bh_accel(pos, mass, refine="staged",
                          cand_budgets=(2, 4), **kwargs)
    assert int(of_t) > 0


def test_sectioned_evaluation_matches_unsectioned():
    """Slice-sectioned evaluation (bh_sections > 1, the N=32M single-chip
    capacity fix): each target window runs the same windowed traversal +
    lists as the multi-chip slice path, so results AND the overflow
    counter must be bitwise identical to the one-shot evaluation."""
    pos, _, mass = _plummer(16384, seed=3, dtype="float64")
    kw = dict(leaf_size=32, theta=0.6, g=1.0, softening=0.02,
              near_budget=512, far0_budget=1024, multipole=2,
              refine="staged")
    a1, p1, of1 = bh_accel(pos, mass, sections=1, **kw)
    a4, p4, of4 = bh_accel(pos, mass, sections=4, **kw)
    assert int(of1) == int(of4)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a4))
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p4))
    # tight budgets: the overflow counter must agree between paths too
    _, _, ot1 = bh_accel(pos, mass, sections=1, **(kw | {"near_budget": 8}))
    _, _, ot4 = bh_accel(pos, mass, sections=4, **(kw | {"near_budget": 8}))
    assert int(ot1) == int(ot4) > 0


def test_staged_row_blocking_matches():
    """The lax.map row blocking that bounds staged gather temporaries must
    not change the lists."""
    from parallelnbody_tpu.ops.bh import build_interaction_lists_staged

    pos, _, mass = _plummer(4096, seed=13, dtype="float64")
    keys = morton_encode(pos, jnp.zeros(3), jnp.max(jnp.abs(pos)) + 1e-3)
    perm = jnp.argsort(keys)
    tree = build_tree(pos[perm], mass[perm], 32,
                      jnp.asarray([10.0, 10.0, 10.0]))
    n_leaves = tree.com[0].shape[0]
    far, rej2 = traverse(tree, 0.5, stop_level=2)
    kw = dict(theta=0.5, start_leaf=0, n_slice=n_leaves,
              near_budget=128, far_budget=256, cand2_budget=16,
              cand1_budget=64, dtype=jnp.float64)
    one = build_interaction_lists_staged(tree, far, rej2, **kw)
    blk = build_interaction_lists_staged(tree, far, rej2, row_block=16, **kw)
    for a, b in zip(one[:4], blk[:4]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(one[5]) == int(blk[5])


def test_sharded_bh_staged_matches_dense(eight_devices=None):
    """Staged refinement through the replicated-tree sharded slice path
    (traced start_leaf) matches single-device dense BH."""
    from parallelnbody_tpu.config import SimConfig
    from parallelnbody_tpu.api import init_simulation, make_step
    from parallelnbody_tpu.parallel import make_ring_mesh, shard_state, \
        make_sharded_step

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = SimConfig(n=2048, ic="plummer", dt=1e-3, softening=0.02,
                    force="barnes_hut", bh_leaf_size=8, bh_near_budget=256,
                    bh_far_budget=512, bh_refine="staged", dtype="float64")
    mesh = make_ring_mesh(8)
    state = init_simulation(cfg)
    ref = make_step(cfg.replace(bh_refine="dense"))(state)
    out = make_sharded_step(cfg, mesh)(shard_state(state, mesh))
    np.testing.assert_allclose(np.asarray(out.acc), np.asarray(ref.acc),
                               rtol=1e-7, atol=1e-10)


def test_padding_target_leaves_get_empty_lists():
    """Zero-mass (padding) target leaves consume no list budget (ADVICE r2
    #1): with n far from the padded size, the phantom target rows' lists
    must be empty in every refinement mode."""
    from parallelnbody_tpu.ops.bh import (_prepare, leaf_interactions,
                                          build_interaction_lists_staged)

    pos, _, mass = _plummer(2100, seed=5, dtype="float64")  # pads to 4096
    pos_s, mass_s, _, tree, _, n_pad = _prepare(pos, mass, leaf_size=32,
                                                curve="hilbert")
    n_leaves = n_pad // 32
    assert n_pad > 2100
    phantom = np.asarray(tree.mass[0]) == 0
    assert phantom.any()

    far, rej1 = traverse(tree, 0.5)
    ni, nv, fi, fv, _ = leaf_interactions(
        tree, rej1, 0.5, start_leaf=0, n_slice=n_leaves,
        near_budget=64, far0_budget=256)
    assert int(jnp.sum(nv[phantom])) == 0
    assert int(jnp.sum(fv[phantom])) == 0

    far2, rej2 = traverse(tree, 0.5, stop_level=2)
    ni, nv, fi, fv, _, _ = build_interaction_lists_staged(
        tree, far2, rej2, theta=0.5, start_leaf=0, n_slice=n_leaves,
        near_budget=64, far_budget=512, cand2_budget=32, cand1_budget=64,
        dtype=jnp.float64)
    assert int(jnp.sum(nv[phantom])) == 0
    assert int(jnp.sum(fv[phantom])) == 0


# ------------------------------------------------- octet-masked far field
def _octet_cover_counts(tree, far_keys, far_valid):
    """Per-target count of source LEAVES covered by an octet far list:
    each set mask bit of a level-k octet entry covers n_leaves/n_k leaves."""
    from parallelnbody_tpu.ops.bh import _octet_offsets

    widths = [c.shape[0] for c in tree.com]
    offs8, n_oct = _octet_offsets(widths)
    n_leaves = widths[0]
    keys = np.where(np.asarray(far_valid), np.asarray(far_keys), -1)
    octs = keys >> 8
    bits = keys & 0xFF
    nset = np.zeros_like(bits)
    for b in range(8):
        nset += (bits >> b) & 1
    cover = np.zeros(keys.shape[0], np.int64)
    for k in range(tree.n_levels):
        lo, hi = offs8[k], offs8[k] + (-(-widths[k] // 8))
        in_level = (octs >= lo) & (octs < hi) & (keys >= 0)
        cover += (nset * in_level).sum(1) * (n_leaves // widths[k])
    return cover


def test_octet_lists_cover_every_pair_exactly_once():
    """The octet-masked far list + near list must cover every (target leaf,
    source leaf) pair exactly once, in dense and staged refinement."""
    from parallelnbody_tpu.ops.bh import (
        build_interaction_lists_octet, build_interaction_lists_staged)

    pos, _, mass = _plummer(4096, seed=11)
    keys = morton_encode(pos, jnp.zeros(3), jnp.max(jnp.abs(pos)) + 1e-3)
    perm = jnp.argsort(keys)
    tree = build_tree(pos[perm], mass[perm], 32,
                      jnp.asarray([10.0, 10.0, 10.0]))
    n_leaves = tree.com[0].shape[0]

    far, rej1 = traverse(tree, theta=0.55)
    ni, nv, fk, fv, nodes8, of = build_interaction_lists_octet(
        tree, far, rej1, theta=0.55, start_leaf=0, n_slice=n_leaves,
        near_budget=n_leaves, far_budget=n_leaves, dtype=jnp.float32)
    assert int(of) == 0
    assert nodes8.shape[0] % 8 == 0
    cover = _octet_cover_counts(tree, fk, fv) + \
        np.asarray(jnp.sum(nv, 1), np.int64)
    np.testing.assert_array_equal(cover, n_leaves)

    far2, rej2 = traverse(tree, 0.55, stop_level=2)
    ni, nv, fk, fv, nodes8, of = build_interaction_lists_staged(
        tree, far2, rej2, theta=0.55, start_leaf=0, n_slice=n_leaves,
        near_budget=n_leaves, far_budget=n_leaves, cand2_budget=64,
        cand1_budget=256, dtype=jnp.float32, octet_far=True)
    assert int(of) == 0
    cover = _octet_cover_counts(tree, fk, fv) + \
        np.asarray(jnp.sum(nv, 1), np.int64)
    np.testing.assert_array_equal(cover, n_leaves)


@pytest.mark.parametrize("refine", ["dense", "staged"])
@pytest.mark.parametrize("use_pallas", [False, True])
def test_octet_far_matches_gather(refine, use_pallas):
    """far_mode="octet" evaluates the identical interaction set as
    "gather" — both Pallas (interpret) and jnp paths — so the forces must
    agree to f32 summation-order noise."""
    pos, _, mass = _plummer(4096, seed=4)
    kw = dict(leaf_size=32, theta=0.6, g=1.0, softening=0.02,
              near_budget=128, far0_budget=512, multipole=2,
              use_pallas=use_pallas, refine=refine)
    ag, pg, og = bh_accel(pos, mass, far_mode="gather", **kw)
    ao, po, oo = bh_accel(pos, mass, far_mode="octet", **kw)
    assert int(og) == 0 and int(oo) == 0
    ra = float(jnp.linalg.norm(ag - ao) / jnp.linalg.norm(ag))
    rp = float(jnp.linalg.norm(pg - po) / jnp.linalg.norm(pg))
    assert ra < 1e-5, ra
    assert rp < 1e-5, rp


def test_octet_far_overflow_counted():
    """A too-small octet far budget must be COUNTED (8 per clipped octet),
    never silent (module contract, ops/bh.py)."""
    pos, _, mass = _plummer(4096, seed=6)
    kw = dict(leaf_size=32, theta=0.6, g=1.0, softening=0.02,
              near_budget=256, use_pallas=False, far_mode="octet")
    _, _, of_ok = bh_accel(pos, mass, far0_budget=512, **kw)
    _, _, of_clip = bh_accel(pos, mass, far0_budget=8, **kw)
    assert int(of_ok) == 0
    assert int(of_clip) > 0


def test_far_octet_kernel_matches_jnp():
    """far_octet_pallas (interpret) against _far_octet_jnp on a hand-rolled
    octet list with mixed masks, multi-segment path forced."""
    from parallelnbody_tpu.ops.bh import (_prepare, traverse as trav,
                                          build_interaction_lists_octet,
                                          _far_octet_jnp)
    from parallelnbody_tpu.ops.pallas_bh import far_octet_pallas

    pos, _, mass = _plummer(4096, seed=9)
    pos_s, mass_s, _, tree, _, n_pad = _prepare(
        pos, mass, leaf_size=32, curve="hilbert", multipole_order=2)
    n_leaves = n_pad // 32
    far, rej1 = trav(tree, 0.6)
    ni, nv, fk, fv, nodes8, of = build_interaction_lists_octet(
        tree, far, rej1, theta=0.6, start_leaf=0, n_slice=n_leaves,
        near_budget=512, far_budget=1024, dtype=jnp.float32)
    tgt = pos_s.reshape(n_leaves, 32, 3)
    a_j, p_j = _far_octet_jnp(tgt, nodes8, fk, fv, 1.0,
                              jnp.asarray(0.02 ** 2), False)
    # Tiny seg_bytes forces the multi-segment resident-table path.
    a_p, p_p = far_octet_pallas(tgt, nodes8, fk, fv, 1.0, 0.02, False,
                                interpret=True, seg_bytes=1 << 14)
    np.testing.assert_allclose(np.asarray(a_p), np.asarray(a_j),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(p_p), np.asarray(p_j),
                               rtol=2e-4, atol=2e-5)


def test_resolve_refine_auto_cand2_measured_floor():
    """Auto cand2 must cover the MEASURED level-2 reject maxima — they are
    geometry-bound (theta + the leaf-radius tail), not budget-bound:
    206/target at N=4M and 185 at N=8M (plummer, theta=0.72, quad,
    leaf 256, near 512 / far 2816). The old cand1/4 formula resolved 128
    for exactly that budget shape and silently benchmarked rms 0.197
    instead of 9.3e-4 (78 clipped candidates charged 65536 each)."""
    from parallelnbody_tpu.ops.bh import resolve_refine

    refine, (c2, c1) = resolve_refine("staged", (0, 0), 8, 512, 2816)
    assert refine == "staged"
    assert c2 >= 256, (c2, "must cover the measured 206 l2-reject max")
    # known-good galaxy-2M shape keeps its measured budgets
    _, (c2g, c1g) = resolve_refine("staged", (0, 0), 7, 5120, 2048)
    assert c1g == 896 and c2g >= 256
    # explicit budgets are never overridden
    _, (c2e, c1e) = resolve_refine("staged", (96, 320), 8, 512, 2816)
    assert (c2e, c1e) == (96, 320)
