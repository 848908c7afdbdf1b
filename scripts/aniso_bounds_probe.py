"""Probe: anisotropic (AABB-projected) node bounds in the MAC (VERDICT r3
next #7 — the one unmeasured geometric lever on the near field).

The shipped MAC is isotropic: MAC_SIZE_SCALE * r_node < theta * (d - r_leaf)
with r_* bounding RADII (ops/bh.py). Hilbert leaves in disks/filaments are
strongly anisotropic, so the radii over-bound off-axis separations. Two
direction-aware variants, both using per-node AABBs (union-propagated up the
pyramid) with the support evaluated toward the partner's CoM:

  * target-proj: replace r_leaf by min(r_leaf, support_t(u)) — RIGOROUS
    (the subtraction only bounds the worst member particle's distance, and
    the projection is exactly that bound, tighter).
  * both-proj: additionally replace r_node by min(r_node, support_s(-u)) —
    heuristic (the multipole truncation error depends on the full spread,
    not only the projected one), so it must be validated by measured rms.

For each (variant, theta): dense per-level acceptance masks (the probe's
own level loop, mirroring ops/bh.py traverse), near/far leaf planes, near
PADDED-TILE count (the near kernel's true cost: number of accepted source
leaves summed over targets — each costs a (G x G) tile), far entry count,
and rms force error vs direct on sampled target leaves (quadrupole far
eval — the shipped accuracy class). Compare pair counts at MATCHED rms.

Usage: python scripts/aniso_bounds_probe.py [--n 1048576] [--ic plummer]
       [--leaf 256] [--thetas 0.6 0.72 0.84]
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from parallelnbody_tpu.config import SimConfig  # noqa: E402
from parallelnbody_tpu.ops import bh  # noqa: E402
from parallelnbody_tpu.utils.accuracy import direct_accel_at  # noqa: E402

MAC = bh.MAC_SIZE_SCALE


def node_aabbs(pos_s, mass_s, leaf_size, tree):
    """Per-level (a, b) AABB half-extents about each node's CoM:
    a = hi - com >= 0, b = com - lo >= 0, both (n_k, 3). Built from leaf
    particle AABBs, unioned up the pyramid (empty nodes get zero extent)."""
    n_leaves = tree.com[0].shape[0]
    p = pos_s.reshape(n_leaves, leaf_size, 3)
    occ = (mass_s.reshape(n_leaves, leaf_size) > 0)[..., None]
    lo = jnp.min(jnp.where(occ, p, jnp.inf), axis=1)
    hi = jnp.max(jnp.where(occ, p, -jnp.inf), axis=1)
    lo = jnp.where(jnp.isfinite(lo), lo, tree.com[0])
    hi = jnp.where(jnp.isfinite(hi), hi, tree.com[0])
    los, his = [lo], [hi]
    for k in range(1, tree.n_levels):
        bfac = los[-1].shape[0] // tree.com[k].shape[0]
        los.append(jnp.min(los[-1].reshape(-1, bfac, 3), axis=1))
        his.append(jnp.max(his[-1].reshape(-1, bfac, 3), axis=1))
    a = [jnp.maximum(h - c, 0.0) for h, c in zip(his, tree.com)]
    b = [jnp.maximum(c - l, 0.0) for l, c in zip(los, tree.com)]
    return a, b


def _support_plane(a, b, ux, uy, uz):
    """Directional support of nodes with half-extents a/b (n, 3) toward the
    per-pair unit direction planes ux/uy/uz (L, n): rows broadcast over
    targets. support = sum_c max(a_c*u_c, -b_c*u_c)."""
    s = jnp.zeros_like(ux)
    for c, u in ((0, ux), (1, uy), (2, uz)):
        s = s + jnp.maximum(a[:, c][None, :] * u, -b[:, c][None, :] * u)
    return s


def masks_for(tree, ext_a, ext_b, theta, variant):
    """Dense per-level acceptance masks under the given MAC variant.
    Returns (far_masks list indexed by level, near_mask (L, n_leaves)).
    variant: iso | target | both."""
    tgt_com, tgt_r = tree.com[0], tree.radius[0]
    ta, tb = ext_a[0], ext_b[0]
    L = tgt_com.shape[0]
    n_levels = tree.n_levels
    far_masks = [None] * n_levels
    active = jnp.ones((L, tree.com[n_levels - 1].shape[0]), bool)

    def mac_plane(k):
        node_com, node_r = tree.com[k], tree.radius[k]
        d2 = jnp.zeros((L, node_com.shape[0]), tgt_com.dtype)
        ds = []
        for c in range(3):
            dc = node_com[:, c][None, :] - tgt_com[:, c][:, None]
            ds.append(dc)
            d2 = d2 + dc * dc
        d = jnp.sqrt(d2)
        inv = 1.0 / jnp.maximum(d, 1e-30)
        ux, uy, uz = ds[0] * inv, ds[1] * inv, ds[2] * inv
        if variant == "iso":
            s_t = tgt_r[:, None] * jnp.ones_like(d)
            size = node_r[None, :] * jnp.ones_like(d)
        else:
            # target support toward the node (direction +u, per-target rows:
            # transpose roles — support of TARGETS, so swap plane axes)
            s_t = _support_plane(ta, tb, ux.T, uy.T, uz.T).T
            s_t = jnp.minimum(s_t, tgt_r[:, None])
            if variant == "both":
                # node support toward the target (direction -u)
                s_s = _support_plane(ext_a[k], ext_b[k], -ux, -uy, -uz)
                size = jnp.minimum(s_s, node_r[None, :])
            else:
                size = node_r[None, :] * jnp.ones_like(d)
        return (MAC * size) < (theta * (d - s_t))

    for k in range(n_levels - 1, 1, -1):
        macp = mac_plane(k)
        far_masks[k] = active & macp
        branch = tree.com[k - 1].shape[0] // tree.com[k].shape[0]
        active = jnp.repeat(active & ~macp, branch, axis=1)
    mac1 = mac_plane(1)
    far_masks[1] = active & mac1
    rej1 = active & ~mac1
    branch0 = tree.com[0].shape[0] // tree.com[1].shape[0]
    cand = jnp.repeat(rej1, branch0, axis=1)
    mac0 = mac_plane(0)
    live_tgt = (tree.mass[0] > 0)[:, None]
    far_masks[0] = cand & mac0 & live_tgt
    near = cand & ~mac0 & live_tgt
    return far_masks, near


def eval_sampled(tree, far_masks, near, pos_s, mass_s, leaf_size,
                 sample_stride, g, eps):
    """BH force for every `sample_stride`-th target leaf from the dense
    masks (quadrupole far eval), plus the direct reference. Returns
    (rms, n_samp_particles)."""
    n_leaves = tree.com[0].shape[0]
    rows = jnp.arange(0, n_leaves, sample_stride)
    p = pos_s.reshape(n_leaves, leaf_size, 3)
    m = mass_s.reshape(n_leaves, leaf_size)
    tgt = p[rows].reshape(-1, 3)                       # (S*G, 3)
    S = rows.shape[0]

    acc = jnp.zeros((S * leaf_size, 3), pos_s.dtype)
    eps2 = jnp.asarray(eps, pos_s.dtype) ** 2
    # far: masked multipole eval per level (quadrupole)
    for k in range(tree.n_levels):
        mask = far_masks[k][rows]                      # (S, n_k)
        npos = jnp.broadcast_to(tree.com[k][None], (S,) + tree.com[k].shape)
        nm = jnp.where(mask, tree.mass[k][None, :], 0.0)
        nq = (jnp.where(mask[..., None], tree.quad[k][None], 0.0)
              if tree.quad[0] is not None else None)
        a, _ = bh._far0_jnp(p[rows], npos, nm, g, eps2, eps == 0.0,
                            block_leaves=max(1, min(S, 8)), node_quad=nq)
        acc = acc + a

    # near: exact, scanned over source leaves
    nm_rows = near[rows]                               # (S, n_leaves)

    def body(carry, j):
        ps, ms, msk = p[j], m[j], nm_rows[:, j]        # (G,3),(G,),(S,)
        d = ps[None, None, :, :] - p[rows][:, :, None, :]
        r2 = jnp.sum(d * d, -1) + eps2
        u = jax.lax.rsqrt(r2)
        if eps == 0.0:
            u = jnp.where(r2 > 0, u, 0.0)
        w = (ms[None, None, :] * msk[:, None, None]) * u * u * u
        return carry + jnp.einsum("sij,sijc->sic", w, d), None

    a_near, _ = jax.lax.scan(body, jnp.zeros((S, leaf_size, 3), pos_s.dtype),
                             jnp.arange(n_leaves))
    acc = acc + g * a_near.reshape(S * leaf_size, 3)

    a_dir = direct_accel_at(pos_s, mass_s, tgt, g=g, softening=eps)
    num = jnp.sqrt(jnp.mean(jnp.sum((acc - a_dir) ** 2, -1)))
    den = jnp.sqrt(jnp.mean(jnp.sum(a_dir ** 2, -1)))
    return float(num / den), int(S * leaf_size)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1048576)
    ap.add_argument("--ic", default="plummer")
    ap.add_argument("--leaf", type=int, default=256)
    ap.add_argument("--thetas", type=float, nargs="+",
                    default=[0.6, 0.72, 0.84])
    ap.add_argument("--variants", nargs="+",
                    default=["iso", "target", "both"])
    ap.add_argument("--stride", type=int, default=64)
    args = ap.parse_args()

    from parallelnbody_tpu.models import get_ic

    cfg = SimConfig(n=args.n, ic=args.ic, softening=0.01, dt=1e-4,
                    force="barnes_hut")
    pos, _, mass = get_ic(args.ic)(jax.random.key(cfg.seed), cfg)
    prep = jax.jit(functools.partial(
        bh._prepare, leaf_size=args.leaf, curve="hilbert",
        multipole_order=2))
    pos_s, mass_s, _, tree, _, _ = prep(pos, mass)
    ext_a, ext_b = jax.jit(functools.partial(
        node_aabbs, leaf_size=args.leaf))(pos_s, mass_s, tree=tree)
    n_leaves = int(tree.com[0].shape[0])
    print(f"backend={jax.default_backend()} n={args.n} ic={args.ic} "
          f"n_leaves={n_leaves}", flush=True)

    stats_fn = {}
    for variant in args.variants:
        for theta in args.thetas:
            far_masks, near = jax.jit(functools.partial(
                masks_for, theta=theta, variant=variant))(tree, ext_a, ext_b)
            near_tiles = int(jnp.sum(near))
            far_leaf = int(jnp.sum(far_masks[0]))
            far_up = sum(int(jnp.sum(far_masks[k]))
                         for k in range(1, tree.n_levels))
            rms, n_samp = eval_sampled(
                tree, far_masks, near, pos_s, mass_s, args.leaf,
                args.stride, 1.0, 0.01)
            print(json.dumps({
                "variant": variant, "theta": theta,
                "near_tiles": near_tiles,
                "near_tiles_per_target": near_tiles / n_leaves,
                "far_leaf_entries": far_leaf, "far_upper_entries": far_up,
                "rms": rms, "n_sampled": n_samp,
            }), flush=True)


if __name__ == "__main__":
    main()
