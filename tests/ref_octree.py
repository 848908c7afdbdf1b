"""Test-only oracle: the reference's pointer-octree Barnes-Hut, re-implemented
in Python from its observed semantics (NOT a code copy — the reference is UE4
C++; this reproduces behavior for apples-to-apples parity tests).

Semantics reproduced, with reference citations (SURVEY.md C2-C6, C9-C10):

  * Octant select: bit-packed index from the sign of (point - origin) per
    axis, X->bit2 Y->bit1 Z->bit0            (OctreeSearch.h:50-56)
  * Insert: one particle per leaf; collision subdivides into 8 children with
    centers at origin +- Size/2 and child size Size/2, then reinserts both;
    leaf <=> children[0] is None             (OctreeSearch.h:58-81)
  * Mass summary: post-order; leaf -> (particle mass, position); empty
    internal children get CoM = their origin (OctreeSearch.h:83-97)
  * Force/MAC: accept a node if Size/d < theta OR it is a single-particle
    leaf; then a += G*M/d^3 * (CoM - x), G default 1e4, no softening, exact
    d == 0 overlap guard                     (OctreeSearch.h:99-108)
  * Driver: root origin = PREVIOUS tree's CoM (world origin on the first
    build); root Size = max |coordinate| over particles; theta = 1.0
                                             (OctreeSearch.cpp:47-56, 74-89)
"""

from __future__ import annotations

import numpy as np


class RefOctree:
    __slots__ = ("origin", "size", "children", "particle", "mass", "com")

    def __init__(self, origin, size):
        self.origin = np.asarray(origin, np.float64)
        self.size = float(size)
        self.children = None          # None <=> leaf (h:58)
        self.particle = None          # (pos, mass) when an occupied leaf
        self.mass = 0.0
        self.com = np.zeros(3)

    def octant(self, point):
        """Bit-packed octant of `point` relative to origin (h:50-56)."""
        o = 0
        if point[0] >= self.origin[0]:
            o |= 4
        if point[1] >= self.origin[1]:
            o |= 2
        if point[2] >= self.origin[2]:
            o |= 1
        return o

    def _subdivide(self):
        half = self.size / 2.0
        self.children = []
        for o in range(8):
            off = np.array([half if o & 4 else -half,
                            half if o & 2 else -half,
                            half if o & 1 else -half])
            self.children.append(RefOctree(self.origin + off, half))

    def add(self, pos, mass):
        """Recursive insert with subdivide-on-collision (h:60-81). No bounds
        check anywhere — mirrors the reference, whose root origin (prev CoM)
        and size are mutually inconsistent by design (SURVEY C10 note)."""
        if self.children is None:
            if self.particle is None:
                self.particle = (np.asarray(pos, np.float64), float(mass))
                return
            old = self.particle
            self.particle = None
            self._subdivide()
            self.children[self.octant(old[0])].add(*old)
            self.children[self.octant(pos)].add(pos, mass)
        else:
            self.children[self.octant(pos)].add(pos, mass)

    def compute_mass(self):
        """Post-order mass/CoM; empty nodes get CoM = origin (h:83-97)."""
        if self.children is None:
            if self.particle is None:
                self.mass, self.com = 0.0, self.origin.copy()
            else:
                self.com, self.mass = self.particle[0].copy(), self.particle[1]
            return
        m, c = 0.0, np.zeros(3)
        for ch in self.children:
            ch.compute_mass()
            m += ch.mass
            c += ch.mass * ch.com
        self.mass = m
        self.com = c / m if m > 0 else self.origin.copy()

    def force(self, pos, theta, g):
        """Accumulated acceleration at `pos` (h:99-108)."""
        if self.children is None and self.particle is None:
            return np.zeros(3)
        d = self.com - pos
        dist = float(np.linalg.norm(d))
        if dist == 0.0:               # exact-overlap/self guard (h:102)
            return np.zeros(3)
        if self.children is None or self.size / dist < theta:
            return (g * self.mass / dist**3) * d
        acc = np.zeros(3)
        for ch in self.children:
            acc += ch.force(pos, theta, g)
        return acc


def ref_bh_forces(pos, mass, theta=1.0, g=1.0e4, prev_com=None):
    """One CreateOctree + per-particle ComputeForces pass
    (OctreeSearch.cpp:74-89): root at prev CoM (origin on first build),
    root size = max abs coordinate (ComputeCubeSize, .cpp:47-56)."""
    pos = np.asarray(pos, np.float64)
    mass = np.asarray(mass, np.float64)
    origin = np.zeros(3) if prev_com is None else np.asarray(prev_com)
    size = float(np.max(np.abs(pos)))
    tree = RefOctree(origin, size)
    for p, m in zip(pos, mass):
        tree.add(p, m)
    tree.compute_mass()
    acc = np.stack([tree.force(p, theta, g) for p in pos])
    return acc, tree
