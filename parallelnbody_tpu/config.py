"""Simulation configuration.

Everything the reference hardcodes becomes a config field here
(SURVEY.md §5 "Config / flag system"):

  * G = 1e4              reference: OctreeSearch.h:104 (hardcoded)
  * theta = 1.0          reference: OctreeSearch.cpp:85 (hardcoded)
  * dt = 0.01            reference: OctreeSearch.cpp:8 (PhDeltaTime default)
  * softening = 0        reference has none (exact-overlap guard only, h:102)
  * integrator           reference: semi-implicit Euler, OctreeSearch.cpp:28-31
  * ICs                  reference: random slab + central body, OctreeSearch.cpp:58-72

The default profile is the TPU north star (softened gravity, Plummer sphere,
leapfrog KDK, theta=0.5); `reference_compat_config` reproduces the reference's
semantics for apples-to-apples oracle parity.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any

FORCE_METHODS = ("direct", "direct_pallas", "barnes_hut", "auto")
INTEGRATORS = ("leapfrog", "dkd", "euler_semi_implicit", "euler", "yoshida4", "rk4")
IC_KINDS = (
    "plummer",
    "hernquist",
    "uniform_cube",
    "uniform_sphere",
    "cold_sphere",
    "disk",
    "galaxy_collision",
    "reference_slab",
    "two_body",
    "king",
    "nfw",
)


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """Static configuration of one simulation. Hashable → usable as a jit static arg."""

    # --- problem size / physics ---
    n: int = 4096
    dt: float = 0.01
    g: float = 1.0                 # gravitational constant (reference: 1e4, h:104)
    softening: float = 1.0e-2      # Plummer softening length eps (reference: 0, h:102)
    theta: float = 0.5             # Barnes-Hut MAC opening angle (reference: 1.0, .cpp:85)

    # --- algorithms ---
    force: str = "auto"            # direct | direct_pallas | barnes_hut | auto
    integrator: str = "leapfrog"   # see INTEGRATORS
    dtype: str = "float32"
    track_potential: bool = True   # False: skip per-step potential (~7% faster
                                   # hot step); diagnostics recompute on demand

    # --- initial conditions ---
    ic: str = "plummer"
    ic_size: float = 1.0           # characteristic length (reference slab half-extent, h:142)
    seed: int = 0
    virialize: bool = False        # rescale IC speeds so 2K = -W at t=0

    # --- Barnes-Hut parameters ---
    bh_leaf_size: int = 0          # particles per leaf group; 0 = auto
                                   # (scales with n — see resolve_bh_leaf_size)
    bh_near_budget: int = 0        # max exact-interaction source leaves per
                                   # target leaf (self-clamps to n_leaves;
                                   # overflow reported). 0 = AUTO: state-
                                   # owning entry points (Simulation, the
                                   # CLI run/bench, bench_suite) calibrate
                                   # it from the actual t=0 geometry
                                   # (api.calibrate_budgets measures the
                                   # exact per-target maxima and adds
                                   # headroom); paths with no state at hand
                                   # fall back to the conservative static
                                   # default (resolve_bh_near_budget: 3584
                                   # — fat sparse-region leaves can be near
                                   # almost everything, measured max 3488
                                   # of 4096 at N=1M, and the budget costs
                                   # list width, not compute).
    bh_far_budget: int = 0         # max far multipoles per target leaf
                                   # (overflow reported). 0 = AUTO, as
                                   # above (fallback 2816: dense-mode leaf
                                   # multipoles max ~1300 at N=1M
                                   # theta=0.72; staged ALL-classes maxima
                                   # 2547/2528 at auto-leaf N=4M/8M + ~10%
                                   # headroom).
    bh_curve: str = "hilbert"      # hilbert | morton sort order (hilbert has
                                   # no curve jumps -> compact leaves)
    bh_distributed: bool = False   # multi-chip BH: False = replicated tree
                                   # (parallel/sharded.py; best to ~8 chips),
                                   # True = distributed sample-sort + local
                                   # trees + ring near field
                                   # (parallel/distributed.py, SURVEY §7
                                   # stage 6; O(N/P) memory per chip)
    bh_multipole: int = 2          # 1 = monopole, 2 = + traceless quadrupole
                                   # (lets theta open ~2x at equal accuracy)
    bh_max_levels: int = 12
    bh_refine: str = "auto"        # leaf-candidate generation: "dense" =
                                   # the (n_slice, n_leaves) MAC plane (best
                                   # to ~8k leaves), "staged" = hierarchical
                                   # refinement via level-2/level-1
                                   # candidate lists (O(budget) per target;
                                   # scales past 8-16k leaves), "auto" =
                                   # measured best for the leaf count. In
                                   # staged mode bh_far_budget covers ALL
                                   # far classes in one list. (A "block"
                                   # mode was measured never-better and
                                   # retired — docs/DESIGN.md r4.)
    bh_cand_budget: int = 0        # staged: level-1 nodes refined per
                                   # target (0 = auto from the list budgets)
    bh_cand2_budget: int = 0       # staged: level-2 reject candidates per
                                   # target (0 = auto)
    bh_far_mode: str = "auto"      # far-field evaluation: "octet" = one
                                   # (octet_id<<8)|child_mask entry per
                                   # 8-sibling group, evaluated from a
                                   # VMEM-resident table (zero HBM gather;
                                   # bh_far_budget then counts octets, for
                                   # which a per-node budget is always
                                   # enough), "gather" = per-node lists +
                                   # gathered-chunk kernels, "auto" = octet
    bh_sections: int = 0           # evaluate target leaves in this many
                                   # sequential windows (lax.map): the
                                   # traversal/list planes and their sort
                                   # buffers scale with n_leaves/sections,
                                   # closing the measured N=32M single-chip
                                   # compile-OOM. 0 = auto (unsectioned up
                                   # to the measured 16M boundary, then
                                   # ~16k-leaf windows); identical physics
                                   # at any count (ops/bh.py
                                   # resolve_sections)
    bh_pair_slack: float = 2.0     # distributed BH: all_to_all per-rank-pair
                                   # exchange capacity, x (n_local / P).
                                   # Exchange overflow (reported, and treated
                                   # as segment corruption by the fused run)
                                   # means a key-correlated placement sent
                                   # more than cap rows between one rank
                                   # pair: raise this.
    bh_own_slack: float = 0.25     # distributed BH: owned key-range capacity
                                   # headroom over n_local (covers transient
                                   # imbalance between splitter updates)
    bh_comm: str = "ring"          # distributed BH near-field exchange:
                                   # "ring" = ppermute the full owned shard
                                   # P-1 times (O(N/P) volume per pass, P
                                   # near-kernel launches; robust ICI
                                   # default), "let" = locally-essential
                                   # import — one all_to_all fetches ONLY
                                   # the source leaf tiles this rank's near
                                   # lists reference (O(halo) volume, one
                                   # near-kernel launch; the DCN-scale
                                   # design: per-rank comm is the halo
                                   # surface, not N)
    bh_rebuild_every: int = 8      # rebuild the tree GEOMETRY (sort +
                                   # traversal + interaction lists) every
                                   # this many steps inside fused runs;
                                   # between rebuilds only the multipole
                                   # pyramid is refreshed from current
                                   # positions and the frozen lists are
                                   # re-evaluated (classic tree-code
                                   # rebuild interval). k=8 is the SHIPPED
                                   # operating point (r5): measured on v5e
                                   # -5% ms/step at N=1M, -9% at the
                                   # staged scales, sampled rms force
                                   # error vs direct unchanged at 1e-3
                                   # through 8+ reused steps at shipped dt
                                   # (scripts/reuse_probe.py), and
                                   # certified long-horizon — 1000-step
                                   # energy drift through the reuse run is
                                   # 6.7e-8 vs the per-step 4.1e-8, both
                                   # pinned < 1e-6 by the C++-oracle gates
                                   # (tests/test_oracle.py). Set 1 for
                                   # per-step rebuilds (exact per-step
                                   # geometry). Applies to
                                   # make_run on the single-chip
                                   # Barnes-Hut octet path (the auto),
                                   # including sectioned scales up to the
                                   # measured 8M-row capacity gate
                                   # (windowed plan, full-width lists),
                                   # AND to make_distributed_run (ring
                                   # comm + octet far: one repartition +
                                   # one plan per block, _plan_owned/
                                   # _eval_owned); other paths (per-step
                                   # make_step, replicated sharded runs,
                                   # bh_comm=let, far_mode=gather) rebuild
                                   # every step regardless.
    bh_import_budget: int = 0      # let: per-owner-pair import capacity in
                                   # LEAVES (0 = auto = a full neighbor rank
                                   # width — always overflow-free, but the
                                   # dense import table is then ~the GLOBAL
                                   # leaf table: per-rank near-field memory
                                   # O(N), not O(N/P) — the ring is the
                                   # memory-safe default; tune down toward
                                   # the measured halo on DCN meshes,
                                   # scripts/let_halo_probe.py). Missing
                                   # imports are COUNTED into overflow at
                                   # leaf granularity, never silent.

    donate_state: bool = False     # donate the input SimState buffers of
                                   # jitted step/run functions to XLA
                                   # (jax.jit donate_argnums): the runtime
                                   # may reuse them for outputs/temporaries,
                                   # freeing one full copy of the state at
                                   # the jit boundary (~0.7 GB at N=16M) —
                                   # a capacity lever at the 8-32M edge.
                                   # CONTRACT: the caller must treat the
                                   # passed state as consumed (rebind to
                                   # the return value; never call the same
                                   # jitted fn twice on one state object).
                                   # The CLI run loop and Simulation.step
                                   # already rebind. Ignored on backends
                                   # without donation support (CPU).

    # --- Pallas kernel tiling (256x2048 measured best on v5e) ---
    tile_i: int = 256
    tile_j: int = 2048

    # --- parallelism ---
    mesh_shape: tuple = ()         # e.g. (8,) — empty = single device
    mesh_axes: tuple = ("ring",)

    # --- run / io ---
    compile_cache_dir: str = ""    # persistent XLA compilation cache
                                   # directory ("" = disabled). Measured
                                   # 151.8 -> 6.9 s cold-process
                                   # compile+first at N=262k BH through
                                   # the remote TPU backend
                                   # (utils/cache.enable_compile_cache);
                                   # bench artifacts keep it off so
                                   # compile columns stay honest.
    steps: int = 100
    snapshot_every: int = 0        # 0 = no snapshots
    snapshot_dir: str = "snapshots"
    log_every: int = 10
    checkpoint_every: int = 0
    checkpoint_dir: str = "checkpoints"

    def __post_init__(self):
        if self.force not in FORCE_METHODS:
            raise ValueError(f"force must be one of {FORCE_METHODS}, got {self.force!r}")
        if self.integrator not in INTEGRATORS:
            raise ValueError(
                f"integrator must be one of {INTEGRATORS}, got {self.integrator!r}"
            )
        if self.ic not in IC_KINDS:
            raise ValueError(f"ic must be one of {IC_KINDS}, got {self.ic!r}")
        if self.bh_refine not in ("auto", "dense", "staged"):
            raise ValueError(
                f"bh_refine must be auto|dense|staged, "
                f"got {self.bh_refine!r}")
        if self.bh_far_mode not in ("auto", "octet", "gather"):
            raise ValueError(
                f"bh_far_mode must be auto|octet|gather, "
                f"got {self.bh_far_mode!r}")
        if self.bh_comm not in ("ring", "let"):
            raise ValueError(
                f"bh_comm must be ring|let, got {self.bh_comm!r}")
        if self.bh_import_budget < 0:
            raise ValueError(
                f"bh_import_budget must be >= 0 (0 = auto), "
                f"got {self.bh_import_budget}")
        if self.bh_pair_slack <= 0:
            raise ValueError(
                f"bh_pair_slack must be > 0 (it scales the distributed "
                f"exchange capacity), got {self.bh_pair_slack}")
        if self.bh_own_slack < 0:
            raise ValueError(
                f"bh_own_slack must be >= 0, got {self.bh_own_slack}")
        if self.bh_cand_budget < 0 or self.bh_cand2_budget < 0:
            raise ValueError(
                f"bh_cand_budget/bh_cand2_budget must be >= 0 (0 = auto), "
                f"got {self.bh_cand_budget}/{self.bh_cand2_budget}")
        if self.bh_rebuild_every < 1:
            raise ValueError(
                f"bh_rebuild_every must be >= 1 (1 = rebuild every step), "
                f"got {self.bh_rebuild_every}")
        if self.bh_sections < 0:
            raise ValueError(
                f"bh_sections must be >= 0 (0 = auto), "
                f"got {self.bh_sections}")
        if self.n <= 0:
            raise ValueError("n must be positive")
        if self.dt <= 0:
            raise ValueError(
                "dt must be positive (the reference pauses on PhDeltaTime <= 0, "
                "OctreeSearch.cpp:25; pausing is a host-loop concern here)"
            )
        # normalize tuples (JSON round-trips lists)
        object.__setattr__(self, "mesh_shape", tuple(self.mesh_shape))
        object.__setattr__(self, "mesh_axes", tuple(self.mesh_axes))

    # ------------------------------------------------------------------ utils
    def replace(self, **kw) -> "SimConfig":
        return dataclasses.replace(self, **kw)

    # Measured v5e crossover (scripts/crossover_probe.py, plummer, shipped
    # BH point quad theta=0.72, ms/step direct_pallas vs barnes_hut):
    # 8192: 7.4 vs 8.3 | 16384: 7.7 vs 9.3 | 32768: 14.4 vs 11.8 |
    # 65536: 29.1 vs 27.4 | 131072: 100.5 vs 41.3. Barnes-Hut wins from
    # 32768 up and the O(N^2)/O(N log N) gap only widens above. Below the
    # crossover the all-pairs kernel is both faster AND exact (BH at the
    # default theta carries ~1e-3 rms) — callers who want BH-class speed
    # with direct-sum accuracy at 32-65k should still pick force
    # explicitly, where the two are within ~10-20%.
    AUTO_BH_CROSSOVER = 32768

    def resolve_bh_leaf_size(self) -> int:
        """Resolve bh_leaf_size=0 to a measured-best size for this n (v5e:
        128 wins at 262k — 78 vs 90 ms — fatter relative leaves there; 256
        everywhere above). The round-3 512 tier at N>=4M existed only to
        keep the dense list plane at 8192^2; the staged lists (auto above
        8192 leaves) removed that constraint, and leaf 256 measured 28%
        faster at N=4M (1025 vs 1421 ms) and 24% at N=8M."""
        if self.bh_leaf_size:
            return self.bh_leaf_size
        return 128 if self.n <= (1 << 19) else 256

    # Static fallbacks for bh_near_budget / bh_far_budget = 0 when no state
    # is at hand to calibrate against (api.calibrate_budgets is the real
    # auto): conservative covers measured across the shipped configs.
    FALLBACK_NEAR_BUDGET = 3584
    FALLBACK_FAR_BUDGET = 2816

    def resolve_bh_near_budget(self) -> int:
        """bh_near_budget with the 0=auto sentinel resolved to the static
        fallback. Entry points that own a state should first replace the
        config via api.calibrate_budgets (measures the exact t=0 maxima);
        this resolver is the no-state fallback every consumer reads."""
        return self.bh_near_budget or self.FALLBACK_NEAR_BUDGET

    def resolve_bh_far_budget(self) -> int:
        return self.bh_far_budget or self.FALLBACK_FAR_BUDGET

    def resolve_bh_refine(self) -> str:
        """Resolve bh_refine='auto': the dense leaf plane is O(n_leaves) per
        target — measured faster up to 4096 leaves (N=1M/256: 259 vs
        270 ms), slower by 8192 (N=2M galaxy: 664 vs 624 ms), and a memory
        wall past ~16k; staged hierarchical refinement takes over at 8192
        leaves. The leaf count matches plan_tree's next-power-of-two
        padding (ADVICE r3: ceil(n/leaf) alone under-counted for n in
        (1M, 2M] and resolved 'dense' against the measured crossover)."""
        if self.bh_refine != "auto":
            return self.bh_refine
        from parallelnbody_tpu.ops.bh import plan_tree

        n_leaves, _, _ = plan_tree(self.n, self.resolve_bh_leaf_size())
        return "staged" if n_leaves >= 8192 else "dense"

    def resolve_force(self, backend: str | None = None) -> str:
        """Resolve force='auto' to a concrete method for the current backend:
        Barnes-Hut above AUTO_BH_CROSSOVER, the Pallas all-pairs kernel on
        TPU below it (plain jnp direct sum elsewhere / at trivial N)."""
        if self.force != "auto":
            return self.force
        import jax

        backend = backend or jax.default_backend()
        if self.n >= self.AUTO_BH_CROSSOVER:
            return "barnes_hut"
        # The Pallas kernel wins on TPU for anything beyond trivial N (and
        # compiles far faster than the fused O(N^2) jnp graph).
        if backend == "tpu" and self.n >= 512:
            try:
                import parallelnbody_tpu.ops.pallas_direct  # noqa: F401

                return "direct_pallas"
            except ImportError:
                return "direct"
        return "direct"

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, text: str) -> "SimConfig":
        data: dict[str, Any] = json.loads(text)
        return cls(**data)

    @property
    def n_devices(self) -> int:
        out = 1
        for s in self.mesh_shape:
            out *= s
        return out


def reference_compat_config(n: int = 1024, size: float = 200.0) -> SimConfig:
    """Config reproducing the reference's hardcoded semantics.

    Force law a += G*M/d^3 * (CoM - x) with G=1e4 and no softening
    (OctreeSearch.h:104,102), theta=1.0 (OctreeSearch.cpp:85), semi-implicit
    Euler with dt=0.01 (OctreeSearch.cpp:8,28-31), slab ICs with a central body
    (OctreeSearch.cpp:58-72).
    """
    return SimConfig(
        n=n,
        dt=0.01,
        g=1.0e4,
        softening=0.0,
        theta=1.0,
        integrator="euler_semi_implicit",
        ic="reference_slab",
        ic_size=size,
        force="direct",
    )
