"""Simulation configuration.

The reference scatters configuration across module-level constants in each
driver script (see reference sesph.py:24-38, dfsph.py:27-41) and physics
coefficients in ParticleData.py:18-88.  Here everything lives in one frozen,
hashable dataclass so the whole step function can be jitted with the config as
a static argument.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """Static configuration for one simulation.

    Everything in here is a Python scalar/tuple so the config is hashable and
    can be passed as a static argument to ``jax.jit``.
    """

    # ---- particle geometry (reference ParticleData.py:18-22, dfsph.py:28) ----
    particle_radius: float = 0.025
    rest_density: float = 1000.0
    # Resolve the boundary volume from the ACTUAL shell sampling at scene
    # setup (Akinci 2012 V_b = 1/sum W over solid neighbors; boundary.py,
    # applied in Simulation.__init__): the reference's constant VS0 is only
    # right for the shell density it was tuned on — 1.0 (dfsph/iisph, dense
    # Poisson shells) under-weights a 2r procedural box enough that liquid
    # drains through the wall.  The per-solver constants below remain the
    # fallback (auto off, or no solids / direct non-Simulation use).
    solid_volume_auto: bool = True
    # VS0 = solid_volume_scale * VL0. The reference uses 2.0 for sesph/pcisph
    # (sesph.py:36) and 1.0 for iisph/dfsph (ParticleData.py:22).
    solid_volume_scale: float = 1.0

    gravity: Tuple[float, float, float] = (0.0, -9.81, 0.0)

    # ---- domain AABB (static; grid shapes derive from it) ----
    domain_min: Tuple[float, float, float] = (-1.1, -1.1, -1.1)
    domain_max: Tuple[float, float, float] = (1.1, 1.1, 1.1)

    # ---- neighbor search (replaces reference HashGrid.py) ----
    # Max particles binned per grid cell (cell size = support radius h = 4r).
    # Rest-density occupancy is 8 at spacing 2r; dam-break compression peaks
    # ~12 (measured).  Pair compute scales with capacity^2 — keep tight and
    # watch diag.neighbor_overflow (the reference's "exceed grid" print,
    # HashGrid.py:73).
    cell_capacity: int = 16
    # Overflow fallback capacity for the engine's non-resident padded-direct
    # step (resident.padded_step_spill).  0 disables.  When > cell_capacity,
    # every step checks (on device, off the already-computed bin ranks)
    # whether cell_capacity would overflow THIS step and, if so, runs the
    # whole packed middle at this wider capacity instead — both sides of one
    # lax.cond.  The common case pays the tight capacity's pack/scatter cost
    # (slot count is linear in capacity); a compression spike keeps every
    # particle interacting instead of dropping it for the step (the
    # reference drops with a host print, HashGrid.py:73).  Compile time
    # roughly doubles (both branches compile).
    cell_capacity_spill: int = 0
    # Max retained neighbors per liquid particle after distance culling.
    max_neighbors: int = 64

    # ---- time stepping (reference dfsph.py:40-41, 107-129) ----
    dt_init: float = 1e-3
    dt_min: float = 1e-4
    dt_max: float = 5e-3
    cfl_factor: float = 0.5
    adaptive_dt: bool = True  # False => fixed dt_init (sesph/pcisph/iisph mode)

    # ---- viscosity (reference ParticleData.py:60-65) ----
    dim_coff: float = 10.0
    viscosity: float = 10.0
    viscosity_b: float = 10.0
    viscosity_err: float = 0.05   # relative PCG tolerance
    max_cg_iters: int = 100
    # Block-Jacobi preconditioner toggle.  The reference publishes its PCG
    # evidence as a cg-vs-precondition_cg iteration curve over the viscosity
    # factor (image/average_iter_num.png; solver in dfsph.py:95-99); False
    # reproduces the plain-CG branch for that comparison.
    viscosity_precond: bool = True
    # Explicit XSPH-style laplacian viscosity used by sesph/pcisph
    # (sesph.py:60-62, pcisph.py:70-72)
    explicit_viscosity: float = 0.1
    explicit_viscosity_b: float = 0.0

    # ---- surface tension (reference ParticleData.py:80-81) ----
    tension_coff: float = 0.0
    tension_coff_b: float = 0.0
    # Reference dfsph.py:300 hard-codes an adhesion region around (0, 0.5, 0)
    # with radius 0.26; exposed as config here.
    adhesion_center: Tuple[float, float, float] = (0.0, 0.5, 0.0)
    adhesion_radius: float = 0.26

    # ---- micropolar vorticity (reference ParticleData.py:85-87) ----
    viscosity_omega: float = 0.1
    vorticity_coff: float = 0.01
    vorticity_init: float = 0.5
    enable_vorticity: bool = True

    # ---- pressure solvers ----
    stiffness: float = 50000.0            # SESPH Tait EOS k (sesph.py:58)
    sesph_eos_exponent: int = 7           # Tait exponent (sesph.py:165)
    pcisph_tol: float = 0.01              # pcisph.py:153
    pcisph_min_iters: int = 3
    pcisph_max_iters: int = 50
    iisph_tol: float = 1e-3               # iisph.py:135
    iisph_min_iters: int = 2
    iisph_max_iters: int = 100
    iisph_omega: float = 0.5              # relaxed Jacobi (iisph.py:78)
    dfsph_tol: float = 1e-3               # dfsph.py:160
    dfsph_min_iters: int = 2
    dfsph_max_iters: int = 100
    dfsph_div_max_iters: int = 10         # dfsph.py:141-143
    dfsph_div_tol: float = 1e-3           # threshold = tol * n_liquid / dt
    # Suppress divergence correction for near-isolated particles
    # (reference dfsph.py:391-392 uses <20 on its loose neighbor count).
    min_div_neighbors: int = 20
    # The reference's pressure warm start is inert (dfsph.py:491 compares the
    # normalized advected density against rho_L0=1000, which never fires, and
    # kappa is zeroed at begin_pressure_iter before use).  Default matches the
    # reference behavior; set True for the intended SPlisHSPlasH warm start.
    pressure_warm_start: bool = False
    divergence_warm_start: bool = True

    # ---- numerics ----
    eps: float = 1e-5
    # Route ALL hot window sweeps (density+alpha, kappa update, divergence
    # accumulation, viscosity matvec/init, vorticity) through the Mosaic
    # sweep engine (pallas/engine.py: plane-tiled DMA, rank-blocked capacity,
    # occupancy skipping).  Off by default (CPU tests would hit the slow
    # pallas interpreter); bench.py enables it on TPU.
    use_pallas: bool = False

    # Resident packed state (resident.py): the particle system lives in the
    # padded engine layout across steps; per-step incremental rebin replaces
    # the full sort/pack/unpack rebuild.  Requires use_pallas.
    resident: bool = False
    # Full re-sort cadence.  Counted ON DEVICE (resident.rebin_auto
    # lax.cond) — a full rebuild also fires whenever the per-step mover
    # count exceeds the budget (spike response), so no particle is ever
    # stale-binned and no host sync exists.  The incremental rebin fills
    # holes from the occupancy bitmask and retries side-buffer particles
    # every step, so the rebuild is only a rank-ceiling decay pass: the
    # cadence can be long (the rebuild's ~164 ms at 1M amortizes to ~2.6
    # ms/step at 64 vs ~20 ms at the pre-hole-filling 8).
    resident_rebuild_every: int = 64
    # Mover budget as a fraction of N.  Every K-sized rebin op (sort, mover
    # gathers, apply scatters) scales with this budget, so it prices the
    # whole rebin: at 1M the rebin trace is ~136 ms at 0.25 and the scatter/
    # gather cost is linear in K.  The steady dam break measures ~2-8%
    # movers/step (CFL bounds displacement to 0.2 cells) with lock-step
    # spikes to ~30% when a coherently falling block crosses a cell plane;
    # a step whose movers exceed the budget takes the full-rebuild branch
    # of rebin_auto instead (nothing is lost or stale-binned).
    resident_mover_frac: float = 0.08
    # Side-buffer capacity (dropped particles keeping state) as fraction of N.
    resident_side_frac: float = 0.02
    # Host-cadenced full rebuild (A/B of the rebin_auto lax.cond): the step
    # program contains ONLY the incremental rebin; Simulation counts the
    # cadence on the host and dispatches rebuild() as a SEPARATE jitted
    # program every resident_rebuild_every steps, or whenever the previous
    # step reported rebin_lost > 0 (a mover spike beyond the budget
    # stale-bins its excess for ONE step, then the rebuild re-sorts).
    # Motivation: the in-program cadenced-rebuild cond branch de-vectorizes
    # into ~22k tiny ops on the remote-TPU platform (launch-gap
    # amplification; ROADMAP round-4 A/B) that every step pays for.
    resident_host_rebuild: bool = False

    # Fuse each DFSPH divergence/pressure iteration's kappa-velocity-update
    # and drho sweeps into ONE Mosaic program (engine._build_fused_iter):
    # per solver iteration this removes a kernel launch, the velocity-update
    # fold, and the liquid-mask-add pass — on the remote-TPU platform each
    # of those thunks pays a launch gap, 4-6x per step.  Engine path only;
    # slab-decomposed runs ignore it (the fused kernel cannot halo-exchange
    # mid-program).
    fused_solver_iters: bool = True

    # AOT executable cache directory (utils/aot.py).  When set, Simulation
    # serializes the compiled step executable keyed on (config, shapes,
    # backend, jax version): a production restart deserializes in seconds
    # instead of re-trace/lower/compile minutes.  "" disables.
    aot_dir: str = ""

    # Pair-math dtype for the XLA window sweeps ("float32" | "bfloat16").
    # bfloat16 halves the HBM traffic of the (C, C, NC) pair temporaries —
    # the bottleneck of the XLA path at 1M particles — at ~0.4% relative
    # error on individual pair terms (7 mantissa bits).  Pair GEOMETRY
    # (positions, distances, masks) always stays float32; only kernel
    # weights and pair products are demoted, and every reduction
    # accumulates in float32.  Measured verdict lives in ROADMAP.md.
    pair_dtype: str = "float32"

    # ------------------------------------------------------------------
    # Derived quantities
    # ------------------------------------------------------------------
    @property
    def grid_r(self) -> float:
        """Reference cell size (HashGrid.py:17): 2 * particle radius."""
        return 2.0 * self.particle_radius

    @property
    def support_radius(self) -> float:
        """SPH support radius h = 4 * particle radius (HashGrid.py:18)."""
        return 4.0 * self.particle_radius

    @property
    def cell_size(self) -> float:
        """Our grid cell size equals h, so a 3x3x3 cell scan covers the
        support sphere (the reference scans 5x5x5 cells of size h/2,
        HashGrid.py:82-85)."""
        return self.support_radius

    @property
    def liquid_volume(self) -> float:
        """V0 = 0.8 * (2r)^3 (ParticleData.py:20)."""
        r = self.particle_radius
        return r * r * r * 0.8 * 8.0

    @property
    def solid_volume(self) -> float:
        return self.liquid_volume * self.solid_volume_scale

    @property
    def liquid_mass(self) -> float:
        return self.liquid_volume * self.rest_density

    @property
    def grid_res(self) -> Tuple[int, int, int]:
        """Static grid resolution derived from the domain AABB."""
        return tuple(
            int(math.floor((self.domain_max[i] - self.domain_min[i]) / self.cell_size)) + 1
            for i in range(3)
        )

    @property
    def num_cells(self) -> int:
        gx, gy, gz = self.grid_res
        return gx * gy * gz

    def replace(self, **kwargs) -> "SimConfig":
        return dataclasses.replace(self, **kwargs)
