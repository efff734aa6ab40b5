"""Perf-grade multi-chip: RESIDENT slab decomposition with ghost planes.

The round-3 slab path (parallel/slab.py) is correctness-grade: it re-sorts
every slab every step (argsort + pack/unpack per step), runs the non-padded
SweepEngine with per-sweep lift/lower glue, and cannot use the fused
per-iteration kernels (a fused two-stencil program cannot halo-exchange
between its phases).  This module is the perf-grade replacement — the
single-chip resident step's structure (resident.py + PaddedEngine +
fused_iter_full), decomposed over a 1-D device mesh of x-slabs:

* **Resident seats.**  Each device permanently owns the particles inside its
  x-slab, stored IN the padded (NX_loc, C, PP) engine layout (pid carries
  GLOBAL particle ids; liquid = pid < n_liquid).  Per step an incremental
  hole-filling rebin relocates only the movers (resident.py semantics);
  particles whose new cell crosses the slab boundary ppermute to the
  neighbor as fixed-size payloads and join its placement candidates.  No
  per-step argsort, no global op of any kind.

* **Two ghost planes per side.**  The local plan covers gxl own planes + 2
  ghost planes on each side (+ the engine's empty sentinel planes):

      [ sentinel | g1 g2 | own_0 .. own_{gxl-1} | g2' g1' | sentinel ]

  Ghost planes hold copies of the neighbor's outermost own planes,
  refreshed by ppermute before every sweep chain.  Depth 2 is what makes
  the FUSED two-stencil kernels (engine._build_fused_iter_full /
  _build_fused_iter: velocity update THEN divergence in one Mosaic program)
  correct under decomposition: stencil A's output is correct at own planes
  and at the inner ghost g2 (g2 reads g1), so stencil B's reads of A(g2)
  from the first own plane are exact — the classic deep-halo redundant-
  compute trick, with no mid-program exchange needed.  Outer-ghost (g1)
  outputs are incomplete and always discarded by the next refresh.

* **Halo exchange at iteration boundaries.**  Each solver-loop iteration
  refreshes the pair-read carried fields (velocity, drho/advected density)
  with ONE bidirectional ppermute pair of stacked 2-plane slices, runs the
  whole-iteration fused kernel locally, and psums the error scalar.  The
  in-kernel SMEM error sums cover ghost rows (they would double-count
  across devices), so the adapter recomputes the global error from the
  returned field over OWN liquid slots + psum.

* The viscosity PCG and the IISPH/PCISPH loops run their per-sweep engine
  paths (their fused kernels chain a data-dependent scalar or a
  freshly-swept field between phases, which genuinely requires an exchange
  mid-program); each sweep's pair-read inputs are refreshed by the adapter,
  and the PCG dot products ride comm.lsum -> psum.

The reference is single-GPU (SURVEY.md §2 parallelism table, HashGrid.py
rebuilds globally every frame); this is the framework's own scaling bar
(SURVEY §2 P6 / VERDICT r3 item 5).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..config import SimConfig
from ..grid import EMPTY_POS
from ..pallas.engine import _MARGIN, PaddedEngine, make_plan
from ..state import FluidState, StepDiagnostics
from .comm import AXIS

GHOST = 2          # ghost planes per side (fused kernels chain 2 stencils)


class SlabResState(NamedTuple):
    """Sharded resident-slab state.  Padded arrays are (n_dev*NXl, C, PP)
    on the plane axis (each device's block includes its own ghost+sentinel
    planes); side buffers are (…, n_dev*S) on the seat axis."""

    pid: jnp.ndarray          # (n*NXl, C, PP) int32 GLOBAL pid, -1 empty
    xp: jnp.ndarray           # (3, n*NXl, C, PP)
    dyn: tuple                # per-solver padded fields ((k, n*NXl, C, PP))
    side_pos: jnp.ndarray     # (3, n*S)
    side_dyn: jnp.ndarray     # (D, n*S)
    side_pid: jnp.ndarray     # (n*S,) int32, -1 empty
    since_rebuild: jnp.ndarray  # (n,) int32 per-device
    overflow: jnp.ndarray     # (n,) int32 side-buffer occupancy per device
    lost: jnp.ndarray         # (n,) int32 dropped (budget/capacity spill)
    dt: jnp.ndarray
    time: jnp.ndarray
    last_visc_iters: jnp.ndarray
    last_pressure_iters: jnp.ndarray
    diag: object
    n_liquid: int             # static
    n_dev: int                # static


jax.tree_util.register_pytree_node(
    SlabResState,
    lambda s: (tuple(s)[:-2], (s.n_liquid, s.n_dev)),
    lambda aux, c: SlabResState(*c, *aux))


# ---------------------------------------------------------------------------
# Local geometry
# ---------------------------------------------------------------------------

def _gxl(cfg: SimConfig, n: int) -> int:
    gx = cfg.grid_res[0]
    assert gx % n == 0, "use halo.slab_config() to pad the domain"
    return gx // n


def local_cfg(cfg: SimConfig, n: int) -> SimConfig:
    """Config whose grid is one slab's REAL planes: gxl own + 2*GHOST ghost
    planes (the engine plan adds its empty sentinel planes around these)."""
    import dataclasses
    gxl = _gxl(cfg, n)
    gx_loc = gxl + 2 * GHOST
    new_max = (cfg.domain_min[0] + (gx_loc - 0.5) * cfg.cell_size,
               cfg.domain_max[1], cfg.domain_max[2])
    out = dataclasses.replace(cfg, domain_max=new_max)
    assert out.grid_res == (gx_loc,) + cfg.grid_res[1:], out.grid_res
    return out


def _flat_slot(plan, p_real, rank, pp_minor):
    """Padded flat slot of (real plane p_real, rank, minor cell)."""
    return ((p_real + 1) * plan.C + rank) * plan.PP + (_MARGIN + pp_minor)


def _dest_cells(cfg: SimConfig, n: int, dev: jnp.ndarray, pos: jnp.ndarray):
    """(real-plane index, minor cell, global inbox, own mask) of planar
    GLOBAL positions on device ``dev``.  Own planes are real indices
    [GHOST, GHOST + gxl)."""
    gx, gy, gz = cfg.grid_res
    gxl = gx // n
    dmin = cfg.domain_min
    inv = 1.0 / cfg.cell_size
    cx = jnp.floor((pos[0] - dmin[0]) * inv).astype(jnp.int32)
    cy = jnp.floor((pos[1] - dmin[1]) * inv).astype(jnp.int32)
    cz = jnp.floor((pos[2] - dmin[2]) * inv).astype(jnp.int32)
    inbox = ((cx >= 0) & (cx < gx) & (cy >= 0) & (cy < gy)
             & (cz >= 0) & (cz < gz))
    p_real = cx - dev * gxl + GHOST
    own = inbox & (p_real >= GHOST) & (p_real < GHOST + gxl)
    return p_real, cy * gz + cz, inbox, own


def _own_plane_mask(plan, gxl: int) -> np.ndarray:
    """(NXl, 1, 1) bool: padded planes [1+GHOST, 1+GHOST+gxl) are owned."""
    m = np.zeros((plan.NX, 1, 1), bool)
    m[1 + GHOST:1 + GHOST + gxl] = True
    return m


def _slot_home(plan, cfg_loc: SimConfig):
    """Per-slot (real plane, minor cell, in-frame) in the LOCAL padded
    layout (resident._slot_cells twin, split coordinates)."""
    px = jnp.arange(plan.NX, dtype=jnp.int32)[:, None, None] - 1
    pp = jnp.arange(plan.PP, dtype=jnp.int32)[None, None, :] - _MARGIN
    ok = ((px >= 0) & (px < plan.gx) & (pp >= 0) & (pp < plan.P))
    return px, pp, ok


# ---------------------------------------------------------------------------
# Ghost refresh (the one communication primitive)
# ---------------------------------------------------------------------------

def _refresh(arrs: Sequence[jnp.ndarray], fills, n: int, gxl: int):
    """Fill the 2*GHOST ghost planes of each padded (…, NXl, C, PP) array
    from the ring neighbors' outermost OWN planes: ONE bidirectional
    ppermute pair for the whole stacked set.  Edge devices keep sentinel
    fills.  Sentinel planes (padded 0 / NXl-1) stay empty by construction.
    """
    idx = jax.lax.axis_index(AXIS)
    lo = 1 + GHOST                      # first own padded plane
    hi = lo + gxl                       # one past last own
    stacked = jnp.concatenate(
        [a if a.ndim == 4 else a[None] for a in arrs], axis=0)
    rows = stacked.shape[0]
    fill_col = jnp.concatenate([
        jnp.full((a.shape[0] if a.ndim == 4 else 1,), f, jnp.float32)
        for a, f in zip(arrs, fills)])[:, None, None, None]

    right = [(i, (i + 1) % n) for i in range(n)]
    left = [(i, (i - 1) % n) for i in range(n)]
    # my first GHOST own planes -> left neighbor's right ghosts; my last
    # GHOST own planes -> right neighbor's left ghosts
    from_left = jax.lax.ppermute(stacked[:, hi - GHOST:hi], AXIS, right)
    from_right = jax.lax.ppermute(stacked[:, lo:lo + GHOST], AXIS, left)
    from_left = jnp.where(idx == 0, fill_col, from_left)
    from_right = jnp.where(idx == n - 1, fill_col, from_right)
    out = jax.lax.dynamic_update_slice_in_dim(stacked, from_left, 1, axis=1)
    out = jax.lax.dynamic_update_slice_in_dim(out, from_right, hi, axis=1)

    res, o = [], 0
    for a in arrs:
        k = a.shape[0] if a.ndim == 4 else 1
        sl = out[o:o + k]
        res.append(sl if a.ndim == 4 else sl[0])
        o += k
    return res


def _refresh_pid(pid: jnp.ndarray, n: int, gxl: int) -> jnp.ndarray:
    """Ghost refresh of the int32 pid planes (own ppermute pair: ints must
    not ride the float stack — valid pids bitcast to denormals and -1 to a
    NaN, which risks FTZ/canonicalization en route)."""
    idx = jax.lax.axis_index(AXIS)
    lo = 1 + GHOST
    hi = lo + gxl
    right = [(i, (i + 1) % n) for i in range(n)]
    left = [(i, (i - 1) % n) for i in range(n)]
    from_left = jax.lax.ppermute(pid[hi - GHOST:hi], AXIS, right)
    from_right = jax.lax.ppermute(pid[lo:lo + GHOST], AXIS, left)
    from_left = jnp.where(idx == 0, -1, from_left)
    from_right = jnp.where(idx == n - 1, -1, from_right)
    out = jax.lax.dynamic_update_slice_in_dim(pid, from_left, 1, axis=0)
    return jax.lax.dynamic_update_slice_in_dim(out, from_right, hi, axis=0)


# ---------------------------------------------------------------------------
# Engine + communicator adapters
# ---------------------------------------------------------------------------

class _GridView(NamedTuple):
    """Minimal grid view PaddedEngine.from_resident consumes."""

    pid: jnp.ndarray
    liquid: jnp.ndarray
    xp: jnp.ndarray
    slot: jnp.ndarray = None      # unused under slabs (no unpack_many)


class PaddedSlabComm:
    """PaddedNoComm twin over one slab: reductions mask to OWN planes and
    psum over the mesh axis; lift/lower identity (the engine adapter
    refreshes pair-read ghosts itself)."""

    def __init__(self, grid_view, cfg_loc: SimConfig, engine, own_liq):
        self.grid = grid_view
        self.cfg = cfg_loc
        self.engine = engine
        self._liq = own_liq

    def lift(self, q, fill=0.0):
        return q

    def lower(self, q):
        return q

    def lsum(self, x):
        return jax.lax.psum(jnp.sum(jnp.where(self._liq, x, 0.0)), AXIS)

    def lmax(self, x):
        return jax.lax.pmax(
            jnp.max(jnp.where(self._liq, x, -jnp.inf)), AXIS)

    def n_liquid(self):
        return jax.lax.psum(jnp.sum(self._liq), AXIS).astype(jnp.float32)


class SlabPaddedEngine:
    """PaddedEngine adapter for one slab: every op refreshes the ghost
    planes of its PAIR-READ dynamic inputs (receiver-only inputs skip the
    exchange), then runs the local Mosaic sweep.  The fused DFSPH iteration
    kernels are exposed (2-deep ghosts make their two chained stencils
    exact at own planes — module docstring); the fused IISPH/PCISPH/
    viscosity kernels are deliberately ABSENT so engine.use_fused_iters
    routes those loops to their per-sweep paths."""

    def __init__(self, base: PaddedEngine, n: int, gxl: int, own_liq):
        self._e = base
        self._n = n
        self._gxl = gxl
        self._own_liq = own_liq
        self.plan = base.plan
        self.liq_mask = base.liq_mask
        self.liq_pad = base.liq_pad
        self.sol_pad = base.sol_pad
        self.vol_pad = base.vol_pad

    @property
    def xp_owned(self):
        return self._e.xp_pad

    # -- plumbing -----------------------------------------------------------

    def _r(self, arrs, fills=None):
        fills = fills or [0.0] * len(arrs)
        return _refresh(arrs, fills, self._n, self._gxl)

    def _own_err(self, field, sub=0.0):
        """Global error over OWN liquid slots (the fused kernels' in-kernel
        SMEM sums cover ghost rows; recompute + psum)."""
        return jax.lax.psum(
            jnp.sum(jnp.where(self._own_liq, field - sub, 0.0)), AXIS)

    # -- single-sweep ops (refresh pair-read args, run local) ---------------

    def density_alpha(self, with_alpha: bool = True, velp=None):
        if velp is not None:
            (velp,) = self._r([velp])
            return self._e.density_alpha(with_alpha, velp)
        return self._e.density_alpha(with_alpha)

    def kappa_velocity_update(self, velp, kp, dt):
        (kp,) = self._r([kp])
        return self._e.kappa_velocity_update(velp, kp, dt)

    def drho_divergence(self, velp, countp):
        (velp,) = self._r([velp])
        return self._e.drho_divergence(velp, countp)

    def advected_density(self, velp, rhop, dt):
        (velp,) = self._r([velp])
        return self._e.advected_density(velp, rhop, dt)

    def sesph_force(self, velp, rhop, pp):
        velp, rhop, pp = self._r([velp, rhop, pp], [0.0, 1.0, 0.0])
        return self._e.sesph_force(velp, rhop, pp)

    def pcisph_predict(self, xstarp, pp):
        xstarp, pp = self._r([xstarp, pp], [EMPTY_POS, 0.0])
        return self._e.pcisph_predict(xstarp, pp)

    def iisph_adv(self, velp):
        (velp,) = self._r([velp])
        return self._e.iisph_adv(velp)

    def iisph_aii(self, dii):
        (dii,) = self._r([dii])
        return self._e.iisph_aii(dii)

    def iisph_dij(self, fac):
        (fac,) = self._r([fac])
        return self._e.iisph_dij(fac)

    def iisph_s(self, dii, dij, p_liq, g):
        dii, dij, p_liq, g = self._r([dii, dij, p_liq, g])
        return self._e.iisph_s(dii, dij, p_liq, g)

    def iisph_force(self, dpi):
        (dpi,) = self._r([dpi])
        return self._e.iisph_force(dpi)

    def surface_normals(self, rhop):
        (rhop,) = self._r([rhop], [1.0])
        return self._e.surface_normals(rhop)

    def tension_accel(self, rhop, normalp):
        rhop, normalp = self._r([rhop, normalp], [1.0, 0.0])
        return self._e.tension_accel(rhop, normalp)

    def visc_matvec(self, xv, rhop, dt):
        xv, rhop = self._r([xv, rhop], [0.0, 1.0])
        return self._e.visc_matvec(xv, rhop, dt)

    def visc_init(self, x0, rhop, dt):
        x0, rhop = self._r([x0, rhop], [0.0, 1.0])
        return self._e.visc_init(x0, rhop, dt)

    def vorticity(self, velp, omegap, rhop, countp, dt):
        velp, omegap, rhop = self._r([velp, omegap, rhop], [0.0, 0.0, 1.0])
        return self._e.vorticity(velp, omegap, rhop, countp, dt)

    # -- fused DFSPH iterations (the multi-chip fused path) ------------------

    def fused_kappa_drho(self, velp, kfp, gatep, acc_seed):
        """Warm-start velocity update + drho of the result in ONE kernel:
        kf is pair-read (refresh), the gate is receiver-only.  Stencil A's
        result is exact at own+g2 planes, so stencil B (drho) is exact at
        own planes — no mid-program exchange."""
        velp, kfp = self._r([velp, kfp])
        return self._e.fused_kappa_drho(velp, kfp, gatep, acc_seed)

    def fused_iter_full(self, velp, kvp, sp, alphacp, pauxp, dt, mode,
                        acc_seed):
        """A WHOLE DFSPH divergence/pressure iteration per device + one
        ghost refresh of the carried pair-read fields (vel, drho/adv,
        alpha coefficient) + one psum'd error — halo exchange at iteration
        boundaries (VERDICT r3 item 5).  ``mode`` is static (0 divergence,
        1 pressure)."""
        velp, sp, alphacp = self._r([velp, sp, alphacp])
        vel, acc, s_new, kv, _scal = self._e.fused_iter_full(
            velp, kvp, sp, alphacp, pauxp, dt, mode, acc_seed)
        err = self._own_err(s_new, sub=0.0 if mode == 0.0 else 1.0)
        return vel, acc, s_new, kv, jnp.stack([err])


def _build_local_engine(cfg_loc: SimConfig, pid, xp, n_liquid: int,
                        n: int, gxl: int, interpret=None):
    valid = pid >= 0
    liquid = valid & (pid < n_liquid)
    gv = _GridView(pid=pid, liquid=liquid,
                   xp=jnp.where(valid[None], xp, EMPTY_POS))
    base = PaddedEngine.from_resident(gv, cfg_loc, interpret=interpret)
    own = jnp.asarray(_own_plane_mask(base.plan, gxl))
    own_liq = liquid & own
    eng = SlabPaddedEngine(base, n, gxl, own_liq)
    comm = PaddedSlabComm(gv, cfg_loc, eng, own_liq)
    return eng, comm, own_liq


# ---------------------------------------------------------------------------
# Initial seating (host-side numpy; not the hot path)
# ---------------------------------------------------------------------------

def slab_res_init(state: FluidState, cfg: SimConfig, mesh: Mesh,
                  dyn_names: Sequence[str]) -> SlabResState:
    """Seat every particle in its owning slab's padded layout (ghost planes
    empty — the step's first refresh fills them)."""
    n = mesh.devices.size
    gxl = _gxl(cfg, n)
    cfg_loc = local_cfg(cfg, n)
    plan = make_plan(cfg_loc, cfg.cell_capacity)
    nl = state.n_liquid
    gy, gz = cfg.grid_res[1], cfg.grid_res[2]

    pos = np.asarray(state.pos)
    inv = 1.0 / cfg.cell_size
    cx = np.floor((pos[0] - cfg.domain_min[0]) * inv).astype(np.int64)
    cy = np.floor((pos[1] - cfg.domain_min[1]) * inv).astype(np.int64)
    cz = np.floor((pos[2] - cfg.domain_min[2]) * inv).astype(np.int64)
    inbox = ((cx >= 0) & (cx < cfg.grid_res[0]) & (cy >= 0) & (cy < gy)
             & (cz >= 0) & (cz < gz))
    dev = np.clip(cx // gxl, 0, n - 1)
    p_real = cx - dev * gxl + GHOST
    minor = cy * gz + cz
    # global sort key: (device, local cell) -> rank within cell
    nc_loc = cfg_loc.num_cells
    key = np.where(inbox, dev * nc_loc + p_real * plan.P + minor,
                   n * nc_loc)
    order = np.argsort(key, kind="stable")
    sk = key[order]
    rank = np.arange(len(order)) - np.maximum.accumulate(
        np.where(np.concatenate([[True], sk[1:] != sk[:-1]]),
                 np.arange(len(order)), 0))
    ok = (rank < plan.C) & (sk < n * nc_loc)

    NXl = plan.NX
    nflat_dev = NXl * plan.C * plan.PP
    flat = (dev[order] * nflat_dev
            + ((p_real[order] + 1) * plan.C + rank) * plan.PP
            + (_MARGIN + minor[order]))
    pid_flat = np.full((n * nflat_dev,), -1, np.int32)
    pid_flat[flat[ok]] = order[ok].astype(np.int32)
    xp_flat = np.full((3, n * nflat_dev), EMPTY_POS, np.float32)
    xp_flat[:, flat[ok]] = pos[:, order[ok]]

    dyn_fields = [np.asarray(getattr(state, nm)) for nm in dyn_names]
    D = sum(3 if f.ndim == 2 else 1 for f in dyn_fields)
    dyn_out = []
    for f in dyn_fields:
        f2 = f[None] if f.ndim == 1 else f
        buf = np.zeros((f2.shape[0], n * nflat_dev), np.float32)
        liq_ok = ok & (order < nl)
        buf[:, flat[liq_ok]] = f2[:, order[liq_ok]]
        buf = buf.reshape(f2.shape[0], n * NXl, plan.C, plan.PP)
        # solver middles take scalar padded fields 3-dim (resident.py
        # pack_many_padded convention)
        dyn_out.append(jnp.asarray(buf[0] if f.ndim == 1 else buf))

    # unplaced (overflow / out of box) -> per-device side buffers
    S = max(256, int(state.n_total * cfg.resident_side_frac) // n)
    side_pos = np.full((3, n * S), EMPTY_POS, np.float32)
    side_dyn = np.zeros((D, n * S), np.float32)
    side_pid = np.full((n * S,), -1, np.int32)
    ovf = np.zeros((n,), np.int32)
    un = order[~ok]
    if len(un):
        stacked = np.concatenate(
            [f[None] if f.ndim == 1 else f for f in dyn_fields], axis=0)
        for p in un:
            d = int(dev[p]) if inbox[p] else int(np.clip(dev[p], 0, n - 1))
            if ovf[d] < S:
                seat = d * S + ovf[d]
                side_pos[:, seat] = pos[:, p]
                if p < nl:
                    side_dyn[:, seat] = stacked[:, p]
                side_pid[seat] = p
                ovf[d] += 1

    return SlabResState(
        pid=jnp.asarray(pid_flat.reshape(n * NXl, plan.C, plan.PP)),
        xp=jnp.asarray(xp_flat.reshape(3, n * NXl, plan.C, plan.PP)),
        dyn=tuple(dyn_out),
        side_pos=jnp.asarray(side_pos), side_dyn=jnp.asarray(side_dyn),
        side_pid=jnp.asarray(side_pid),
        since_rebuild=jnp.zeros((n,), jnp.int32),
        overflow=jnp.asarray(ovf), lost=jnp.zeros((n,), jnp.int32),
        dt=state.dt, time=state.time,
        last_visc_iters=state.last_visc_iters,
        last_pressure_iters=state.last_pressure_iters,
        diag=state.diag, n_liquid=nl, n_dev=n)


def gather_state(srs: SlabResState, proto: FluidState,
                 dyn_names: Sequence[str]) -> FluidState:
    """Back to the per-particle global order (export / checkpoint / tests):
    one scatter through the global pids (slots + side seats)."""
    nfl = srs.pid.size
    pid = jnp.concatenate([srs.pid.ravel(), srs.side_pid])
    src = jnp.concatenate([
        jnp.concatenate([srs.xp.reshape(3, nfl)]
                        + [d.reshape(-1, nfl) for d in srs.dyn], axis=0),
        jnp.concatenate([srs.side_pos, srs.side_dyn], axis=0)], axis=1)
    n = proto.n_total
    idx = jnp.where(pid >= 0, pid, n)
    rows = src.shape[0]
    flat_idx = jnp.concatenate(
        [jnp.where(idx < n, idx + r * n, rows * n) for r in range(rows)])
    # scatter into zero-init buffers (every live particle appears exactly
    # once across slots+sides)
    got = (jnp.zeros((rows * n,), jnp.float32)
           .at[flat_idx].set(src.reshape(-1), mode="drop")
           .reshape(rows, n))
    nl = proto.n_liquid
    upd, o = {}, 3
    for nm in dyn_names:
        pf = getattr(proto, nm)
        k = 1 if pf.ndim == 1 else pf.shape[0]
        sl = got[o:o + k, :nl]
        upd[nm] = sl[0] if pf.ndim == 1 else sl
        o += k
    pos = jnp.where((jnp.zeros((n,), bool)
                     .at[jnp.where(pid >= 0, pid, n)].set(True, mode="drop")
                     )[None], got[:3], proto.pos)
    return proto.replace(pos=pos, dt=srs.dt, time=srs.time,
                         last_visc_iters=srs.last_visc_iters,
                         last_pressure_iters=srs.last_pressure_iters,
                         diag=srs.diag, **upd)


# ---------------------------------------------------------------------------
# Per-step local rebin + migration
# ---------------------------------------------------------------------------

def _local_resort(plan, nc_loc: int, n_liquid: int, S: int, pid_shape,
                  xp_shape, all_dest, all_pid, xp_f, dyn_f, dyn, cand_data):
    """Local slot-space full re-sort shared by the rebuild branch of the
    resident front-end and the padded-direct front-end: place every alive
    source (slot columns first, candidate columns appended) by
    (cell, rank-in-run), move all data with ONE stacked source-map gather,
    park the failures (cell full / not-own destination) in a fresh side
    buffer.  Returns (pid, xp, dyn, spos, sdyn, spid, ovf, lost)."""
    C = plan.C
    nflat = xp_f.shape[1]
    D = cand_data.shape[0] - 3
    KT = all_pid.shape[0] - nflat
    NTOT = nflat + KT
    order = jnp.argsort(jnp.where(all_pid >= 0, all_dest, nc_loc + 1))
    sdest = jnp.where(all_pid[order] >= 0, all_dest[order], nc_loc + 1)
    it = jnp.arange(NTOT, dtype=jnp.int32)
    change = jnp.concatenate([jnp.ones((1,), bool),
                              sdest[1:] != sdest[:-1]])
    run_start = jax.lax.cummax(jnp.where(change, it, 0))
    rank = it - run_start
    ok = (rank < C) & (sdest < nc_loc)
    px_d = jnp.minimum(sdest, nc_loc - 1) // plan.P
    pp_d = jnp.minimum(sdest, nc_loc - 1) - px_d * plan.P
    flat = jnp.where(ok, _flat_slot(plan, px_d, rank, pp_d), nflat)

    # source map: dest slot -> source column in [slots | candidates]
    src_map = jnp.full((nflat,), NTOT, jnp.int32).at[flat].set(
        order, mode="drop")
    source = jnp.concatenate([
        jnp.concatenate([xp_f] + dyn_f, axis=0),
        cand_data,
        jnp.concatenate([jnp.full((3, 1), EMPTY_POS, jnp.float32),
                         jnp.zeros((D, 1), jnp.float32)], axis=0)],
        axis=1)
    got = source[:, src_map]
    pid_f = jnp.full((nflat,), -1, jnp.int32).at[flat].set(
        all_pid[order], mode="drop")
    liq_f = (pid_f >= 0) & (pid_f < n_liquid)
    xp_new = jnp.where((pid_f >= 0)[None], got[:3], EMPTY_POS)
    dyn_new, o = [], 3
    for d in dyn:
        k = d.shape[0] if d.ndim == 4 else 1
        dyn_new.append(jnp.where(liq_f[None], got[o:o + k], 0.0)
                       .reshape(d.shape))
        o += k

    fail = (all_pid[order] >= 0) & ~ok
    fcs = jnp.cumsum(fail.astype(jnp.int32))
    seat = jnp.full((S,), -1, jnp.int32).at[
        jnp.where(fail & (fcs - 1 < S), fcs - 1, S)].set(it, mode="drop")
    sc2 = jnp.maximum(seat, 0)
    src_cols = order[sc2]
    new_spid = jnp.where(seat >= 0, all_pid[order][sc2], -1)
    pdata = source[:, jnp.where(seat >= 0, src_cols, NTOT)]
    return (pid_f.reshape(pid_shape),
            xp_new.reshape(xp_shape), tuple(dyn_new),
            pdata[:3], jnp.where((new_spid >= 0)
                                 & (new_spid < n_liquid), pdata[3:], 0.0),
            new_spid,
            jnp.minimum(fcs[-1], S),
            jnp.maximum(fcs[-1] - S, 0))


def _migrate_and_rebuild(cfg: SimConfig, cfg_loc: SimConfig, plan, n: int,
                         gxl: int, n_liquid: int, pid, xp, dyn, spos, sdyn,
                         spid, kmig: int):
    """Padded-direct front-end (the default multi-chip step): ppermute the
    slab crossers, then re-sort the whole slab from scratch in local slot
    space EVERY step — the decomposition of the measured-best single-chip
    structure (per-step build, no incremental rebin, no cond; single-chip
    A/B: padded-direct 2.95e6 vs resident 2.52e6 at 1M, CLAUDE.md perf
    history).  Per-device glue-op census: 1.27x the single-chip step's
    jaxpr ops vs 2.32x for the resident front (tests/test_resident_slab.py
    ::test_slab_direct_glue_census).

    No mover detection exists: emigrants are classified straight off the
    slot destinations.  Overspilled emigrants (> kmig one step) keep their
    seats, fail local placement (destination not own) and re-park in the
    side buffer to retry next step — nothing is destroyed (ADVICE r4).
    Returns (pid, xp, dyn, spos, sdyn, spid, ovf, lost)."""
    dev = jax.lax.axis_index(AXIS)
    C, PP, NX = plan.C, plan.PP, plan.NX
    nflat = NX * C * PP
    nc_loc = cfg_loc.num_cells
    S = spid.shape[0]
    own_np = np.zeros((NX, 1, 1), bool)
    own_np[1 + GHOST:1 + GHOST + gxl] = True
    own_slot = jnp.broadcast_to(jnp.asarray(own_np), (NX, C, PP)).ravel()

    xp_f = xp.reshape(3, nflat)
    valid = (pid >= 0).ravel()
    liquid = valid & (pid < n_liquid).ravel()
    dyn_f = [d.reshape(-1, nflat) for d in dyn]

    # --- emigrants straight off the slots (liquid own slots whose new
    # position left the slab; CFL bounds movement << one cell, so only
    # adjacent slabs exchange) ---
    p_real, minor, inbox, own_dest = _dest_cells(cfg, n, dev, xp_f)
    go_l = liquid & own_slot & inbox & (p_real < GHOST)
    go_r = liquid & own_slot & inbox & (p_real >= GHOST + gxl)

    def pack_dir(go):
        gcs = jnp.cumsum(go.astype(jnp.int32))
        gw = jnp.where(go & (gcs - 1 < kmig), gcs - 1, kmig)
        sel = jnp.full((kmig,), -1, jnp.int32).at[gw].set(
            jnp.arange(nflat, dtype=jnp.int32), mode="drop")
        ok = sel >= 0
        sc = jnp.maximum(sel, 0)
        data = jnp.concatenate([xp_f[:, sc]] + [d[:, sc] for d in dyn_f],
                               axis=0)
        pay = jnp.where(ok[None], data, 0.0)
        pay = pay.at[:3].set(jnp.where(ok[None], pay[:3], EMPTY_POS))
        ppid = jnp.where(ok, pid.ravel()[sc], -1)
        return pay, ppid, go & (gcs - 1 < kmig)     # sent mask (slot space)

    pay_l, pid_l, sent_l = pack_dir(go_l)
    pay_r, pid_r, sent_r = pack_dir(go_r)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    arr_pay = jnp.concatenate([jax.lax.ppermute(pay_r, AXIS, fwd),
                               jax.lax.ppermute(pay_l, AXIS, bwd)], axis=1)
    arr_pid = jnp.concatenate([jax.lax.ppermute(pid_r, AXIS, fwd),
                               jax.lax.ppermute(pid_l, AXIS, bwd)])
    # ring-wrap guard: edge devices take no arrivals from outside the domain
    ai = jnp.arange(2 * kmig)
    arr_pid = jnp.where((dev == 0) & (ai < kmig), -1, arr_pid)
    arr_pid = jnp.where((dev == n - 1) & (ai >= kmig), -1, arr_pid)

    # --- candidate pool: side-buffer retries + arrivals (every parked
    # particle retries each step; the re-sort parks only what still has no
    # room or is still in transit) ---
    cand_data = jnp.concatenate(
        [jnp.concatenate([spos, sdyn], axis=0), arr_pay], axis=1)
    cand_pid = jnp.concatenate([spid, arr_pid])
    cp, cm, cin, cown = _dest_cells(cfg, n, dev, cand_data[:3])
    cand_dest = jnp.where((cand_pid >= 0) & cown, cp * plan.P + cm, nc_loc)

    # --- one local re-sort over [surviving slots | candidates] ---
    slot_alive = valid & own_slot & ~sent_l & ~sent_r
    slot_dest = jnp.where(slot_alive & own_dest,
                          p_real * plan.P + minor, nc_loc)
    all_dest = jnp.concatenate([slot_dest, cand_dest])
    all_pid = jnp.concatenate([jnp.where(slot_alive, pid.ravel(), -1),
                               cand_pid])
    return _local_resort(plan, nc_loc, n_liquid, S, pid.shape, xp.shape,
                         all_dest, all_pid, xp_f, dyn_f, dyn, cand_data)


def _rebin_and_migrate(cfg: SimConfig, cfg_loc: SimConfig, plan, n: int,
                       gxl: int, n_liquid: int, pid, xp, dyn, spos, sdyn,
                       spid, since, budget: int, kmig: int):
    """Inside shard_map: detect movers over OWN planes, ppermute the
    slab-crossers, then a per-device lax.cond between the incremental
    hole-filling rebin and a local slot-space full rebuild (cadence /
    mover-spike).  Collective-free branches: migration happens BEFORE the
    cond.  Returns (pid, xp, dyn, side…, since, overflow, lost)."""
    dev = jax.lax.axis_index(AXIS)
    C, PP, NX = plan.C, plan.PP, plan.NX
    nflat = NX * C * PP
    nc_loc = cfg_loc.num_cells
    S = spid.shape[0]
    D = sdyn.shape[0]
    own_np = np.zeros((NX, 1, 1), bool)
    own_np[1 + GHOST:1 + GHOST + gxl] = True
    own_slot = jnp.broadcast_to(jnp.asarray(own_np), (NX, C, PP)).ravel()

    xp_f = xp.reshape(3, nflat)
    valid = (pid >= 0).ravel()
    liquid = valid & (pid < n_liquid).ravel()

    # --- destination of every own slot (global positions) ---
    p_real, minor, inbox, own_dest = _dest_cells(cfg, n, dev, xp_f)
    # home (real plane, minor) of each slot
    hx = jnp.arange(NX, dtype=jnp.int32)[:, None, None] - 1
    hpp = jnp.arange(PP, dtype=jnp.int32)[None, None, :] - _MARGIN
    home_p = jnp.broadcast_to(hx, (NX, C, PP)).ravel()
    home_m = jnp.broadcast_to(hpp, (NX, C, PP)).ravel()
    moved = (liquid & own_slot
             & ((p_real != home_p) | (minor != home_m) | ~inbox))

    # --- mover compaction (slot-space, K = budget) ---
    csum = jnp.cumsum(moved.astype(jnp.int32))
    n_mov = csum[-1]
    w = jnp.where(moved & (csum - 1 < budget), csum - 1, budget)
    mv_slot = jnp.full((budget,), -1, jnp.int32).at[w].set(
        jnp.arange(nflat, dtype=jnp.int32), mode="drop")
    mv_ok = mv_slot >= 0
    ms = jnp.maximum(mv_slot, 0)

    # --- candidate pool: movers + side retries (arrivals appended below) ---
    dyn_f = [d.reshape(-1, nflat) for d in dyn]
    mdata = jnp.concatenate([xp_f[:, ms]] + [d[:, ms] for d in dyn_f],
                            axis=0)                       # (3+D, K)
    mpid = jnp.where(mv_ok, pid.ravel()[ms], -1)
    mold = jnp.where(mv_ok, mv_slot, nflat)

    sv = spid >= 0
    cand_data = jnp.concatenate(
        [mdata, jnp.concatenate([spos, sdyn], axis=0)], axis=1)
    cand_pid = jnp.concatenate([mpid, jnp.where(sv, spid, -1)])
    cand_old = jnp.concatenate([mold, jnp.full((S,), nflat, jnp.int32)])

    # --- classify emigrants among candidates; ppermute payloads ---
    cp, cm, cin, cown = _dest_cells(cfg, n, dev, cand_data[:3])
    alive = cand_pid >= 0
    go_l = alive & cin & (cp < GHOST)
    go_r = alive & cin & (cp >= GHOST + gxl)

    def pack_dir(go):
        gcs = jnp.cumsum(go.astype(jnp.int32))
        gw = jnp.where(go & (gcs - 1 < kmig), gcs - 1, kmig)
        sel = jnp.full((kmig,), -1, jnp.int32).at[gw].set(
            jnp.arange(go.shape[0], dtype=jnp.int32), mode="drop")
        ok = sel >= 0
        sc = jnp.maximum(sel, 0)
        pay = jnp.where(ok[None], cand_data[:, sc], 0.0)
        pay = pay.at[:3].set(jnp.where(ok[None], pay[:3], EMPTY_POS))
        ppid = jnp.where(ok, cand_pid[sc], -1)
        return pay, ppid, jnp.maximum(gcs[-1] - kmig, 0)

    pay_l, pid_l, spill_l = pack_dir(go_l)
    pay_r, pid_r, spill_r = pack_dir(go_r)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    arr_pay = jnp.concatenate([jax.lax.ppermute(pay_r, AXIS, fwd),
                               jax.lax.ppermute(pay_l, AXIS, bwd)], axis=1)
    arr_pid = jnp.concatenate([jax.lax.ppermute(pid_r, AXIS, fwd),
                               jax.lax.ppermute(pid_l, AXIS, bwd)])
    # ring-wrap guard: edge devices take no arrivals from outside the domain
    ai = jnp.arange(2 * kmig)
    arr_pid = jnp.where((dev == 0) & (ai < kmig), -1, arr_pid)
    arr_pid = jnp.where((dev == n - 1) & (ai >= kmig), -1, arr_pid)

    # SENT emigrants leave the candidate pool (their payload went to a
    # neighbor).  Overspilled emigrants (> kmig per direction) STAY in the
    # pool: their destination is not-own so placement fails and they re-park
    # in the side buffer, retrying the ppermute next step — dropping them
    # here would permanently destroy particles (ADVICE r4 high: one spike
    # step deleted 616 of 2736 particles on 8 virtual devices)
    sent_l = go_l & (jnp.cumsum(go_l.astype(jnp.int32)) - 1 < kmig)
    sent_r = go_r & (jnp.cumsum(go_r.astype(jnp.int32)) - 1 < kmig)
    sent = sent_l | sent_r
    stay = alive & ~sent
    cand_pid = jnp.where(stay, cand_pid, -1)
    # slots of SENT movers must clear even though the candidate is gone
    sent_slot = jnp.where(sent, cand_old, nflat)

    cand_data = jnp.concatenate([cand_data, arr_pay], axis=1)
    cand_pid = jnp.concatenate([cand_pid, arr_pid])
    cand_old = jnp.concatenate([cand_old,
                                jnp.full((2 * kmig,), nflat, jnp.int32)])
    KT = cand_pid.shape[0]

    # destination cells of the final pool (arrivals included)
    cp, cm, cin, cown = _dest_cells(cfg, n, dev, cand_data[:3])
    alive = cand_pid >= 0
    dest = jnp.where(alive & cown, cp * plan.P + cm, nc_loc)

    # spill_l/spill_r are informational only: overspilled emigrants remain
    # alive in the pool and reach the side buffer via the fail path below
    # (counted there as occupancy, or as lost only if the side buffer
    # itself is full)
    del spill_l, spill_r
    need_full = (n_mov > budget) | (since + 1 >= cfg.resident_rebuild_every)

    # ---------------- incremental branch ----------------
    def _inc(_):
        order = jnp.argsort(jnp.where(alive, dest, nc_loc + 1))
        sdest = dest[order]
        kio = jnp.arange(KT, dtype=jnp.int32)
        change = jnp.concatenate([jnp.ones((1,), bool),
                                  sdest[1:] != sdest[:-1]])
        run_start = jax.lax.cummax(jnp.where(change, kio, 0))
        rrank = kio - run_start
        s_ok = alive[order] & (sdest < nc_loc)
        dc = jnp.minimum(sdest, nc_loc - 1)
        px_d = dc // plan.P
        pp_d = dc - px_d * plan.P

        # pre-move occupancy bitmask (vacated slots still read occupied)
        occ = jnp.sum((pid >= 0).astype(jnp.int32)
                      << jnp.arange(C, dtype=jnp.int32)[None, :, None],
                      axis=1).reshape(NX * PP)
        occ_m = occ[jnp.where(s_ok, (px_d + 1) * PP + (_MARGIN + pp_d), 0)]
        bit = jnp.arange(C, dtype=jnp.int32)[None, :]
        free = 1 - ((occ_m[:, None] >> bit) & 1)
        freec = jnp.cumsum(free, axis=1)
        hit = (free == 1) & (freec == (rrank + 1)[:, None])
        new_rank = jnp.min(jnp.where(hit, bit, C), axis=1)
        placed = s_ok & (new_rank < C)
        new_slot = jnp.where(placed, _flat_slot(plan, px_d, new_rank, pp_d),
                             nflat)
        s_pid = jnp.where(alive[order], cand_pid[order], -1)
        s_old = cand_old[order]
        s_data = cand_data[:, order]

        def _multi(i, k):
            return jnp.concatenate([
                jnp.where(i < nflat, i + c * nflat, k * nflat)
                for c in range(k)])

        clear_idx = jnp.concatenate([s_old, sent_slot])
        pid_f = pid.reshape(nflat).at[
            jnp.concatenate([clear_idx, new_slot])].set(
            jnp.concatenate([jnp.full_like(clear_idx, -1),
                             jnp.where(placed, s_pid, -1)]), mode="drop")
        xp_new = xp.reshape(3 * nflat).at[
            jnp.concatenate([_multi(clear_idx, 3), _multi(new_slot, 3)])
        ].set(jnp.concatenate([
            jnp.full((3 * clear_idx.shape[0],), EMPTY_POS, jnp.float32),
            jnp.concatenate([s_data[c] for c in range(3)])]), mode="drop")
        dyn_new, o = [], 3
        for d in dyn:
            k = d.shape[0] if d.ndim == 4 else 1
            nd = d.reshape(k * nflat).at[_multi(new_slot, k)].set(
                jnp.concatenate([s_data[o + c] for c in range(k)]),
                mode="drop")
            dyn_new.append(nd.reshape(d.shape))
            o += k

        # failures (cell full / not-yet-own) re-park
        fail = alive[order] & ~placed
        fcs = jnp.cumsum(fail.astype(jnp.int32))
        seat = jnp.full((S,), -1, jnp.int32).at[
            jnp.where(fail & (fcs - 1 < S), fcs - 1, S)].set(
            jnp.arange(KT, dtype=jnp.int32), mode="drop")
        sc2 = jnp.maximum(seat, 0)
        new_spid = jnp.where(seat >= 0, s_pid[sc2], -1)
        new_spos = jnp.where((seat >= 0)[None], s_data[:3, sc2], EMPTY_POS)
        new_sdyn = jnp.where((seat >= 0)[None], s_data[3:, sc2], 0.0)
        spill = jnp.maximum(fcs[-1] - S, 0)
        return (pid_f.reshape(pid.shape),
                xp_new.reshape(xp.shape), tuple(dyn_new),
                new_spos, new_sdyn, new_spid,
                since + 1, jnp.minimum(fcs[-1], S),
                jnp.maximum(n_mov - budget, 0) + spill)

    # ---------------- full-rebuild branch (local slot space) ----------------
    def _full(_):
        # sources: every slot (own planes; sent slots skipped) + candidates
        # (side + arrivals + movers already hold their own data, but a mover
        # also still sits in its slot — mark mover/sent slots dead and let
        # the CANDIDATE copy carry them so no particle appears twice)
        cand_mask = jnp.zeros((nflat + 1,), bool).at[
            jnp.minimum(cand_old, nflat)].set(True)[:nflat]
        sent_mask = jnp.zeros((nflat + 1,), bool).at[
            jnp.minimum(sent_slot, nflat)].set(True)[:nflat]
        slot_alive = valid & own_slot & ~cand_mask & ~sent_mask
        sp_r, sm_r, sin_r, sown_r = _dest_cells(cfg, n, dev, xp_f)
        slot_dest = jnp.where(slot_alive & sown_r,
                              sp_r * plan.P + sm_r, nc_loc)
        all_dest = jnp.concatenate([slot_dest, dest])
        all_pid = jnp.concatenate([jnp.where(slot_alive, pid.ravel(), -1),
                                   cand_pid])
        out = _local_resort(plan, nc_loc, n_liquid, S, pid.shape, xp.shape,
                            all_dest, all_pid, xp_f, dyn_f, dyn, cand_data)
        return out[:6] + (jnp.int32(0),) + out[6:]

    out = jax.lax.cond(need_full, _full, _inc, None)
    (pid2, xp2, dyn2, spos2, sdyn2, spid2, since2, ovf, lost) = out
    return pid2, xp2, dyn2, spos2, sdyn2, spid2, since2, ovf, lost


# ---------------------------------------------------------------------------
# The step
# ---------------------------------------------------------------------------

def step_slab_direct(srs: SlabResState, cfg: SimConfig, mesh: Mesh,
                     solver: str = "dfsph") -> SlabResState:
    """One solver step under the slab decomposition with the PADDED-DIRECT
    front-end: migrate + local full re-sort every step (_migrate_and_rebuild)
    instead of the incremental rebin — the decomposition of the
    measured-best single-chip structure (VERDICT r4 directive 5)."""
    return step_slab_resident(srs, cfg, mesh, solver, front="direct")


def step_slab_resident(srs: SlabResState, cfg: SimConfig, mesh: Mesh,
                       solver: str = "dfsph",
                       front: str = "resident") -> SlabResState:
    """One solver step, decomposed: rebin-or-rebuild/migrate, ghost refresh,
    the UNCHANGED comm-parameterized solver middle on a per-slab
    PaddedEngine (fused DFSPH iterations included), local advance — all in
    ONE shard_map.  ``front`` picks the binning maintainer: "resident"
    (incremental hole-filling rebin + cadenced/spike rebuild cond) or
    "direct" (per-step local re-sort, fewer glue ops — the default through
    step_slab_direct; see _migrate_and_rebuild)."""
    from ..solvers import dfsph, iisph, pcisph, sesph
    from .slab import _MIDDLES

    middle_fn = _MIDDLES[solver]
    n = mesh.devices.size
    gxl = _gxl(cfg, n)
    cfg_loc = local_cfg(cfg, n)
    plan = make_plan(cfg_loc, cfg.cell_capacity)
    nl = srs.n_liquid
    # mover budget scales with PARTICLES per device (2x slack for fluid
    # clustering along x), not with slot count
    budget = max(1024, int(2 * nl * cfg.resident_mover_frac) // n)
    kmig = max(128, budget // 8)
    nd = len(srs.dyn)

    dyn_specs = tuple(P(None, AXIS) if d.ndim == 4 else P(AXIS)
                      for d in srs.dyn)

    @partial(shard_map, mesh=mesh,
             in_specs=((P(AXIS), P(None, AXIS)) + dyn_specs
                       + (P(None, AXIS), P(None, AXIS), P(AXIS), P(AXIS))
                       + (P(),) * 2),
             out_specs=((P(AXIS), P(None, AXIS)) + dyn_specs
                        + (P(None, AXIS), P(None, AXIS), P(AXIS), P(AXIS),
                           P(AXIS), P(AXIS))
                        + (P(),) * 8),
             check_vma=False)
    def step(pid, xp, *rest):
        dyn = rest[:nd]
        spos, sdyn, spid, since = rest[nd:nd + 4]
        dt, last_pr = rest[nd + 4:]
        since_s = since[0]

        if front == "direct":
            (pid, xp, dyn, spos, sdyn, spid, ovf,
             lost) = _migrate_and_rebuild(
                cfg, cfg_loc, plan, n, gxl, nl, pid, xp, dyn, spos, sdyn,
                spid, kmig)
        else:
            (pid, xp, dyn, spos, sdyn, spid, since_s, ovf,
             lost) = _rebin_and_migrate(
                cfg, cfg_loc, plan, n, gxl, nl, pid, xp, dyn, spos, sdyn,
                spid, since_s, budget, kmig)

        # ghost refresh of the binning state; dynamic fields refresh inside
        # the engine adapter per sweep
        (xp,) = _refresh([xp], [EMPTY_POS], n, gxl)
        pid = _refresh_pid(pid, n, gxl)

        eng, comm, own_liq = _build_local_engine(cfg_loc, pid, xp, nl, n,
                                                 gxl)
        fdict = dict(zip(_FIELD_NAMES[solver], dyn))
        upd, new_dt, (dv_it, pr_it, vs_it, err, err_pre) = middle_fn(
            comm, cfg_loc, fdict, dt, last_pr)

        dyn_new = tuple(
            jnp.where((own_liq if upd[k].ndim == 3 else own_liq[None]),
                      upd[k], 0.0) if k in upd else dyn[i]
            for i, k in enumerate(_FIELD_NAMES[solver]))
        vel_new = dyn_new[0]
        xp = xp + jnp.where(own_liq[None], vel_new * new_dt, 0.0)
        sliq = (spid >= 0) & (spid < nl)
        spos = spos + jnp.where(sliq[None], sdyn[0:3] * new_dt, 0.0)

        vmax = jax.lax.pmax(jnp.max(jnp.where(
            own_liq, jnp.sum(vel_new * vel_new, axis=0), 0.0)), AXIS)

        # the returned state must hold each particle in EXACTLY one seat:
        # ghost planes still carry the refreshed pid/xp copies, which
        # would race the owner copy in gather_state's scatter (the ghost
        # copy has zeroed dyn and a pre-advance position) and double-count
        # in conservation checks — clear them; next step's refresh
        # repopulates from the neighbor's advanced own planes anyway
        own_pl = jnp.asarray(_own_plane_mask(plan, gxl))
        pid = jnp.where(own_pl, pid, -1)
        xp = jnp.where(own_pl[None], xp, EMPTY_POS)
        # diag carries PERMANENT drops only (matching resident.rebin_lost
        # semantics); benign side-buffer occupancy — particles retained and
        # retried next step — stays separately visible as srs.overflow
        # (ADVICE r4: do not conflate re-parks with mass loss)
        return ((pid, xp) + dyn_new
                + (spos, sdyn, spid, since_s[None], ovf[None], lost[None])
                + (new_dt, dv_it, pr_it, vs_it, err, err_pre,
                   jax.lax.psum(lost, AXIS), jnp.sqrt(vmax)))

    out = step(srs.pid, srs.xp, *srs.dyn, srs.side_pos, srs.side_dyn,
               srs.side_pid, srs.since_rebuild, srs.dt,
               srs.last_pressure_iters)
    pid, xp = out[0], out[1]
    dyn = out[2:2 + nd]
    spos, sdyn, spid, since, ovf, lost = out[2 + nd:8 + nd]
    (new_dt, dv_it, pr_it, vs_it, err, err_pre, ovf_tot, vmax) = out[8 + nd:]

    diag = StepDiagnostics(
        divergence_iters=dv_it, pressure_iters=pr_it, viscosity_iters=vs_it,
        density_error=err, density_error_pre=err_pre,
        neighbor_overflow=ovf_tot, vel_max=vmax)
    return srs._replace(
        pid=pid, xp=xp, dyn=tuple(dyn), side_pos=spos, side_dyn=sdyn,
        side_pid=spid, since_rebuild=since, overflow=ovf, lost=lost,
        dt=new_dt, time=srs.time + new_dt, last_visc_iters=vs_it,
        last_pressure_iters=pr_it, diag=diag)


# Resident-field name order per solver (matches each solver's
# RESIDENT_FIELDS / the _mid_* seat conventions in slab.py)
_FIELD_NAMES = {
    "dfsph": ("vel", "omega", "vel_guess", "kappa", "kappa_v"),
    "iisph": ("vel", "vel_guess", "kappa"),
    "pcisph": ("vel", "kappa"),
    "sesph": ("vel", "kappa"),
}


def resident_fields(solver: str):
    """State attribute names seated per solver (the ``kappa`` seat carries
    the pressure for the non-DFSPH solvers, exactly like slab.slab_init)."""
    return tuple("pressure" if nm == "kappa" and solver != "dfsph" else nm
                 for nm in _FIELD_NAMES[solver])
