"""Resident packed state: the particle system lives IN the padded engine
layout across steps.

Round-2 profiling showed ~150-175 ms of the ~440 ms 1M DFSPH step was spent
rebuilding the packed layout from scratch every step — argsort binning
(~45 ms), the 11-component pack gather (~65-75 ms), the unpack gather
(~44 ms) — although particles move far less than a cell per step
(CFL-bounded displacement <= 0.4 * diameter = 0.2 cells) and solids never
move at all.  The reference rebuilds its hash grid every frame too
(HashGrid.py:56-86), but its atomic-append rebuild is O(N); ours is
gather/scatter-bound, so persistence pays.

Design (all static shapes, one jitted step, no host round-trips):

* State arrays stay in the padded (NX, C, PP) sweep-engine layout
  permanently; positions update elementwise in place.
* Per step, an **incremental rebin** relocates only the particles whose
  cell changed: a slot-space cell check (elementwise), a particle-space
  compaction (one N-gather + cumsum + one N-scatter), then K-sized sorts,
  gathers and scatters for the movers (K = mover budget << N).  Movers
  fill the LOWEST free ranks of their destination cell, read from a
  per-cell occupancy bitmask taken BEFORE any clear — so relocation is
  collision-free without atomics (vacated slots still read occupied, and
  same-cell movers take distinct free ranks from their sort order) and
  holes REFILL instead of accumulating: each cell's occupied-rank ceiling
  tracks its historic max occupancy, not its churn.
* A **cadenced full rebuild** (host-counted, every
  ``cfg.resident_rebuild_every`` steps — no per-step device->host sync)
  re-sorts from scratch; with hole-filling it is a rare ceiling-decay
  pass (default cadence 64), and the spike path (mover count > budget)
  still takes it immediately via ``rebin_auto``'s ``lax.cond``.
* Out-of-box movers and movers whose destination cell is full go to a
  small **side buffer**: they keep their state, take no interactions
  (exactly the reference's overflow semantics, HashGrid.py:73), and
  retry EVERY step as rebin candidates — they re-enter the moment their
  cell has room, like the reference's next-frame rebuild re-entry.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from .config import SimConfig
from .grid import EMPTY_POS, cell_of_positions
from .pallas.engine import _MARGIN, make_plan


class ResidentGrid(NamedTuple):
    """Binning state in the padded layout (play-alike of grid.DenseGrid)."""

    pid: jnp.ndarray        # (NX, C, PP) int32, -1 empty
    liquid: jnp.ndarray     # (NX, C, PP) bool
    xp: jnp.ndarray         # (3, NX, C, PP) f32, EMPTY_POS at empty slots
    slot: jnp.ndarray       # (N,) int32 flat padded slot, -1 = side/dropped
    top: jnp.ndarray        # (NC,) int32 per-cell bump pointer
    overflow: jnp.ndarray   # () int32 particles in the side buffer
    rebin_lost: jnp.ndarray  # () int32 movers beyond budget (stale-binned)
    since_rebuild: jnp.ndarray  # () int32 steps since the last full re-sort

    @property
    def valid(self):
        return self.pid >= 0


class SideBuffer(NamedTuple):
    """Fixed-capacity park for dropped particles (kept state, no pairs)."""

    pos: jnp.ndarray        # (3, S)
    dyn: jnp.ndarray        # (D, S) stacked dynamic components
    pid: jnp.ndarray        # (S,) int32, -1 empty
    n: jnp.ndarray          # () int32


class ResidentState(NamedTuple):
    grid: ResidentGrid
    dyn: tuple              # solver-ordered padded fields ((k, NX, C, PP))
    side: SideBuffer
    dt: jnp.ndarray
    time: jnp.ndarray
    last_visc_iters: jnp.ndarray
    last_pressure_iters: jnp.ndarray
    diag: object            # state.StepDiagnostics
    n_liquid: int           # STATIC (aux data, not a leaf)


jax.tree_util.register_pytree_node(
    ResidentGrid,
    lambda g: (tuple(g), None),
    lambda _, c: ResidentGrid(*c))
jax.tree_util.register_pytree_node(
    SideBuffer,
    lambda s: (tuple(s), None),
    lambda _, c: SideBuffer(*c))
jax.tree_util.register_pytree_node(
    ResidentState,
    lambda s: (tuple(s)[:-1], s.n_liquid),
    lambda nl, c: ResidentState(*c, nl))


def _flat_slot(plan, px, rank, pp):
    """Padded flat index of (plane px, capacity rank, in-plane cell pp)."""
    return ((px + 1) * plan.C + rank) * plan.PP + (_MARGIN + pp)


class BuildPrep(NamedTuple):
    """Capacity-independent half of the padded grid build: cell binning,
    argsort, rank-in-run and the sorted position gather.  The spill-fallback
    branches (padded_step_spill) share one prep — they differ only in the
    scatter targets, which depend on the plan's capacity."""

    order: jnp.ndarray        # (N,) argsort of cell ids
    sorted_cell: jnp.ndarray  # (N,) cell id per sorted particle (nc = outside)
    rank: jnp.ndarray         # (N,) rank within the cell's sorted run
    pos_sorted: jnp.ndarray   # (3, N)
    spill: jnp.ndarray        # () bool: would cfg.cell_capacity overflow?


def build_prep(pos: jnp.ndarray, cfg: SimConfig) -> BuildPrep:
    n = pos.shape[1]
    nc = cfg.num_cells
    cell_id, inbox = cell_of_positions(pos, cfg)
    cell_id = jnp.where(inbox, cell_id, nc)

    order = jnp.argsort(cell_id)
    sorted_cell = cell_id[order]
    iota = jnp.arange(n, dtype=jnp.int32)
    change = jnp.concatenate([jnp.ones((1,), bool),
                              sorted_cell[1:] != sorted_cell[:-1]])
    run_start = jax.lax.cummax(jnp.where(change, iota, 0))
    rank = iota - run_start
    spill = jnp.any((rank >= cfg.cell_capacity) & (sorted_cell < nc))
    return BuildPrep(order=order, sorted_cell=sorted_cell, rank=rank,
                     pos_sorted=pos[:, order], spill=spill)


def grid_from_prep(plan, prep: BuildPrep, n_liquid: int,
                   cfg: SimConfig) -> ResidentGrid:
    """Placement half of the padded build at plan.C: pid/xp scatters into
    padded flat slots, per-cell tops, overflow count."""
    n = prep.order.shape[0]
    nc = cfg.num_cells
    cap = plan.C
    P, PP, NX = plan.P, plan.PP, plan.NX
    nflat = NX * cap * PP
    sorted_cell, rank, order = prep.sorted_cell, prep.rank, prep.order

    px = jnp.minimum(sorted_cell, nc - 1) // P
    pp = jnp.minimum(sorted_cell, nc - 1) - px * P
    flat = _flat_slot(plan, px, rank, pp)
    ok = (rank < cap) & (sorted_cell < nc)
    sl = jnp.where(ok, flat, nflat)

    pid = jnp.full((nflat,), -1, jnp.int32).at[sl].set(
        order.astype(jnp.int32), mode="drop").reshape(NX, cap, PP)
    # one flat scalar-index scatter for all 3 components (idx + c * nflat,
    # component-major): same index count as 3 per-component scatters but a
    # single thunk — the axon launch gap charges per executed op
    sl3 = jnp.concatenate([jnp.where(sl < nflat, sl + c * nflat, 3 * nflat)
                           for c in range(3)])
    xp = (jnp.full((3 * nflat,), EMPTY_POS, jnp.float32)
          .at[sl3].set(prep.pos_sorted.reshape(-1), mode="drop")
          .reshape(3, NX, cap, PP))

    slot_all = jnp.full((n,), -1, jnp.int32)
    slot_all = slot_all.at[order].set(jnp.where(ok, flat, -1))

    liquid = (pid >= 0) & (pid < n_liquid)
    # per-cell counts from the sorted runs: write each run's LENGTH at its
    # last element — unique indices (a duplicate-index scatter-add
    # serializes catastrophically on TPU; scripts/prim_perf.py)
    is_last = jnp.concatenate([sorted_cell[1:] != sorted_cell[:-1],
                               jnp.ones((1,), bool)])
    top = jnp.zeros((nc,), jnp.int32).at[
        jnp.where(is_last & (sorted_cell < nc), sorted_cell, nc)].set(
            jnp.minimum(rank + 1, cap), mode="drop")
    overflow = jnp.sum((rank >= cap) & (sorted_cell < nc)).astype(jnp.int32)
    return ResidentGrid(pid=pid, liquid=liquid, xp=xp, slot=slot_all,
                        top=top, overflow=overflow,
                        rebin_lost=jnp.int32(0),
                        since_rebuild=jnp.int32(0))


def build_grid_padded(plan, pos: jnp.ndarray, n_liquid: int,
                      cfg: SimConfig) -> ResidentGrid:
    """grid.build_grid emitting the PADDED layout directly: same argsort +
    rank-in-run placement (grid.py:75-122), but the pid/xp scatters target
    padded flat slots, so no (C, NC) intermediate or pad-transpose exists."""
    return grid_from_prep(plan, build_prep(pos, cfg), n_liquid, cfg)


def pack_many_padded(plan, rgrid: ResidentGrid, fields: Sequence,
                     fill: float = 0.0):
    """pack_liquid_many straight into the padded layout: one stacked
    leading-dim gather through the padded pid (grid.py:151-177 twin)."""
    idx = jnp.maximum(rgrid.pid, 0).ravel()
    parts, sizes = [], []
    for x in fields:
        x2 = x[None] if x.ndim == 1 else x
        parts.append(x2)
        sizes.append(x2.shape[0])
    stacked = jnp.concatenate(parts, axis=0)
    got = stacked[:, idx].reshape(len(stacked), *rgrid.pid.shape)
    got = jnp.where(rgrid.liquid[None], got, fill)
    out, o = [], 0
    for x, k in zip(fields, sizes):
        sl = got[o:o + k]
        out.append(sl[0] if x.ndim == 1 else sl)
        o += k
    return out


def padded_step_spill(cfg: SimConfig, pos: jnp.ndarray, n_liquid: int,
                      fields: Sequence, body):
    """Non-resident engine-step entry with an overflow-capacity fallback.

    Runs ``body(grid, comm, packed) -> pytree`` at cfg.cell_capacity; when
    this step's occupancy would overflow it, the SAME body runs at
    cfg.cell_capacity_spill instead — the two capacities are the branches of
    one ``lax.cond`` sharing one binning prep (cell ids + argsort + ranks),
    so the common case pays only the tight capacity's pack/scatter cost
    (slot count is linear in capacity: C=16 measured +18% over C=24 at 1M)
    and a compression spike keeps every particle interacting instead of
    dropping it for the step (the reference drops with a host print,
    HashGrid.py:73).  Both branches must return identical pytree shapes —
    solver steps return per-particle FluidStates, where capacity never
    appears.  With cell_capacity_spill <= cell_capacity this is exactly
    padded_step_head + body."""
    from .pallas.engine import PaddedEngine
    from .parallel.comm import PaddedNoComm

    prep = build_prep(pos, cfg)

    def _at(cap):
        def go(_):
            plan = make_plan(cfg, cap)
            grid = grid_from_prep(plan, prep, n_liquid, cfg)
            eng = PaddedEngine.from_resident(grid, cfg)
            comm = PaddedNoComm(grid, cfg, engine=eng)
            packed = pack_many_padded(plan, grid, fields)
            return body(grid, comm, packed)
        return go

    if cfg.cell_capacity_spill <= cfg.cell_capacity:
        return _at(cfg.cell_capacity)(None)
    return jax.lax.cond(prep.spill, _at(cfg.cell_capacity_spill),
                        _at(cfg.cell_capacity), None)


def padded_step_head(cfg: SimConfig, pos: jnp.ndarray, n_liquid: int,
                     fields: Sequence):
    """NON-resident engine-step entry, padded-direct: build_grid_padded +
    pack_many_padded + PaddedEngine.from_resident.  Replaces the historical
    build_grid -> pack_liquid_many -> eng.pad_state chain: that route
    materialized a (K, C, NC) intermediate and re-staged it into the padded
    layout with ~12 dynamic-update-slices PER FIELD (132 executed ops and
    several full-size copies per step in the 1M trace) — here the build
    scatters and the pack gather target padded flat slots directly, so no
    pad-transpose exists anywhere in the step.  Returns
    (rgrid, comm, packed_fields)."""
    from .pallas.engine import PaddedEngine
    from .parallel.comm import PaddedNoComm

    plan = make_plan(cfg, cfg.cell_capacity)
    rgrid = build_grid_padded(plan, pos, n_liquid, cfg)
    eng = PaddedEngine.from_resident(rgrid, cfg)
    comm = PaddedNoComm(rgrid, cfg, engine=eng)
    packed = pack_many_padded(plan, rgrid, fields)
    return rgrid, comm, packed


def unpack_many_direct(rgrid: ResidentGrid, packed: Sequence,
                       defaults: Sequence):
    """grid.unpack_liquid_many twin for the padded-direct step:
    ``rgrid.slot`` IS the padded flat index, so the unpack is one stacked
    leading-dim gather with no slot-index arithmetic.  Dropped particles
    (slot == -1: capacity overflow / out of box) keep ``defaults``.
    rgrid.slot covers ALL particles; outputs are per-LIQUID like the
    defaults (solvers only unpack liquid fields)."""
    nl = defaults[0].shape[-1]
    slot = rgrid.slot[:nl]
    keep = slot >= 0
    idx = jnp.maximum(slot, 0)
    parts, sizes = [], []
    for xp in packed:
        x2 = xp.reshape((1, -1) if xp.ndim == 3 else (xp.shape[0], -1))
        parts.append(x2)
        sizes.append(x2.shape[0])
    stacked = jnp.concatenate(parts, axis=0)
    got = stacked[:, idx]
    out, o = [], 0
    for xp, d, k in zip(packed, defaults, sizes):
        sl = got[o:o + k]
        out.append(jnp.where(keep, sl[0], d) if xp.ndim == 3
                   else jnp.where(keep[None], sl, d))
        o += k
    return out


def _slot_cells(plan, cfg: SimConfig):
    """Per-slot owning cell id (NX, 1, PP) and an in-frame mask; margin and
    tail slots get cell -1."""
    px0 = jnp.arange(plan.NX, dtype=jnp.int32)[:, None, None] - 1
    pp = jnp.arange(plan.PP, dtype=jnp.int32)[None, None, :] - _MARGIN
    ok = ((px0 >= 0) & (px0 < plan.gx) & (pp >= 0) & (pp < plan.P))
    return jnp.where(ok, px0 * plan.P + pp, -1), ok


def _stack_particle_dyn(fields: Sequence) -> jnp.ndarray:
    """[(k, NL) / (NL,)] -> (D, NL)."""
    return jnp.concatenate([x[None] if x.ndim == 1 else x for x in fields],
                           axis=0)


def park_unplaced(rgrid: ResidentGrid, pos: jnp.ndarray,
                  dyn_stacked: jnp.ndarray, side_cap: int) -> SideBuffer:
    """Park every particle the build left without a slot (capacity overflow /
    out of box) in a fresh side buffer, preserving its state.  A parked
    SOLID keeps dyn = 0 (dyn_stacked is liquid-sized; solids never move —
    without the mask a clamped gather would hand it the last liquid's
    velocity and `advance` would drift it)."""
    n = rgrid.slot.shape[0]
    nl = dyn_stacked.shape[1]
    un = rgrid.slot < 0
    csum = jnp.cumsum(un.astype(jnp.int32))
    w = jnp.where(un & (csum - 1 < side_cap), csum - 1, side_cap)
    pids = jnp.full((side_cap,), -1, jnp.int32).at[w].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    pc = jnp.maximum(pids, 0)
    return SideBuffer(pos=pos[:, pc],
                      dyn=jnp.where((pids >= 0) & (pids < nl),
                                    dyn_stacked[:, jnp.minimum(pc, nl - 1)],
                                    0.0),
                      pid=pids,
                      n=jnp.minimum(csum[-1], side_cap))


def _side_cap(cfg: SimConfig, n: int) -> int:
    return max(256, int(n * cfg.resident_side_frac))


def from_fluid(cfg: SimConfig, state, dyn_names: Sequence[str]
               ) -> ResidentState:
    """Initial residence: full build + pack from a per-particle FluidState."""
    plan = make_plan(cfg, cfg.cell_capacity)
    dyn_fields = [getattr(state, nm) for nm in dyn_names]
    rgrid = build_grid_padded(plan, state.pos, state.n_liquid, cfg)
    padded = pack_many_padded(plan, rgrid, dyn_fields)
    side = park_unplaced(rgrid, state.pos, _stack_particle_dyn(dyn_fields),
                         _side_cap(cfg, state.n_total))
    rgrid = rgrid._replace(overflow=side.n)
    return ResidentState(grid=rgrid, dyn=tuple(padded), side=side,
                         dt=state.dt, time=state.time,
                         last_visc_iters=state.last_visc_iters,
                         last_pressure_iters=state.last_pressure_iters,
                         diag=state.diag, n_liquid=state.n_liquid)


def rebuild(cfg: SimConfig, rs: ResidentState) -> ResidentState:
    """Full re-sort IN SLOT SPACE: compacts holes, resets rank ceilings and
    returns side-buffer particles to the grid — without materializing a
    per-particle copy of the system first.  The materialized form
    (materialize -> build_grid_padded -> pack_many_padded) paid a stacked
    N-gather, a 3-component N-scatter of positions AND the (3+D)-component
    nflat pack gather; here the new placement is derived from per-particle
    cell ids read straight off the resident layout (one N-gather) and ALL
    particle data moves with ONE stacked slot-to-slot gather through a
    source map over the unified [grid slots | side seats | dead] address
    space.  Argsort keys, tie order and every output value are
    bit-identical to the materialized form
    (tests/test_resident.py::test_rebuild_matches_materialized_form),
    except that a parked SOLID now keeps dyn = 0 (see park_unplaced).
    Taken by rebin_auto every cfg.resident_rebuild_every steps or whenever
    the incremental mover budget would overflow."""
    plan = make_plan(cfg, cfg.cell_capacity)
    rgrid, dyn, side = rs.grid, rs.dyn, rs.side
    n_liquid = rs.n_liquid
    C, P, NX = plan.C, plan.P, plan.NX
    nc = cfg.num_cells
    n = rgrid.slot.shape[0]
    nflat = rgrid.pid.size
    S = side.pid.shape[0]
    dead = nflat + S

    # unified per-particle source address: grid slot, side seat, or dead
    # (invariant: slot == -1 iff parked; a spilled particle — beyond the
    # side cap — reads the dead column: EMPTY_POS/0, which the materialized
    # form also produced via the always-empty margin slot 0)
    seat = jnp.full((n,), -1, jnp.int32).at[
        jnp.where(side.pid >= 0, side.pid, n)].set(
        jnp.arange(S, dtype=jnp.int32), mode="drop")
    src_p = jnp.where(rgrid.slot >= 0, rgrid.slot,
                      jnp.where(seat >= 0, nflat + seat, dead))

    # per-particle cell ids off the resident layout (one N-gather)
    cell_slot, in_slot = cell_of_positions(rgrid.xp.reshape(3, nflat), cfg)
    s_cell, s_in = cell_of_positions(side.pos, cfg)
    cell_ext = jnp.concatenate([jnp.where(in_slot, cell_slot, nc),
                                jnp.where(s_in, s_cell, nc),
                                jnp.full((1,), nc, jnp.int32)])
    cell_id = cell_ext[src_p]

    # argsort + rank-in-run placement: identical math to build_grid_padded
    order = jnp.argsort(cell_id)
    sorted_cell = cell_id[order]
    iota = jnp.arange(n, dtype=jnp.int32)
    change = jnp.concatenate([jnp.ones((1,), bool),
                              sorted_cell[1:] != sorted_cell[:-1]])
    run_start = jax.lax.cummax(jnp.where(change, iota, 0))
    rank = iota - run_start
    px = jnp.minimum(sorted_cell, nc - 1) // P
    pp = jnp.minimum(sorted_cell, nc - 1) - px * P
    flat = _flat_slot(plan, px, rank, pp)
    ok = (rank < C) & (sorted_cell < nc)

    pid = jnp.full((nflat,), -1, jnp.int32).at[
        jnp.where(ok, flat, nflat)].set(order.astype(jnp.int32),
                                        mode="drop").reshape(rgrid.pid.shape)
    slot_all = jnp.full((n,), -1, jnp.int32).at[order].set(
        jnp.where(ok, flat, -1))
    liquid = (pid >= 0) & (pid < n_liquid)
    is_last = jnp.concatenate([sorted_cell[1:] != sorted_cell[:-1],
                               jnp.ones((1,), bool)])
    top = jnp.zeros((nc,), jnp.int32).at[
        jnp.where(is_last & (sorted_cell < nc), sorted_cell, nc)].set(
            jnp.minimum(rank + 1, C), mode="drop")

    # ONE stacked slot-to-slot gather moves xp + every dyn field (the
    # leading-dim gather amortizes across components — scripts/prim_perf)
    src_map = jnp.full((nflat,), dead, jnp.int32).at[
        jnp.where(slot_all >= 0, slot_all, nflat)].set(src_p, mode="drop")
    rows = 3 + sum(d.shape[0] if d.ndim == 4 else 1 for d in dyn)
    source = jnp.concatenate([
        jnp.concatenate([rgrid.xp.reshape(3, nflat)]
                        + [d.reshape(-1, nflat) for d in dyn], axis=0),
        jnp.concatenate([side.pos, side.dyn], axis=0),
        jnp.concatenate([jnp.full((3, 1), EMPTY_POS, jnp.float32),
                         jnp.zeros((rows - 3, 1), jnp.float32)])], axis=1)
    got = source[:, src_map]
    liq_f = liquid.ravel()
    dyn_out, o = [], 3
    for d in dyn:
        k = d.shape[0] if d.ndim == 4 else 1
        dyn_out.append(jnp.where(liq_f[None], got[o:o + k], 0.0)
                       .reshape(d.shape))
        o += k

    # park the unplaced (capacity overflow / out of box) straight from the
    # unified source space — park_unplaced's S-sized twin
    un = slot_all < 0
    csum = jnp.cumsum(un.astype(jnp.int32))
    pids = jnp.full((S,), -1, jnp.int32).at[
        jnp.where(un & (csum - 1 < S), csum - 1, S)].set(iota, mode="drop")
    pdata = source[:, src_p[jnp.maximum(pids, 0)]]
    side_new = SideBuffer(
        pos=pdata[:3],
        dyn=jnp.where((pids >= 0) & (pids < n_liquid), pdata[3:], 0.0),
        pid=pids, n=jnp.minimum(csum[-1], S))

    grid = ResidentGrid(pid=pid, liquid=liquid,
                        xp=got[:3].reshape(rgrid.xp.shape),
                        slot=slot_all, top=top, overflow=side_new.n,
                        rebin_lost=jnp.int32(0),
                        since_rebuild=jnp.int32(0))
    return rs._replace(grid=grid, dyn=tuple(dyn_out), side=side_new)


def to_fluid(rs: ResidentState, proto, dyn_names: Sequence[str]):
    """Materialize a full per-particle FluidState (export/checkpoint/tests);
    fields outside ``dyn_names`` keep the prototype's values."""
    pos, dyn_particle = materialize(rs.grid, rs.dyn, rs.side)
    nl = proto.n_liquid
    upd = {nm: d[..., :nl] for nm, d in zip(dyn_names, dyn_particle)}
    return proto.replace(pos=pos, dt=rs.dt, time=rs.time,
                         last_visc_iters=rs.last_visc_iters,
                         last_pressure_iters=rs.last_pressure_iters,
                         diag=rs.diag, **upd)


class MoverScan(NamedTuple):
    """Cheap per-step mover detection (runs BEFORE the incremental/full
    branch decision in rebin_auto — only elementwise ops, one N-gather and
    one reduction)."""

    cell_new: jnp.ndarray   # (nflat,) destination cell per slot
    inbox: jnp.ndarray      # (nflat,) in-domain mask
    moved_p: jnp.ndarray    # (N,) particle-space "cell changed" mask
    n_mov: jnp.ndarray      # () int32


def detect_movers(plan, cfg: SimConfig, rgrid: ResidentGrid) -> MoverScan:
    nflat = rgrid.pid.size
    cell_new, inbox = cell_of_positions(rgrid.xp.reshape(3, nflat), cfg)
    slot_cell, _ = _slot_cells(plan, cfg)
    slot_cell = jnp.broadcast_to(slot_cell, rgrid.pid.shape).ravel()
    valid = (rgrid.pid >= 0).ravel()
    moved = valid & ((cell_new != slot_cell)
                     | ~inbox) & rgrid.liquid.ravel()
    in_grid = rgrid.slot >= 0
    moved_p = moved[jnp.maximum(rgrid.slot, 0)] & in_grid
    return MoverScan(cell_new=cell_new, inbox=inbox, moved_p=moved_p,
                     n_mov=jnp.sum(moved_p).astype(jnp.int32))


def rebin_auto(plan, cfg: SimConfig, rs: ResidentState, budget: int):
    """The per-step binning maintainer: an incremental rebin while the
    mover count fits the budget, else (or on the hole-compaction cadence) a
    full re-sort — both branches of one `lax.cond`, so the spike response
    (a dam break crossing a cell boundary in lock-step can move 30% of the
    particles in ONE step while the steady rate is 2-8%) needs no host
    round-trip and never stale-bins a particle.  Returns (grid, dyn, side).
    """
    scan = detect_movers(plan, cfg, rs.grid)

    def _inc(_):
        grid, dyn, side = rebin_incremental(plan, cfg, rs.grid, rs.dyn,
                                            rs.side, budget, scan=scan,
                                            n_liquid=rs.n_liquid)
        grid = grid._replace(since_rebuild=rs.grid.since_rebuild + 1)
        return grid, tuple(dyn), side

    if cfg.resident_host_rebuild:
        # incremental only: the cadence/spike full re-sort is dispatched by
        # the HOST as a separate program (Simulation.step) — excess movers
        # on a spike step stale-bin for one step (counted in rebin_lost),
        # which triggers the host rebuild before the next step
        return _inc(None)

    need_full = ((scan.n_mov > budget)
                 | (rs.grid.since_rebuild + 1
                    >= cfg.resident_rebuild_every))

    def _full(_):
        rs2 = rebuild(cfg, rs)
        return rs2.grid, tuple(rs2.dyn), rs2.side

    return jax.lax.cond(need_full, _full, _inc, None)


def rebin_incremental(plan, cfg: SimConfig, rgrid: ResidentGrid,
                      dyn: Sequence, side: SideBuffer, budget: int,
                      scan: MoverScan = None, n_liquid: int = None):
    """Relocate the particles whose cell changed since placement, and try to
    re-seat every side-buffer particle whose cell has room again.

    Cost model at 1M (v5e measured primitives): one N-gather (~10 ms) +
    N-cumsum + one N-scatter (~10 ms) for the mover compaction, one pass
    over the padded valid mask for the occupancy bitmasks, then everything
    is K-sized (budget = mover headroom << N).  Collision-freedom: arrivals
    fill the LOWEST free ranks of their destination cell as read from the
    PRE-move occupancy bitmask — a slot vacated this step still reads
    occupied, so clears (occupied before) and sets (free before) touch
    disjoint slots, and same-cell arrivals take distinct free ranks from
    their sorted-run order.  Hole-filling keeps each cell's occupied-rank
    ceiling at its historic maximum occupancy instead of growing with churn
    (the bump-pointer scheme it replaces), so the cadenced full rebuild is
    a rare decay pass, not a per-8-step necessity.
    Returns (grid', dyn', side')."""
    C, P, PP, NX = plan.C, plan.P, plan.PP, plan.NX
    assert C <= 31, "occupancy bitmask placement needs cell_capacity <= 31"
    nc = cfg.num_cells
    n = rgrid.slot.shape[0]
    nflat = NX * C * PP

    if scan is None:
        scan = detect_movers(plan, cfg, rgrid)
    cell_new, inbox, moved_p = scan.cell_new, scan.inbox, scan.moved_p
    csum = jnp.cumsum(moved_p.astype(jnp.int32))
    kpos = csum - 1
    write = jnp.where(moved_p & (kpos < budget), kpos, budget)
    movers = jnp.full((budget,), -1, jnp.int32).at[write].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    n_mov = csum[-1]
    lost = jnp.maximum(n_mov - budget, 0)       # stale-binned until rebuild

    # --- mover data (K-sized from here on; per-field gathers — a stacked
    # source would cost a full concat copy of every resident array) ---
    mvalid = movers >= 0
    mpid = jnp.maximum(movers, 0)
    old_slot = jnp.where(mvalid, rgrid.slot[mpid], nflat)
    os_c = jnp.minimum(old_slot, nflat - 1)
    dest = jnp.where(mvalid & inbox[os_c], cell_new[os_c], nc)
    mparts = [rgrid.xp.reshape(3, nflat)[:, os_c]]
    mparts += [d.reshape(-1, nflat)[:, os_c] for d in dyn]
    mdata = jnp.concatenate(mparts, axis=0)      # (3 + D, K) — K-sized only

    # --- side-buffer re-entry candidates (no slot to clear): every parked
    # particle retries each step; the failures rebuild a fresh side buffer
    # below, so re-entry is exactly "park only what still has no room" ---
    S = side.pid.shape[0]
    svalid = side.pid >= 0
    s_cell, s_inbox = cell_of_positions(side.pos, cfg)
    KT = budget + S
    mvalid = jnp.concatenate([mvalid, svalid])
    mpid = jnp.concatenate([mpid, jnp.maximum(side.pid, 0)])
    old_slot = jnp.concatenate([old_slot, jnp.full((S,), nflat, jnp.int32)])
    dest = jnp.concatenate([dest, jnp.where(svalid & s_inbox, s_cell, nc)])
    mdata = jnp.concatenate(
        [mdata, jnp.concatenate([side.pos, side.dyn], axis=0)], axis=1)

    # --- rank candidates within their destination cell (K-sort) ---
    order = jnp.argsort(jnp.where(mvalid, dest, nc + 1))
    sdest = dest[order]
    kio = jnp.arange(KT, dtype=jnp.int32)
    change = jnp.concatenate([jnp.ones((1,), bool),
                              sdest[1:] != sdest[:-1]])
    run_start = jax.lax.cummax(jnp.where(change, kio, 0))
    rrank = kio - run_start
    s_ok = mvalid[order] & (sdest < nc)
    dc = jnp.minimum(sdest, nc - 1)

    # --- placement: the (rrank+1)-th free rank of the destination cell,
    # from the PRE-move occupancy bitmask (one pass over the valid mask;
    # bit r of occ[plane, pp] = slot (plane, r, pp) occupied) ---
    occ = jnp.sum(
        (rgrid.pid >= 0).astype(jnp.int32)
        << jnp.arange(C, dtype=jnp.int32)[None, :, None],
        axis=1).reshape(NX * PP)                 # (NX*PP,)
    px_d = dc // P
    pp_d = dc - px_d * P
    occ_m = occ[jnp.where(s_ok, (px_d + 1) * PP + (_MARGIN + pp_d), 0)]
    bit_iota = jnp.arange(C, dtype=jnp.int32)[None, :]
    free = 1 - ((occ_m[:, None] >> bit_iota) & 1)          # (KT, C)
    freec = jnp.cumsum(free, axis=1)
    hit = (free == 1) & (freec == (rrank + 1)[:, None])
    new_rank = jnp.min(jnp.where(hit, bit_iota, C), axis=1)
    placed = s_ok & (new_rank < C)
    new_slot = jnp.where(placed, _flat_slot(plan, px_d, new_rank, pp_d),
                         nflat)
    s_pid = jnp.where(mvalid[order], mpid[order], n)
    s_old = old_slot[order]
    s_data = mdata[:, order]

    # --- apply (disjoint clears and sets; see docstring).  Multi-component
    # fields get ONE flat scalar-index scatter over the whole buffer
    # (idx + c * nflat): a per-component scatter-then-stack would copy the
    # full resident array once per component. ---
    def _multi(idx, k):
        # idx == nflat marks "drop"; keep it out of range for EVERY comp
        return jnp.concatenate([
            jnp.where(idx < nflat, idx + c * nflat, k * nflat)
            for c in range(k)])

    def _vals(o, k):
        return jnp.concatenate([s_data[o + c] for c in range(k)])

    # s_pid == n only where new_slot == nflat, so both writes drop together.
    # Clears and sets touch DISJOINT slots (arrivals fill slots that were
    # FREE in the pre-move occupancy; vacated slots read occupied there —
    # see docstring), so each buffer takes ONE scatter with concatenated
    # clear+set indices, not two.
    pid_f = rgrid.pid.ravel().at[
        jnp.concatenate([s_old, new_slot])].set(
        jnp.concatenate([jnp.full_like(s_old, -1), s_pid]), mode="drop")
    xp_f = rgrid.xp.reshape(3 * nflat).at[
        jnp.concatenate([_multi(s_old, 3), _multi(new_slot, 3)])].set(
        jnp.concatenate([jnp.full((3 * KT,), EMPTY_POS, jnp.float32),
                         _vals(0, 3)]), mode="drop")
    # liquid is derived, not scattered: only liquid particles ever move, so
    # the post-move mask is exactly (0 <= pid < n_liquid) — two scatters
    # (~0.2M indices at the measured ~10 ns/index) become one elementwise op
    if n_liquid is not None:
        liq_f = (pid_f >= 0) & (pid_f < n_liquid)
    else:
        liq_f = (rgrid.liquid.ravel().at[s_old].set(False, mode="drop")
                 .at[new_slot].set(True, mode="drop"))
    dyn_out, o = [], 3
    for d in dyn:
        k = d.shape[0] if d.ndim == 4 else 1
        nd = d.reshape(k * nflat).at[_multi(new_slot, k)].set(
            _vals(o, k), mode="drop")
        dyn_out.append(nd.reshape(d.shape))
        o += k
    # top tracks each cell's HISTORIC max occupied rank + 1 (an upper bound
    # on its count — holes only push ranks down, never up).  new_rank is
    # monotone within a run (the (r+1)-th free slot is above the r-th), so
    # the run's max placed rank is at want = min(run_len, nfree): one write
    # per destination-cell RUN (unique indices; a duplicate-index
    # scatter-add/max serializes on TPU).
    is_last_run = jnp.concatenate([sdest[1:] != sdest[:-1],
                                   jnp.ones((1,), bool)])
    k_eff = jnp.minimum(rrank + 1, freec[:, -1])
    hit_l = (free == 1) & (freec == k_eff[:, None])
    last_rank = jnp.min(jnp.where(hit_l, bit_iota, C), axis=1)
    top = rgrid.top.at[
        jnp.where(is_last_run & s_ok & (last_rank < C), dc, nc)].max(
        last_rank + 1, mode="drop")
    slot = rgrid.slot.at[s_pid].set(
        jnp.where(placed, new_slot, -1), mode="drop")

    # --- failures (cell full / out of box) rebuild a FRESH side buffer:
    # the old side entries all re-entered the candidate list above, so the
    # parked set is exactly the candidates that still have no room ---
    fail = mvalid[order] & ~placed
    fcs = jnp.cumsum(fail.astype(jnp.int32))
    # seat j <- index of the j-th failing candidate (gather, not scatter:
    # the side arrays are rebuilt whole, S is small)
    cand = jnp.full((S,), -1, jnp.int32).at[
        jnp.where(fail & (fcs - 1 < S), fcs - 1, S)].set(
        jnp.arange(KT, dtype=jnp.int32), mode="drop")
    cc = jnp.maximum(cand, 0)
    side_pid = jnp.where(cand >= 0, s_pid[cc], -1)
    side_pos = s_data[:3, cc]
    side_dyn = s_data[3:, cc]
    n_fail = fcs[-1]
    spill = jnp.maximum(n_fail - S, 0)           # lost outright
    side_n = jnp.minimum(n_fail, S)

    grid = ResidentGrid(
        pid=pid_f.reshape(rgrid.pid.shape),
        liquid=liq_f.reshape(rgrid.liquid.shape),
        xp=xp_f.reshape(rgrid.xp.shape),
        slot=slot, top=top,
        overflow=side_n,
        rebin_lost=rgrid.rebin_lost + lost + spill,
        since_rebuild=rgrid.since_rebuild)
    return grid, dyn_out, SideBuffer(pos=side_pos, dyn=side_dyn,
                                     pid=side_pid, n=side_n)


def begin_step(cfg: SimConfig, rs: ResidentState):
    """Shared head of every resident solver step: rebin (incremental, or a
    full re-sort on mover-spike/cadence — rebin_auto), then an engine +
    communicator over the relocated padded grid.  Returns
    (grid, dyn, side, comm)."""
    from .pallas.engine import PaddedEngine
    from .parallel.comm import PaddedNoComm

    plan = make_plan(cfg, cfg.cell_capacity)
    n = rs.grid.slot.shape[0]
    budget = max(1024, int(n * cfg.resident_mover_frac))
    grid, dyn, side = rebin_auto(plan, cfg, rs, budget)
    eng = PaddedEngine.from_resident(grid, cfg)
    comm = PaddedNoComm(grid, cfg, engine=eng)
    return grid, dyn, side, comm


def advance(rs: ResidentState, grid: ResidentGrid, side: SideBuffer,
            dyn_new: Sequence, new_dt, diag,
            visc_iters=None, pressure_iters=None) -> ResidentState:
    """Shared tail: position update in the padded layout (liquid slots move
    by dyn_new[0] — the convention is RESIDENT_FIELDS[0] == "vel"), side
    particles keep drifting, every dyn field stored LIQUID-MASKED (the
    resident twin of the zeros pack_liquid writes at solid slots — solver
    middles may leave pollution there that the non-resident unpack/pack
    cycle would discard)."""
    liq = grid.liquid
    masked = tuple(jnp.where(liq if d.ndim == liq.ndim else liq[None],
                             d, 0.0) for d in dyn_new)
    xp = grid.xp + jnp.where(liq[None], masked[0] * new_dt, 0.0)
    return ResidentState(
        grid=grid._replace(xp=xp),
        dyn=masked,
        side=side._replace(pos=side.pos + side.dyn[0:3] * new_dt),
        dt=new_dt,
        time=rs.time + new_dt,
        last_visc_iters=(rs.last_visc_iters if visc_iters is None
                         else visc_iters),
        last_pressure_iters=(rs.last_pressure_iters if pressure_iters is None
                             else pressure_iters),
        diag=diag, n_liquid=rs.n_liquid)


def materialize(rgrid: ResidentGrid, dyn: Sequence, side: SideBuffer):
    """Per-particle (3, N) pos + per-field dyn arrays: one stacked gather
    via slot, then the side-buffer overlay (invariant: slot == -1 iff the
    particle is parked in the side buffer, so every particle has exactly
    one data source).  Returns (pos, [dyn_fields...])."""
    nflat = rgrid.pid.size
    sidx = jnp.maximum(rgrid.slot, 0)
    stacked = jnp.concatenate(
        [rgrid.xp.reshape(3, nflat)] + [d.reshape(-1, nflat) for d in dyn],
        axis=0)
    got = stacked[:, sidx]                       # (3 + D, N)
    n = got.shape[1]
    spid = jnp.where(side.pid >= 0, side.pid, n)
    sdata = jnp.concatenate([side.pos, side.dyn], axis=0)
    # flat component-major overlay: a leading-dense-dim scatter is ~15x the
    # per-index price of a scalar one (scripts/prim_perf*.py), and this is
    # ONE thunk instead of a (rows, S)-shaped scatter
    rows = got.shape[0]
    oidx = jnp.concatenate([jnp.where(spid < n, spid + k * n, rows * n)
                            for k in range(rows)])
    got = (got.reshape(-1).at[oidx].set(sdata.reshape(-1), mode="drop")
           .reshape(rows, n))
    pos = got[:3]
    out, o = [], 3
    for d in dyn:
        k = d.shape[0] if d.ndim == 4 else 1
        sl = got[o:o + k]
        out.append(sl if d.ndim == 4 else sl[0])
        o += k
    return pos, out
