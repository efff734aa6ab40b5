"""Slab-OWNED particle decomposition: per-slab binning + particle migration.

The round-2 halo path (halo.py) ran the sweep middles inside shard_map but
still built the packed grid globally — at scale those phases replicate per
device (scripts/gspmd_hlo.py measured XLA sharding 0 of them).  This module
completes the decomposition the TPU-native way:

  * every device OWNS the particles inside its x-slab: fixed-capacity seat
    arrays sharded over a 1-D mesh (`SlabState`);
  * each step runs ONE shard_map: local cell binning (argsort over the
    slab's seats only), the existing halo-extended sweep middle
    (comm.SlabComm + SlabEngine), a local position update, and a ppermute
    MIGRATION of the particles whose new position crossed a slab boundary
    (movement per step is CFL-bounded << one cell, so only adjacent slabs
    ever exchange);
  * no global (C, NC) op exists anywhere in the per-step path — the only
    global-shape operations are one-time `slab_init` and export-rate
    `slab_gather` (both particle-space).

The reference is single-GPU (SURVEY.md §2 parallelism); this is the
framework's scaling path over a TPU pod slice (ICI ring over the x axis).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..config import SimConfig
from ..grid import DenseGrid, EMPTY_POS
from ..state import FluidState, StepDiagnostics
from .comm import AXIS
from .halo import _make_slab_comm, slab_config


class SlabState(NamedTuple):
    """Per-seat particle arrays, sharded on the seat axis (n_dev * ncap).

    A seat is a fixed storage slot owned by one device; ``pid`` maps seats
    to global particle ids (-1 = empty seat).  Solids never move, so they
    stay in their initial slab forever; liquid seats migrate."""

    pid: jnp.ndarray        # (NT,) int32 global particle id, -1 empty
    pos: jnp.ndarray        # (3, NT)
    vel: jnp.ndarray        # (3, NT)
    omega: jnp.ndarray      # (3, NT)
    vel_guess: jnp.ndarray  # (3, NT)
    kappa: jnp.ndarray      # (NT,)
    kappa_v: jnp.ndarray    # (NT,)
    dt: jnp.ndarray
    time: jnp.ndarray
    last_visc_iters: jnp.ndarray
    last_pressure_iters: jnp.ndarray
    migrated: jnp.ndarray   # () int32 migration-buffer overflow (dropped)
    diag: StepDiagnostics
    n_liquid: int           # static
    ncap: int               # static seats per device


jax.tree_util.register_pytree_node(
    SlabState,
    lambda s: (tuple(s)[:-2], (s.n_liquid, s.ncap)),
    lambda aux, c: SlabState(*c, *aux))

_F = ("pos", "vel", "omega", "vel_guess")      # (3, NT) fields
_S = ("kappa", "kappa_v")                      # (NT,) fields
_D = 3 * len(_F) + len(_S)                     # stacked payload rows


def _specs(extra=()):
    return ((P(AXIS),) + (P(None, AXIS),) * len(_F)
            + (P(AXIS),) * len(_S) + tuple(extra))


def slab_width_cells(cfg: SimConfig, n: int) -> int:
    assert cfg.grid_res[0] % n == 0, "use halo.slab_config() to pad"
    return cfg.grid_res[0] // n


def slab_init(state: FluidState, cfg: SimConfig, mesh: Mesh,
              ncap: int | None = None, slack: float = 1.35,
              solver: str = "dfsph") -> SlabState:
    """One-time seating: sort particles by owning slab, pad each slab to a
    common static capacity (max initial slab population x slack).  Runs on
    host-side numpy (boundary IO, not the hot path).  For non-DFSPH solvers
    the ``kappa`` seats carry the pressure (see the _mid_* conventions)."""
    n = mesh.devices.size
    gxl = slab_width_cells(cfg, n)
    pos = np.asarray(state.pos)
    cx = np.floor((pos[0] - cfg.domain_min[0]) / cfg.cell_size).astype(np.int64)
    slab = np.clip(cx // gxl, 0, n - 1)
    counts = np.bincount(slab, minlength=n)
    if ncap is None:
        ncap = int(-8 * (-(counts.max() * slack) // 8))
    assert counts.max() <= ncap, (counts.max(), ncap)
    order = np.argsort(slab, kind="stable")
    ssl = slab[order]
    rank = np.arange(len(order)) - np.concatenate(
        [[0], np.cumsum(counts)[:-1]])[ssl]
    seat = ssl * ncap + rank
    nt = n * ncap

    def seat_arr(x, fill=0.0):
        # liquid-sized fields ((…, n_liquid), state.py layout) seat zeros at
        # solid seats
        x = np.asarray(x)
        if x.shape[-1] < len(order):
            pad = np.zeros(x.shape[:-1] + (len(order) - x.shape[-1],),
                           x.dtype)
            x = np.concatenate([x, pad], axis=-1)
        if x.ndim == 1:
            out = np.full((nt,), fill, x.dtype)
            out[seat] = x[order]
        else:
            out = np.full((x.shape[0], nt), fill, x.dtype)
            out[:, seat] = x[:, order]
        return jnp.asarray(out)

    pid = np.full((nt,), -1, np.int32)
    pid[seat] = order.astype(np.int32)
    return SlabState(
        pid=jnp.asarray(pid),
        pos=seat_arr(state.pos, EMPTY_POS),
        vel=seat_arr(state.vel), omega=seat_arr(state.omega),
        vel_guess=seat_arr(state.vel_guess),
        kappa=seat_arr(state.kappa if solver == "dfsph" else state.pressure),
        kappa_v=seat_arr(state.kappa_v),
        dt=state.dt, time=state.time,
        last_visc_iters=state.last_visc_iters,
        last_pressure_iters=state.last_pressure_iters,
        migrated=jnp.int32(0),
        diag=state.diag, n_liquid=state.n_liquid, ncap=ncap)


def slab_gather(sst: SlabState, proto: FluidState,
                solver: str = "dfsph") -> FluidState:
    """Back to the per-particle global order (export / checkpoint / tests).
    For non-DFSPH solvers the ``kappa`` seat field carries the pressure
    (see the _mid_* seat conventions)."""
    keep = sst.pid >= 0
    idx = jnp.where(keep, sst.pid, proto.n_total)

    def back(seated, old):
        if seated.ndim == 1:
            return old.at[idx].set(jnp.where(keep, seated, 0), mode="drop")
        return old.at[:, idx].set(
            jnp.where(keep[None], seated, 0), mode="drop")

    if solver == "dfsph":
        named = dict(kappa=back(sst.kappa, proto.kappa),
                     kappa_v=back(sst.kappa_v, proto.kappa_v))
    else:
        named = dict(pressure=back(sst.kappa, proto.pressure))
    return proto.replace(
        pos=back(sst.pos, proto.pos), vel=back(sst.vel, proto.vel),
        omega=back(sst.omega, proto.omega),
        vel_guess=back(sst.vel_guess, proto.vel_guess),
        dt=sst.dt, time=sst.time,
        last_visc_iters=sst.last_visc_iters,
        last_pressure_iters=sst.last_pressure_iters, diag=sst.diag,
        **named)


def _build_grid_seats(pos_sh, pos_glob, liquid_seat, valid_seat,
                      cfg_loc: SimConfig, ncap: int):
    """build_grid over one slab's seats (grid.py:75-122 with seat-space
    pid/liquid instead of the global index-order convention).

    Binning uses the slab-LOCAL positions (``pos_sh``, shifted by the slab
    x-origin so cfg_loc's rebased domain applies), but ``xp`` stores the
    GLOBAL positions: every window op consumes xp only through pair
    differences (shift-invariant), while the boundary-adhesion gate in
    dense_ops.tension_accel / engine._TensionAccel compares xp against the
    ABSOLUTE cfg.adhesion_center — slab-local coordinates there silently
    move the adhesion region per device."""
    nc = cfg_loc.num_cells
    cap = cfg_loc.cell_capacity
    from ..grid import cell_of_positions

    cell_id, inbox = cell_of_positions(pos_sh, cfg_loc)
    cell_id = jnp.where(inbox & valid_seat, cell_id, nc)

    order = jnp.argsort(cell_id)
    sorted_cell = cell_id[order]
    iota = jnp.arange(ncap, dtype=jnp.int32)
    change = jnp.concatenate([jnp.ones((1,), bool),
                              sorted_cell[1:] != sorted_cell[:-1]])
    run_start = jax.lax.cummax(jnp.where(change, iota, 0))
    rank = iota - run_start

    pid = jnp.full((cap, nc), -1, jnp.int32)
    write_col = jnp.where(sorted_cell < nc, sorted_cell, nc + 1)
    pid = pid.at[rank, write_col].set(order.astype(jnp.int32), mode="drop")
    valid = pid >= 0
    liquid = valid & liquid_seat[jnp.maximum(pid, 0)]

    flat_slot = rank * nc + jnp.minimum(sorted_cell, nc)
    ok = (rank < cap) & (sorted_cell < nc)
    sl = jnp.where(ok, flat_slot, cap * nc)
    pos_sorted = pos_glob[:, order]
    xp = jnp.stack([
        jnp.full((cap * nc,), EMPTY_POS, jnp.float32)
        .at[sl].set(pos_sorted[c], mode="drop")
        for c in range(3)
    ]).reshape(3, cap, nc)

    slot = jnp.full((ncap,), -1, jnp.int32).at[order].set(
        jnp.where(ok, flat_slot, -1))
    overflow = jnp.sum((rank >= cap) & (sorted_cell < nc)).astype(jnp.int32)
    return DenseGrid(pid=pid, valid=valid, liquid=liquid, xp=xp,
                     slot=slot, overflow=overflow)


def _pack_seats(grid: DenseGrid, x, liquid_seat, fill: float = 0.0):
    """Seat field -> packed (…, C, NC_loc): liquid slots take the seat's
    value, solid/empty slots the fill (grid.pack_liquid twin, seat-space)."""
    cap, nc = grid.pid.shape
    sl = jnp.where((grid.slot >= 0) & liquid_seat, grid.slot, cap * nc)
    if x.ndim == 1:
        return (jnp.full((cap * nc,), fill, x.dtype)
                .at[sl].set(x, mode="drop").reshape(cap, nc))
    return jnp.stack([
        jnp.full((cap * nc,), fill, x.dtype).at[sl].set(x[c], mode="drop")
        for c in range(x.shape[0])
    ]).reshape(x.shape[0], cap, nc)


def _unpack_seats(grid: DenseGrid, packed, default):
    keep = grid.slot >= 0
    flat = packed.reshape(packed.shape[:-2] + (-1,))
    got = flat[..., jnp.maximum(grid.slot, 0)]
    if packed.ndim == 2:
        return jnp.where(keep, got, default)
    return jnp.where(keep[None], got, default)


def _migrate(pid, fields, liquid_seat, x_lo, x_hi, ncap: int, kmig: int):
    """ppermute boundary-crossers to the adjacent slabs.

    ``fields``: dict name -> seat array (pos first).  Crossers pack into
    fixed (D, kmig) payloads per direction (movement << cell per step, so
    only ring neighbors exchange); arrivals land in free seats.  Returns
    (pid', fields', n_dropped) where n_dropped counts crossers beyond the
    buffer or arrivals beyond free seats (diagnosed, like grid overflow)."""
    naxis = jax.lax.axis_size(AXIS)
    idx = jax.lax.axis_index(AXIS)
    x = fields["pos"][0]
    valid = pid >= 0
    go_l = valid & liquid_seat & (x < x_lo) & (idx > 0)
    go_r = valid & liquid_seat & (x >= x_hi) & (idx < naxis - 1)

    stacked = jnp.concatenate(
        [fields[k] if fields[k].ndim == 2 else fields[k][None]
         for k in fields], axis=0)                       # (D, ncap)

    def pack_dir(go):
        csum = jnp.cumsum(go.astype(jnp.int32))
        w = jnp.where(go & (csum - 1 < kmig), csum - 1, kmig)
        seat_of = jnp.full((kmig,), -1, jnp.int32).at[w].set(
            jnp.arange(ncap, dtype=jnp.int32), mode="drop")
        ok = seat_of >= 0
        sc = jnp.maximum(seat_of, 0)
        payload = jnp.where(ok[None], stacked[:, sc], 0.0)
        ppid = jnp.where(ok, pid[sc], -1)
        return payload, ppid, jnp.maximum(csum[-1] - kmig, 0)

    pay_l, pid_l, drop_l = pack_dir(go_l)
    pay_r, pid_r, drop_r = pack_dir(go_r)

    fwd = [(i, (i + 1) % naxis) for i in range(naxis)]
    bwd = [(i, (i - 1) % naxis) for i in range(naxis)]
    # arrivals: from the RIGHT neighbor's left-buffer and vice versa
    arr_from_r = jax.lax.ppermute(pay_l, AXIS, bwd)
    apid_from_r = jax.lax.ppermute(pid_l, AXIS, bwd)
    arr_from_l = jax.lax.ppermute(pay_r, AXIS, fwd)
    apid_from_l = jax.lax.ppermute(pid_r, AXIS, fwd)
    apid = jnp.concatenate([apid_from_l, apid_from_r])
    apay = jnp.concatenate([arr_from_l, arr_from_r], axis=1)
    # ring wrap guard: edge devices get no arrivals from outside the domain
    edge_l = (idx == 0)
    edge_r = (idx == naxis - 1)
    aok = (apid >= 0) & ~(edge_l & (jnp.arange(2 * kmig) < kmig)) \
        & ~(edge_r & (jnp.arange(2 * kmig) >= kmig))

    # clear departed seats (= the ones that fit in a buffer; overspill stays
    # seated one more step and is counted in dropped)
    dep_l = go_l & (jnp.cumsum(go_l.astype(jnp.int32)) - 1 < kmig)
    dep_r = go_r & (jnp.cumsum(go_r.astype(jnp.int32)) - 1 < kmig)
    departed = dep_l | dep_r
    pid2 = jnp.where(departed, -1, pid)
    stacked2 = jnp.where(departed[None], 0.0, stacked)
    stacked2 = jnp.where(departed[None] & (jnp.arange(stacked.shape[0])
                                           < 3)[:, None],
                         EMPTY_POS, stacked2)

    # free seats for arrivals
    free = pid2 < 0
    fcs = jnp.cumsum(free.astype(jnp.int32))
    acs = jnp.cumsum(aok.astype(jnp.int32)) - 1       # arrival order
    # seat of the j-th free slot: scatter seat ids by free-rank
    nfree = fcs[-1]
    free_seat = jnp.full((2 * kmig,), ncap, jnp.int32).at[
        jnp.where(free & (fcs - 1 < 2 * kmig), fcs - 1, 2 * kmig)].set(
        jnp.arange(ncap, dtype=jnp.int32), mode="drop")
    a_ok2 = aok & (acs < jnp.minimum(nfree, 2 * kmig))
    dest_seat = jnp.where(a_ok2, free_seat[jnp.minimum(acs, 2 * kmig - 1)],
                          ncap)
    pid3 = pid2.at[dest_seat].set(jnp.where(a_ok2, apid, -1), mode="drop")
    flat = stacked2.reshape(-1)
    nrows = stacked.shape[0]
    didx = jnp.concatenate([
        jnp.where(dest_seat < ncap, dest_seat + r * ncap, nrows * ncap)
        for r in range(nrows)])
    vals = jnp.concatenate([apay[r] for r in range(nrows)])
    flat = flat.at[didx].set(vals, mode="drop")
    stacked3 = flat.reshape(nrows, ncap)

    # buffer-overspill migrants (drop_l/drop_r) stay seated and retry next
    # step (stale-binned one step, like resident.rebin_lost); only arrivals
    # beyond the free seats are actually lost
    del drop_l, drop_r
    dropped = jnp.sum(aok & ~a_ok2)

    out = {}
    o = 0
    for k in fields:
        r = fields[k].shape[0] if fields[k].ndim == 2 else 1
        sl = stacked3[o:o + r]
        out[k] = sl if fields[k].ndim == 2 else sl[0]
        o += r
    return pid3, out, dropped


def _local_cfg(cfg: SimConfig, n: int) -> SimConfig:
    """Config whose grid is one slab (gx/n planes), x-domain rebased to 0
    width; positions are shifted by the slab origin before binning."""
    gx, gy, gz = cfg.grid_res
    gxl = gx // n
    new_max = (cfg.domain_min[0] + (gxl - 0.5) * cfg.cell_size,
               cfg.domain_max[1], cfg.domain_max[2])
    out = dataclasses.replace(cfg, domain_max=new_max)
    assert out.grid_res == (gxl, gy, gz), (out.grid_res, gxl)
    return out


def _mid_dfsph(comm, cfg, f, dt, last_pr):
    from ..solvers import dfsph
    m = dfsph.step_middle(comm, cfg, f["vel"], f["omega"], f["vel_guess"],
                          f["kappa"], f["kappa_v"], dt, last_pr)
    return ({"vel": m.vel, "omega": m.omega, "vel_guess": m.vel_guess,
             "kappa": m.kappa, "kappa_v": m.kappa_v},
            m.new_dt, (m.div_iters, m.pr_iters, m.visc_iters,
                       m.err, m.err_pre))


def _mid_iisph(comm, cfg, f, dt, last_pr):
    # seat convention for non-DFSPH solvers: ``kappa`` carries the pressure
    # (IISPH p_pre warm start rides migration), ``vel_guess`` the viscosity
    # warm start — the same field sets as their RESIDENT_FIELDS
    from ..solvers import iisph
    m = iisph.step_middle(comm, cfg, f["vel"], f["vel_guess"], f["kappa"],
                          dt)
    return ({"vel": m.vel, "vel_guess": m.delta_v, "kappa": m.pressure},
            dt, (jnp.int32(0), m.iters, m.visc_iters, m.err, m.err_pre))


def _mid_pcisph(comm, cfg, f, dt, last_pr):
    from ..solvers import pcisph
    m = pcisph.step_middle(comm, cfg, f["vel"], dt)
    return ({"vel": m.vel, "kappa": m.pressure},
            dt, (jnp.int32(0), m.iters, jnp.int32(0), m.err, m.err_pre))


def _mid_sesph(comm, cfg, f, dt, last_pr):
    from ..solvers import sesph
    vel_new, rhop, pp = sesph.step_middle(comm, cfg, f["vel"], dt)
    err = comm.lsum(rhop) / comm.n_liquid() / cfg.rest_density - 1.0
    return ({"vel": vel_new, "kappa": pp},
            dt, (jnp.int32(0), jnp.int32(0), jnp.int32(0), err,
                 jnp.float32(0.0)))


_MIDDLES = {"dfsph": _mid_dfsph, "iisph": _mid_iisph,
            "pcisph": _mid_pcisph, "sesph": _mid_sesph}


def step_slab(sst: SlabState, cfg: SimConfig, mesh: Mesh,
              solver: str = "dfsph") -> SlabState:
    """One solver step, fully decomposed: local binning + halo middle +
    migration inside ONE shard_map (the solver's comm-parameterized
    step_middle under comm.SlabComm; the reference analogue is the
    per-frame loop dfsph.py:600-617 on a single GPU).  All four solvers
    run — their middles are comm-parameterized (parallel/halo.py)."""
    middle_fn = _MIDDLES[solver]

    n = mesh.devices.size
    cfg_loc = _local_cfg(cfg, n)
    gxl = slab_width_cells(cfg, n)
    slab_w = gxl * cfg.cell_size
    ncap = sst.ncap
    kmig = max(64, ncap // 16)
    nl = sst.n_liquid

    @partial(shard_map, mesh=mesh,
             in_specs=_specs((P(), P())),
             out_specs=(P(AXIS),) + (P(None, AXIS),) * 4 + (P(AXIS),) * 2
             + (P(),) * 9,
             check_vma=False)
    def step(pid, pos, vel, omega, vg, kp, kv, dt, last_pr):
        idx = jax.lax.axis_index(AXIS)
        x0 = cfg.domain_min[0] + idx.astype(jnp.float32) * slab_w
        shift = jnp.stack([x0 - cfg.domain_min[0],
                           jnp.float32(0), jnp.float32(0)])[:, None]
        valid_seat = pid >= 0
        liquid_seat = valid_seat & (pid < nl)
        pos_sh = jnp.where(valid_seat[None], pos - shift, EMPTY_POS)
        pos_glob = jnp.where(valid_seat[None], pos, EMPTY_POS)

        grid = _build_grid_seats(pos_sh, pos_glob, liquid_seat, valid_seat,
                                 cfg_loc, ncap)
        comm = _make_slab_comm(grid.pid, grid.valid, grid.liquid, grid.xp,
                               cfg, n)
        fin = {"vel": _pack_seats(grid, vel, liquid_seat),
               "omega": _pack_seats(grid, omega, liquid_seat),
               "vel_guess": _pack_seats(grid, vg, liquid_seat),
               "kappa": _pack_seats(grid, kp, liquid_seat),
               "kappa_v": _pack_seats(grid, kv, liquid_seat)}

        upd, new_dt, (dv_it, pr_it, vs_it, err, err_pre) = middle_fn(
            comm, cfg, fin, dt, last_pr)

        def back(name, seat):
            if name not in upd:
                return seat
            got = _unpack_seats(grid, upd[name], 0.0)
            mask = liquid_seat if seat.ndim == 1 else liquid_seat[None]
            return jnp.where(mask, got, seat)

        vel2 = back("vel", vel)
        omega2 = back("omega", omega)
        vg2 = back("vel_guess", vg)
        kp2 = back("kappa", kp)
        kv2 = back("kappa_v", kv)
        pos2 = jnp.where(liquid_seat[None], pos + vel2 * new_dt, pos)
        vmax_sq = jax.lax.pmax(
            jnp.max(jnp.sum(vel2 * vel2, axis=0)), AXIS)

        pid2, f2, dropped = _migrate(
            pid, {"pos": pos2, "vel": vel2, "omega": omega2,
                  "vel_guess": vg2, "kappa": kp2, "kappa_v": kv2},
            liquid_seat, x0, x0 + slab_w, ncap, kmig)

        ovf = jax.lax.psum(grid.overflow + dropped, AXIS)
        return (pid2, f2["pos"], f2["vel"], f2["omega"], f2["vel_guess"],
                f2["kappa"], f2["kappa_v"], new_dt, dv_it,
                pr_it, vs_it, err, err_pre, ovf,
                jnp.sqrt(vmax_sq), jax.lax.psum(dropped, AXIS))

    (pid, pos, vel, omega, vg, kp, kv, new_dt, dv_it, pr_it, vs_it, err,
     err_pre, ovf, vmax, migdrop) = step(
        sst.pid, sst.pos, sst.vel, sst.omega, sst.vel_guess, sst.kappa,
        sst.kappa_v, sst.dt, sst.last_pressure_iters)

    diag = StepDiagnostics(
        divergence_iters=dv_it, pressure_iters=pr_it, viscosity_iters=vs_it,
        density_error=err, density_error_pre=err_pre,
        neighbor_overflow=ovf, vel_max=vmax)
    return sst._replace(
        pid=pid, pos=pos, vel=vel, omega=omega, vel_guess=vg, kappa=kp,
        kappa_v=kv, dt=new_dt, time=sst.time + new_dt,
        last_visc_iters=vs_it, last_pressure_iters=pr_it,
        migrated=sst.migrated + migdrop, diag=diag)


def dfsph_step_slab(sst: SlabState, cfg: SimConfig, mesh: Mesh) -> SlabState:
    """Backward-compatible alias: the DFSPH instance of step_slab."""
    return step_slab(sst, cfg, mesh, "dfsph")
