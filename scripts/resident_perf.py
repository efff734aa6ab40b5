"""Dev perf: piecewise timing of the resident-mode step at scale (TPU).

Times (a) the incremental rebin alone, (b) engine-mask construction from the
padded grid, (c) the cadenced full rebuild, against the non-resident
build+pack+unpack they replace.  Usage:
    python scripts/resident_perf.py [side]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from wcsph_tpu import dam_break, resident
from wcsph_tpu.simulation import Simulation, default_config
from wcsph_tpu.pallas.engine import PaddedEngine, make_plan

side = int(sys.argv[1]) if len(sys.argv) > 1 else 100
r = 0.025
sc = dam_break(particle_radius=r, fluid_dims=(side,) * 3,
               box_extent=side * 2 * r * 1.35)
lo, hi = sc.domain(pad=6 * r)
cfg = default_config("dfsph", particle_radius=r, domain_min=lo, domain_max=hi,
                     use_pallas=True, cell_capacity=24, resident=True)
sim = Simulation(sc, cfg, solver="dfsph")
for _ in range(4):
    sim.step()
rs = sim._rs
np.asarray(rs.grid.xp.ravel()[0])
plan = make_plan(cfg, cfg.cell_capacity)
n = rs.grid.slot.shape[0]
budget = max(1024, int(n * cfg.resident_mover_frac))
print(f"n={n} budget={budget} nflat={rs.grid.pid.size}", file=sys.stderr)


def bench(name, f, *args):
    """NOTE: sync by ONE element pull only — a per-leaf `.ravel()[0]` pull
    costs a full tunnel round trip per leaf on the remote-TPU platform and
    inflated earlier runs ~6x (rebin showed 1202 ms here vs 136 ms device /
    197 ms wall in the op trace, scripts/rebin_trace.py)."""
    g = jax.jit(f)
    out = g(*args)
    leaves = jax.tree_util.tree_leaves(out)
    np.asarray(leaves[0].ravel()[0])
    t0 = time.time()
    for _ in range(8):
        out = g(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    print(f"{name:30s} {(time.time() - t0) / 8 * 1e3:8.2f} ms")


bench("rebin_incremental", lambda g, d, s: resident.rebin_incremental(
    plan, cfg, g, d, s, budget), rs.grid, rs.dyn, rs.side)
bench("from_resident masks", lambda g: (
    lambda e: (e.act_sym, e.nz_sym, e.vol_pad))(
        PaddedEngine.from_resident(g, cfg)), rs.grid)
bench("rebuild (full)", lambda r_: resident.rebuild(cfg, r_), rs)
bench("materialize", lambda g, d, s: resident.materialize(g, d, s),
      rs.grid, rs.dyn, rs.side)

# pieces of rebin
from wcsph_tpu.grid import cell_of_positions
nflat = rs.grid.pid.size


def p_cellcheck(g):
    cell_new, inbox = cell_of_positions(g.xp.reshape(3, nflat), cfg)
    slot_cell, _ = resident._slot_cells(plan, cfg)
    slot_cell = jnp.broadcast_to(slot_cell, g.pid.shape).ravel()
    valid = (g.pid >= 0).ravel()
    return valid & ((cell_new != slot_cell) | ~inbox) & g.liquid.ravel()


bench("  cell check (slot space)", p_cellcheck, rs.grid)


def p_compact(g):
    moved = p_cellcheck(g)
    in_grid = g.slot >= 0
    moved_p = moved[jnp.maximum(g.slot, 0)] & in_grid
    csum = jnp.cumsum(moved_p.astype(jnp.int32))
    kpos = csum - 1
    write = jnp.where(moved_p & (kpos < budget), kpos, budget)
    movers = jnp.full((budget,), -1, jnp.int32).at[write].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    return movers, csum[-1]


bench("  + particle compaction", p_compact, rs.grid)


def p_moverdata(g, dyn):
    movers, _ = p_compact(g)
    cell_new, inbox = cell_of_positions(g.xp.reshape(3, nflat), cfg)
    mvalid = movers >= 0
    mpid = jnp.maximum(movers, 0)
    old_slot = jnp.where(mvalid, g.slot[mpid], nflat)
    os_c = jnp.minimum(old_slot, nflat - 1)
    dest = jnp.where(mvalid & inbox[os_c], cell_new[os_c], nc_cells)
    mparts = [g.xp.reshape(3, nflat)[:, os_c]]
    mparts += [d.reshape(-1, nflat)[:, os_c] for d in dyn]
    return jnp.concatenate(mparts, axis=0), dest, old_slot, mpid, mvalid


nc_cells = cfg.num_cells
bench("  + mover gathers", p_moverdata, rs.grid, rs.dyn)


def p_sortrank(g, dyn):
    mdata, dest, old_slot, mpid, mvalid = p_moverdata(g, dyn)
    order = jnp.argsort(jnp.where(mvalid, dest, nc_cells + 1))
    sdest = dest[order]
    kio = jnp.arange(budget, dtype=jnp.int32)
    change = jnp.concatenate([jnp.ones((1,), bool), sdest[1:] != sdest[:-1]])
    run_start = jax.lax.cummax(jnp.where(change, kio, 0))
    rrank = kio - run_start
    s_ok = mvalid[order] & (sdest < nc_cells)
    dc = jnp.minimum(sdest, nc_cells - 1)
    # occupancy-bitmask hole-filling placement (resident.rebin_incremental)
    C = plan.C
    px_d = dc // plan.P
    pp_d = dc - px_d * plan.P
    occ = jnp.sum((g.pid >= 0).astype(jnp.int32)
                  << jnp.arange(C, dtype=jnp.int32)[None, :, None],
                  axis=1).reshape(plan.NX * plan.PP)
    occ_m = occ[jnp.where(s_ok, (px_d + 1) * plan.PP
                          + (resident._MARGIN + pp_d), 0)]
    bit_iota = jnp.arange(C, dtype=jnp.int32)[None, :]
    free = 1 - ((occ_m[:, None] >> bit_iota) & 1)
    freec = jnp.cumsum(free, axis=1)
    hit = (free == 1) & (freec == (rrank + 1)[:, None])
    new_rank = jnp.min(jnp.where(hit, bit_iota, C), axis=1)
    placed = s_ok & (new_rank < C)
    new_slot = jnp.where(
        placed, resident._flat_slot(plan, px_d, new_rank, pp_d), nflat)
    return new_slot, placed, mdata[:, order], old_slot[order]


bench("  + sort/rank", p_sortrank, rs.grid, rs.dyn)


def p_apply(g, dyn):
    new_slot, placed, s_data, s_old = p_sortrank(g, dyn)

    def _multi(idx, k):
        return jnp.concatenate([
            jnp.where(idx < nflat, idx + c * nflat, k * nflat)
            for c in range(k)])

    xp_f = (g.xp.reshape(3 * nflat)
            .at[_multi(s_old, 3)].set(1e9, mode="drop")
            .at[_multi(new_slot, 3)].set(
                jnp.concatenate([s_data[c] for c in range(3)]), mode="drop"))
    outs = [xp_f]
    o = 3
    for d in dyn:
        k = d.shape[0] if d.ndim == 4 else 1
        outs.append(d.reshape(k * nflat).at[_multi(new_slot, k)].set(
            jnp.concatenate([s_data[o + c] for c in range(k)]), mode="drop"))
        o += k
    return outs


bench("  + apply scatters", p_apply, rs.grid, rs.dyn)

# mask pieces
from wcsph_tpu.pallas.engine import (_chunk_counts_padded, _chunk_counts,
                                     _active_masks, _active_masks_sym)


def p_counts_pad(g):
    valid = g.pid >= 0
    return (_chunk_counts_padded(plan, valid),
            _chunk_counts_padded(plan, g.liquid))


bench("  masks: counts (padded)", p_counts_pad, rs.grid)


def p_counts_via_packed(g):
    def to_packed(occ):
        core = occ[1:-1, :, resident._MARGIN:resident._MARGIN + plan.P]
        return jnp.moveaxis(core, 0, 1).reshape(plan.C, plan.gx * plan.P)
    return (_chunk_counts(plan, to_packed(g.pid >= 0)),
            _chunk_counts(plan, to_packed(g.liquid)))


bench("  masks: counts (via packed)", p_counts_via_packed, rs.grid)


def p_masks_only(g):
    ca, cl = p_counts_via_packed(g)
    return _active_masks_sym(plan, ca, cl)


bench("  masks: bitmask math", p_masks_only, rs.grid)
