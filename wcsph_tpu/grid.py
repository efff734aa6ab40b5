"""Cell-dense packed particle layout — the TPU-native neighbor structure.

Measurement-driven design (see also neighbors.py, kept for tooling/tests):
arbitrary element gathers run at ~5 ns/element on TPU, so a gather-based
neighbor list costs seconds per step at 100k particles.  This module instead
packs particles into a dense (C, num_cells) grid, after which the 27-cell
neighborhood of every cell is reachable by 27 STATIC shifts of the packed
arrays along the cell axis — neighbor access compiles to sliced copies and
dense (C, C, NC) vector math, with no gathers anywhere in the hot path.

Correctness details:
  * Empty slots carry position 1e9, so the distance cull (d2 <= h^2) masks
    them for free.
  * A linear shift wraps across grid rows (cell (x, gy-1, z) + dy=+1 lands in
    (x+1, 0, z)); wrapped cells are masked by an on-the-fly in-box test per
    offset (cheap (NC,) iota math, no stored masks).
  * Cell capacity C is a hard cap like the reference's maxInGrid
    (HashGrid.py:73): overflowing particles drop out of the grid for that
    step (they keep their state, get no interactions) and are counted in
    ``overflow``.

The reference's HashGrid (atomic appends + per-particle 2048-wide neighbor
lists, HashGrid.py:56-106) provides the same service; this is its shape on a
machine with no atomics and 128-wide vector lanes.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .config import SimConfig

# Far-away sentinel position for empty slots: guarantees d2 > h^2.
EMPTY_POS = 1.0e9

_OFFSETS: Tuple[Tuple[int, int, int], ...] = tuple(
    (dx, dy, dz)
    for dx in (-1, 0, 1) for dy in (-1, 0, 1) for dz in (-1, 0, 1)
)


class DenseGrid(NamedTuple):
    """Packed particle layout for one step (positions frozen per step)."""

    pid: jnp.ndarray       # (C, NC) particle id per slot, -1 empty
    valid: jnp.ndarray     # (C, NC) slot occupied
    liquid: jnp.ndarray    # (C, NC) slot holds a liquid particle
    xp: jnp.ndarray        # (3, C, NC) packed positions (EMPTY_POS where empty)
    slot: jnp.ndarray      # (NL,) flat slot index of each liquid particle, -1 if dropped
    overflow: jnp.ndarray  # () int32 particles dropped (cell capacity exceeded)


def linear_offset(off: Tuple[int, int, int], cfg: SimConfig) -> int:
    gx, gy, gz = cfg.grid_res
    dx, dy, dz = off
    return (dx * gy + dy) * gz + dz


def cell_of_positions(pos: jnp.ndarray, cfg: SimConfig):
    """(cell ids (N,), in-box mask) for planar positions (3, N)."""
    gx, gy, gz = cfg.grid_res
    dmin = jnp.asarray(cfg.domain_min, jnp.float32)
    inv = 1.0 / cfg.cell_size
    cx = jnp.floor((pos[0] - dmin[0]) * inv).astype(jnp.int32)
    cy = jnp.floor((pos[1] - dmin[1]) * inv).astype(jnp.int32)
    cz = jnp.floor((pos[2] - dmin[2]) * inv).astype(jnp.int32)
    inbox = ((cx >= 0) & (cx < gx) & (cy >= 0) & (cy < gy)
             & (cz >= 0) & (cz < gz))
    return (cx * gy + cy) * gz + cz, inbox


def build_grid(pos: jnp.ndarray, n_liquid: int, cfg: SimConfig) -> DenseGrid:
    """Sort by cell id, place each particle at (rank-in-cell, cell)."""
    n = pos.shape[1]
    nc = cfg.num_cells
    cap = cfg.cell_capacity

    cell_id, inbox = cell_of_positions(pos, cfg)
    cell_id = jnp.where(inbox, cell_id, nc)

    order = jnp.argsort(cell_id)
    sorted_cell = cell_id[order]
    # rank within the equal-key run via cummax of run starts (cheaper than a
    # searchsorted over num_cells keys)
    iota = jnp.arange(n, dtype=jnp.int32)
    change = jnp.concatenate([jnp.ones((1,), bool),
                              sorted_cell[1:] != sorted_cell[:-1]])
    run_start = jax.lax.cummax(jnp.where(change, iota, 0))
    rank = iota - run_start

    pid = jnp.full((cap, nc), -1, jnp.int32)
    write_col = jnp.where(sorted_cell < nc, sorted_cell, nc + 1)
    pid = pid.at[rank, write_col].set(order.astype(jnp.int32), mode="drop")

    valid = pid >= 0
    liquid = valid & (pid < n_liquid)

    # flat slot = rank * NC + cell; scatter positions N-wise (an N-sized
    # scatter beats a (C, NC)-sized gather ~8x in indexing traffic at C=24)
    flat_slot = rank * nc + jnp.minimum(sorted_cell, nc)
    ok = (rank < cap) & (sorted_cell < nc)
    sl = jnp.where(ok, flat_slot, cap * nc)
    # one scalar scatter per component: XLA lowers a leading-dense-dim
    # scatter (.at[:, sl]) ~15x slower than 3 scalar scatters (measured
    # 100 ms vs 3x7 ms at 1M on v5e; scripts/prim_perf.py)
    pos_sorted = pos[:, order]
    xp = jnp.stack([
        jnp.full((cap * nc,), EMPTY_POS, jnp.float32)
        .at[sl].set(pos_sorted[c], mode="drop")
        for c in range(3)
    ]).reshape(3, cap, nc)

    slot_all = jnp.full((n,), -1, jnp.int32)
    slot_all = slot_all.at[order].set(jnp.where(ok, flat_slot, -1))
    slot = slot_all[:n_liquid]

    overflow = jnp.sum((rank >= cap) & (sorted_cell < nc)).astype(jnp.int32)
    return DenseGrid(pid=pid, valid=valid, liquid=liquid, xp=xp,
                     slot=slot, overflow=overflow)


# ---------------------------------------------------------------------------
# pack / unpack between per-particle and packed layouts
# ---------------------------------------------------------------------------

def pack_liquid(grid: DenseGrid, x: jnp.ndarray, fill: float = 0.0) -> jnp.ndarray:
    """Per-liquid (NL,) or (3, NL) -> packed (C, NC) / (3, C, NC); solid and
    empty slots take ``fill`` (solids have no vel/rho/pressure, matching the
    reference's j < liquid_count branches).

    Implemented as an N-sized scatter through grid.slot rather than a
    (C, NC)-sized gather through grid.pid: TPU scatter/gather cost scales
    with the indexed element count, and N << C * NC."""
    cap, nc = grid.pid.shape
    keep = grid.slot >= 0
    sl = jnp.where(keep, grid.slot, cap * nc)
    if x.ndim == 1:
        flat = jnp.full((cap * nc,), fill, x.dtype)
        return flat.at[sl].set(x, mode="drop").reshape(cap, nc)
    # per-component scalar scatters (leading-dense-dim scatter is ~15x
    # slower on TPU; see build_grid / scripts/prim_perf.py)
    return jnp.stack([
        jnp.full((cap * nc,), fill, x.dtype).at[sl].set(x[c], mode="drop")
        for c in range(x.shape[0])
    ]).reshape(x.shape[0], cap, nc)


def pack_liquid_many(grid: DenseGrid, fields, fill: float = 0.0):
    """Pack several per-liquid fields at once via ONE stacked gather.

    ``fields``: sequence of (NL,) or (k, NL) arrays.  Returns matching packed
    (C, NC) / (k, C, NC) arrays.  A single leading-dim gather through
    grid.pid costs nearly the same as a scalar one (~55 ms for 11 components
    at 1M on v5e vs ~10 ms/component for scatters; scripts/prim_perf2.py),
    so batching every field into one gather is the cheapest pack there is.
    """
    cap, nc = grid.pid.shape
    parts = []
    sizes = []
    for x in fields:
        x2 = x[None] if x.ndim == 1 else x
        parts.append(x2)
        sizes.append(x2.shape[0])
    stacked = jnp.concatenate(parts, axis=0)               # (K, NL)
    idx = jnp.maximum(grid.pid, 0).ravel()                 # (C*NC,)
    got = stacked[:, idx].reshape(len(stacked), cap, nc)
    got = jnp.where(grid.liquid[None], got, fill)
    out = []
    o = 0
    for x, k in zip(fields, sizes):
        sl = got[o:o + k]
        out.append(sl[0] if x.ndim == 1 else sl)
        o += k
    return out


def unpack_liquid_many(grid: DenseGrid, packed, defaults):
    """Unpack several packed fields at once via ONE stacked slot gather.
    Dropped particles (slot == -1) keep their ``defaults`` entry."""
    parts = []
    sizes = []
    for xp in packed:
        x2 = xp.reshape((1, -1) if xp.ndim == 2 else (xp.shape[0], -1))
        parts.append(x2)
        sizes.append(x2.shape[0])
    stacked = jnp.concatenate(parts, axis=0)               # (K, C*NC)
    keep = grid.slot >= 0
    got = stacked[:, jnp.maximum(grid.slot, 0)]            # (K, NL)
    out = []
    o = 0
    for xp, d, k in zip(packed, defaults, sizes):
        sl = got[o:o + k]
        if xp.ndim == 2:
            out.append(jnp.where(keep, sl[0], d))
        else:
            out.append(jnp.where(keep[None], sl, d))
        o += k
    return out


def unpack_liquid(grid: DenseGrid, xp: jnp.ndarray,
                  default: jnp.ndarray) -> jnp.ndarray:
    """Packed (C, NC)/(3, C, NC) -> per-liquid (NL,)/(3, NL).  Dropped
    particles (slot == -1, capacity overflow) keep ``default``."""
    flat = xp.reshape(xp.shape[:-2] + (-1,))
    sc = jnp.maximum(grid.slot, 0)
    got = flat[..., sc]
    keep = grid.slot >= 0
    if xp.ndim == 2:
        return jnp.where(keep, got, default)
    return jnp.where(keep[None], got, default)


# ---------------------------------------------------------------------------
# shifted views (used by dense_ops.WindowLoop and tests)
# ---------------------------------------------------------------------------

def shift_cells(a: jnp.ndarray, o: int, fill) -> jnp.ndarray:
    """Shift packed array a (..., NC) by a STATIC o cells:
    out[..., c] = a[..., c + o] with ``fill`` where c + o runs off the end."""
    if o == 0:
        return a
    pad = jnp.full(a.shape[:-1] + (abs(o),), fill, a.dtype)
    if o > 0:
        return jnp.concatenate([a[..., o:], pad], axis=-1)
    return jnp.concatenate([pad, a[..., :o]], axis=-1)
