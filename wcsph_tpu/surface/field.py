"""Surface scalar field on a dense reconstruction grid.

Reference: MCGrid.cal_surface_point (MarchingCubeGrid.py:182-209) re-bins
particles into a denser grid (cell 0.9 r) and scans 9x9x9 cells per grid
point.  TPU redesign: the reconstruction points are a regular refinement of
the SIM cells (mc_sub^3 points per cell, mc cell = h / mc_sub), so the field
is one packed-window sweep with home = grid points, neighbors = the 27
shifted particle cells — the same zero-gather pattern as the solver sweeps.

With mc_sub = 4 the point spacing is r (the reference uses 0.9 r); the
support of the field kernel is h_mc = 4 * spacing = h, matching the
reference's searchR = 4 * gridR (MarchingCubeGrid.py:25).

phi(x) = sum_liq (m / rho_j) W_mc(x - x_j), with contributions gated to
rho_j above the rest-kernel density (MarchingCubeGrid.py:203-205).  The
anisotropic variant (cal_surface_point_anistropic, 214-246) evaluates
W(2 G_j r) at smoothed centers 0.05 x_j + 0.95 x̄_j.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import dense_ops, kernels
from ..config import SimConfig
from ..grid import DenseGrid

MC_SUB = 4  # reconstruction points per sim cell per axis

# refinement points evaluated per inner step: the per-offset pair block is
# (points, C, NC) — at showcase scale (NC ~1e5, C=32) all 64 points at once
# is a ~2.6 GB temporary and the whole sweep OOMs 16 GB HBM under remat;
# 16-point chunks keep the peak ~4x smaller at identical results (the chunk
# axis never splits a summation)
MC_POINT_CHUNK = 16


def _point_offsets(cfg: SimConfig) -> np.ndarray:
    """(3, MC_SUB^3) offsets of the reconstruction points inside one cell."""
    s = cfg.cell_size / MC_SUB
    ax = np.arange(MC_SUB) * s
    g = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), 0).reshape(3, -1)
    return g.astype(np.float32)


def _cell_origins(cfg: SimConfig) -> jnp.ndarray:
    """(3, NC) world coordinates of each sim cell's min corner."""
    gx, gy, gz = cfg.grid_res
    nc = cfg.num_cells
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, nc), 1)[0]
    cx = (idx // (gy * gz)).astype(jnp.float32)
    cy = ((idx // gz) % gy).astype(jnp.float32)
    cz = (idx % gz).astype(jnp.float32)
    dmin = jnp.asarray(cfg.domain_min, jnp.float32)
    return jnp.stack([dmin[0] + cx * cfg.cell_size,
                      dmin[1] + cy * cfg.cell_size,
                      dmin[2] + cz * cfg.cell_size])


def mc_field_packed(grid: DenseGrid, cfg: SimConfig, rhop: jnp.ndarray,
                    pos_smooth: Optional[jnp.ndarray] = None,
                    g_packed: Optional[Tuple[jnp.ndarray, ...]] = None) -> jnp.ndarray:
    """Scalar field at the refinement points, shape (MC_SUB^3, NC).

    pos_smooth: optional packed (3, C, NC) smoothed particle centers.
    g_packed: optional anisotropy matrix G per particle as 9 packed (C, NC)
    arrays (row-major); the kernel is evaluated at 2 * G r (ParticleData
    anisotropic variant).
    """
    h_mc = cfg.cell_size  # = 4 * point spacing = h
    pts = jnp.asarray(_point_offsets(cfg))            # (3, B)
    home = _cell_origins(cfg)[:, None, :] + pts[:, :, None]   # (3, B, NC)
    b = pts.shape[1]

    loop = dense_ops.WindowLoop(grid, cfg)
    xsrc = grid.xp if pos_smooth is None else pos_smooth
    x_pad = loop.pad(xsrc, 1e9)
    rho_pad = loop.pad(rhop, 1.0)
    liq_pad = loop.pad(grid.liquid, False)
    g_pads = None if g_packed is None else [loop.pad(g, 0.0) for g in g_packed]

    # gate: rho_j above rest-kernel density (MarchingCubeGrid.py:203-205).
    # Documented divergence: the reference evaluates W0 with its MC kernel
    # radius (3.6 r); ours uses h = 4 r, a slightly lower (more inclusive)
    # gate — both are heuristic splash filters.
    rho_gate = cfg.liquid_mass * kernels.cubic_w0(cfg.support_radius)

    nc = cfg.num_cells
    bc = MC_POINT_CHUNK if b % MC_POINT_CHUNK == 0 else b
    nch = b // bc
    # (nch, 3, bc, NC) — point chunks ride a lax.map so only one chunk's
    # pair block is live at a time
    home_ch = jnp.moveaxis(home.reshape(3, nch, bc, nc), 1, 0)

    def fn(acc, w, lp):
        xj = lp.shift(x_pad, w.lin)                    # (3, C, NC)
        liq_j = lp.shift(liq_pad, w.lin)[None]
        rho_j = lp.shift(rho_pad, w.lin)[None]
        gate = liq_j & (rho_j > rho_gate)
        coeff = jnp.where(gate, cfg.liquid_mass / jnp.maximum(rho_j, 1.0),
                          0.0)                         # (1, C, NC)
        gm = (None if g_pads is None
              else [lp.shift(gp, w.lin)[None] for gp in g_pads])

        def chunk(home_c):                             # (3, bc, NC)
            r = home_c[:, :, None, :] - xj[:, None, :, :]  # (3, bc, C, NC)
            if gm is not None:
                gr = [2.0 * (gm[3 * i] * r[0] + gm[3 * i + 1] * r[1]
                             + gm[3 * i + 2] * r[2]) for i in range(3)]
                d2 = gr[0] ** 2 + gr[1] ** 2 + gr[2] ** 2
            else:
                d2 = jnp.sum(r * r, axis=0)            # (bc, C, NC)
            wk = jnp.where(gate,
                           kernels.cubic_w_scalar(jnp.sqrt(d2), h_mc), 0.0)
            return jnp.sum(coeff * wk, axis=1)         # (bc, NC)

        return acc + jax.lax.map(chunk, home_ch).reshape(b, nc)

    return loop.scan(fn, jnp.zeros((b, nc), jnp.float32))


def field_to_dense(phi: jnp.ndarray, cfg: SimConfig) -> jnp.ndarray:
    """(MC_SUB^3, NC) -> dense (gx*MC_SUB, gy*MC_SUB, gz*MC_SUB) 3-D field."""
    gx, gy, gz = cfg.grid_res
    s = MC_SUB
    a = phi.reshape(s, s, s, gx, gy, gz)
    a = jnp.transpose(a, (3, 0, 4, 1, 5, 2))
    return a.reshape(gx * s, gy * s, gz * s)


def mc_grid_geometry(cfg: SimConfig):
    """(origin (3,), spacing) of the dense reconstruction grid."""
    return np.asarray(cfg.domain_min, np.float32), cfg.cell_size / MC_SUB
