"""Debug exports (reference MCGrid.export_vertex MarchingCubeGrid.py:106-120
and ParticleData.export_kernel ParticleData.py:302-311)."""

from __future__ import annotations

import os

import jax
import numpy as np

from .. import dense_ops
from ..config import SimConfig
from ..grid import build_grid, unpack_liquid
from ..state import FluidState
from ..surface import field as field_mod
from . import objio


def export_field_points(state: FluidState, cfg: SimConfig, path: str,
                        threshold: float = 0.0) -> int:
    """Dump reconstruction-grid points with positive field value as an OBJ
    point cloud (MCGrid.export_vertex)."""

    @jax.jit
    def go(pos):
        grid = build_grid(pos, state.n_liquid, cfg)
        rhop = dense_ops.density_stats(grid, cfg, False).rho
        phi = field_mod.mc_field_packed(grid, cfg, rhop)
        return field_mod.field_to_dense(phi, cfg)

    dense = np.asarray(go(state.pos))
    origin, spacing = field_mod.mc_grid_geometry(cfg)
    ix, iy, iz = np.nonzero(dense > threshold)
    pts = origin[None, :] + spacing * np.stack([ix, iy, iz], axis=1)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    objio.save_point_cloud(path, pts.astype(np.float32))
    return pts.shape[0]


def export_color_field(state: FluidState, cfg: SimConfig, path: str) -> int:
    """Dump liquid positions with the color-gradient surface indicator
    (ParticleData.export_kernel writes 'v x y z r g b ...')."""

    @jax.jit
    def go(pos):
        grid = build_grid(pos, state.n_liquid, cfg)
        rhop = dense_ops.density_stats(grid, cfg, False).rho
        color, grad = dense_ops.color_field(grid, cfg, rhop)
        nl = state.n_liquid
        import jax.numpy as jnp

        return (unpack_liquid(grid, color, jnp.zeros((nl,))),
                unpack_liquid(grid, grad, jnp.zeros((3, nl))))

    color, grad = map(np.asarray, go(state.pos))
    pos = np.asarray(state.pos[:, : state.n_liquid]).T
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        for i in range(pos.shape[0]):
            g = grad[:, i]
            f.write(f"v {pos[i,0]:.6f} {pos[i,1]:.6f} {pos[i,2]:.6f} "
                    f"{g[0]:.6f} {g[1]:.6f} {g[2]:.6f} {color[i]:.6f}\n")
    return pos.shape[0]
