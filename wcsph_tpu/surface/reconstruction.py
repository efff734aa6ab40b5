"""High-level surface reconstruction (reference MCGrid.export_surface,
MarchingCubeGrid.py:139-156): density field -> marching cubes -> OBJ."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np

from .. import dense_ops
from ..config import SimConfig
from ..grid import build_grid
from ..state import FluidState
from ..utils import objio
from . import aniso as aniso_mod
from . import field as field_mod
from . import mc as mc_mod


def reconstruct(state: FluidState, cfg: SimConfig, isolevel: float = 0.5,
                anisotropic: bool = False,
                max_vertices: int = mc_mod.MAX_VERTEX,
                on_device: bool = False
                ) -> Tuple[np.ndarray, np.ndarray]:
    """Extract the fluid surface mesh: (vertices (V,3), triangles (T,3)).

    With ``on_device=True`` the ENTIRE pipeline — density field, cube
    classification, edge interpolation, triangle emission — runs as one
    jitted TPU program (mc.marching_cubes_device); only the fixed-size
    vertex buffer crosses to the host.  Default is the host extractor
    (identical output ordering; export-rate tool)."""
    origin, spacing = field_mod.mc_grid_geometry(cfg)

    def device_field(pos):
        grid = build_grid(pos, state.n_liquid, cfg)
        rhop = dense_ops.density_stats(grid, cfg, with_alpha=False).rho
        if anisotropic:
            an = aniso_mod.compute(grid, cfg)
            xs = aniso_mod.smoothed_positions(grid, an)
            phi = field_mod.mc_field_packed(grid, cfg, rhop,
                                            pos_smooth=xs, g_packed=an.g)
        else:
            phi = field_mod.mc_field_packed(grid, cfg, rhop)
        return field_mod.field_to_dense(phi, cfg)

    if on_device:
        @jax.jit
        def device_mesh(pos):
            dense = device_field(pos)
            return mc_mod.marching_cubes_device(dense, origin, spacing,
                                                isolevel,
                                                max_vertices=max_vertices)

        verts, n_tris, _ = device_mesh(state.pos)
        n = int(np.asarray(n_tris))
        vertices = np.asarray(verts[: 3 * n])
        return vertices, np.arange(3 * n, dtype=np.int32).reshape(-1, 3)

    dense = np.asarray(jax.jit(device_field)(state.pos))
    return mc_mod.marching_cubes(dense, origin, spacing, isolevel,
                                 max_vertices)


class SurfaceExporter:
    """fps-gated mesh export (MCGrid.export_surface / frame counter,
    MarchingCubeGrid.py:12-14, 139-156)."""

    def __init__(self, cfg: SimConfig, out_dir: str = "out", fps: float = 20.0,
                 anisotropic: bool = False):
        self.cfg = cfg
        self.out_dir = out_dir
        self.fps = fps
        self.frame = 0
        self.anisotropic = anisotropic

    def maybe_export(self, state: FluidState) -> Optional[str]:
        if int(float(state.time) * self.fps) != self.frame:
            return None
        import os

        os.makedirs(self.out_dir, exist_ok=True)
        verts, tris = reconstruct(state, self.cfg,
                                  anisotropic=self.anisotropic)
        path = f"{self.out_dir}/mc_{self.frame}.obj"
        objio.save_obj(path, verts, tris)
        self.frame += 1
        return path
