"""Marching cubes: dense scalar field -> triangle mesh.

Classic 256-case marching cubes with linear edge interpolation
(MarchingCubeGrid.py:252-328) over the programmatically derived case table
(tables.py).  The cube-classification and edge-interpolation phase is
vectorized numpy on the host — surface extraction runs at export rate
(20 fps in the reference, MarchingCubeGrid.py:14), not at sim rate, and its
output feeds a host-side OBJ writer anyway.  The hot part (the scalar field)
runs on-device in field.py.

Sign convention matches the reference: corner bit set when value < isolevel
(MarchingCubeGrid.py:272-287), surface at isolevel 0.5.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from .tables import CENTROID_TABLE, CORNERS, EDGES, TRI_TABLE

MAX_VERTEX = 3_000_000   # triangle-vertex budget (MarchingCubeGrid.py:8)


def marching_cubes(field: np.ndarray, origin, spacing: float,
                   isolevel: float = 0.5,
                   max_vertices: int = MAX_VERTEX) -> Tuple[np.ndarray, np.ndarray]:
    """Extract the isosurface of a dense (X, Y, Z) field.

    Returns (vertices (V, 3) float32, triangles (T, 3) int32).  Triangles
    beyond ``max_vertices`` total vertices are dropped (with the reference's
    "exceed max tri" contract, MarchingCubeGrid.py:327).
    """
    f = np.asarray(field)
    origin = np.asarray(origin, np.float32)
    nx, ny, nz = f.shape

    # corner values per cube, shape (8, nx-1, ny-1, nz-1)
    def corner(vx, vy, vz):
        return f[vx: nx - 1 + vx, vy: ny - 1 + vy, vz: nz - 1 + vz]

    cv = np.stack([corner(*c) for c in CORNERS])
    config = np.zeros(cv.shape[1:], np.int32)
    for v in range(8):
        config |= (cv[v] < isolevel).astype(np.int32) << v

    active = np.nonzero((config != 0) & (config != 255))
    if active[0].size == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    cfg_a = config[active]                      # (A,)
    cv_a = cv[:, active[0], active[1], active[2]]   # (8, A)
    base = np.stack(active, axis=1).astype(np.float32)  # (A, 3) cube coords

    # interpolated vertex on each of the 12 edges, (A, 12, 3)
    verts12 = np.empty((cfg_a.shape[0], 12, 3), np.float32)
    for e, (a, b) in enumerate(EDGES):
        va, vb = cv_a[a], cv_a[b]
        denom = vb - va
        t = np.where(np.abs(denom) > 1e-5, (isolevel - va) / np.where(
            np.abs(denom) > 1e-5, denom, 1.0), 0.0)
        t = np.clip(t, 0.0, 1.0)
        pa = base + CORNERS[a]
        pb = base + CORNERS[b]
        verts12[:, e, :] = pa + t[:, None] * (pb - pa)

    # cycle centroids (vertex ids 12..15): averaging weights over the 12
    # edge vertices per config
    cent = np.einsum("ake,aed->akd", CENTROID_TABLE[cfg_a], verts12)
    verts16 = np.concatenate([verts12, cent], axis=1)         # (A, 16, 3)

    rows = TRI_TABLE[cfg_a]                     # (A, W)
    tri_ids = rows[:, :-1].reshape(cfg_a.shape[0], -1, 3)     # (A, T, 3)
    valid = tri_ids[:, :, 0] >= 0
    a_idx, t_idx = np.nonzero(valid)
    n_tris = a_idx.size
    budget = max_vertices // 3
    if n_tris > budget:
        a_idx, t_idx = a_idx[:budget], t_idx[:budget]
        n_tris = budget
    e3 = tri_ids[a_idx, t_idx]                  # (T, 3) vertex ids (0..15)
    tri_verts = verts16[a_idx[:, None], e3]     # (T, 3, 3)
    vertices = (origin + spacing * tri_verts.reshape(-1, 3)).astype(np.float32)
    triangles = np.arange(n_tris * 3, dtype=np.int32).reshape(-1, 3)
    return vertices, triangles


def weld_vertices(vertices: np.ndarray, triangles: np.ndarray,
                  tol: float = 1e-6) -> Tuple[np.ndarray, np.ndarray]:
    """Merge duplicate vertices (shared cube edges) into an indexed mesh."""
    key = np.round(vertices / tol).astype(np.int64)
    _, first, inverse = np.unique(key, axis=0, return_index=True,
                                  return_inverse=True)
    return vertices[first], inverse[triangles].astype(np.int32)
