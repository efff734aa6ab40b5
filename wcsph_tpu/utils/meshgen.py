"""Procedural triangle-mesh generators for non-box scenes.

The reference ships pre-sampled mesh assets (`model/*.obj`: sphere, rock,
taichi-logo shells consumed at dfsph.py:80 / iisph.py:110).  Those binaries
are not copied; instead these generators produce equivalent watertight test
geometry from first principles, which `sampling.poisson_disk_sample` turns
into boundary shells (the reference's boundry.py pipeline).
"""

from __future__ import annotations

import numpy as np


def icosphere(subdivisions: int = 3, radius: float = 1.0,
              center=(0.0, 0.0, 0.0)) -> tuple[np.ndarray, np.ndarray]:
    """Subdivided icosahedron: (verts (V,3) f32, faces (F,3) i32).

    Standard construction: 12-vertex icosahedron, each subdivision splits a
    triangle into 4 via edge midpoints projected back onto the sphere.
    """
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1],
    ], dtype=np.float64)
    verts /= np.linalg.norm(verts[0])
    faces = np.array([
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1],
    ], dtype=np.int64)

    for _ in range(subdivisions):
        vlist = list(verts)
        midpoint_cache: dict[tuple[int, int], int] = {}

        def midpoint(a: int, b: int) -> int:
            key = (a, b) if a < b else (b, a)
            idx = midpoint_cache.get(key)
            if idx is None:
                m = vlist[a] + vlist[b]
                m /= np.linalg.norm(m)
                idx = len(vlist)
                vlist.append(m)
                midpoint_cache[key] = idx
            return idx

        new_faces = []
        for a, b, c in faces:
            ab, bc, ca = midpoint(a, b), midpoint(b, c), midpoint(c, a)
            new_faces += [[a, ab, ca], [b, bc, ab], [c, ca, bc],
                          [ab, bc, ca]]
        verts = np.asarray(vlist)
        faces = np.asarray(new_faces, dtype=np.int64)

    verts = verts * radius + np.asarray(center, np.float64)
    return verts.astype(np.float32), faces.astype(np.int32)


def open_tank(size=(1.0, 0.6, 1.0), center=(0.0, 0.0, 0.0),
              lid: bool = False) -> tuple[np.ndarray, np.ndarray]:
    """Rectangular tank mesh (floor + 4 walls, optionally a lid).

    Non-convex-free replacement for the reference's box_boundry.obj shell:
    two triangles per face, outward orientation irrelevant to the sampler.
    """
    sx, sy, sz = (s / 2.0 for s in size)
    cx, cy, cz = center
    corners = np.array([
        [cx - sx, cy - sy, cz - sz], [cx + sx, cy - sy, cz - sz],
        [cx + sx, cy - sy, cz + sz], [cx - sx, cy - sy, cz + sz],
        [cx - sx, cy + sy, cz - sz], [cx + sx, cy + sy, cz - sz],
        [cx + sx, cy + sy, cz + sz], [cx - sx, cy + sy, cz + sz],
    ], dtype=np.float32)
    quads = [
        (0, 1, 2, 3),               # floor
        (0, 1, 5, 4), (1, 2, 6, 5), (2, 3, 7, 6), (3, 0, 4, 7),   # walls
    ]
    if lid:
        quads.append((4, 5, 6, 7))
    faces = []
    for a, b, c, d in quads:
        faces += [[a, b, c], [a, c, d]]
    return corners, np.asarray(faces, np.int32)
