"""Software rasterizer: z-buffered particle splatting + camera.

Reference Canvas.py: row-major view/projection matrices built in numpy
(Canvas.py:67-100), device-side transform + z-tested pixel fill
(Canvas.py:137-148), Bresenham circles for particles (Canvas.py:150-178).

TPU redesign: the per-particle Bresenham loops become one vectorized
scatter-min.  Each particle splats a fixed disk stencil of pixels; the
z-test over competing writes is a single ``min`` scatter on a combined
(depth-major) key — the idiomatic XLA replacement for the reference's
depth-compare-and-write race (Canvas.py:143-148, benign under Taichi's
atomics, racy otherwise).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class Camera:
    """Look-at camera with yaw/pitch orbit and perspective/ortho projection
    (Canvas.py:38-123)."""

    def __init__(self, width: int = 512, height: int = 512):
        self.width = width
        self.height = height
        self.target = np.zeros(3, np.float32)
        self.yaw = 0.0
        self.pitch = 0.0
        self.scale = 3.0
        self.fov = 1.0
        self.near = 1.0
        self.far = 1000.0
        self.ortho = False

    # camera animators (Canvas.py:38-64)
    def static_cam(self, tx, ty, tz):
        self.fov, self.ortho = 2.0, True
        self.target[:] = (tx, ty, tz)

    def yaw_cam(self, tx, ty, tz, d_yaw: float = 0.003, limit: float = 3.14):
        self.fov, self.ortho = 1.0, False
        self.target[:] = (tx, ty, tz)
        if self.yaw < limit:
            self.yaw += d_yaw

    def pitch_cam(self, tx, ty, tz, d_pitch: float = 0.003, limit: float = 0.5):
        self.fov, self.ortho = 1.0, False
        self.target[:] = (tx, ty, tz)
        if self.pitch < limit:
            self.pitch += d_pitch

    def matrices(self) -> Tuple[np.ndarray, np.ndarray]:
        """(view, proj) 4x4 row-major (Canvas.py:67-100)."""
        pitch = np.clip(self.pitch, -1.57, 1.57)
        eye = self.target + self.scale * np.array([
            math.cos(pitch) * math.sin(self.yaw),
            math.sin(pitch),
            math.cos(pitch) * math.cos(self.yaw),
        ])
        up = np.array([
            -math.sin(pitch) * math.sin(self.yaw),
            math.cos(pitch),
            -math.sin(pitch) * math.cos(self.yaw),
        ])
        z = eye - self.target
        z = z / np.linalg.norm(z)
        x = np.cross(up, z)
        x = x / np.linalg.norm(x)
        y = np.cross(z, x)
        view = np.array([
            [*x, -x @ eye],
            [*y, -y @ eye],
            [*z, -z @ eye],
            [0.0, 0.0, 0.0, 1.0],
        ], np.float32)
        y_scale = 1.0 / math.tan(self.fov / 2.0)
        x_scale = y_scale / (self.width / self.height)
        n, f = self.near, self.far
        if self.ortho:
            proj = np.array([
                [x_scale, 0, 0, 0],
                [0, y_scale, 0, 0],
                [0, 0, 1.0 / (n - f), n / (n - f)],
                [0, 0, 0, 1.0],
            ], np.float32)
        else:
            proj = np.array([
                [x_scale, 0, 0, 0],
                [0, y_scale, 0, 0],
                [0, 0, f / (n - f), n * f / (n - f)],
                [0, 0, -1.0, 0],
            ], np.float32)
        return view, proj


def _disk_stencil(radius_px: int) -> np.ndarray:
    r = radius_px
    ij = [(i, j) for i in range(-r, r + 1) for j in range(-r, r + 1)
          if i * i + j * j <= r * r]
    return np.asarray(ij, np.int32)


@partial(jax.jit, static_argnums=(4, 5, 6, 7))
def _rasterize(points, colors, radii, pv, width: int, height: int,
               radius_px: int, background: float):
    """Jitted rasterizer body (module-level: the GUI loop calls it every
    frame, so it must hit the jit cache — a per-call closure would retrace
    and recompile each frame, ~0.5 s on the remote-TPU platform)."""
    stencil = jnp.asarray(_disk_stencil(radius_px))     # (S, 2)
    stencil_r2 = stencil[:, 0] ** 2 + stencil[:, 1] ** 2
    n = points.shape[1]
    hom = jnp.concatenate([points, jnp.ones((1, n), jnp.float32)])
    clip = pv @ hom                                  # (4, N)
    ndc = clip[:3] / clip[3]
    sx = (ndc[0] + 1.0) * 0.5 * width
    sy = (ndc[1] + 1.0) * 0.5 * height
    z = ndc[2]

    px = jnp.round(sx).astype(jnp.int32)[None, :] + stencil[:, 0:1]
    py = jnp.round(sy).astype(jnp.int32)[None, :] + stencil[:, 1:2]
    inside = ((px >= 0) & (px < width) & (py >= 0) & (py < height)
              & ((z >= 0.0) & (z <= 1.0))[None, :]
              & (stencil_r2[:, None] <= radii[None, :] ** 2))

    # flat pixel index; out-of-frame -> dropped by mode="drop"
    flat = jnp.where(inside, py * width + px, width * height)
    zq = jnp.clip(z, 0.0, 1.0)
    zbits = (zq * 4.19e6).astype(jnp.uint32) << 8    # depth-major key
    img = jnp.full((height * width, 3), jnp.uint32(0xFFFFFFFF))
    cb = jnp.clip(colors * 255.0, 0, 255).astype(jnp.uint32)  # (3, N)
    for c in range(3):
        key = (zbits | (255 - cb[c]))[None, :]
        key = jnp.broadcast_to(key, flat.shape)
        img = img.at[flat.reshape(-1), c].min(key.reshape(-1), mode="drop")
    color = (255 - (img & 0xFF)).astype(jnp.float32) / 255.0
    hit = img != jnp.uint32(0xFFFFFFFF)
    out = jnp.where(hit, color, background)
    return out.reshape(height, width, 3)


def render_points(points: jnp.ndarray, colors: jnp.ndarray, view: np.ndarray,
                  proj: np.ndarray, width: int, height: int,
                  radius_px: int = 3, background: float = 0.0,
                  radii: jnp.ndarray | None = None) -> jnp.ndarray:
    """Rasterize planar (3, N) points into an (H, W, 3) float image.

    Each point splats a disk of ``radius_px`` (or its per-point ``radii``
    entry, capped at radius_px); hidden-surface removal via a scatter-min on
    a packed (depth, color) key per channel.  The reference draws liquid as
    3 px Bresenham circles and boundary as single pixels (sesph.py:201-207).
    """
    pv = jnp.asarray(np.asarray(proj @ view, np.float32))
    if radii is None:
        radii = jnp.full((points.shape[1],), radius_px, jnp.int32)
    return _rasterize(points, colors, radii, pv, width, height, radius_px,
                      float(background))


class Canvas:
    """Camera + frame export, mirroring the reference Canvas API."""

    def __init__(self, width: int = 512, height: int = 512, fps: float = 30.0):
        self.camera = Camera(width, height)
        self.fps = fps
        self.frame = 0

    def render(self, pos: jnp.ndarray, n_liquid: int,
               liquid_color: Sequence[float] = (1.0, 1.0, 1.0),
               solid_color: Sequence[float] = (0.3, 0.3, 0.3),
               radius_px: int = 3) -> np.ndarray:
        n = pos.shape[1]
        # colors/radii are static per (scene, colors): keep them ON DEVICE
        # across frames — re-uploading per frame costs a host->device round
        # trip each on the remote-TPU platform (GUI-rate killer)
        key = (n, n_liquid, tuple(liquid_color), tuple(solid_color),
               radius_px)
        if getattr(self, "_attr_key", None) != key:
            colors = np.zeros((3, n), np.float32)
            colors[:, :n_liquid] = np.asarray(liquid_color,
                                              np.float32)[:, None]
            colors[:, n_liquid:] = np.asarray(solid_color,
                                              np.float32)[:, None]
            # boundary as single pixels, liquid as discs (sesph.py:201-207)
            radii = np.full((n,), 1, np.int32)
            radii[:n_liquid] = radius_px
            self._colors = jnp.asarray(colors)
            self._radii = jnp.asarray(radii)
            self._attr_key = key
        view, proj = self.camera.matrices()
        img = render_points(pos, self._colors, view, proj,
                            self.camera.width, self.camera.height, radius_px,
                            radii=self._radii)
        return np.asarray(img)

    def export_png(self, img: np.ndarray, time: float,
                   prefix: str = "out/frame_") -> Optional[str]:
        """fps-gated PNG export (Canvas.py:125-135)."""
        if int(time * self.fps) != self.frame:
            return None
        import os

        from PIL import Image

        os.makedirs(os.path.dirname(prefix) or ".", exist_ok=True)
        path = f"{prefix}{self.frame}.png"
        Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(path)
        self.frame += 1
        return path
