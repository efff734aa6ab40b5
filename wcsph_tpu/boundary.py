"""Boundary-particle effective volume (Akinci et al. 2012).

The reference hard-codes the boundary volume VS0 as a CONSTANT multiple of
the liquid volume — and uses DIFFERENT constants depending on how dense the
boundary shell it loads happens to be: 1.0 for solvers fed the Poisson-
sampled ~r-spaced shells (iisph.py:36, dfsph VS0=VL0) and 2.0 for the
procedurally built 2r-pitch box (sesph).  Both are crude constants for the
same underlying quantity: a boundary particle's effective volume is the
volume it exclusively covers, V_b = gamma / sum_k W(x_b - x_bk) over its
SOLID neighbors (Akinci 2012 eq. 4-5).  A constant that is right for one
shell density silently under-weights a sparser one — measured here as
liquid draining straight through the 2r procedural box under DFSPH/IISPH
(their reference constants assume the dense shell) while SESPH/PCISPH
(constant 2.0) held the same wall.

This module computes the Akinci volume ONCE at scene setup and collapses it
to the scalar `solid_volume_scale` the sweep kernels consume (per-slot
volume arrays would touch every fused Mosaic kernel; the scalar captures a
uniformly sampled shell — the median over solids — at zero runtime cost).
Enabled by `SimConfig.solid_volume_auto` (resolved in Simulation.__init__);
the per-solver constants remain as documented fallbacks/overrides.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import dense_ops
from .config import SimConfig
from .grid import build_grid


def akinci_solid_volume_scale(pos_solid: jnp.ndarray,
                              cfg: SimConfig) -> float:
    """Median Akinci volume of the boundary shell, as a multiple of the
    liquid rest volume: scale = median_b [1 / sum_k W(x_b - x_bk)] / V_L0.

    ``pos_solid``: planar (3, Ns) solid positions.  The W-sum runs over
    SOLID neighbors only (self included, as in Akinci eq. 5) on the same
    cell-dense window machinery as the solvers.  Clamped to [0.75, 3.0]:
    the lower edge is a dense double-layer shell, the upper a very sparse
    single layer (beyond it the shell has kernel-sized holes no volume
    correction can fix)."""
    ns = pos_solid.shape[1]
    if ns == 0:
        return float(cfg.solid_volume_scale) or 1.0

    @jax.jit
    def wsums(pos):
        grid = build_grid(pos, 0, cfg)          # n_liquid=0: all slots solid
        loop = dense_ops.WindowLoop(grid, cfg)

        def fn(acc, w, lp):
            return acc + jnp.sum(dense_ops._masked_w(w, cfg), axis=1)

        acc = loop.scan(fn, dense_ops._zeros(grid))
        return jnp.where(grid.valid, acc, jnp.nan)

    s = np.asarray(wsums(pos_solid)).ravel()
    s = s[np.isfinite(s) & (s > 0.0)]
    if s.size == 0:
        return float(cfg.solid_volume_scale) or 1.0
    v_b = 1.0 / np.median(s)
    scale = float(v_b / cfg.liquid_volume)
    return float(np.clip(scale, 0.75, 3.0))
