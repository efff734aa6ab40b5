"""Anisotropic kernel estimator (Yu & Turk 2013).

Reference: ParticleData.cal_anistropic_kernel (ParticleData.py:220-289):
per liquid particle a weighted mean position x̄ (weight 1 - (d/2h_mc)^3,
weight_func ParticleData.py:291-298), a weighted covariance of the neighbor
positions around x̄, a 3x3 spectral decomposition with clamped singular
values (kr=4, ks=1400, kn=0.5, min 25 neighbors), and
G = R diag(1/(ks σ̃)) Rᵀ used to deform the reconstruction kernel.

TPU design: the covariance accumulation is a packed window sweep (its six
unique components as planar arrays — the covariance is symmetric);
the tiny 3x3 eigendecomposition runs batched via jnp.linalg.eigh (C is
symmetric PSD, so SVD == eigh up to ordering; the reference uses ti.svd).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .. import dense_ops
from ..config import SimConfig
from ..grid import DenseGrid

KR = 4.0
KS = 1400.0
KN = 0.5
MIN_NEIGHBORS = 25
EIG_CHUNK = 65536   # slots per batched-eigh lax.map step (memory bound)


class Anisotropy(NamedTuple):
    pos_avr: jnp.ndarray    # (3, C, NC) packed smoothed centers
    g: Tuple[jnp.ndarray, ...]  # 9 packed (C, NC) arrays, row-major G


def _weight(w, cfg: SimConfig):
    """1 - (d / w_r)^3 inside w_r, else 0 (ParticleData.py:291-298) with
    w_r = 2x the MC search radius ~= 2h.  Documented divergence: pairs are
    drawn from the h window (the reference's loose sim-grid lists reach
    ~5-6r), so the covariance sees slightly fewer far neighbors; the
    singular-value clamps dominate the resulting G either way."""
    w_r = 2.0 * cfg.support_radius
    d = jnp.sqrt(jnp.maximum(w.dist2, 0.0))
    return jnp.where(w.mask & w.liq_j & (d < w_r), 1.0 - (d / w_r) ** 3, 0.0)


def compute(grid: DenseGrid, cfg: SimConfig) -> Anisotropy:
    loop = dense_ops.WindowLoop(grid, cfg)
    cap, nc = grid.pid.shape

    # pass 1: weighted mean position (ParticleData.py:223-242)
    def mean_fn(carry, w, lp):
        sw, sx = carry
        wij = _weight(w, cfg)
        sw = sw + jnp.sum(wij, axis=1)
        xj = w.xn  # (3, C, NC)
        sx = sx + jnp.stack([jnp.sum(wij * xj[c][None], axis=1)
                             for c in range(3)])
        return sw, sx

    sw, sx = loop.scan(mean_fn, (dense_ops._zeros(grid),
                                 dense_ops._zeros(grid, 3)))
    pos_avr = jnp.where((sw > 0.0)[None], sx / jnp.maximum(sw, 1e-12),
                        grid.xp)

    # pass 2: weighted covariance around pos_avr + neighbor count
    def cov_fn(carry, w, lp):
        sw, comps, cnt = carry
        wij = _weight(w, cfg)
        d = [w.xn[c][None] - pos_avr[c][:, None, :] for c in range(3)]
        sw = sw + jnp.sum(wij, axis=1)
        new = []
        for (a, b) in ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)):
            new.append(jnp.sum(wij * d[a] * d[b], axis=1))
        cnt = cnt + jnp.sum(w.mask, axis=1)
        return sw, comps + jnp.stack(new), cnt

    sw2, comps, cnt = loop.scan(
        cov_fn, (dense_ops._zeros(grid), dense_ops._zeros(grid, 6),
                 jnp.zeros((cap, nc), jnp.int32)))

    c_xx, c_xy, c_xz, c_yy, c_yz, c_zz = (
        comps[i] / jnp.maximum(sw2, 1e-12) for i in range(6))

    # spectral clamp (ParticleData.py:246-278); eigh ascending -> reverse.
    # NEVER materialize a (C, NC, 3, 3) tensor: eigh's (..., 2, 2)
    # temporaries tile-pad 64x on TPU (T(2,128) puts the 2-wide dims on
    # 128-lane tiles) — at showcase scale that was 8 x 3.2 GB and OOMed the
    # 16 GB HBM.  The slot axis is flattened and chunked through lax.map,
    # so the tiny-matrix batch is bounded at EIG_CHUNK slots and every
    # full-size array stays planar (CLAUDE.md layout invariant).
    S = cap * nc
    npad = (-S) % EIG_CHUNK
    chunks = tuple(jnp.pad(c.reshape(-1), (0, npad)).reshape(-1, EIG_CHUNK)
                   for c in (c_xx, c_xy, c_xz, c_yy, c_yz, c_zz))

    def chunk_eig(cs):
        xx, xy, xz, yy, yz, zz = cs
        m = jnp.stack([jnp.stack([xx, xy, xz], -1),
                       jnp.stack([xy, yy, yz], -1),
                       jnp.stack([xz, yz, zz], -1)], -2)   # (EIG_CHUNK,3,3)
        eigval, eigvec = jnp.linalg.eigh(m)
        s0 = eigval[..., 2]
        s1 = jnp.maximum(eigval[..., 1], s0 / KR)
        s2 = jnp.maximum(eigval[..., 0], s0 / KR)
        inv = jnp.stack([1.0 / (KS * jnp.maximum(s2, 1e-20)),
                         1.0 / (KS * jnp.maximum(s1, 1e-20)),
                         1.0 / (KS * jnp.maximum(s0, 1e-20))], -1)
        gf = jnp.einsum("...ij,...j,...kj->...ik", eigvec, inv, eigvec)
        return tuple(gf[..., i, j]
                     for i in range(3) for j in range(3)) + (s0,)

    outs = jax.lax.map(chunk_eig, chunks)
    unflat = lambda a: a.reshape(-1)[:S].reshape(cap, nc)
    s0 = unflat(outs[9])

    ok = (cnt > MIN_NEIGHBORS) & (s0 > 0.0) & grid.liquid
    g = tuple(jnp.where(ok, unflat(outs[3 * i + j]),
                        KN if i == j else 0.0)
              for i in range(3) for j in range(3))
    return Anisotropy(pos_avr=pos_avr, g=g)


def smoothed_positions(grid: DenseGrid, an: Anisotropy) -> jnp.ndarray:
    """0.05 x + 0.95 x̄ (MarchingCubeGrid.py:228) — only liquid slots move."""
    mixed = 0.05 * grid.xp + 0.95 * an.pos_avr
    return jnp.where(grid.liquid[None], mixed, grid.xp)
