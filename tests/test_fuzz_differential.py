"""Randomized differential fuzzing: dense engine vs gather engine across
random particle clouds, radii, volume scales, and domain shapes.  Catches
layout/masking bugs that a single fixed scene could miss (wrap-around
masking, asymmetric domains, boundary-heavy scenes)."""

import jax.numpy as jnp
import numpy as np
import pytest

from wcsph_tpu import dense_ops, ops
from wcsph_tpu.config import SimConfig
from wcsph_tpu.grid import build_grid, pack_liquid, unpack_liquid
from wcsph_tpu.neighbors import build_neighbors


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_clouds_match(seed):
    rng = np.random.default_rng(seed)
    r = float(rng.uniform(0.015, 0.04))
    h = 4 * r
    # random, ANISOTROPIC domain (different grid dims exercise the linear-
    # offset wrap masking) with clustered particles
    ext = rng.uniform(6, 14, size=3) * h
    n_liquid = int(rng.integers(150, 400))
    n_solid = int(rng.integers(50, 200))
    centers = rng.uniform(0.2, 0.8, size=(4, 3)) * ext
    pts = np.concatenate([
        c + rng.normal(0, 2.5 * r, size=((n_liquid + n_solid) // 4 + 1, 3))
        for c in centers
    ])[: n_liquid + n_solid].astype(np.float32)
    pts = np.clip(pts, 0.5 * h, ext - 0.5 * h)

    cfg = SimConfig(
        particle_radius=r,
        domain_min=(0.0, 0.0, 0.0),
        domain_max=tuple(float(x) for x in ext),
        solid_volume_scale=float(rng.uniform(0.5, 2.0)),
        viscosity=float(rng.uniform(0.5, 20.0)),
        viscosity_b=float(rng.uniform(0.0, 20.0)),
        cell_capacity=48,         # clusters are dense
        max_neighbors=192,
        min_div_neighbors=int(rng.integers(5, 30)),
    )
    pos = jnp.asarray(pts.T)
    grid = build_grid(pos, n_liquid, cfg)
    assert int(grid.overflow) == 0, "raise caps in the test"
    nbr = build_neighbors(pos, n_liquid, cfg)
    assert int(nbr.overflow) == 0
    pairs = ops.precompute_pairs(pos, nbr, n_liquid, cfg)
    vel = jnp.asarray(rng.normal(0, 1.0, (3, n_liquid)).astype(np.float32))
    k = jnp.asarray(rng.normal(0, 1.0, (n_liquid,)).astype(np.float32))
    dt = jnp.float32(rng.uniform(1e-4, 5e-3))

    def unpk(xq, width=None):
        zero = (jnp.zeros((xq.shape[0], n_liquid)) if xq.ndim == 3
                else jnp.zeros((n_liquid,)))
        return np.asarray(unpack_liquid(grid, xq, zero))

    stats = dense_ops.density_stats(grid, cfg, with_alpha=True)
    rho_g = np.asarray(ops.density(pairs, cfg))
    np.testing.assert_allclose(unpk(stats.rho), rho_g, rtol=3e-5)
    np.testing.assert_array_equal(
        unpk(stats.count.astype(jnp.float32)).astype(int),
        np.asarray(nbr.count))
    np.testing.assert_allclose(unpk(stats.alpha),
                               np.asarray(ops.dfsph_alpha(pairs, cfg)),
                               rtol=2e-4, atol=1e-12)

    velp = pack_liquid(grid, vel)
    kp = pack_liquid(grid, k)
    rho = ops.density(pairs, cfg)

    d_g = np.asarray(ops.drho_divergence(pairs, vel, cfg, n_liquid))
    d_d = unpk(dense_ops.drho_divergence(grid, cfg, velp, stats.count))
    np.testing.assert_allclose(d_d, d_g, rtol=1e-3,
                               atol=1e-5 * max(np.abs(d_g).max(), 1.0))

    a_g = np.asarray(ops.advected_density(pairs, vel, rho, dt, cfg, n_liquid))
    a_d = unpk(dense_ops.advected_density(grid, cfg, velp, stats.rho, dt))
    np.testing.assert_allclose(a_d, a_g, rtol=1e-4, atol=1e-5)

    v_g = np.asarray(ops.kappa_velocity_update(pairs, vel, k, k, dt, cfg,
                                               n_liquid))
    v_d = unpk(dense_ops.kappa_velocity_update(grid, cfg, velp, kp, dt))
    np.testing.assert_allclose(v_d, v_g, rtol=1e-3,
                               atol=1e-5 * np.abs(v_g).max())
