"""Differential tests: the cell-dense engine (dense_ops, the hot path) must
match the gather-based reference implementation (ops.py) op-for-op.  This is
the rebuild's analogue of the reference's only CPU-vs-GPU consistency check
(boundry.py detect_hmap)."""

import jax.numpy as jnp
import numpy as np
import pytest

from wcsph_tpu import dense_ops, ops, scene, viscosity
from wcsph_tpu.config import SimConfig
from wcsph_tpu.grid import build_grid, pack_liquid, unpack_liquid
from wcsph_tpu.neighbors import build_neighbors

R = 0.025


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(3)
    b = scene.SceneBuilder()
    b.add_liquid_block((7, 7, 7), 2 * R, (-7 * R, -3 * R, -7 * R))
    b.add_box_shell(0.6, 2 * R)
    sc = b.build()
    # jitter the lattice so distances/denominators are generic
    sc.positions[: sc.n_liquid] += rng.uniform(
        -0.2 * R, 0.2 * R, (sc.n_liquid, 3)).astype(np.float32)
    lo, hi = sc.domain(pad=4 * R)
    cfg = SimConfig(particle_radius=R, domain_min=lo, domain_max=hi,
                    viscosity=10.0, viscosity_b=10.0,
                    tension_coff=1.0, tension_coff_b=1.0,
                    adhesion_radius=0.4)
    nl = sc.n_liquid
    pos = jnp.asarray(sc.positions.T)
    grid = build_grid(pos, nl, cfg)
    nbr = build_neighbors(pos, nl, cfg)
    pairs = ops.precompute_pairs(pos, nbr, nl, cfg)
    rng2 = np.random.default_rng(7)
    vel = jnp.asarray(rng2.normal(0, 0.5, (3, nl)).astype(np.float32))
    omega = jnp.asarray(rng2.normal(0, 0.2, (3, nl)).astype(np.float32))
    return cfg, nl, pos, grid, nbr, pairs, vel, omega


def unpk(grid, xq, nl):
    zero = jnp.zeros((xq.shape[0], nl)) if xq.ndim == 3 else jnp.zeros((nl,))
    return np.asarray(unpack_liquid(grid, xq, zero))


def test_density_count_match(setup):
    cfg, nl, pos, grid, nbr, pairs, vel, omega = setup
    rho_g = np.asarray(ops.density(pairs, cfg))
    stats = dense_ops.density_stats(grid, cfg, with_alpha=True)
    rho_d = unpk(grid, stats.rho, nl)
    np.testing.assert_allclose(rho_d, rho_g, rtol=2e-5)
    cnt_d = unpk(grid, stats.count.astype(jnp.float32), nl)
    np.testing.assert_array_equal(cnt_d.astype(int), np.asarray(nbr.count))


def test_alpha_match(setup):
    cfg, nl, pos, grid, nbr, pairs, vel, omega = setup
    a_g = np.asarray(ops.dfsph_alpha(pairs, cfg))
    a_d = unpk(grid, dense_ops.density_stats(grid, cfg, True).alpha, nl)
    np.testing.assert_allclose(a_d, a_g, rtol=1e-4)


def test_drho_and_adv_density_match(setup):
    cfg, nl, pos, grid, nbr, pairs, vel, omega = setup
    rho = ops.density(pairs, cfg)
    rhop = pack_liquid(grid, rho)  # liquid-only pack: solids get 0 -> use dense rho
    stats = dense_ops.density_stats(grid, cfg, False)
    velp = pack_liquid(grid, vel)
    dt = jnp.float32(1e-3)

    d_g = np.asarray(ops.drho_divergence(pairs, vel, cfg, nl))
    d_d = unpk(grid, dense_ops.drho_divergence(grid, cfg, velp,
                                               stats.count), nl)
    np.testing.assert_allclose(d_d, d_g, rtol=1e-4, atol=1e-5)

    a_g = np.asarray(ops.advected_density(pairs, vel, rho, dt, cfg, nl))
    a_d = unpk(grid, dense_ops.advected_density(grid, cfg, velp, stats.rho, dt), nl)
    np.testing.assert_allclose(a_d, a_g, rtol=1e-4, atol=1e-5)


def test_kappa_velocity_update_match(setup):
    cfg, nl, pos, grid, nbr, pairs, vel, omega = setup
    rng = np.random.default_rng(11)
    k = jnp.asarray(rng.normal(0, 1.0, (nl,)).astype(np.float32))
    dt = jnp.float32(1e-3)
    v_g = np.asarray(ops.kappa_velocity_update(pairs, vel, k, k, dt, cfg, nl))
    velp = pack_liquid(grid, vel)
    kp = pack_liquid(grid, k)
    v_d = unpk(grid, dense_ops.kappa_velocity_update(grid, cfg, velp, kp, dt), nl)
    np.testing.assert_allclose(v_d, v_g, rtol=1e-4, atol=1e-6)


def test_explicit_forces_match(setup):
    cfg, nl, pos, grid, nbr, pairs, vel, omega = setup
    rho_g = ops.density(pairs, cfg)
    rho_c, p = ops.tait_pressure(rho_g, cfg)
    acc_g = np.asarray(ops.pressure_accel_symmetric(pairs, rho_c, p, cfg, nl)
                       + ops.explicit_viscosity_accel(pairs, vel, rho_c, cfg, nl))
    stats = dense_ops.density_stats(grid, cfg, False)
    rho_cp, pp = ops.tait_pressure(stats.rho, cfg)
    velp = pack_liquid(grid, vel)
    acc_d = unpk(grid, dense_ops.pressure_accel_symmetric(grid, cfg, rho_cp, pp)
                 + dense_ops.explicit_viscosity_accel(grid, cfg, velp, rho_cp), nl)
    scale = np.abs(acc_g).max()
    np.testing.assert_allclose(acc_d, acc_g, rtol=1e-4, atol=1e-5 * scale)


def test_viscosity_solve_match(setup):
    cfg, nl, pos, grid, nbr, pairs, vel, omega = setup
    rho = ops.density(pairs, cfg)
    dt = jnp.float32(1e-3)
    guess = jnp.zeros_like(vel)
    sol_g = viscosity.solve(pairs, vel, guess, rho, dt, cfg, nl)
    stats = dense_ops.density_stats(grid, cfg, False)
    velp = pack_liquid(grid, vel)
    from wcsph_tpu.parallel.comm import NoComm

    sol_d = viscosity.solve_dense(NoComm(grid, cfg), velp,
                                  jnp.zeros_like(velp), stats.rho, dt)
    v_g = np.asarray(sol_g.vel_new)
    v_d = unpk(grid, sol_d.vel_new, nl)
    assert int(sol_d.iters) >= 1
    scale = np.abs(v_g).max()
    np.testing.assert_allclose(v_d, v_g, rtol=5e-3, atol=1e-3 * scale)


def test_tension_and_vorticity_match(setup):
    cfg, nl, pos, grid, nbr, pairs, vel, omega = setup
    rho = ops.density(pairs, cfg)
    n_g = ops.surface_normals(pairs, rho, cfg, nl)
    t_g = np.asarray(ops.tension_accel(pairs, rho, n_g, pos, cfg, nl))
    stats = dense_ops.density_stats(grid, cfg, False)
    n_d = dense_ops.surface_normals(grid, cfg, stats.rho)
    np.testing.assert_allclose(unpk(grid, n_d, nl), np.asarray(n_g),
                               rtol=1e-4, atol=1e-5 * np.abs(np.asarray(n_g)).max())
    t_d = unpk(grid, dense_ops.tension_accel(grid, cfg, stats.rho, n_d), nl)
    np.testing.assert_allclose(t_d, t_g, rtol=1e-3, atol=1e-4 * np.abs(t_g).max())

    dt = jnp.float32(1e-3)
    dv_g, om_g = ops.vorticity_accel(pairs, vel, omega, rho, dt, cfg, nl)
    velp = pack_liquid(grid, vel)
    omp = pack_liquid(grid, omega)
    dv_d, om_d = dense_ops.vorticity(grid, cfg, velp, omp, stats.rho, dt)
    np.testing.assert_allclose(unpk(grid, dv_d, nl), np.asarray(dv_g),
                               rtol=1e-3, atol=1e-4 * np.abs(np.asarray(dv_g)).max())
    np.testing.assert_allclose(unpk(grid, om_d, nl), np.asarray(om_g),
                               rtol=1e-3, atol=1e-4 * np.abs(np.asarray(om_g)).max())
