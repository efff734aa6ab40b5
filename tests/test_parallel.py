"""Multi-chip tests on the 8-virtual-device CPU mesh: shard_map halo-exchange
slab decomposition vs single-device results, and the jit-sharded full step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wcsph_tpu import dense_ops, scene
from wcsph_tpu.grid import build_grid
from wcsph_tpu.parallel import halo, sharding
from wcsph_tpu.simulation import default_config
from wcsph_tpu.solvers import dfsph
from wcsph_tpu.state import init_state

R = 0.025


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8
    return sharding.make_mesh(8)


def _scene_cfg():
    sc = scene.dam_break(particle_radius=R, fluid_dims=(6, 6, 6), box_extent=0.7)
    lo, hi = sc.domain(pad=4 * R)
    cfg = default_config("dfsph", particle_radius=R, domain_min=lo, domain_max=hi)
    return sc, cfg


def test_halo_density_matches_single_device(mesh8):
    sc, cfg = _scene_cfg()
    cfg = halo.slab_config(cfg, 8)
    assert cfg.grid_res[0] % 8 == 0
    pos = jnp.asarray(sc.positions.T)
    grid = build_grid(pos, sc.n_liquid, cfg)

    rho_single = np.asarray(dense_ops.density_stats(grid, cfg, False).rho)
    mesh = halo.Mesh(np.asarray(jax.devices()[:8]), (halo.AXIS,))
    rho_sharded = np.asarray(halo.density_sharded(grid, cfg, mesh))
    valid = np.asarray(grid.valid)
    np.testing.assert_allclose(rho_sharded[valid], rho_single[valid], rtol=1e-5)


def test_halo_collectives_present(mesh8):
    """The sharded program must actually communicate (ppermute over ICI)."""
    sc, cfg = _scene_cfg()
    cfg = halo.slab_config(cfg, 8)
    pos = jnp.asarray(sc.positions.T)
    grid = build_grid(pos, sc.n_liquid, cfg)
    mesh = halo.Mesh(np.asarray(jax.devices()[:8]), (halo.AXIS,))
    txt = jax.jit(lambda g: halo.density_sharded(g, cfg, mesh)).lower(grid) \
        .compile().as_text()
    assert "collective-permute" in txt


def test_sharded_full_step_runs(mesh8):
    sc, cfg = _scene_cfg()
    assert sc.n_liquid % 8 == 0      # 6^3 fluid block
    sc = scene.pad_to_multiple(sc, 8)
    state = init_state(sc, cfg)
    state = sharding.shard_state(state, mesh8)
    step = sharding.make_sharded_step(dfsph.step, cfg, mesh8, state)
    out = step(state)
    jax.block_until_ready(out.pos)
    assert float(out.time) > 0
    assert np.isfinite(np.asarray(out.pos)).all()
    # iterate a few steps: stays finite and contained
    for _ in range(3):
        out = step(out)
    assert np.isfinite(np.asarray(out.pos)).all()


def test_halo_pressure_solve_matches_single_device(mesh8):
    """Full distributed solver loop: per-iteration halo exchange + psum error
    must reproduce the single-device DFSPH pressure solve."""
    from wcsph_tpu.grid import pack_liquid

    sc, cfg = _scene_cfg()
    cfg = halo.slab_config(cfg, 8)
    pos = jnp.asarray(sc.positions.T)
    nl = sc.n_liquid
    grid = build_grid(pos, nl, cfg)
    stats = dense_ops.density_stats(grid, cfg, True)

    rng = np.random.default_rng(2)
    vel = jnp.asarray(rng.normal(0, 0.3, (3, nl)).astype(np.float32))
    velp = pack_liquid(grid, vel)
    kp = pack_liquid(grid, jnp.zeros((nl,)))
    dt = jnp.float32(1e-3)

    from wcsph_tpu.parallel.comm import NoComm

    single = dfsph.pressure_solve(NoComm(grid, cfg), velp, kp, stats.alpha,
                                  stats.rho, dt)
    mesh = halo.Mesh(np.asarray(jax.devices()[:8]), (halo.AXIS,))
    v_sh, k_sh, iters, err = halo.pressure_solve_sharded(
        grid, cfg, velp, kp, stats.alpha, stats.rho, dt, mesh)

    assert int(iters) == int(single.iters)
    liq = np.asarray(grid.liquid)
    np.testing.assert_allclose(np.asarray(v_sh)[:, liq],
                               np.asarray(single.vel)[:, liq],
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(k_sh)[liq],
                               np.asarray(single.kappa)[liq],
                               rtol=2e-4, atol=1e-7)
    assert abs(float(err) - float(single.err)) < 1e-5


def test_full_dfsph_step_sharded_matches_single(mesh8):
    """The COMPLETE DFSPH step under slab decomposition must reproduce the
    single-device step (same trajectories, iteration counts, dt)."""
    from wcsph_tpu.state import init_state

    sc, cfg = _scene_cfg()
    cfg = halo.slab_config(cfg, 8)
    state = init_state(sc, cfg)
    mesh = halo.Mesh(np.asarray(jax.devices()[:8]), (halo.AXIS,))

    s_single = state
    s_shard = state
    for _ in range(3):
        s_single = jax.jit(lambda s: dfsph.step(s, cfg))(s_single)
        s_shard = jax.jit(
            lambda s: halo.dfsph_step_sharded(s, cfg, mesh))(s_shard)
    np.testing.assert_allclose(np.asarray(s_shard.pos),
                               np.asarray(s_single.pos), rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_shard.vel),
                               np.asarray(s_single.vel), rtol=2e-3, atol=1e-5)
    assert abs(float(s_shard.dt) - float(s_single.dt)) < 1e-7
    assert int(s_shard.diag.pressure_iters) == int(s_single.diag.pressure_iters)
    assert int(s_shard.diag.divergence_iters) == int(s_single.diag.divergence_iters)


def test_iisph_step_sharded_matches_single(mesh8):
    """Sharded IISPH (viscosity PCG + Jacobi loop under slabs) == single."""
    from wcsph_tpu.simulation import default_config as dc
    from wcsph_tpu.solvers import iisph
    from wcsph_tpu.state import init_state

    sc = scene.dam_break(particle_radius=R, fluid_dims=(6, 6, 6),
                         box_extent=0.7)
    lo, hi = sc.domain(pad=4 * R)
    cfg = halo.slab_config(dc("iisph", particle_radius=R, domain_min=lo,
                              domain_max=hi), 8)
    state = init_state(sc, cfg)
    mesh = halo.Mesh(np.asarray(jax.devices()[:8]), (halo.AXIS,))
    s1, s2 = state, state
    for _ in range(3):
        s1 = jax.jit(lambda s: iisph.step(s, cfg))(s1)
        s2 = jax.jit(lambda s: halo.iisph_step_sharded(s, cfg, mesh))(s2)
    assert int(s2.diag.pressure_iters) == int(s1.diag.pressure_iters)
    np.testing.assert_allclose(np.asarray(s2.pos), np.asarray(s1.pos),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s2.pressure),
                               np.asarray(s1.pressure), rtol=2e-3, atol=1e-2)


def test_pcisph_step_sharded_matches_single(mesh8):
    """Sharded PCISPH (prediction loop under slabs) == single."""
    from wcsph_tpu.simulation import default_config as dc
    from wcsph_tpu.solvers import pcisph
    from wcsph_tpu.state import init_state

    sc = scene.dam_break(particle_radius=R, fluid_dims=(6, 6, 6),
                         box_extent=0.7)
    lo, hi = sc.domain(pad=4 * R)
    cfg = halo.slab_config(dc("pcisph", particle_radius=R, domain_min=lo,
                              domain_max=hi), 8)
    state = init_state(sc, cfg)
    mesh = halo.Mesh(np.asarray(jax.devices()[:8]), (halo.AXIS,))
    s1, s2 = state, state
    for _ in range(2):
        s1 = jax.jit(lambda s: pcisph.step(s, cfg))(s1)
        s2 = jax.jit(lambda s: halo.pcisph_step_sharded(s, cfg, mesh))(s2)
    assert int(s2.diag.pressure_iters) == int(s1.diag.pressure_iters)
    np.testing.assert_allclose(np.asarray(s2.pos), np.asarray(s1.pos),
                               rtol=2e-4, atol=1e-6)


def test_sesph_step_sharded_matches_single(mesh8):
    from wcsph_tpu.simulation import default_config as dc
    from wcsph_tpu.solvers import sesph
    from wcsph_tpu.state import init_state

    sc = scene.dam_break(particle_radius=R, fluid_dims=(6, 6, 6),
                         box_extent=0.7)
    lo, hi = sc.domain(pad=4 * R)
    cfg = halo.slab_config(dc("sesph", particle_radius=R, domain_min=lo,
                              domain_max=hi), 8)
    state = init_state(sc, cfg)
    mesh = halo.Mesh(np.asarray(jax.devices()[:8]), (halo.AXIS,))
    s1, s2 = state, state
    for _ in range(3):
        s1 = jax.jit(lambda s: sesph.step(s, cfg))(s1)
        s2 = jax.jit(lambda s: halo.sesph_step_sharded(s, cfg, mesh))(s2)
    np.testing.assert_allclose(np.asarray(s2.pos), np.asarray(s1.pos),
                               rtol=2e-4, atol=1e-6)


def test_full_dfsph_step_sharded_engine_matches_single(mesh8):
    """The slab decomposition running the MOSAIC sweep engine inside each
    slab (SlabEngine adapter) must reproduce the single-device engine step."""
    import dataclasses

    from wcsph_tpu.state import init_state

    sc, cfg = _scene_cfg()
    cfg = halo.slab_config(cfg, 8)
    cfg = dataclasses.replace(cfg, use_pallas=True)
    state = init_state(sc, cfg)
    mesh = halo.Mesh(np.asarray(jax.devices()[:8]), (halo.AXIS,))

    s_single = state
    s_shard = state
    for _ in range(2):
        s_single = jax.jit(lambda s: dfsph.step(s, cfg))(s_single)
        s_shard = jax.jit(
            lambda s: halo.dfsph_step_sharded(s, cfg, mesh))(s_shard)
    np.testing.assert_allclose(np.asarray(s_shard.pos),
                               np.asarray(s_single.pos), rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s_shard.vel),
                               np.asarray(s_single.vel), rtol=2e-3, atol=1e-5)
    assert abs(float(s_shard.dt) - float(s_single.dt)) < 1e-7
    assert int(s_shard.diag.pressure_iters) == int(s_single.diag.pressure_iters)
