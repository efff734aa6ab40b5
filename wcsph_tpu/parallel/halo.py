"""Explicit spatial domain decomposition: shard_map + ppermute halo exchange.

The TPU-native analogue of multi-GPU SPH domain decomposition (the reference
is single-device; SURVEY.md §2 parallelism table).  The packed cell grid
(grid.py) is split into contiguous x-slabs over a 1-D device mesh.  Because
every neighbor access in the dense engine is a shift of at most one x-plane
(the 27 window offsets span +-(gy*gz + gz + 1) linear cells = one plane plus
fringe), each device only needs a ONE-PLANE halo from each neighbor:

  1. ppermute the boundary x-plane of every packed array to the adjacent
     devices (bidirectional ring over ICI);
  2. run the unchanged WindowLoop sweeps on the locally extended slab
     (local grid gx/n + 2 halo planes), with the in-box masks offset by the
     slab's global x position;
  3. drop the halo columns from the outputs; psum global reductions
     (solver errors, CFL max).

``density_sharded`` demonstrates the full pattern end-to-end and is verified
against the single-device result on an 8-virtual-device CPU mesh
(tests/test_parallel.py).  The same wrapper generalizes to every sweep in
dense_ops because they share the WindowLoop contract.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from .. import dense_ops
from ..config import SimConfig
from ..grid import DenseGrid

AXIS = "x"


def slab_config(cfg: SimConfig, n_devices: int) -> SimConfig:
    """Pad the domain so the grid x-resolution divides the device count."""
    gx, gy, gz = cfg.grid_res
    pad_planes = (-gx) % n_devices
    if pad_planes == 0:
        return cfg
    new_max = (cfg.domain_max[0] + pad_planes * cfg.cell_size,
               cfg.domain_max[1], cfg.domain_max[2])
    out = dataclasses.replace(cfg, domain_max=new_max)
    assert out.grid_res[0] % n_devices == 0, (out.grid_res, n_devices)
    return out


def _exchange_halo(arr: jnp.ndarray, plane: int, fill) -> jnp.ndarray:
    """Append one x-plane of halo (gy*gz cells) from each ring neighbor.

    arr: (..., NC_local); returns (..., NC_local + 2*plane).
    """
    n = jax.lax.axis_size(AXIS)
    idx = jax.lax.axis_index(AXIS)
    right = [(i, (i + 1) % n) for i in range(n)]
    left = [(i, (i - 1) % n) for i in range(n)]
    # send my last plane to the right neighbor -> it becomes their left halo
    left_halo = jax.lax.ppermute(arr[..., -plane:], AXIS, right)
    right_halo = jax.lax.ppermute(arr[..., :plane], AXIS, left)
    blank = jnp.full(arr.shape[:-1] + (plane,), fill, arr.dtype)
    left_halo = jnp.where(idx == 0, blank, left_halo)
    right_halo = jnp.where(idx == n - 1, blank, right_halo)
    return jnp.concatenate([left_halo, arr, right_halo], axis=-1)


def _local_grid(grid_slab: DenseGrid, cfg: SimConfig, n: int) -> DenseGrid:
    """Halo-extend a slab-local DenseGrid (pid/valid/liquid/xp only)."""
    gx, gy, gz = cfg.grid_res
    plane = gy * gz
    return grid_slab._replace(
        pid=_exchange_halo(grid_slab.pid, plane, -1),
        valid=_exchange_halo(grid_slab.valid, plane, False),
        liquid=_exchange_halo(grid_slab.liquid, plane, False),
        xp=_exchange_halo(grid_slab.xp, plane, 1e9),
    )


def _ext_cfg(cfg: SimConfig, n: int) -> SimConfig:
    """Config describing the halo-extended local grid (gx/n + 2 planes)."""
    gx, gy, gz = cfg.grid_res
    gx_loc = gx // n + 2
    # domain bounds chosen so grid_res reproduces (gx_loc, gy, gz)
    new_max = (cfg.domain_min[0] + (gx_loc - 0.5) * cfg.cell_size,
               cfg.domain_max[1], cfg.domain_max[2])
    out = dataclasses.replace(cfg, domain_max=new_max)
    assert out.grid_res == (gx_loc, gy, gz), (out.grid_res, gx_loc)
    return out


def pressure_solve_sharded(grid: DenseGrid, cfg: SimConfig, velp, kp,
                           alphap, rhop, dt, mesh: Mesh):
    """DFSPH constant-density solver under x-slab decomposition.

    The full distributed solver-loop pattern: each `lax.while_loop` iteration
    exchanges one plane of halo (k and vel) over the ring, runs the unchanged
    symmetric window ops on the extended slab, and reduces the density error
    with a psum — the TPU equivalent of a multi-GPU SPH pressure solve.
    Mirror (Newton) contributions that cross a slab boundary are recomputed
    by the neighbor's halo-home rows, so the symmetric ops stay exact.

    Returns (vel (3,C,NC), kappa (C,NC), iters, err), matching
    solvers.dfsph.pressure_solve (without the optional warm start).
    """
    import jax.numpy as jnp  # noqa: F811 (local alias for clarity)

    n = mesh.devices.size
    gx, gy, gz = cfg.grid_res
    assert gx % n == 0, "use slab_config() to pad the domain first"
    plane = gy * gz
    ecfg = _ext_cfg(cfg, n)

    def ext(a, fill=0.0):
        return _exchange_halo(a, plane, fill)

    def interior(a):
        return a[..., plane:-plane]

    @partial(shard_map, mesh=mesh,
             in_specs=(P(None, AXIS), P(None, AXIS), P(None, AXIS),
                       P(None, None, AXIS), P(None, None, AXIS),
                       P(None, AXIS), P(None, AXIS), P(None, AXIS)),
             out_specs=(P(None, None, AXIS), P(None, AXIS), P(), P()),
             check_vma=False)
    def go(pid, valid, liquid, xp, vel, k, alpha, rho):
        slab = DenseGrid(pid=pid, valid=valid, liquid=liquid, xp=xp,
                         slot=jnp.zeros((1,), jnp.int32),
                         overflow=jnp.int32(0))
        egrid = _local_grid(slab, cfg, n)
        rho_e = ext(rho, 1.0)
        alpha_dt2 = alpha / (dt * dt)              # local interior
        n_liq = jax.lax.psum(jnp.sum(liquid), AXIS).astype(jnp.float32)

        from .. import dense_ops

        def adv_of(vel_loc):
            adv_e = dense_ops.advected_density(egrid, ecfg, ext(vel_loc),
                                               rho_e, dt)
            return interior(adv_e)

        adv0 = adv_of(vel)

        def body(carry):
            vel, kp_, adv, err, it = carry
            kk = (adv - 1.0) * alpha_dt2
            kp_ = kp_ + kk
            vel_new_e = dense_ops.kappa_velocity_update(
                egrid, ecfg, ext(vel), ext(kk), dt)
            vel = interior(vel_new_e)
            adv = adv_of(vel)
            err_loc = jnp.sum(jnp.where(liquid, adv - 1.0, 0.0))
            err = jax.lax.psum(err_loc, AXIS) / n_liq
            return vel, kp_, adv, err, it + 1

        def cond(carry):
            *_, err, it = carry
            return ((err > cfg.dfsph_tol) | (it < cfg.dfsph_min_iters)) \
                & (it < cfg.dfsph_max_iters)

        vel, k, adv, err, iters = jax.lax.while_loop(
            cond, body, (vel, jnp.zeros_like(k), adv0, jnp.float32(0.0),
                         jnp.int32(0)))
        return vel, k * dt * dt, iters, err

    return go(grid.pid, grid.valid, grid.liquid, grid.xp,
              velp, kp, alphap, rhop)


def density_sharded(grid: DenseGrid, cfg: SimConfig, mesh: Mesh):
    """Packed density over an x-slab decomposition of the cell grid.

    grid: a full (replicated-input) DenseGrid; arrays are scattered to slabs
    by shard_map's in_specs, halo-exchanged, and the unchanged dense_ops
    density sweep runs on each extended slab.  Returns (C, NC) densities
    sharded over the cell axis.
    """
    n = mesh.devices.size
    gx, gy, gz = cfg.grid_res
    assert gx % n == 0, "use slab_config() to pad the domain first"
    plane = gy * gz
    ecfg = _ext_cfg(cfg, n)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(None, AXIS), P(None, AXIS), P(None, AXIS),
                       P(None, None, AXIS)),
             out_specs=P(None, AXIS),
             check_vma=False)
    def go(pid, valid, liquid, xp):
        slab = DenseGrid(pid=pid, valid=valid, liquid=liquid, xp=xp,
                         slot=jnp.zeros((1,), jnp.int32),
                         overflow=jnp.int32(0))
        ext = _local_grid(slab, cfg, n)
        # the extended slab has its own "edge" planes which are REAL interior
        # planes globally — only the true domain ends must mask as walls.
        # Halo planes beyond the physical domain carry EMPTY cells (fill),
        # so the in-box x test on the extended grid is safe: halo columns of
        # the global edge devices hold no particles.
        rho = dense_ops.density_stats(ext, ecfg, with_alpha=False).rho
        return rho[:, plane:-plane]

    return go(grid.pid, grid.valid, grid.liquid, grid.xp)
