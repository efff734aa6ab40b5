"""Implicit viscosity: matrix-free block-Jacobi preconditioned CG.

Weiler 2018 implicit viscosity as used by the reference (duplicated in
dfsph.py:181-246 and iisph.py:184-252): solve (I - dt/rho * L_visc) v' = v
with a per-particle 3x3 block-Jacobi preconditioner.  The reference drives
the CG loop from the host, reading cg_delta every iteration (dfsph.py:94-99);
here the whole solve is one on-device ``lax.while_loop`` — no host round
trips.  Scalar dot products that the reference accumulates with atomic adds
into 1-element fields (dfsph.py:226-246) are jnp.sum reductions.

The preconditioner matrix gradW ⊗ r = gs * r ⊗ r is symmetric, so it is
stored as 6 planar component arrays (utils/mat3.py) — never as (N, 3, 3).

Warm start parity: the previous frame's delta-v persists in vel_guess and the
initial guess is vel_guess + vel (dfsph.py:199-200); on return vel_guess holds
the new delta-v (dfsph.py:340-343 end_viscosity).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import ops
from .config import SimConfig
from .utils import mat3


class ViscositySolution(NamedTuple):
    vel_new: jnp.ndarray     # (3, NL) solved velocity v'
    delta_v: jnp.ndarray     # (3, NL) v' - v (next frame's warm start)
    iters: jnp.ndarray       # PCG iterations performed


def _pair_coeff(pairs: ops.Pairs, rho: jnp.ndarray, cfg: SimConfig,
                n_liquid: int) -> jnp.ndarray:
    """Shared per-pair coefficient of both the matvec and the preconditioner
    (dfsph.py:182-195 vs 202-215): c_j / (|r|^2 + 0.01 h^2)."""
    h = cfg.support_radius
    denom = pairs.dist2 + 0.01 * h * h
    rho_j = ops.gather_liquid(rho, pairs, n_liquid)
    liq = cfg.dim_coff * cfg.viscosity * cfg.liquid_mass / jnp.maximum(rho_j, 1.0)
    sol = (cfg.dim_coff * cfg.viscosity_b * cfg.rest_density
           / rho[None, :] * cfg.solid_volume)
    c = jnp.where(pairs.liquid, liq, jnp.where(pairs.solid, sol, 0.0))
    return c / denom


def _matvec(x: jnp.ndarray, pairs: ops.Pairs, coeff: jnp.ndarray,
            rho: jnp.ndarray, dt: jnp.ndarray, n_liquid: int) -> jnp.ndarray:
    """A x = x_i - dt/rho_i * sum_j c_j (x_i - x_j).r_ij gradW_ij
    (x_j = 0 for boundary neighbors, matching get_viscosity_Ax)."""
    x_j = ops.gather_liquid(x, pairs, n_liquid)
    dx_dot_r = ops.dot3(x[:, None, :] - x_j, pairs.rij)
    acc = jnp.sum((coeff * dx_dot_r * pairs.gs)[None] * pairs.rij, axis=1)
    return x - acc * (dt / rho)[None, :]


def _block_jacobi_inv(pairs: ops.Pairs, coeff: jnp.ndarray, rho: jnp.ndarray,
                      dt: jnp.ndarray) -> mat3.Sym3:
    """Minv_i = (I - dt/rho_i * sum_j c_j gs r ⊗ r)^-1  (dfsph.py:202-215)."""
    cg = coeff * pairs.gs
    rx, ry, rz = pairs.rij[0], pairs.rij[1], pairs.rij[2]
    m = mat3.Sym3(
        xx=jnp.sum(cg * rx * rx, axis=0),
        xy=jnp.sum(cg * rx * ry, axis=0),
        xz=jnp.sum(cg * rx * rz, axis=0),
        yy=jnp.sum(cg * ry * ry, axis=0),
        yz=jnp.sum(cg * ry * rz, axis=0),
        zz=jnp.sum(cg * rz * rz, axis=0),
    )
    a = mat3.sym3_identity_minus(m, dt / rho)
    return mat3.sym3_inverse(a)


def _identity_precond(minv: mat3.Sym3) -> mat3.Sym3:
    """Plain-CG mode (cfg.viscosity_precond=False): identity M, matching
    the reference's unpreconditioned branch in its published cg-vs-
    precondition_cg iteration comparison (image/average_iter_num.png)."""
    one = jnp.ones_like(minv.xx)
    zero = jnp.zeros_like(minv.xx)
    return mat3.Sym3(xx=one, xy=zero, xz=zero, yy=one, yz=zero, zz=one)


def solve(pairs: ops.Pairs, vel: jnp.ndarray, vel_guess: jnp.ndarray,
          rho: jnp.ndarray, dt: jnp.ndarray, cfg: SimConfig,
          n_liquid: int) -> ViscositySolution:
    coeff = _pair_coeff(pairs, rho, cfg, n_liquid)
    minv = _block_jacobi_inv(pairs, coeff, rho, dt)
    if not cfg.viscosity_precond:
        minv = _identity_precond(minv)

    def mv(x):
        return _matvec(x, pairs, coeff, rho, dt, n_liquid)

    x0 = vel_guess + vel                       # warm start (dfsph.py:199-200)
    r0 = vel - mv(x0)
    d0 = minv.matvec(r0)
    delta0 = jnp.sum(r0 * d0)

    def cond(carry):
        x, r, d, delta, it = carry
        keep = (it < cfg.max_cg_iters) & (delta > cfg.viscosity_err * delta0) \
            & (delta0 >= cfg.eps)
        return (it == 0) | keep                # reference always runs >= 1 iter

    def body(carry):
        x, r, d, delta, it = carry
        ad = mv(d)
        d_ad = cfg.eps + jnp.sum(d * ad)       # eps seed as in dfsph.py:227
        alpha = delta / d_ad
        x = x + alpha * d
        r = r - alpha * ad
        s = minv.matvec(r)
        delta_new = jnp.sum(r * s)
        beta = delta_new / delta
        d = s + beta * d
        return x, r, d, delta_new, it + 1

    x, r, d, delta, iters = jax.lax.while_loop(
        cond, body, (x0, r0, d0, delta0, jnp.int32(0)))
    return ViscositySolution(vel_new=x, delta_v=x - vel, iters=iters)


def solve_dense(comm, velp: jnp.ndarray, vel_guessp: jnp.ndarray,
                rhop: jnp.ndarray, dt: jnp.ndarray) -> ViscositySolution:
    """Same PCG on the cell-dense packed layout (dense_ops), parameterized by
    a communicator (parallel/comm.py): single-device or x-slab sharded with
    a halo exchange per matvec and psum'd dot products.  All arrays are in
    the comm's OWNED (local) layout."""
    from . import dense_ops

    cfg = comm.cfg
    liq3 = comm._liq[None]
    x0 = vel_guessp + velp                     # warm start (dfsph.py:199-200)

    if comm.engine is not None:
        def mv(x):
            return comm.engine.visc_matvec(x, rhop, dt)

        minv, ax0 = comm.engine.visc_init(x0, rhop, dt)
    else:
        rho_l = comm.lift(rhop, 1.0)
        rho_pad = dense_ops.WindowLoop(comm.grid, cfg).pad(rho_l, 1.0)

        def mv(x):
            return comm.lower(dense_ops.visc_matvec(
                comm.grid, cfg, comm.lift(x), rho_l, rho_pad, dt))

        # fused setup: preconditioner + A x0 share one window scan
        minv_e, ax0_e = dense_ops.visc_init(comm.grid, cfg, comm.lift(x0),
                                            rho_l, rho_pad, dt)
        minv = mat3.Sym3(*[comm.lower(c) for c in minv_e])
        ax0 = comm.lower(ax0_e)

    if not cfg.viscosity_precond:
        minv = _identity_precond(minv)

    def precond(r):
        # Sym3.matvec expects (3, N); flatten packed dims
        shp = r.shape
        flat = mat3.Sym3(*[c.reshape(-1) for c in minv]).matvec(
            r.reshape(3, -1))
        return flat.reshape(shp)

    def ldot(a, b):
        return comm.lsum(jnp.sum(a * b, axis=0))

    r0 = jnp.where(liq3, velp - ax0, 0.0)
    d0 = precond(r0)
    delta0 = ldot(r0, d0)

    def cond(carry):
        x, r, d, delta, it = carry[:5]
        keep = (it < cfg.max_cg_iters) & (delta > cfg.viscosity_err * delta0) \
            & (delta0 >= cfg.eps)
        return (it == 0) | keep

    from .pallas.engine import use_fused_iters

    if use_fused_iters(comm, "fused_visc_iter"):
        # One Mosaic program per PCG iteration (engine.fused_visc_iter:
        # matvec sweep + both global dots + the x/r/d updates); the matvec
        # accumulator cycles through the carry as donated storage.
        eng = comm.engine
        rinv = 1.0 / jnp.maximum(rhop, 1.0)
        minv6 = jnp.stack(list(minv))

        def body(carry):
            x, r, d, delta, it, acc_b = carry
            x, r, d, acc_b, scal = eng.fused_visc_iter(
                x, r, d, delta, rinv, minv6, dt, acc_b)
            return x, r, d, scal[1], it + 1, acc_b

        x, r, d, delta, iters, _ = jax.lax.while_loop(
            cond, body, (x0, r0, d0, delta0, jnp.int32(0),
                         jnp.zeros_like(x0)))
        return ViscositySolution(vel_new=x, delta_v=x - velp, iters=iters)

    def body(carry):
        x, r, d, delta, it = carry
        ad = jnp.where(liq3, mv(d), 0.0)
        d_ad = cfg.eps + ldot(d, ad)
        alpha = delta / d_ad
        x = x + alpha * d
        r = r - alpha * ad
        s = precond(r)
        delta_new = ldot(r, s)
        beta = delta_new / delta
        d = s + beta * d
        return x, r, d, delta_new, it + 1

    x, r, d, delta, iters = jax.lax.while_loop(
        cond, body, (x0, r0, d0, delta0, jnp.int32(0)))
    return ViscositySolution(vel_new=x, delta_v=x - velp, iters=iters)
