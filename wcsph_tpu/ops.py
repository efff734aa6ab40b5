"""Pairwise SPH sweeps over fixed-shape neighbor lists.

Every hot loop of the reference ("for i -> while k < neighborCount" gathers,
e.g. dfsph.py:248-262, 346-372) becomes a masked (n_liquid, K) batched
computation here: gather neighbor quantities once, do vectorized VPU math,
reduce over the K axis with jnp.sum.  Scalar accumulations the reference does
with atomics (pcisph.py:256, dfsph.py:222-240) are clean jnp reductions.

Because particle positions are frozen for the whole step, the geometry-only
pair quantities (r_ij, W, gradW, type masks) are computed once per step in
``precompute_pairs`` and shared by every sweep — the reference instead
re-evaluates W/gradW inside every kernel.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from . import kernels
from .config import SimConfig
from .neighbors import NeighborList


class Pairs(NamedTuple):
    """Per-(liquid particle, neighbor slot) cached geometry."""

    idx: jnp.ndarray       # (NL, K) int32, clamped to >= 0 (mask gates validity)
    mask: jnp.ndarray      # (NL, K) valid neighbor
    liquid: jnp.ndarray    # (NL, K) valid AND neighbor is liquid
    solid: jnp.ndarray     # (NL, K) valid AND neighbor is solid/boundary
    rij: jnp.ndarray       # (NL, K, 3) pos_i - pos_j
    dist2: jnp.ndarray     # (NL, K)
    w: jnp.ndarray         # (NL, K) cubic W(r_ij), zero where masked
    grad_w: jnp.ndarray    # (NL, K, 3) cubic gradW(r_ij), zero where masked
    count: jnp.ndarray     # (NL,) true neighbor count


def precompute_pairs(pos: jnp.ndarray, nbr: NeighborList, n_liquid: int,
                     cfg: SimConfig) -> Pairs:
    h = cfg.support_radius
    jc = jnp.maximum(nbr.idx, 0)
    pos_j = pos[jc]
    rij = pos[:n_liquid, None, :] - pos_j
    dist2 = jnp.sum(rij * rij, axis=-1)
    m = nbr.mask
    w = jnp.where(m, kernels.cubic_w_scalar(jnp.sqrt(dist2), h), 0.0)
    grad_w = jnp.where(m[..., None], kernels.cubic_grad_w(rij, h), 0.0)
    liquid = m & (nbr.idx < n_liquid)
    return Pairs(
        idx=jc, mask=m, liquid=liquid, solid=m & ~liquid & (nbr.idx >= 0),
        rij=rij, dist2=dist2, w=w, grad_w=grad_w, count=nbr.count,
    )


def gather_liquid(x: jnp.ndarray, pairs: Pairs, n_liquid: int) -> jnp.ndarray:
    """Gather a per-liquid quantity at neighbor slots; zero for solids/pads.

    Solid neighbors have no vel/rho/pressure in the reference either — every
    kernel branches on j < liquid_count (e.g. sesph.py:181-186)."""
    jl = jnp.minimum(pairs.idx, n_liquid - 1)
    vals = x[jl]
    lm = pairs.liquid if x.ndim == 1 else pairs.liquid[..., None]
    return jnp.where(lm, vals, 0.0)


def pair_volume(pairs: Pairs, cfg: SimConfig) -> jnp.ndarray:
    """V_j: liquid volume for liquid neighbors, VS0 for boundary ones."""
    return jnp.where(pairs.liquid, cfg.liquid_volume,
                     jnp.where(pairs.solid, cfg.solid_volume, 0.0))


# ---------------------------------------------------------------------------
# Density and EOS
# ---------------------------------------------------------------------------

def density(pairs: Pairs, cfg: SimConfig) -> jnp.ndarray:
    """rho_i = rho0 (V0 W(0) + sum_j V_j W_ij)   (dfsph.py:248-262)."""
    vj = pair_volume(pairs, cfg)
    s = cfg.liquid_volume * kernels.cubic_w0(cfg.support_radius)
    return cfg.rest_density * (s + jnp.sum(vj * pairs.w, axis=1))


def tait_pressure(rho: jnp.ndarray, cfg: SimConfig) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Tait EOS with density clamped >= rho0 (sesph.py:158-166).
    Returns (clamped rho, pressure)."""
    rho = jnp.maximum(rho, cfg.rest_density)
    q = rho / cfg.rest_density
    p = cfg.stiffness * (q ** cfg.sesph_eos_exponent - 1.0)
    return rho, p


# ---------------------------------------------------------------------------
# Explicit forces (SESPH / PCISPH style)
# ---------------------------------------------------------------------------

def _visc_denom(pairs: Pairs, cfg: SimConfig) -> jnp.ndarray:
    h = cfg.support_radius
    return pairs.dist2 + 0.01 * h * h


def explicit_viscosity_accel(pairs: Pairs, vel: jnp.ndarray, rho: jnp.ndarray,
                             cfg: SimConfig, n_liquid: int) -> jnp.ndarray:
    """XSPH-style laplacian viscosity (sesph.py:181-186, pcisph.py:208-214)."""
    vel_j = gather_liquid(vel, pairs, n_liquid)
    rho_j = gather_liquid(rho, pairs, n_liquid)
    denom = _visc_denom(pairs, cfg)
    dv_dot_r = jnp.sum((vel[:, None, :] - vel_j) * pairs.rij, axis=-1)
    liq = (cfg.dim_coff * cfg.explicit_viscosity * cfg.liquid_mass
           * jnp.where(pairs.liquid, dv_dot_r / jnp.maximum(rho_j, 1.0) / denom, 0.0))
    v_dot_r = jnp.sum(vel[:, None, :] * pairs.rij, axis=-1)
    sol = (cfg.dim_coff * cfg.explicit_viscosity_b * cfg.solid_volume
           * (rho[:, None] / cfg.rest_density)
           * jnp.where(pairs.solid, v_dot_r / denom, 0.0))
    return jnp.sum((liq + sol)[..., None] * pairs.grad_w, axis=1)


def pressure_accel_symmetric(pairs: Pairs, rho: jnp.ndarray, p: jnp.ndarray,
                             cfg: SimConfig, n_liquid: int) -> jnp.ndarray:
    """Symmetric pressure force with boundary mirror pressure
    (sesph.py:184-187): boundary uses (p_i/rho_i^2 + p_i/rho0^2)."""
    rho0 = cfg.rest_density
    rho_j = gather_liquid(rho, pairs, n_liquid)
    p_j = gather_liquid(p, pairs, n_liquid)
    pi_term = (p / (rho * rho))[:, None]
    liq = cfg.liquid_volume * jnp.where(
        pairs.liquid, pi_term + p_j / jnp.maximum(rho_j * rho_j, 1.0), 0.0)
    sol = cfg.solid_volume * jnp.where(
        pairs.solid, pi_term + p[:, None] / (rho0 * rho0), 0.0)
    coeff = -rho0 * (liq + sol)
    return jnp.sum(coeff[..., None] * pairs.grad_w, axis=1)


# ---------------------------------------------------------------------------
# DFSPH building blocks (dfsph.py:346-552)
# ---------------------------------------------------------------------------

def dfsph_alpha(pairs: Pairs, cfg: SimConfig) -> jnp.ndarray:
    """alpha_i = -1 / (sum_liq |V0 gradW|^2 + |sum_all V_j gradW|^2)
    (dfsph.py:346-372)."""
    vj = pair_volume(pairs, cfg)
    term = vj[..., None] * pairs.grad_w                       # (NL, K, 3)
    sum_grad = jnp.sum(term, axis=1)
    liq_term = jnp.where(pairs.liquid[..., None], term, 0.0)
    sum_sq = jnp.sum(liq_term * liq_term, axis=(1, 2))
    denom = sum_sq + jnp.sum(sum_grad * sum_grad, axis=-1)
    return jnp.where(denom > cfg.eps, -1.0 / denom, 0.0)


def drho_divergence(pairs: Pairs, vel: jnp.ndarray, cfg: SimConfig,
                    n_liquid: int) -> jnp.ndarray:
    """Velocity-divergence density rate, clamped >= 0, suppressed for
    near-isolated particles (dfsph.py:374-392)."""
    vel_j = gather_liquid(vel, pairs, n_liquid)   # zero for solids (they are static)
    vj = pair_volume(pairs, cfg)
    dv = vel[:, None, :] - vel_j
    drho = jnp.sum(vj * jnp.sum(dv * pairs.grad_w, axis=-1), axis=1)
    drho = jnp.maximum(drho, 0.0)
    return jnp.where(pairs.count < cfg.min_div_neighbors, 0.0, drho)


def advected_density(pairs: Pairs, vel: jnp.ndarray, rho: jnp.ndarray,
                     dt: jnp.ndarray, cfg: SimConfig, n_liquid: int) -> jnp.ndarray:
    """adv_rho_i = rho_i/rho0 + dt * sum_j V_j (v_i - v_j) . gradW, clamped
    >= 1 (dfsph.py:394-412; uses V_j per neighbor type — the reference writes
    VL0 for the solid term at dfsph.py:408 but VS0 == VL0 there)."""
    vel_j = gather_liquid(vel, pairs, n_liquid)
    vj = pair_volume(pairs, cfg)
    dv = vel[:, None, :] - vel_j
    temp = jnp.sum(vj * jnp.sum(dv * pairs.grad_w, axis=-1), axis=1)
    return jnp.maximum(rho / cfg.rest_density + dt * temp, 1.0)


def kappa_velocity_update(pairs: Pairs, vel: jnp.ndarray, k_i: jnp.ndarray,
                          k_j_source: jnp.ndarray, dt: jnp.ndarray,
                          cfg: SimConfig, n_liquid: int) -> jnp.ndarray:
    """vel += dt * sum_j V_j (k_i + k_j) gradW  with k_j = 0 for boundary
    neighbors (the common stencil of divergence_iter dfsph.py:449-477,
    pressure_iter dfsph.py:518-547 and both warm starts)."""
    k_j = gather_liquid(k_j_source, pairs, n_liquid)
    ksum = jnp.where(pairs.liquid, k_i[:, None] + k_j,
                     jnp.where(pairs.solid, k_i[:, None], 0.0))
    vj = pair_volume(pairs, cfg)
    dv = jnp.sum((vj * ksum)[..., None] * pairs.grad_w, axis=1)
    return vel + dt * dv


# ---------------------------------------------------------------------------
# Surface tension + adhesion (Akinci 2013; dfsph.py:265-305)
# ---------------------------------------------------------------------------

def surface_normals(pairs: Pairs, rho: jnp.ndarray, cfg: SimConfig,
                    n_liquid: int) -> jnp.ndarray:
    """n_i = h * sum_liq (m/rho_j) gradW (dfsph.py:266-279; the reference's
    `*= searchR` inside the loop is a quirk — intended Akinci form used)."""
    rho_j = gather_liquid(rho, pairs, n_liquid)
    coeff = jnp.where(pairs.liquid, cfg.liquid_mass / jnp.maximum(rho_j, 1.0), 0.0)
    return cfg.support_radius * jnp.sum(coeff[..., None] * pairs.grad_w, axis=1)


def tension_accel(pairs: Pairs, rho: jnp.ndarray, normal: jnp.ndarray,
                  pos: jnp.ndarray, cfg: SimConfig, n_liquid: int) -> jnp.ndarray:
    """Akinci cohesion + curvature + boundary adhesion (dfsph.py:282-305).

    The reference's cohesion accumulation is dead code (`accel` is overwritten
    by the curvature term before use, dfsph.py:292-295); we apply the intended
    cohesion + curvature sum.  Adhesion keeps the reference's gate: only
    boundary particles within adhesion_radius of adhesion_center attract.
    """
    h = cfg.support_radius
    rho_j = gather_liquid(rho, pairs, n_liquid)
    n_j = gather_liquid(normal, pairs, n_liquid)
    dist = jnp.sqrt(jnp.maximum(pairs.dist2, 1e-12))
    rhat = pairs.rij / jnp.maximum(dist, cfg.eps)[..., None]

    k_ij = 2.0 * cfg.rest_density / jnp.maximum(rho[:, None] + rho_j, 1.0)
    w_coh = kernels.cohesion_w_scalar(dist, h)
    cohesion = -cfg.tension_coff * cfg.liquid_mass * w_coh[..., None] * rhat
    curvature = -cfg.tension_coff * (normal[:, None, :] - n_j)
    liq = jnp.where(pairs.liquid[..., None],
                    (k_ij * (pairs.dist2 > cfg.eps))[..., None]
                    * (cohesion + curvature), 0.0)

    # boundary adhesion, gated to a region around the adhesion center
    centre = jnp.asarray(cfg.adhesion_center, jnp.float32)
    pos_j = pos[pairs.idx]
    in_region = jnp.linalg.norm(pos_j - centre, axis=-1) < cfg.adhesion_radius
    w_adh = kernels.adhesion_w_scalar(dist, h)
    sol_gate = pairs.solid & in_region & (pairs.dist2 > cfg.eps)
    sol = jnp.where(sol_gate[..., None],
                    -cfg.tension_coff_b * cfg.rest_density * cfg.solid_volume
                    * w_adh[..., None] * rhat, 0.0)
    return jnp.sum(liq + sol, axis=1)


# ---------------------------------------------------------------------------
# Micropolar vorticity (dfsph.py:307-330)
# ---------------------------------------------------------------------------

def vorticity_accel(pairs: Pairs, vel: jnp.ndarray, omega: jnp.ndarray,
                    rho: jnp.ndarray, dt: jnp.ndarray, cfg: SimConfig,
                    n_liquid: int):
    """Returns (d_vel contribution, new omega)."""
    rho0 = cfg.rest_density
    m = cfg.liquid_mass
    omega_j = gather_liquid(omega, pairs, n_liquid)          # 0 for solids
    vel_j = gather_liquid(vel, pairs, n_liquid)
    rho_j = gather_liquid(rho, pairs, n_liquid)
    d_omega_ij = omega[:, None, :] - omega_j
    d_vel_ij = vel[:, None, :] - vel_j

    inv_rho_i = (1.0 / rho)[:, None, None]
    cross_o = jnp.cross(d_omega_ij, pairs.grad_w)
    cross_v = jnp.cross(d_vel_ij, pairs.grad_w)

    mass_like = jnp.where(pairs.liquid, m, jnp.where(pairs.solid, rho0 * cfg.solid_volume, 0.0))
    dvel = cfg.vorticity_coff * inv_rho_i * mass_like[..., None] * cross_o

    # omega transfer (liquid only) + stretching + damping (dfsph.py:316-326)
    transfer = jnp.where(pairs.liquid[..., None],
                         (-1.0 / dt) * cfg.vorticity_init * cfg.viscosity_omega
                         * (m / jnp.maximum(rho_j, 1.0))[..., None]
                         * d_omega_ij * pairs.w[..., None], 0.0)
    stretch_mass = jnp.where(pairs.liquid, m,
                             jnp.where(pairs.solid, rho0 * cfg.liquid_volume, 0.0))
    stretch = (cfg.vorticity_coff * cfg.vorticity_init * inv_rho_i
               * stretch_mass[..., None] * cross_v)
    damping = jnp.where(pairs.mask[..., None],
                        -2.0 * cfg.vorticity_init * cfg.vorticity_coff
                        * omega[:, None, :], 0.0)
    d_omega = jnp.sum(transfer + stretch + damping, axis=1)
    new_omega = omega + d_omega * dt
    return jnp.sum(dvel, axis=1), new_omega


# ---------------------------------------------------------------------------
# CFL (dfsph.py:107-129, 555-568)
# ---------------------------------------------------------------------------

def cfl_vel_max(vel: jnp.ndarray, d_vel: jnp.ndarray, dt: jnp.ndarray) -> jnp.ndarray:
    """max_i |v_i + dv_i dt|^2, floored at 0.1 (the reference's log2 strided
    max-reduction becomes a single jnp.max)."""
    v = vel + d_vel * dt
    return jnp.maximum(jnp.max(jnp.sum(v * v, axis=-1)), 0.1)


def cfl_dt(dt: jnp.ndarray, vel_max_sq: jnp.ndarray, iter_feedback: jnp.ndarray,
           cfg: SimConfig) -> jnp.ndarray:
    """CFL bound + +-10% solver-iteration feedback (dfsph.py:113-127)."""
    time_step = (cfg.cfl_factor * 0.4 * 2.0 * cfg.particle_radius
                 / jnp.sqrt(vel_max_sq))
    time_step = jnp.clip(time_step, cfg.dt_min, cfg.dt_max)
    dt = jnp.where(iter_feedback > 10, dt * 0.9,
                   jnp.where(iter_feedback < 5, dt * 1.1, dt))
    return jnp.minimum(dt, time_step)
