"""Pairwise SPH sweeps over fixed-shape neighbor lists.

Every hot loop of the reference ("for i -> while k < neighborCount" gathers,
e.g. dfsph.py:248-262, 346-372) becomes a masked (K, n_liquid) batched
computation here: gather neighbor quantities once, do vectorized VPU math,
reduce over the K (sublane) axis.  Scalar accumulations the reference does
with atomics (pcisph.py:256, dfsph.py:222-240) are clean jnp reductions.

TPU layout rules used throughout:
  * pair arrays are (K, n_liquid): particle axis = 128-lane minor dim;
  * particle vectors are planar (3, n): the size-3 axis is major, never the
    minormost (XLA pads the minor dim to 128 lanes — a 42x blowup otherwise);
  * gradW is never stored as a vector: gradW(r) = gs(|r|) * r with the scalar
    gs cached per pair (kernels.cubic_grad_scale), so |gradW|^2 = gs^2 |r|^2
    and dot(v, gradW) = gs * dot(v, r).

Because particle positions are frozen for the whole step, the geometry-only
pair quantities (r_ij, W, gs, type masks) are computed once per step in
``precompute_pairs`` and shared by every sweep — the reference instead
re-evaluates W/gradW inside every kernel.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from . import kernels
from .config import SimConfig
from .neighbors import NeighborList


def dot3(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Dot product over the leading size-3 axis."""
    return jnp.sum(a * b, axis=0)


def cross3(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Cross product over the leading size-3 axis (broadcasting tails)."""
    return jnp.stack([
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    ])


class Pairs(NamedTuple):
    """Per-(neighbor slot, liquid particle) cached geometry."""

    idx: jnp.ndarray       # (K, NL) int32, clamped >= 0 (mask gates validity)
    mask: jnp.ndarray      # (K, NL) valid neighbor
    liquid: jnp.ndarray    # (K, NL) valid AND neighbor is liquid
    solid: jnp.ndarray     # (K, NL) valid AND neighbor is solid/boundary
    rij: jnp.ndarray       # (3, K, NL) pos_i - pos_j
    dist2: jnp.ndarray     # (K, NL)
    w: jnp.ndarray         # (K, NL) cubic W(r_ij), zero where masked
    gs: jnp.ndarray        # (K, NL) gradW scale: gradW = gs * rij
    count: jnp.ndarray     # (NL,) true neighbor count


def precompute_pairs(pos: jnp.ndarray, nbr: NeighborList, n_liquid: int,
                     cfg: SimConfig) -> Pairs:
    h = cfg.support_radius
    jc = jnp.maximum(nbr.idx, 0)
    pos_j = pos[:, jc]                                  # (3, K, NL)
    rij = pos[:, None, :n_liquid] - pos_j
    dist2 = dot3(rij, rij)
    m = nbr.mask
    dist = jnp.sqrt(dist2)
    w = jnp.where(m, kernels.cubic_w_scalar(dist, h), 0.0)
    gs = jnp.where(m, kernels.cubic_grad_scale(dist, h), 0.0)
    liquid = m & (nbr.idx < n_liquid)
    return Pairs(
        idx=jc, mask=m, liquid=liquid, solid=m & (nbr.idx >= n_liquid),
        rij=rij, dist2=dist2, w=w, gs=gs, count=nbr.count,
    )


def gather_liquid(x: jnp.ndarray, pairs: Pairs, n_liquid: int) -> jnp.ndarray:
    """Gather a per-liquid quantity at neighbor slots; zero for solids/pads.

    x is (NL,) -> (K, NL) or planar (3, NL) -> (3, K, NL).  Solid neighbors
    have no vel/rho/pressure in the reference either — every kernel branches
    on j < liquid_count (e.g. sesph.py:181-186)."""
    jl = jnp.minimum(pairs.idx, n_liquid - 1)
    if x.ndim == 1:
        return jnp.where(pairs.liquid, x[jl], 0.0)
    return jnp.where(pairs.liquid[None], x[:, jl], 0.0)


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
    return cfg.rest_density * (s + jnp.sum(vj * pairs.w, axis=0))


def tait_pressure(rho: jnp.ndarray, cfg: SimConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
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
    """XSPH-style laplacian viscosity (sesph.py:181-186, pcisph.py:208-214).
    vel is planar (3, NL); returns (3, NL)."""
    vel_j = gather_liquid(vel, pairs, n_liquid)
    rho_j = gather_liquid(rho, pairs, n_liquid)
    denom = _visc_denom(pairs, cfg)
    dv_dot_r = dot3(vel[:, None, :] - vel_j, pairs.rij)
    liq = (cfg.dim_coff * cfg.explicit_viscosity * cfg.liquid_mass
           * jnp.where(pairs.liquid, dv_dot_r / jnp.maximum(rho_j, 1.0) / denom, 0.0))
    v_dot_r = dot3(vel[:, None, :], pairs.rij)
    sol = (cfg.dim_coff * cfg.explicit_viscosity_b * cfg.solid_volume
           * (rho[None, :] / cfg.rest_density)
           * jnp.where(pairs.solid, v_dot_r / denom, 0.0))
    return jnp.sum(((liq + sol) * pairs.gs)[None] * pairs.rij, axis=1)


def pressure_accel_symmetric(pairs: Pairs, rho: jnp.ndarray, p: jnp.ndarray,
                             cfg: SimConfig, n_liquid: int) -> jnp.ndarray:
    """Symmetric pressure force with boundary mirror pressure
    (sesph.py:184-187): boundary uses (p_i/rho_i^2 + p_i/rho0^2)."""
    rho0 = cfg.rest_density
    rho_j = gather_liquid(rho, pairs, n_liquid)
    p_j = gather_liquid(p, pairs, n_liquid)
    pi_term = (p / (rho * rho))[None, :]
    liq = cfg.liquid_volume * jnp.where(
        pairs.liquid, pi_term + p_j / jnp.maximum(rho_j * rho_j, 1.0), 0.0)
    sol = cfg.solid_volume * jnp.where(
        pairs.solid, pi_term + p[None, :] / (rho0 * rho0), 0.0)
    coeff = -rho0 * (liq + sol) * pairs.gs
    return jnp.sum(coeff[None] * pairs.rij, axis=1)


# ---------------------------------------------------------------------------
# DFSPH building blocks (dfsph.py:346-552)
# ---------------------------------------------------------------------------

def dfsph_alpha(pairs: Pairs, cfg: SimConfig) -> jnp.ndarray:
    """alpha_i = -1 / (sum_liq |V0 gradW|^2 + |sum_all V_j gradW|^2)
    (dfsph.py:346-372).  |gradW|^2 = gs^2 |r|^2 — no vector pair array."""
    vj = pair_volume(pairs, cfg)
    coeff = vj * pairs.gs                                  # (K, NL)
    sum_grad = jnp.sum(coeff[None] * pairs.rij, axis=1)    # (3, NL)
    liq_c = jnp.where(pairs.liquid, cfg.liquid_volume * pairs.gs, 0.0)
    sum_sq = jnp.sum(liq_c * liq_c * pairs.dist2, axis=0)
    denom = sum_sq + dot3(sum_grad, sum_grad)
    return jnp.where(denom > cfg.eps, -1.0 / denom, 0.0)


def drho_divergence(pairs: Pairs, vel: jnp.ndarray, cfg: SimConfig,
                    n_liquid: int) -> jnp.ndarray:
    """Velocity-divergence density rate, clamped >= 0, suppressed for
    near-isolated particles (dfsph.py:374-392)."""
    vel_j = gather_liquid(vel, pairs, n_liquid)   # zero for solids (static)
    vj = pair_volume(pairs, cfg)
    dv_dot_r = dot3(vel[:, None, :] - vel_j, pairs.rij)
    drho = jnp.sum(vj * pairs.gs * dv_dot_r, axis=0)
    drho = jnp.maximum(drho, 0.0)
    return jnp.where(pairs.count < cfg.min_div_neighbors, 0.0, drho)


def advected_density(pairs: Pairs, vel: jnp.ndarray, rho: jnp.ndarray,
                     dt: jnp.ndarray, cfg: SimConfig, n_liquid: int) -> jnp.ndarray:
    """adv_rho_i = rho_i/rho0 + dt * sum_j V_j (v_i - v_j) . gradW, clamped
    >= 1 (dfsph.py:394-412; uses V_j per neighbor type — the reference writes
    VL0 for the solid term at dfsph.py:408 but VS0 == VL0 there)."""
    vel_j = gather_liquid(vel, pairs, n_liquid)
    vj = pair_volume(pairs, cfg)
    dv_dot_r = dot3(vel[:, None, :] - vel_j, pairs.rij)
    temp = jnp.sum(vj * pairs.gs * dv_dot_r, axis=0)
    return jnp.maximum(rho / cfg.rest_density + dt * temp, 1.0)


def kappa_velocity_update(pairs: Pairs, vel: jnp.ndarray, k_i: jnp.ndarray,
                          k_j_source: jnp.ndarray, dt: jnp.ndarray,
                          cfg: SimConfig, n_liquid: int) -> jnp.ndarray:
    """vel += dt * sum_j V_j (k_i + k_j) gradW  with k_j = 0 for boundary
    neighbors (the common stencil of divergence_iter dfsph.py:449-477,
    pressure_iter dfsph.py:518-547 and both warm starts)."""
    k_j = gather_liquid(k_j_source, pairs, n_liquid)
    ksum = jnp.where(pairs.liquid, k_i[None, :] + k_j,
                     jnp.where(pairs.solid, k_i[None, :], 0.0))
    vj = pair_volume(pairs, cfg)
    dv = jnp.sum((vj * ksum * pairs.gs)[None] * pairs.rij, axis=1)
    return vel + dt * dv


# ---------------------------------------------------------------------------
# Surface tension + adhesion (Akinci 2013; dfsph.py:265-305)
# ---------------------------------------------------------------------------

def surface_normals(pairs: Pairs, rho: jnp.ndarray, cfg: SimConfig,
                    n_liquid: int) -> jnp.ndarray:
    """n_i = h * sum_liq (m/rho_j) gradW (dfsph.py:266-279; the reference's
    `*= searchR` inside the loop is a quirk — intended Akinci form used)."""
    rho_j = gather_liquid(rho, pairs, n_liquid)
    coeff = jnp.where(pairs.liquid,
                      cfg.liquid_mass / jnp.maximum(rho_j, 1.0), 0.0) * pairs.gs
    return cfg.support_radius * jnp.sum(coeff[None] * pairs.rij, axis=1)


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
    inv_dist = 1.0 / jnp.maximum(dist, cfg.eps)

    k_ij = 2.0 * cfg.rest_density / jnp.maximum(rho[None, :] + rho_j, 1.0)
    w_coh = kernels.cohesion_w_scalar(dist, h)
    coh_scale = -cfg.tension_coff * cfg.liquid_mass * w_coh * inv_dist
    cohesion = coh_scale[None] * pairs.rij
    curvature = -cfg.tension_coff * (normal[:, None, :] - n_j)
    gate = (k_ij * (pairs.dist2 > cfg.eps) * pairs.liquid)[None]
    liq = gate * (cohesion + curvature)

    # boundary adhesion, gated to a region around the adhesion center
    centre = jnp.asarray(cfg.adhesion_center, jnp.float32).reshape(3, 1, 1)
    pos_j = pos[:, pairs.idx]
    d_centre2 = dot3(pos_j - centre, pos_j - centre)
    in_region = d_centre2 < cfg.adhesion_radius ** 2
    w_adh = kernels.adhesion_w_scalar(dist, h)
    sol_gate = pairs.solid & in_region & (pairs.dist2 > cfg.eps)
    adh_scale = jnp.where(sol_gate,
                          -cfg.tension_coff_b * cfg.rest_density
                          * cfg.solid_volume * w_adh * inv_dist, 0.0)
    return jnp.sum(liq + adh_scale[None] * pairs.rij, axis=1)


# ---------------------------------------------------------------------------
# Micropolar vorticity (dfsph.py:307-330)
# ---------------------------------------------------------------------------

def vorticity_accel(pairs: Pairs, vel: jnp.ndarray, omega: jnp.ndarray,
                    rho: jnp.ndarray, dt: jnp.ndarray, cfg: SimConfig,
                    n_liquid: int):
    """Returns (d_vel contribution (3, NL), new omega (3, NL))."""
    rho0 = cfg.rest_density
    m = cfg.liquid_mass
    omega_j = gather_liquid(omega, pairs, n_liquid)          # 0 for solids
    vel_j = gather_liquid(vel, pairs, n_liquid)
    rho_j = gather_liquid(rho, pairs, n_liquid)
    d_omega_ij = omega[:, None, :] - omega_j
    d_vel_ij = vel[:, None, :] - vel_j

    inv_rho_i = (1.0 / rho)[None, :]
    # cross(a, gradW) = gs * cross(a, rij)
    cross_o = cross3(d_omega_ij, pairs.rij) * pairs.gs[None]
    cross_v = cross3(d_vel_ij, pairs.rij) * pairs.gs[None]

    mass_like = jnp.where(pairs.liquid, m,
                          jnp.where(pairs.solid, rho0 * cfg.solid_volume, 0.0))
    dvel = (cfg.vorticity_coff * inv_rho_i * mass_like)[None] * cross_o

    # omega transfer (liquid only) + stretching + damping (dfsph.py:316-326)
    transfer_c = jnp.where(pairs.liquid,
                           (-1.0 / dt) * cfg.vorticity_init * cfg.viscosity_omega
                           * m / jnp.maximum(rho_j, 1.0) * pairs.w, 0.0)
    transfer = transfer_c[None] * d_omega_ij
    stretch_mass = jnp.where(pairs.liquid, m,
                             jnp.where(pairs.solid, rho0 * cfg.liquid_volume, 0.0))
    stretch = (cfg.vorticity_coff * cfg.vorticity_init * inv_rho_i
               * stretch_mass)[None] * cross_v
    damping = jnp.where(pairs.mask[None],
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
    return jnp.maximum(jnp.max(dot3(v, v)), 0.1)


def cfl_dt(dt: jnp.ndarray, vel_max_sq: jnp.ndarray, iter_feedback: jnp.ndarray,
           cfg: SimConfig) -> jnp.ndarray:
    """CFL bound + +-10% solver-iteration feedback (dfsph.py:113-127)."""
    time_step = (cfg.cfl_factor * 0.4 * 2.0 * cfg.particle_radius
                 / jnp.sqrt(vel_max_sq))
    time_step = jnp.clip(time_step, cfg.dt_min, cfg.dt_max)
    dt = jnp.where(iter_feedback > 10, dt * 0.9,
                   jnp.where(iter_feedback < 5, dt * 1.1, dt))
    return jnp.minimum(dt, time_step)
