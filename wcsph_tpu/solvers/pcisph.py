"""PCISPH: predictive-corrective incompressible SPH.

Re-design of reference pcisph.py.  The scalar stiffness ``pci_coff`` is a pure
function of the kernel geometry, integrated over a prototype filled
neighborhood on the host at trace time (reference computes it on CPU with a
numpy triple loop, pcisph.py:87-115); the prediction loop becomes a
``lax.while_loop``.

Documented divergence from the reference: the reference predicts density from
the ORIGINAL positions (pcisph.py:249 uses particle_data.pos, not pos_star),
so its density error never changes across iterations, and it zeroes pressure
each iteration (pcisph.py:235).  We implement the intended PCISPH (Solenthaler
2009): density predicted at the advected positions, pressure accumulated
across iterations.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from .. import kernels, ops
from ..config import SimConfig
from ..neighbors import build_neighbors
from ..state import FluidState, StepDiagnostics


def default_config(**overrides) -> SimConfig:
    """Reference pcisph defaults (pcisph.py:23-72): VS0 = 2*VL0, nu = 0.05."""
    base = dict(
        solid_volume_scale=2.0,
        explicit_viscosity=0.05,
        explicit_viscosity_b=0.0,
        adaptive_dt=False,
        dt_init=1e-3,
    )
    base.update(overrides)
    return SimConfig(**base)


@functools.lru_cache(maxsize=8)
def pci_coefficient(particle_radius: float) -> float:
    """Prototype-neighborhood stiffness (pcisph.py:87-115).

    Integrates gradW over a filled lattice of spacing 2r inside the support
    sphere: coff = 1 / (2 V0^2 (|sum gradW|^2 + sum |gradW|^2)).
    """
    h = 4.0 * particle_radius
    diam = 2.0 * particle_radius
    v0 = particle_radius**3 * 0.8 * 8.0
    m_l = 48.0 / (math.pi * h**3)

    coords = np.arange(-h, h + 1e-9, diam)
    g = np.stack(np.meshgrid(coords, coords, coords, indexing="ij"), -1).reshape(-1, 3)
    r = -g  # xi - xj with xi at origin
    dist = np.linalg.norm(r, axis=1)
    inside = (dist < h) & (dist > 1e-5)
    r, dist = r[inside], dist[inside]
    q = dist / h
    mag = np.where(q <= 0.5, m_l * q * (3.0 * q - 2.0), -m_l * (1.0 - q) ** 2)
    grads = mag[:, None] * r / (dist * h)[:, None]
    sum_grad = grads.sum(axis=0)
    sum_sq = float((grads**2).sum())
    beta = 2.0 * v0 * v0
    return 1.0 / (beta * (float(sum_grad @ sum_grad) + sum_sq))


def _star_geometry(pos_star_l, pos, pairs, cfg, n_liquid):
    """r* = pos*_i - pos*_j (predicted positions for liquid pairs, original
    for boundary) and its norm, planar layout."""
    jc = pairs.idx
    pos_j = pos[:, jc]                                      # (3, K, NL)
    jl = jnp.minimum(jc, n_liquid - 1)
    pos_star_j = jnp.where(pairs.liquid[None], pos_star_l[:, jl], pos_j)
    r_star = pos_star_l[:, None, :] - pos_star_j
    dist = jnp.sqrt(jnp.maximum(ops.dot3(r_star, r_star), 0.0))
    return r_star, dist


def _pressure_accel(pos_star_l, pos, pairs, pressure, cfg, n_liquid):
    """- sum_j [liq: V0 (p_i + p_j); sol: VS0 p_i] gradW(r*) with predicted
    positions for liquid pairs (pcisph.py:259-278, intended form)."""
    r_star, dist = _star_geometry(pos_star_l, pos, pairs, cfg, n_liquid)
    gs = jnp.where(pairs.mask,
                   kernels.cubic_grad_scale(dist, cfg.support_radius), 0.0)
    p_j = ops.gather_liquid(pressure, pairs, n_liquid)
    coeff = jnp.where(pairs.liquid,
                      cfg.liquid_volume * (pressure[None, :] + p_j),
                      jnp.where(pairs.solid,
                                cfg.solid_volume * pressure[None, :], 0.0))
    return -jnp.sum((coeff * gs)[None] * r_star, axis=1)


def _predicted_density(pos_star_l, pos, pairs, cfg, n_liquid):
    r_star, dist = _star_geometry(pos_star_l, pos, pairs, cfg, n_liquid)
    w = jnp.where(pairs.mask,
                  kernels.cubic_w_scalar(dist, cfg.support_radius), 0.0)
    vj = ops.pair_volume(pairs, cfg)
    adv = cfg.liquid_volume * kernels.cubic_w0(cfg.support_radius) \
        + jnp.sum(vj * w, axis=0)
    return jnp.maximum(adv, 1.0)     # normalized, clamped (pcisph.py:254)


def step(state: FluidState, cfg: SimConfig) -> FluidState:
    nl = state.n_liquid
    dt = state.dt
    coff = pci_coefficient(cfg.particle_radius)
    nbr = build_neighbors(state.pos, nl, cfg)
    pairs = ops.precompute_pairs(state.pos, nbr, nl, cfg)

    # non-pressure forces + density (pcisph.py:199-218)
    rho = ops.density(pairs, cfg)
    gravity = jnp.asarray(cfg.gravity, jnp.float32).reshape(3, 1)
    d_vel = gravity + ops.explicit_viscosity_accel(pairs, state.vel, rho, cfg, nl)

    pos_l = state.pos[:, :nl]
    zero3 = jnp.zeros_like(state.vel)

    def body(carry):
        d_vel_pre, pressure, err, it = carry
        vel_star = state.vel + (d_vel + d_vel_pre) * dt      # pcisph.py:228-235
        pos_star = pos_l + vel_star * dt
        adv = _predicted_density(pos_star, state.pos, pairs, cfg, nl)
        pressure = pressure + coff * (adv - 1.0) / (dt * dt)  # pcisph.py:255
        d_vel_pre = _pressure_accel(pos_star, state.pos, pairs, pressure, cfg, nl)
        err = jnp.sum(adv - 1.0) / float(nl)
        return d_vel_pre, pressure, err, it + 1

    def cond(carry):
        *_, err, it = carry
        return ((err > cfg.pcisph_tol) | (it < cfg.pcisph_min_iters)) \
            & (it < cfg.pcisph_max_iters)

    d_vel_pre, pressure, err, iters = jax.lax.while_loop(
        cond, body, (zero3, jnp.zeros((nl,), jnp.float32),
                     jnp.float32(1.0), jnp.int32(0)))

    vel = state.vel + (d_vel + d_vel_pre) * dt               # pcisph.py:281-285
    pos = state.pos.at[:, :nl].add(vel * dt)

    diag = StepDiagnostics(
        pressure_iters=iters,
        density_error=err,
        neighbor_overflow=nbr.overflow,
        vel_max=jnp.sqrt(jnp.max(ops.dot3(vel, vel))),
    )
    return state.replace(pos=pos, vel=vel, pressure=pressure,
                         time=state.time + dt, diag=diag)
