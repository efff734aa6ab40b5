"""SPH sweeps on the cell-dense packed layout (grid.py) — the hot path.

Each op is one ``lax.scan`` over the 27 window shifts, doing dense
(C, C, NC) vector math per shift: axis 0 = home slot, axis 1 = neighbor
slot, axis 2 = cell (128-lane minor dim).  No gathers anywhere.  Neighbor
views are dynamic slices of once-padded arrays, so the traced graph contains
ONE window body instead of 27 unrolled copies (27x smaller compile).

r_ij components are formed on demand so (3, C, C, NC) temporaries never
materialize.  Op-for-op parity with the reference kernels is documented in
ops.py (the gather-based twin used for differential tests); reference
file:line citations live there.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from . import kernels
from .config import SimConfig
from .grid import DenseGrid, EMPTY_POS, _OFFSETS, linear_offset
from .utils import mat3


class Win(NamedTuple):
    """One shifted neighbor view (all leaves traced inside the scan body)."""

    lin: jnp.ndarray          # scalar linear offset
    xn: jnp.ndarray           # (3, C, NC) shifted neighbor positions
    liq_j: jnp.ndarray        # (1, C, NC)
    sol_j: jnp.ndarray        # (1, C, NC)
    dist2: jnp.ndarray        # (C, C, NC)
    mask: jnp.ndarray         # (C, C, NC) distance-culled valid pairs


class WindowLoop:
    """Scan machinery for the 27-cell window sweep.

    Build once per sweep (cheap: pads a few arrays), then ``scan(fn, init)``
    runs fn(carry, win, loop) over the 27 shifts.
    """

    def __init__(self, grid: DenseGrid, cfg: SimConfig, xp=None):
        self.grid = grid
        self.cfg = cfg
        self.xp = grid.xp if xp is None else xp
        gx, gy, gz = cfg.grid_res
        self.pad_w = gy * gz + gz + 1          # max |linear offset|
        self.lin = jnp.asarray(
            [linear_offset(o, cfg) for o in _OFFSETS], jnp.int32)
        self.d3 = jnp.asarray(np.asarray(_OFFSETS, np.int32))
        self.xp_pad = self.pad(self.xp, EMPTY_POS)
        self.liq_pad = self.pad(grid.liquid, False)
        self.val_pad = self.pad(grid.valid, False)
        nc = cfg.num_cells
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, nc), 1)[0]
        self._cx = idx // (gy * gz)
        self._cy = (idx // gz) % gy
        self._cz = idx % gz
        cap = grid.pid.shape[0]
        self._eye = jnp.asarray(np.eye(cap, dtype=bool)[:, :, None])

    def pad(self, q: jnp.ndarray, fill) -> jnp.ndarray:
        w = self.pad_w
        shape = q.shape[:-1] + (w,)
        p = jnp.full(shape, fill, q.dtype)
        return jnp.concatenate([p, q, p], axis=-1)

    def shift(self, padded_q: jnp.ndarray, lin) -> jnp.ndarray:
        """Neighbor view: out[..., c] = q[..., c + lin]."""
        nc = self.cfg.num_cells
        start = (0,) * (padded_q.ndim - 1) + (self.pad_w + lin,)
        sizes = padded_q.shape[:-1] + (nc,)
        return jax.lax.dynamic_slice(padded_q, start, sizes)

    def _make_win(self, lin, d3) -> Win:
        cfg = self.cfg
        gx, gy, gz = cfg.grid_res
        h2 = cfg.support_radius * cfg.support_radius
        xn = self.shift(self.xp_pad, lin)
        d2 = sum((self.xp[c][:, None, :] - xn[c][None, :, :]) ** 2
                 for c in range(3))
        inbox = ((self._cx + d3[0] >= 0) & (self._cx + d3[0] < gx)
                 & (self._cy + d3[1] >= 0) & (self._cy + d3[1] < gy)
                 & (self._cz + d3[2] >= 0) & (self._cz + d3[2] < gz))
        mask = (d2 <= h2) & inbox[None, None, :]
        mask = mask & ~(self._eye & (lin == 0))
        liq_n = self.shift(self.liq_pad, lin)
        val_n = self.shift(self.val_pad, lin)
        return Win(lin=lin, xn=xn, liq_j=liq_n[None],
                   sol_j=(val_n & ~liq_n)[None], dist2=d2, mask=mask)

    def scan(self, fn, init):
        def body(carry, oin):
            lin, d3 = oin
            return fn(carry, self._make_win(lin, d3), self), None

        carry, _ = jax.lax.scan(body, init, (self.lin, self.d3))
        return carry

    # -- pair helpers (used inside scan bodies) --
    def rij(self, w: Win, c: int):
        return self.xp[c][:, None, :] - w.xn[c][None, :, :]

    def delta_dot_r(self, w: Win, a_self, a_nbr_pad):
        """sum_c (a_self_c - a_nbr_c) r_c -> (C, C, NC); a_nbr_pad is the
        PADDED packed neighbor quantity (or None for zero)."""
        total = 0.0
        for c in range(3):
            av = a_self[c][:, None, :]
            if a_nbr_pad is not None:
                av = av - self.shift(a_nbr_pad[c], w.lin)[None, :, :]
            total = total + av * self.rij(w, c)
        return total

    def accum_r(self, w: Win, coeff, acc):
        """acc_c += sum_nbr coeff * r_c (acc is a (3, C, NC) array)."""
        return acc + jnp.stack(
            [jnp.sum(coeff * self.rij(w, c), axis=1) for c in range(3)])


def _vol_j(w: Win, cfg: SimConfig):
    return jnp.where(w.liq_j, cfg.liquid_volume,
                     jnp.where(w.sol_j, cfg.solid_volume, 0.0))


def _masked_w(w: Win, cfg: SimConfig):
    return jnp.where(w.mask, kernels.cubic_w_scalar(
        jnp.sqrt(jnp.maximum(w.dist2, 0.0)), cfg.support_radius), 0.0)


def _masked_gs(w: Win, cfg: SimConfig):
    return jnp.where(w.mask, kernels.cubic_grad_scale(
        jnp.sqrt(jnp.maximum(w.dist2, 0.0)), cfg.support_radius), 0.0)


def _zeros(grid, n=1):
    cap, nc = grid.pid.shape
    if n == 1:
        return jnp.zeros((cap, nc), jnp.float32)
    return jnp.zeros((n, cap, nc), jnp.float32)


class DensityStats(NamedTuple):
    rho: jnp.ndarray       # (C, NC)
    alpha: jnp.ndarray     # (C, NC) DFSPH factor (zeros if with_alpha=False)
    count: jnp.ndarray     # (C, NC) true neighbor count


def density_stats(grid: DenseGrid, cfg: SimConfig, with_alpha: bool) -> DensityStats:
    """Fused density + DFSPH alpha + neighbor count in ONE window scan."""
    loop = WindowLoop(grid, cfg)

    def fn(carry, w, lp):
        rho_acc, count, sg, sq = carry
        vj = _vol_j(w, cfg)
        rho_acc = rho_acc + jnp.sum(vj * _masked_w(w, cfg), axis=1)
        count = count + jnp.sum(w.mask, axis=1)
        if with_alpha:
            gs = _masked_gs(w, cfg)
            sg = lp.accum_r(w, vj * gs, sg)
            liq_c = jnp.where(w.liq_j, cfg.liquid_volume * gs, 0.0)
            sq = sq + jnp.sum(liq_c * liq_c * w.dist2, axis=1)
        return rho_acc, count, sg, sq

    cap, nc = grid.pid.shape
    rho_acc, count, sg, sq = loop.scan(
        fn, (_zeros(grid), jnp.zeros((cap, nc), jnp.int32), _zeros(grid, 3),
             _zeros(grid)))
    w0 = cfg.liquid_volume * kernels.cubic_w0(cfg.support_radius)
    rho = cfg.rest_density * (w0 + rho_acc)
    if with_alpha:
        denom = sq + jnp.sum(sg * sg, axis=0)
        alpha = jnp.where(denom > cfg.eps, -1.0 / denom, 0.0)
    else:
        alpha = _zeros(grid)
    return DensityStats(rho=rho, alpha=alpha, count=count)


# ---------------------------------------------------------------------------
# Explicit forces (SESPH / PCISPH)
# ---------------------------------------------------------------------------

def explicit_viscosity_accel(grid, cfg, velp, rhop):
    loop = WindowLoop(grid, cfg)
    h = cfg.support_radius
    vel_pad = loop.pad(velp, 0.0)
    rho_pad = loop.pad(rhop, 1.0)

    def fn(acc, w, lp):
        denom = w.dist2 + 0.01 * h * h
        gs = _masked_gs(w, cfg)
        rho_j = lp.shift(rho_pad, w.lin)[None]
        dv_dot = lp.delta_dot_r(w, velp, vel_pad)
        liq = (cfg.dim_coff * cfg.explicit_viscosity * cfg.liquid_mass
               * jnp.where(w.liq_j, dv_dot / jnp.maximum(rho_j, 1.0) / denom, 0.0))
        v_dot = lp.delta_dot_r(w, velp, None)
        sol = (cfg.dim_coff * cfg.explicit_viscosity_b * cfg.solid_volume
               * (rhop / cfg.rest_density)[:, None, :]
               * jnp.where(w.sol_j, v_dot / denom, 0.0))
        return lp.accum_r(w, (liq + sol) * gs, acc)

    return loop.scan(fn, _zeros(grid, 3))


def pressure_accel_symmetric(grid, cfg, rhop, pp):
    loop = WindowLoop(grid, cfg)
    rho0 = cfg.rest_density
    pi_term = (pp / jnp.maximum(rhop * rhop, 1.0))[:, None, :]
    rho_pad = loop.pad(rhop, 1.0)
    p_pad = loop.pad(pp, 0.0)

    def fn(acc, w, lp):
        gs = _masked_gs(w, cfg)
        rho_j = lp.shift(rho_pad, w.lin)[None]
        p_j = lp.shift(p_pad, w.lin)[None]
        liq = cfg.liquid_volume * jnp.where(
            w.liq_j, pi_term + p_j / jnp.maximum(rho_j * rho_j, 1.0), 0.0)
        sol = cfg.solid_volume * jnp.where(
            w.sol_j, pi_term + pp[:, None, :] / (rho0 * rho0), 0.0)
        return lp.accum_r(w, -rho0 * (liq + sol) * gs, acc)

    return loop.scan(fn, _zeros(grid, 3))


# ---------------------------------------------------------------------------
# DFSPH
# ---------------------------------------------------------------------------

def drho_divergence(grid, cfg, velp, countp):
    loop = WindowLoop(grid, cfg)
    vel_pad = loop.pad(velp, 0.0)

    def fn(acc, w, lp):
        gs = _masked_gs(w, cfg)
        vj = jnp.where(w.liq_j | w.sol_j, _vol_j(w, cfg), 0.0)
        dv_dot = lp.delta_dot_r(w, velp, vel_pad)
        return acc + jnp.sum(vj * gs * dv_dot, axis=1)

    acc = loop.scan(fn, _zeros(grid))
    drho = jnp.maximum(acc, 0.0)
    return jnp.where(countp < cfg.min_div_neighbors, 0.0, drho)


def advected_density(grid, cfg, velp, rhop, dt):
    loop = WindowLoop(grid, cfg)
    vel_pad = loop.pad(velp, 0.0)

    def fn(acc, w, lp):
        gs = _masked_gs(w, cfg)
        vj = _vol_j(w, cfg)
        dv_dot = lp.delta_dot_r(w, velp, vel_pad)
        return acc + jnp.sum(vj * gs * dv_dot, axis=1)

    acc = loop.scan(fn, _zeros(grid))
    return jnp.maximum(rhop / cfg.rest_density + dt * acc, 1.0)


def kappa_velocity_update(grid, cfg, velp, kp, dt):
    """vel += dt * sum_j V_j (k_i + k_j) gradW, k_j = 0 for boundary."""
    loop = WindowLoop(grid, cfg)
    k_pad = loop.pad(kp, 0.0)
    ki = kp[:, None, :]

    def fn(acc, w, lp):
        gs = _masked_gs(w, cfg)
        k_j = jnp.where(w.liq_j, lp.shift(k_pad, w.lin)[None], 0.0)
        ksum = jnp.where(w.liq_j, ki + k_j, jnp.where(w.sol_j, ki, 0.0))
        return lp.accum_r(w, _vol_j(w, cfg) * ksum * gs, acc)

    return velp + dt * loop.scan(fn, _zeros(grid, 3))


# ---------------------------------------------------------------------------
# Implicit viscosity (PCG pieces)
# ---------------------------------------------------------------------------

def _visc_coeff(w: Win, lp: WindowLoop, cfg, rhop, rho_pad):
    h = cfg.support_radius
    denom = w.dist2 + 0.01 * h * h
    rho_j = lp.shift(rho_pad, w.lin)[None]
    liq = cfg.dim_coff * cfg.viscosity * cfg.liquid_mass / jnp.maximum(rho_j, 1.0)
    sol = (cfg.dim_coff * cfg.viscosity_b * cfg.rest_density
           / jnp.maximum(rhop, 1.0)[:, None, :] * cfg.solid_volume)
    return jnp.where(w.liq_j, liq, jnp.where(w.sol_j, sol, 0.0)) / denom


def visc_matvec(grid, cfg, xv, rhop, rho_pad, dt):
    """A x = x - dt/rho_i sum_j c_j (x_i - x_j).r gradW  (dfsph.py:181-195)."""
    loop = WindowLoop(grid, cfg)
    x_pad = loop.pad(xv, 0.0)

    def fn(acc, w, lp):
        coeff = _visc_coeff(w, lp, cfg, rhop, rho_pad)
        gs = _masked_gs(w, cfg)
        dx_dot = lp.delta_dot_r(w, xv, x_pad)
        return lp.accum_r(w, coeff * dx_dot * gs, acc)

    acc = loop.scan(fn, _zeros(grid, 3))
    return xv - acc * (dt / jnp.maximum(rhop, 1.0))[None]


def visc_precond(grid, cfg, rhop, rho_pad, dt) -> mat3.Sym3:
    """Block-Jacobi inverse; gradW ⊗ r = gs r ⊗ r is symmetric."""
    loop = WindowLoop(grid, cfg)

    def fn(carry, w, lp):
        coeff = _visc_coeff(w, lp, cfg, rhop, rho_pad)
        cg = coeff * _masked_gs(w, cfg)
        r = [lp.rij(w, c) for c in range(3)]
        return mat3.Sym3(
            xx=carry.xx + jnp.sum(cg * r[0] * r[0], axis=1),
            xy=carry.xy + jnp.sum(cg * r[0] * r[1], axis=1),
            xz=carry.xz + jnp.sum(cg * r[0] * r[2], axis=1),
            yy=carry.yy + jnp.sum(cg * r[1] * r[1], axis=1),
            yz=carry.yz + jnp.sum(cg * r[1] * r[2], axis=1),
            zz=carry.zz + jnp.sum(cg * r[2] * r[2], axis=1),
        )

    m = loop.scan(fn, mat3.Sym3(*[_zeros(grid) for _ in range(6)]))
    a = mat3.sym3_identity_minus(m, dt / jnp.maximum(rhop, 1.0))
    return mat3.sym3_inverse(a)


# ---------------------------------------------------------------------------
# Surface tension + adhesion (Akinci 2013)
# ---------------------------------------------------------------------------

def surface_normals(grid, cfg, rhop):
    loop = WindowLoop(grid, cfg)
    rho_pad = loop.pad(rhop, 1.0)

    def fn(acc, w, lp):
        gs = _masked_gs(w, cfg)
        rho_j = lp.shift(rho_pad, w.lin)[None]
        coeff = jnp.where(w.liq_j, cfg.liquid_mass / jnp.maximum(rho_j, 1.0),
                          0.0) * gs
        return lp.accum_r(w, coeff, acc)

    return cfg.support_radius * loop.scan(fn, _zeros(grid, 3))


def tension_accel(grid, cfg, rhop, normalp):
    h = cfg.support_radius
    loop = WindowLoop(grid, cfg)
    rho_pad = loop.pad(rhop, 1.0)
    n_pad = loop.pad(normalp, 0.0)
    centre = np.asarray(cfg.adhesion_center, np.float32)

    def fn(acc, w, lp):
        dist = jnp.sqrt(jnp.maximum(w.dist2, 1e-12))
        inv_dist = 1.0 / jnp.maximum(dist, cfg.eps)
        rho_j = lp.shift(rho_pad, w.lin)[None]
        k_ij = 2.0 * cfg.rest_density / jnp.maximum(rhop[:, None, :] + rho_j, 1.0)
        w_coh = jnp.where(w.mask, kernels.cohesion_w_scalar(dist, h), 0.0)
        gate = jnp.where(w.mask & w.liq_j & (w.dist2 > cfg.eps), k_ij, 0.0)
        coh = -cfg.tension_coff * cfg.liquid_mass * w_coh * inv_dist * gate

        d_c = sum((w.xn[c] - centre[c]) ** 2 for c in range(3))[None]
        sol_gate = w.sol_j & (d_c < cfg.adhesion_radius ** 2) & w.mask \
            & (w.dist2 > cfg.eps)
        w_adh = jnp.where(w.mask, kernels.adhesion_w_scalar(dist, h), 0.0)
        adh = jnp.where(sol_gate, -cfg.tension_coff_b * cfg.rest_density
                        * cfg.solid_volume * w_adh * inv_dist, 0.0)
        acc = lp.accum_r(w, coh + adh, acc)
        # curvature term: -gamma k_ij (n_i - n_j), not along r
        curv = jnp.stack([
            jnp.sum(gate * -cfg.tension_coff
                    * (normalp[c][:, None, :]
                       - lp.shift(n_pad[c], w.lin)[None]), axis=1)
            for c in range(3)])
        return acc + curv

    return loop.scan(fn, _zeros(grid, 3))


# ---------------------------------------------------------------------------
# Micropolar vorticity
# ---------------------------------------------------------------------------

def vorticity(grid, cfg, velp, omegap, rhop, dt):
    """Returns (d_vel (3,C,NC), new omega (3,C,NC))."""
    rho0 = cfg.rest_density
    m = cfg.liquid_mass
    loop = WindowLoop(grid, cfg)
    vel_pad = loop.pad(velp, 0.0)
    om_pad = loop.pad(omegap, 0.0)
    rho_pad = loop.pad(rhop, 1.0)
    inv_rho_i = (1.0 / jnp.maximum(rhop, 1.0))[:, None, :]

    def fn(carry, w, lp):
        dv, dom = carry
        gs = _masked_gs(w, cfg)
        wker = _masked_w(w, cfg)
        rho_j = lp.shift(rho_pad, w.lin)[None]
        d_om = [omegap[c][:, None, :] - jnp.where(
            w.liq_j, lp.shift(om_pad[c], w.lin)[None], 0.0) for c in range(3)]
        d_ve = [velp[c][:, None, :] - jnp.where(
            w.liq_j, lp.shift(vel_pad[c], w.lin)[None], 0.0) for c in range(3)]
        r = [lp.rij(w, c) for c in range(3)]
        mass_like = jnp.where(w.liq_j, m,
                              jnp.where(w.sol_j, rho0 * cfg.solid_volume, 0.0))
        stretch_mass = jnp.where(w.liq_j, m,
                                 jnp.where(w.sol_j, rho0 * cfg.liquid_volume, 0.0))
        transfer_c = jnp.where(w.liq_j,
                               (-1.0 / dt) * cfg.vorticity_init
                               * cfg.viscosity_omega
                               * m / jnp.maximum(rho_j, 1.0) * wker, 0.0)
        dv_new, dom_new = [], []
        for c in range(3):
            c0, c1 = (c + 1) % 3, (c + 2) % 3
            cr_o = (d_om[c0] * r[c1] - d_om[c1] * r[c0]) * gs
            cr_v = (d_ve[c0] * r[c1] - d_ve[c1] * r[c0]) * gs
            dv_new.append(dv[c] + jnp.sum(
                cfg.vorticity_coff * inv_rho_i * mass_like * cr_o, axis=1))
            damping = jnp.where(w.mask, -2.0 * cfg.vorticity_init
                                * cfg.vorticity_coff
                                * omegap[c][:, None, :], 0.0)
            dom_new.append(dom[c] + jnp.sum(
                transfer_c * d_om[c]
                + cfg.vorticity_coff * cfg.vorticity_init * inv_rho_i
                * stretch_mass * cr_v + damping, axis=1))
        return jnp.stack(dv_new), jnp.stack(dom_new)

    dv, dom = loop.scan(fn, (_zeros(grid, 3), _zeros(grid, 3)))
    return dv, omegap + dom * dt


# ---------------------------------------------------------------------------
# Debug color field (ParticleData.compute_color_map, ParticleData.py:187-215)
# ---------------------------------------------------------------------------

def color_field(grid, cfg, rhop):
    """Smoothed color function c_i and its normalized gradient (a surface
    indicator).  Returns (color (C,NC), color_grad (3,C,NC))."""
    loop = WindowLoop(grid, cfg)
    rho_pad = loop.pad(rhop, 1.0)
    m = cfg.liquid_mass

    def c_fn(acc, w, lp):
        wk = _masked_w(w, cfg)
        rho_j = lp.shift(rho_pad, w.lin)[None]
        coeff = jnp.where(w.liq_j, m / jnp.maximum(rho_j, 1.0),
                          jnp.where(w.sol_j, cfg.solid_volume, 0.0))
        return acc + jnp.sum(coeff * wk, axis=1)

    color = (m / jnp.maximum(rhop, 1.0)
             * kernels.cubic_w0(cfg.support_radius)
             + loop.scan(c_fn, _zeros(grid)))

    color_pad = loop.pad(color, 0.0)

    def g_fn(acc, w, lp):
        gs = _masked_gs(w, cfg)
        rho_j = lp.shift(rho_pad, w.lin)[None]
        c_j = lp.shift(color_pad, w.lin)[None]
        coeff = jnp.where(w.liq_j,
                          m / jnp.maximum(rho_j, 1.0) * c_j, 0.0) * gs
        return lp.accum_r(w, coeff, acc)

    grad = loop.scan(g_fn, _zeros(grid, 3)) / jnp.maximum(color, 1e-12)[None]
    return color, grad


# ---------------------------------------------------------------------------
# Reductions over liquid slots
# ---------------------------------------------------------------------------

def liquid_sum(grid: DenseGrid, xq: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(jnp.where(grid.liquid, xq, 0.0))


def liquid_max(grid: DenseGrid, xq: jnp.ndarray) -> jnp.ndarray:
    return jnp.max(jnp.where(grid.liquid, xq, -jnp.inf))
