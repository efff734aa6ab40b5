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

    # -- half-window machinery (Newton's-third-law symmetry) -------------
    # The 26 nonzero offsets come in +-13 pairs whose pair geometry is
    # identical up to r -> -r.  Hot ops evaluate each pair ONCE (scan over
    # the 13 positive offsets) and scatter BOTH sides: the home contribution
    # plus the mirrored contribution shifted back to the neighbor cell.
    # The o = 0 block (same-cell pairs) already contains both directions.

    def _half_offsets(self):
        """The 13 positive offsets plus the zero offset (first)."""
        lins, d3s = [0], [(0, 0, 0)]
        for off in _OFFSETS:
            lin = linear_offset(off, self.cfg)
            if lin > 0:
                lins.append(lin)
                d3s.append(off)
        return (jnp.asarray(lins, jnp.int32),
                jnp.asarray(np.asarray(d3s, np.int32)))

    def scan_sym(self, fn, init):
        """fn(carry, win, loop, mgate) over {0} + the 13 positive offsets.

        ``mgate`` is a traced 0.0/1.0 factor for the mirror contributions:
        the zero-offset block already contains both pair directions, so its
        mirror side is gated off.  One traced body serves all 14 offsets.
        """
        lins, d3s = self._half_offsets()

        def body(carry, oin):
            lin, d3 = oin
            mgate = (lin > 0).astype(jnp.float32)
            return fn(carry, self._make_win(lin, d3), self, mgate), None

        carry, _ = jax.lax.scan(body, init, (lins, d3s))
        return carry

    def shift_out(self, arr: jnp.ndarray, lin) -> jnp.ndarray:
        """Scatter-back shift for mirror contributions:
        out[..., c] = arr[..., c - lin] (zero fill)."""
        w = self.pad_w
        nc = self.cfg.num_cells
        z = jnp.zeros(arr.shape[:-1] + (w,), arr.dtype)
        padded = jnp.concatenate([z, arr, z], axis=-1)
        start = (0,) * (arr.ndim - 1) + (w - lin,)
        return jax.lax.dynamic_slice(padded, start, arr.shape[:-1] + (nc,))

    def vol_home(self) -> jnp.ndarray:
        """(C, 1, NC) particle volume of the home slot (0 when empty)."""
        cfg = self.cfg
        v = jnp.where(self.grid.liquid, cfg.liquid_volume,
                      jnp.where(self.grid.valid, cfg.solid_volume, 0.0))
        return v[:, None, :]

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


def _pt(cfg: SimConfig):
    """Pair-math dtype (cfg.pair_dtype experiment; geometry stays f32)."""
    return jnp.bfloat16 if cfg.pair_dtype == "bfloat16" else jnp.float32


def _fsum(x, axis):
    """Reduce a (possibly bf16) pair array with a float32 accumulator."""
    return jnp.sum(x, axis=axis, dtype=jnp.float32)


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
    """Fused density + DFSPH alpha + neighbor count, half-window symmetric:
    W, |gradW|^2 and the pair mask are direction-independent; the gradW sum
    flips sign on the mirror side."""
    loop = WindowLoop(grid, cfg)
    v_home = loop.vol_home()                           # (C, 1, NC)
    liq_home = grid.liquid[:, None, :]

    pt = _pt(cfg)

    def fn(carry, w, lp, mg):
        rho_acc, count, sg, sq = carry
        vj = _vol_j(w, cfg).astype(pt)
        wk = _masked_w(w, cfg).astype(pt)
        vh = v_home.astype(pt)
        rho_acc = rho_acc + _fsum(vj * wk, axis=1) \
            + lp.shift_out(mg * _fsum(vh * wk, axis=0), w.lin)
        count = count + jnp.sum(w.mask, axis=1) \
            + lp.shift_out((mg * jnp.sum(w.mask, axis=0)).astype(jnp.int32),
                           w.lin)
        if with_alpha:
            gs = _masked_gs(w, cfg).astype(pt)
            vh_gs = vh * gs
            sg = sg + jnp.stack([
                _fsum(vj * gs * lp.rij(w, c).astype(pt), axis=1)
                - lp.shift_out(
                    mg * _fsum(vh_gs * lp.rij(w, c).astype(pt), axis=0),
                    w.lin)
                for c in range(3)])
            liq_c2 = jnp.where(w.liq_j, (cfg.liquid_volume * gs) ** 2,
                               jnp.zeros((), pt))
            liq_h2 = jnp.where(liq_home, (cfg.liquid_volume * gs) ** 2,
                               jnp.zeros((), pt))
            d2 = w.dist2.astype(pt)
            sq = sq + _fsum(liq_c2 * d2, axis=1) \
                + lp.shift_out(mg * _fsum(liq_h2 * d2, axis=0), w.lin)
        return rho_acc, count, sg, sq

    cap, nc = grid.pid.shape
    init = (_zeros(grid), jnp.zeros((cap, nc), jnp.int32), _zeros(grid, 3),
            _zeros(grid))
    rho_acc, count, sg, sq = loop.scan_sym(fn, init)
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

def _div_accum(grid, cfg, velp):
    """Half-window core of drho/adv_rho: sum_j V_j gs (v_i - v_j).r_ij.
    The pair term gs * (v_i - v_j).r is fully symmetric (double sign flip on
    the mirror side); only the volume factor swaps i<->j.  Solid velocities
    are zero in the liquid-packed velp, matching the reference's branches.

    (The Mosaic twin lives in pallas/engine.py; solvers dispatch to it via
    comm.engine when cfg.use_pallas is set.)"""
    loop = WindowLoop(grid, cfg)
    vel_pad = loop.pad(velp, 0.0)
    v_home = loop.vol_home()
    pt = _pt(cfg)

    def fn(acc, w, lp, mg):
        gs = _masked_gs(w, cfg).astype(pt)
        f = gs * lp.delta_dot_r(w, velp, vel_pad).astype(pt)
        return acc + _fsum(_vol_j(w, cfg).astype(pt) * f, axis=1) \
            + lp.shift_out(mg * _fsum(v_home.astype(pt) * f, axis=0), w.lin)

    return loop.scan_sym(fn, _zeros(grid))


def drho_divergence(grid, cfg, velp, countp):
    drho = jnp.maximum(_div_accum(grid, cfg, velp), 0.0)
    return jnp.where(countp < cfg.min_div_neighbors, 0.0, drho)


def advected_density(grid, cfg, velp, rhop, dt):
    acc = _div_accum(grid, cfg, velp)
    return jnp.maximum(rhop / cfg.rest_density + dt * acc, 1.0)


def kappa_velocity_update(grid, cfg, velp, kp, dt):
    """vel += dt * sum_j V_j (k_i + k_j) gradW, k_j = 0 for boundary.

    Half-window: F = (k_i + k_j) gs r_ij is shared; the home side scales by
    V_j, the mirror side by -V_i.  kp is liquid-packed (zero at solid/empty
    slots) so the reference's liquid/solid k_j branches collapse.

    (The Mosaic twin lives in pallas/engine.py; solvers dispatch to it via
    comm.engine when cfg.use_pallas is set.)"""
    loop = WindowLoop(grid, cfg)
    k_pad = loop.pad(kp, 0.0)
    ki = kp[:, None, :]
    v_home = loop.vol_home()
    pt = _pt(cfg)

    def fn(acc, w, lp, mg):
        gs = _masked_gs(w, cfg).astype(pt)
        ksum_gs = (ki + lp.shift(k_pad, w.lin)[None]).astype(pt) * gs
        vj = _vol_j(w, cfg).astype(pt)
        vh = v_home.astype(pt)
        parts = []
        for c in range(3):
            f = ksum_gs * lp.rij(w, c).astype(pt)
            parts.append(_fsum(vj * f, axis=1)
                         - lp.shift_out(mg * _fsum(vh * f, axis=0),
                                        w.lin))
        return acc + jnp.stack(parts)

    acc = loop.scan_sym(fn, _zeros(grid, 3))
    # liquid-masked: boundary slots keep velocity 0 exactly (the reference
    # only loops i over liquid, dfsph.py:449-477)
    return velp + jnp.where(grid.liquid[None], dt * acc, 0.0)


# ---------------------------------------------------------------------------
# Implicit viscosity (PCG pieces)
# ---------------------------------------------------------------------------

def _visc_coeffs(w: Win, lp: WindowLoop, cfg, rhop, rho_pad, liq_home, sol_home):
    """(coeff_ij, coeff_ji): the Weiler viscosity pair coefficient seen from
    the home side and from the neighbor side (dfsph.py:182-195):
      liquid partner: dim nu m / rho_partner ; solid partner:
      dim nu_b rho0 VS0 / rho_self — both over (|r|^2 + 0.01 h^2)."""
    h = cfg.support_radius
    denom = w.dist2 + 0.01 * h * h
    a_liq = cfg.dim_coff * cfg.viscosity * cfg.liquid_mass
    b_sol = cfg.dim_coff * cfg.viscosity_b * cfg.rest_density * cfg.solid_volume
    rho_i = jnp.maximum(rhop, 1.0)[:, None, :]
    rho_j = jnp.maximum(lp.shift(rho_pad, w.lin), 1.0)[None]
    c_ij = jnp.where(w.liq_j, a_liq / rho_j,
                     jnp.where(w.sol_j, b_sol / rho_i, 0.0)) / denom
    c_ji = jnp.where(liq_home, a_liq / rho_i,
                     jnp.where(sol_home, b_sol / rho_j, 0.0)) / denom
    return c_ij, c_ji


def visc_matvec(grid, cfg, xv, rhop, rho_pad, dt):
    """A x = x - dt/rho_i sum_j c_j (x_i - x_j).r gradW  (dfsph.py:181-195).
    Half-window: gs (x_i - x_j).r is symmetric; only the coefficient and the
    sign of r swap on the mirror side.

    (The Mosaic twin is pallas.engine._ViscAcc; solvers dispatch to it via
    comm.engine when cfg.use_pallas is set.)"""
    loop = WindowLoop(grid, cfg)
    x_pad = loop.pad(xv, 0.0)
    liq_home = grid.liquid[:, None, :]
    sol_home = (grid.valid & ~grid.liquid)[:, None, :]

    def fn(acc, w, lp, mg):
        c_ij, c_ji = _visc_coeffs(w, lp, cfg, rhop, rho_pad, liq_home, sol_home)
        gs_dx = _masked_gs(w, cfg) * lp.delta_dot_r(w, xv, x_pad)
        parts = []
        for c in range(3):
            rc = lp.rij(w, c)
            parts.append(jnp.sum(c_ij * gs_dx * rc, axis=1)
                         - lp.shift_out(
                             mg * jnp.sum(c_ji * gs_dx * rc, axis=0), w.lin))
        return acc + jnp.stack(parts)

    acc = loop.scan_sym(fn, _zeros(grid, 3))
    return xv - acc * (dt / jnp.maximum(rhop, 1.0))[None]


def visc_precond(grid, cfg, rhop, rho_pad, dt) -> mat3.Sym3:
    """Block-Jacobi inverse; gradW ⊗ r = gs r ⊗ r is symmetric (both in the
    matrix sense and under the pair flip)."""
    loop = WindowLoop(grid, cfg)
    liq_home = grid.liquid[:, None, :]
    sol_home = (grid.valid & ~grid.liquid)[:, None, :]

    def fn(carry, w, lp, mg):
        c_ij, c_ji = _visc_coeffs(w, lp, cfg, rhop, rho_pad, liq_home, sol_home)
        gs = _masked_gs(w, cfg)
        cg = c_ij * gs
        cg_m = c_ji * gs
        r = [lp.rij(w, c) for c in range(3)]
        out = []
        for (a, b) in ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)):
            rr = r[a] * r[b]
            out.append(jnp.sum(cg * rr, axis=1)
                       + lp.shift_out(mg * jnp.sum(cg_m * rr, axis=0), w.lin))
        return mat3.Sym3(*[c0 + t for c0, t in zip(carry, out)])

    init = mat3.Sym3(*[_zeros(grid) for _ in range(6)])
    m = loop.scan_sym(fn, init)
    a = mat3.sym3_identity_minus(m, dt / jnp.maximum(rhop, 1.0))
    return mat3.sym3_inverse(a)


def visc_init(grid, cfg, x0, rhop, rho_pad, dt):
    """Fused PCG setup: ONE window scan computes both the block-Jacobi
    preconditioner sums and the warm-start matvec A x0 (they share the pair
    coefficient and geometry).  Returns (Minv: Sym3, A x0: (3, C, NC))."""
    loop = WindowLoop(grid, cfg)
    x_pad = loop.pad(x0, 0.0)
    liq_home = grid.liquid[:, None, :]
    sol_home = (grid.valid & ~grid.liquid)[:, None, :]

    def fn(carry, w, lp, mg):
        msum, acc = carry
        c_ij, c_ji = _visc_coeffs(w, lp, cfg, rhop, rho_pad, liq_home, sol_home)
        gs = _masked_gs(w, cfg)
        cg, cg_m = c_ij * gs, c_ji * gs
        gs_dx = gs * lp.delta_dot_r(w, x0, x_pad)
        r = [lp.rij(w, c) for c in range(3)]
        mout = []
        for (a, b) in ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2)):
            rr = r[a] * r[b]
            mout.append(jnp.sum(cg * rr, axis=1)
                        + lp.shift_out(mg * jnp.sum(cg_m * rr, axis=0), w.lin))
        parts = []
        for c in range(3):
            parts.append(jnp.sum(c_ij * gs_dx * r[c], axis=1)
                         - lp.shift_out(
                             mg * jnp.sum(c_ji * gs_dx * r[c], axis=0), w.lin))
        return (mat3.Sym3(*[c0 + t for c0, t in zip(msum, mout)]),
                acc + jnp.stack(parts))

    init = (mat3.Sym3(*[_zeros(grid) for _ in range(6)]), _zeros(grid, 3))
    m, acc = loop.scan_sym(fn, init)
    a = mat3.sym3_identity_minus(m, dt / jnp.maximum(rhop, 1.0))
    ax0 = x0 - acc * (dt / jnp.maximum(rhop, 1.0))[None]
    return mat3.sym3_inverse(a), ax0


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
    """Returns (d_vel (3,C,NC), new omega (3,C,NC)).

    Half-window symmetric: the cross products cross(Δω, r) gs and
    cross(Δv, r) gs are invariant under the pair flip (double sign change),
    so only the per-side coefficients (1/rho, partner-mass, liquid gates)
    differ between the home and mirror contributions."""
    rho0 = cfg.rest_density
    m = cfg.liquid_mass
    c_vo = cfg.vorticity_coff
    c_in = cfg.vorticity_init
    loop = WindowLoop(grid, cfg)
    vel_pad = loop.pad(velp, 0.0)
    om_pad = loop.pad(omegap, 0.0)
    rho_pad = loop.pad(rhop, 1.0)
    inv_rho_i = (1.0 / jnp.maximum(rhop, 1.0))[:, None, :]
    liq_i = grid.liquid[:, None, :]
    sol_i = (grid.valid & ~grid.liquid)[:, None, :]
    mass_like_i = jnp.where(liq_i, m, jnp.where(sol_i, rho0 * cfg.solid_volume, 0.0))
    stretch_mass_i = jnp.where(liq_i, m, jnp.where(sol_i, rho0 * cfg.liquid_volume, 0.0))

    def fn(carry, w, lp, mg):
        dv, dom = carry
        gs = _masked_gs(w, cfg)
        wker = _masked_w(w, cfg)
        rho_j = jnp.maximum(lp.shift(rho_pad, w.lin), 1.0)[None]
        inv_rho_j = 1.0 / rho_j
        om_n = [lp.shift(om_pad[c], w.lin)[None] for c in range(3)]
        d_om = [omegap[c][:, None, :] - jnp.where(w.liq_j, om_n[c], 0.0)
                for c in range(3)]
        d_ve = [velp[c][:, None, :] - jnp.where(
            w.liq_j, lp.shift(vel_pad[c], w.lin)[None], 0.0) for c in range(3)]
        r = [lp.rij(w, c) for c in range(3)]
        mass_like_j = jnp.where(w.liq_j, m,
                                jnp.where(w.sol_j, rho0 * cfg.solid_volume, 0.0))
        stretch_mass_j = jnp.where(w.liq_j, m,
                                   jnp.where(w.sol_j, rho0 * cfg.liquid_volume, 0.0))
        t_base = (-1.0 / dt) * c_in * cfg.viscosity_omega * m * wker
        transfer_h = jnp.where(w.liq_j, t_base * inv_rho_j, 0.0)
        transfer_m = jnp.where(liq_i, t_base * inv_rho_i, 0.0) * mg
        cnt_j = jnp.sum(w.mask, axis=1)           # (C, NC) pairs per home
        cnt_i = jnp.sum(w.mask, axis=0)           # pairs per neighbor slot
        dv_new, dom_new = [], []
        for c in range(3):
            c0, c1 = (c + 1) % 3, (c + 2) % 3
            cr_o = (d_om[c0] * r[c1] - d_om[c1] * r[c0]) * gs
            cr_v = (d_ve[c0] * r[c1] - d_ve[c1] * r[c0]) * gs
            dvc = jnp.sum(c_vo * inv_rho_i * mass_like_j * cr_o, axis=1) \
                + lp.shift_out(mg * jnp.sum(
                    c_vo * inv_rho_j * mass_like_i * cr_o, axis=0), w.lin)
            damp = -2.0 * c_in * c_vo
            domc = jnp.sum(transfer_h * d_om[c]
                           + c_vo * c_in * inv_rho_i * stretch_mass_j * cr_v,
                           axis=1) \
                + damp * omegap[c] * cnt_j \
                + lp.shift_out(
                    mg * (jnp.sum(-transfer_m * d_om[c]
                                  + c_vo * c_in * inv_rho_j * stretch_mass_i
                                  * cr_v, axis=0)
                          + damp * lp.shift(om_pad[c], w.lin) * cnt_i),
                    w.lin)
            dv_new.append(dv[c] + dvc)
            dom_new.append(dom[c] + domc)
        return jnp.stack(dv_new), jnp.stack(dom_new)

    dv, dom = loop.scan_sym(fn, (_zeros(grid, 3), _zeros(grid, 3)))
    return dv, omegap + dom * dt


def vorticity_comm(comm, velp, omegap, rhop, dt):
    """Comm-parameterized vorticity (single-device or slab-sharded)."""
    dv, om = vorticity(comm.grid, comm.cfg, comm.lift(velp),
                       comm.lift(omegap), comm.lift(rhop, 1.0), dt)
    return comm.lower(dv), comm.lower(om)


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
