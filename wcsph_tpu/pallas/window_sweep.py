"""Pallas (Mosaic) fused window-sweep kernel for the cell-dense layout.

A hand-written TPU kernel for the hottest sweep shape — the 27-cell window
pass over the packed (C, NC) grid — to compare against the XLA engine
(dense_ops).  The kernel blocks the cell axis; each program DMAs its block
plus a one-x-plane halo from HBM into VMEM once and runs all 27 offsets as
STATIC slices of the VMEM window, fusing the whole sweep into one kernel
with zero intermediate HBM traffic.

Measured on one v5e chip at 100k particles: 3.5 ms vs 2.65 ms for the XLA
symmetric-scan sweep — but this kernel evaluates all 27 offsets (no Newton
mirror, since mirror writes would cross block boundaries), i.e. ~1.9x the
pair work, so its per-pair throughput is ~1.4x the XLA path.  It is kept as
an optional backend and as the foundation for round-2 fused-solver-iteration
kernels (with halo-accumulated mirrors).

Mosaic constraints found while building this (see CLAUDE.md gotchas):
HBM->VMEM DMA slices must be 128-lane aligned (halo width rounded up to a
lane multiple), and the unrolled offset bodies are stack-allocated in VMEM —
the block size bounds the live set (256 cells fits; 2048 OOMs).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import kernels
from ..config import SimConfig
from ..grid import DenseGrid, EMPTY_POS, _OFFSETS, linear_offset


def _plan(cfg: SimConfig, block: int):
    gx, gy, gz = cfg.grid_res
    w = gy * gz + gz + 1
    w = -(-w // 128) * 128      # DMA slices must be 128-lane aligned
    nc = cfg.num_cells
    nb = -(-nc // block) 
    return w, nc, nb


def _pad_cells(a, w, pad_hi, fill):
    cfgless_pad = ((0, 0),) * (a.ndim - 1) + ((w, w + pad_hi),)
    return jnp.pad(a, cfgless_pad, constant_values=fill)


def kappa_update_pallas(grid: DenseGrid, cfg: SimConfig, velp, kp, dt,
                        block: int = 128,
                        interpret: bool = None) -> jnp.ndarray:
    """Pallas twin of dense_ops.kappa_velocity_update — the inner sweep of
    the DFSPH divergence/pressure loops.  All 27 offsets from VMEM; kp must
    be liquid-packed (zeros at solid/empty slots), matching pack_liquid.

    At 1M particles this runs 1.5x faster than the XLA sweep (75 vs 111 ms;
    the XLA path goes HBM-bandwidth-bound on its (C, C, NC) temporaries).
    The 3 accumulators x 27 unrolled bodies demand a small block (128) to fit
    Mosaic's VMEM stack allocation.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    cap = grid.pid.shape[0]
    w, nc, nb = _plan(cfg, block)
    gx, gy, gz = cfg.grid_res
    h = cfg.support_radius
    h2 = h * h
    m_l = 48.0 / (math.pi * h * h * h)
    eps = 1.0e-5
    offsets = [(linear_offset(o, cfg), o) for o in _OFFSETS]

    pad_hi = nb * block - nc
    xp = _pad_cells(grid.xp, w, pad_hi, EMPTY_POS)
    vol = jnp.where(grid.liquid, cfg.liquid_volume,
                    jnp.where(grid.valid, cfg.solid_volume, 0.0))
    vol = _pad_cells(vol, w, pad_hi, 0.0)
    kpad = _pad_cells(kp, w, pad_hi, 0.0)

    win = block + 2 * w

    def kernel(xp_ref, vol_ref, k_ref, out_ref):
        b = pl.program_id(0)
        base = b * block

        def body(xw, vw, kw, sem):
            for ref, dst in ((xp_ref.at[:, :, pl.ds(base, win)], xw),
                             (vol_ref.at[:, pl.ds(base, win)], vw),
                             (k_ref.at[:, pl.ds(base, win)], kw)):
                dma = pltpu.make_async_copy(ref, dst, sem)
                dma.start()
                dma.wait()

            home = [xw[c, :, w:w + block] for c in range(3)]
            ki = kw[:, w:w + block][:, None, :]
            idx = base + jax.lax.broadcasted_iota(
                jnp.int32, (1, block), 1)[0]
            cx = idx // (gy * gz)
            cy = (idx // gz) % gy
            cz = idx % gz

            acc = [jnp.zeros((cap, block), jnp.float32) for _ in range(3)]
            for lin, (dx, dy, dz) in offsets:
                r = [home[c][:, None, :]
                     - xw[c, :, w + lin:w + lin + block][None, :, :]
                     for c in range(3)]
                d2 = r[0] * r[0] + r[1] * r[1] + r[2] * r[2]
                inbox = ((cx + dx >= 0) & (cx + dx < gx)
                         & (cy + dy >= 0) & (cy + dy < gy)
                         & (cz + dz >= 0) & (cz + dz < gz))
                m = (d2 <= h2) & inbox[None, None, :]
                if lin == 0:
                    eye = jax.lax.broadcasted_iota(
                        jnp.int32, (cap, cap, 1), 0) == jax.lax.broadcasted_iota(
                        jnp.int32, (cap, cap, 1), 1)
                    m = m & ~eye
                dist = jnp.sqrt(jnp.maximum(d2, 0.0))
                q = dist / h
                inner = m_l * (3.0 * q - 2.0) / (h * h)
                outer = -m_l * (1.0 - q) * (1.0 - q) / (
                    jnp.maximum(dist, eps) * h)
                gs = jnp.where(q <= 0.5, inner, outer)
                gs = jnp.where(m & (dist > eps), gs, 0.0)
                kj = kw[:, w + lin:w + lin + block][None]
                vj = vw[:, w + lin:w + lin + block][None]
                cfac = vj * (ki + kj) * gs
                for c in range(3):
                    acc[c] = acc[c] + jnp.sum(cfac * r[c], axis=1)
            for c in range(3):
                out_ref[c, :, :] = acc[c]

        pl.run_scoped(
            body,
            xw=pltpu.VMEM((3, cap, win), jnp.float32),
            vw=pltpu.VMEM((cap, win), jnp.float32),
            kw=pltpu.VMEM((cap, win), jnp.float32),
            sem=pltpu.SemaphoreType.DMA(()),
        )

    acc = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 3,
        out_specs=pl.BlockSpec((3, cap, block), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, cap, nb * block), jnp.float32),
        interpret=interpret,
    )(xp, vol, kpad)
    return velp + dt * acc[:, :, :nc]


def div_accum_pallas(grid: DenseGrid, cfg: SimConfig, velp,
                     block: int = 256, interpret: bool = None) -> jnp.ndarray:
    """Pallas twin of dense_ops._div_accum: sum_j V_j gs (v_i - v_j).r_ij —
    the shared core of drho_divergence and advected_density (the other sweep
    inside the DFSPH solver loops).  velp must be liquid-packed."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    cap = grid.pid.shape[0]
    w, nc, nb = _plan(cfg, block)
    gx, gy, gz = cfg.grid_res
    h = cfg.support_radius
    h2 = h * h
    m_l = 48.0 / (math.pi * h * h * h)
    eps = 1.0e-5
    offsets = [(linear_offset(o, cfg), o) for o in _OFFSETS]

    pad_hi = nb * block - nc
    xp = _pad_cells(grid.xp, w, pad_hi, EMPTY_POS)
    vol = jnp.where(grid.liquid, cfg.liquid_volume,
                    jnp.where(grid.valid, cfg.solid_volume, 0.0))
    vol = _pad_cells(vol, w, pad_hi, 0.0)
    vpad = _pad_cells(velp, w, pad_hi, 0.0)

    win = block + 2 * w

    def kernel(xp_ref, vol_ref, v_ref, out_ref):
        b = pl.program_id(0)
        base = b * block

        def body(xw, vw, uw, sem):
            for ref, dst in ((xp_ref.at[:, :, pl.ds(base, win)], xw),
                             (vol_ref.at[:, pl.ds(base, win)], vw),
                             (v_ref.at[:, :, pl.ds(base, win)], uw)):
                dma = pltpu.make_async_copy(ref, dst, sem)
                dma.start()
                dma.wait()

            home = [xw[c, :, w:w + block] for c in range(3)]
            vhome = [uw[c, :, w:w + block] for c in range(3)]
            idx = base + jax.lax.broadcasted_iota(
                jnp.int32, (1, block), 1)[0]
            cx = idx // (gy * gz)
            cy = (idx // gz) % gy
            cz = idx % gz

            acc = jnp.zeros((cap, block), jnp.float32)
            for lin, (dx, dy, dz) in offsets:
                dv_dot = jnp.zeros((cap, cap, block), jnp.float32)
                d2 = jnp.zeros((cap, cap, block), jnp.float32)
                for c in range(3):
                    rc = (home[c][:, None, :]
                          - xw[c, :, w + lin:w + lin + block][None, :, :])
                    d2 = d2 + rc * rc
                    dvc = (vhome[c][:, None, :]
                           - uw[c, :, w + lin:w + lin + block][None, :, :])
                    dv_dot = dv_dot + dvc * rc
                inbox = ((cx + dx >= 0) & (cx + dx < gx)
                         & (cy + dy >= 0) & (cy + dy < gy)
                         & (cz + dz >= 0) & (cz + dz < gz))
                m = (d2 <= h2) & inbox[None, None, :]
                if lin == 0:
                    eye = jax.lax.broadcasted_iota(
                        jnp.int32, (cap, cap, 1), 0) == jax.lax.broadcasted_iota(
                        jnp.int32, (cap, cap, 1), 1)
                    m = m & ~eye
                dist = jnp.sqrt(jnp.maximum(d2, 0.0))
                q = dist / h
                inner = m_l * (3.0 * q - 2.0) / (h * h)
                outer = -m_l * (1.0 - q) * (1.0 - q) / (
                    jnp.maximum(dist, eps) * h)
                gs = jnp.where(q <= 0.5, inner, outer)
                gs = jnp.where(m & (dist > eps), gs, 0.0)
                vj = vw[:, w + lin:w + lin + block][None]
                acc = acc + jnp.sum(vj * gs * dv_dot, axis=1)
            out_ref[:, :] = acc

        pl.run_scoped(
            body,
            xw=pltpu.VMEM((3, cap, win), jnp.float32),
            vw=pltpu.VMEM((cap, win), jnp.float32),
            uw=pltpu.VMEM((3, cap, win), jnp.float32),
            sem=pltpu.SemaphoreType.DMA(()),
        )

    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 3,
        out_specs=pl.BlockSpec((cap, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cap, nb * block), jnp.float32),
        interpret=interpret,
    )(xp, vol, vpad)
    return out[:, :nc]


def visc_acc_pallas(grid: DenseGrid, cfg: SimConfig, xv, rhop,
                    block: int = 128, interpret: bool = None) -> jnp.ndarray:
    """Pallas twin of the viscosity matvec accumulation (dfsph.py:181-195):
    acc_i = sum_j c_j (x_i - x_j).r_ij gs r_ij with
      c_j = dim nu m / rho_j (liquid j) or dim nu_b rho0 VS0 / rho_i (solid),
    over (|r|^2 + 0.01 h^2).  The caller applies x - acc * dt/rho_i.
    xv must be liquid-packed (zeros at solid/empty slots)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    cap = grid.pid.shape[0]
    w, nc, nb = _plan(cfg, block)
    gx, gy, gz = cfg.grid_res
    h = cfg.support_radius
    h2 = h * h
    m_l = 48.0 / (math.pi * h * h * h)
    eps = 1.0e-5
    a_liq = cfg.dim_coff * cfg.viscosity * cfg.liquid_mass
    b_sol = cfg.dim_coff * cfg.viscosity_b * cfg.rest_density * cfg.solid_volume
    offsets = [(linear_offset(o, cfg), o) for o in _OFFSETS]

    pad_hi = nb * block - nc
    xp = _pad_cells(grid.xp, w, pad_hi, EMPTY_POS)
    xvp = _pad_cells(xv, w, pad_hi, 0.0)
    rhp = _pad_cells(jnp.maximum(rhop, 1.0), w, pad_hi, 1.0)
    liq = _pad_cells(grid.liquid.astype(jnp.float32), w, pad_hi, 0.0)
    sol = _pad_cells((grid.valid & ~grid.liquid).astype(jnp.float32),
                     w, pad_hi, 0.0)

    win = block + 2 * w

    def kernel(xp_ref, xv_ref, rh_ref, liq_ref, sol_ref, out_ref):
        b = pl.program_id(0)
        base = b * block

        def body(xw, uw, rw, lw, sw, sem):
            for ref, dst in ((xp_ref.at[:, :, pl.ds(base, win)], xw),
                             (xv_ref.at[:, :, pl.ds(base, win)], uw),
                             (rh_ref.at[:, pl.ds(base, win)], rw),
                             (liq_ref.at[:, pl.ds(base, win)], lw),
                             (sol_ref.at[:, pl.ds(base, win)], sw)):
                dma = pltpu.make_async_copy(ref, dst, sem)
                dma.start()
                dma.wait()

            home = [xw[c, :, w:w + block] for c in range(3)]
            xhome = [uw[c, :, w:w + block] for c in range(3)]
            inv_rho_i = 1.0 / rw[:, w:w + block][:, None, :]
            idx = base + jax.lax.broadcasted_iota(
                jnp.int32, (1, block), 1)[0]
            cx = idx // (gy * gz)
            cy = (idx // gz) % gy
            cz = idx % gz

            acc = [jnp.zeros((cap, block), jnp.float32) for _ in range(3)]
            for lin, (dx, dy, dz) in offsets:
                sl = slice(w + lin, w + lin + block)
                dxr = jnp.zeros((cap, cap, block), jnp.float32)
                d2 = jnp.zeros((cap, cap, block), jnp.float32)
                r = []
                for c in range(3):
                    rc = home[c][:, None, :] - xw[c, :, sl][None, :, :]
                    r.append(rc)
                    d2 = d2 + rc * rc
                    dxr = dxr + (xhome[c][:, None, :]
                                 - uw[c, :, sl][None, :, :]) * rc
                inbox = ((cx + dx >= 0) & (cx + dx < gx)
                         & (cy + dy >= 0) & (cy + dy < gy)
                         & (cz + dz >= 0) & (cz + dz < gz))
                m = (d2 <= h2) & inbox[None, None, :]
                if lin == 0:
                    eye = jax.lax.broadcasted_iota(
                        jnp.int32, (cap, cap, 1), 0) == jax.lax.broadcasted_iota(
                        jnp.int32, (cap, cap, 1), 1)
                    m = m & ~eye
                dist = jnp.sqrt(jnp.maximum(d2, 0.0))
                q = dist / h
                gs = jnp.where(q <= 0.5, m_l * (3.0 * q - 2.0) / (h * h),
                               -m_l * (1.0 - q) * (1.0 - q)
                               / (jnp.maximum(dist, eps) * h))
                gs = jnp.where(m & (dist > eps), gs, 0.0)
                denom = d2 + 0.01 * h2
                coeff = (lw[:, sl][None] * a_liq / rw[:, sl][None]
                         + sw[:, sl][None] * b_sol * inv_rho_i) / denom
                cfac = coeff * dxr * gs
                for c in range(3):
                    acc[c] = acc[c] + jnp.sum(cfac * r[c], axis=1)
            for c in range(3):
                out_ref[c, :, :] = acc[c]

        pl.run_scoped(
            body,
            xw=pltpu.VMEM((3, cap, win), jnp.float32),
            uw=pltpu.VMEM((3, cap, win), jnp.float32),
            rw=pltpu.VMEM((cap, win), jnp.float32),
            lw=pltpu.VMEM((cap, win), jnp.float32),
            sw=pltpu.VMEM((cap, win), jnp.float32),
            sem=pltpu.SemaphoreType.DMA(()),
        )

    acc = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 5,
        out_specs=pl.BlockSpec((3, cap, block), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3, cap, nb * block), jnp.float32),
        interpret=interpret,
    )(xp, xvp, rhp, liq, sol)
    return acc[:, :, :nc]


def density_pallas(grid: DenseGrid, cfg: SimConfig, block: int = 256,
                   interpret: bool = None) -> jnp.ndarray:
    """rho for every packed slot, (C, NC) — pallas twin of
    dense_ops.density_stats(...).rho.

    block: cells per program; 256 keeps the 27 unrolled (C, C, block)
    temporaries within VMEM (Mosaic stack-allocates the unrolled body).
    interpret: force the pallas interpreter (auto-on for CPU backends).
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    cap = grid.pid.shape[0]
    w, nc, nb = _plan(cfg, block)
    gx, gy, gz = cfg.grid_res
    h = cfg.support_radius
    h2 = h * h
    rho0 = cfg.rest_density
    w0 = cfg.liquid_volume * kernels.cubic_w0(h)
    sigma = 8.0 / (math.pi * h * h * h)
    offsets = [(linear_offset(o, cfg), o) for o in _OFFSETS]

    # pre-pad along the cell axis (w zeros/sentinels each side) and pad the
    # cell count to a block multiple so every program sees full windows
    pad_hi = nb * block - nc
    xp = jnp.pad(grid.xp, ((0, 0), (0, 0), (w, w + pad_hi)),
                 constant_values=EMPTY_POS)
    vol = jnp.where(grid.liquid, cfg.liquid_volume,
                    jnp.where(grid.valid, cfg.solid_volume, 0.0))
    vol = jnp.pad(vol, ((0, 0), (w, w + pad_hi)))

    win = block + 2 * w

    def kernel(xp_ref, vol_ref, out_ref):
        b = pl.program_id(0)
        base = b * block

        def body(xw, vw, sem):
            dma1 = pltpu.make_async_copy(
                xp_ref.at[:, :, pl.ds(base, win)], xw, sem)
            dma1.start()
            dma1.wait()
            dma2 = pltpu.make_async_copy(
                vol_ref.at[:, pl.ds(base, win)], vw, sem)
            dma2.start()
            dma2.wait()

            home = [xw[c, :, w:w + block] for c in range(3)]  # (C, B)
            # global cell coords of the block for the in-box masks: padded
            # index p holds global cell p - w, so the home slice (window
            # offset w, window base p = base) is global [base, base + block)
            idx = base + jax.lax.broadcasted_iota(
                jnp.int32, (1, block), 1)[0]
            cx = idx // (gy * gz)
            cy = (idx // gz) % gy
            cz = idx % gz

            acc = jnp.zeros((cap, block), jnp.float32)
            for lin, (dx, dy, dz) in offsets:
                nbr = [xw[c, :, w + lin:w + lin + block] for c in range(3)]
                d2 = sum((home[c][:, None, :] - nbr[c][None, :, :]) ** 2
                         for c in range(3))
                inbox = ((cx + dx >= 0) & (cx + dx < gx)
                         & (cy + dy >= 0) & (cy + dy < gy)
                         & (cz + dz >= 0) & (cz + dz < gz))
                m = (d2 <= h2) & inbox[None, None, :]
                if lin == 0:
                    eye = jax.lax.broadcasted_iota(
                        jnp.int32, (cap, cap, 1), 0) == jax.lax.broadcasted_iota(
                        jnp.int32, (cap, cap, 1), 1)
                    m = m & ~eye
                q = jnp.sqrt(jnp.maximum(d2, 0.0)) / h
                inner = 6.0 * q * q * q - 6.0 * q * q + 1.0
                f = 1.0 - q
                wk = sigma * jnp.where(q <= 0.5, inner, 2.0 * f * f * f)
                wk = jnp.where(m, wk, 0.0)
                vj = vw[:, w + lin:w + lin + block][None]
                acc = acc + jnp.sum(vj * wk, axis=1)
            out_ref[:, :] = rho0 * (w0 + acc)

        pl.run_scoped(
            body,
            xw=pltpu.VMEM((3, cap, win), jnp.float32),
            vw=pltpu.VMEM((cap, win), jnp.float32),
            sem=pltpu.SemaphoreType.DMA(()),
        )

    out = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM),
                  pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((cap, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cap, nb * block), jnp.float32),
        interpret=interpret,
    )(xp, vol)
    return out[:, :nc]
