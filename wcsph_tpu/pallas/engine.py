"""Sweep engine v2: plane-tiled, occupancy-skipping Mosaic window sweeps.

This replaced the first-generation kernels (removed; see git history of
pallas/window_sweep.py) for the hot DFSPH path.  Design (measurement-driven,
see ROADMAP.md round-2 notes):

* **Plane-tiled DMA.**  The v1 kernels blocked the flat cell axis, so every
  128-cell block dragged a full-x-plane halo (~5k cells each side) from HBM —
  an ~80x DMA amplification.  Here a program owns (one x-plane) x (a minor
  chunk of Q cells) and DMAs exactly three plane rows with a 128-lane margin:
  amplification ~3x on the plane axis, ~1.2x on the minor axis.

* **Rank-blocked capacity.**  Cell capacity C is processed as C/8 rank
  blocks of 8 sublanes.  At rest the dam-break packing is exactly 8
  particles/cell (spacing 2r in h=4r cells), so only rank block 0 is
  occupied and the pair work per (cell, offset) is 8x8, not CxC.  Capacity
  can therefore be raised (24/32) to make overflow vanish (the reference
  drops overflow on the floor, HashGrid.py:73) at near-zero cost: higher
  rank blocks only cost where cells actually compress.

* **Occupancy bitmask skipping.**  A per-(program, offset) int32 bitmask —
  bit rbh*NRB+rbn set iff home rank-block rbh and (conservative) neighbor
  rank-block rbn both contain particles (and, for liquid-output ops, at
  least one side contains liquid) — is precomputed in XLA from the packed
  grid and scalar-prefetched into SMEM.  Empty air / solid-interior chunks
  and all rank-block pairs beyond the local compression never issue a single
  VPU op.  Fully inactive programs skip their DMAs too.

* **One traced offset body.**  The 27 window offsets run as a
  ``lax.fori_loop`` over an SMEM offset table (dynamic VMEM slices), not 27
  unrolled bodies — Mosaic compile time stays flat and the kernel code is
  tiny.

The reference's corresponding hot loops are the per-particle neighbor
gathers in dfsph.py:248-262/346-372/449-547/181-246 driven by
HashGrid.py:88-106; this engine is their shape on a machine with 128-wide
vector lanes, no atomics and no efficient gathers.

Numerical contract: op-for-op parity with the XLA twins in dense_ops.py
(differential-tested in tests/test_engine.py); accumulation order differs
(offset-major here vs offset-scan there), so comparisons are tolerance-based.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import SimConfig
from ..grid import DenseGrid, EMPTY_POS, _OFFSETS

_EPS = 1.0e-5
_MARGIN = 128          # minor-axis sentinel margin (covers |dy*gz+dz| <= gz+1)

# Half-window (Newton) sweeps for the solver-loop ops: each +-offset pair is
# evaluated once with dual-sided emits (see _build_sweep_sym).  Default on;
# settable for A/B measurements (WCSPH_SYM_SWEEPS=0).
import os as _os

SYM_SWEEPS = _os.environ.get("WCSPH_SYM_SWEEPS", "1") == "1"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class _Plan(NamedTuple):
    """Static geometry of the sweep grid (derived from cfg only)."""

    C: int          # cell capacity (multiple of 8)
    NRB: int        # rank blocks = C // 8
    gx: int
    gy: int
    gz: int
    P: int          # minor plane size = gy * gz
    Q: int          # minor chunk per program (multiple of 128)
    nq: int         # chunks per plane
    PP: int         # padded minor size = 2 * _MARGIN + nq * Q
    NX: int         # padded planes = gx + 2
    Wq: int         # VMEM window per plane row = Q + 2 * _MARGIN


def make_plan(cfg: SimConfig, cap: int) -> _Plan:
    gx, gy, gz = cfg.grid_res
    assert cap % 8 == 0, "engine capacity must be a multiple of 8"
    assert min(gx, gy, gz) >= 3, "engine needs >= 3 cells per axis"
    assert gz + 2 <= _MARGIN, "gz too large for the fixed minor margin"
    P = gy * gz
    # per-program scratch scales with C * Wq: shrink the chunk target for
    # wide capacities (spill branches, junction-heavy shells) so scoped
    # VMEM stays within the 16 MB stack at any C (a C=48 spill branch
    # measured 64 KB over at the C<=24 target)
    target = 1280 if cap <= 24 else max(384, 1280 * 24 // cap)
    nq = max(1, -(-P // target))
    Q = _round_up(-(-P // nq), 128)
    return _Plan(C=cap, NRB=cap // 8, gx=gx, gy=gy, gz=gz, P=P, Q=Q, nq=nq,
                 PP=2 * _MARGIN + nq * Q, NX=gx + 2, Wq=Q + 2 * _MARGIN)


def fine_plan(plan: _Plan) -> _Plan:
    """Half-Q variant with the SAME padded layout (PP/NX unchanged), for
    many-field kernels whose per-program scratch + body temporaries would
    exceed scoped VMEM at full Q.  Falls back to the coarse plan when Q
    cannot split on a 128 boundary."""
    if plan.Q % 256 != 0:
        return plan
    q = plan.Q // 2
    return plan._replace(Q=q, nq=plan.nq * 2, Wq=q + 2 * _MARGIN)


def _pad_field(plan: _Plan, a: jnp.ndarray, fill) -> jnp.ndarray:
    """(…, C, NC) -> (…, NX, C, PP) with sentinel borders.

    The plane axis comes BEFORE the capacity axis so the per-program DMA
    slices only batch dims of the HBM memref (Mosaic requires slices of the
    tiled trailing (sublane, lane) dims to be tile-aligned)."""
    lead = a.shape[:-1]
    a3 = a.reshape(lead + (plan.gx, plan.P))
    a3 = jnp.moveaxis(a3, -2, -3)       # (…, gx, C, P)
    pad = [(0, 0)] * (a3.ndim - 3) + [(1, 1), (0, 0),
                                      (_MARGIN, plan.PP - plan.P - _MARGIN)]
    return jnp.pad(a3, pad, constant_values=fill)


def _unpad_out(plan: _Plan, out: jnp.ndarray) -> jnp.ndarray:
    """(NOUT, gx, C, nq*Q) -> (NOUT, C, NC)."""
    nout = out.shape[0]
    o = jnp.moveaxis(out[..., :plan.P], 1, 2)        # (NOUT, C, gx, P)
    return o.reshape(nout, plan.C, plan.gx * plan.P)


def _pad_tot(plan: _Plan, tot: jnp.ndarray) -> jnp.ndarray:
    """(NOUT, gx, C, nq*Q) plane-major sweep output -> padded-layout
    (NOUT, NX, C, PP) with zero margins, NO transpose (the plane axis is
    already where _pad_field puts it).  Slots beyond P hold provably-zero
    sums (their home positions are the EMPTY_POS sentinel), so they can ride
    along as interior."""
    return jnp.pad(tot, [(0, 0), (1, 1), (0, 0),
                         (_MARGIN, plan.PP - plan.nq * plan.Q - _MARGIN)])


# ---------------------------------------------------------------------------
# Occupancy bitmasks
# ---------------------------------------------------------------------------

def _chunk_counts(plan: _Plan, occ: jnp.ndarray) -> jnp.ndarray:
    """(C, NC) bool -> (NRB, NX, nq+2) int32 per-rank-block chunk counts,
    padded with zero borders on both the plane and chunk axes."""
    c = occ.reshape(plan.NRB, 8, plan.gx, plan.P).sum(1).astype(jnp.int32)
    c = jnp.pad(c, ((0, 0), (0, 0), (0, plan.nq * plan.Q - plan.P)))
    c = c.reshape(plan.NRB, plan.gx, plan.nq, plan.Q).sum(-1)
    return jnp.pad(c, ((0, 0), (1, 1), (1, 1)))


def _chunk_counts_padded(plan: _Plan, occ_pad: jnp.ndarray) -> jnp.ndarray:
    """_chunk_counts from an occupancy mask already in the padded
    (NX, C, PP) layout (resident mode) — a pure reduction, no transpose of
    the full array (the post-reduction arrays are tiny)."""
    core = occ_pad[1:-1, :, _MARGIN:_MARGIN + plan.nq * plan.Q]
    c = core.reshape(plan.gx, plan.NRB, 8, plan.nq,
                     plan.Q).sum((2, 4)).astype(jnp.int32)
    c = jnp.moveaxis(c, 0, 1)                  # (NRB, gx, nq)
    return jnp.pad(c, ((0, 0), (1, 1), (1, 1)))


def _nbr_counts(plan: _Plan, counts: jnp.ndarray, dxs, sgns) -> jnp.ndarray:
    """Per-offset neighbor-side chunk counts, VECTORIZED over offsets:
    (NRB, NX, nq+2) -> (NRB, noff, gx, nq).  A Python loop over offsets
    costs ~8 tiny XLA ops per offset, and on the remote-TPU platform every
    op pays a fixed launch gap — the batched gather form is ~20x fewer ops
    (measured: engine-mask construction 215 -> ~40 ms at 1M)."""
    dxs = np.asarray(dxs)
    sgns = np.asarray(sgns)
    noff = len(dxs)
    # (noff, gx, nq) index grids into the padded (NX, nq+2) axes
    ix = np.broadcast_to(
        ((np.arange(plan.gx) + 1)[None, :] + dxs[:, None])[:, :, None],
        (noff, plan.gx, plan.nq))
    q1 = np.broadcast_to((np.arange(plan.nq) + 1)[None, None, :], ix.shape)
    base = counts[:, ix, q1]                           # (NRB, noff, gx, nq)
    shifted = counts[:, ix, q1 + sgns[:, None, None]]
    add = jnp.asarray((sgns != 0).astype(np.int32))[None, :, None, None]
    return base + shifted * add


def _bitmask_pack(plan: _Plan, home_a, home_l, na, nl):
    """(NRB, …) home counts + (NRB, noff, gx, nq) neighbor counts ->
    (act_any, act_liq) (gx, nq, noff) int32 bitmasks, bit rbh*NRB+rbn."""
    wts = (1 << np.arange(plan.NRB * plan.NRB, dtype=np.int32)).reshape(
        plan.NRB, plan.NRB)
    wts = jnp.asarray(wts)[:, :, None, None, None]
    # (rbh, rbn, noff, gx, nq)
    pair_any = (home_a[:, None, None] > 0) & (na[None] > 0)
    pair_liq = pair_any & ((home_l[:, None, None] > 0) | (nl[None] > 0))
    bits_any = jnp.sum(wts * pair_any, axis=(0, 1)).astype(jnp.int32)
    bits_liq = jnp.sum(wts * pair_liq, axis=(0, 1)).astype(jnp.int32)
    return (jnp.moveaxis(bits_any, 0, -1), jnp.moveaxis(bits_liq, 0, -1))


def _active_masks(plan: _Plan, ca: jnp.ndarray, cl: jnp.ndarray):
    """Returns (act_any, act_liq, nonzero_any, nonzero_liq) from the
    (NRB, NX, nq+2) valid/liquid chunk counts:
    act_* : (gx, nq, 27) int32 bitmasks, bit rbh*NRB+rbn;
    nonzero_* : (gx, nq) int32 (1 if any offset bit set — gates DMA).
    act_any uses the rule "both sides occupied"; act_liq additionally
    requires liquid on at least one side (enough for every op whose outputs
    are only consumed at liquid slots)."""
    px = np.arange(plan.gx)
    q = np.arange(plan.nq)
    home_a = ca[:, px + 1][:, :, q + 1]        # (NRB, gx, nq)
    home_l = cl[:, px + 1][:, :, q + 1]
    dxs = [o[0] for o in _OFFSETS]
    sgns = [int(np.sign(o[1] * plan.gz + o[2])) for o in _OFFSETS]
    na = _nbr_counts(plan, ca, dxs, sgns)
    nl = _nbr_counts(plan, cl, dxs, sgns)
    bits_any, bits_liq = _bitmask_pack(plan, home_a, home_l, na, nl)
    nz_any = (jnp.sum(bits_any, axis=2) > 0).astype(jnp.int32)
    nz_liq = (jnp.sum(bits_liq, axis=2) > 0).astype(jnp.int32)
    return bits_any, bits_liq, nz_any, nz_liq


# ---------------------------------------------------------------------------
# The generic sweep kernel
# ---------------------------------------------------------------------------

class PairCtx(NamedTuple):
    """Everything an op body sees for one (offset, rbh, rbn) pair block.

    All pair arrays are (8, 8, Q): axis 0 = home slot, axis 1 = neighbor
    slot, axis 2 = cell.  home(i)/nbr(i) return the i-th DMA'd field as
    (8, 1, Q) / (1, 8, Q) rows ready to broadcast."""

    r: tuple        # (rx, ry, rz) pair separations
    d2: jnp.ndarray
    mask: jnp.ndarray
    home: tuple     # callables per field index
    nbr: tuple
    h: float

    def rinv(self):
        """1/|r| via a single rsqrt (no sqrt + true division on the VPU);
        finite at d2 = 0, where dist() = d2 * rinv() is still exactly 0."""
        return jax.lax.rsqrt(jnp.maximum(self.d2, _EPS * _EPS))

    def dist(self):
        return self.d2 * self.rinv()

    def w(self):
        """Masked cubic W."""
        h = self.h
        sigma = 8.0 / (math.pi * h * h * h)
        q = self.dist() * (1.0 / h)
        inner = 6.0 * q * q * q - 6.0 * q * q + 1.0
        f = 1.0 - q
        wk = sigma * jnp.where(q <= 0.5, inner, 2.0 * f * f * f)
        return jnp.where(self.mask, wk, 0.0)

    def gs(self):
        """Masked gradW scalar factor (gradW = gs * r)."""
        h = self.h
        m_l = 48.0 / (math.pi * h * h * h)
        rinv = self.rinv()
        dist = self.d2 * rinv
        q = dist * (1.0 / h)
        inner = (m_l / (h * h)) * (3.0 * q - 2.0)
        f = 1.0 - q
        outer = (-m_l / h) * f * f * rinv
        s = jnp.where(q <= 0.5, inner, outer)
        return jnp.where(self.mask & (dist > _EPS), s, 0.0)


def _build_sweep(plan: _Plan, n_fields: int, field_comps, n_out: int,
                 emit, interpret: bool):
    """Builds the pallas_call for one op.

    field_comps: list of component counts per DMA'd field; field 0 is always
    the packed positions (3 components).  emit(ctx) -> list of n_out (8, Q)
    contributions accumulated into the output channels.
    """
    C, NRB, Q, Wq, nq = plan.C, plan.NRB, plan.Q, plan.Wq, plan.nq
    gz = plan.gz
    # 9 static (dy, dz) lane shifts; the plane shift dx is a dynamic batch
    # index (Mosaic requires lane-dim slice offsets to be static unless
    # provably 128-aligned; static-unaligned is fine).
    DYZ = [(dy, dz) for dy in (-1, 0, 1) for dz in (-1, 0, 1)]

    def kernel(nz_ref, act_ref, *refs):
        ins = refs[:n_fields]
        out_ref = refs[n_fields]
        bufs = refs[n_fields + 1:n_fields + 1 + n_fields]
        sem = refs[-1]
        px = pl.program_id(0)
        q = pl.program_id(1)

        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

        @pl.when(nz_ref[px, q] != 0)
        def _():
            base = q * Q
            # issue every row copy up front, then wait once per copy: the
            # DMAs overlap instead of serializing their ~us issue latencies
            # (15-36 copies per program; this is worth ~30-40% of sweep time)
            copies = []
            for f in range(n_fields):
                for comp in range(field_comps[f]):
                    for i in range(3):
                        src = ins[f].at[comp, px + i, :, pl.ds(base, Wq)]
                        dst = bufs[f].at[comp, i, :, :]
                        copies.append(pltpu.make_async_copy(src, dst, sem))
            for cp in copies:
                cp.start()
            for cp in copies:
                cp.wait()

            eye = (jax.lax.broadcasted_iota(jnp.int32, (8, 8, 1), 0)
                   == jax.lax.broadcasted_iota(jnp.int32, (8, 8, 1), 1))

            for j, (dy, dz) in enumerate(DYZ):
                lin = _MARGIN + dy * gz + dz     # static lane offset
                is_center_yz = (dy == 0 and dz == 0)

                def dx_body(ix, _, lin=lin, j=j, is_center_yz=is_center_yz):
                    m = act_ref[px, q, ix * 9 + j]

                    @pl.when(m != 0)
                    def _():
                        def rb_body(rbi, _):
                            rbh = rbi // NRB
                            rbn = rbi - rbh * NRB

                            @pl.when(((m >> (rbh * NRB + rbn)) & 1) != 0)
                            def _():
                                hs = pl.ds(pl.multiple_of(rbh * 8, 8), 8)
                                ns = pl.ds(pl.multiple_of(rbn * 8, 8), 8)

                                def home(f, c=0):
                                    return bufs[f][c, 1, hs,
                                                   _MARGIN:_MARGIN + Q][:, None, :]

                                def nbr(f, c=0):
                                    return bufs[f][c, ix, ns,
                                                   lin:lin + Q][None, :, :]

                                r = tuple(home(0, c) - nbr(0, c)
                                          for c in range(3))
                                d2 = r[0] * r[0] + r[1] * r[1] + r[2] * r[2]
                                mask = d2 <= emit.h2
                                if is_center_yz:
                                    self_block = (ix == 1) & (rbh == rbn)
                                    mask = mask & ~(eye & self_block)
                                ctx = PairCtx(r=r, d2=d2, mask=mask,
                                              home=home, nbr=nbr, h=emit.h)
                                for ch, val in enumerate(emit(ctx)):
                                    cur = out_ref[ch, 0, hs, :]
                                    out_ref[ch, 0, hs, :] = cur + val
                            return 0

                        jax.lax.fori_loop(0, NRB * NRB, rb_body, 0,
                                          unroll=False)
                    return 0

                jax.lax.fori_loop(0, 3, dx_body, 0, unroll=False)

    scratch = [pltpu.VMEM((field_comps[f], 3, C, Wq), jnp.float32)
               for f in range(n_fields)]
    scratch.append(pltpu.SemaphoreType.DMA(()))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(plan.gx, nq),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * n_fields,
        out_specs=pl.BlockSpec((n_out, 1, C, Q),
                               lambda px, q, *_: (0, px, 0, q)),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_out, plan.gx, C, nq * Q),
                                       jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )


# ---------------------------------------------------------------------------
# Half-window (Newton) sweep: 13+1 offsets, dual-sided emits, overlap-add
# ---------------------------------------------------------------------------

def _sym_offsets():
    """The zero offset plus the 13 offsets with positive linear shift,
    grouped as (dy, dz) -> list of dx (dx in {0, 1} only)."""
    table = []
    for dy in (-1, 0, 1):
        for dz in (-1, 0, 1):
            dxs = []
            for dx in (0, 1):
                lin3 = (dx, dy, dz)
                if lin3 == (0, 0, 0):
                    dxs.append(0)           # the self-offset block
                    continue
                # positive linear offset <=> (dx, dy, dz) lexicographically
                # positive with gy,gz >= 3
                if dx == 1 or dy > 0 or (dy == 0 and dz > 0):
                    dxs.append(dx)
            table.append(((dy, dz), dxs))
    assert sum(len(d) for _, d in table) == 14
    return table


def _active_masks_sym(plan: _Plan, ca: jnp.ndarray, cl: jnp.ndarray):
    """(act_liq, nz_liq, act_any, nz_any) for the 14 half-window offsets.
    act_liq uses the liquid-on-either-side rule (the mirror write makes
    every block liquid-relevant from both ends); act_any only requires both
    sides occupied (for ops whose outputs are read at solid slots too)."""
    px = np.arange(plan.gx)
    q = np.arange(plan.nq)
    home_a = ca[:, px + 1][:, :, q + 1]
    home_l = cl[:, px + 1][:, :, q + 1]
    dxs, sgns = [], []
    for (dy, dz), ds in _sym_offsets():
        for dx in ds:
            dxs.append(dx)
            sgns.append(int(np.sign(dy * plan.gz + dz)))
    na = _nbr_counts(plan, ca, dxs, sgns)
    nl = _nbr_counts(plan, cl, dxs, sgns)
    act_a, act_l = _bitmask_pack(plan, home_a, home_l, na, nl)  # (gx, nq, 14)
    nz_l = (jnp.sum(act_l, axis=2) > 0).astype(jnp.int32)
    nz_a = (jnp.sum(act_a, axis=2) > 0).astype(jnp.int32)
    return act_l, nz_l, act_a, nz_a


def _build_sweep_sym(plan: _Plan, n_fields: int, field_comps, n_out: int,
                     emit, interpret: bool):
    """Half-window pallas_call: every +-offset pair is evaluated ONCE, with
    three outputs chosen so the XLA fold is cheap (the v2 single windowed
    output cost ~4 full passes over 2.8x the slot count per sweep — the
    dominant glue in the round-3 HLO census):

      A  (n_out, gx, C, nq*Q)       own-plane interior, FINAL plane-major
                                    layout (home emits + the dx=0 mirror
                                    lanes that stay inside the chunk);
      A1 (n_out, gx, C, nq*Q)       next-plane interior (dx=1 mirrors);
      B  (n_out, gx, nq, 2, C, 2M)  the margin slivers that cross a chunk
                                    boundary (<= M lanes per side).

    Mirror emits target window lanes [lin, lin+Q); the static split into
    interior/sliver happens at trace time per offset.  The fold is then one
    plane-shifted add plus a margins pass over B (~5% of the slots)."""
    C, NRB, Q, Wq, nq = plan.C, plan.NRB, plan.Q, plan.Wq, plan.nq
    gz = plan.gz
    M = _MARGIN

    def kernel(nz_ref, act_ref, *refs):
        ins = refs[:n_fields]
        out_a = refs[n_fields]
        out_a1 = refs[n_fields + 1]
        out_b = refs[n_fields + 2]
        bufs = refs[n_fields + 3:n_fields + 3 + n_fields]
        sem = refs[-1]
        px = pl.program_id(0)
        q = pl.program_id(1)

        out_a[...] = jnp.zeros(out_a.shape, out_a.dtype)
        out_a1[...] = jnp.zeros(out_a1.shape, out_a1.dtype)
        out_b[...] = jnp.zeros(out_b.shape, out_b.dtype)

        @pl.when(nz_ref[px, q] != 0)
        def _():
            base = q * Q
            copies = []
            for f in range(n_fields):
                for comp in range(field_comps[f]):
                    for i in range(2):          # own plane + next plane
                        src = ins[f].at[comp, px + 1 + i, :, pl.ds(base, Wq)]
                        dst = bufs[f].at[comp, i, :, :]
                        copies.append(pltpu.make_async_copy(src, dst, sem))
            for cp in copies:
                cp.start()
            for cp in copies:
                cp.wait()

            eye = (jax.lax.broadcasted_iota(jnp.int32, (8, 8, 1), 0)
                   == jax.lax.broadcasted_iota(jnp.int32, (8, 8, 1), 1))

            oid = 0
            for (dy, dz), dxs in _sym_offsets():
                lin = _MARGIN + dy * gz + dz
                delta = dy * gz + dz            # mirror shift vs interior
                for dx in dxs:
                    is_zero = (dx, dy, dz) == (0, 0, 0)
                    m = act_ref[px, q, oid]
                    oid += 1

                    def offset_block(m=m, dx=dx, lin=lin, delta=delta,
                                     is_zero=is_zero):
                        @pl.when(m != 0)
                        def _():
                            def rb_body(rbi, _):
                                rbh = rbi // NRB
                                rbn = rbi - rbh * NRB

                                @pl.when(((m >> (rbh * NRB + rbn)) & 1) != 0)
                                def _():
                                    hs = pl.ds(pl.multiple_of(rbh * 8, 8), 8)
                                    ns = pl.ds(pl.multiple_of(rbn * 8, 8), 8)

                                    def home(f, c=0):
                                        return bufs[f][c, 0, hs,
                                                       _MARGIN:_MARGIN + Q][:, None, :]

                                    def nbr(f, c=0):
                                        return bufs[f][c, dx, ns,
                                                       lin:lin + Q][None, :, :]

                                    r = tuple(home(0, c) - nbr(0, c)
                                              for c in range(3))
                                    d2 = (r[0] * r[0] + r[1] * r[1]
                                          + r[2] * r[2])
                                    mask = d2 <= emit.h2
                                    if is_zero:
                                        mask = mask & ~(eye & (rbh == rbn))
                                    ctx = PairCtx(r=r, d2=d2, mask=mask,
                                                  home=home, nbr=nbr,
                                                  h=emit.h)
                                    hvals, mvals = emit.sym(ctx)
                                    for ch, val in enumerate(hvals):
                                        cur = out_a[ch, 0, hs, :]
                                        out_a[ch, 0, hs, :] = cur + val
                                    if not is_zero:
                                        tgt = out_a if dx == 0 else out_a1
                                        for ch, val in enumerate(mvals):
                                            if delta <= 0:
                                                cur = tgt[ch, 0, ns,
                                                          0:Q + delta]
                                                tgt[ch, 0, ns, 0:Q + delta] \
                                                    = cur + val[:, -delta:]
                                                if delta < 0:
                                                    cb = out_b[ch, 0, 0, dx,
                                                               ns,
                                                               M + delta:M]
                                                    out_b[ch, 0, 0, dx, ns,
                                                          M + delta:M] \
                                                        = cb + val[:, :-delta]
                                            else:
                                                cur = tgt[ch, 0, ns,
                                                          delta:Q]
                                                tgt[ch, 0, ns, delta:Q] \
                                                    = cur + val[:, :Q - delta]
                                                cb = out_b[ch, 0, 0, dx, ns,
                                                           M:M + delta]
                                                out_b[ch, 0, 0, dx, ns,
                                                      M:M + delta] \
                                                    = cb + val[:, Q - delta:]
                                return 0

                            jax.lax.fori_loop(0, NRB * NRB, rb_body, 0,
                                              unroll=False)

                    offset_block()

    scratch = [pltpu.VMEM((field_comps[f], 2, C, Wq), jnp.float32)
               for f in range(n_fields)]
    scratch.append(pltpu.SemaphoreType.DMA(()))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(plan.gx, nq),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * n_fields,
        out_specs=[
            pl.BlockSpec((n_out, 1, C, Q), lambda px, q, *_: (0, px, 0, q)),
            pl.BlockSpec((n_out, 1, C, Q), lambda px, q, *_: (0, px, 0, q)),
            pl.BlockSpec((n_out, 1, 1, 2, C, 2 * M),
                         lambda px, q, *_: (0, px, q, 0, 0, 0)),
        ],
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_out, plan.gx, C, nq * Q), jnp.float32),
            jax.ShapeDtypeStruct((n_out, plan.gx, C, nq * Q), jnp.float32),
            jax.ShapeDtypeStruct((n_out, plan.gx, nq, 2, C, 2 * M),
                                 jnp.float32),
        ],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )


def _fold_sym_tot(plan: _Plan, outs) -> jnp.ndarray:
    """Overlap-add the half-window triple output (A own-plane interior,
    A1 next-plane interior, B margin slivers) -> plane-major
    (n_out, gx, C, nq*Q).  The interiors are already in the final layout
    (no transpose, no window slicing); only B — ~2M/Q of the slots — needs
    the chunk-boundary shift, and its pads+adds fuse with the plane add
    into one full pass."""
    A, A1, B = outs
    Q, M = plan.Q, _MARGIN
    nout, gx, C, L = A.shape
    nq = plan.nq
    core = A + jnp.concatenate([jnp.zeros_like(A1[:, :1]), A1[:, :-1]],
                               axis=1)
    own, nxt = B[:, :, :, 0], B[:, :, :, 1]          # (nout, gx, nq, C, 2M)
    m = own + jnp.concatenate([jnp.zeros_like(nxt[:, :1]), nxt[:, :-1]],
                              axis=1)
    mt = jnp.moveaxis(m, 2, 3)                       # (nout, gx, C, nq, 2M)
    # rm of chunk q -> head of chunk q+1; lm of chunk q -> tail of chunk q-1
    rm = jnp.concatenate([jnp.zeros_like(mt[..., :1, M:]),
                          mt[..., :-1, M:]], axis=3)
    lm = jnp.concatenate([mt[..., 1:, :M],
                          jnp.zeros_like(mt[..., :1, :M])], axis=3)
    zpad = [(0, 0)] * 4
    frame = (jnp.pad(rm, zpad + [(0, Q - M)])
             + jnp.pad(lm, zpad + [(Q - M, 0)]))     # (nout, gx, C, nq, Q)
    return core + frame.reshape(nout, gx, C, L)


def _fold_sym(plan: _Plan, out: jnp.ndarray) -> jnp.ndarray:
    """Half-window output -> packed (n_out, C, NC)."""
    return _unpad_out(plan, _fold_sym_tot(plan, out))


def _fold_sym_pad(plan: _Plan, out: jnp.ndarray) -> jnp.ndarray:
    """Half-window output -> padded-layout (n_out, NX, C, PP), transpose-free
    (the padded-IO loop path; see PaddedEngine)."""
    return _pad_tot(plan, _fold_sym_tot(plan, out))


# ---------------------------------------------------------------------------
# Fused solver iteration: kappa velocity update + divergence in ONE kernel
# ---------------------------------------------------------------------------

def _fused_rows(plan: _Plan, px, q):
    """Row-window slicer shared by the fused kernels: (comp, home/next row,
    Wq lanes) of a padded (k, NX, C, PP) HBM ref."""
    Q, Wq = plan.Q, plan.Wq

    def rows(ref, comp, i):
        return ref.at[comp, px + 1 + i, :, pl.ds(q * Q, Wq)]

    return rows


def _fused_pair_loop(plan: _Plan, h: float, act_ref, px, q, bacc, gate_buf):
    """The half-window offset/rank-block pair loop shared by the fused
    multi-phase kernels.  Returns ``run(nfield_bufs, emit, gated)``:
    nfield_bufs maps emit field index -> (scratch, comp_base); emit.sym's
    home/mirror channels are accumulated into ``bacc``, receiver-gated by
    ``gate_buf`` comp 0 when ``gated``."""
    NRB, Q, gz = plan.NRB, plan.Q, plan.gz
    M = _MARGIN
    h2 = h * h
    eye = (jax.lax.broadcasted_iota(jnp.int32, (8, 8, 1), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (8, 8, 1), 1))

    def run(nfield_bufs, emit, gated):
        oid = 0
        for (dy, dz), dxs in _sym_offsets():
            lin = M + dy * gz + dz
            for dx in dxs:
                is_zero = (dx, dy, dz) == (0, 0, 0)
                m = act_ref[px, q, oid]
                oid += 1

                def offset_block(m=m, dx=dx, lin=lin, is_zero=is_zero):
                    @pl.when(m != 0)
                    def _():
                        def rb_body(rbi, _):
                            rbh = rbi // NRB
                            rbn = rbi - rbh * NRB

                            @pl.when(((m >> (rbh * NRB + rbn)) & 1) != 0)
                            def _():
                                hs = pl.ds(pl.multiple_of(rbh * 8, 8), 8)
                                ns = pl.ds(pl.multiple_of(rbn * 8, 8), 8)

                                def home(f, c=0):
                                    buf, cb = nfield_bufs[f]
                                    return buf[cb + c, 0, hs,
                                               M:M + Q][:, None, :]

                                def nbr(f, c=0):
                                    buf, cb = nfield_bufs[f]
                                    return buf[cb + c, dx, ns,
                                               lin:lin + Q][None, :, :]

                                r = tuple(home(0, c) - nbr(0, c)
                                          for c in range(3))
                                d2 = (r[0] * r[0] + r[1] * r[1]
                                      + r[2] * r[2])
                                mask = d2 <= h2
                                if is_zero:
                                    mask = mask & ~(eye & (rbh == rbn))
                                ctx = PairCtx(r=r, d2=d2, mask=mask,
                                              home=home, nbr=nbr, h=h)
                                hvals, mvals = emit.sym(ctx)
                                gh = (gate_buf[0, 0, hs, M:M + Q]
                                      if gated else None)
                                gn = (gate_buf[0, dx, ns, lin:lin + Q]
                                      if gated else None)
                                for ch in range(len(hvals)):
                                    hv = hvals[ch]
                                    if gh is not None:
                                        hv = gh * hv
                                    cur = bacc[ch, 0, hs, M:M + Q]
                                    bacc[ch, 0, hs, M:M + Q] = cur + hv
                                    if not is_zero:
                                        mv = mvals[ch]
                                        if gn is not None:
                                            mv = gn * mv
                                        curm = bacc[ch, dx, ns,
                                                    lin:lin + Q]
                                        bacc[ch, dx, ns, lin:lin + Q] \
                                            = curm + mv
                            return 0

                        jax.lax.fori_loop(0, NRB * NRB, rb_body, 0,
                                          unroll=False)

                offset_block()

    return run


def _build_fused_iter(plan: _Plan, h: float, interpret: bool):
    """One pallas_call per DFSPH divergence/pressure iteration: the reference
    runs `kappa velocity update` then `drho` as two separate GPU passes per
    iteration (dfsph.py:449-485/510-547); here both halves run inside a
    single Mosaic program, eliminating the second kernel launch, the
    overlap-add fold of the velocity update, and the liquid-mask-and-add XLA
    pass between them — on the remote-TPU platform every one of those thunks
    pays a launch gap, and the solver loops execute them 4-6x per step.

    Mechanics (relies on the documented SEQUENTIAL execution of the TPU
    pallas grid, phase axis slowest):

      phase 0  (program px, q): RMW-accumulates
                   vel[recv] += gate[recv] * sum_j V_j (k'_i + k'_j) gs r
               straight into the velocity OUTPUT buffer (aliased to the
               input velocity, so the buffer starts valid and inactive
               programs touch nothing).  Half-window Newton emits: home
               contributions land in row px+1, dx=1 mirrors in row px+2 —
               earlier programs' partial sums are simply part of the
               read-modify-write base.  k' is the kappa field PRE-scaled by
               dt (the pair term is linear in k, so dt folds into the
               field); `gate` is the per-receiver acceptance mask (liquid
               for loop iterations, liquid & warm-start-predicate for the
               fused warm starts).  It also zeroes its rows of the acc
               output (all zero-writes precede every phase-1 write).
      phase 1  (program px, q): reads the now-FINAL updated velocity rows
               from the output buffer and RMW-accumulates the raw
               divergence  acc[i] += sum_j V_j gs (v'_i - v'_j).r  into the
               acc output (aliased to a dead caller buffer; rows this phase
               writes were zeroed in phase 0).

    Inactive programs (occupancy bitmask nz == 0) skip everything; any slot
    whose chunk is inactive has no liquid in range, and both consumers of
    acc at such slots are nil (alpha == 0 makes its kappa zero; the error
    reduction is liquid-masked), so stale acc values there are benign.
    Numerical contract: same per-pair math as _KappaAcc.sym/_DivAcc.sym
    (shared bodies); accumulation ORDER differs from the two-kernel path
    (one windowed accumulator instead of interior/margin splits), so
    differential tests are tolerance-based like every engine-vs-XLA test."""
    C, NRB, Q, Wq, nq = plan.C, plan.NRB, plan.Q, plan.Wq, plan.nq
    gz = plan.gz
    M = _MARGIN
    h2 = h * h

    # emit singletons: .sym reads only the PairCtx (pair math shared with
    # the two-kernel path so the twins cannot drift)
    k_emit = _KappaAcc.__new__(_KappaAcc)
    d_emit = _DivAcc.__new__(_DivAcc)

    def kernel(nz_ref, act_ref, xp, vol, gate, kf, vel_in, acc_in,
               out_vel, out_acc, bxp, bvol, baux, bacc, zrow, sem):
        del vel_in, acc_in      # read through their aliased output refs
        ph = pl.program_id(0)
        px = pl.program_id(1)
        q = pl.program_id(2)

        @pl.when((ph == 0) & (px == 0) & (q == 0))
        def _():
            # scratch persists across the sequential grid: one memset
            zrow[...] = jnp.zeros(zrow.shape, zrow.dtype)

        pair_sweep = _fused_pair_loop(plan, h, act_ref, px, q, bacc, baux)
        rows = _fused_rows(plan, px, q)

        @pl.when((nz_ref[px, q] != 0) & (ph == 0))
        def _():
            copies = []
            for c in range(3):
                for i in range(2):
                    copies.append(pltpu.make_async_copy(
                        rows(xp, c, i), bxp.at[c, i], sem))
                    # accumulation base: the current velocity rows
                    copies.append(pltpu.make_async_copy(
                        rows(out_vel, c, i), bacc.at[c, i], sem))
            for i in range(2):
                copies.append(pltpu.make_async_copy(
                    rows(vol, 0, i), bvol.at[0, i], sem))
                copies.append(pltpu.make_async_copy(
                    rows(gate, 0, i), baux.at[0, i], sem))
                copies.append(pltpu.make_async_copy(
                    rows(kf, 0, i), baux.at[1, i], sem))
            # zero this program's acc rows: every zero-write belongs to
            # phase 0, so they all precede every phase-1 accumulation
            zcopies = [pltpu.make_async_copy(zrow.at[...],
                                             rows(out_acc, 0, i), sem)
                       for i in range(2)]
            for cp in copies + zcopies:
                cp.start()
            for cp in copies + zcopies:
                cp.wait()

            # field map: 0 = xp, 1 = vol, 2 = k' (_KappaAcc order)
            pair_sweep({0: (bxp, 0), 1: (bvol, 0), 2: (baux, 1)}, k_emit,
                       gated=True)

            wb = [pltpu.make_async_copy(bacc.at[c, i], rows(out_vel, c, i),
                                        sem)
                  for c in range(3) for i in range(2)]
            for cp in wb:
                cp.start()
            for cp in wb:
                cp.wait()

        @pl.when((nz_ref[px, q] != 0) & (ph == 1))
        def _():
            copies = []
            for c in range(3):
                for i in range(2):
                    copies.append(pltpu.make_async_copy(
                        rows(xp, c, i), bxp.at[c, i], sem))
                    # the UPDATED velocity (final: all phase-0 programs ran)
                    copies.append(pltpu.make_async_copy(
                        rows(out_vel, c, i), baux.at[c, i], sem))
            for i in range(2):
                copies.append(pltpu.make_async_copy(
                    rows(vol, 0, i), bvol.at[0, i], sem))
                # accumulation base: the zeroed acc rows (+ earlier
                # programs' mirror contributions)
                copies.append(pltpu.make_async_copy(
                    rows(out_acc, 0, i), bacc.at[0, i], sem))
            for cp in copies:
                cp.start()
            for cp in copies:
                cp.wait()

            # field map: 0 = xp, 1 = vol, 2 = vel3 (_DivAcc order)
            pair_sweep({0: (bxp, 0), 1: (bvol, 0), 2: (baux, 0)}, d_emit,
                       gated=False)

            wb = [pltpu.make_async_copy(bacc.at[0, i], rows(out_acc, 0, i),
                                        sem)
                  for i in range(2)]
            for cp in wb:
                cp.start()
            for cp in wb:
                cp.wait()

    NX, PP = plan.NX, plan.PP
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(2, plan.gx, nq),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 6,
        out_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 2,
        scratch_shapes=[
            pltpu.VMEM((3, 2, C, Wq), jnp.float32),   # bxp
            pltpu.VMEM((1, 2, C, Wq), jnp.float32),   # bvol
            pltpu.VMEM((3, 2, C, Wq), jnp.float32),   # baux (gate+k' | vel')
            pltpu.VMEM((3, 2, C, Wq), jnp.float32),   # bacc
            pltpu.VMEM((C, Wq), jnp.float32),         # zrow
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((3, NX, C, PP), jnp.float32),
            jax.ShapeDtypeStruct((1, NX, C, PP), jnp.float32),
        ],
        # indices count the scalar-prefetch operands: vel_in = 6,
        # acc_in = 7 (verified semantics in interpret mode)
        input_output_aliases={6: 0, 7: 1},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
    )


def _build_fused_tension(plan: _Plan, cfg: SimConfig, interpret: bool):
    """Surface normals + tension/adhesion acceleration in ONE pallas_call
    (VERDICT r4 weak #9: as two separate sweeps + their XLA folds the
    tension pipeline cost ~40% of flagship throughput).  Two chained
    stencils via the sequential phase axis, exactly the _build_fused_iter
    mechanics:

      phase 0: RMW-accumulates the raw normal sums
                   n[recv] += m * (liq/rho)_j * gs * r      (dual-sided)
               into the out_n buffer (aliased to a caller ZEROS array, so
               the accumulation base starts valid and inactive programs
               leave benign zeros).
      phase 1: reads the now-FINAL normal rows, scales by h in VMEM (the
               two-sweep path's caller-side scale, engine.surface_normals),
               and RMW-accumulates the full _TensionAccel emission
               (cohesion + curvature + boundary adhesion) into out_acc
               (also aliased caller zeros).

    Emits are the SAME singletons as the two-sweep path
    (_SurfaceNormals.sym/_TensionAccel.sym), so the pair math cannot
    drift; accumulation ORDER differs (windowed accumulator vs
    interior/margin splits) — differential tests are tolerance-based."""
    C, Wq = plan.C, plan.Wq
    h = cfg.support_radius
    n_emit = _SurfaceNormals(cfg)
    t_emit = _TensionAccel(cfg)

    def kernel(nz_ref, act_ref, xp, ril, rho, liq, sol, n_in, acc_in,
               out_n, out_acc, bxp, baux, bacc, sem):
        del n_in, acc_in        # read through their aliased output refs
        ph = pl.program_id(0)
        px = pl.program_id(1)
        q = pl.program_id(2)
        pair_sweep = _fused_pair_loop(plan, h, act_ref, px, q, bacc, None)
        rows = _fused_rows(plan, px, q)

        @pl.when((nz_ref[px, q] != 0) & (ph == 0))
        def _():
            copies = []
            for c in range(3):
                for i in range(2):
                    copies.append(pltpu.make_async_copy(
                        rows(xp, c, i), bxp.at[c, i], sem))
                    # accumulation base: earlier programs' partial sums
                    copies.append(pltpu.make_async_copy(
                        rows(out_n, c, i), bacc.at[c, i], sem))
            for i in range(2):
                copies.append(pltpu.make_async_copy(
                    rows(ril, 0, i), baux.at[0, i], sem))
            for cp in copies:
                cp.start()
            for cp in copies:
                cp.wait()

            # field map: 0 = xp, 1 = rho_inv_liq (_SurfaceNormals order)
            pair_sweep({0: (bxp, 0), 1: (baux, 0)}, n_emit, gated=False)

            wb = [pltpu.make_async_copy(bacc.at[c, i], rows(out_n, c, i),
                                        sem)
                  for c in range(3) for i in range(2)]
            for cp in wb:
                cp.start()
            for cp in wb:
                cp.wait()

        @pl.when((nz_ref[px, q] != 0) & (ph == 1))
        def _():
            copies = []
            for c in range(3):
                for i in range(2):
                    copies.append(pltpu.make_async_copy(
                        rows(xp, c, i), bxp.at[c, i], sem))
                    # the FINAL raw normals (all phase-0 programs ran)
                    copies.append(pltpu.make_async_copy(
                        rows(out_n, c, i), baux.at[1 + c, i], sem))
                    # accumulation base of the accel output (caller zeros
                    # + earlier programs' mirror contributions)
                    copies.append(pltpu.make_async_copy(
                        rows(out_acc, c, i), bacc.at[c, i], sem))
            for i in range(2):
                copies.append(pltpu.make_async_copy(
                    rows(rho, 0, i), baux.at[0, i], sem))
                copies.append(pltpu.make_async_copy(
                    rows(liq, 0, i), baux.at[4, i], sem))
                copies.append(pltpu.make_async_copy(
                    rows(sol, 0, i), baux.at[5, i], sem))
            for cp in copies:
                cp.start()
            for cp in copies:
                cp.wait()

            # n3 = h * raw sums (the two-sweep path scales in XLA)
            for c in range(3):
                for i in range(2):
                    baux[1 + c, i] = baux[1 + c, i] * h

            # field map: 0 = xp, 1 = rho, 2 = n3, 3 = liq, 4 = sol
            # (_TensionAccel order)
            pair_sweep({0: (bxp, 0), 1: (baux, 0), 2: (baux, 1),
                        3: (baux, 4), 4: (baux, 5)}, t_emit, gated=False)

            wb = [pltpu.make_async_copy(bacc.at[c, i], rows(out_acc, c, i),
                                        sem)
                  for c in range(3) for i in range(2)]
            for cp in wb:
                cp.start()
            for cp in wb:
                cp.wait()

    NX, PP, nq = plan.NX, plan.PP, plan.nq
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(2, plan.gx, nq),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 7,
        out_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 2,
        scratch_shapes=[
            pltpu.VMEM((3, 2, C, Wq), jnp.float32),   # bxp
            pltpu.VMEM((6, 2, C, Wq), jnp.float32),   # baux
            pltpu.VMEM((3, 2, C, Wq), jnp.float32),   # bacc
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((3, NX, C, PP), jnp.float32),
            jax.ShapeDtypeStruct((3, NX, C, PP), jnp.float32),
        ],
        # indices count the scalar-prefetch operands: n_in = 7, acc_in = 8
        input_output_aliases={7: 0, 8: 1},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
    )


def _build_fused_iter_full(plan: _Plan, cfg: SimConfig, interpret: bool):
    """The WHOLE DFSPH divergence/pressure iteration in one pallas_call:
    on top of _build_fused_iter's two sweeps (kappa velocity update + drho)
    this variant also computes the per-iteration stiffness
    k = (S + kbias) * alpha_coef, accumulates kappa, applies the
    post-update (divergence clamp / advected-density clamp) to produce the
    NEXT carried S field, and reduces the global density error through a
    scalar SMEM accumulator — the loop body becomes ONE launch plus the
    tiny consts/cond scalars (the two-kernel body left ~3-4 full-size XLA
    thunks per iteration: k/kv elementwise, post clamp, error reduction —
    dfsph.py:449-485/518-547 are the reference's per-iteration kernels).

    Variant selection via ``consts`` (SMEM [dt, mode]):
      mode 0 (divergence): k = S * A;  S' = max(paux * acc, 0) with paux
              the min-neighbor gate;  err += sum liq S'.
      mode 1 (pressure):   k = (S - 1) * A;  S' = max(paux + dt * acc, 1)
              with paux = rho/rho0;  err += sum liq (S' - 1).
    alpha_coef (A) is liquid-masked (boundary-kappa parity), so stale S at
    liquid-free chunks can never leak into a pair term.  Phases: 0 = k/kv
    update + gated velocity RMW sweep (k' formed in VMEM) + acc zeroing;
    1 = drho sweep of the final velocity; 2 = core-lane post/error, with
    the finished error published by the grid's last program."""
    C, Q, Wq, nq = plan.C, plan.Q, plan.Wq, plan.nq
    h = cfg.support_radius
    M = _MARGIN

    k_emit = _KappaAcc.__new__(_KappaAcc)
    d_emit = _DivAcc.__new__(_DivAcc)

    def kernel(nz_ref, act_ref, consts, xp, vol, gate, A, paux,
               s_in, kv_in, vel_in, acc_in,
               out_vel, out_acc, out_s, out_kv, out_scal,
               bxp, bvol, baux, bacc, bcore, zrow, sacc, sem):
        del s_in, kv_in, vel_in, acc_in   # read through aliased output refs
        ph = pl.program_id(0)
        px = pl.program_id(1)
        q = pl.program_id(2)

        @pl.when((ph == 0) & (px == 0) & (q == 0))
        def _():
            zrow[...] = jnp.zeros(zrow.shape, zrow.dtype)
            sacc[0] = 0.0

        pair_sweep = _fused_pair_loop(plan, h, act_ref, px, q, bacc, baux)
        rows = _fused_rows(plan, px, q)

        def core(ref, comp):
            return ref.at[comp, px + 1, :, pl.ds(q * Q + M, Q)]

        @pl.when((nz_ref[px, q] != 0) & (ph == 0))
        def _():
            copies = []
            for c in range(3):
                for i in range(2):
                    copies.append(pltpu.make_async_copy(
                        rows(xp, c, i), bxp.at[c, i], sem))
                    copies.append(pltpu.make_async_copy(
                        rows(out_vel, c, i), bacc.at[c, i], sem))
            for i in range(2):
                copies.append(pltpu.make_async_copy(
                    rows(vol, 0, i), bvol.at[0, i], sem))
                copies.append(pltpu.make_async_copy(
                    rows(gate, 0, i), baux.at[0, i], sem))
                copies.append(pltpu.make_async_copy(
                    rows(out_s, 0, i), baux.at[1, i], sem))
                copies.append(pltpu.make_async_copy(
                    rows(A, 0, i), baux.at[2, i], sem))
            copies.append(pltpu.make_async_copy(
                core(out_kv, 0), bcore.at[0], sem))
            zcopies = [pltpu.make_async_copy(zrow.at[...],
                                             rows(out_acc, 0, i), sem)
                       for i in range(2)]
            for cp in copies + zcopies:
                cp.start()
            for cp in copies + zcopies:
                cp.wait()

            dt = consts[0]
            kbias = -consts[1]
            # kappa accumulation on own-core lanes, from the PRE-overwrite
            # S and A windows
            bcore[0] = bcore[0] + ((baux[1, 0, :, M:M + Q] + kbias)
                                   * baux[2, 0, :, M:M + Q])
            wkv = pltpu.make_async_copy(bcore.at[0], core(out_kv, 0), sem)
            wkv.start()
            # k' = dt * (S + kbias) * A, formed in VMEM for both rows
            for i in range(2):
                baux[1, i] = dt * (baux[1, i] + kbias) * baux[2, i]

            # field map (_KappaAcc order): 0 = xp, 1 = vol, 2 = k'
            pair_sweep({0: (bxp, 0), 1: (bvol, 0), 2: (baux, 1)}, k_emit,
                       gated=True)

            wb = [pltpu.make_async_copy(bacc.at[c, i], rows(out_vel, c, i),
                                        sem)
                  for c in range(3) for i in range(2)]
            for cp in wb:
                cp.start()
            for cp in wb:
                cp.wait()
            wkv.wait()

        @pl.when((nz_ref[px, q] != 0) & (ph == 1))
        def _():
            copies = []
            for c in range(3):
                for i in range(2):
                    copies.append(pltpu.make_async_copy(
                        rows(xp, c, i), bxp.at[c, i], sem))
                    copies.append(pltpu.make_async_copy(
                        rows(out_vel, c, i), baux.at[c, i], sem))
            for i in range(2):
                copies.append(pltpu.make_async_copy(
                    rows(vol, 0, i), bvol.at[0, i], sem))
                copies.append(pltpu.make_async_copy(
                    rows(out_acc, 0, i), bacc.at[0, i], sem))
            for cp in copies:
                cp.start()
            for cp in copies:
                cp.wait()

            # field map (_DivAcc order): 0 = xp, 1 = vol, 2 = vel3
            pair_sweep({0: (bxp, 0), 1: (bvol, 0), 2: (baux, 0)}, d_emit,
                       gated=False)

            wb = [pltpu.make_async_copy(bacc.at[0, i], rows(out_acc, 0, i),
                                        sem)
                  for i in range(2)]
            for cp in wb:
                cp.start()
            for cp in wb:
                cp.wait()

        @pl.when((nz_ref[px, q] != 0) & (ph == 2))
        def _():
            copies = [
                pltpu.make_async_copy(core(out_acc, 0), bcore.at[0], sem),
                pltpu.make_async_copy(core(paux, 0), bcore.at[1], sem),
                pltpu.make_async_copy(core(gate, 0), bcore.at[2], sem),
            ]
            for cp in copies:
                cp.start()
            for cp in copies:
                cp.wait()
            dt = consts[0]
            mode = consts[1]
            s_div = jnp.maximum(bcore[1] * bcore[0], 0.0)
            s_prs = jnp.maximum(bcore[1] + dt * bcore[0], 1.0)
            s_new = jnp.where(mode > 0.5, s_prs, s_div)
            bcore[0] = s_new
            sacc[0] = sacc[0] + jnp.sum(bcore[2] * (s_new - mode))
            wb = pltpu.make_async_copy(bcore.at[0], core(out_s, 0), sem)
            wb.start()
            wb.wait()

        @pl.when((ph == 2) & (px == plan.gx - 1) & (q == nq - 1))
        def _():
            out_scal[0] = sacc[0]

    NX, PP = plan.NX, plan.PP
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(3, plan.gx, nq),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.HBM)] * 9,
        out_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 4
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        scratch_shapes=[
            pltpu.VMEM((3, 2, C, Wq), jnp.float32),   # bxp
            pltpu.VMEM((1, 2, C, Wq), jnp.float32),   # bvol
            pltpu.VMEM((3, 2, C, Wq), jnp.float32),   # baux (gate,S/k',A | vel)
            pltpu.VMEM((3, 2, C, Wq), jnp.float32),   # bacc
            pltpu.VMEM((3, C, Q), jnp.float32),       # bcore (kv | acc,paux,liq)
            pltpu.VMEM((C, Wq), jnp.float32),         # zrow
            pltpu.SMEM((1,), jnp.float32),            # sacc (error)
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((3, NX, C, PP), jnp.float32),
            jax.ShapeDtypeStruct((1, NX, C, PP), jnp.float32),
            jax.ShapeDtypeStruct((1, NX, C, PP), jnp.float32),
            jax.ShapeDtypeStruct((1, NX, C, PP), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.float32),
        ],
        # indices count the scalar-prefetch operands: s_in = 8, kv_in = 9,
        # vel_in = 10, acc_in = 11
        input_output_aliases={10: 0, 11: 1, 8: 2, 9: 3},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
    )


def _build_fused_iisph_iter(plan: _Plan, cfg: SimConfig, interpret: bool):
    """The WHOLE IISPH Jacobi iteration in one pallas_call: the dij sweep,
    the s_i sweep, the per-iteration field prep (fac / p_liq / g, formed in
    VMEM from the carried pressure — the reference's per-iteration kernel
    pair, iisph.py:318-370), the relaxed-Jacobi pressure update and the
    global residual reduction (scalar SMEM accumulator).

    Four phases (sequential grid, phase axis slowest):
      phase 0: zero the dij and s rows later phases (and their neighbors'
               mirror emits) accumulate into — both outputs are pure sums,
               and an accumulating phase cannot also zero (it would wipe
               earlier programs' mirror contributions).
      phase 1: dij_pj = sum_j fac_j gs r (half-window, RMW accumulate),
               fac = -liq * deninv * p computed on the buffered rows.
      phase 2: s_i (dual-sided _IisphS.sym) reading dij home+neighbor rows
               from the phase-1 output; p_liq = liq * p and g = deninv * p
               computed on the buffered rows.
      phase 3: own-core relaxed-Jacobi update
               p' = ok ? max((1-w) p + w/(a_ii dt^2) (b - dt^2 s), 0) : 0
               and the residual partial sum liq * ((a_ii p' + s) dt^2 - b)
               gated on p' != 0; the finished sum is published by the
               grid's last program.

    Runs on the FINE plan (the s body is the VMEM-heaviest sym kernel —
    see SweepEngine.iisph_s).  dij/s alias dead caller seeds; p aliases the
    carried pressure (margins and liquid-free chunks keep their values —
    their fac/p_liq/g are zero because the warm-start pressure is zero at
    non-liquid slots and deninv/liq mask them).  Scalar operand ``consts``
    (SMEM): [dt]."""
    C, Q, Wq, nq = plan.C, plan.Q, plan.Wq, plan.nq
    h = cfg.support_radius
    M = _MARGIN
    omega = cfg.iisph_omega
    eps = cfg.eps

    dij_emit = _IisphDij(cfg)
    s_emit = _IisphS(cfg)

    def kernel(nz_ref, act_ref, consts, xp, liq, sol, dii, deninv, aii,
               bfld, p_in, dij_in, s_in, out_dij, out_s, out_p, out_scal,
               bxp, bA, bB, bC, bacc, bcore, zrow, sacc, sem):
        del p_in, dij_in, s_in  # read through their aliased output refs
        ph = pl.program_id(0)
        px = pl.program_id(1)
        q = pl.program_id(2)

        @pl.when((ph == 0) & (px == 0) & (q == 0))
        def _():
            zrow[...] = jnp.zeros(zrow.shape, zrow.dtype)
            sacc[0] = 0.0

        pair_sweep = _fused_pair_loop(plan, h, act_ref, px, q, bacc, None)
        rows = _fused_rows(plan, px, q)

        def core(ref, comp):
            return ref.at[comp, px + 1, :, pl.ds(q * Q + M, Q)]

        @pl.when((nz_ref[px, q] != 0) & (ph == 0))
        def _():
            zc = [pltpu.make_async_copy(zrow.at[...], rows(out_dij, c, i),
                                        sem)
                  for c in range(3) for i in range(2)]
            zc += [pltpu.make_async_copy(zrow.at[...], rows(out_s, 0, i),
                                         sem) for i in range(2)]
            for cp in zc:
                cp.start()
            for cp in zc:
                cp.wait()

        @pl.when((nz_ref[px, q] != 0) & (ph == 1))
        def _():
            copies = []
            for c in range(3):
                for i in range(2):
                    copies.append(pltpu.make_async_copy(
                        rows(xp, c, i), bxp.at[c, i], sem))
            for i in range(2):
                copies.append(pltpu.make_async_copy(
                    rows(out_p, 0, i), bC.at[0, i], sem))
                copies.append(pltpu.make_async_copy(
                    rows(deninv, 0, i), bC.at[1, i], sem))
                copies.append(pltpu.make_async_copy(
                    rows(liq, 0, i), bC.at[2, i], sem))
                copies.append(pltpu.make_async_copy(
                    rows(out_dij, 0, i), bacc.at[0, i], sem))
                copies.append(pltpu.make_async_copy(
                    rows(out_dij, 1, i), bacc.at[1, i], sem))
                copies.append(pltpu.make_async_copy(
                    rows(out_dij, 2, i), bacc.at[2, i], sem))
            for cp in copies:
                cp.start()
            for cp in copies:
                cp.wait()
            # fac = -liq * deninv * p on the buffered rows
            for i in range(2):
                bC[0, i] = -bC[2, i] * bC[1, i] * bC[0, i]

            # field map: 0 = xp, 1 = fac (_IisphDij order)
            pair_sweep({0: (bxp, 0), 1: (bC, 0)}, dij_emit, gated=False)

            wb = [pltpu.make_async_copy(bacc.at[c, i], rows(out_dij, c, i),
                                        sem)
                  for c in range(3) for i in range(2)]
            for cp in wb:
                cp.start()
            for cp in wb:
                cp.wait()

        @pl.when((nz_ref[px, q] != 0) & (ph == 2))
        def _():
            copies = []
            for c in range(3):
                for i in range(2):
                    copies.append(pltpu.make_async_copy(
                        rows(xp, c, i), bxp.at[c, i], sem))
                    copies.append(pltpu.make_async_copy(
                        rows(dii, c, i), bB.at[c, i], sem))
                    # the FINAL dij field (all phase-1 programs ran)
                    copies.append(pltpu.make_async_copy(
                        rows(out_dij, c, i), bA.at[c, i], sem))
            for i in range(2):
                copies.append(pltpu.make_async_copy(
                    rows(out_p, 0, i), bC.at[0, i], sem))
                copies.append(pltpu.make_async_copy(
                    rows(deninv, 0, i), bC.at[1, i], sem))
                copies.append(pltpu.make_async_copy(
                    rows(liq, 0, i), bC.at[2, i], sem))
                copies.append(pltpu.make_async_copy(
                    rows(sol, 0, i), bC.at[3, i], sem))
                copies.append(pltpu.make_async_copy(
                    rows(out_s, 0, i), bacc.at[0, i], sem))
            for cp in copies:
                cp.start()
            for cp in copies:
                cp.wait()
            # g = deninv * p; p_liq = liq * p (order matters: g first)
            for i in range(2):
                bC[1, i] = bC[1, i] * bC[0, i]
                bC[0, i] = bC[2, i] * bC[0, i]

            # field map (_IisphS order): 0 = xp, 1 = dii, 2 = dij,
            # 3 = p_liq, 4 = g, 5 = liq, 6 = sol
            pair_sweep({0: (bxp, 0), 1: (bB, 0), 2: (bA, 0), 3: (bC, 0),
                        4: (bC, 1), 5: (bC, 2), 6: (bC, 3)}, s_emit,
                       gated=False)

            wb = [pltpu.make_async_copy(bacc.at[0, i], rows(out_s, 0, i),
                                        sem)
                  for i in range(2)]
            for cp in wb:
                cp.start()
            for cp in wb:
                cp.wait()

        @pl.when((nz_ref[px, q] != 0) & (ph == 3))
        def _():
            copies = [
                pltpu.make_async_copy(core(out_p, 0), bcore.at[0], sem),
                pltpu.make_async_copy(core(out_s, 0), bcore.at[1], sem),
                pltpu.make_async_copy(core(aii, 0), bcore.at[2], sem),
                pltpu.make_async_copy(core(bfld, 0), bcore.at[3], sem),
                pltpu.make_async_copy(core(liq, 0), bcore.at[4], sem),
            ]
            for cp in copies:
                cp.start()
            for cp in copies:
                cp.wait()
            dt = consts[0]
            h2 = dt * dt
            denom = bcore[2] * h2
            ok = jnp.abs(denom) > eps
            p_new = jnp.maximum(
                (1.0 - omega) * bcore[0]
                + omega / jnp.where(ok, denom, 1.0)
                * (bcore[3] - h2 * bcore[1]), 0.0)
            p_new = jnp.where(ok, p_new, 0.0)
            resid = jnp.where(p_new != 0.0,
                              (bcore[2] * p_new + bcore[1]) * h2 - bcore[3],
                              0.0)
            sacc[0] = sacc[0] + jnp.sum(bcore[4] * resid)
            bcore[0] = p_new
            wb = pltpu.make_async_copy(bcore.at[0], core(out_p, 0), sem)
            wb.start()
            wb.wait()

        @pl.when((ph == 3) & (px == plan.gx - 1) & (q == nq - 1))
        def _():
            out_scal[0] = sacc[0]

    NX, PP = plan.NX, plan.PP
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(4, plan.gx, nq),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.HBM)] * 10,
        out_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 3
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        scratch_shapes=[
            pltpu.VMEM((3, 2, C, Wq), jnp.float32),   # bxp
            pltpu.VMEM((3, 2, C, Wq), jnp.float32),   # bA (dij)
            pltpu.VMEM((3, 2, C, Wq), jnp.float32),   # bB (dii)
            pltpu.VMEM((4, 2, C, Wq), jnp.float32),   # bC (p/fac, deninv/g,
                                                      #     liq, sol)
            pltpu.VMEM((3, 2, C, Wq), jnp.float32),   # bacc
            pltpu.VMEM((5, C, Q), jnp.float32),       # bcore (p,s,aii,b,liq)
            pltpu.VMEM((C, Wq), jnp.float32),         # zrow
            pltpu.SMEM((1,), jnp.float32),            # sacc (residual)
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((3, NX, C, PP), jnp.float32),
            jax.ShapeDtypeStruct((1, NX, C, PP), jnp.float32),
            jax.ShapeDtypeStruct((1, NX, C, PP), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.float32),
        ],
        # indices count the scalar-prefetch operands: p_in = 10, dij_in =
        # 11, s_in = 12
        input_output_aliases={11: 0, 12: 1, 10: 2},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
    )


def _build_fused_pcisph_iter(plan: _Plan, cfg: SimConfig, interpret: bool):
    """One pallas_call per PCISPH prediction iteration: the predicted-density
    sweep, the stiffness pressure update and the pressure-acceleration sweep
    (the reference's per-iteration update_iter_info + predict_density kernel
    pair, pcisph.py:228-278) run as phases of ONE sequential-grid Mosaic
    program.  The two-kernel path launches TWO full sweeps per iteration
    (solvers/pcisph.py body: pcisph_predict with the old pressure for adv,
    then again with the updated pressure for the acceleration) plus the XLA
    pressure update and a full HBM xstar materialization; here the starred
    positions are formed IN VMEM from the xp and vel_star rows, and the
    pressure update happens between the phases on the already-resident rows.

    Phases (sequential grid, phase axis slowest):
      phase 0: zero the adv and acc rows later phases RMW-accumulate into.
      phase 1: adv_raw[i] += sum_j V_j W(|xstar_i - xstar_j|) (half-window,
               dual-sided emits).
      phase 2: per-row p' = p + factor * (max(w0 + adv_raw, 1) - 1) with
               adv_raw FINAL (all phase-1 programs ran); p' is written back
               for the program's OWN plane core lanes only (disjoint
               coverage — a full-window write would double-update the
               overlap lanes a later q-chunk re-reads), and the
               acceleration sweep runs with p' at home AND neighbor rows
               (locally recomputed — deterministic, so every program sees
               identical p' values regardless of write-back order).

    Scalar operand ``consts`` (SMEM): [dt, factor = pci_coff/dt^2, w0].
    Output aliasing: adv/acc alias dead caller seeds; p' aliases the
    pressure input (margins and never-written rows keep their values; pp at
    non-liquid slots is never consumed — see _PcisphPredict._coeffs).  The
    global density error sum liq (max(w0 + adv, 1) - 1) accumulates into a
    scalar SMEM scratch during phase 2 and is published by the grid's last
    program.  Runs on the FINE plan (13 scratch row-buffers + the acc
    body's pair temporaries).  Accumulation order differs from the
    two-kernel path, so differential tests are tolerance-based like every
    engine-vs-XLA test."""
    C, Q, Wq, nq = plan.C, plan.Q, plan.Wq, plan.nq
    h = cfg.support_radius
    M = _MARGIN

    adv_emit = _PcisphAdvPart(cfg)
    acc_emit = _PcisphAccPart(cfg)

    def kernel(nz_ref, act_ref, consts, xp, vs, vol, liq, sol,
               pp_in, adv_in, acc_in, out_adv, out_acc, out_pp, out_scal,
               bxs, bvs, bvol, bC, bacc, zrow, sacc, sem):
        del pp_in, adv_in, acc_in   # read through their aliased output refs
        ph = pl.program_id(0)
        px = pl.program_id(1)
        q = pl.program_id(2)

        @pl.when((ph == 0) & (px == 0) & (q == 0))
        def _():
            zrow[...] = jnp.zeros(zrow.shape, zrow.dtype)
            sacc[0] = 0.0

        pair_sweep = _fused_pair_loop(plan, h, act_ref, px, q, bacc, None)
        rows = _fused_rows(plan, px, q)

        def starred():
            # xstar rows in VMEM: liquid slots advect by vel_star * dt;
            # solids and EMPTY_POS sentinels stay put (liq gate 0)
            dt = consts[0]
            for c in range(3):
                for i in range(2):
                    bxs[c, i] = bxs[c, i] + bC[1, i] * bvs[c, i] * dt

        @pl.when((nz_ref[px, q] != 0) & (ph == 0))
        def _():
            zc = [pltpu.make_async_copy(zrow.at[...], rows(out_adv, 0, i),
                                        sem) for i in range(2)]
            zc += [pltpu.make_async_copy(zrow.at[...], rows(out_acc, c, i),
                                         sem)
                   for c in range(3) for i in range(2)]
            for cp in zc:
                cp.start()
            for cp in zc:
                cp.wait()

        @pl.when((nz_ref[px, q] != 0) & (ph == 1))
        def _():
            copies = []
            for c in range(3):
                for i in range(2):
                    copies.append(pltpu.make_async_copy(
                        rows(xp, c, i), bxs.at[c, i], sem))
                    copies.append(pltpu.make_async_copy(
                        rows(vs, c, i), bvs.at[c, i], sem))
            for i in range(2):
                copies.append(pltpu.make_async_copy(
                    rows(vol, 0, i), bvol.at[0, i], sem))
                copies.append(pltpu.make_async_copy(
                    rows(liq, 0, i), bC.at[1, i], sem))
                # accumulation base (earlier programs' mirror emits)
                copies.append(pltpu.make_async_copy(
                    rows(out_adv, 0, i), bacc.at[0, i], sem))
            for cp in copies:
                cp.start()
            for cp in copies:
                cp.wait()

            starred()
            # field map (_PcisphPredict order): 0 = xstar, 1 = vol
            pair_sweep({0: (bxs, 0), 1: (bvol, 0)}, adv_emit, gated=False)

            wb = [pltpu.make_async_copy(bacc.at[0, i], rows(out_adv, 0, i),
                                        sem) for i in range(2)]
            for cp in wb:
                cp.start()
            for cp in wb:
                cp.wait()

        @pl.when((nz_ref[px, q] != 0) & (ph == 2))
        def _():
            copies = []
            for c in range(3):
                for i in range(2):
                    copies.append(pltpu.make_async_copy(
                        rows(xp, c, i), bxs.at[c, i], sem))
                    copies.append(pltpu.make_async_copy(
                        rows(vs, c, i), bvs.at[c, i], sem))
                    copies.append(pltpu.make_async_copy(
                        rows(out_acc, c, i), bacc.at[c, i], sem))
            for i in range(2):
                # the FINAL adv field (all phase-1 programs ran)
                copies.append(pltpu.make_async_copy(
                    rows(out_adv, 0, i), bvol.at[0, i], sem))
                # ORIGINAL pressure rows (phase-2 programs write only their
                # own plane's core lanes, which no later program re-reads)
                copies.append(pltpu.make_async_copy(
                    rows(out_pp, 0, i), bC.at[0, i], sem))
                copies.append(pltpu.make_async_copy(
                    rows(liq, 0, i), bC.at[1, i], sem))
                copies.append(pltpu.make_async_copy(
                    rows(sol, 0, i), bC.at[2, i], sem))
            for cp in copies:
                cp.start()
            for cp in copies:
                cp.wait()

            starred()
            factor = consts[1]
            w0 = consts[2]
            # density error of the OWN core lanes (disjoint coverage);
            # published by the grid's last program below
            sacc[0] = sacc[0] + jnp.sum(
                bC[1, 0, :, M:M + Q]
                * (jnp.maximum(w0 + bvol[0, 0, :, M:M + Q], 1.0) - 1.0))
            for i in range(2):
                bC[0, i] = bC[0, i] + factor * (
                    jnp.maximum(w0 + bvol[0, i], 1.0) - 1.0)
            # own-plane core write-back of p' (disjoint across programs)
            wpp = pltpu.make_async_copy(
                bC.at[0, 0, :, M:M + Q],
                out_pp.at[0, px + 1, :, pl.ds(q * Q + M, Q)], sem)
            wpp.start()

            # field map (_PcisphPredict order): 0 = xstar, 2 = p', 3 = liq,
            # 4 = sol
            pair_sweep({0: (bxs, 0), 2: (bC, 0), 3: (bC, 1), 4: (bC, 2)},
                       acc_emit, gated=False)

            wb = [pltpu.make_async_copy(bacc.at[c, i], rows(out_acc, c, i),
                                        sem)
                  for c in range(3) for i in range(2)]
            for cp in wb:
                cp.start()
            for cp in wb:
                cp.wait()
            wpp.wait()

        @pl.when((ph == 2) & (px == plan.gx - 1) & (q == nq - 1))
        def _():
            out_scal[0] = sacc[0]

    NX, PP = plan.NX, plan.PP
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(3, plan.gx, nq),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.HBM)] * 8,
        out_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 3
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        scratch_shapes=[
            pltpu.VMEM((3, 2, C, Wq), jnp.float32),   # bxs (xstar)
            pltpu.VMEM((3, 2, C, Wq), jnp.float32),   # bvs (vel_star)
            pltpu.VMEM((1, 2, C, Wq), jnp.float32),   # bvol (vol | adv)
            pltpu.VMEM((3, 2, C, Wq), jnp.float32),   # bC (p', liq, sol)
            pltpu.VMEM((3, 2, C, Wq), jnp.float32),   # bacc
            pltpu.VMEM((C, Wq), jnp.float32),         # zrow
            pltpu.SMEM((1,), jnp.float32),            # sacc (error)
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((1, NX, C, PP), jnp.float32),
            jax.ShapeDtypeStruct((3, NX, C, PP), jnp.float32),
            jax.ShapeDtypeStruct((1, NX, C, PP), jnp.float32),
            jax.ShapeDtypeStruct((1,), jnp.float32),
        ],
        # indices count the scalar-prefetch operands: pp_in = 8, adv_in = 9,
        # acc_in = 10
        input_output_aliases={9: 0, 10: 1, 8: 2},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
    )


def _build_fused_visc_iter(plan: _Plan, cfg: SimConfig, interpret: bool):
    """One pallas_call per viscosity-PCG iteration: matvec sweep, BOTH
    global dot products, and the x/r/d vector updates (the reference's
    compute_viscosity_force kernel + its atomic-add scalar reductions,
    dfsph.py:226-246) in ONE sequential-grid Mosaic program.

    The PCG body is the last solver loop whose iteration was several
    launches (matvec sweep + fold + ad finalize + 2 reductions + 3 axpys +
    preconditioner apply); on the remote-TPU platform each pays a launch
    gap.  The sequential grid makes in-kernel GLOBAL reductions legal: a
    scalar SMEM scratch accumulates per-program partial dots, and any later
    PHASE reads the finished total.

    Phases (sequential grid, phase axis slowest):
      phase 0: zero the acc rows (+ the scalar accumulators once).
      phase 1: acc += sum_j c (d_i - d_j).r gs r   (_ViscAcc.sym half-window
               sweep, overlap-add RMW — identical pair math to the
               two-kernel path).
      phase 2: ad = d - acc * dt/rho on own-core lanes; sacc[0] += the
               program's liquid-masked partial of (d . ad).
      phase 3: alpha = delta / (eps + sacc[0]);  x' = x + alpha d;
               r' = liq * (r - alpha ad)  (the liquid mask preserves the
               engine contract r = d = 0 at non-liquid slots — the matvec
               reads NEIGHBOR d rows unmasked);  s = Minv r';
               sacc[1] += liquid-masked partial of (r' . s).
      phase 4: beta = sacc[1] / delta;  d' = liq * (s + beta d);  publish
               [d_ad, delta'] to the scalar output (idempotent writes).

    Elementwise phases touch OWN-CORE lanes only ((C, Q) per program,
    disjoint coverage) — no overlap-add, no cross-program hazards.  alpha
    and beta are recomputed per program from the finished SMEM totals
    (deterministic).  Scalar operand ``consts`` (SMEM): [dt, delta].
    x/r/d alias their inputs; acc aliases a dead seed cycled through the
    while_loop carry; reduction ORDER of the dots differs from the XLA
    lsum, so convergence tests are tolerance-based."""
    C, Q, Wq, nq = plan.C, plan.Q, plan.Wq, plan.nq
    h = cfg.support_radius
    M = _MARGIN
    eps = cfg.eps

    v_emit = _ViscAcc(cfg)

    def kernel(nz_ref, act_ref, consts, xp, rinv, liq, sol, minv,
               x_in, r_in, d_in, acc_in, out_x, out_r, out_d, out_acc,
               out_scal, bxp, bd, bA, bacc, bX, bR, bD, bC2, bS, bM, zrow,
               sacc, sem):
        del x_in, r_in, d_in, acc_in    # read through aliased output refs
        ph = pl.program_id(0)
        px = pl.program_id(1)
        q = pl.program_id(2)

        @pl.when((ph == 0) & (px == 0) & (q == 0))
        def _():
            zrow[...] = jnp.zeros(zrow.shape, zrow.dtype)
            sacc[0] = 0.0
            sacc[1] = 0.0

        pair_sweep = _fused_pair_loop(plan, h, act_ref, px, q, bacc, None)
        rows = _fused_rows(plan, px, q)

        def core(ref, comp):
            return ref.at[comp, px + 1, :, pl.ds(q * Q + M, Q)]

        def load_core(pairs_list):
            cps = [pltpu.make_async_copy(core(ref, comp), buf.at[k], sem)
                   for ref, comp, buf, k in pairs_list]
            for cp in cps:
                cp.start()
            for cp in cps:
                cp.wait()

        def ad_core():
            dt = consts[0]
            return [bD[c] - bC2[c] * (dt * bS[0]) for c in range(3)]

        @pl.when((nz_ref[px, q] != 0) & (ph == 0))
        def _():
            zc = [pltpu.make_async_copy(zrow.at[...], rows(out_acc, c, i),
                                        sem)
                  for c in range(3) for i in range(2)]
            for cp in zc:
                cp.start()
            for cp in zc:
                cp.wait()

        @pl.when((nz_ref[px, q] != 0) & (ph == 1))
        def _():
            copies = []
            for c in range(3):
                for i in range(2):
                    copies.append(pltpu.make_async_copy(
                        rows(xp, c, i), bxp.at[c, i], sem))
                    copies.append(pltpu.make_async_copy(
                        rows(out_d, c, i), bd.at[c, i], sem))
                    copies.append(pltpu.make_async_copy(
                        rows(out_acc, c, i), bacc.at[c, i], sem))
            for i in range(2):
                copies.append(pltpu.make_async_copy(
                    rows(rinv, 0, i), bA.at[0, i], sem))
                copies.append(pltpu.make_async_copy(
                    rows(liq, 0, i), bA.at[1, i], sem))
                copies.append(pltpu.make_async_copy(
                    rows(sol, 0, i), bA.at[2, i], sem))
            for cp in copies:
                cp.start()
            for cp in copies:
                cp.wait()

            # field map (_ViscAcc order): 0 = xp, 1 = d, 2 = rinv, 3 = liq,
            # 4 = sol
            pair_sweep({0: (bxp, 0), 1: (bd, 0), 2: (bA, 0), 3: (bA, 1),
                        4: (bA, 2)}, v_emit, gated=False)

            wb = [pltpu.make_async_copy(bacc.at[c, i], rows(out_acc, c, i),
                                        sem)
                  for c in range(3) for i in range(2)]
            for cp in wb:
                cp.start()
            for cp in wb:
                cp.wait()

        @pl.when((nz_ref[px, q] != 0) & (ph == 2))
        def _():
            load_core([(out_d, c, bD, c) for c in range(3)]
                      + [(out_acc, c, bC2, c) for c in range(3)]
                      + [(rinv, 0, bS, 0), (liq, 0, bS, 1)])
            ad = ad_core()
            part = jnp.sum(bS[1] * sum(bD[c] * ad[c] for c in range(3)))
            sacc[0] = sacc[0] + part

        @pl.when((nz_ref[px, q] != 0) & (ph == 3))
        def _():
            load_core([(out_x, c, bX, c) for c in range(3)]
                      + [(out_r, c, bR, c) for c in range(3)]
                      + [(out_d, c, bD, c) for c in range(3)]
                      + [(out_acc, c, bC2, c) for c in range(3)]
                      + [(rinv, 0, bS, 0), (liq, 0, bS, 1)]
                      + [(minv, c, bM, c) for c in range(6)])
            ad = ad_core()
            alpha = consts[1] / (eps + sacc[0])
            lq = bS[1]
            rn = []
            for c in range(3):
                bX[c] = bX[c] + alpha * bD[c]
                rn.append(lq * (bR[c] - alpha * ad[c]))
                bR[c] = rn[c]
            s = (bM[0] * rn[0] + bM[1] * rn[1] + bM[2] * rn[2],
                 bM[1] * rn[0] + bM[3] * rn[1] + bM[4] * rn[2],
                 bM[2] * rn[0] + bM[4] * rn[1] + bM[5] * rn[2])
            part = jnp.sum(lq * sum(rn[c] * s[c] for c in range(3)))
            sacc[1] = sacc[1] + part
            wb = [pltpu.make_async_copy(bX.at[c], core(out_x, c), sem)
                  for c in range(3)]
            wb += [pltpu.make_async_copy(bR.at[c], core(out_r, c), sem)
                   for c in range(3)]
            for cp in wb:
                cp.start()
            for cp in wb:
                cp.wait()

        @pl.when(ph == 4)
        def _():
            @pl.when((px == 0) & (q == 0))
            def _():
                out_scal[0] = eps + sacc[0]
                out_scal[1] = sacc[1]

            @pl.when(nz_ref[px, q] != 0)
            def _():
                load_core([(out_r, c, bR, c) for c in range(3)]
                          + [(out_d, c, bD, c) for c in range(3)]
                          + [(liq, 0, bS, 1)]
                          + [(minv, c, bM, c) for c in range(6)])
                beta = sacc[1] / consts[1]
                lq = bS[1]
                s = (bM[0] * bR[0] + bM[1] * bR[1] + bM[2] * bR[2],
                     bM[1] * bR[0] + bM[3] * bR[1] + bM[4] * bR[2],
                     bM[2] * bR[0] + bM[4] * bR[1] + bM[5] * bR[2])
                for c in range(3):
                    bD[c] = lq * (s[c] + beta * bD[c])
                wb = [pltpu.make_async_copy(bD.at[c], core(out_d, c), sem)
                      for c in range(3)]
                for cp in wb:
                    cp.start()
                for cp in wb:
                    cp.wait()

    NX, PP = plan.NX, plan.PP
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(5, plan.gx, nq),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [pl.BlockSpec(memory_space=pltpu.HBM)] * 9,
        out_specs=[pl.BlockSpec(memory_space=pltpu.HBM)] * 4
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        scratch_shapes=[
            pltpu.VMEM((3, 2, C, Wq), jnp.float32),   # bxp
            pltpu.VMEM((3, 2, C, Wq), jnp.float32),   # bd (sweep d rows)
            pltpu.VMEM((3, 2, C, Wq), jnp.float32),   # bA (rinv|liq|sol)
            pltpu.VMEM((3, 2, C, Wq), jnp.float32),   # bacc
            pltpu.VMEM((3, C, Q), jnp.float32),       # bX core
            pltpu.VMEM((3, C, Q), jnp.float32),       # bR core
            pltpu.VMEM((3, C, Q), jnp.float32),       # bD core
            pltpu.VMEM((3, C, Q), jnp.float32),       # bC2 core (acc)
            pltpu.VMEM((2, C, Q), jnp.float32),       # bS core (rinv|liq)
            pltpu.VMEM((6, C, Q), jnp.float32),       # bM core (Minv)
            pltpu.VMEM((C, Wq), jnp.float32),         # zrow
            pltpu.SMEM((2,), jnp.float32),            # sacc (dots)
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((3, NX, C, PP), jnp.float32),
            jax.ShapeDtypeStruct((3, NX, C, PP), jnp.float32),
            jax.ShapeDtypeStruct((3, NX, C, PP), jnp.float32),
            jax.ShapeDtypeStruct((3, NX, C, PP), jnp.float32),
            jax.ShapeDtypeStruct((2,), jnp.float32),
        ],
        # indices count the scalar-prefetch operands: x_in = 8, r_in = 9,
        # d_in = 10, acc_in = 11
        input_output_aliases={8: 0, 9: 1, 10: 2, 11: 3},
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary")),
    )


# ---------------------------------------------------------------------------
# Op bodies (each mirrors its dense_ops twin; reference cites live there)
# ---------------------------------------------------------------------------

class _Emit:
    """Base: carries the static constants every body needs."""

    def __init__(self, cfg: SimConfig):
        self.cfg = cfg
        self.h = cfg.support_radius
        self.h2 = self.h * self.h


class _DensityAlpha(_Emit):
    """rho + neighbor count + DFSPH alpha sums (dense_ops.density_stats).
    Channels: [rho_acc, count, sgx, sgy, sgz, sq]."""

    n_out = 6
    fields = ("vol", "liq")

    def __call__(self, ctx: PairCtx):
        cfg = self.cfg
        vj = ctx.nbr(1)
        wk = ctx.w()
        gs = ctx.gs()
        vgs = vj * gs
        liq_j = ctx.nbr(2)
        lv2 = (cfg.liquid_volume ** 2) * liq_j * gs * gs
        return [
            jnp.sum(vj * wk, axis=1),
            jnp.sum(ctx.mask.astype(jnp.float32), axis=1),
            jnp.sum(vgs * ctx.r[0], axis=1),
            jnp.sum(vgs * ctx.r[1], axis=1),
            jnp.sum(vgs * ctx.r[2], axis=1),
            jnp.sum(lv2 * ctx.d2, axis=1),
        ]

    def sym(self, ctx: PairCtx):
        return _DensityAlphaSym.channels(self, ctx)


class _DensityAlphaSym:
    """Shared dual-sided body for the density channels (used by the sym
    variants of _DensityAlpha / _DensityAlphaDrho)."""

    @staticmethod
    def channels(self, ctx: PairCtx):
        cfg = self.cfg
        wk = ctx.w()
        gs = ctx.gs()
        vj = ctx.nbr(1)
        vh = ctx.home(1)
        liq_j = ctx.nbr(2)
        liq_h = ctx.home(2)
        cntf = ctx.mask.astype(jnp.float32)
        lv2 = (cfg.liquid_volume ** 2) * gs * gs * ctx.d2
        home = [jnp.sum(vj * wk, axis=1), jnp.sum(cntf, axis=1)]
        mirr = [jnp.sum(vh * wk, axis=0), jnp.sum(cntf, axis=0)]
        for c in range(3):
            home.append(jnp.sum(vj * gs * ctx.r[c], axis=1))
            mirr.append(-jnp.sum(vh * gs * ctx.r[c], axis=0))
        home.append(jnp.sum(liq_j * lv2, axis=1))
        mirr.append(jnp.sum(liq_h * lv2, axis=0))
        return home, mirr


class _DensityAlphaDrho(_Emit):
    """_DensityAlpha plus the divergence accumulation of the CURRENT packed
    velocity as a 7th channel — fuses the divergence warm start's drho pass
    (dfsph.py:415-439) into the density sweep (one sweep saved per step)."""

    n_out = 7
    fields = ("vol", "liq", "vel3")

    def __call__(self, ctx: PairCtx):
        out = _DensityAlpha.__call__(self, ctx)
        dv_dot = sum((ctx.home(3, c) - ctx.nbr(3, c)) * ctx.r[c]
                     for c in range(3))
        out.append(jnp.sum(ctx.nbr(1) * ctx.gs() * dv_dot, axis=1))
        return out

    def sym(self, ctx: PairCtx):
        home, mirr = _DensityAlphaSym.channels(self, ctx)
        dv_dot = sum((ctx.home(3, c) - ctx.nbr(3, c)) * ctx.r[c]
                     for c in range(3))
        f = ctx.gs() * dv_dot
        home.append(jnp.sum(ctx.nbr(1) * f, axis=1))
        mirr.append(jnp.sum(ctx.home(1) * f, axis=0))
        return home, mirr


class _KappaAcc(_Emit):
    """acc = sum_j V_j (k_i + k_j) gs r (dense_ops.kappa_velocity_update;
    caller applies vel + dt * acc)."""

    n_out = 3
    fields = ("vol", "k")

    def __call__(self, ctx: PairCtx):
        cfac = ctx.nbr(1) * (ctx.home(2) + ctx.nbr(2)) * ctx.gs()
        return [jnp.sum(cfac * ctx.r[c], axis=1) for c in range(3)]

    def sym(self, ctx: PairCtx):
        """Dual-sided: F = (k_i + k_j) gs r is shared; the home receiver
        weights by V_j, the mirror receiver by -V_i (dense_ops twin)."""
        ksum_gs = (ctx.home(2) + ctx.nbr(2)) * ctx.gs()
        vj = ctx.nbr(1)
        vh = ctx.home(1)
        home, mirr = [], []
        for c in range(3):
            f = ksum_gs * ctx.r[c]
            home.append(jnp.sum(vj * f, axis=1))
            mirr.append(-jnp.sum(vh * f, axis=0))
        return home, mirr


class _DivAcc(_Emit):
    """acc = sum_j V_j gs (v_i - v_j).r (dense_ops._div_accum)."""

    n_out = 1
    fields = ("vol", "vel3")

    def __call__(self, ctx: PairCtx):
        dv_dot = sum((ctx.home(2, c) - ctx.nbr(2, c)) * ctx.r[c]
                     for c in range(3))
        return [jnp.sum(ctx.nbr(1) * ctx.gs() * dv_dot, axis=1)]

    def sym(self, ctx: PairCtx):
        """gs (v_i - v_j).r double-flips under i<->j: both receivers get a
        plus sign; only the volume weight swaps."""
        dv_dot = sum((ctx.home(2, c) - ctx.nbr(2, c)) * ctx.r[c]
                     for c in range(3))
        f = ctx.gs() * dv_dot
        return ([jnp.sum(ctx.nbr(1) * f, axis=1)],
                [jnp.sum(ctx.home(1) * f, axis=0)])


class _ViscAcc(_Emit):
    """Viscosity matvec accumulation (dense_ops.visc_matvec; caller applies
    x - acc * dt / rho_i).  Channels: [ax, ay, az].  Field 2 is RECIPROCAL
    density (1/max(rho,1)) so the pair coefficient costs one division
    (1/denom) instead of three."""

    n_out = 3
    fields = ("xv3", "rho_inv", "liq", "sol")

    def __call__(self, ctx: PairCtx):
        cfg = self.cfg
        a_liq = cfg.dim_coff * cfg.viscosity * cfg.liquid_mass
        b_sol = (cfg.dim_coff * cfg.viscosity_b * cfg.rest_density
                 * cfg.solid_volume)
        denom = ctx.d2 + 0.01 * self.h2
        coeff = (ctx.nbr(3) * a_liq * ctx.nbr(2)
                 + ctx.nbr(4) * b_sol * ctx.home(2)) / denom
        dxr = sum((ctx.home(1, c) - ctx.nbr(1, c)) * ctx.r[c]
                  for c in range(3))
        cfac = coeff * dxr * ctx.gs()
        return [jnp.sum(cfac * ctx.r[c], axis=1) for c in range(3)]

    def _sym_coeffs(self, ctx: PairCtx):
        """(c_hn, c_nh, gs, dxr): receiver/source pair coefficients for both
        sides (one reciprocal of the shared denominator), the masked gradW
        factor and the (x_i - x_j).r dot (double-flip symmetric)."""
        cfg = self.cfg
        a_liq = cfg.dim_coff * cfg.viscosity * cfg.liquid_mass
        b_sol = (cfg.dim_coff * cfg.viscosity_b * cfg.rest_density
                 * cfg.solid_volume)
        rd = 1.0 / (ctx.d2 + 0.01 * self.h2)
        c_hn = (ctx.nbr(3) * a_liq * ctx.nbr(2)
                + ctx.nbr(4) * b_sol * ctx.home(2)) * rd
        c_nh = (ctx.home(3) * a_liq * ctx.home(2)
                + ctx.home(4) * b_sol * ctx.nbr(2)) * rd
        dxr = sum((ctx.home(1, c) - ctx.nbr(1, c)) * ctx.r[c]
                  for c in range(3))
        return c_hn, c_nh, ctx.gs(), dxr

    def sym(self, ctx: PairCtx):
        c_hn, c_nh, gs, dxr = self._sym_coeffs(ctx)
        fh = c_hn * dxr * gs
        fn = c_nh * dxr * gs
        home = [jnp.sum(fh * ctx.r[c], axis=1) for c in range(3)]
        mirr = [-jnp.sum(fn * ctx.r[c], axis=0) for c in range(3)]
        return home, mirr


class _ViscInit(_Emit):
    """Fused PCG setup (dense_ops.visc_init): block-Jacobi sums + A x0.
    Channels: [m_xx, m_xy, m_xz, m_yy, m_yz, m_zz, ax, ay, az]."""

    n_out = 9
    fields = ("xv3", "rho_inv", "liq", "sol")

    def __call__(self, ctx: PairCtx):
        cfg = self.cfg
        a_liq = cfg.dim_coff * cfg.viscosity * cfg.liquid_mass
        b_sol = (cfg.dim_coff * cfg.viscosity_b * cfg.rest_density
                 * cfg.solid_volume)
        denom = ctx.d2 + 0.01 * self.h2
        coeff = (ctx.nbr(3) * a_liq * ctx.nbr(2)
                 + ctx.nbr(4) * b_sol * ctx.home(2)) / denom
        gs = ctx.gs()
        cg = coeff * gs
        r = ctx.r
        out = [jnp.sum(cg * r[a] * r[b], axis=1)
               for (a, b) in ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))]
        dxr = sum((ctx.home(1, c) - ctx.nbr(1, c)) * r[c] for c in range(3))
        cfac = coeff * dxr * gs
        out += [jnp.sum(cfac * r[c], axis=1) for c in range(3)]
        return out

    def sym(self, ctx: PairCtx):
        c_hn, c_nh, gs, dxr = _ViscAcc._sym_coeffs(self, ctx)
        r = ctx.r
        cgh = c_hn * gs
        cgn = c_nh * gs
        pairs = ((0, 0), (0, 1), (0, 2), (1, 1), (1, 2), (2, 2))
        # r_a r_b products are sign-invariant under r -> -r
        home = [jnp.sum(cgh * r[a] * r[b], axis=1) for (a, b) in pairs]
        mirr = [jnp.sum(cgn * r[a] * r[b], axis=0) for (a, b) in pairs]
        fh = c_hn * dxr * gs
        fn = c_nh * dxr * gs
        home += [jnp.sum(fh * r[c], axis=1) for c in range(3)]
        mirr += [-jnp.sum(fn * r[c], axis=0) for c in range(3)]
        return home, mirr


class _Vorticity(_Emit):
    """Micropolar vorticity sums (dense_ops.vorticity).  Channels:
    [cvx, cvy, cvz,  tx, ty, tz,  sx, sy, sz] where
      cv_c = sum_j mass_like_j cross(d_omega, r)_c gs      (d_vel side)
      t_c  = sum_j liq_j W / rho_j * d_omega_c             (transfer)
      s_c  = sum_j stretch_mass_j cross(d_vel, r)_c gs     (stretching)
    The caller combines with inv_rho_i, the -1/dt transfer factor, the
    damping term (via the density op's count) and dt."""

    n_out = 9
    fields = ("vel3", "om3", "rho_inv", "liq", "sol")

    def __call__(self, ctx: PairCtx):
        cfg = self.cfg
        m = cfg.liquid_mass
        rho0vs = cfg.rest_density * cfg.solid_volume
        rho0vl = cfg.rest_density * cfg.liquid_volume
        liq_j = ctx.nbr(4)
        sol_j = ctx.nbr(5)
        gs = ctx.gs()
        wk = ctx.w()
        d_om = [ctx.home(2, c) - liq_j * ctx.nbr(2, c) for c in range(3)]
        d_ve = [ctx.home(1, c) - liq_j * ctx.nbr(1, c) for c in range(3)]
        mass_like_j = m * liq_j + rho0vs * sol_j
        stretch_j = m * liq_j + rho0vl * sol_j
        r = ctx.r
        out = []
        for c in range(3):
            c0, c1 = (c + 1) % 3, (c + 2) % 3
            cr_o = (d_om[c0] * r[c1] - d_om[c1] * r[c0]) * gs
            out.append(jnp.sum(mass_like_j * cr_o, axis=1))
        for c in range(3):
            out.append(jnp.sum(liq_j * wk * ctx.nbr(3) * d_om[c], axis=1))
        for c in range(3):
            c0, c1 = (c + 1) % 3, (c + 2) % 3
            cr_v = (d_ve[c0] * r[c1] - d_ve[c1] * r[c0]) * gs
            out.append(jnp.sum(stretch_j * cr_v, axis=1))
        return out

    def sym(self, ctx: PairCtx):
        """Dual-sided: the omega/velocity deltas and the type-dependent
        masses are NOT symmetric (d' = q_n - liq_h q_h from the neighbor's
        view), so each side evaluates its own delta; geometry, gs and W are
        shared, and cross(d', r_nh) = -cross(d', r)."""
        cfg = self.cfg
        m = cfg.liquid_mass
        rho0vs = cfg.rest_density * cfg.solid_volume
        rho0vl = cfg.rest_density * cfg.liquid_volume
        liq_j, sol_j = ctx.nbr(4), ctx.nbr(5)
        liq_h, sol_h = ctx.home(4), ctx.home(5)
        gs = ctx.gs()
        wk = ctx.w()
        r = ctx.r
        d_om = [ctx.home(2, c) - liq_j * ctx.nbr(2, c) for c in range(3)]
        d_ve = [ctx.home(1, c) - liq_j * ctx.nbr(1, c) for c in range(3)]
        d_om_m = [ctx.nbr(2, c) - liq_h * ctx.home(2, c) for c in range(3)]
        d_ve_m = [ctx.nbr(1, c) - liq_h * ctx.home(1, c) for c in range(3)]
        mass_j = m * liq_j + rho0vs * sol_j
        mass_h = m * liq_h + rho0vs * sol_h
        str_j = m * liq_j + rho0vl * sol_j
        str_h = m * liq_h + rho0vl * sol_h
        home, mirr = [], []
        for c in range(3):
            c0, c1 = (c + 1) % 3, (c + 2) % 3
            cr = (d_om[c0] * r[c1] - d_om[c1] * r[c0]) * gs
            cr_m = (d_om_m[c0] * r[c1] - d_om_m[c1] * r[c0]) * gs
            home.append(jnp.sum(mass_j * cr, axis=1))
            mirr.append(-jnp.sum(mass_h * cr_m, axis=0))
        for c in range(3):
            home.append(jnp.sum(liq_j * wk * ctx.nbr(3) * d_om[c], axis=1))
            mirr.append(jnp.sum(liq_h * wk * ctx.home(3) * d_om_m[c],
                                axis=0))
        for c in range(3):
            c0, c1 = (c + 1) % 3, (c + 2) % 3
            cr = (d_ve[c0] * r[c1] - d_ve[c1] * r[c0]) * gs
            cr_m = (d_ve_m[c0] * r[c1] - d_ve_m[c1] * r[c0]) * gs
            home.append(jnp.sum(str_j * cr, axis=1))
            mirr.append(-jnp.sum(str_h * cr_m, axis=0))
        return home, mirr


class _SesphForce(_Emit):
    """SESPH explicit viscosity + symmetric Tait-pressure acceleration in
    ONE sweep (twins: dense_ops.explicit_viscosity_accel +
    pressure_accel_symmetric; reference sesph.py:168-188).  Channels:
    [ax, ay, az].  Fields: [xp, vel3, rinv, rr, pi, p, liq, sol] where
    rinv = 1/max(rho,1), rr = rho/rho0, pi = p/max(rho^2,1)."""

    n_out = 3

    def _terms(self, ctx: PairCtx):
        cfg = self.cfg
        A = cfg.dim_coff * cfg.explicit_viscosity * cfg.liquid_mass
        B = cfg.dim_coff * cfg.explicit_viscosity_b * cfg.solid_volume
        rd = 1.0 / (ctx.d2 + 0.01 * self.h2)
        gs = ctx.gs()
        dv_dot = sum((ctx.home(1, c) - ctx.nbr(1, c)) * ctx.r[c]
                     for c in range(3))
        vh_dot = sum(ctx.home(1, c) * ctx.r[c] for c in range(3))
        vn_dot = sum(ctx.nbr(1, c) * ctx.r[c] for c in range(3))
        return A, B, rd, gs, dv_dot, vh_dot, vn_dot

    def _coeff(self, ctx, side, A, B, rd, gs, dv_dot, v_dot):
        """Pair coefficient seen by one receiver; ``side`` picks which end
        supplies the source-type masks and values."""
        cfg = self.cfg
        rho0 = cfg.rest_density
        if side == "home":          # receiver = home, source = nbr
            liq_s, sol_s = ctx.nbr(6), ctx.nbr(7)
            rinv_s, rr_r = ctx.nbr(2), ctx.home(3)
            pi_r, p_s, p_r = ctx.home(4), ctx.nbr(5), ctx.home(5)
        else:                       # receiver = nbr, source = home
            liq_s, sol_s = ctx.home(6), ctx.home(7)
            rinv_s, rr_r = ctx.home(2), ctx.nbr(3)
            pi_r, p_s, p_r = ctx.nbr(4), ctx.home(5), ctx.nbr(5)
        visc = (liq_s * A * rinv_s * dv_dot + sol_s * B * rr_r * v_dot) * rd
        pres = -rho0 * (cfg.liquid_volume * liq_s
                        * (pi_r + p_s * rinv_s * rinv_s)
                        + cfg.solid_volume * sol_s
                        * (pi_r + p_r / (rho0 * rho0)))
        return (visc + pres) * gs

    def __call__(self, ctx: PairCtx):
        A, B, rd, gs, dv_dot, vh_dot, _ = self._terms(ctx)
        c_hn = self._coeff(ctx, "home", A, B, rd, gs, dv_dot, vh_dot)
        return [jnp.sum(c_hn * ctx.r[c], axis=1) for c in range(3)]

    def sym(self, ctx: PairCtx):
        A, B, rd, gs, dv_dot, vh_dot, vn_dot = self._terms(ctx)
        c_hn = self._coeff(ctx, "home", A, B, rd, gs, dv_dot, vh_dot)
        # from the neighbor's view the solid-viscosity dot is v_n . r_nh
        c_nh = self._coeff(ctx, "mirror", A, B, rd, gs, dv_dot, -vn_dot)
        home = [jnp.sum(c_hn * ctx.r[c], axis=1) for c in range(3)]
        mirr = [-jnp.sum(c_nh * ctx.r[c], axis=0) for c in range(3)]
        return home, mirr


class _PcisphPredict(_Emit):
    """PCISPH predicted density + pressure acceleration at the STARRED
    positions (twin of pcisph._predicted_density_and_accel; reference
    pcisph.py:237-278).  Field 0 is the PREDICTED position field — the
    binning stays from the original positions, exactly like the XLA twin's
    WindowLoop(grid, cfg, xp=xstar).  Channels: [adv, ax, ay, az];
    fields: [xstar, vol, p, liq, sol]."""

    n_out = 4

    def _coeffs(self, ctx: PairCtx):
        cfg = self.cfg
        p_h = ctx.home(2)
        p_n = ctx.nbr(2)
        psum = p_h + p_n
        c_hn = (ctx.nbr(3) * cfg.liquid_volume * psum
                + ctx.nbr(4) * cfg.solid_volume * p_h)
        c_nh = (ctx.home(3) * cfg.liquid_volume * psum
                + ctx.home(4) * cfg.solid_volume * p_n)
        return c_hn, c_nh

    def __call__(self, ctx: PairCtx):
        c_hn, _ = self._coeffs(ctx)
        wk = ctx.w()
        gs = ctx.gs()
        out = [jnp.sum(ctx.nbr(1) * wk, axis=1)]
        out += [-jnp.sum(c_hn * gs * ctx.r[c], axis=1) for c in range(3)]
        return out

    def sym(self, ctx: PairCtx):
        c_hn, c_nh = self._coeffs(ctx)
        wk = ctx.w()
        gs = ctx.gs()
        home = [jnp.sum(ctx.nbr(1) * wk, axis=1)]
        mirr = [jnp.sum(ctx.home(1) * wk, axis=0)]
        home += [-jnp.sum(c_hn * gs * ctx.r[c], axis=1) for c in range(3)]
        mirr += [jnp.sum(c_nh * gs * ctx.r[c], axis=0) for c in range(3)]
        return home, mirr


class _PcisphAdvPart(_PcisphPredict):
    """Phase body of the fused PCISPH iteration: predicted-density channel
    only (the adv half of _PcisphPredict.sym — shared field numbering, so
    the fused kernel's pair math cannot drift from the two-kernel twin)."""

    n_out = 1

    def sym(self, ctx: PairCtx):
        wk = ctx.w()
        return ([jnp.sum(ctx.nbr(1) * wk, axis=1)],
                [jnp.sum(ctx.home(1) * wk, axis=0)])


class _PcisphAccPart(_PcisphPredict):
    """Phase body of the fused PCISPH iteration: pressure-acceleration
    channels only, evaluated with the in-kernel UPDATED pressure (the acc
    half of _PcisphPredict.sym; _coeffs inherited)."""

    n_out = 3

    def sym(self, ctx: PairCtx):
        c_hn, c_nh = self._coeffs(ctx)
        gs = ctx.gs()
        return ([-jnp.sum(c_hn * gs * ctx.r[c], axis=1) for c in range(3)],
                [jnp.sum(c_nh * gs * ctx.r[c], axis=0) for c in range(3)])


class _IisphAdv(_Emit):
    """IISPH advection coefficients (twin of the adv_fn scan in
    solvers/iisph.py; reference iisph.py:276-316).  Channels:
    [dii_x, dii_y, dii_z, adv, dji]; fields: [xp, vol, vel3]."""

    n_out = 5

    def __call__(self, ctx: PairCtx):
        gs = ctx.gs()
        vj = ctx.nbr(1)
        dv_dot = sum((ctx.home(2, c) - ctx.nbr(2, c)) * ctx.r[c]
                     for c in range(3))
        out = [-jnp.sum(vj * gs * ctx.r[c], axis=1) for c in range(3)]
        out.append(jnp.sum(vj * gs * dv_dot, axis=1))
        out.append(jnp.sum(vj * gs * gs * ctx.d2, axis=1))
        return out

    def sym(self, ctx: PairCtx):
        gs = ctx.gs()
        vj = ctx.nbr(1)
        vh = ctx.home(1)
        dv_dot = sum((ctx.home(2, c) - ctx.nbr(2, c)) * ctx.r[c]
                     for c in range(3))
        home, mirr = [], []
        for c in range(3):
            f = gs * ctx.r[c]
            home.append(-jnp.sum(vj * f, axis=1))
            mirr.append(jnp.sum(vh * f, axis=0))
        f2 = gs * dv_dot
        home.append(jnp.sum(vj * f2, axis=1))
        mirr.append(jnp.sum(vh * f2, axis=0))
        f3 = gs * gs * ctx.d2
        home.append(jnp.sum(vj * f3, axis=1))
        mirr.append(jnp.sum(vh * f3, axis=0))
        return home, mirr


class _IisphAii(_Emit):
    """a_ii part 1: sum_j V_j gs (d_ii_i . r) — aii_fn scan twin.  Only the
    RECEIVER's own d_ii enters (reference iisph.py:314-315 adds
    VL0 * (d_ii[i] - d_ji).dot(gradV) with d_ji built from i's density; the
    d_ji part is the separate dji channel of _IisphAdv).  Channels: [aii];
    fields: [xp, vol, dii3]."""

    n_out = 1

    def __call__(self, ctx: PairCtx):
        f = ctx.gs() * sum(ctx.home(2, c) * ctx.r[c] for c in range(3))
        return [jnp.sum(ctx.nbr(1) * f, axis=1)]

    def sym(self, ctx: PairCtx):
        """Dual-sided: each receiver dots its OWN d_ii with the pair vector
        seen from its side (r flips for the mirror receiver)."""
        gs = ctx.gs()
        dot_h = sum(ctx.home(2, c) * ctx.r[c] for c in range(3))
        dot_n = sum(ctx.nbr(2, c) * ctx.r[c] for c in range(3))
        return ([jnp.sum(ctx.nbr(1) * gs * dot_h, axis=1)],
                [-jnp.sum(ctx.home(1) * gs * dot_n, axis=0)])


class _IisphDij(_Emit):
    """dij_pj = sum_j fac_j gs r with the per-slot source factor
    fac = liq * (-V0 p / den^2) precomputed by the caller (dij_fn twin,
    iisph.py:318-334).  Channels: [x, y, z]; fields: [xp, fac]."""

    n_out = 3

    def __call__(self, ctx: PairCtx):
        fg = ctx.nbr(1) * ctx.gs()
        return [jnp.sum(fg * ctx.r[c], axis=1) for c in range(3)]

    def sym(self, ctx: PairCtx):
        gs = ctx.gs()
        fg_n = ctx.nbr(1) * gs
        fg_h = ctx.home(1) * gs
        home = [jnp.sum(fg_n * ctx.r[c], axis=1) for c in range(3)]
        mirr = [-jnp.sum(fg_h * ctx.r[c], axis=0) for c in range(3)]
        return home, mirr


class _IisphS(_Emit):
    """The s_i sweep of the relaxed Jacobi iteration (s_fn twin,
    iisph.py:336-370).  Channels: [s]; fields: [xp, dii3, dij3, p_liq, g,
    liq, sol] with p_liq = liq*p and g = V0 p / den^2 precomputed."""

    n_out = 1

    def __call__(self, ctx: PairCtx):
        cfg = self.cfg
        gs = ctx.gs()
        liq_j = ctx.nbr(5)
        sol_j = ctx.nbr(6)
        r = ctx.r
        dij_dot_i = gs * sum(ctx.home(2, c) * r[c] for c in range(3))
        dii_j_dot = gs * ctx.nbr(3) * sum(ctx.nbr(1, c) * r[c]
                                          for c in range(3))
        dij_j_dot = gs * sum(ctx.nbr(2, c) * r[c] for c in range(3))
        dji_pi_dot = ctx.home(4) * gs * gs * ctx.d2
        term_liq = cfg.liquid_volume * (dij_dot_i - dii_j_dot - dij_j_dot
                                        + dji_pi_dot)
        term_sol = cfg.solid_volume * dij_dot_i
        return [jnp.sum(liq_j * term_liq + sol_j * term_sol, axis=1)]

    def sym(self, ctx: PairCtx):
        """Dual-sided derivation (VERDICT r2 next-step 6).  With r flipping
        sign for the mirror receiver, every one-sided term maps onto the
        shared dots A_* = gs (dij_* . r), B_* = gs p_liq_* (dii_* . r),
        Q = gs^2 |r|^2:
          home  (recv h, nbr n): liq_n V0 (A_h - A_n - B_n + g_h Q)
                                 + sol_n Vs A_h
          mirror(recv n, nbr h): liq_h V0 (A_h - A_n + B_h + g_n Q)
                                 + sol_h Vs (-A_n)
        """
        cfg = self.cfg
        gs = ctx.gs()
        r = ctx.r
        a_h = gs * sum(ctx.home(2, c) * r[c] for c in range(3))
        a_n = gs * sum(ctx.nbr(2, c) * r[c] for c in range(3))
        b_h = gs * ctx.home(3) * sum(ctx.home(1, c) * r[c] for c in range(3))
        b_n = gs * ctx.nbr(3) * sum(ctx.nbr(1, c) * r[c] for c in range(3))
        q = gs * gs * ctx.d2
        v0, vs = cfg.liquid_volume, cfg.solid_volume
        home = (ctx.nbr(5) * (v0 * (a_h - a_n - b_n + ctx.home(4) * q))
                + ctx.nbr(6) * (vs * a_h))
        mirr = (ctx.home(5) * (v0 * (a_h - a_n + b_h + ctx.nbr(4) * q))
                + ctx.home(6) * (vs * (-a_n)))
        return [jnp.sum(home, axis=1)], [jnp.sum(mirr, axis=0)]


class _IisphForce(_Emit):
    """IISPH pressure force (force_fn twin, iisph.py:372-396).  Channels:
    [ax, ay, az]; fields: [xp, dpi, liq, sol] with dpi = p / den^2."""

    n_out = 3

    def _coeffs(self, ctx: PairCtx):
        cfg = self.cfg
        dpi_h = ctx.home(1)
        dpi_n = ctx.nbr(1)
        liq_h, liq_n = ctx.home(2), ctx.nbr(2)
        sol_h, sol_n = ctx.home(3), ctx.nbr(3)
        sym = cfg.liquid_volume * (dpi_h + dpi_n)
        c_hn = liq_n * sym + sol_n * cfg.solid_volume * dpi_h
        c_nh = liq_h * sym + sol_h * cfg.solid_volume * (liq_n * dpi_n)
        return c_hn, c_nh

    def __call__(self, ctx: PairCtx):
        c_hn, _ = self._coeffs(ctx)
        fg = c_hn * ctx.gs()
        return [-jnp.sum(fg * ctx.r[c], axis=1) for c in range(3)]

    def sym(self, ctx: PairCtx):
        c_hn, c_nh = self._coeffs(ctx)
        gs = ctx.gs()
        fg_h = c_hn * gs
        fg_n = c_nh * gs
        home = [-jnp.sum(fg_h * ctx.r[c], axis=1) for c in range(3)]
        mirr = [jnp.sum(fg_n * ctx.r[c], axis=0) for c in range(3)]
        return home, mirr


class _SurfaceNormals(_Emit):
    """Surface normal sums n_i = sum_j liq_j (m/rho_j) gs r (twin of
    dense_ops.surface_normals; reference dfsph.py:266-279 — the caller
    scales by h).  Channels: [nx, ny, nz]; fields: [xp, rho_inv_liq] with
    rho_inv_liq = liq / max(rho, 1) precomputed."""

    n_out = 3

    def __call__(self, ctx: PairCtx):
        cfac = self.cfg.liquid_mass * ctx.nbr(1) * ctx.gs()
        return [jnp.sum(cfac * ctx.r[c], axis=1) for c in range(3)]

    def sym(self, ctx: PairCtx):
        gs = ctx.gs()
        c_hn = self.cfg.liquid_mass * ctx.nbr(1) * gs
        c_nh = self.cfg.liquid_mass * ctx.home(1) * gs
        home = [jnp.sum(c_hn * ctx.r[c], axis=1) for c in range(3)]
        mirr = [-jnp.sum(c_nh * ctx.r[c], axis=0) for c in range(3)]
        return home, mirr


class _TensionAccel(_Emit):
    """Akinci cohesion + curvature + boundary adhesion in one sweep (twin of
    dense_ops.tension_accel; reference dfsph.py:265-305).  Channels:
    [ax, ay, az]; fields: [xp, rho, n3, liq, sol]."""

    n_out = 3

    def _shared(self, ctx: PairCtx):
        cfg = self.cfg
        h = self.h
        dist = ctx.dist()
        inv_dist = ctx.rinv()
        k_ij = 2.0 * cfg.rest_density / jnp.maximum(
            ctx.home(1) + ctx.nbr(1), 1.0)
        pair_ok = ctx.mask & (ctx.d2 > cfg.eps)
        # cohesion spline (kernels.cohesion_w_scalar, inlined for Mosaic;
        # note the -h^6/64 inner offset sits OUTSIDE the k factor)
        m_k = 32.0 / (math.pi * h ** 9)
        hr3 = (h - dist) ** 3 * dist ** 3
        w_coh = jnp.where(ctx.mask,
                          jnp.where(dist > 0.5 * h, m_k * hr3,
                                    m_k * 2.0 * hr3 - (h ** 6) / 64.0),
                          0.0)
        # adhesion spline (kernels.adhesion_w_scalar)
        arg = jnp.maximum(-4.0 * ctx.d2 / h + 6.0 * dist - 2.0 * h, 0.0)
        w_adh = jnp.where(ctx.mask & (dist > 0.5 * h),
                          0.007 / h ** 3.25 * jnp.sqrt(jnp.sqrt(arg)), 0.0)
        return dist, inv_dist, k_ij, pair_ok, w_coh, w_adh

    def _adh_gate(self, ctx, side, pair_ok):
        """Boundary-adhesion region gate for the SOURCE of one side."""
        cfg = self.cfg
        centre = cfg.adhesion_center
        get = ctx.nbr if side == "home" else ctx.home
        sol_s = get(4)
        d_c = sum((get(0, c) - centre[c]) ** 2 for c in range(3))
        return jnp.where(pair_ok & (d_c < cfg.adhesion_radius ** 2),
                         sol_s, 0.0)

    def _side(self, ctx, side, shared):
        """(radial coefficient, curvature gate) for one receiver."""
        cfg = self.cfg
        dist, inv_dist, k_ij, pair_ok, w_coh, w_adh = shared
        liq_s = ctx.nbr(3) if side == "home" else ctx.home(3)
        gate = jnp.where(pair_ok, liq_s * k_ij, 0.0)
        coh = -cfg.tension_coff * cfg.liquid_mass * w_coh * inv_dist * gate
        adh = (-cfg.tension_coff_b * cfg.rest_density * cfg.solid_volume
               * w_adh * inv_dist) * self._adh_gate(ctx, side, pair_ok)
        return coh + adh, gate

    def __call__(self, ctx: PairCtx):
        cfg = self.cfg
        shared = self._shared(ctx)
        c_rad, gate = self._side(ctx, "home", shared)
        out = []
        for c in range(3):
            curv = gate * -cfg.tension_coff * (ctx.home(2, c) - ctx.nbr(2, c))
            out.append(jnp.sum(c_rad * ctx.r[c] + curv, axis=1))
        return out

    def sym(self, ctx: PairCtx):
        cfg = self.cfg
        shared = self._shared(ctx)
        c_hn, gate_h = self._side(ctx, "home", shared)
        c_nh, gate_n = self._side(ctx, "mirror", shared)
        home, mirr = [], []
        for c in range(3):
            dn = ctx.home(2, c) - ctx.nbr(2, c)
            home.append(jnp.sum(
                c_hn * ctx.r[c] + gate_h * -cfg.tension_coff * dn, axis=1))
            mirr.append(jnp.sum(
                -c_nh * ctx.r[c] + gate_n * cfg.tension_coff * dn, axis=0))
        return home, mirr


# ---------------------------------------------------------------------------
# Engine front end
# ---------------------------------------------------------------------------

def _interpret_default():
    return jax.default_backend() == "cpu"


def use_fused_iters(comm, method: str) -> bool:
    """Route a solver loop through its fused per-iteration kernel?  True iff
    the config asks for it, half-window sweeps are on (the fused kernels are
    inherently sym programs — WCSPH_SYM_SWEEPS=0 A/B-disables them too), and
    the communicator's engine actually carries ``method`` (only the
    single-device PaddedEngine does: the SlabEngine adapter cannot
    halo-exchange between a fused kernel's phases)."""
    return (comm.cfg.fused_solver_iters and SYM_SWEEPS
            and hasattr(comm.engine, method))


class SweepEngine:
    """Per-step prepared state + op entry points.

    Construct once per step (after build_grid); methods pad their dynamic
    fields and run one fused sweep each.  All inputs/outputs use the packed
    (C, NC) / (3, C, NC) layout of grid.py.
    """

    def __init__(self, grid: DenseGrid, cfg: SimConfig,
                 interpret: bool | None = None):
        self.grid = grid
        self.cfg = cfg
        self.interpret = (_interpret_default() if interpret is None
                          else interpret)
        cap = grid.pid.shape[0]
        self.plan = make_plan(cfg, cap)
        p = self.plan

        self.xp_pad = _pad_field(p, grid.xp, EMPTY_POS)
        # mask in the same layout the op methods' in/outputs use ((C, NC)
        # here; padded in PaddedEngine)
        self.liq_mask = grid.liquid
        liq = grid.liquid.astype(jnp.float32)
        sol = (grid.valid & ~grid.liquid).astype(jnp.float32)
        vol = jnp.where(grid.liquid, cfg.liquid_volume,
                        jnp.where(grid.valid, cfg.solid_volume, 0.0))
        # every field is (ncomp, C, NX, PP); scalars get ncomp=1
        self.liq_pad = _pad_field(p, liq, 0.0)[None]
        self.sol_pad = _pad_field(p, sol, 0.0)[None]
        self.vol_pad = _pad_field(p, vol, 0.0)[None]

        ca = _chunk_counts(p, grid.valid)
        cl = _chunk_counts(p, grid.liquid)
        self._init_masks(ca, cl, lambda pf: (_chunk_counts(pf, grid.valid),
                                             _chunk_counts(pf, grid.liquid)))

    def _init_masks(self, ca, cl, fine_counts):
        """Shared tail of construction: occupancy bitmasks from the
        (NRB, NX, nq+2) chunk counts; ``fine_counts(plan_fine)`` supplies
        the half-chunk counts when the fine plan differs."""
        p = self.plan
        act_any, act_liq, nz_any, nz_liq = _active_masks(p, ca, cl)
        self.act_any, self.act_liq = act_any, act_liq
        self.nz_any, self.nz_liq = nz_any, nz_liq
        (self.act_sym, self.nz_sym,
         self.act_sym_any, self.nz_sym_any) = _active_masks_sym(p, ca, cl)
        self.plan_fine = fine_plan(p)
        if self.plan_fine is not p:
            ca_f, cl_f = fine_counts(self.plan_fine)
            (self.act_sym_f, self.nz_sym_f, _, _) = _active_masks_sym(
                self.plan_fine, ca_f, cl_f)
        else:
            self.act_sym_f, self.nz_sym_f = self.act_sym, self.nz_sym

    # -- plumbing ---------------------------------------------------------

    @property
    def xp_owned(self):
        """Packed positions in the layout the op methods speak (packed here,
        padded in PaddedEngine) — for solvers that derive shifted positions
        elementwise (PCISPH starred positions)."""
        return self.grid.xp

    def _pad1(self, a, fill=0.0):
        """(C, NC) -> (1, C, NX, PP)."""
        return _pad_field(self.plan, a, fill)[None]

    def _pad3(self, a, fill=0.0):
        """(3, C, NC) -> (3, C, NX, PP)."""
        return _pad_field(self.plan, a, fill)

    # Overridden by PaddedEngine to keep results in the padded layout.
    _finish = staticmethod(_unpad_out)
    _finish_sym = staticmethod(_fold_sym)

    def _run(self, emit_cls, fields, liquid_gated=True):
        emit = emit_cls(self.cfg)
        p = self.plan
        comps = [f.shape[0] for f in fields]
        call = _build_sweep(p, len(fields), comps, emit.n_out, emit,
                            self.interpret)
        act = self.act_liq if liquid_gated else self.act_any
        nz = self.nz_liq if liquid_gated else self.nz_any
        out = call(nz, act, *fields)
        return self._finish(p, out)

    def _run_sym(self, emit_cls, fields, liquid_gated=True, fine=False):
        """Half-window variant: one evaluation per +-offset pair, dual-sided
        emit (emit_cls.sym), overlap-add fold.  ``fine`` halves the chunk
        size for kernels whose dual-sided bodies are VMEM-heavy."""
        emit = emit_cls(self.cfg)
        p = self.plan_fine if fine else self.plan
        comps = [f.shape[0] for f in fields]
        call = _build_sweep_sym(p, len(fields), comps, emit.n_out, emit,
                                self.interpret)
        if fine:
            out = call(self.nz_sym_f, self.act_sym_f, *fields)
        elif liquid_gated:
            out = call(self.nz_sym, self.act_sym, *fields)
        else:
            out = call(self.nz_sym_any, self.act_sym_any, *fields)
        return self._finish_sym(p, out)

    # -- ops --------------------------------------------------------------

    def density_alpha(self, with_alpha: bool = True, velp=None):
        """(rho, alpha, count[, div_acc]) — twin of dense_ops.density_stats.
        With ``velp``, also returns the raw divergence accumulation of that
        velocity (fused warm-start channel; see _DensityAlphaDrho)."""
        from .. import kernels
        cfg = self.cfg
        run = (partial(self._run_sym, liquid_gated=False) if SYM_SWEEPS
               else partial(self._run, liquid_gated=False))
        if velp is not None:
            out = run(_DensityAlphaDrho,
                      [self.xp_pad, self.vol_pad, self.liq_pad,
                       self._pad3(velp)])
        else:
            out = run(_DensityAlpha,
                      [self.xp_pad, self.vol_pad, self.liq_pad])
        rho_acc, count = out[0], out[1]
        w0 = cfg.liquid_volume * kernels.cubic_w0(cfg.support_radius)
        rho = cfg.rest_density * (w0 + rho_acc)
        if with_alpha:
            sg, sq = out[2:5], out[5]
            den = sq + sg[0] ** 2 + sg[1] ** 2 + sg[2] ** 2
            alpha = jnp.where(den > cfg.eps, -1.0 / den, 0.0)
        else:
            alpha = jnp.zeros_like(rho)
        if velp is not None:
            return rho, alpha, count.astype(jnp.int32), out[6]
        return rho, alpha, count.astype(jnp.int32)

    def kappa_velocity_update(self, velp, kp, dt):
        fields = [self.xp_pad, self.vol_pad, self._pad1(kp)]
        acc = (self._run_sym(_KappaAcc, fields) if SYM_SWEEPS
               else self._run(_KappaAcc, fields))
        # liquid-masked: boundary slots keep velocity 0 exactly (the
        # reference only loops i over liquid, dfsph.py:449-477)
        return velp + jnp.where(self.liq_mask[None], dt * acc, 0.0)

    def div_accum(self, velp):
        fields = [self.xp_pad, self.vol_pad, self._pad3(velp)]
        out = (self._run_sym(_DivAcc, fields) if SYM_SWEEPS
               else self._run(_DivAcc, fields))
        return out[0]

    def drho_divergence(self, velp, countp):
        """Twin of dense_ops.drho_divergence."""
        drho = jnp.maximum(self.div_accum(velp), 0.0)
        return jnp.where(countp < self.cfg.min_div_neighbors, 0.0, drho)

    def advected_density(self, velp, rhop, dt):
        """Twin of dense_ops.advected_density."""
        acc = self.div_accum(velp)
        return jnp.maximum(rhop / self.cfg.rest_density + dt * acc, 1.0)

    def iisph_adv(self, velp):
        """(d_ii_raw (3,C,NC), adv_acc, dji_acc) — twin of the adv_fn scan
        in solvers/iisph.py."""
        run = self._run_sym if SYM_SWEEPS else self._run
        out = run(_IisphAdv, [self.xp_pad, self.vol_pad, self._pad3(velp)])
        return out[0:3], out[3], out[4]

    def iisph_aii(self, dii):
        """a_ii part 1: sum_j V_j gs (d_ii_i - d_ii_j).r — aii_fn twin."""
        run = self._run_sym if SYM_SWEEPS else self._run
        out = run(_IisphAii, [self.xp_pad, self.vol_pad, self._pad3(dii)])
        return out[0]

    def iisph_dij(self, fac):
        """dij_pj from the per-slot factor fac = liq * (-V0 p / den^2)."""
        run = self._run_sym if SYM_SWEEPS else self._run
        return run(_IisphDij, [self.xp_pad, self._pad1(fac)])

    def iisph_s(self, dii, dij, p_liq, g):
        """s_i sweep — half-window since round 3 (dual-sided _IisphS.sym;
        the op runs once per Jacobi iteration, so this halves the dominant
        IISPH sweep).  ``fine`` chunks: 13 field components x 2 DMA rows is
        the VMEM-heaviest sym body."""
        fields = [self.xp_pad, self._pad3(dii), self._pad3(dij),
                  self._pad1(p_liq), self._pad1(g),
                  self.liq_pad, self.sol_pad]
        if SYM_SWEEPS:
            out = self._run_sym(_IisphS, fields, fine=True)
        else:
            out = self._run(_IisphS, fields)
        return out[0]

    def iisph_force(self, dpi):
        """Pressure force from dpi = p / den^2 — force_fn twin."""
        run = self._run_sym if SYM_SWEEPS else self._run
        return run(_IisphForce,
                   [self.xp_pad, self._pad1(dpi), self.liq_pad,
                    self.sol_pad])

    def pcisph_predict(self, xstarp, pp):
        """(adv_acc_raw, pressure accel) at the predicted positions
        (pcisph.py:237-278); the caller adds the self term and clamps."""
        run = self._run_sym if SYM_SWEEPS else self._run
        # position field: margins need the far-away sentinel, not 0
        out = run(_PcisphPredict,
                  [self._pad3(xstarp, EMPTY_POS), self.vol_pad,
                   self._pad1(pp), self.liq_pad, self.sol_pad])
        return out[0], out[1:4]

    def sesph_force(self, velp, rhop, pp):
        """Fused explicit-viscosity + Tait-pressure acceleration (twin of
        dense_ops.explicit_viscosity_accel + pressure_accel_symmetric)."""
        cfg = self.cfg
        rinv = 1.0 / jnp.maximum(rhop, 1.0)
        rr = rhop / cfg.rest_density
        pi = pp * rinv * rinv
        run = self._run_sym if SYM_SWEEPS else self._run
        return run(_SesphForce,
                   [self.xp_pad, self._pad3(velp), self._pad1(rinv, 1.0),
                    self._pad1(rr, 1.0), self._pad1(pi), self._pad1(pp),
                    self.liq_pad, self.sol_pad])

    def surface_normals(self, rhop):
        """h * sum_j liq_j (m/rho_j) gs r — twin of dense_ops.surface_normals
        (reference dfsph.py:266-279)."""
        ril = jnp.where(self.liq_mask,
                        1.0 / jnp.maximum(rhop, 1.0), 0.0)
        run = self._run_sym if SYM_SWEEPS else self._run
        out = run(_SurfaceNormals, [self.xp_pad, self._pad1(ril)])
        return self.cfg.support_radius * out

    def tension_accel(self, rhop, normalp):
        """Cohesion + curvature + boundary adhesion acceleration — twin of
        dense_ops.tension_accel (reference dfsph.py:282-305).  ``fine``
        chunks: the dual-sided body keeps ~12 pair temporaries live."""
        run = (partial(self._run_sym, fine=True) if SYM_SWEEPS
               else self._run)
        return run(_TensionAccel,
                   [self.xp_pad, self._pad1(rhop, 1.0),
                    self._pad3(normalp), self.liq_pad, self.sol_pad])

    def visc_matvec(self, xv, rhop, dt):
        run = self._run_sym if SYM_SWEEPS else self._run
        acc = run(_ViscAcc,
                  [self.xp_pad, self._pad3(xv),
                   self._pad1(1.0 / jnp.maximum(rhop, 1.0), 1.0),
                   self.liq_pad, self.sol_pad])
        return xv - acc * (dt / jnp.maximum(rhop, 1.0))[None]

    def visc_init(self, x0, rhop, dt):
        """(Minv: Sym3, A x0) — twin of dense_ops.visc_init."""
        from ..utils import mat3
        run = self._run_sym if SYM_SWEEPS else self._run
        out = run(_ViscInit,
                  [self.xp_pad, self._pad3(x0),
                   self._pad1(1.0 / jnp.maximum(rhop, 1.0), 1.0),
                   self.liq_pad, self.sol_pad])
        inv_rho = dt / jnp.maximum(rhop, 1.0)
        a = mat3.sym3_identity_minus(mat3.Sym3(*out[:6]), inv_rho)
        ax0 = x0 - out[6:9] * inv_rho[None]
        return mat3.sym3_inverse(a), ax0

    def vorticity(self, velp, omegap, rhop, countp, dt):
        """(d_vel, new omega) — twin of dense_ops.vorticity."""
        cfg = self.cfg
        # fine chunks: the dual-sided vorticity body keeps ~20 (8,8,Q) pair
        # temporaries live, which exceeds scoped VMEM at full Q
        run = (partial(self._run_sym, fine=True) if SYM_SWEEPS
               else self._run)
        out = run(_Vorticity,
                  [self.xp_pad, self._pad3(velp), self._pad3(omegap),
                   self._pad1(1.0 / jnp.maximum(rhop, 1.0), 1.0),
                   self.liq_pad, self.sol_pad])
        cv, tr, st = out[0:3], out[3:6], out[6:9]
        inv_rho_i = 1.0 / jnp.maximum(rhop, 1.0)
        c_vo, c_in = cfg.vorticity_coff, cfg.vorticity_init
        dv = c_vo * inv_rho_i[None] * cv
        t_coeff = (-1.0 / dt) * c_in * cfg.viscosity_omega * cfg.liquid_mass
        damp = -2.0 * c_in * c_vo
        dom = (t_coeff * tr
               + c_vo * c_in * inv_rho_i[None] * st
               + damp * omegap * countp.astype(jnp.float32)[None])
        return dv, omegap + dom * dt


# ---------------------------------------------------------------------------
# Padded-IO engine: solver loops composed entirely in the padded layout
# ---------------------------------------------------------------------------

class PaddedEngine(SweepEngine):
    """SweepEngine whose op methods take and return dynamic fields in the
    PADDED (…, NX, C, PP) layout, so chained ops — the divergence/pressure
    while_loops, the viscosity PCG, the IISPH Jacobi iteration — compose with
    ZERO per-call pad/fold-transpose glue (round-2 profile: ~90 ms of a
    440 ms 1M step was exactly this re-padding).  The sweep kernels emit
    plane-major output, so folding to the padded layout is a pure jnp.pad.

    Entry: ``pad_state`` once after pack.  Exit: ``unpack_many`` gathers
    per-particle values DIRECTLY from the padded buffers (no unpad copy).
    All elementwise solver math broadcasts identically to the packed layout
    ((k, C, NC) vs (k, NX, C, PP)), so the comm-parameterized solver middles
    run unchanged under a PaddedNoComm."""

    _finish = staticmethod(_pad_tot)
    _finish_sym = staticmethod(_fold_sym_pad)

    def __init__(self, base: SweepEngine):
        self.__dict__.update(base.__dict__)
        self.liq_mask = _pad_field(self.plan, self.grid.liquid, False)

    @classmethod
    def from_resident(cls, rgrid, cfg: SimConfig, interpret=None):
        """Construct from a resident padded grid (resident.py): positions
        and masks are ALREADY in the padded layout, so no (C, NC)
        intermediate or pad-transpose exists anywhere in the step."""
        self = cls.__new__(cls)
        self.grid = rgrid
        self.cfg = cfg
        self.interpret = (_interpret_default() if interpret is None
                          else interpret)
        self.plan = make_plan(cfg, rgrid.pid.shape[1])
        p = self.plan
        self.xp_pad = rgrid.xp
        valid = rgrid.pid >= 0
        self.liq_mask = rgrid.liquid
        self.liq_pad = rgrid.liquid.astype(jnp.float32)[None]
        self.sol_pad = (valid & ~rgrid.liquid).astype(jnp.float32)[None]
        self.vol_pad = jnp.where(
            rgrid.liquid, cfg.liquid_volume,
            jnp.where(valid, cfg.solid_volume, 0.0))[None]
        ca = _chunk_counts_padded(p, valid)
        cl = _chunk_counts_padded(p, rgrid.liquid)
        self._init_masks(
            ca, cl,
            lambda pf: (_chunk_counts_padded(pf, valid),
                        _chunk_counts_padded(pf, rgrid.liquid)))
        return self

    @property
    def xp_owned(self):
        return self.xp_pad

    def _pad1(self, a, fill=0.0):
        """Input already padded: (NX, C, PP) -> (1, NX, C, PP)."""
        return a[None]

    def _pad3(self, a, fill=0.0):
        return a

    def pad_state(self, a, fill=0.0):
        """Packed (C, NC)/(k, C, NC) -> padded (entry glue, once per step)."""
        return _pad_field(self.plan, a, fill)

    def fused_jacobi_iter(self, dii, deninvp, aiip, bp, pp, dt,
                          dij_seed, s_seed):
        """(dij, s, p', [resid_sum]) — a WHOLE IISPH Jacobi iteration in ONE
        kernel (see _build_fused_iisph_iter; reference twin: the
        per-iteration update_iter_info + update_pressure_force kernel pair,
        iisph.py:318-370).  ``deninvp`` = V0 / den_i2 (fac/p_liq/g are
        formed in VMEM from it and the carried pressure), ``aiip``/``bp``
        the loop-invariant Jacobi diagonal and right-hand side.
        ``dij_seed``/``s_seed`` are dead buffers donated as the sweep
        outputs' storage (cycle them through the while_loop carry); ``pp``
        is donated and returned updated."""
        p = self.plan_fine
        call = _build_fused_iisph_iter(p, self.cfg, self.interpret)
        consts = jnp.stack([dt]).astype(jnp.float32)
        dij, s, p_new, scal = call(
            self.nz_sym_f, self.act_sym_f, consts, self.xp_pad,
            self.liq_pad, self.sol_pad, dii, deninvp[None], aiip[None],
            bp[None], pp[None], dij_seed, s_seed[None])
        return dij, s[0], p_new[0], scal

    def fused_kappa_drho(self, velp, kfp, gatep, acc_seed):
        """(vel', raw divergence accumulation of vel') in ONE kernel — the
        per-iteration body of the DFSPH divergence/pressure solvers (see
        _build_fused_iter; reference twin: the per-iteration
        divergence_iter/pressure_iter kernel pair, dfsph.py:449-485 and
        510-547).  ``kfp`` is the kappa field PRE-scaled by dt (the pair
        term is linear in k); ``gatep`` the per-receiver acceptance mask as
        f32 (liquid, or liquid & warm-start predicate); ``acc_seed`` any
        dead (NX, C, PP) f32 buffer, donated as the acc output's storage.
        ``velp`` is donated and updated in place."""
        call = _build_fused_iter(self.plan, self.cfg.support_radius,
                                 self.interpret)
        vel, acc = call(self.nz_sym, self.act_sym, self.xp_pad,
                        self.vol_pad, gatep[None], kfp[None], velp,
                        acc_seed[None])
        return vel, acc[0]

    def fused_tension(self, rhop):
        """(h-scaled normals, cohesion+curvature+adhesion accel) in ONE
        two-phase kernel (see _build_fused_tension) — replaces the
        surface_normals + tension_accel sweep pair (VERDICT r4 weak #9).
        ``fine`` plan: the tension body keeps ~12 pair temporaries live."""
        p = self.plan_fine
        call = _build_fused_tension(p, self.cfg, self.interpret)
        ril = jnp.where(self.liq_mask,
                        1.0 / jnp.maximum(rhop, 1.0), 0.0)
        zshape = (3,) + self.xp_pad.shape[1:]
        n_raw, acc = call(self.nz_sym_f, self.act_sym_f, self.xp_pad,
                          ril[None], rhop[None], self.liq_pad, self.sol_pad,
                          jnp.zeros(zshape, jnp.float32),
                          jnp.zeros(zshape, jnp.float32))
        return self.cfg.support_radius * n_raw, acc

    def fused_pcisph_iter(self, vel_starp, pp, dt, coff, adv_seed,
                          acc_seed):
        """(adv_raw, pressure accel, p', [err_sum]) of one PCISPH
        prediction iteration in ONE kernel (see _build_fused_pcisph_iter;
        reference twin: the per-iteration update_iter_info +
        predict_density kernel pair, pcisph.py:228-278).
        ``adv_seed``/``acc_seed`` are dead buffers donated as the adv/acc
        outputs' storage; ``pp`` is donated and returned updated
        (p' = p + coff/dt^2 * (adv - 1), liquid rows); err_sum is the
        in-kernel global sum liq (max(w0 + adv, 1) - 1)."""
        from ..kernels import cubic_w0
        p = self.plan_fine
        call = _build_fused_pcisph_iter(p, self.cfg, self.interpret)
        w0 = self.cfg.liquid_volume * cubic_w0(self.cfg.support_radius)
        consts = jnp.stack([dt, coff / (dt * dt),
                            jnp.float32(w0)]).astype(jnp.float32)
        adv, acc, pp_new, scal = call(self.nz_sym_f, self.act_sym_f, consts,
                                      self.xp_pad, vel_starp, self.vol_pad,
                                      self.liq_pad, self.sol_pad, pp[None],
                                      adv_seed[None], acc_seed)
        return adv[0], acc, pp_new[0], scal

    def fused_iter_full(self, velp, kvp, sp, alphacp, pauxp, dt, mode,
                        acc_seed):
        """(vel', acc, S', kv', [err]) — a WHOLE DFSPH divergence (mode 0)
        or pressure (mode 1) iteration in ONE kernel (see
        _build_fused_iter_full; reference twin: the per-iteration
        divergence_iter/pressure_iter kernels, dfsph.py:449-485/518-547).
        ``sp`` is the carried drho/advected-density field, ``alphacp`` the
        liquid-masked alpha/dt (or alpha/dt^2) coefficient, ``pauxp`` the
        min-neighbor gate (mode 0) or rho/rho0 (mode 1).  vel/kv/S are
        donated in place; ``acc_seed`` a dead buffer donated as the raw
        accumulation output; err returns through the scalar SMEM output."""
        call = _build_fused_iter_full(self.plan, self.cfg, self.interpret)
        consts = jnp.stack([dt, jnp.float32(mode)]).astype(jnp.float32)
        vel, acc, s_new, kv, scal = call(
            self.nz_sym, self.act_sym, consts, self.xp_pad, self.vol_pad,
            self.liq_pad, alphacp[None], pauxp[None], sp[None], kvp[None],
            velp, acc_seed[None])
        return vel, acc[0], s_new[0], kv[0], scal

    def fused_visc_iter(self, x, r, d, delta, rinvp, minv6, dt, acc_seed):
        """(x', r', d', acc, [d_ad, delta']) of one viscosity-PCG iteration
        in ONE kernel (see _build_fused_visc_iter; reference twin: the
        per-iteration compute_viscosity_force kernel + atomic scalar
        reductions, dfsph.py:226-246).  ``minv6`` is the block-Jacobi
        preconditioner stacked (6, ...) in Sym3 component order;
        ``acc_seed`` a dead buffer donated as the matvec accumulator;
        x/r/d are donated and updated in place."""
        p = self.plan_fine
        call = _build_fused_visc_iter(p, self.cfg, self.interpret)
        consts = jnp.stack([dt, delta]).astype(jnp.float32)
        x, r, d, acc, scal = call(self.nz_sym_f, self.act_sym_f, consts,
                                  self.xp_pad, rinvp[None], self.liq_pad,
                                  self.sol_pad, minv6, x, r, d, acc_seed)
        return x, r, d, acc, scal

    def unpack_many(self, packed, defaults):
        """Per-liquid gather straight out of padded arrays (twin of
        grid.unpack_liquid_many; the padded flat index is derived from
        grid.slot, so the unpad copy is skipped entirely)."""
        p = self.plan
        nc = p.gx * p.P
        slot = self.grid.slot
        keep = slot >= 0
        s = jnp.maximum(slot, 0)
        rank = s // nc
        cell = s - rank * nc
        px = cell // p.P
        pp = cell - px * p.P
        idx = ((px + 1) * p.C + rank) * p.PP + (_MARGIN + pp)
        parts, sizes = [], []
        for xp in packed:
            x2 = xp.reshape((1, -1) if xp.ndim == 3 else (xp.shape[0], -1))
            parts.append(x2)
            sizes.append(x2.shape[0])
        stacked = jnp.concatenate(parts, axis=0)
        got = stacked[:, idx]
        out, o = [], 0
        for xp, d, k in zip(packed, defaults, sizes):
            sl = got[o:o + k]
            out.append(jnp.where(keep, sl[0], d) if xp.ndim == 3
                       else jnp.where(keep[None], sl, d))
            o += k
        return out
