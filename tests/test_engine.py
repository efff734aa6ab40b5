"""Differential tests: pallas sweep engine (interpret mode) vs dense_ops.

The engine (wcsph_tpu/pallas/engine.py) is the TPU hot path at scale; these
tests pin every op to its XLA twin on small scenes, including capacities
above one rank block and scenes with overflowing cells.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from wcsph_tpu import dam_break, dense_ops
from wcsph_tpu.config import SimConfig
from wcsph_tpu.grid import build_grid
from wcsph_tpu.pallas.engine import SweepEngine
from wcsph_tpu.utils import mat3


def _setup(cap=16, side=6, seed=0, jitter=0.0):
    r = 0.025
    sc = dam_break(particle_radius=r, fluid_dims=(side, side, side),
                   box_extent=side * 2 * r * 1.5)
    lo, hi = sc.domain(pad=6 * r)
    cfg = SimConfig(particle_radius=r, domain_min=lo, domain_max=hi,
                    cell_capacity=cap)
    rng = np.random.RandomState(seed)
    pos = sc.positions.T.copy()
    if jitter:
        pos += rng.randn(*pos.shape).astype(np.float32) * jitter
    grid = build_grid(jnp.asarray(pos), sc.n_liquid, cfg)
    eng = SweepEngine(grid, cfg, interpret=True)
    velp = jnp.where(grid.liquid[None],
                     jnp.asarray(rng.randn(3, *grid.pid.shape), jnp.float32),
                     0.0)
    kp = jnp.where(grid.liquid,
                   jnp.asarray(rng.randn(*grid.pid.shape), jnp.float32), 0.0)
    return cfg, grid, eng, velp, kp


def _close(a, b, where=None, rtol=3e-5):
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    d = jnp.abs(a - b)
    if where is not None:
        d = jnp.where(where, d, 0.0)
    scale = max(float(jnp.max(jnp.abs(a))), 1.0)
    assert float(jnp.max(d)) <= rtol * scale, (
        float(jnp.max(d)), scale)


@pytest.mark.parametrize("cap,jitter", [(16, 0.0), (24, 0.004)])
def test_density_alpha_matches(cap, jitter):
    cfg, grid, eng, _, _ = _setup(cap=cap, jitter=jitter)
    stats = dense_ops.density_stats(grid, cfg, with_alpha=True)
    rho, alpha, cnt = eng.density_alpha()
    v = grid.valid
    _close(jnp.where(v, stats.rho, 0), jnp.where(v, rho, 0))
    _close(jnp.where(v, stats.alpha, 0), jnp.where(v, alpha, 0))
    assert int(jnp.max(jnp.abs(jnp.where(v, stats.count - cnt, 0)))) == 0


def test_kappa_and_div_match():
    cfg, grid, eng, velp, kp = _setup(jitter=0.003)
    dt = jnp.float32(1e-3)
    liq = grid.liquid
    v1 = dense_ops.kappa_velocity_update(grid, cfg, velp, kp, dt)
    v2 = eng.kappa_velocity_update(velp, kp, dt)
    _close(jnp.where(liq[None], v1, 0), jnp.where(liq[None], v2, 0))
    d1 = dense_ops._div_accum(grid, cfg, velp)
    d2 = eng.div_accum(velp)
    _close(jnp.where(liq, d1, 0), jnp.where(liq, d2, 0))


def test_viscosity_ops_match():
    cfg, grid, eng, velp, _ = _setup(jitter=0.003)
    dt = jnp.float32(1e-3)
    liq = grid.liquid
    rhop = dense_ops.density_stats(grid, cfg, with_alpha=False).rho
    rho_pad = dense_ops.WindowLoop(grid, cfg).pad(rhop, 1.0)
    m1 = dense_ops.visc_matvec(grid, cfg, velp, rhop, rho_pad, dt)
    m2 = eng.visc_matvec(velp, rhop, dt)
    _close(jnp.where(liq[None], m1, 0), jnp.where(liq[None], m2, 0))
    minv1, ax1 = dense_ops.visc_init(grid, cfg, velp, rhop, rho_pad, dt)
    minv2, ax2 = eng.visc_init(velp, rhop, dt)
    for f in mat3.Sym3._fields:
        _close(jnp.where(liq, getattr(minv1, f), 0),
               jnp.where(liq, getattr(minv2, f), 0))
    _close(jnp.where(liq[None], ax1, 0), jnp.where(liq[None], ax2, 0))


def test_vorticity_matches():
    cfg, grid, eng, velp, _ = _setup(jitter=0.003)
    dt = jnp.float32(1e-3)
    liq = grid.liquid
    stats = dense_ops.density_stats(grid, cfg, with_alpha=False)
    omp = velp * 0.1
    dv1, om1 = dense_ops.vorticity(grid, cfg, velp, omp, stats.rho, dt)
    dv2, om2 = eng.vorticity(velp, omp, stats.rho, stats.count, dt)
    _close(jnp.where(liq[None], dv1, 0), jnp.where(liq[None], dv2, 0))
    _close(jnp.where(liq[None], om1, 0), jnp.where(liq[None], om2, 0))


def test_engine_step_matches_xla_step():
    """One full DFSPH step with the engine == one step without (tolerance)."""
    from wcsph_tpu.solvers import dfsph
    from wcsph_tpu.state import init_state

    r = 0.025
    sc = dam_break(particle_radius=r, fluid_dims=(6, 6, 6),
                   box_extent=6 * 2 * r * 1.5)
    lo, hi = sc.domain(pad=6 * r)
    cfg_x = dfsph.default_config(particle_radius=r, domain_min=lo,
                                 domain_max=hi, cell_capacity=16)
    cfg_e = cfg_x.replace(use_pallas=True)
    s_x = dfsph.step(init_state(sc, cfg_x), cfg_x)
    s_e = dfsph.step(init_state(sc, cfg_e), cfg_e)
    assert int(s_x.diag.pressure_iters) == int(s_e.diag.pressure_iters)
    np.testing.assert_allclose(np.asarray(s_x.pos), np.asarray(s_e.pos),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_x.vel), np.asarray(s_e.vel),
                               atol=1e-4)


def test_sesph_force_matches():
    """Fused explicit-viscosity + Tait-pressure sweep vs the XLA twins."""
    from wcsph_tpu import ops as wops

    cfg, grid, eng, velp, _ = _setup(cap=16, jitter=0.002)
    stats = dense_ops.density_stats(grid, cfg, with_alpha=False)
    rhop, pp = wops.tait_pressure(stats.rho, cfg)
    acc_x = (dense_ops.explicit_viscosity_accel(grid, cfg, velp, rhop)
             + dense_ops.pressure_accel_symmetric(grid, cfg, rhop, pp))
    acc_e = eng.sesph_force(velp, rhop, pp)
    liq = grid.liquid
    _close(jnp.where(liq[None], acc_e, 0), jnp.where(liq[None], acc_x, 0),
           rtol=2e-4)


def test_tension_ops_match():
    """Engine surface-normal + tension/adhesion sweeps vs the XLA twins,
    with both the cohesion and the boundary-adhesion gates active."""
    cfg0, grid, _, _, _ = _setup(jitter=0.003)
    cfg = cfg0.replace(tension_coff=0.25, tension_coff_b=0.4,
                       adhesion_center=(0.0, -0.2, 0.0), adhesion_radius=0.2)
    eng = SweepEngine(grid, cfg, interpret=True)
    liq = grid.liquid
    rhop = dense_ops.density_stats(grid, cfg, with_alpha=False).rho
    n1 = dense_ops.surface_normals(grid, cfg, rhop)
    n2 = eng.surface_normals(rhop)
    _close(jnp.where(liq[None], n1, 0), jnp.where(liq[None], n2, 0))
    t1 = dense_ops.tension_accel(grid, cfg, rhop, n1)
    t2 = eng.tension_accel(rhop, n2)
    _close(jnp.where(liq[None], t1, 0), jnp.where(liq[None], t2, 0),
           rtol=2e-4)
    # non-vacuous: tension fires, and the adhesion gate covers some pairs
    assert float(jnp.max(jnp.abs(jnp.where(liq[None], t2, 0)))) > 0.0
    cfg_na = cfg.replace(tension_coff_b=0.0)
    t3 = SweepEngine(grid, cfg_na, interpret=True).tension_accel(rhop, n2)
    assert float(jnp.max(jnp.abs(jnp.where(liq[None], t2 - t3, 0)))) > 0.0


def _squeezed_dam_break(r=0.025, side=6, box_extent=0.7, squeeze=0.92):
    """Dam break with the fluid block compressed toward its centroid so the
    FIRST step already sees adv_rho > 1: the pressure solvers genuinely
    iterate and produce nonzero pressures (a free-falling block keeps
    pressure identically 0, which tests the pressure-solve kernels only
    vacuously)."""
    from wcsph_tpu import dam_break as mk

    sc = mk(particle_radius=r, fluid_dims=(side, side, side),
            box_extent=box_extent)
    liq = sc.positions[: sc.n_liquid]
    centre = liq.mean(axis=0, keepdims=True)
    sc.positions[: sc.n_liquid] = centre + (liq - centre) * squeeze
    return sc


@pytest.mark.parametrize("solver", ["sesph", "pcisph", "iisph"])
def test_solver_step_engine_matches_xla(solver):
    """Full engine-path steps for the engine-ized solvers must reproduce the
    XLA-path trajectories ON A PRESSURIZED SCENE (compressed fluid: the
    pressure solve does real work; asserted non-vacuous below)."""
    from wcsph_tpu.simulation import Simulation, default_config

    r = 0.025
    # squeeze ~0.9 is the sweet spot for an 8^3 block: predicted density
    # peaks ~1.03-1.1 (surface deficit keeps smaller squeezes below 1.0),
    # which forces real solver iterations without the chaotic blow-up a >8%
    # compression causes under fixed dt (rounding then amplifies across
    # iterations and the two paths legitimately diverge).  PCISPH needs the
    # extra compression to leave its 3-iteration minimum within 1% tol.
    sc = _squeezed_dam_break(r=r, side=8, box_extent=0.9,
                             squeeze=0.90 if solver == "pcisph" else 0.92)
    lo, hi = sc.domain(pad=4 * r)
    out = {}
    trace = {}
    for use_pallas in (False, True):
        cfg = default_config(solver, particle_radius=r, domain_min=lo,
                             domain_max=hi, use_pallas=use_pallas)
        sim = Simulation(sc, cfg, solver=solver)
        iters, maxp = [], []
        for _ in range(3):
            sim.step()
            iters.append(int(sim.state.diag.pressure_iters))
            maxp.append(float(np.abs(np.asarray(sim.state.pressure)).max()))
        out[use_pallas] = sim
        trace[use_pallas] = (iters, maxp)
    px = np.asarray(out[False].state.pos)
    pe = np.asarray(out[True].state.pos)
    np.testing.assert_allclose(pe, px, rtol=2e-4, atol=1e-6)
    vx = np.asarray(out[False].state.vel)
    ve = np.asarray(out[True].state.vel)
    np.testing.assert_allclose(ve, vx, rtol=2e-3, atol=2e-4)
    # the scene must exercise the pressure path for real (a free-falling
    # block keeps pressure identically 0 — vacuous for the solve kernels)
    assert max(trace[True][1]) > 0.0
    if solver in ("pcisph", "iisph"):
        assert trace[True][0] == trace[False][0], trace
        min_iters = (out[True].cfg.pcisph_min_iters if solver == "pcisph"
                     else out[True].cfg.iisph_min_iters)
        assert max(trace[True][0]) > min_iters, trace


@pytest.mark.parametrize("warm", [False, True])
def test_fused_solver_iters_match_two_kernel(warm):
    """cfg.fused_solver_iters (engine._build_fused_iter: kappa velocity
    update + drho in ONE sequential-grid Mosaic program, fused warm starts
    as receiver gates; plus engine._build_fused_visc_iter: the whole
    viscosity-PCG iteration incl. both global dots in one program) must
    reproduce the two-kernel engine path on a PRESSURIZED dam break,
    including divergence/pressure/viscosity iteration counts."""
    from wcsph_tpu.simulation import Simulation, default_config

    r = 0.025
    sc = _squeezed_dam_break(r=r, side=8, box_extent=0.9, squeeze=0.92)
    lo, hi = sc.domain(pad=4 * r)
    out, trace = {}, {}
    for fused in (False, True):
        cfg = default_config("dfsph", particle_radius=r, domain_min=lo,
                             domain_max=hi, use_pallas=True,
                             pressure_warm_start=warm,
                             divergence_warm_start=warm,
                             fused_solver_iters=fused)
        sim = Simulation(sc, cfg, solver="dfsph")
        iters, maxk = [], 0.0
        for _ in range(3):
            sim.step()
            iters.append((int(sim.state.diag.divergence_iters),
                          int(sim.state.diag.pressure_iters),
                          int(sim.state.diag.viscosity_iters)))
            maxk = max(maxk, float(np.abs(np.asarray(
                sim.state.kappa)).max()))
        out[fused] = sim
        trace[fused] = (iters, maxk)
    assert trace[True][0] == trace[False][0], trace
    # non-vacuous: the fused kernel must have done real pressure work on
    # this compressed scene at SOME step (nonzero stiffness out of the
    # pressure loop; the block relaxes after the first correction and
    # advected_density clamps at 1.0, so the LAST step's kappa returns to
    # exactly 0 — and DFSPH's min_iters can already converge this scene, so
    # iters alone can't discriminate either)
    assert trace[True][1] > 0.0, trace
    np.testing.assert_allclose(np.asarray(out[True].state.pos),
                               np.asarray(out[False].state.pos),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[True].state.vel),
                               np.asarray(out[False].state.vel),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out[True].state.kappa),
                               np.asarray(out[False].state.kappa),
                               rtol=2e-3, atol=2e-4)


def test_fused_iisph_iter_matches_two_kernel():
    """cfg.fused_solver_iters on IISPH (engine.fused_jacobi_iter: zero +
    dij + s + Jacobi-update phases in one program, field prep in VMEM and
    the residual reduced in-kernel) must reproduce the two-kernel engine
    path on a pressurized scene, including Jacobi iteration counts."""
    from wcsph_tpu.simulation import Simulation, default_config

    r = 0.025
    sc = _squeezed_dam_break(r=r, side=8, box_extent=0.9, squeeze=0.92)
    lo, hi = sc.domain(pad=4 * r)
    out, trace = {}, {}
    for fused in (False, True):
        cfg = default_config("iisph", particle_radius=r, domain_min=lo,
                             domain_max=hi, use_pallas=True,
                             fused_solver_iters=fused)
        sim = Simulation(sc, cfg, solver="iisph")
        iters, maxp = [], 0.0
        for _ in range(3):
            sim.step()
            iters.append(int(sim.state.diag.pressure_iters))
            maxp = max(maxp, float(np.abs(np.asarray(
                sim.state.pressure)).max()))
        out[fused] = sim
        trace[fused] = (iters, maxp)
    assert trace[True][0] == trace[False][0], trace
    assert trace[True][1] > 0.0, trace          # real pressure work
    np.testing.assert_allclose(np.asarray(out[True].state.pos),
                               np.asarray(out[False].state.pos),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[True].state.vel),
                               np.asarray(out[False].state.vel),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out[True].state.pressure),
                               np.asarray(out[False].state.pressure),
                               rtol=2e-3, atol=1e-2)


def test_fused_pcisph_iter_matches_two_kernel():
    """cfg.fused_solver_iters on PCISPH (engine.fused_pcisph_iter: zero +
    predicted-density + pressure-update/acceleration phases in one program,
    starred positions formed in VMEM) must reproduce the two-kernel engine
    path on a pressurized scene, including prediction iteration counts —
    and the scene must push the loop past its 3-iteration minimum."""
    from wcsph_tpu.simulation import Simulation, default_config

    r = 0.025
    sc = _squeezed_dam_break(r=r, side=8, box_extent=0.9, squeeze=0.90)
    lo, hi = sc.domain(pad=4 * r)
    out, trace = {}, {}
    for fused in (False, True):
        cfg = default_config("pcisph", particle_radius=r, domain_min=lo,
                             domain_max=hi, use_pallas=True,
                             fused_solver_iters=fused)
        sim = Simulation(sc, cfg, solver="pcisph")
        iters, maxp = [], 0.0
        for _ in range(3):
            sim.step()
            iters.append(int(sim.state.diag.pressure_iters))
            maxp = max(maxp, float(np.abs(np.asarray(
                sim.state.pressure)).max()))
        out[fused] = sim
        trace[fused] = (iters, maxp)
    assert trace[True][0] == trace[False][0], trace
    assert trace[True][1] > 0.0, trace          # real pressure work
    assert max(trace[True][0]) > out[True].cfg.pcisph_min_iters, trace
    np.testing.assert_allclose(np.asarray(out[True].state.pos),
                               np.asarray(out[False].state.pos),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[True].state.vel),
                               np.asarray(out[False].state.vel),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out[True].state.pressure),
                               np.asarray(out[False].state.pressure),
                               rtol=2e-3, atol=1e-2)


# ---------------------------------------------------------------------------
# O(N^2) oracle for the IISPH pressure-solve ops — an INDEPENDENT
# re-derivation of the pair sums (not the dense_ops twins), so a bug shared
# with the twin cannot hide (this class of test caught the a_ii neighbor-term
# bug in round 2's engine).
# ---------------------------------------------------------------------------

class _Oracle:
    """Dense pairwise geometry over the occupied slots of a packed grid."""

    def __init__(self, grid, cfg):
        from wcsph_tpu import kernels

        h = cfg.support_radius
        self.cfg = cfg
        self.idx = np.nonzero(np.asarray(grid.valid).ravel())[0]
        self.liq = np.asarray(grid.liquid).ravel()[self.idx]
        x = np.asarray(grid.xp.reshape(3, -1))[:, self.idx].T      # (n, 3)
        self.r = x[:, None, :] - x[None, :, :]
        self.d2 = (self.r ** 2).sum(-1)
        n = len(self.idx)
        self.mask = (self.d2 <= h * h) & ~np.eye(n, dtype=bool)
        dist = np.sqrt(np.maximum(self.d2, 0.0))
        self.gs = np.where(self.mask,
                           np.asarray(kernels.cubic_grad_scale(dist, h)), 0.0)
        self.vol = np.where(self.liq, cfg.liquid_volume, cfg.solid_volume)
        self.shape = grid.pid.shape

    def take(self, packed):
        """Packed (k, C, NC)/(C, NC) -> (k, n)/(n,) over occupied slots."""
        a = np.asarray(packed)
        return a.reshape(a.shape[:-2] + (-1,))[..., self.idx]

    def put(self, vals):
        """(k, n)/(n,) -> packed with zeros elsewhere."""
        lead = vals.shape[:-1]
        out = np.zeros(lead + (self.shape[0] * self.shape[1],), np.float32)
        out[..., self.idx] = vals
        return out.reshape(lead + self.shape)

    def dot_r(self, vec_i):
        """(3, n) per-RECEIVER vector -> (n, n) (vec_i . r_ij)."""
        return sum(vec_i[c][:, None] * self.r[:, :, c] for c in range(3))

    def dot_r_j(self, vec_j):
        """(3, n) per-SOURCE vector -> (n, n) (vec_j . r_ij)."""
        return sum(vec_j[c][None, :] * self.r[:, :, c] for c in range(3))


def test_iisph_ops_match_oracle():
    cfg, grid, eng, velp, kp = _setup(jitter=0.003)
    rng = np.random.RandomState(7)
    o = _Oracle(grid, cfg)
    liq = grid.liquid
    shp = grid.pid.shape
    v0, vs = cfg.liquid_volume, cfg.solid_volume

    def rand(k=None):
        s = shp if k is None else (k,) + shp
        return jnp.asarray(rng.randn(*s).astype(np.float32))

    # --- aii: sum_j V_j gs (d_ii_i . r) — receiver's own d_ii ONLY ---
    dii = rand(3)
    aii_e = eng.iisph_aii(dii)
    aii_o = ((o.vol[None, :] * o.gs * o.dot_r(o.take(dii))).sum(1))
    _close(jnp.where(liq, aii_e, 0), o.put(aii_o) * np.asarray(liq))

    # --- dij: sum_j fac_j gs r ---
    fac = rand()
    dij_e = eng.iisph_dij(fac)
    fg = o.take(fac)[None, :] * o.gs
    dij_o = np.stack([(fg * o.r[:, :, c]).sum(1) for c in range(3)])
    _close(jnp.where(liq[None], dij_e, 0), o.put(dij_o) * np.asarray(liq))

    # --- s: the mixed one-sided Jacobi sweep ---
    dij3 = rand(3)
    p_liq = jnp.where(liq, jnp.abs(rand()), 0.0)
    g = jnp.abs(rand())
    s_e = eng.iisph_s(dii, dij3, p_liq, g)
    dij_i = o.dot_r(o.take(dij3)) * o.gs
    dii_j = o.gs * o.take(p_liq)[None, :] * o.dot_r_j(o.take(dii))
    dij_j = o.gs * o.dot_r_j(o.take(dij3))
    dji_pi = o.take(g)[:, None] * o.gs * o.gs * o.d2
    term_liq = v0 * (dij_i - dii_j - dij_j + dji_pi)
    term_sol = vs * dij_i
    s_o = (np.where(o.liq[None, :], term_liq,
                    np.where(o.mask, term_sol, 0.0))
           * o.mask).sum(1)
    _close(jnp.where(liq, s_e, 0), o.put(s_o) * np.asarray(liq), rtol=1e-4)

    # --- force: -sum_j c_hn gs r ---
    dpi = jnp.where(liq, jnp.abs(rand()), 0.0)
    f_e = eng.iisph_force(dpi)
    dpi_o = o.take(dpi)
    sym = v0 * (dpi_o[:, None] + dpi_o[None, :])
    c_hn = np.where(o.liq[None, :], sym, vs * dpi_o[:, None]) * o.gs
    f_o = np.stack([-(c_hn * o.r[:, :, c]).sum(1) for c in range(3)])
    _close(jnp.where(liq[None], f_e, 0), o.put(f_o) * np.asarray(liq))


def test_pcisph_predict_matches_oracle():
    """O(N^2) oracle for the PCISPH predicted-density + pressure-accel op
    (_PcisphPredict): independent re-derivation at STARRED positions with
    the binning left at the original positions — the same contract the
    fused per-iteration kernel inherits (fused == two-kernel is pinned by
    test_fused_pcisph_iter_matches_two_kernel; two-kernel == this oracle
    closes the shared-twin-bug hole for the op)."""
    from wcsph_tpu import kernels

    cfg, grid, eng, velp, _ = _setup(jitter=0.003)
    rng = np.random.RandomState(11)
    h = cfg.support_radius
    liq = grid.liquid
    shp = grid.pid.shape

    # small starred displacement (<< cell) so binning-at-original still
    # covers every starred pair, exactly the solver's CFL-bounded regime
    dt = 5e-4
    xstar = grid.xp + jnp.where(liq[None], velp * dt, 0.0)
    pp = jnp.where(liq, jnp.abs(jnp.asarray(
        rng.randn(*shp).astype(np.float32))), 0.0)
    adv_e, acc_e = eng.pcisph_predict(xstar, pp)

    o = _Oracle(grid, cfg)
    xs = np.asarray(xstar.reshape(3, -1))[:, o.idx].T        # (n, 3)
    r = xs[:, None, :] - xs[None, :, :]
    d2 = (r ** 2).sum(-1)
    n = len(o.idx)
    mask = (d2 <= h * h) & ~np.eye(n, dtype=bool)
    dist = np.sqrt(np.maximum(d2, 1e-30))
    wk = np.where(mask, np.asarray(kernels.cubic_w_scalar(dist, h)), 0.0)
    gs = np.where(mask, np.asarray(kernels.cubic_grad_scale(dist, h)), 0.0)

    # engine outputs are contractually valid at LIQUID receivers only (the
    # activity bitmasks skip rank blocks with no liquid in range; solid-slot
    # adv/pp are never consumed — see _PcisphPredict._coeffs)
    adv_o = (o.vol[None, :] * wk).sum(1)
    _close(jnp.where(liq, adv_e, 0), o.put(adv_o.astype(np.float32))
           * np.asarray(liq), rtol=1e-4)

    p = o.take(pp)
    psum = p[:, None] + p[None, :]
    c_hn = np.where(o.liq[None, :], cfg.liquid_volume * psum,
                    cfg.solid_volume * p[:, None]) * gs
    acc_o = np.stack([-(c_hn * r[:, :, c]).sum(1) for c in range(3)])
    _close(jnp.where(liq[None], acc_e, 0),
           o.put(acc_o.astype(np.float32)) * np.asarray(liq), rtol=1e-4)


def test_iisph_aii_sign_pressurized():
    """On a real compressed-fluid first step, a_ii must be negative at
    interior liquid slots (the Jacobi denominator; a wrong-diagonal engine
    produced values off by ~2.7x here)."""
    from wcsph_tpu.solvers import iisph as ii

    r = 0.025
    sc = _squeezed_dam_break(r=r, side=8, box_extent=0.9, squeeze=0.85)
    lo, hi = sc.domain(pad=4 * r)
    cfg = ii.default_config(particle_radius=r, domain_min=lo, domain_max=hi)
    grid = build_grid(jnp.asarray(sc.positions.T), sc.n_liquid, cfg)
    eng = SweepEngine(grid, cfg, interpret=True)
    rho0 = cfg.rest_density
    rhop, _, _ = eng.density_alpha(with_alpha=False)
    velp = jnp.zeros((3,) + grid.pid.shape, jnp.float32)
    dii_raw, adv_acc, dji_acc = eng.iisph_adv(velp)
    d_ii = dii_raw * ((rho0 / rhop) ** 2)[None]
    den_i2 = (rhop / rho0) ** 2
    a_ii = eng.iisph_aii(d_ii) - (cfg.liquid_volume / den_i2) * dji_acc
    interior = np.asarray(grid.liquid) & (np.asarray(rhop) > 1.05 * rho0)
    assert interior.any()
    assert float(jnp.max(jnp.where(interior, a_ii, -1.0))) < 0.0


def test_fused_tension_matches_two_sweep():
    """engine.fused_tension (surface normals + cohesion/curvature/adhesion
    in ONE two-phase Mosaic program, _build_fused_tension) must reproduce
    the surface_normals + tension_accel sweep pair — same emit singletons,
    different accumulation order, so tolerance-based like every fused-vs-
    two-kernel test (VERDICT r4 weak #9: the two-sweep tension pipeline
    cost ~40% of flagship throughput)."""
    import jax

    from wcsph_tpu import dam_break, resident as res
    from wcsph_tpu.pallas.engine import PaddedEngine, make_plan

    r = 0.025
    side = 6
    sc = dam_break(particle_radius=r, fluid_dims=(side,) * 3,
                   box_extent=side * 2 * r * 1.5)
    lo, hi = sc.domain(pad=6 * r)
    cfg = SimConfig(particle_radius=r, domain_min=lo, domain_max=hi,
                    cell_capacity=16, tension_coff=0.5, tension_coff_b=0.25,
                    adhesion_center=(0.0, 0.0, 0.0), adhesion_radius=0.3)
    rng = np.random.RandomState(3)
    pos = sc.positions.T.copy()
    pos[:, :sc.n_liquid] += rng.randn(3, sc.n_liquid).astype(np.float32) * 0.004

    @jax.jit
    def go(pos):
        plan = make_plan(cfg, cfg.cell_capacity)
        rgrid = res.build_grid_padded(plan, pos, sc.n_liquid, cfg)
        eng = PaddedEngine.from_resident(rgrid, cfg, interpret=True)
        rho, _, _ = eng.density_alpha(with_alpha=False)
        n2 = eng.surface_normals(rho)
        acc2 = eng.tension_accel(rho, n2)
        n1, acc1 = eng.fused_tension(rho)
        valid = rgrid.pid >= 0
        return n1, n2, acc1, acc2, valid

    n1, n2, acc1, acc2, valid = go(jnp.asarray(pos))
    v3 = np.asarray(valid)[None]
    n1, n2 = np.where(v3, n1, 0), np.where(v3, n2, 0)
    acc1, acc2 = np.where(v3, acc1, 0), np.where(v3, acc2, 0)
    sn = max(np.abs(n2).max(), 1e-6)
    sa = max(np.abs(acc2).max(), 1e-6)
    assert np.abs(n1 - n2).max() <= 3e-5 * sn, np.abs(n1 - n2).max() / sn
    assert np.abs(acc1 - acc2).max() <= 3e-5 * sa, (
        np.abs(acc1 - acc2).max() / sa)
