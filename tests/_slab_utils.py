"""Shared fixtures/helpers for the slab-decomposition test files.

The resident-slab suite is split across several test files so that no
single pytest process carries more than ~2-3 heavy 8-device pallas-interpret
compiles (VERDICT r4 directive 7: cold-cache cost per file < ~5 min;
scripts/run_suite.sh runs one process per file)."""

import jax
import numpy as np
import pytest

from wcsph_tpu import scene
from wcsph_tpu.parallel import halo
from wcsph_tpu.simulation import default_config

R = 0.025


@pytest.fixture(scope="module")
def mesh8():
    assert len(jax.devices()) >= 8
    return halo.Mesh(np.asarray(jax.devices()[:8]), (halo.AXIS,))


def scene_cfg(**over):
    sc = scene.dam_break(particle_radius=R, fluid_dims=(6, 6, 6),
                         box_extent=0.7)
    lo, hi = sc.domain(pad=4 * R)
    # fixed dt: adaptive-dt feedback branches flip on rank-order float
    # drift (see test_slab.py)
    cfg = default_config("dfsph", particle_radius=R, domain_min=lo,
                         domain_max=hi, use_pallas=True,
                         adaptive_dt=False, dt_init=3e-3, **over)
    return sc, halo.slab_config(cfg, 8)


def conserved(srs, n_total):
    pids = np.concatenate([np.asarray(srs.pid).ravel(),
                           np.asarray(srs.side_pid)])
    pids = pids[pids >= 0]
    return len(pids) == n_total and len(np.unique(pids)) == n_total


def glue_eqns(jaxpr):
    """Runtime-op census with pallas kernels atomic (each is ONE fused TPU
    program; what the axon launch gap charges is the glue around them)."""
    count = 0
    for eq in jaxpr.eqns:
        count += 1
        if eq.primitive.name == "pallas_call":
            continue
        for v in eq.params.values():
            for w in (v if isinstance(v, (list, tuple)) else [v]):
                if hasattr(w, "jaxpr"):
                    count += glue_eqns(w.jaxpr)
                elif hasattr(w, "eqns"):
                    count += glue_eqns(w)
    return count


def run_solver_slab(mesh8, solver):
    """Differential: ``solver`` under the 8-device resident slab
    decomposition vs its single-chip step (shared by the per-solver test
    files — one heavy interpret-mode compile per pytest process, so each
    file stays inside the cold-cache budget; run_suite.sh is per-file)."""
    import jax.numpy as jnp

    from wcsph_tpu.parallel import resident_slab as rsl
    from wcsph_tpu.simulation import default_config, get_solver
    from wcsph_tpu.state import init_state

    sc = scene.dam_break(particle_radius=R, fluid_dims=(5, 5, 5),
                         box_extent=0.6)
    lo, hi = sc.domain(pad=4 * R)
    cfg = default_config(solver, particle_radius=R, domain_min=lo,
                         domain_max=hi, use_pallas=True)
    cfg = halo.slab_config(cfg, 8)
    state = init_state(sc, cfg)
    state = state.replace(dt=jnp.float32(cfg.dt_init))
    sol = get_solver(solver)
    if hasattr(sol, "prepare"):
        state = sol.prepare(state, cfg)

    names = rsl.resident_fields(solver)
    srs = rsl.slab_res_init(state, cfg, mesh8, names)
    stepn = jax.jit(lambda s: rsl.step_slab_resident(s, cfg, mesh8, solver))
    ref = state
    step1 = jax.jit(lambda s: sol.step(s, cfg))
    for _ in range(4):
        ref = step1(ref)
        srs = stepn(srs)
    got = rsl.gather_state(srs, state, names)
    np.testing.assert_allclose(np.asarray(got.pos), np.asarray(ref.pos),
                               rtol=2e-3, atol=6e-4)
    assert conserved(srs, state.n_total)
    assert np.isfinite(np.asarray(got.pos)[:, :state.n_liquid]).all()
