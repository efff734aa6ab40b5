"""Non-DFSPH solvers under the resident slab decomposition (split from test_resident_slab.py — see tests/_slab_utils.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wcsph_tpu import scene
from wcsph_tpu.parallel import halo, resident_slab as rsl
from wcsph_tpu.simulation import default_config
from wcsph_tpu.solvers import dfsph
from wcsph_tpu.state import init_state

from _slab_utils import (R, mesh8, scene_cfg as _scene_cfg,  # noqa: F401
                         conserved as _conserved, glue_eqns as _glue_eqns)

@pytest.mark.parametrize("solver", ["sesph", "pcisph", "iisph"])
def test_resident_slab_other_solvers(mesh8, solver):
    """All four solvers run under the resident decomposition (the non-DFSPH
    loops take their per-sweep engine paths; kappa seats carry pressure)."""
    sc = scene.dam_break(particle_radius=R, fluid_dims=(5, 5, 5),
                         box_extent=0.6)
    lo, hi = sc.domain(pad=4 * R)
    cfg = default_config(solver, particle_radius=R, domain_min=lo,
                         domain_max=hi, use_pallas=True)
    cfg = halo.slab_config(cfg, 8)
    state = init_state(sc, cfg)
    state = state.replace(dt=jnp.float32(cfg.dt_init))
    from wcsph_tpu.simulation import get_solver
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
    assert _conserved(srs, state.n_total)
    assert np.isfinite(np.asarray(got.pos)[:, :state.n_liquid]).all()


