"""Migration-overspill conservation under the slab decomposition (split from test_resident_slab.py — see tests/_slab_utils.py)."""

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

def test_resident_slab_migration_overspill(mesh8):
    """Force more same-direction slab crossers in one step than the kmig
    payload width (128): overspilled emigrants must re-park in the side
    buffer and retry next step instead of being destroyed (ADVICE r4 high:
    a spike step used to delete them permanently — cand_pid zeroed while
    their slot was still cleared)."""
    b = scene.SceneBuilder()
    # 288 liquid particles in two x-planes one cell apart: when a plane
    # crosses a slab boundary, 144 > kmig=128 emigrate in one step
    b.add_liquid_block((2, 12, 12), 2 * R, origin=(-0.05, -0.3, -0.3))
    sc = b.build()
    cfg = default_config("dfsph", particle_radius=R,
                         domain_min=(-2.4, -0.5, -0.5),
                         domain_max=(2.4, 0.5, 0.5),
                         use_pallas=True, adaptive_dt=False, dt_init=3e-3)
    cfg = halo.slab_config(cfg, 8)
    state = init_state(sc, cfg)
    # ~1.1 cells/step along +x: the whole block marches across slab
    # boundaries, producing at least one >kmig crossing spike
    state = state.replace(dt=jnp.float32(cfg.dt_init),
                          vel=state.vel.at[0].add(36.0))
    names = rsl.resident_fields("dfsph")
    srs = rsl.slab_res_init(state, cfg, mesh8, names)
    stepn = jax.jit(lambda s: rsl.step_slab_resident(s, cfg, mesh8, "dfsph"))
    max_side = 0
    for _ in range(8):
        srs = stepn(srs)
        max_side = max(max_side, int(np.max(np.asarray(srs.overflow))))
        assert _conserved(srs, state.n_total)
    assert max_side > 0, "spill path never fired — scene no longer forces it"
    assert int(np.sum(np.asarray(srs.lost))) == 0


