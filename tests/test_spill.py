"""Overflow-capacity spill fallback (resident.padded_step_spill).

VERDICT r4 directive 3: the engine's non-resident padded-direct step must
run a tight cell capacity without dropping particles — when a step's
occupancy would overflow cfg.cell_capacity, the whole packed middle runs at
cfg.cell_capacity_spill inside one lax.cond branch instead.

Invariants pinned here:
  * spill branch == a plain run at the wide capacity, bit-for-bit (the
    branches share one binning prep; reference contract HashGrid.py:73
    drops overflowing particles — the spill branch instead keeps them all
    interacting);
  * no-spill steps == a plain run at the tight capacity, bit-for-bit;
  * diag.neighbor_overflow == 0 through a forced overflow.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wcsph_tpu import dam_break
from wcsph_tpu.simulation import default_config
from wcsph_tpu.state import init_state
from wcsph_tpu.solvers import sesph


def _scene(compress: float):
    """6^3 block; compress < 1 shrinks the spacing so cells overflow C=8."""
    r = 0.025
    side = 6
    sc = dam_break(particle_radius=r, fluid_dims=(side, side, side),
                   box_extent=side * 2 * r * 1.6)
    sc.positions[: sc.n_liquid] *= compress
    return sc


def _cfg(sc, cap, spill=0):
    lo, hi = sc.domain(pad=6 * 0.025)
    return default_config(
        "sesph", particle_radius=0.025, domain_min=lo, domain_max=hi,
        use_pallas=True, cell_capacity=cap, cell_capacity_spill=spill,
        solid_volume_auto=False)


def _one_step(sc, cfg):
    state = init_state(sc, cfg)
    state = state.replace(dt=jnp.float32(cfg.dt_init))
    out = jax.jit(sesph.step, static_argnums=1)(state, cfg)
    jax.block_until_ready(out.pos)
    return out


def _assert_equal_states(a, b):
    for la, lb in zip(jax.tree_util.tree_leaves(a),
                      jax.tree_util.tree_leaves(b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_spill_branch_matches_wide_capacity():
    sc = _scene(compress=0.85)          # 9-24 particles per cell: overflows
    cfg8 = _cfg(sc, cap=8)              # C=8, fits C=24
    from wcsph_tpu.grid import build_grid
    from wcsph_tpu.state import init_state as mk

    g8 = build_grid(mk(sc, cfg8).pos, sc.n_liquid, cfg8)
    assert int(g8.overflow) > 0, "scene must overflow C=8 for this test"
    g24 = build_grid(mk(sc, _cfg(sc, cap=24)).pos, sc.n_liquid,
                     _cfg(sc, cap=24))
    assert int(g24.overflow) == 0, "scene must fit C=24 for this test"

    out_spill = _one_step(sc, _cfg(sc, cap=8, spill=24))
    out_wide = _one_step(sc, _cfg(sc, cap=24))
    _assert_equal_states(out_spill, out_wide)
    assert int(out_spill.diag.neighbor_overflow) == 0


def test_no_spill_matches_tight_capacity():
    sc = _scene(compress=1.0)           # rest spacing: fits C=16 everywhere
    out_spill = _one_step(sc, _cfg(sc, cap=16, spill=24))
    out_tight = _one_step(sc, _cfg(sc, cap=16))
    _assert_equal_states(out_spill, out_tight)


def test_spill_flag_detection():
    from wcsph_tpu import resident as res

    sc = _scene(compress=0.85)
    cfg = _cfg(sc, cap=8)
    state = init_state(sc, cfg)
    prep = jax.jit(res.build_prep, static_argnums=1)(state.pos, cfg)
    assert bool(prep.spill)
    cfg24 = dataclasses.replace(cfg, cell_capacity=24)
    prep24 = jax.jit(res.build_prep, static_argnums=1)(state.pos, cfg24)
    assert not bool(prep24.spill)
