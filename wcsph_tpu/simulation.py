"""High-level simulation driver.

Replaces the reference's per-solver ``while gui.running`` frame loops
(dfsph.py:600-647 etc.) with a solver-agnostic driver around pure jitted step
functions.  Two execution modes:

  * ``step()`` — one jitted step, state stays on device (donated).
  * ``run(n)`` — n steps via ``lax.scan`` in a single device program:
    zero per-frame host round-trips, the mode used by the benchmark.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .config import SimConfig
from .scene import Scene
from .state import FluidState, init_state, has_nan
from .solvers import dfsph, iisph, pcisph, sesph

_SOLVERS: Dict[str, object] = {
    "sesph": sesph,
    "pcisph": pcisph,
    "iisph": iisph,
    "dfsph": dfsph,
}


def get_solver(name: str):
    try:
        return _SOLVERS[name]
    except KeyError:
        raise ValueError(f"unknown solver {name!r}; choose from {sorted(_SOLVERS)}")


def default_config(solver: str, **overrides) -> SimConfig:
    return get_solver(solver).default_config(**overrides)


@partial(jax.jit, static_argnums=(1, 2), donate_argnums=0)
def _step_jit(state: FluidState, step_fn: Callable, cfg: SimConfig) -> FluidState:
    return step_fn(state, cfg)


@partial(jax.jit, static_argnums=(1, 2))
def _res_init_jit(state, cfg, dyn_names):
    from . import resident
    return resident.from_fluid(cfg, state, dyn_names)


@partial(jax.jit, static_argnums=(1, 2), donate_argnums=0)
def _res_step_jit(rs, step_fn: Callable, cfg: SimConfig):
    return step_fn(rs, cfg)


@partial(jax.jit, static_argnums=(2,))
def _res_materialize_jit(rs, proto, dyn_names):
    from . import resident
    return resident.to_fluid(rs, proto, dyn_names)


@partial(jax.jit, static_argnums=(1,), donate_argnums=0)
def _res_rebuild_jit(rs, cfg: SimConfig):
    from . import resident
    return resident.rebuild(cfg, rs)


@partial(jax.jit, static_argnums=(1, 2, 3), donate_argnums=0)
def _rollout_jit(state: FluidState, step_fn: Callable, cfg: SimConfig,
                 n_steps: int) -> FluidState:
    def body(s, _):
        return step_fn(s, cfg), None

    state, _ = jax.lax.scan(body, state, None, length=n_steps)
    return state


class Simulation:
    """Owns (config, solver, on-device state) for an interactive run."""

    def __init__(self, scene: Scene, cfg: SimConfig, solver: str = "dfsph",
                 init_fn=None):
        if cfg.solid_volume_auto and scene.n_solid > 0:
            # boundary volume from the ACTUAL shell sampling (Akinci 2012;
            # boundary.py) — a constant scale that is right for one shell
            # density under-weights a sparser one until liquid drains
            # through the wall
            import dataclasses

            from .boundary import akinci_solid_volume_scale

            # straight off the scene's solid rows — building a throwaway
            # full FluidState here doubled startup allocation at 1M
            # (ADVICE r4)
            pos_solid = jnp.asarray(
                scene.positions[scene.n_liquid:].T, dtype=jnp.float32)
            scale = akinci_solid_volume_scale(pos_solid, cfg)
            cfg = dataclasses.replace(cfg, solid_volume_scale=scale,
                                      solid_volume_auto=False)
        self.cfg = cfg
        self.solver_name = solver
        self._solver = get_solver(solver)
        self._step_fn = self._solver.step
        state = (init_fn or init_state)(scene, cfg)
        if hasattr(self._solver, "prepare"):
            state = self._solver.prepare(state, cfg)
        state = state.replace(dt=jax.numpy.float32(cfg.dt_init))

        # Resident mode (resident.py): the particle system lives in the
        # padded engine layout; per-particle FluidState views materialize
        # lazily on access.  Rebuild cadence + mover-spike fallback are
        # decided ON DEVICE (resident.rebin_auto) — no host logic.
        self._resident = (cfg.resident and cfg.use_pallas
                          and hasattr(self._solver, "step_resident"))
        self._steps_since_rebuild = 0    # host cadence (resident_host_rebuild)
        self._state = state
        self._state_stale = False
        if self._resident:
            self._dyn_names = self._solver.RESIDENT_FIELDS
            self._rs = _res_init_jit(state, cfg, self._dyn_names)

        # AOT executable cache (utils/aot.py, VERDICT r2 #7): with
        # cfg.aot_dir set, the step executable is serialized keyed on
        # (config, shapes, backend); a production restart deserializes in
        # seconds instead of re-trace/lower/compile minutes.
        self._aot_step = None
        if cfg.aot_dir:
            from .utils import aot
            if self._resident:
                step_res = self._solver.step_resident
                self._aot_step = aot.compile_or_load(
                    lambda rs: step_res(rs, cfg), (self._rs,), cfg.aot_dir,
                    fn_tag=f"{solver}.step_resident", extra=(cfg,),
                    donate_argnums=(0,), verbose=True)
            else:
                step_fn = self._step_fn
                self._aot_step = aot.compile_or_load(
                    lambda s: step_fn(s, cfg), (state,), cfg.aot_dir,
                    fn_tag=f"{solver}.step", extra=(cfg,),
                    donate_argnums=(0,), verbose=True)

    @property
    def state(self) -> FluidState:
        if self._resident and self._state_stale:
            self._state = _res_materialize_jit(self._rs, self._state,
                                               self._dyn_names)
            self._state_stale = False
        return self._state

    @state.setter
    def state(self, value: FluidState):
        self._state = value
        self._state_stale = False
        if self._resident:
            self._rs = _res_init_jit(value, self.cfg, self._dyn_names)

    def step(self) -> FluidState:
        if self._resident:
            if self.cfg.resident_host_rebuild:
                # host-cadenced full re-sort: the step program holds only
                # the incremental rebin (no in-program rebuild cond); a
                # mover spike beyond the budget stale-bins its excess for
                # ONE step (rebin_lost > 0), which triggers the rebuild
                # here before the next step
                self._steps_since_rebuild += 1
                lost = (self._steps_since_rebuild
                        >= self.cfg.resident_rebuild_every) or bool(
                    np.asarray(self._rs.grid.rebin_lost) > 0)
                if lost:
                    self._rs = _res_rebuild_jit(self._rs, self.cfg)
                    self._steps_since_rebuild = 0
            if self._aot_step is not None:
                self._rs = self._aot_step(self._rs)
            else:
                self._rs = _res_step_jit(self._rs, self._solver.step_resident,
                                         self.cfg)
            self._state_stale = True
            return None
        if self._aot_step is not None:
            self._state = self._aot_step(self._state)
        else:
            self._state = _step_jit(self._state, self._step_fn, self.cfg)
        return self._state

    def run(self, n_steps: int) -> FluidState:
        if self._resident or self._aot_step is not None:
            for _ in range(n_steps):
                self.step()
            return self.state
        self._state = _rollout_jit(self._state, self._step_fn, self.cfg,
                                   n_steps)
        return self._state

    # ---- host-side views (state is planar (3, n); host API is (n, 3)) ----
    def positions(self) -> np.ndarray:
        return np.asarray(self.state.pos).T

    def liquid_positions(self) -> np.ndarray:
        return np.asarray(self.state.pos[:, : self.state.n_liquid]).T

    def telemetry(self) -> dict:
        # one batched device->host transfer (8 scalar pulls would each pay
        # the full tunnel latency on the remote TPU platform); in resident
        # mode the scalars come straight off the resident state — no
        # materialization of the per-particle arrays
        src = (self._rs if (self._resident and self._state_stale)
               else self._state)
        d = src.diag
        vals = jax.device_get((src.time, src.dt,
                               d.divergence_iters, d.pressure_iters,
                               d.viscosity_iters, d.density_error,
                               d.density_error_pre,
                               d.neighbor_overflow, d.vel_max))
        keys = ("time", "dt", "divergence_iters", "pressure_iters",
                "viscosity_iters", "density_error", "density_error_pre",
                "neighbor_overflow", "vel_max")
        out = dict(zip(keys, (v.item() for v in map(np.asarray, vals))))
        return out

    def grid_stats(self) -> dict:
        """Neighbor-structure diagnostics (reference get_max_neighbour /
        max-cell-occupancy prints, HashGrid.py:127-152)."""
        from . import dense_ops
        from .grid import build_grid

        @jax.jit
        def go(pos):
            grid = build_grid(pos, self.state.n_liquid, self.cfg)
            cnt = dense_ops.density_stats(grid, self.cfg, False).count
            occ = jnp.sum(grid.valid, axis=0)
            liq_cnt = jnp.where(grid.liquid, cnt, 0)
            return (jnp.max(liq_cnt), jnp.max(occ),
                    jnp.sum(occ > 0), grid.overflow)

        max_nbr, max_occ, nonempty, ovf = map(
            lambda x: int(np.asarray(x)), go(self.state.pos))
        return {
            "max_neighbors": max_nbr,
            "max_cell_occupancy": max_occ,
            "cell_capacity": self.cfg.cell_capacity,
            "nonempty_cells": nonempty,
            "num_cells": self.cfg.num_cells,
            "overflow": ovf,
        }

    def check_health(self) -> None:
        """NaN watchdog (reference dfsph.py:645-647) — raises on divergence."""
        if bool(has_nan(self.state)):
            raise FloatingPointError(
                f"NaN detected at t={float(self.state.time):.4f} "
                f"(telemetry: {self.telemetry()})")
