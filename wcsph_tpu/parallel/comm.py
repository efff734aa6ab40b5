"""Communicator abstraction: the same solver code runs single-device or
slab-sharded.

Solvers call ops through a comm object:
  * ``comm.grid`` / ``comm.cfg`` — the grid the window ops run on (the global
    grid single-device; the halo-extended local slab under shard_map);
  * ``comm.lift(q)`` — make a packed quantity visible to the window ops
    (identity / one-plane ppermute halo exchange);
  * ``comm.lower(q)`` — back to owned cells (identity / drop halo columns);
  * ``comm.lsum/lmax`` — reductions over owned liquid slots (plain / psum).

Mirror (Newton) contributions that cross a slab boundary are not lost: the
neighbor device recomputes them through its halo-home rows, so the symmetric
window ops (dense_ops.scan_sym) stay exact under decomposition — verified in
tests/test_parallel.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

AXIS = "x"


class NoComm:
    """Single-device: ops see the global grid directly.

    ``engine`` (optional) is a pallas SweepEngine; when set, solvers route
    their hot window sweeps through it instead of the XLA dense_ops path.
    Slab-sharded runs wrap their local engine in a SlabEngine adapter (see
    below) so the same solver code drives it through SlabComm."""

    def __init__(self, grid, cfg, engine=None):
        self.grid = grid
        self.cfg = cfg
        self.engine = engine
        self._liq = grid.liquid

    def lift(self, q, fill=0.0):
        return q

    def lower(self, q):
        return q

    def lsum(self, x):
        return jnp.sum(jnp.where(self._liq, x, 0.0))

    def lmax(self, x):
        return jnp.max(jnp.where(self._liq, x, -jnp.inf))

    def n_liquid(self):
        return jnp.sum(self._liq).astype(jnp.float32)


class PaddedNoComm(NoComm):
    """Single-device comm over the PADDED engine layout (pallas/engine.py
    PaddedEngine): ``_liq`` is the padded mask, so the comm-parameterized
    solver middles run bit-identical elementwise math on (…, NX, C, PP)
    arrays and every reduction masks the margins away.  lift/lower stay
    identity — the engine ops already consume/produce padded fields."""

    def __init__(self, grid, cfg, engine):
        super().__init__(grid, cfg, engine=engine)
        self._liq = engine.liq_mask


def exchange_halo(arr: jnp.ndarray, plane: int, fill, axis: str = AXIS):
    """Append one x-plane of halo (gy*gz cells) from each ring neighbor over
    the mesh axis.  arr: (..., NC_local) -> (..., NC_local + 2*plane)."""
    n = jax.lax.axis_size(axis)
    idx = jax.lax.axis_index(axis)
    right = [(i, (i + 1) % n) for i in range(n)]
    left = [(i, (i - 1) % n) for i in range(n)]
    left_halo = jax.lax.ppermute(arr[..., -plane:], axis, right)
    right_halo = jax.lax.ppermute(arr[..., :plane], axis, left)
    blank = jnp.full(arr.shape[:-1] + (plane,), fill, arr.dtype)
    left_halo = jnp.where(idx == 0, blank, left_halo)
    right_halo = jnp.where(idx == n - 1, blank, right_halo)
    return jnp.concatenate([left_halo, arr, right_halo], axis=-1)


class SlabComm:
    """Inside shard_map over x-slabs: ops run on the halo-extended slab.

    ``engine``, when set, is a SlabEngine adapter that runs the Mosaic sweep
    engine on the halo-extended local grid — each sweep lifts its dynamic
    inputs (one-plane ppermute), runs the pallas kernel locally, and lowers
    the owned planes back.  Air planes cost almost nothing in the engine
    (occupancy-bitmask skipping), so equal-extent slabs stay load-balanced
    unless the fluid clusters pathologically along x."""

    def __init__(self, slab_grid, ext_grid, ext_cfg, plane: int,
                 axis: str = AXIS, engine=None):
        self.grid = ext_grid
        self.cfg = ext_cfg
        self.engine = None
        self._liq = slab_grid.liquid
        self._plane = plane
        self._axis = axis
        if engine is not None:
            self.engine = SlabEngine(self, engine)

    def lift(self, q, fill=0.0):
        return exchange_halo(q, self._plane, fill, self._axis)

    def lower(self, q):
        return q[..., self._plane:-self._plane]

    def lsum(self, x):
        return jax.lax.psum(jnp.sum(jnp.where(self._liq, x, 0.0)), self._axis)

    def lmax(self, x):
        return jax.lax.pmax(
            jnp.max(jnp.where(self._liq, x, -jnp.inf)), self._axis)

    def n_liquid(self):
        return jax.lax.psum(jnp.sum(self._liq), self._axis).astype(jnp.float32)


class SlabEngine:
    """Adapter exposing the Mosaic SweepEngine API over a slab communicator.

    The wrapped engine was built for the HALO-EXTENDED local grid; every
    method lifts its dynamic packed inputs (identity on the static grid
    fields, which the engine padded at construction), runs the sweep, and
    lowers the owned planes.  Halo-plane outputs are edge-incomplete and
    dropped by lower(), exactly like the XLA dense path — so the
    comm-parameterized solvers (solvers/*.py) work unchanged."""

    def __init__(self, comm: "SlabComm", ext_engine):
        self._c = comm
        self._e = ext_engine

    @property
    def xp_owned(self):
        return self._c.lower(self._e.grid.xp)

    def density_alpha(self, with_alpha: bool = True, velp=None):
        c = self._c
        if velp is not None:
            r, a, n, d = self._e.density_alpha(with_alpha, c.lift(velp))
            return c.lower(r), c.lower(a), c.lower(n), c.lower(d)
        r, a, n = self._e.density_alpha(with_alpha)
        return c.lower(r), c.lower(a), c.lower(n)

    def kappa_velocity_update(self, velp, kp, dt):
        c = self._c
        return c.lower(self._e.kappa_velocity_update(
            c.lift(velp), c.lift(kp), dt))

    def drho_divergence(self, velp, countp):
        c = self._c
        return c.lower(self._e.drho_divergence(c.lift(velp),
                                               c.lift(countp, 0)))

    def advected_density(self, velp, rhop, dt):
        c = self._c
        return c.lower(self._e.advected_density(c.lift(velp),
                                                c.lift(rhop, 1.0), dt))

    def sesph_force(self, velp, rhop, pp):
        c = self._c
        return c.lower(self._e.sesph_force(c.lift(velp), c.lift(rhop, 1.0),
                                           c.lift(pp)))

    def pcisph_predict(self, xstarp, pp):
        c = self._c
        adv, acc = self._e.pcisph_predict(c.lift(xstarp, 1e9), c.lift(pp))
        return c.lower(adv), c.lower(acc)

    def iisph_adv(self, velp):
        c = self._c
        dii, adv, dji = self._e.iisph_adv(c.lift(velp))
        return c.lower(dii), c.lower(adv), c.lower(dji)

    def iisph_aii(self, dii):
        c = self._c
        return c.lower(self._e.iisph_aii(c.lift(dii)))

    def iisph_dij(self, fac):
        c = self._c
        return c.lower(self._e.iisph_dij(c.lift(fac)))

    def iisph_s(self, dii, dij, p_liq, g):
        c = self._c
        return c.lower(self._e.iisph_s(c.lift(dii), c.lift(dij),
                                       c.lift(p_liq), c.lift(g)))

    def iisph_force(self, dpi):
        c = self._c
        return c.lower(self._e.iisph_force(c.lift(dpi)))

    def surface_normals(self, rhop):
        c = self._c
        return c.lower(self._e.surface_normals(c.lift(rhop, 1.0)))

    def tension_accel(self, rhop, normalp):
        c = self._c
        return c.lower(self._e.tension_accel(c.lift(rhop, 1.0),
                                             c.lift(normalp)))

    def visc_matvec(self, xv, rhop, dt):
        c = self._c
        return c.lower(self._e.visc_matvec(c.lift(xv), c.lift(rhop, 1.0),
                                           dt))

    def visc_init(self, x0, rhop, dt):
        c = self._c
        minv, ax0 = self._e.visc_init(c.lift(x0), c.lift(rhop, 1.0), dt)
        return type(minv)(*[c.lower(m) for m in minv]), c.lower(ax0)

    def vorticity(self, velp, omegap, rhop, countp, dt):
        c = self._c
        dv, om = self._e.vorticity(c.lift(velp), c.lift(omegap),
                                   c.lift(rhop, 1.0), c.lift(countp, 0), dt)
        return c.lower(dv), c.lower(om)
