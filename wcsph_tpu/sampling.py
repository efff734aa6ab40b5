"""Parallel Poisson-disk surface sampling of triangle meshes.

Offline boundary-generation tool (reference boundry.py): a mesh is densely
sampled with area-weighted random surface points, then thinned so no two kept
samples are closer than the particle radius under a geodesic-corrected
distance (boundry.py:342-374), producing the ``*_boundry.obj`` shells that
iisph/dfsph load as boundary particles.

TPU redesign of the reference pipeline (boundry.py:409-460):
  * area-weighted triangle choice via inverse-CDF searchsorted on the
    cumulative areas (replaces the per-point rejection loop, boundry.py:230);
  * binning by sort+rank into a dense (S, NCELL) table (replaces the GPU
    bitonic sort + open-addressed hash map, boundry.py:210-272);
  * the same 27-color phase groups (3x3x3 cell parity, boundry.py:265-271):
    cells of equal color are >= 3 cells (> r) apart, so all candidates of a
    phase can be tested and accepted in one data-parallel step with no
    conflicts; neighbor occupancy is read through 5^3 STATIC cell shifts
    (no gathers), mirroring the check window at boundry.py:376-386;
  * trials x phases run as a host-side Python loop over jitted phase steps
    (27 * trials steps, offline-rate like the reference's one phase per
    rendered frame).

Cells have size r / sqrt(3) (boundry.py:21) so any two points in one cell
conflict under plain Euclidean distance; the geodesic correction can stretch
distances past r, so up to ``cell_cap_accept`` samples may be kept per cell
(the reference caps at hash_sample_size = 5, boundry.py:58).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_OFF5 = np.stack(np.meshgrid(*([np.arange(-2, 3)] * 3), indexing="ij"),
                 -1).reshape(-1, 3).astype(np.int32)


class _Problem(NamedTuple):
    radius: float
    grid_res: Tuple[int, int, int]
    origin: Tuple[float, float, float]
    cell: float
    sample_cap: int
    accept_cap: int


def _surface_samples(verts: np.ndarray, faces: np.ndarray, radius: float,
                     density: float, seed: int):
    """Dense initial point set: 40 * area / (pi r^2) barycentric samples
    (boundry.py:223-246) with per-sample face normals."""
    a = verts[faces[:, 0]]
    b = verts[faces[:, 1]]
    c = verts[faces[:, 2]]
    cross = np.cross(b - a, c - a)
    area2 = np.linalg.norm(cross, axis=1)
    areas = 0.5 * area2
    normals = cross / np.maximum(area2, 1e-12)[:, None]
    total = float(areas.sum())
    n = int(density * total / (math.pi * radius * radius))
    rng = np.random.default_rng(seed)
    # inverse-CDF area-weighted face choice; float rounding can leave
    # cdf[-1] slightly below 1.0, in which case searchsorted returns an
    # out-of-range index for draws above it — clamp to the last face
    cdf = np.cumsum(areas) / total
    fi = np.minimum(np.searchsorted(cdf, rng.random(n)), len(areas) - 1)
    r1 = np.sqrt(rng.random(n))
    r2 = rng.random(n)
    bc1 = 1.0 - r1
    bc2 = r2 * r1
    bc3 = 1.0 - bc1 - bc2
    pts = (bc1[:, None] * a[fi] + bc2[:, None] * b[fi] + bc3[:, None] * c[fi])
    return pts.astype(np.float32), normals[fi].astype(np.float32), fi.astype(np.int32)


def _bin_dense(pts, normals, fids, prob: _Problem):
    """Sort samples by cell, place at (rank, cell) in dense tables."""
    gx, gy, gz = prob.grid_res
    nc = gx * gy * gz
    cap = prob.sample_cap
    org = jnp.asarray(prob.origin, jnp.float32)
    coords = jnp.floor((pts - org[None]) / prob.cell).astype(jnp.int32)
    coords = jnp.clip(coords, 0, jnp.asarray([gx - 1, gy - 1, gz - 1]))
    cell = (coords[:, 0] * gy + coords[:, 1]) * gz + coords[:, 2]
    order = jnp.argsort(cell)
    sc = cell[order]
    starts = jnp.searchsorted(sc, jnp.arange(nc, dtype=sc.dtype))
    rank = jnp.arange(pts.shape[0], dtype=jnp.int32) - starts[sc].astype(jnp.int32)

    def table(src, fill, dtype):
        t = jnp.full((cap, nc) if src.ndim == 1 else (src.shape[1], cap, nc),
                     fill, dtype)
        vals = src[order]
        if src.ndim == 1:
            return t.at[rank, sc].set(vals, mode="drop")
        return t.at[:, rank, sc].set(vals.T, mode="drop")

    tp = table(jnp.asarray(pts), 1e9, jnp.float32)        # (3, S, NC)
    tn = table(jnp.asarray(normals), 0.0, jnp.float32)    # (3, S, NC)
    tf = table(jnp.asarray(fids), -1, jnp.int32)          # (S, NC)
    return tp, tn, tf


def _shift(a, o: int, fill):
    if o == 0:
        return a
    pad = jnp.full(a.shape[:-1] + (abs(o),), fill, a.dtype)
    if o > 0:
        return jnp.concatenate([a[..., o:], pad], axis=-1)
    return jnp.concatenate([pad, a[..., :o]], axis=-1)


@partial(jax.jit, static_argnums=(0,))
def _phase_step(prob: _Problem, phase, trial, z0,
                tp, tn, tf, acc_p, acc_n, acc_f, acc_cnt):
    """Try the trial-th binned sample of every phase-colored cell.
    ``phase`` and ``trial`` are traced scalars: all 27 * trials steps share
    ONE compiled program.  ``z0`` is the chunk's global z-cell origin so
    phase colors stay globally consistent under z-chunking."""
    gx, gy, gz = prob.grid_res
    nc = gx * gy * gz
    a_cap = prob.accept_cap
    r = prob.radius

    idx = jax.lax.broadcasted_iota(jnp.int32, (1, nc), 1)[0]
    cx = idx // (gy * gz)
    cy = (idx // gz) % gy
    cz = idx % gz
    in_phase = ((cx % 3) + 3 * (cy % 3) + 9 * ((cz + z0) % 3)) == phase

    cand_p = jax.lax.dynamic_index_in_dim(tp, trial, 1, keepdims=False)
    cand_n = jax.lax.dynamic_index_in_dim(tn, trial, 1, keepdims=False)
    cand_f = jax.lax.dynamic_index_in_dim(tf, trial, 0, keepdims=False)
    has = cand_f >= 0

    conflict = jnp.zeros((nc,), bool)
    for dx, dy, dz in _OFF5:
        o = (dx * gy + dy) * gz + dz
        inbox = ((cx + dx >= 0) & (cx + dx < gx) & (cy + dy >= 0)
                 & (cy + dy < gy) & (cz + dz >= 0) & (cz + dz < gz))
        np_ = _shift(acc_p, o, 1e9)            # (3, A, NC)
        nn = _shift(acc_n, o, 0.0)
        nf = _shift(acc_f, o, -1)
        d = cand_p[:, None, :] - np_           # (3, A, NC)
        dist = jnp.sqrt(jnp.maximum(jnp.sum(d * d, axis=0), 1e-18))
        v = d / dist[None]
        c1 = jnp.sum(cand_n[:, None, :] * v, axis=0)
        c2 = jnp.sum(nn * v, axis=0)
        c1 = jnp.clip(c1, -1.0, 1.0)
        c2 = jnp.clip(c2, -1.0, 1.0)
        same_face = nf == cand_f[None, :]
        # geodesic correction (boundry.py:342-374)
        diff = jnp.abs(c1 - c2) > 1e-5
        corr = jnp.where(
            diff,
            (jnp.arcsin(c1) - jnp.arcsin(c2)) / jnp.where(diff, c1 - c2, 1.0),
            1.0 / jnp.sqrt(jnp.maximum(1.0 - c1 * c1, 1e-6)))
        gdist = jnp.where(same_face, dist, dist * corr)
        hit = (nf >= 0) & (gdist < r) & inbox[None, :]
        conflict = conflict | jnp.any(hit, axis=0)

    accept = in_phase & has & ~conflict & (acc_cnt < a_cap)
    slot = jnp.minimum(acc_cnt, a_cap - 1)
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (a_cap, nc), 0)
              == slot[None, :]) & accept[None, :]
    acc_p = jnp.where(onehot[None], cand_p[:, None, :], acc_p)
    acc_n = jnp.where(onehot[None], cand_n[:, None, :], acc_n)
    acc_f = jnp.where(onehot, cand_f[None, :], acc_f)
    acc_cnt = acc_cnt + accept.astype(jnp.int32)
    return acc_p, acc_n, acc_f, acc_cnt


def _run_chunk(prob: _Problem, z0: int, pts, normals, fids,
               seed_p, seed_n, seed_f, trials: int):
    """One dense-grid region: bin the region's candidate samples, seed the
    low-z halo with already-accepted occupants from earlier chunks, run the
    27-phase trial loop, return kept (pos, normal, fid) of OWN cells."""
    accept_cap = prob.accept_cap
    nc = prob.grid_res[0] * prob.grid_res[1] * prob.grid_res[2]
    tp, tn, tf = _bin_dense(pts, normals, fids, prob)
    acc_p = jnp.full((3, accept_cap, nc), 1e9, jnp.float32)
    acc_n = jnp.zeros((3, accept_cap, nc), jnp.float32)
    acc_f = jnp.full((accept_cap, nc), -1, jnp.int32)
    acc_cnt = jnp.zeros((nc,), jnp.int32)
    if seed_p is not None and seed_p.shape[0]:
        # earlier-chunk occupants land in the halo planes as fixed accepted
        # points: candidates there (none — tp holds own samples only) can't
        # be accepted, but conflict checks see them through the 5^3 window
        sp, sn, sf = _bin_dense(seed_p, seed_n, seed_f,
                                prob._replace(sample_cap=accept_cap))
        seeded = sf >= 0
        acc_p = jnp.where(seeded[None], sp, acc_p)
        acc_n = jnp.where(seeded[None], sn, acc_n)
        acc_f = jnp.where(seeded, sf, acc_f)
        acc_cnt = jnp.sum(seeded.astype(jnp.int32), axis=0)

    n_trials = min(trials, prob.sample_cap)
    # _phase_step never reads prob.origin (positions are absolute; phase
    # colors ride the dynamic z0) — strip it from the STATIC jit key, or
    # every z-chunk recompiles the identical program (~5 min/chunk on the
    # TPU: the round-5 showcase run spent an hour in exactly that)
    prob_key = prob._replace(origin=(0.0, 0.0, 0.0))
    for trial in range(n_trials):
        for phase in range(27):
            acc_p, acc_n, acc_f, acc_cnt = _phase_step(
                prob_key, jnp.int32(phase), jnp.int32(trial), jnp.int32(z0),
                tp, tn, tf, acc_p, acc_n, acc_f, acc_cnt)
    return np.asarray(acc_p), np.asarray(acc_n), np.asarray(acc_f)


def poisson_disk_sample(verts: np.ndarray, faces: np.ndarray, radius: float,
                        trials: int = 10, density: float = 40.0,
                        seed: int = 0, sample_cap: int = 24,
                        accept_cap: int = 4,
                        max_cells: int = 3_000_000) -> np.ndarray:
    """Sample a triangle mesh surface with minimum spacing ``radius``.

    Returns kept sample positions (M, 3) float32 — the boundary particle
    shell (reference output boundry.py:445-453).

    Large meshes (artist shells at small radius) are processed in
    sequential z-slab chunks of at most ``max_cells`` dense cells: each
    chunk's low-z halo is seeded with the previous chunks' accepted points
    (fixed occupants for the conflict window), so the minimum-spacing
    guarantee holds across chunk boundaries while the dense tables — the
    sampler's memory footprint, (3, sample_cap, NC) — stay bounded.  A
    one-chunk run is byte-identical to the unchunked algorithm.
    """
    verts = np.asarray(verts, np.float32)
    faces = np.asarray(faces, np.int32)
    pts, normals, fids = _surface_samples(verts, faces, radius, density, seed)

    cell = radius / math.sqrt(3.0)
    lo = verts.min(axis=0) - 2 * cell
    hi = verts.max(axis=0) + 2 * cell
    res = tuple(int((hi[i] - lo[i]) / cell) + 1 for i in range(3))
    gx, gy, gz = res

    nz_own = max(1, max_cells // max(gx * gy, 1) - 4)
    if gz <= nz_own + 4:
        prob = _Problem(radius=radius, grid_res=res,
                        origin=tuple(map(float, lo)), cell=cell,
                        sample_cap=sample_cap, accept_cap=accept_cap)
        acc_p, _, acc_f = _run_chunk(prob, 0, pts, normals, fids,
                                     None, None, None, trials)
        kept = acc_f.reshape(-1) >= 0
        out = acc_p.reshape(3, -1)[:, kept].T
        return np.ascontiguousarray(out, np.float32)

    # ---- z-chunked path: every chunk shares ONE static sub-grid shape ----
    gz_ext = nz_own + 4                       # 2 halo planes each side
    sub_res = (gx, gy, gz_ext)
    cz_all = np.clip(np.floor((pts[:, 2] - lo[2]) / cell).astype(np.int64),
                     0, gz - 1)
    kept_parts = []
    carry_p = np.zeros((0, 3), np.float32)    # accepted, for halo seeding
    carry_n = np.zeros((0, 3), np.float32)
    carry_f = np.zeros((0,), np.int32)
    carry_cz = np.zeros((0,), np.int64)
    import sys as _sys
    import time as _time
    _t0 = _time.time()
    for za in range(0, gz, nz_own):
        zb = min(za + nz_own, gz)
        print(f"[sampler] chunk z[{za}:{zb}) of {gz} "
              f"({_time.time() - _t0:.0f}s)", file=_sys.stderr, flush=True)
        z_org = za - 2                        # local grid origin (global z)
        origin = (float(lo[0]), float(lo[1]), float(lo[2] + z_org * cell))
        prob = _Problem(radius=radius, grid_res=sub_res, origin=origin,
                        cell=cell, sample_cap=sample_cap,
                        accept_cap=accept_cap)
        own = (cz_all >= za) & (cz_all < zb)
        halo = (carry_cz >= za - 2) & (carry_cz < za)
        acc_p, acc_n, acc_f = _run_chunk(
            prob, z_org, pts[own], normals[own], fids[own],
            carry_p[halo], carry_n[halo], carry_f[halo], trials)
        # keep OWN cells only (local z in [2, 2 + (zb - za))); z is the
        # minor axis of the flat cell index
        flat_cz = np.arange(gx * gy * gz_ext) % gz_ext
        k = (acc_f.reshape(accept_cap, -1) >= 0) \
            & (flat_cz >= 2)[None] & (flat_cz < 2 + (zb - za))[None]
        new_p = acc_p.reshape(3, accept_cap, -1).transpose(1, 2, 0)[k]
        new_n = acc_n.reshape(3, accept_cap, -1).transpose(1, 2, 0)[k]
        new_f = acc_f.reshape(accept_cap, -1)[k]
        kept_parts.append(new_p)
        new_cz = np.clip(np.floor((new_p[:, 2] - lo[2]) / cell), 0,
                         gz - 1).astype(np.int64)
        carry_p = np.concatenate([carry_p, new_p])
        carry_n = np.concatenate([carry_n, new_n])
        carry_f = np.concatenate([carry_f, new_f])
        carry_cz = np.concatenate([carry_cz, new_cz])
    out = np.concatenate(kept_parts, axis=0)
    return np.ascontiguousarray(out, np.float32)


def sample_obj(path_in: str, path_out: str, radius: float = 0.025,
               **kw) -> np.ndarray:
    """boundry.py CLI equivalent: OBJ in -> `<name>_boundry.obj` out."""
    from .utils import objio

    verts, faces = objio.load_obj(path_in)
    pts = poisson_disk_sample(verts, faces, radius, **kw)
    objio.save_point_cloud(path_out, pts)
    return pts
