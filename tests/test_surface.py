"""Surface reconstruction tests: derived MC table validity, watertightness
(exhaustive face-consistency via randomized fields), geometric sanity of the
extracted surfaces, anisotropic estimator behavior."""

import numpy as np
import pytest

from wcsph_tpu.surface import tables
from wcsph_tpu.surface.mc import marching_cubes, weld_vertices


def test_table_structure():
    assert tables.TRI_TABLE.shape == (256, tables.TABLE_WIDTH)
    assert (tables.TRI_TABLE[0] == -1).all()
    assert (tables.TRI_TABLE[255] == -1).all()
    for c in range(256):
        row = tables.TRI_TABLE[c]
        flat = row[row >= 0]
        assert flat.size % 3 == 0
        # every referenced edge id (< 12) must actually be cut
        for e in flat[flat < 12]:
            a, b = tables.EDGES[e]
            assert ((c >> a) & 1) != ((c >> b) & 1)
        # every cut edge must be referenced by at least one triangle
        cut = {e for e, (a, b) in enumerate(tables.EDGES)
               if ((c >> a) & 1) != ((c >> b) & 1)}
        assert cut == set(flat[flat < 12].tolist()) or not cut
        # centroid ids must have weights
        for cid in set(flat[flat >= 12].tolist()):
            assert tables.CENTROID_TABLE[c, cid - 12].sum() > 0.99


def _check_watertight(verts, tris):
    """Every edge of the welded mesh must be used exactly twice."""
    v, t = weld_vertices(verts, tris)
    if t.size == 0:
        return
    edges = np.concatenate([t[:, [0, 1]], t[:, [1, 2]], t[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all(), np.unique(counts)


def test_sphere_watertight_and_round():
    n = 24
    ax = np.linspace(-1.2, 1.2, n)
    g = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), -1)
    r = np.linalg.norm(g, axis=-1)
    fld = 1.5 - r  # isolevel 0.5 -> sphere of radius 1.0
    verts, tris = marching_cubes(fld, origin=(-1.2, -1.2, -1.2),
                                 spacing=2.4 / (n - 1), isolevel=0.5)
    assert tris.shape[0] > 100
    _check_watertight(verts, tris)
    rad = np.linalg.norm(verts, axis=1)
    np.testing.assert_allclose(rad.mean(), 1.0, atol=0.05)
    assert rad.std() < 0.05


def test_random_fields_watertight_and_cover_configs():
    """Random smooth fields exercise a large share of the 256 configs and
    must always produce watertight meshes (the adjacent-cube consistency of
    the derived table)."""
    rng = np.random.default_rng(0)
    seen = set()
    for trial in range(6):
        base = rng.normal(size=(7, 7, 7))
        # upsample by repetition + noise to get structured + rough fields
        fld = np.kron(base, np.ones((2, 2, 2))) + 0.3 * rng.normal(size=(14, 14, 14))
        # clamp the domain boundary outside so surfaces never hit the border
        fld[[0, -1], :, :] = 2.0
        fld[:, [0, -1], :] = 2.0
        fld[:, :, [0, -1]] = 2.0
        verts, tris = marching_cubes(fld, (0, 0, 0), 1.0, isolevel=0.5)
        _check_watertight(verts, tris)
        # track visited configs
        inside = fld < 0.5
        cfgs = np.zeros((13, 13, 13), np.int32)
        for v, (cx, cy, cz) in enumerate(tables.CORNERS):
            cfgs |= inside[cx:13 + cx, cy:13 + cy, cz:13 + cz].astype(np.int32) << v
        seen.update(np.unique(cfgs).tolist())
    assert len(seen) > 150, f"only {len(seen)} configs exercised"


def test_fluid_block_surface():
    import jax

    from wcsph_tpu import scene
    from wcsph_tpu.config import SimConfig
    from wcsph_tpu.state import init_state
    from wcsph_tpu.surface.reconstruction import reconstruct

    R = 0.025
    b = scene.SceneBuilder()
    b.add_liquid_block((8, 8, 8), 2 * R, (0, 0, 0))
    sc = b.build()
    lo, hi = sc.domain(pad=6 * R)
    cfg = SimConfig(particle_radius=R, domain_min=lo, domain_max=hi)
    state = init_state(sc, cfg)
    verts, tris = reconstruct(state, cfg)
    assert tris.shape[0] > 50
    # mesh must hug the block (block spans [0, 0.35]^3)
    assert verts.min() > -0.1 and verts.max() < 0.45
    _check_watertight(verts, tris)

    # anisotropic variant also produces a sane surface
    verts_a, tris_a = reconstruct(state, cfg, anisotropic=True)
    assert tris_a.shape[0] > 50
    assert verts_a.min() > -0.12 and verts_a.max() < 0.47


def test_device_mc_matches_host():
    """marching_cubes_device is an exact twin of the host extractor: same
    triangle ORDER (row-major cube order, then table slot order), same
    vertices to f32 roundoff, on random rough fields and the sphere."""
    import jax.numpy as jnp

    from wcsph_tpu.surface.mc import marching_cubes_device

    rng = np.random.default_rng(3)
    fields = []
    n = 20
    ax = np.linspace(-1.2, 1.2, n)
    g = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), -1)
    fields.append((1.5 - np.linalg.norm(g, axis=-1)).astype(np.float32))
    for _ in range(3):
        base = rng.normal(size=(6, 6, 6))
        fld = (np.kron(base, np.ones((2, 2, 2)))
               + 0.3 * rng.normal(size=(12, 12, 12))).astype(np.float32)
        fields.append(fld)

    for fld in fields:
        hv, ht = marching_cubes(fld, (0.5, -1.0, 2.0), 0.1, isolevel=0.5)
        dv, n_tris, n_drop = marching_cubes_device(
            jnp.asarray(fld), (0.5, -1.0, 2.0), 0.1, isolevel=0.5,
            max_active=4096, max_vertices=30000)
        n_tris = int(n_tris)
        assert int(n_drop) == 0
        assert n_tris == ht.shape[0]
        np.testing.assert_allclose(np.asarray(dv[: 3 * n_tris]),
                                   hv, rtol=1e-5, atol=1e-5)
        # the tail of the fixed buffer is zeroed
        assert not np.asarray(dv[3 * n_tris:]).any()


def test_device_mc_budgets():
    """Budget overflow drops triangles deterministically and reports it."""
    import jax.numpy as jnp

    from wcsph_tpu.surface.mc import marching_cubes_device

    n = 16
    ax = np.linspace(-1.2, 1.2, n)
    g = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), -1)
    fld = (1.5 - np.linalg.norm(g, axis=-1)).astype(np.float32)
    hv, ht = marching_cubes(fld, (0, 0, 0), 1.0)
    full = ht.shape[0]
    dv, n_tris, n_drop = marching_cubes_device(
        jnp.asarray(fld), (0, 0, 0), 1.0, max_active=4096,
        max_vertices=3 * (full // 2))
    assert int(n_tris) == full // 2
    assert int(n_drop) == full - full // 2
    # the kept prefix matches the host's first triangles
    np.testing.assert_allclose(np.asarray(dv), hv[: 3 * (full // 2)],
                               rtol=1e-5, atol=1e-5)


def test_reconstruct_on_device_matches_host():
    import jax

    from wcsph_tpu import scene
    from wcsph_tpu.config import SimConfig
    from wcsph_tpu.state import init_state
    from wcsph_tpu.surface.reconstruction import reconstruct

    R = 0.025
    b = scene.SceneBuilder()
    b.add_liquid_block((8, 8, 8), 2 * R, (0, 0, 0))
    sc = b.build()
    lo, hi = sc.domain(pad=6 * R)
    cfg = SimConfig(particle_radius=R, domain_min=lo, domain_max=hi)
    state = init_state(sc, cfg)
    hv, ht = reconstruct(state, cfg)
    dv, dt_ = reconstruct(state, cfg, on_device=True)
    assert dt_.shape == ht.shape
    np.testing.assert_allclose(dv, hv, rtol=1e-5, atol=1e-5)
    _check_watertight(dv, dt_)
