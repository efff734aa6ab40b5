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
