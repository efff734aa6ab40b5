"""Non-box scene end-to-end (the reference's mesh-boundary pipeline:
boundry.py sampling -> *_boundry.obj shell -> dfsph.py:80 add_obj ->
DFSPH with tension -> MCGrid anisotropic export).

Small CPU version of examples/run_mesh_scene.py: a procedural icosphere is
Poisson-disk sampled into a boundary shell, a fluid block falls inside it
under DFSPH with surface tension enabled, and an anisotropic marching-cubes
surface is extracted — asserting stability, bounded density error, fluid
containment and watertightness of the exported mesh.
"""

import numpy as np
import pytest

from wcsph_tpu.sampling import poisson_disk_sample
from wcsph_tpu.scene import SceneBuilder
from wcsph_tpu.simulation import Simulation, default_config
from wcsph_tpu.surface.reconstruction import reconstruct
from wcsph_tpu.utils import meshgen

from test_surface import _check_watertight

R = 0.025


@pytest.fixture(scope="module")
def mesh_sim():
    verts, faces = meshgen.icosphere(subdivisions=3, radius=0.35)
    shell = poisson_disk_sample(verts, faces, radius=R)
    assert shell.shape[0] > 300, "sphere shell unexpectedly sparse"

    spacing = 2 * R
    b = SceneBuilder()
    b.add_liquid_block((6, 6, 6), spacing,
                       (-3 * spacing + R, -0.1, -3 * spacing + R))
    for p in shell:
        b.add_solid_point(p)
    sc = b.build()

    lo, hi = sc.domain(pad=6 * R)
    cfg = default_config("dfsph", particle_radius=R, domain_min=lo,
                         domain_max=hi, tension_coff=0.5)
    sim = Simulation(sc, cfg, solver="dfsph")
    sim.run(15)
    return sim, cfg


def test_mesh_scene_stable(mesh_sim):
    sim, cfg = mesh_sim
    sim.check_health()                      # raises on NaN
    tel = sim.telemetry()
    assert tel["density_error"] < 5 * cfg.dfsph_tol
    assert tel["vel_max"] < 10.0
    assert tel["neighbor_overflow"] == 0


def test_mesh_scene_contained(mesh_sim):
    """The shell must actually act as a boundary: all fluid stays inside
    the sampled sphere (radius 0.35 + a couple of particle radii)."""
    sim, _ = mesh_sim
    liq = np.asarray(sim.state.pos[:, : sim.state.n_liquid])
    dist = np.linalg.norm(liq, axis=0)
    assert float(dist.max()) < 0.35 + 3 * R


def test_mesh_scene_aniso_surface(mesh_sim):
    sim, cfg = mesh_sim
    verts, tris = reconstruct(sim.state, cfg, anisotropic=True)
    assert tris.shape[0] > 50, "anisotropic MC produced no surface"
    _check_watertight(verts, tris)
    # surface must enclose the fluid region (inside the boundary sphere)
    assert float(np.linalg.norm(verts, axis=1).max()) < 0.35 + 4 * R
