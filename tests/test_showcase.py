"""Small CPU version of examples/run_showcase.py: the concave multi-chamber
weir vessel (utils/meshgen.weir_tank — open tank + internal weir wall +
torus obstacle) sampled into a boundary shell, DFSPH + tension + adhesion
running inside it, anisotropic marching-cubes export.

Mirrors the reference's complex-mesh configs (ParticleData.add_obj shells,
/root/reference/ParticleData.py:130-138; boundry.py sampler pipeline) on
procedural geometry.  Asserts the properties that make the scene a real
showcase: stability, containment by a NON-convex boundary, the internal
wall genuinely blocking flow, and a watertight exported surface.
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
SIZE = (1.3, 0.7, 0.8)
WEIR_X = 0.06
WEIR_H = 0.32


@pytest.fixture(scope="module")
def showcase_sim():
    verts, faces = meshgen.weir_tank(
        size=SIZE, weir_x=WEIR_X, weir_height=WEIR_H, wall_t=0.05,
        torus_kw=dict(major=0.14, minor=0.06, center=(0.38, -0.15, 0.0),
                      axis="x"))
    # CPU-affordable shell: spacing 0.035 still < 2r (no tunneling), 3
    # trials / 6 binned candidates per cell keep the dense tables small —
    # the full-density shell runs on the TPU in examples/run_showcase.py
    shell = poisson_disk_sample(verts, faces, radius=0.035, trials=3,
                                sample_cap=6)
    assert shell.shape[0] > 1200, "vessel shell unexpectedly sparse"

    spacing = 2 * R
    b = SceneBuilder()
    # column filling chamber A (left of the weir)
    b.add_liquid_block((9, 10, 8), spacing,
                       (-SIZE[0] / 2 + 3 * R, -SIZE[1] / 2 + 3 * R,
                        -4 * spacing + R))
    for p in shell:
        b.add_solid_point(p)
    sc = b.build()

    lo, hi = sc.domain(pad=6 * R)
    cfg = default_config(
        "dfsph", particle_radius=R, domain_min=lo, domain_max=hi,
        # boundary shells sample at spacing ~r (twice the liquid density);
        # panel junctions (weir wall meets floor/rim, torus weld) stack
        # multiple surfaces per cell — capacity 16 overflows there
        cell_capacity=32,
        tension_coff=0.5, tension_coff_b=0.25,
        adhesion_center=(WEIR_X, -SIZE[1] / 2 + WEIR_H, 0.0),
        adhesion_radius=0.2)
    sim = Simulation(sc, cfg, solver="dfsph")
    sim.run(25)
    return sim, cfg


def test_showcase_stable(showcase_sim):
    sim, cfg = showcase_sim
    sim.check_health()
    tel = sim.telemetry()
    assert tel["density_error"] < 5 * cfg.dfsph_tol
    assert tel["vel_max"] < 10.0
    assert tel["neighbor_overflow"] == 0


def test_showcase_contained_and_blocked(showcase_sim):
    """The non-convex shell is a real boundary: all fluid stays inside the
    tank, and the INTERNAL weir wall blocks the column — nothing reaches
    chamber B at ground level this early (overflow would take ~1 s)."""
    sim, _ = showcase_sim
    liq = np.asarray(sim.state.pos[:, : sim.state.n_liquid])
    slack = 4 * R
    lo = np.array([-SIZE[0] / 2, -SIZE[1] / 2, -SIZE[2] / 2]) - slack
    hi = np.array([SIZE[0] / 2, SIZE[1], SIZE[2] / 2]) + slack
    assert ((liq >= lo[:, None]) & (liq <= hi[:, None])).all()
    # below the weir crest, chamber B must still be dry
    below_crest = liq[1] < -SIZE[1] / 2 + WEIR_H - 2 * R
    assert not (below_crest & (liq[0] > WEIR_X + 0.05)).any()


def test_showcase_surface(showcase_sim):
    """Isotropic MC here (the anisotropic pipeline at this scale runs on
    the TPU in examples/run_showcase.py --export-surface; its correctness
    is pinned by test_mesh_scene/test_surface — on CPU the aniso
    covariance+eigh compile dominates the whole suite's budget)."""
    sim, cfg = showcase_sim
    verts, tris = reconstruct(sim.state, cfg)
    assert tris.shape[0] > 50, "MC produced no surface"
    _check_watertight(verts, tris)
