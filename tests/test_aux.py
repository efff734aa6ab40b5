"""Auxiliary subsystems: checkpoint/resume round-trip, renderer, color field,
OBJ IO (SURVEY.md §5 — all absent in the reference, built new here)."""

import os

import jax.numpy as jnp
import numpy as np

from wcsph_tpu import dense_ops, scene
from wcsph_tpu.grid import build_grid, unpack_liquid
from wcsph_tpu.render import Canvas
from wcsph_tpu.simulation import Simulation, default_config
from wcsph_tpu.utils import checkpoint, objio

R = 0.025


def _sim(solver="dfsph"):
    sc = scene.dam_break(particle_radius=R, fluid_dims=(5, 5, 5), box_extent=0.55)
    lo, hi = sc.domain(pad=4 * R)
    cfg = default_config(solver, particle_radius=R, domain_min=lo, domain_max=hi)
    return Simulation(sc, cfg, solver=solver)


def test_checkpoint_resume_bitwise(tmp_path):
    sim = _sim()
    sim.run(5)
    path = str(tmp_path / "ck.npz")
    checkpoint.save(path, sim.state)
    restored = checkpoint.load(path)

    # continue both for 3 steps: identical trajectories (same program, same
    # on-device state, deterministic XLA)
    sim2 = _sim()
    sim2.state = restored
    sim.run(3)
    sim2.run(3)
    np.testing.assert_array_equal(np.asarray(sim.state.pos),
                                  np.asarray(sim2.state.pos))
    np.testing.assert_array_equal(np.asarray(sim.state.kappa),
                                  np.asarray(sim2.state.kappa))


def test_renderer_produces_particles_image():
    sim = _sim("sesph")
    canvas = Canvas(128, 128)
    canvas.camera.static_cam(0.0, 0.0, 0.0)
    img = canvas.render(sim.state.pos, sim.state.n_liquid)
    assert img.shape == (128, 128, 3)
    assert np.isfinite(img).all()
    assert img.max() > 0.5          # liquid pixels present
    frac = (img.sum(-1) > 0).mean()
    assert 0.005 < frac < 0.9       # neither empty nor fully covered


def test_renderer_depth_order():
    # two overlapping points: the nearer (to the +z camera) must win
    from wcsph_tpu.render import Camera, render_points

    cam = Camera(64, 64)
    cam.static_cam(0, 0, 0)
    view, proj = cam.matrices()
    pts = jnp.asarray([[0.0, 0.0], [0.0, 0.0], [0.5, -0.5]], jnp.float32)
    cols = jnp.asarray([[1.0, 0.0], [0.0, 1.0], [0.0, 0.0]], jnp.float32)
    img = np.asarray(render_points(pts, cols, view, proj, 64, 64, radius_px=2))
    center = img[32, 32]
    assert center[0] > 0.9 and center[1] < 0.1  # red (z=0.5, closer to eye)


def test_color_field_surface_indicator():
    sim = _sim("sesph")
    cfg = sim.cfg
    grid = build_grid(sim.state.pos, sim.state.n_liquid, cfg)
    rhop = dense_ops.density_stats(grid, cfg, False).rho
    color, grad = dense_ops.color_field(grid, cfg, rhop)
    nl = sim.state.n_liquid
    c = np.asarray(unpack_liquid(grid, color, jnp.zeros((nl,))))
    g = np.asarray(unpack_liquid(grid, grad, jnp.zeros((3, nl)))).T
    assert np.isfinite(c).all() and (c > 0).all()
    # gradient magnitude is larger at the fluid surface than deep inside
    gm = np.linalg.norm(g, axis=1)
    pos = np.asarray(sim.state.pos[:, :nl]).T
    centre = pos.mean(axis=0)
    d = np.linalg.norm(pos - centre, axis=1)
    inner = gm[d < np.percentile(d, 20)]
    outer = gm[d > np.percentile(d, 80)]
    assert outer.mean() > 2.0 * inner.mean()


def test_objio_roundtrip(tmp_path):
    v = np.random.default_rng(0).normal(size=(17, 3)).astype(np.float32)
    f = np.asarray([[0, 1, 2], [3, 4, 5]], np.int32)
    p = str(tmp_path / "m.obj")
    objio.save_obj(p, v, f)
    v2, f2 = objio.load_obj(p)
    np.testing.assert_allclose(v2, v, atol=1e-5)
    np.testing.assert_array_equal(f2, f)


def test_native_objio_matches_python(tmp_path):
    """Differential test: native C++ OBJ parser vs pure-Python fallback."""
    from wcsph_tpu.utils import native

    rng = np.random.default_rng(5)
    v = rng.normal(size=(500, 3)).astype(np.float32)
    f = rng.integers(0, 500, (300, 3)).astype(np.int32)
    p = str(tmp_path / "n.obj")
    objio.save_obj(p, v, f)

    lib = native.load()
    if lib is None:
        import pytest

        pytest.skip("native toolchain unavailable")
    vn, fn = objio.load_obj(p)
    # force python fallback
    old_lib, old_failed = native._lib, native._failed
    try:
        native._lib, native._failed = None, True
        vp, fp = objio.load_obj(p)
    finally:
        native._lib, native._failed = old_lib, old_failed
    np.testing.assert_allclose(vn, vp, atol=1e-6)
    np.testing.assert_array_equal(fn, fp)


def test_debug_exports(tmp_path):
    from wcsph_tpu.utils import debug_export

    sim = _sim("sesph")
    n1 = debug_export.export_field_points(sim.state, sim.cfg,
                                          str(tmp_path / "field.obj"))
    assert n1 > 50
    n2 = debug_export.export_color_field(sim.state, sim.cfg,
                                         str(tmp_path / "color.obj"))
    assert n2 == sim.state.n_liquid


def test_grid_stats():
    sim = _sim("sesph")
    st = sim.grid_stats()
    assert st["max_cell_occupancy"] <= st["cell_capacity"]
    assert 20 <= st["max_neighbors"] <= 60
    assert 0 < st["nonempty_cells"] <= st["num_cells"]
    assert st["overflow"] == 0
