"""AOT step-executable cache (wcsph_tpu/utils/aot.py, wired via
SimConfig.aot_dir): a restart deserializes the compiled step and reproduces
the jit trajectory exactly — no re-trace / re-lower / re-compile.

Framework-operational capability (no reference analogue: the Taichi
reference JIT-compiles every run)."""

import glob
import os

import numpy as np

from wcsph_tpu import dam_break
from wcsph_tpu.simulation import Simulation, default_config
from wcsph_tpu.utils import aot


def _sim(aot_dir="", resident=False, side=5):
    r = 0.025
    sc = dam_break(particle_radius=r, fluid_dims=(side,) * 3,
                   box_extent=side * 2 * r * 1.5)
    lo, hi = sc.domain(pad=6 * r)
    cfg = default_config("dfsph", particle_radius=r, domain_min=lo,
                         domain_max=hi, use_pallas=True,
                         resident=resident, aot_dir=aot_dir)
    return Simulation(sc, cfg, solver="dfsph")


def test_compile_or_load_roundtrip(tmp_path, capfd):
    """Second call with identical (fn, avals, extra) deserializes from disk
    and computes the same result."""
    import jax.numpy as jnp

    def f(x):
        return jnp.sin(x) * 2.0 + jnp.sum(x)

    x = jnp.arange(12.0).reshape(3, 4)
    c1 = aot.compile_or_load(f, (x,), str(tmp_path), fn_tag="t", verbose=True)
    y1 = np.asarray(c1(x))
    files = glob.glob(os.path.join(str(tmp_path), "*.jaxexec"))
    assert len(files) == 1, "executable not persisted"
    c2 = aot.compile_or_load(f, (x,), str(tmp_path), fn_tag="t", verbose=True)
    y2 = np.asarray(c2(x))
    np.testing.assert_array_equal(y1, y2)
    assert "[aot] loaded" in capfd.readouterr().err, "cache hit not taken"


def test_cache_key_separates_shapes_and_config(tmp_path):
    import jax.numpy as jnp

    a = (jnp.zeros((3, 4)),)
    b = (jnp.zeros((4, 3)),)
    assert aot.cache_key("t", a) != aot.cache_key("t", b)
    assert aot.cache_key("t", a, extra=("x",)) != aot.cache_key("t", a)
    assert aot.cache_key("t", a) == aot.cache_key("t", a)


def test_simulation_aot_restart_matches_jit(tmp_path):
    """Three steps through the AOT path == three steps through plain jit,
    and a fresh Simulation (the 'restart') hits the cache and continues
    identically.  Covers both the classic and resident step paths."""
    for resident in (False, True):
        d = str(tmp_path / ("res" if resident else "classic"))
        ref = _sim(resident=resident)
        s1 = _sim(aot_dir=d, resident=resident)
        for _ in range(3):
            ref.step()
            s1.step()
        np.testing.assert_allclose(np.asarray(s1.state.pos),
                                   np.asarray(ref.state.pos),
                                   rtol=1e-6, atol=1e-7)
        assert glob.glob(os.path.join(d, "*.jaxexec")), "not persisted"

        s2 = _sim(aot_dir=d, resident=resident)   # restart: cache hit
        assert s2._aot_step is not None
        for _ in range(3):
            s2.step()
        np.testing.assert_allclose(np.asarray(s2.state.pos),
                                   np.asarray(s1.state.pos),
                                   rtol=1e-6, atol=1e-7)
