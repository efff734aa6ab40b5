"""Reference-scale interactive evidence (VERDICT r3 missing #2): the
reference's operating point is the 8,000-particle default scene driven at
GUI rate (dfsph.py:29-32 with the ti.GUI loop at dfsph.py:600-647).  This
probe measures, on the current device:

  1. DFSPH 8k step rate on the XLA path, the Mosaic engine path, and the
     resident engine path (particle-steps/s and steps/s);
  2. the achievable live-viewer rate: the run_live loop (step + on-device
     rasterize + JPEG publish, viewer.py:193-210) in frames/s.

  python scripts/interactive_probe.py [steps]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from wcsph_tpu import dam_break
from wcsph_tpu.render import Canvas
from wcsph_tpu.simulation import Simulation, default_config

STEPS = int(sys.argv[1]) if len(sys.argv) > 1 else 200
R = 0.025


def make_sim(**over):
    sc = dam_break(particle_radius=R, fluid_dims=(20,) * 3,
                   box_extent=20 * 2 * R * 1.35)
    lo, hi = sc.domain(pad=6 * R)
    cfg = default_config("dfsph", particle_radius=R, domain_min=lo,
                         domain_max=hi, **over)
    return Simulation(sc, cfg, solver="dfsph")


out = {"scene": "20^3 = 8k dam break, DFSPH",
       "platform": jax.devices()[0].platform}

for label, over in (("xla", dict(use_pallas=False)),
                    ("engine", dict(use_pallas=True)),
                    ("engine+resident", dict(use_pallas=True, resident=True))):
    sim = make_sim(**over)
    nl = sim.state.n_liquid
    for _ in range(10):
        sim.step()
    np.asarray(sim.state.pos.ravel()[0])
    t0 = time.time()
    for _ in range(STEPS):
        sim.step()
    np.asarray(sim.state.pos.ravel()[0])
    el = time.time() - t0
    sim.check_health()
    out[label] = {"particle_steps_per_s": round(nl * STEPS / el),
                  "steps_per_s": round(STEPS / el, 1)}
    print(f"[8k] {label}: {nl * STEPS / el:.3e} particle-steps/s "
          f"({STEPS / el:.1f} steps/s)", flush=True)

# --- live viewer rate: the reference GUI loop shape ---------------------
from wcsph_tpu.viewer import LiveViewer

sim = make_sim(use_pallas=True)
canvas = Canvas(640, 640)
canvas.camera.static_cam(0.0, 0.0, 0.0)
for _ in range(10):
    sim.step()
np.asarray(canvas.render(sim.state.pos, sim.state.n_liquid))  # render compile
frames = 60
with LiveViewer(port=0) as gui:        # port 0: OS-assigned, no collisions
    gui.show(canvas.render(sim.state.pos, sim.state.n_liquid))
    gui._encoded()                     # warm the JPEG path too
    t0 = time.time()
    for _ in range(frames):
        sim.step()
        img = canvas.render(sim.state.pos, sim.state.n_liquid)
        gui.show(np.asarray(img))
        gui._encoded()     # what a connected stream client would cost
    el = time.time() - t0
out["viewer"] = {"fps": round(frames / el, 1),
                 "note": "step + on-device rasterize + JPEG encode"}
print(f"[viewer] {frames / el:.1f} fps (1 step/frame, 640x640)", flush=True)

# attribute the tunnel cost: a bare device->host pull of one frame
import jax.numpy as jnp

dev_img = jnp.zeros((640, 640, 3), jnp.float32) + 0.5
np.asarray(dev_img)
t0 = time.time()
for _ in range(20):
    np.asarray(dev_img * 1.0)
pull_ms = (time.time() - t0) / 20 * 1e3
out["viewer"]["frame_pull_ms"] = round(pull_ms, 1)
print(f"[viewer] bare 4.9MB frame device->host pull: {pull_ms:.0f} ms",
      flush=True)

path = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "benchmarks", "interactive.json")
with open(path, "w") as f:
    json.dump(out, f, indent=1, allow_nan=False)
print(f"wrote {path}")
