"""Showcase: a concave multi-chamber vessel at >=100k liquid particles.

The reference's headline evidence is sims inside complex artist meshes
(model/hikvision.obj / taichi_boundry.obj shells loaded by
ParticleData.add_obj, /root/reference/ParticleData.py:130-138, produced by
the boundry.py sampler pipeline, boundry.py:409-460).  No reference asset
is copied: the vessel here is built procedurally (utils/meshgen.weir_tank —
an open tank split by an internal weir wall below the rim, plus a torus
obstacle in the downstream chamber), Poisson-disk sampled into a boundary
shell, and a >=100k-particle column is dropped into chamber A.  The run
exercises DFSPH + surface tension + boundary adhesion, overflow into the
second chamber, flow through the torus hole, anisotropic marching-cubes
export, and rendered frames — end to end on the TPU engine path.

  python examples/run_showcase.py --frames 120          # full showcase
  python examples/run_showcase.py --frames 20 --small   # quick smoke
"""

import argparse
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np

SIZE = (3.2, 1.6, 2.0)          # tank extent (weir_tank default)
WEIR_X = 0.2
TORUS = dict(major=0.3, minor=0.1, center=(0.9, -0.3, 0.0), axis="x")


def build_scene(radius: float, fluid_dims, out_dir: str):
    from wcsph_tpu.sampling import poisson_disk_sample
    from wcsph_tpu.scene import SceneBuilder
    from wcsph_tpu.utils import meshgen

    verts, faces = meshgen.weir_tank(size=SIZE, weir_x=WEIR_X,
                                     weir_height=0.7, torus_kw=TORUS)
    name = f"showcase_shell_{radius:g}.npy"
    cache = os.path.join(out_dir, name)
    committed = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "assets", name)
    if not os.path.exists(cache) and os.path.exists(committed):
        cache = committed   # the TPU-sampled shell committed as evidence
    if os.path.exists(cache):
        shell = np.load(cache)
        print(f"[scene] loaded cached shell ({shell.shape[0]} pts)")
    else:
        t0 = time.time()
        shell = poisson_disk_sample(verts, faces, radius=radius)
        print(f"[scene] sampled {shell.shape[0]} boundary particles from "
              f"{faces.shape[0]} faces in {time.time() - t0:.1f}s")
        os.makedirs(out_dir, exist_ok=True)
        np.save(cache, shell)

    spacing = 2 * radius
    b = SceneBuilder()
    # column filling chamber A (left of the weir), clear of the walls
    origin = (-SIZE[0] / 2 + 3 * radius,
              -SIZE[1] / 2 + 3 * radius,
              -fluid_dims[2] * spacing / 2)
    b.add_liquid_block(fluid_dims, spacing, origin)
    for p in shell:
        b.add_solid_point(p)
    return b.build()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--radius", type=float, default=0.0125)
    ap.add_argument("--frames", type=int, default=120)
    ap.add_argument("--steps-per-frame", type=int, default=8)
    ap.add_argument("--small", action="store_true",
                    help="8k-particle smoke version (radius 0.025)")
    ap.add_argument("--export-surface", action="store_true")
    ap.add_argument("--render-every", type=int, default=10,
                    help="save a PNG every N frames (0 = never)")
    ap.add_argument("--out", default="out/showcase")
    args = ap.parse_args()

    from wcsph_tpu.render import Canvas
    from wcsph_tpu.simulation import Simulation, default_config
    from wcsph_tpu.surface.reconstruction import reconstruct
    from wcsph_tpu.utils import objio

    r = 0.025 if args.small else args.radius
    spacing = 2 * r
    # chamber A is ~1.5 wide; fill it ~1.2 deep (overflows the 0.7 weir
    # once the column spreads)
    nx = int(1.35 / spacing)
    ny = int(1.25 / spacing)
    nz = int(1.18 / spacing)
    sc = build_scene(r, (nx, ny, nz), args.out)

    lo, hi = sc.domain(pad=6 * r)
    cfg = default_config(
        "dfsph", particle_radius=r, domain_min=lo, domain_max=hi,
        # shell junction cells stack multiple sampled surfaces (weir wall
        # meets floor/rim, torus weld): capacity 32 keeps overflow at 0
        use_pallas=True, cell_capacity=32,
        tension_coff=0.5, tension_coff_b=0.25,
        # adhesion region on the weir's crest (reference hard-codes a
        # region around (0, 0.5, 0), dfsph.py:300; config.py exposes it)
        adhesion_center=(WEIR_X, -SIZE[1] / 2 + 0.7, 0.0),
        adhesion_radius=0.3)
    sim = Simulation(sc, cfg, solver="dfsph")
    nl = sim.state.n_liquid
    print(f"[scene] n_liquid={nl} n_solid={sc.n_solid} grid={cfg.grid_res}")

    canvas = None
    if args.render_every:
        canvas = Canvas(768, 512)
        canvas.camera.static_cam(0.0, 0.0, 0.0)
        canvas.camera.scale = 2.6
        canvas.camera.yaw = 0.45
        canvas.camera.pitch = 0.35
    os.makedirs(args.out, exist_ok=True)
    slack = 6 * r
    lo_box = np.array([-SIZE[0] / 2, -SIZE[1] / 2, -SIZE[2] / 2]) - slack
    hi_box = np.array([SIZE[0] / 2, SIZE[1] * 2, SIZE[2] / 2]) + slack
    # containment is asymmetric on purpose: penetrating a WALL (sides,
    # floor) means the sampled shell leaked — a bug, abort; but the tank is
    # open-topped and the dam-break impact (vmax ~12 m/s here) legitimately
    # launches ballistic droplets above any finite rim height — those are
    # physics, counted and reported, never a failure (they fall back and
    # re-enter; the grid clamps their bins to the top plane where W=0
    # against everything, so they exert no spurious forces meanwhile)
    crossed_max = 0.0
    ejecta_max = 0
    t_start = time.time()
    for frame in range(args.frames):
        t0 = time.time()
        sim.run(args.steps_per_frame)
        sim.check_health()
        tel = sim.telemetry()
        liq = np.asarray(sim.state.pos[:, :nl])
        walled = ((liq[0] >= lo_box[0]) & (liq[0] <= hi_box[0])
                  & (liq[1] >= lo_box[1])
                  & (liq[2] >= lo_box[2]) & (liq[2] <= hi_box[2]))
        leaked = int((~walled).sum())
        ejecta = int((liq[1] > hi_box[1]).sum())
        ejecta_max = max(ejecta_max, ejecta)
        crossed = float((liq[0] > WEIR_X).mean())
        crossed_max = max(crossed_max, crossed)
        print(f"[frame {frame:3d}] t={tel['time']:.3f}s dt={tel['dt']:.1e} "
              f"pr={tel['pressure_iters']} err={tel['density_error']:.2e} "
              f"vmax={tel['vel_max']:.2f} crossed={crossed:4.1%} "
              f"ejecta={ejecta} leaked={leaked} "
              f"wall={time.time() - t0:.2f}s")
        if leaked:
            bad = liq[:, ~walled][:, :5]
            raise SystemExit(f"{leaked} particles penetrated a wall "
                             f"(sampled-shell leak), e.g. {bad.T}")
        if canvas and frame % args.render_every == 0:
            from PIL import Image
            img = canvas.render(sim.state.pos, nl,
                                liquid_color=(0.35, 0.65, 1.0))
            Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)
                            ).save(os.path.join(args.out,
                                                f"frame_{frame:04d}.png"))
    steps = args.frames * args.steps_per_frame
    print(f"[done] {steps} steps, {nl * steps / (time.time() - t_start):.3e} "
          f"particle-steps/s (incl. compile), max crossed {crossed_max:.1%}, "
          f"max airborne ejecta {ejecta_max}")

    if args.export_surface:
        t0 = time.time()
        verts, tris = reconstruct(sim.state, cfg, anisotropic=True)
        path = os.path.join(args.out, "showcase_surface.obj")
        objio.save_obj(path, verts, tris)
        print(f"[surface] {tris.shape[0]} triangles -> {path} "
              f"({time.time() - t0:.1f}s)")


if __name__ == "__main__":
    main()
