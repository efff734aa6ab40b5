"""Boundary shell generation (reference boundry.py CLI):
  python examples/sample_boundary.py model.obj --radius 0.025
writes model_boundry.obj with Poisson-disk surface samples.
"""

import argparse
import sys

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mesh")
    ap.add_argument("--radius", type=float, default=0.025)
    ap.add_argument("--trials", type=int, default=10)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from wcsph_tpu.sampling import sample_obj

    out = args.out or args.mesh.rsplit(".", 1)[0] + "_boundry.obj"
    pts = sample_obj(args.mesh, out, radius=args.radius, trials=args.trials)
    print(f"wrote {pts.shape[0]} boundary samples to {out}")


if __name__ == "__main__":
    main()
