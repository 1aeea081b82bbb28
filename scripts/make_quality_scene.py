"""Generate the reference-scale quality-benchmark scene:
N views at 480x640 (EXR depth/normal through the native reader — the
reference's released-dataset format), plus the analytic GT mesh for the
--score protocol.

Usage:
    python scripts/make_quality_scene.py [--views 32] [--res 480 640] \
        [--out data/synthetic_quality] [--scan_id 1]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=32)
    ap.add_argument("--res", type=int, nargs=2, default=[480, 640])
    ap.add_argument("--out", default="data/synthetic_quality")
    ap.add_argument("--scan_id", type=int, default=1)
    ap.add_argument("--mesh_res", type=int, default=384)
    args = ap.parse_args()

    import jax.numpy as jnp

    from i2sdf_tpu.data.synth import generate_synthetic_scene, scene_sdf
    from i2sdf_tpu.eval.mesh_io import write_ply
    from i2sdf_tpu.native import marching_cubes

    scan = generate_synthetic_scene(
        args.out, n_images=args.views, img_res=tuple(args.res),
        scan_id=args.scan_id, depth_format="exr")
    print(f"[scene] wrote {args.views} views at {args.res} to {scan}")

    # analytic GT mesh (bounded to the room interior + epsilon)
    import jax

    n = args.mesh_res
    lo, hi = -2.05, 2.05
    xs = np.linspace(lo, hi, n, dtype=np.float32)
    eval_sdf = jax.jit(lambda p: scene_sdf(p))
    grid = np.empty((n, n, n), np.float32)
    for i in range(n):
        xx, yy, zz = np.meshgrid(xs[i:i + 1], xs, xs, indexing="ij")
        pts = jnp.asarray(
            np.stack([xx, yy, zz], -1).reshape(-1, 3))
        grid[i] = np.asarray(eval_sdf(pts)).reshape(n, n)
    spacing = (hi - lo) / (n - 1)
    # scene_sdf is positive INSIDE the room; negate for the usual
    # outside-positive convention the extractor assumes
    verts, tris = marching_cubes(-grid, 0.0, origin=(lo, lo, lo),
                                 spacing=(spacing,) * 3)
    gt_path = os.path.join(scan, "mesh.ply")
    write_ply(gt_path, verts, tris)
    print(f"[scene] GT mesh: {len(verts)} verts -> {gt_path}")


if __name__ == "__main__":
    main()
