"""Camera normalization tooling: center + scale a capture into the unit
setup the reconstruction expects.

Capability parity with `/root/reference/data/normalize_cameras.py:1-80`:
least-squares scene center from the cameras' optical axes, scale_mat =
translate(center) * scale(max_radius / target_radius), optional
OpenGL -> OpenCV convention conversion. Reads/writes the
`cameras[_normalize].npz` world_mat/scale_mat format.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from i2sdf_tpu.utils.cameras import load_K_Rt_from_P  # noqa: E402


def solve_scene_center(poses: list[np.ndarray]) -> np.ndarray:
    """Least-squares point closest to all optical axes.

    For each camera (center c_i, viewing dir d_i), minimize
    sum_i || (I - d_i d_i^T)(x - c_i) ||^2 — a 3x3 linear solve.
    """
    A = np.zeros((3, 3))
    b = np.zeros(3)
    for pose in poses:
        c = pose[:3, 3]
        d = pose[:3, 2]
        d = d / np.linalg.norm(d)
        P = np.eye(3) - np.outer(d, d)
        A += P
        b += P @ c
    return np.linalg.solve(A, b)


def opengl_to_opencv(pose: np.ndarray) -> np.ndarray:
    """Flip y/z axes of a c2w pose (OpenGL looks down -z)."""
    flip = np.diag([1.0, -1.0, -1.0, 1.0]).astype(pose.dtype)
    return pose @ flip


def normalize_cameras(world_mats: list[np.ndarray],
                      target_radius: float = 3.0,
                      opengl: bool = False):
    poses = []
    for w in world_mats:
        _, pose = load_K_Rt_from_P(w[:3, :4])
        if opengl:
            pose = opengl_to_opencv(pose)
        poses.append(pose)
    center = solve_scene_center(poses)
    radius = max(np.linalg.norm(p[:3, 3] - center) for p in poses)
    scale = radius / target_radius

    scale_mat = np.eye(4, dtype=np.float32)
    scale_mat[:3, :3] *= scale
    scale_mat[:3, 3] = center
    return scale_mat, center, scale


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="cameras.npz with world_mat_%d entries")
    ap.add_argument("--output", default=None)
    ap.add_argument("--target_radius", type=float, default=3.0)
    ap.add_argument("--opengl", action="store_true",
                    help="input poses use OpenGL convention")
    args = ap.parse_args()

    cams = np.load(args.input)
    n = len([k for k in cams.files if k.startswith("world_mat_")])
    world_mats = [cams[f"world_mat_{i}"] for i in range(n)]
    scale_mat, center, scale = normalize_cameras(
        world_mats, args.target_radius, args.opengl)
    print(f"[INFO] center={center} scale={scale:.4f}")

    out = {}
    for i in range(n):
        out[f"world_mat_{i}"] = world_mats[i].astype(np.float32)
        out[f"scale_mat_{i}"] = scale_mat
    out_path = args.output or os.path.join(
        os.path.dirname(args.input), "cameras_normalize.npz")
    np.savez(out_path, **out)
    print(f"[INFO] wrote {out_path}")


if __name__ == "__main__":
    main()
