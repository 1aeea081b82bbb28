"""View interpolation: slerp between two training poses, render frames,
assemble a video.

Capability parity with `/root/reference/dataset/eval_dataset.py:188-273`
(InterpolateDataset: quaternion slerp + sine-eased translation) and
`model/eval/recon.py:227-304` (ViewInterpolateSystem: RGB + world-normal
frame renders, ffmpeg h264 assembly — gated here on ffmpeg presence,
falling back to the rendered frame directory).
"""

from __future__ import annotations

import os
import shutil
import subprocess

import jax.numpy as jnp
import numpy as np
from scipy.spatial.transform import Rotation, Slerp

from ..data.plot import PlotData
from ..train import artifacts
from ..train.step import make_eval_render_fn


def interpolate_poses(pose0: np.ndarray, pose1: np.ndarray,
                      num_frames: int) -> np.ndarray:
    """Slerp rotations, sine-ease translations (eval_dataset.py:219-241)."""
    rots = Rotation.from_matrix(
        np.stack([pose0[:3, :3], pose1[:3, :3]]))
    slerp = Slerp([0.0, 1.0], rots)
    t = np.arange(num_frames) / max(num_frames - 1, 1)
    ratio = np.sin((t - 0.5) * np.pi) * 0.5 + 0.5
    out = np.tile(np.eye(4, dtype=np.float32), (num_frames, 1, 1))
    out[:, :3, :3] = slerp(t).as_matrix().astype(np.float32)
    out[:, :3, 3] = ((1 - ratio)[:, None] * pose0[:3, 3]
                     + ratio[:, None] * pose1[:3, 3])
    return out


def frames_to_video(frame_dir: str, out_path: str, frame_rate: int) -> bool:
    """Assemble PNG frames into an h264 mp4 when ffmpeg exists."""
    if shutil.which("ffmpeg") is None:
        print(f"[WARN] ffmpeg not available; frames remain in {frame_dir}")
        return False
    cmd = ["ffmpeg", "-y", "-framerate", str(frame_rate),
           "-pattern_type", "glob", "-i", os.path.join(frame_dir, "*.png"),
           "-c:v", "libx264", "-pix_fmt", "yuv420p", out_path]
    subprocess.run(cmd, check=True, capture_output=True)
    return True


def run_interpolation(params, model_cfg, conf, exp_dir: str, id0: int,
                      id1: int, n_frames: int = 60, frame_rate: int = 24,
                      data_root: str = "data", use_normal: bool = True,
                      fused: bool | None = None) -> str:
    dataset_conf = dict(conf.dataset)
    scan_id = dataset_conf.pop("scan_id", 0)
    pd = PlotData(scan_id=scan_id, data_root=data_root,
                  downsample=dataset_conf.pop("downsample", 1),
                  plot_nimgs=-1, **dataset_conf)
    poses = interpolate_poses(pd.pose_all[id0], pd.pose_all[id1], n_frames)
    K = pd.intrinsics_all[id0]
    H, W = pd.img_res

    video_dir = os.path.join(exp_dir, "eval", "interpolate")
    frame_dir = os.path.join(video_dir, f"{id0:04d}_{id1:04d}")
    os.makedirs(frame_dir, exist_ok=True)
    normal_dir = None
    if use_normal:
        normal_dir = os.path.join(video_dir, f"{id0:04d}_{id1:04d}_normal")
        os.makedirs(normal_dir, exist_ok=True)

    render_image, _ = make_eval_render_fn(
        model_cfg, chunk_size=conf.train.get("split_n_pixels", 12000),
        fused_sampler=fused)

    for i, pose in enumerate(poses):
        out = render_image(params, jnp.asarray(pd.uv), jnp.asarray(K),
                           jnp.asarray(pose),
                           predict_only=not use_normal)
        rgb = np.asarray(out["rgb_values"]).reshape(H, W, 3)
        artifacts.write_rgb(os.path.join(frame_dir, f"{i:04d}.png"), rgb)
        if use_normal:
            n_world = np.asarray(out["normal_map"]).reshape(H, W, 3)
            R = pose[:3, :3]
            artifacts.write_normal(
                os.path.join(normal_dir, f"{i:04d}.png"), n_world @ R)

    out_path = os.path.join(video_dir,
                            f"scan{scan_id}_{id0:04d}_{id1:04d}.mp4")
    frames_to_video(frame_dir, out_path, frame_rate)
    if use_normal:
        frames_to_video(
            normal_dir,
            os.path.join(video_dir,
                         f"scan{scan_id}_{id0:04d}_{id1:04d}_normal.mp4"),
            frame_rate)
    return frame_dir
