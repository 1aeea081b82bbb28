"""Reconstruction dataset: host-side load, device-resident ray sampling.

Capability parity with `/root/reference/dataset/train_dataset.py:15-209`
(ReconDataset): scan directory layout (`image/` or `hdr/`, `mask/`,
`light_mask/`, `depth/`, `normal/`, `cameras_normalize.npz` with
world_mat/scale_mat pairs), depth scaling by scale_mat[2,2], depth
validity window (1e-3, 6), view->world normal rotation, and the bubble
point cloud with pixel<->point links.

TPU-first design: instead of a multiprocess DataLoader streaming per-ray
dicts (reference `trainer/recon.py:209-210`), all flat tensors live in
HBM and each training step gathers a fresh ray batch *inside* the jitted
step (`sample_batch`) — zero host involvement in steady state.
"""

from __future__ import annotations

import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import imaging
from ..utils.cameras import load_K_Rt_from_P


class DeviceArrays(NamedTuple):
    """Device-resident training tensors (None = modality absent)."""
    uv: jnp.ndarray              # (HW, 2)
    intrinsics: jnp.ndarray      # (n, 4, 4)
    pose: jnp.ndarray            # (n, 4, 4)
    rgb: jnp.ndarray             # (n, HW, 3)
    mask: jnp.ndarray | None
    light_mask: jnp.ndarray | None
    depth: jnp.ndarray | None    # (n, HW)
    depth_mask: jnp.ndarray | None
    normal: jnp.ndarray | None   # (n, HW, 3)
    normal_mask: jnp.ndarray | None
    pointcloud: jnp.ndarray | None   # (P, 3)
    pointlinks: jnp.ndarray | None   # (n*HW,) int32, -1 invalid
    pixlinks: jnp.ndarray | None     # (P,) int32 flat pixel index


def _depth_to_world_np(uv, K, pose, depth, mask):
    """Host unprojection of valid depth pixels to world points (P, 3)."""
    fx, fy = K[0, 0], K[1, 1]
    cx, cy, sk = K[0, 2], K[1, 2], K[0, 1]
    x, y = uv[:, 0], uv[:, 1]
    z = np.ones_like(x)
    x_lift = (x - cx + cy * sk / fy - sk * y / fy) / fx * z
    y_lift = (y - cy) / fy * z
    xyz = np.stack([x_lift, y_lift, z], axis=-1) * depth[:, None]
    xyz = xyz[mask]
    xyz_h = np.concatenate([xyz, np.ones_like(xyz[:, :1])], axis=-1)
    world = xyz_h @ pose.T
    return world[:, :3] / world[:, 3:]


class ReconData:
    def __init__(
        self,
        data_dir: str,
        scan_id: int = 0,
        data_root: str = "data",
        use_mask: bool = False,
        use_depth: bool = False,
        use_normal: bool = False,
        use_bubble: bool = False,
        use_lightmask: bool = False,
        is_hdr: bool = False,
        noise_scale: float = 0.0,
        pdf_prune: float = 0.0,
        pdf_max: float | None = None,
        **_unused,
    ):
        self.instance_dir = os.path.join(data_root, data_dir, f"scan{scan_id}")
        assert os.path.exists(self.instance_dir), \
            f"Data directory is empty: {self.instance_dir}"

        image_dir = os.path.join(
            self.instance_dir, "hdr" if is_hdr else "image")
        self.is_hdr = is_hdr
        image_paths = imaging.glob_imgs(image_dir)
        self.n_images = len(image_paths)
        assert self.n_images > 0, f"No images under {image_dir}"

        cam_file = os.path.join(self.instance_dir, "cameras_normalize.npz")
        camera_dict = np.load(cam_file)
        self.scale_mats = [
            camera_dict[f"scale_mat_{i}"].astype(np.float32)
            for i in range(self.n_images)]
        world_mats = [
            camera_dict[f"world_mat_{i}"].astype(np.float32)
            for i in range(self.n_images)]

        intrinsics_all, pose_all = [], []
        for scale_mat, world_mat in zip(self.scale_mats, world_mats):
            P = (world_mat @ scale_mat)[:3, :4]
            intr, pose = load_K_Rt_from_P(P)
            intrinsics_all.append(intr)
            pose_all.append(pose)
        self.intrinsics_all = np.stack(intrinsics_all)
        self.pose_all = np.stack(pose_all)

        rgb_images = []
        for path in image_paths:
            rgb = imaging.load_rgb(path, is_hdr=is_hdr)  # (H, W, 3)
            self.img_res = [rgb.shape[0], rgb.shape[1]]
            rgb_images.append(rgb.reshape(-1, 3))
        self.rgb_images = np.stack(rgb_images)
        self.total_pixels = self.rgb_images.shape[1]

        H, W = self.img_res
        # uv layout parity (train_dataset.py:67-70): uv[...,0]=col, uv[...,1]=row
        jj, ii = np.meshgrid(np.arange(W), np.arange(H))
        self.uv = np.stack([jj, ii], axis=-1).reshape(-1, 2).astype(np.float32)

        # --- optional modalities -------------------------------------------
        self.use_mask = use_mask
        self.mask_images = None
        if use_mask:
            mask_dir = os.path.join(self.instance_dir, "mask")
            paths = imaging.glob_imgs(mask_dir)
            if paths:
                self.mask_images = np.stack(
                    [imaging.load_mask(p).reshape(-1, 1) for p in paths])
            else:
                self.mask_images = np.ones(
                    (self.n_images, self.total_pixels, 1), np.float32)

        lmask_dir = os.path.join(self.instance_dir, "light_mask")
        self.use_lightmask = use_lightmask and os.path.isdir(lmask_dir)
        self.lightmask_images = None
        if self.use_lightmask:
            self.lightmask_images = np.stack([
                imaging.load_mask(p).reshape(-1, 1)
                for p in imaging.glob_imgs(lmask_dir)])

        depth_dir = os.path.join(self.instance_dir, "depth")
        self.use_depth = use_depth and os.path.isdir(depth_dir)
        self.use_bubble = use_bubble and os.path.isdir(depth_dir)
        self.depth_images = self.depth_masks = None
        self.pointcloud = self.pointlinks = self.pixlinks = None
        self.pdf_prune = pdf_prune
        self.pdf_max = pdf_max
        if self.use_depth or self.use_bubble:
            depth_images, depth_masks = [], []
            pointcloud, pointlinks, pixlinks = [], [], []
            n_points = 0
            rng = np.random.default_rng(0)
            for i, path in enumerate(imaging.glob_imgs(depth_dir)):
                depth = imaging.load_depth(path).reshape(-1)
                depth = depth / self.scale_mats[i][2, 2]
                depth_mask = (depth > 1e-3) & (depth < 6.0)
                if noise_scale > 0:
                    # sensor-noise ablation (rend_util.py:229-233)
                    mu = 0.0001125 * depth**2 + 0.0048875
                    sigma = 0.002925 * depth**2 + 0.003325
                    noise = rng.normal(size=depth.shape) * sigma + mu
                    depth = (depth + noise * noise_scale) * depth_mask
                depth_images.append(depth.astype(np.float32))
                depth_masks.append(depth_mask)
                if self.use_bubble:
                    n_valid = int(depth_mask.sum())
                    pl = -np.ones(self.total_pixels, np.int64)
                    pl[depth_mask] = np.arange(n_valid) + n_points
                    px = np.arange(i * self.total_pixels,
                                   (i + 1) * self.total_pixels)[depth_mask]
                    n_points += n_valid
                    pointlinks.append(pl)
                    pixlinks.append(px)
                    pointcloud.append(_depth_to_world_np(
                        self.uv, self.intrinsics_all[i], self.pose_all[i],
                        depth, depth_mask))
            self.depth_images = np.stack(depth_images)
            self.depth_masks = np.stack(depth_masks)
            if self.use_bubble:
                self.pointcloud = np.concatenate(pointcloud).astype(np.float32)
                self.pointlinks = np.concatenate(pointlinks).astype(np.int32)
                self.pixlinks = np.concatenate(pixlinks).astype(np.int32)

        normal_dir = os.path.join(self.instance_dir, "normal")
        self.use_normal = use_normal and os.path.isdir(normal_dir)
        self.normal_images = self.normal_masks = None
        if self.use_normal:
            normals, normal_masks = [], []
            for i, path in enumerate(imaging.glob_imgs(normal_dir)):
                normal = imaging.load_normal(path).reshape(-1, 3)
                finite = np.isfinite(normal).all(axis=1)
                normal = np.nan_to_num(normal)
                valid = (np.linalg.norm(normal, axis=1) > 1e-3) & finite
                R = self.pose_all[i][:3, :3]
                normal = normal @ R.T  # view -> world
                norm = np.maximum(
                    np.linalg.norm(normal, axis=1, keepdims=True), 1e-6)
                normals.append((normal / norm).astype(np.float32))
                normal_masks.append(valid)
            self.normal_images = np.stack(normals)
            self.normal_masks = np.stack(normal_masks)

    def __len__(self) -> int:
        return self.n_images * self.total_pixels

    def to_device(self) -> DeviceArrays:
        def put(x):
            return None if x is None else jnp.asarray(x)

        return DeviceArrays(
            uv=put(self.uv),
            intrinsics=put(self.intrinsics_all),
            pose=put(self.pose_all),
            rgb=put(self.rgb_images),
            mask=put(self.mask_images),
            light_mask=put(self.lightmask_images),
            depth=put(self.depth_images),
            depth_mask=put(self.depth_masks),
            normal=put(self.normal_images),
            normal_mask=put(self.normal_masks),
            pointcloud=put(self.pointcloud),
            pointlinks=put(self.pointlinks),
            pixlinks=put(self.pixlinks),
        )


def sample_batch(data: DeviceArrays, key, batch_size: int):
    """Draw a uniform ray batch fully on device (jit-safe).

    Returns (flat_indices (B,), inputs, ground_truth) with inputs shaped
    for `render_rays` as B batches of 1 pixel — matching the reference's
    per-ray collation (train_dataset.py:169-209).
    """
    n_images, hw = data.rgb.shape[0], data.rgb.shape[1]
    idx = jax.random.randint(key, (batch_size,), 0, n_images * hw)
    img = idx // hw
    pidx = idx % hw

    inputs = {
        "uv": data.uv[pidx][:, None, :],           # (B, 1, 2)
        "intrinsics": data.intrinsics[img],        # (B, 4, 4)
        "pose": data.pose[img],                    # (B, 4, 4)
    }
    gt = {"rgb": data.rgb[img, pidx]}
    if data.mask is not None:
        gt["mask"] = data.mask[img, pidx]
    if data.light_mask is not None:
        gt["light_mask"] = data.light_mask[img, pidx]
    if data.depth is not None:
        gt["depth"] = data.depth[img, pidx]
        gt["depth_mask"] = data.depth_mask[img, pidx]
    if data.normal is not None:
        gt["normal"] = data.normal[img, pidx]
        gt["normal_mask"] = data.normal_mask[img, pidx]
    return idx, inputs, gt
