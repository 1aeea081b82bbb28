"""Full-image evaluation/validation data (the reference's PlotDataset).

Capability parity with `/root/reference/dataset/eval_dataset.py:31-185`:
sources are (a) in-memory handoff from the training dataset (no reload),
(b) a `val/` directory with `val_mat_%d` cameras sharing scale_mat_0, or
(c) reload of the training images; supports `downsample` (area-interp +
intrinsics rescale), index subsetting, plot_nimgs=-1 => all, and a
reshuffled plot index per validation epoch.
"""

from __future__ import annotations

import os

import cv2
import numpy as np

from ..utils import imaging
from ..utils.cameras import load_K_Rt_from_P


def _downsample_images(images: np.ndarray, img_res, factor: int):
    """(n, H*W, C) -> (n, H/f * W/f, C) area-interpolated."""
    if factor <= 1:
        return images, list(img_res)
    H, W = img_res
    h, w = H // factor, W // factor
    out = []
    for img in images:
        img2 = cv2.resize(img.reshape(H, W, -1), (w, h),
                          interpolation=cv2.INTER_AREA)
        out.append(img2.reshape(h * w, -1))
    return np.stack(out), [h, w]


def _scale_intrinsics(intrinsics: np.ndarray, factor: int) -> np.ndarray:
    if factor <= 1:
        return intrinsics
    out = intrinsics.copy()
    out[:, :2, :] = out[:, :2, :] / factor
    return out


class PlotData:
    def __init__(
        self,
        data_dir: str | None = None,
        scan_id: int = 0,
        data_root: str = "data",
        data: dict | None = None,
        downsample: int = 1,
        indices=None,
        plot_nimgs: int = 1,
        is_val: bool = False,
        is_hdr: bool = False,
        **_unused,
    ):
        if data is not None:
            # in-memory handoff from the training dataset
            intr = np.asarray(data["intrinsics"])
            pose = np.asarray(data["pose"])
            rgb = np.asarray(data["rgb"])
            img_res = list(data["img_res"])
            lmask = (np.asarray(data["light_mask"])
                     if "light_mask" in data else None)
        else:
            instance_dir = os.path.join(data_root, data_dir, f"scan{scan_id}")
            if is_val and os.path.isdir(os.path.join(instance_dir, "val")):
                # held-out validation cameras: val_mat_i @ scale_mat_0
                val_dir = os.path.join(instance_dir, "val")
                cams = np.load(os.path.join(instance_dir,
                                            "cameras_normalize.npz"))
                scale_mat = cams["scale_mat_0"].astype(np.float32)
                paths = imaging.glob_imgs(val_dir)
                intr_l, pose_l, rgb_l = [], [], []
                for i, p in enumerate(paths):
                    P = (cams[f"val_mat_{i}"].astype(np.float32)
                         @ scale_mat)[:3, :4]
                    K, c2w = load_K_Rt_from_P(P)
                    intr_l.append(K)
                    pose_l.append(c2w)
                    img = imaging.load_rgb(p, is_hdr=is_hdr)
                    img_res = [img.shape[0], img.shape[1]]
                    rgb_l.append(img.reshape(-1, 3))
                intr, pose, rgb = (np.stack(intr_l), np.stack(pose_l),
                                   np.stack(rgb_l))
                lmask = None
            else:
                from .recon import ReconData

                ds = ReconData(data_dir, scan_id=scan_id, data_root=data_root,
                               is_hdr=is_hdr)
                intr, pose, rgb = (ds.intrinsics_all, ds.pose_all,
                                   ds.rgb_images)
                img_res = ds.img_res
                lmask = ds.lightmask_images

        if indices is not None:
            idx = np.asarray(indices)
            intr, pose, rgb = intr[idx], pose[idx], rgb[idx]
            if lmask is not None:
                lmask = lmask[idx]

        rgb, new_res = _downsample_images(rgb, img_res, downsample)
        if lmask is not None:
            lmask, _ = _downsample_images(lmask, img_res, downsample)
        intr = _scale_intrinsics(intr, downsample)

        self.intrinsics_all = intr
        self.pose_all = pose
        self.rgb_images = rgb
        self.lightmask_images = lmask
        self.img_res = new_res
        self.n_images = rgb.shape[0]
        self.total_pixels = new_res[0] * new_res[1]

        H, W = new_res
        jj, ii = np.meshgrid(np.arange(W), np.arange(H))
        self.uv = np.stack([jj, ii], -1).reshape(-1, 2).astype(np.float32)

        self.plot_nimgs = (self.n_images if plot_nimgs == -1
                           else min(plot_nimgs, self.n_images))
        self._rng = np.random.default_rng(0)
        self.shuffle_plot_index()

    def shuffle_plot_index(self) -> None:
        """Reshuffled subset each validation epoch
        (parity eval_dataset.py:133-139)."""
        perm = self._rng.permutation(self.n_images)
        self.plot_index = perm[: self.plot_nimgs]

    def image_inputs(self, i: int):
        """Per-image (uv (HW, 2), intrinsics, pose, rgb_gt (HW, 3))."""
        return (self.uv, self.intrinsics_all[i], self.pose_all[i],
                self.rgb_images[i])
