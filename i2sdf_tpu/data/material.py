"""Material-stage dataset (editing-branch scaffolding).

Capability parity with `/root/reference/dataset/train_dataset.py:212-350`
(MaterialDataset): ReconData minus depth/normal/bubble, with a
`downsample_train` factor that area-downscales images (and masks) and
rescales intrinsics. Ships for the intrinsic-decomposition branch the
reference scaffolds but never released.
"""

from __future__ import annotations

import os

import cv2
import numpy as np

from ..utils import imaging
from ..utils.cameras import load_K_Rt_from_P


class MaterialData:
    def __init__(self, data_dir: str, scan_id: int = 0,
                 data_root: str = "data", use_mask: bool = False,
                 is_hdr: bool = False, downsample_train: int = 1,
                 **_unused):
        self.instance_dir = os.path.join(data_root, data_dir,
                                         f"scan{scan_id}")
        assert os.path.exists(self.instance_dir), \
            f"Data directory is empty: {self.instance_dir}"
        image_dir = os.path.join(self.instance_dir,
                                 "hdr" if is_hdr else "image")
        self.is_hdr = is_hdr
        image_paths = imaging.glob_imgs(image_dir)
        self.n_images = len(image_paths)

        cams = np.load(os.path.join(self.instance_dir,
                                    "cameras_normalize.npz"))
        intr, pose = [], []
        for i in range(self.n_images):
            P = (cams[f"world_mat_{i}"].astype(np.float32)
                 @ cams[f"scale_mat_{i}"].astype(np.float32))[:3, :4]
            K, c2w = load_K_Rt_from_P(P)
            intr.append(K)
            pose.append(c2w)
        self.intrinsics_all = np.stack(intr)
        self.pose_all = np.stack(pose)

        f = max(int(downsample_train), 1)
        rgbs = []
        for p in image_paths:
            img = imaging.load_rgb(p, is_hdr=is_hdr)
            if f > 1:
                img = cv2.resize(img, (img.shape[1] // f, img.shape[0] // f),
                                 interpolation=cv2.INTER_AREA)
            self.img_res = [img.shape[0], img.shape[1]]
            rgbs.append(img.reshape(-1, 3))
        self.rgb_images = np.stack(rgbs)
        self.total_pixels = self.rgb_images.shape[1]
        if f > 1:
            self.intrinsics_all[:, :2, :] /= f

        self.use_mask = use_mask
        self.mask_images = None
        if use_mask:
            mask_dir = os.path.join(self.instance_dir, "mask")
            paths = imaging.glob_imgs(mask_dir)
            if paths:
                masks = []
                for p in paths:
                    m = imaging.load_mask(p)
                    if f > 1:
                        m = cv2.resize(m, (m.shape[1] // f, m.shape[0] // f),
                                       interpolation=cv2.INTER_AREA)
                    masks.append(m.reshape(-1, 1))
                self.mask_images = np.stack(masks)
            else:
                self.mask_images = np.ones(
                    (self.n_images, self.total_pixels, 1), np.float32)

        H, W = self.img_res
        jj, ii = np.meshgrid(np.arange(W), np.arange(H))
        self.uv = np.stack([jj, ii], -1).reshape(-1, 2).astype(np.float32)

    def __len__(self) -> int:
        return self.n_images * self.total_pixels
