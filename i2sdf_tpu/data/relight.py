"""Relighting / scene-editing datasets (editing-branch scaffolding).

Capability parity with `/root/reference/dataset/eval_dataset.py:276-374`
(RelightDataset / RelightVideoDataset): PlotData plus an edit config of
per-image material overrides (mask / normal / roughness / kd / ks maps,
resized to the render resolution) and, for video, interpolated poses.
"""

from __future__ import annotations

import os

import cv2
import numpy as np

from ..utils import imaging
from .plot import PlotData


_EDIT_KEYS = ("mask", "normal", "rough", "kd", "ks")


class RelightData(PlotData):
    def __init__(self, *args, edit_conf: dict | None = None, **kwargs):
        super().__init__(*args, **kwargs)
        self.edits = {}
        if not edit_conf:
            return
        H, W = self.img_res
        for key in _EDIT_KEYS:
            path = edit_conf.get(key)
            if not path or not os.path.exists(path):
                continue
            if key in ("normal", "kd", "ks"):
                img = imaging.load_rgb(path, is_hdr=path.endswith(
                    (".exr", ".npy")))
            else:
                img = imaging.load_mask(path)[..., None]
            img = cv2.resize(img, (W, H), interpolation=cv2.INTER_AREA)
            self.edits[key] = np.asarray(img, np.float32).reshape(
                H * W, -1)

    def edited_materials(self, kd, ks, rough, normal, mask=None):
        """Apply the override maps onto per-pixel material predictions."""
        m = self.edits.get("mask")
        if m is None:
            m = np.ones_like(kd[..., :1])
        out = {}
        for name, base in (("kd", kd), ("ks", ks), ("rough", rough),
                           ("normal", normal)):
            override = self.edits.get(name)
            out[name] = (base if override is None
                         else base * (1 - m) + override * m)
        return out


class RelightVideoData(RelightData):
    def __init__(self, *args, id0: int = 0, id1: int = 1,
                 num_frames: int = 60, **kwargs):
        super().__init__(*args, **kwargs)
        from ..eval.interpolate import interpolate_poses

        self.frame_poses = interpolate_poses(
            self.pose_all[id0], self.pose_all[id1], num_frames)
        self.num_frames = num_frames

    def frame_inputs(self, i: int):
        return (self.uv, self.intrinsics_all[0], self.frame_poses[i])
