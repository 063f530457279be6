"""Kubric synthetic dataset parser (this fork's semantic/dynamic extension).

Parity: /root/reference/utils/dataset.py:24-79 (KubricParser): camera poses
in metadata.json (positions + wxyz quaternions, OpenGL-style local transform
flip), rgba/*.png color, depth/*.tiff depth, segmentation/*.png object ids.
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np

from .base import BaseDataset


def _digit_key(f: str) -> int:
    return int("".join(filter(str.isdigit, os.path.basename(f))) or 0)


class KubricDataset(BaseDataset):
    def __init__(self, config: dict):
        super().__init__(config)
        self.root = os.path.expanduser(config["Dataset"]["dataset_path"])
        with open(os.path.join(self.root, "metadata.json")) as f:
            metadata = json.load(f)["camera"]
        flip = np.diag([1.0, -1.0, -1.0])
        self.poses_w2c = []
        for position, quat in zip(metadata["positions"], metadata["quaternions"]):
            w, x, y, z = quat
            n = w * w + x * x + y * y + z * z
            s = 0.0 if n == 0 else 2.0 / n
            R = np.array(
                [
                    [1 - s * (y * y + z * z), s * (x * y - z * w),
                     s * (x * z + y * w)],
                    [s * (x * y + z * w), 1 - s * (x * x + z * z),
                     s * (y * z - x * w)],
                    [s * (x * z - y * w), s * (y * z + x * w),
                     1 - s * (x * x + y * y)],
                ]
            )
            T = np.eye(4)
            T[:3, :3] = R @ flip
            T[:3, 3] = position
            self.poses_w2c.append(np.linalg.inv(T))

        self.color_paths = sorted(
            glob.glob(f"{self.root}/rgba/*.png"), key=_digit_key
        )
        self.depth_paths = sorted(
            glob.glob(f"{self.root}/depth/*.tiff"), key=_digit_key
        )
        self.segmentation_paths = sorted(
            glob.glob(f"{self.root}/segmentation/*.png"), key=_digit_key
        )

    def __len__(self):
        return len(self.color_paths)

    def __getitem__(self, idx: int) -> dict:
        import cv2

        rgba = cv2.imread(self.color_paths[idx], cv2.IMREAD_UNCHANGED)
        rgb = (cv2.cvtColor(rgba, cv2.COLOR_BGRA2RGB) / 255.0).astype(np.float32)
        depth = cv2.imread(
            self.depth_paths[idx], cv2.IMREAD_ANYDEPTH | cv2.IMREAD_UNCHANGED
        ).astype(np.float32)
        seg = cv2.imread(self.segmentation_paths[idx], cv2.IMREAD_UNCHANGED)
        if seg.ndim == 3:
            seg = seg[..., 0]
        seg = seg.astype(np.int32)
        return {
            "rgb": rgb,
            "depth": depth / self.depth_scale,
            "pose": self.poses_w2c[idx].astype(np.float32),
            "mask": self.mask_from_segmentation(seg),
            "segmentation": seg,
        }
