"""DAVIS video-segmentation dataset parser (monocular, no poses/depth).

Parity: /root/reference/utils/dataset.py:81-104 (DavisParser): rgb/*.jpg +
segmentation/*.png; ground-truth poses are absent (identity placeholders,
ATE eval is skipped for this dataset in practice).
"""

from __future__ import annotations

import glob
import os

import numpy as np

from .base import BaseDataset


def _digit_key(f: str) -> int:
    return int("".join(filter(str.isdigit, os.path.basename(f))) or 0)


class DavisDataset(BaseDataset):
    def __init__(self, config: dict):
        super().__init__(config)
        self.root = os.path.expanduser(config["Dataset"]["dataset_path"])
        self.color_paths = sorted(
            glob.glob(f"{self.root}/rgb/*.jpg"), key=_digit_key
        )
        self.segmentation_paths = sorted(
            glob.glob(f"{self.root}/segmentation/*.png"), key=_digit_key
        )
        self.has_depth = False

    def __len__(self):
        return len(self.color_paths)

    def __getitem__(self, idx: int) -> dict:
        import cv2

        rgb = cv2.cvtColor(cv2.imread(self.color_paths[idx]), cv2.COLOR_BGR2RGB)
        rgb = (rgb / 255.0).astype(np.float32)
        seg = cv2.imread(self.segmentation_paths[idx], cv2.IMREAD_UNCHANGED)
        if seg.ndim == 3:
            seg = seg[..., 0]
        seg = seg.astype(np.int32)
        H, W = rgb.shape[:2]
        return {
            "rgb": rgb,
            "depth": None,
            "pose": np.eye(4, dtype=np.float32),  # no gt trajectory
            "mask": self.mask_from_segmentation(seg),
            "segmentation": seg,
        }
