"""Replica dataset parser.

Parity: /root/reference/utils/dataset.py:106-133 (ReplicaParser): frames at
results/frame*.jpg + results/depth*.png, poses (c2w, row-major 4x4 per line)
in traj.txt, depth scaled by png_depth_scale.
"""

from __future__ import annotations

import glob
import os

import numpy as np

from .base import BaseDataset


class ReplicaDataset(BaseDataset):
    def __init__(self, config: dict):
        super().__init__(config)
        self.root = os.path.expanduser(config["Dataset"]["dataset_path"])
        self.color_paths = sorted(
            glob.glob(os.path.join(self.root, "results/frame*.jpg"))
        )
        self.depth_paths = sorted(
            glob.glob(os.path.join(self.root, "results/depth*.png"))
        )
        traj = np.loadtxt(os.path.join(self.root, "traj.txt"))
        self.poses_w2c = [
            np.linalg.inv(traj[i].reshape(4, 4)) for i in range(len(self.color_paths))
        ]

    def __len__(self):
        return len(self.color_paths)

    def __getitem__(self, idx: int) -> dict:
        import cv2

        rgb = cv2.cvtColor(cv2.imread(self.color_paths[idx]), cv2.COLOR_BGR2RGB)
        depth = cv2.imread(self.depth_paths[idx], cv2.IMREAD_UNCHANGED)
        rgb = (rgb / 255.0).astype(np.float32)
        depth = depth.astype(np.float32) / self.depth_scale
        return {
            "rgb": rgb,
            "depth": depth,
            "pose": self.poses_w2c[idx].astype(np.float32),
            "mask": np.ones(depth.shape, bool),
            "segmentation": np.zeros(depth.shape, np.int32),
        }
