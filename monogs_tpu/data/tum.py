"""TUM RGB-D dataset parser.

Parity: /root/reference/utils/dataset.py:135-216 (TUMParser) — timestamp
association of rgb.txt / depth.txt / groundtruth.txt triplets with
max_dt=0.08, frame_rate 32, poses as c2w TUM quaternions converted to w2c.
"""

from __future__ import annotations

import os

import numpy as np

from .base import BaseDataset


def parse_list(filepath: str, skiprows: int = 0) -> np.ndarray:
    return np.loadtxt(filepath, delimiter=" ", dtype=np.str_, skiprows=skiprows)


def associate_frames(
    tstamp_image, tstamp_depth, tstamp_pose, max_dt: float = 0.08
):
    """dataset.py:148-165: for each image timestamp pick the nearest depth
    and pose within max_dt."""
    associations = []
    for i, t in enumerate(tstamp_image):
        j = np.argmin(np.abs(tstamp_depth - t))
        if tstamp_pose is None:
            if np.abs(tstamp_depth[j] - t) < max_dt:
                associations.append((i, j))
        else:
            k = np.argmin(np.abs(tstamp_pose - t))
            if (np.abs(tstamp_depth[j] - t) < max_dt) and (
                np.abs(tstamp_pose[k] - t) < max_dt
            ):
                associations.append((i, j, k))
    return associations


def tum_quat_to_c2w(pvec: np.ndarray) -> np.ndarray:
    """tx ty tz qx qy qz qw -> (4,4) c2w."""
    t = pvec[0:3]
    qx, qy, qz, qw = pvec[3:7]
    n = qw * qw + qx * qx + qy * qy + qz * qz
    s = 0.0 if n == 0 else 2.0 / n
    R = np.array(
        [
            [1 - s * (qy * qy + qz * qz), s * (qx * qy - qz * qw),
             s * (qx * qz + qy * qw)],
            [s * (qx * qy + qz * qw), 1 - s * (qx * qx + qz * qz),
             s * (qy * qz - qx * qw)],
            [s * (qx * qz - qy * qw), s * (qy * qz + qx * qw),
             1 - s * (qx * qx + qy * qy)],
        ]
    )
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    return T


class TUMDataset(BaseDataset):
    def __init__(self, config: dict):
        super().__init__(config)
        self.root = config["Dataset"]["dataset_path"]
        frame_rate = 32
        self._load_tum(self.root, frame_rate)

    def _load_tum(self, datapath: str, frame_rate: int):
        if os.path.isfile(os.path.join(datapath, "groundtruth.txt")):
            pose_list = os.path.join(datapath, "groundtruth.txt")
        else:
            pose_list = os.path.join(datapath, "pose.txt")
        image_list = os.path.join(datapath, "rgb.txt")
        depth_list = os.path.join(datapath, "depth.txt")

        image_data = parse_list(image_list)
        depth_data = parse_list(depth_list)
        pose_data = parse_list(pose_list, skiprows=1)
        pose_vecs = pose_data[:, 1:].astype(np.float64)

        tstamp_image = image_data[:, 0].astype(np.float64)
        tstamp_depth = depth_data[:, 0].astype(np.float64)
        tstamp_pose = pose_data[:, 0].astype(np.float64)
        associations = associate_frames(tstamp_image, tstamp_depth, tstamp_pose)

        # Subsample to the target frame rate (dataset.py:186-193).
        indices = [0]
        for i in range(1, len(associations)):
            t0 = tstamp_image[associations[indices[-1]][0]]
            t1 = tstamp_image[associations[i][0]]
            if t1 - t0 > 1.0 / frame_rate:
                indices.append(i)

        self.color_paths, self.depth_paths, self.poses_w2c = [], [], []
        for ix in indices:
            i, j, k = associations[ix]
            self.color_paths.append(os.path.join(datapath, image_data[i, 1]))
            self.depth_paths.append(os.path.join(datapath, depth_data[j, 1]))
            c2w = tum_quat_to_c2w(pose_vecs[k])
            self.poses_w2c.append(np.linalg.inv(c2w))

    def __len__(self):
        return len(self.color_paths)

    def __getitem__(self, idx: int) -> dict:
        import cv2

        rgb = cv2.cvtColor(cv2.imread(self.color_paths[idx]), cv2.COLOR_BGR2RGB)
        depth = cv2.imread(self.depth_paths[idx], cv2.IMREAD_UNCHANGED)
        rgb = self.undistort_rgb(rgb)
        rgb = (rgb / 255.0).astype(np.float32)
        depth = depth.astype(np.float32) / self.depth_scale
        seg = np.zeros(depth.shape, np.int32)
        return {
            "rgb": rgb,
            "depth": depth,
            "pose": self.poses_w2c[idx].astype(np.float32),
            "mask": np.ones(depth.shape, bool),
            "segmentation": seg,
        }
