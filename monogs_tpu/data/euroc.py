"""EuRoC MAV stereo dataset parser.

Parity: /root/reference/utils/dataset.py:218-283 (EuRoCParser) +
:511-630 (StereoDataset): cam0/cam1 png streams, state_groundtruth CSV poses
(body frame x T_i_c0 extrinsic), config-provided rectification (raw K +
distortion -> opt K via per-camera R maps), SGBM disparity -> depth with
baseline*fx = 47.90639384423901 (dataset.py:611-614, the ORB-SLAM2 value).
SGBM stays on host via OpenCV (SURVEY.md §7 point 7).
"""

from __future__ import annotations

import csv
import glob
import os

import numpy as np

from .base import BaseDataset

# Body-to-cam0 extrinsic (EuRoC calibration, dataset.py:252-259).
T_I_C0 = np.array(
    [
        [0.0148655429818, -0.999880929698, 0.00414029679422, -0.0216401454975],
        [0.999557249008, 0.0149672133247, 0.025715529948, -0.064676986768],
        [-0.0257744366974, 0.00375618835797, 0.999660727178, 0.00981073058949],
        [0.0, 0.0, 0.0, 1.0],
    ]
)
BF = 47.90639384423901  # baseline * fx (dataset.py:614)


def _quat_wxyz_to_rotmat(q):
    w, x, y, z = q
    n = w * w + x * x + y * y + z * z
    s = 0.0 if n == 0 else 2.0 / n
    return np.array(
        [
            [1 - s * (y * y + z * z), s * (x * y - z * w), s * (x * z + y * w)],
            [s * (x * y + z * w), 1 - s * (x * x + z * z), s * (y * z - x * w)],
            [s * (x * z - y * w), s * (y * z + x * w), 1 - s * (x * x + y * y)],
        ]
    )


def _K(c):
    return np.array(
        [[c["fx"], 0.0, c["cx"]], [0.0, c["fy"], c["cy"]], [0.0, 0.0, 1.0]]
    )


def _dist(c):
    return np.array([c["k1"], c["k2"], c["p1"], c["p2"], c["k3"]])


class EurocDataset(BaseDataset):
    def __init__(self, config: dict):
        calib = config["Dataset"]["Calibration"]
        cam0opt = calib["cam0"]["opt"]
        # BaseDataset consumes the *rectified* (opt) pinhole model.
        flat = dict(calib)
        flat.update(cam0opt)
        flat["distorted"] = False  # rectification handled here, not in base
        config = dict(config)
        config["Dataset"] = dict(config["Dataset"])
        config["Dataset"]["Calibration"] = flat
        super().__init__(config)
        self.has_depth = True  # depth from stereo SGBM

        self.root = os.path.expanduser(config["Dataset"]["dataset_path"])
        start_idx = int(config["Dataset"].get("start_idx", 0))
        self.color_paths = sorted(
            glob.glob(f"{self.root}/mav0/cam0/data/*.png")
        )[start_idx:]
        self.color_paths_r = sorted(
            glob.glob(f"{self.root}/mav0/cam1/data/*.png")
        )[start_idx:]
        self._load_poses(
            f"{self.root}/mav0/state_groundtruth_estimate0/data.csv"
        )

        # Rectification maps raw -> opt (dataset.py:571-594).
        import cv2

        cam0raw, cam1raw = calib["cam0"]["raw"], calib["cam1"]["raw"]
        cam1opt = calib["cam1"]["opt"]
        R0 = np.array(calib["cam0"]["R"]["data"]).reshape(3, 3)
        R1 = np.array(calib["cam1"]["R"]["data"]).reshape(3, 3)
        size = (self.width, self.height)
        self.map_l = cv2.initUndistortRectifyMap(
            _K(cam0raw), _dist(cam0raw), R0, _K(cam0opt), size, cv2.CV_32FC1
        )
        self.map_r = cv2.initUndistortRectifyMap(
            _K(cam1raw), _dist(cam1raw), R1, _K(cam1opt), size, cv2.CV_32FC1
        )

    def _load_poses(self, path):
        with open(path) as f:
            reader = csv.reader(f)
            next(reader)
            data = np.array([list(map(float, row)) for row in reader])
        pose_ts = data[:, 0]
        self.poses_w2c = []
        for p in self.color_paths:
            color_ts = float(p.split("/")[-1].split(".")[0])
            k = int(np.argmin(np.abs(pose_ts - color_ts)))
            trans = data[k, 1:4]
            quat_wxyz = data[k, 4:8]
            T_w_i = np.eye(4)
            T_w_i[:3, :3] = _quat_wxyz_to_rotmat(quat_wxyz)
            T_w_i[:3, 3] = trans
            T_w_c = T_w_i @ T_I_C0
            self.poses_w2c.append(np.linalg.inv(T_w_c))

    def __len__(self):
        return len(self.color_paths)

    def __getitem__(self, idx: int) -> dict:
        import cv2

        img_l = cv2.imread(self.color_paths[idx], 0)
        img_r = cv2.imread(self.color_paths_r[idx], 0)
        img_l = cv2.remap(img_l, *self.map_l, cv2.INTER_LINEAR)
        img_r = cv2.remap(img_r, *self.map_r, cv2.INTER_LINEAR)

        # SGBM disparity -> depth (dataset.py:606-616).
        sgbm = cv2.StereoSGBM_create(
            minDisparity=0, numDisparities=64, blockSize=20
        )
        sgbm.setUniquenessRatio(40)
        disp = sgbm.compute(img_l, img_r).astype(np.float32) / 16.0
        disp[disp == 0] = 1e10
        depth = BF / disp
        depth[depth < 0] = 0

        rgb = (
            cv2.cvtColor(img_l, cv2.COLOR_GRAY2RGB) / 255.0
        ).astype(np.float32)
        return {
            "rgb": rgb,
            "depth": depth.astype(np.float32),
            "pose": self.poses_w2c[idx].astype(np.float32),
            "mask": np.ones(depth.shape, bool),
            "segmentation": np.zeros(depth.shape, np.int32),
        }
