"""EuRoC MAV stereo dataset parser.

Parity: /root/reference/utils/dataset.py:218-283 (EuRoCParser) +
:511-630 (StereoDataset): cam0/cam1 png streams, state_groundtruth CSV poses
(body frame x T_i_c0 extrinsic), stereo rectification and SGBM disparity ->
depth with baseline*fx = 47.90639384423901 (dataset.py:606-613). SGBM stays
on host via OpenCV (SURVEY.md §7 point 7).
"""

from __future__ import annotations

import csv
import glob

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
BF = 47.90639384423901  # baseline * fx (dataset.py:613)


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


class EurocDataset(BaseDataset):
    def __init__(self, config: dict):
        super().__init__(config)
        self.root = config["Dataset"]["dataset_path"]
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
        self._init_rectification(config)
        self.has_depth = True   # depth from stereo SGBM

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

    def _init_rectification(self, config):
        """Stereo rectification maps (dataset.py:523-605)."""
        import cv2

        calib = config["Dataset"]["Calibration"]
        K_l = self.K_matrix()
        d_l = np.array(
            [calib.get("k1", 0.0), calib.get("k2", 0.0), calib.get("p1", 0.0),
             calib.get("p2", 0.0), calib.get("k3", 0.0)]
        )
        cam1 = calib.get("cam1", calib)
        K_r = np.array(
            [[cam1.get("fx", self.fx), 0, cam1.get("cx", self.cx)],
             [0, cam1.get("fy", self.fy), cam1.get("cy", self.cy)],
             [0, 0, 1]]
        )
        d_r = np.array(
            [cam1.get("k1", 0.0), cam1.get("k2", 0.0), cam1.get("p1", 0.0),
             cam1.get("p2", 0.0), cam1.get("k3", 0.0)]
        )
        # Relative cam0->cam1 from config (T_lr), else EuRoC default.
        T_lr = np.array(
            calib.get(
                "T_lr",
                [[1.0, 0.000232, 0.000753, 0.110074],
                 [-0.000232, 1.0, 0.000141, 0.000399],
                 [-0.000753, -0.000141, 1.0, -0.000853],
                 [0.0, 0.0, 0.0, 1.0]],
            )
        ).reshape(4, 4)
        R12, t12 = T_lr[:3, :3], T_lr[:3, 3]
        size = (self.width, self.height)
        R_l, R_r, P_l, P_r, _, _, _ = cv2.stereoRectify(
            K_l, d_l, K_r, d_r, size, R12.T, -R12.T @ t12,
            flags=cv2.CALIB_ZERO_DISPARITY, alpha=0,
        )
        self.map_l = cv2.initUndistortRectifyMap(
            K_l, d_l, R_l, P_l, size, cv2.CV_32FC1
        )
        self.map_r = cv2.initUndistortRectifyMap(
            K_r, d_r, R_r, P_r, size, cv2.CV_32FC1
        )
        # Rectified intrinsics replace the raw ones.
        self.fx, self.fy = float(P_l[0, 0]), float(P_l[1, 1])
        self.cx, self.cy = float(P_l[0, 2]), float(P_l[1, 2])
        self.R_rect_l = R_l

    def __len__(self):
        return len(self.color_paths)

    def __getitem__(self, idx: int) -> dict:
        import cv2

        img_l = cv2.imread(self.color_paths[idx])
        img_r = cv2.imread(self.color_paths_r[idx])
        gray_l = cv2.cvtColor(img_l, cv2.COLOR_BGR2GRAY)
        gray_r = cv2.cvtColor(img_r, cv2.COLOR_BGR2GRAY)
        rect_l = cv2.remap(img_l, *self.map_l, cv2.INTER_LINEAR)
        grl = cv2.remap(gray_l, *self.map_l, cv2.INTER_LINEAR)
        grr = cv2.remap(gray_r, *self.map_r, cv2.INTER_LINEAR)

        # SGBM disparity -> depth (dataset.py:606-613).
        sgbm = cv2.StereoSGBM_create(
            minDisparity=0, numDisparities=64, blockSize=8,
            P1=8 * 9, P2=32 * 9, disp12MaxDiff=1,
            uniquenessRatio=10, speckleWindowSize=100, speckleRange=32,
        )
        disp = sgbm.compute(grl, grr).astype(np.float32) / 16.0
        depth = np.where(disp > 0, BF / np.maximum(disp, 1e-6), 0.0)

        rgb = (cv2.cvtColor(rect_l, cv2.COLOR_BGR2RGB) / 255.0).astype(
            np.float32
        )
        # Pose of the rectified camera: R_rect applied to cam0 pose.
        T = np.eye(4)
        T[:3, :3] = self.R_rect_l
        pose = T @ self.poses_w2c[idx]
        return {
            "rgb": rgb,
            "depth": depth.astype(np.float32),
            "pose": pose.astype(np.float32),
            "mask": np.ones(depth.shape, bool),
            "segmentation": np.zeros(depth.shape, np.int32),
        }
