"""Dataset base classes.

Counterpart of reference utils/dataset.py:285-508 (BaseDataset /
MonocularDataset): frames are plain dicts of numpy arrays
{rgb (H,W,3) float32 [0,1], depth (H,W) float32 or None, pose (4,4) w2c,
mask (H,W) bool, segmentation (H,W) int32}; calibration (incl. optional
undistortion via cv2) is applied here so the SLAM layer only ever sees
pinhole images. Object semantics (static/dynamic/masked ids,
dataset.py:285-304) drive the mask/segmentation channels.
"""

from __future__ import annotations

import numpy as np

from ..ops.graphics import Intrinsics


class BaseDataset:
    def __init__(self, config: dict):
        self.config = config
        calib = config["Dataset"]["Calibration"]
        self.width = int(calib["width"])
        self.height = int(calib["height"])
        self.fx = float(calib["fx"])
        self.fy = float(calib["fy"])
        self.cx = float(calib["cx"])
        self.cy = float(calib["cy"])
        self.depth_scale = float(calib.get("depth_scale", 1.0))
        self.has_depth = bool(calib.get("depth_scale", None))

        self.dist_coeffs = None
        self.map1x = self.map1y = None
        if calib.get("distorted", False):
            import cv2

            self.dist_coeffs = np.array(
                [
                    calib.get("k1", 0.0), calib.get("k2", 0.0),
                    calib.get("p1", 0.0), calib.get("p2", 0.0),
                    calib.get("k3", 0.0),
                ]
            )
            K = self.K_matrix()
            self.map1x, self.map1y = cv2.initUndistortRectifyMap(
                K, self.dist_coeffs, np.eye(3), K,
                (self.width, self.height), cv2.CV_32FC1,
            )

        objects = config["Dataset"].get("Objects", {}) or {}
        self.static_objects_idxs = list(objects.get("static", []) or [])
        self.dynamic_objects_idxs = list(objects.get("dynamic", []) or [])
        self.masked_objects_idxs = list(objects.get("masked", []) or [])
        self.nr_objects = max(
            len(self.static_objects_idxs) + len(self.dynamic_objects_idxs), 1
        )

    def K_matrix(self) -> np.ndarray:
        return np.array(
            [[self.fx, 0, self.cx], [0, self.fy, self.cy], [0, 0, 1]],
            dtype=np.float64,
        )

    @property
    def intrinsics(self) -> Intrinsics:
        return Intrinsics(
            fx=self.fx, fy=self.fy, cx=self.cx, cy=self.cy,
            width=self.width, height=self.height,
        )

    def undistort_rgb(self, rgb: np.ndarray) -> np.ndarray:
        if self.map1x is None:
            return rgb
        import cv2

        return cv2.remap(rgb, self.map1x, self.map1y, cv2.INTER_LINEAR)

    def mask_from_segmentation(self, segmentation: np.ndarray) -> np.ndarray:
        """Pixels of `masked` object ids are excluded from every loss
        (dataset.py semantics for dynamic scenes)."""
        mask = np.ones(segmentation.shape, bool)
        for idx in self.masked_objects_idxs:
            mask &= segmentation != idx
        return mask

    def __len__(self):  # pragma: no cover - abstract
        raise NotImplementedError

    def __getitem__(self, idx: int) -> dict:  # pragma: no cover - abstract
        raise NotImplementedError

class PreloadedDataset:
    """Full in-memory preload wrapper (reference dataset.py:376-394
    `preload` option, which preloads straight to GPU tensors): frames are
    loaded once; with to_device=True the image arrays are placed on the
    default JAX device up front (HBM permitting), so the SLAM loop never
    pays a host->device transfer per frame. Attribute access delegates to
    the wrapped dataset."""

    def __init__(self, dataset, to_device: bool = False):
        self._dataset = dataset
        self._frames = [dataset[i] for i in range(len(dataset))]
        if to_device:
            import jax

            self._frames = [
                {
                    k: jax.device_put(v) if isinstance(v, np.ndarray) else v
                    for k, v in f.items()
                }
                for f in self._frames
            ]

    def __getattr__(self, name):
        return getattr(self._dataset, name)

    def __len__(self):
        return len(self._frames)

    def __getitem__(self, idx: int) -> dict:
        return self._frames[idx]


def maybe_preload(dataset, config: dict):
    """YAML `Dataset.preload`: false | true (host RAM) | "device" (HBM)."""
    mode = config.get("Dataset", {}).get("preload", False)
    if mode:
        return PreloadedDataset(dataset, to_device=mode == "device")
    return dataset
