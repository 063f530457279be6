"""Viewer packets: snapshots the SLAM loop pushes to the viewer.

Counterpart of reference viewer/viewer_packet.py:10-166 (MainToViewerPacket)
and viewer/gui_utils.py:114-117 (ViewerToMainPacket). Because JAX arrays are
immutable, a "packet" is just references — no detach/clone/downscale
machinery is needed; the viewer thread renders from the shared snapshot
whenever it likes.
"""

from __future__ import annotations

import dataclasses
import threading
from typing import Any


@dataclasses.dataclass
class MainToViewerPacket:
    """Latest-state snapshot (reference viewer_packet.py:10-59)."""

    params: dict | None = None          # GaussianMap params (activated lazily)
    active: Any = None
    kf_idx: Any = None                  # (C,) creating keyframe per Gaussian
    obj_prob: Any = None
    intrinsics: Any = None
    cur_frame_idx: int = 0
    cur_pose: tuple | None = None       # (R, t) current frame
    gt_pose: tuple | None = None
    kf_poses: dict | None = None        # idx -> (R, t) window keyframes
    gt_rgb: Any = None                  # current input frame (H,W,3)
    gt_depth: Any = None
    gt_segmentation: Any = None
    finish: bool = False


@dataclasses.dataclass
class ViewerToMainPacket:
    """User control state (reference gui_utils.py:114-117)."""

    paused: bool = False


class LatestSlot:
    """Single-slot 'queue' that keeps only the newest packet — the behavior
    of get_latest_queue (reference gui_utils.py:100-111) without a backlog."""

    def __init__(self):
        self._lock = threading.Lock()
        self._value = None

    def put(self, value):
        with self._lock:
            self._value = value

    def get(self):
        with self._lock:
            return self._value
