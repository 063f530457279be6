"""Async tracker ∥ mapper mode: equivalent quality, no deadlock on failure."""

import numpy as np

from monogs_tpu.data.synthetic import SyntheticDataset
from monogs_tpu.slam.keyframes import KeyframeConfig
from monogs_tpu.slam.mapper import MapperConfig
from monogs_tpu.slam.system import SLAM
from monogs_tpu.slam.tracker import TrackerConfig
from monogs_tpu.utils.config import SystemConfig

CFG = {
    "Dataset": {
        "type": "synthetic",
        "Calibration": {
            "width": 64, "height": 48,
            "fx": 50.0, "fy": 50.0, "cx": 32.0, "cy": 24.0,
            "depth_scale": 1.0,
        },
        "Objects": {"static": [0], "dynamic": [], "masked": []},
        "synthetic": {"n_frames": 6, "n_gaussians": 500, "seed": 5,
                      "motion_scale": 0.008},
    },
}


def test_async_mode_tracks():
    ds = SyntheticDataset(CFG)
    slam = SLAM(
        ds,
        tracker_config=TrackerConfig(tile_size=16, max_iters=15, tile_capacity=128,
                                     max_dup=16, backend="ref",
                                     opacity_threshold=0.5),
        mapper_config=MapperConfig(tile_size=16, init_itr_num=40, init_gaussian_update=20,
                                   init_gaussian_reset=100, iters_per_kf=8,
                                   gaussian_update_every=1000, window_size=3,
                                   prune_coviz=1, tile_capacity=128,
                                   max_dup=16, backend="ref"),
        keyframe_config=KeyframeConfig(window_size=3),
        system_config=SystemConfig(map_capacity=4096, capacity_headroom=256),
    )
    rmse = slam.run_async()
    assert np.isfinite(rmse)
    # Tracking must beat a static camera by a wide margin.
    motions = sum(
        np.linalg.norm(
            np.asarray(slam.gt_poses[i][1]) - np.asarray(slam.gt_poses[i - 1][1])
        )
        for i in range(1, len(slam.gt_poses))
    )
    # Async tracking races ahead of mapping with tiny test budgets, so the
    # bound is looser than the synchronous e2e test's.
    assert rmse < 2.0 * motions
    assert int(slam.state.gmap.num_active) > 50


def test_async_mapper_failure_propagates():
    ds = SyntheticDataset(CFG)
    slam = SLAM(
        ds,
        tracker_config=TrackerConfig(tile_size=16, max_iters=5, tile_capacity=128,
                                     max_dup=16, backend="ref",
                                     opacity_threshold=0.5),
        mapper_config=MapperConfig(tile_size=16, init_itr_num=10, iters_per_kf=2,
                                   gaussian_update_every=1000, window_size=3,
                                   tile_capacity=128, max_dup=16,
                                   backend="ref"),
        keyframe_config=KeyframeConfig(window_size=3),
        system_config=SystemConfig(map_capacity=2048, capacity_headroom=128),
    )

    def boom(*a, **k):
        raise ValueError("injected mapper fault")

    slam.handle_keyframe = boom
    import pytest

    with pytest.raises(RuntimeError, match="mapper thread failed"):
        slam.run_async()
