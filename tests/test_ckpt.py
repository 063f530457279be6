"""Checkpoint/resume of the full SLAM state (SURVEY.md §5 upgrade: the
reference has PLY-only persistence with no resume path)."""

import jax.numpy as jnp
import numpy as np

from monogs_tpu.data.synthetic import SyntheticDataset
from monogs_tpu.slam.keyframes import KeyframeConfig
from monogs_tpu.slam.mapper import MapperConfig
from monogs_tpu.slam.system import SLAM
from monogs_tpu.slam.tracker import TrackerConfig
from monogs_tpu.utils.ckpt import load_checkpoint, save_checkpoint
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
        "synthetic": {"n_frames": 3, "n_gaussians": 400, "seed": 1,
                      "motion_scale": 0.008},
    },
}


def _make_slam():
    ds = SyntheticDataset(CFG)
    return SLAM(
        ds,
        tracker_config=TrackerConfig(tile_size=16, max_iters=10, tile_capacity=128,
                                     max_dup=16, backend="ref",
                                     opacity_threshold=0.5),
        mapper_config=MapperConfig(tile_size=16, init_itr_num=20, init_gaussian_update=10,
                                   init_gaussian_reset=100, iters_per_kf=5,
                                   window_size=3, tile_capacity=128,
                                   max_dup=16, backend="ref"),
        keyframe_config=KeyframeConfig(window_size=3),
        system_config=SystemConfig(map_capacity=4096, capacity_headroom=256),
    )


def test_checkpoint_roundtrip(tmp_path):
    slam = _make_slam()
    slam.process_frame(0)
    slam.process_frame(1)
    save_checkpoint(str(tmp_path / "ckpt"), slam)

    slam2 = _make_slam()
    slam2.process_frame(0)  # construct state pytree structure
    load_checkpoint(str(tmp_path / "ckpt"), slam2)

    assert slam2.kf_list == slam.kf_list
    assert int(slam2.state.gmap.num_active) == int(slam.state.gmap.num_active)
    np.testing.assert_allclose(
        np.asarray(slam2.state.gmap.params["xyz"]),
        np.asarray(slam.state.gmap.params["xyz"]),
    )
    np.testing.assert_allclose(
        np.asarray(slam2.state.adam.mu["xyz"]),
        np.asarray(slam.state.adam.mu["xyz"]),
    )
    assert set(slam2.est_poses) == set(slam.est_poses)

    # Resumed run continues identically to an uninterrupted one.
    slam.process_frame(2)
    slam2.process_frame(2)
    np.testing.assert_allclose(
        np.asarray(slam2.est_poses[2][1]), np.asarray(slam.est_poses[2][1]),
        atol=1e-5,
    )
