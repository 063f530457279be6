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


def test_async_checkpoint_cold_resume(tmp_path):
    """Async-mode checkpointing (VERDICT r3 weak #5): _maybe_checkpoint
    fires on the tracker thread while the mapper thread concurrently swaps
    self.state — safe because each swap is an atomic reference to an
    immutable pytree, but previously untested. Checkpoint mid-async-run,
    COLD-restore into a fresh SLAM (state template rebuilt from metadata,
    the slam.py --resume path), continue the remaining frames async, and
    assert the stitched trajectory is consistent."""
    import copy

    cfg = copy.deepcopy(CFG)
    cfg["Dataset"]["synthetic"] = dict(
        cfg["Dataset"]["synthetic"], n_frames=6)

    def make(save_dir=None, ckpt_every=0):
        ds = SyntheticDataset(cfg)
        slam = SLAM(
            ds,
            tracker_config=TrackerConfig(tile_size=16, max_iters=10,
                                         tile_capacity=128, max_dup=16,
                                         backend="ref",
                                         opacity_threshold=0.5),
            mapper_config=MapperConfig(tile_size=16, init_itr_num=20,
                                       init_gaussian_update=10,
                                       init_gaussian_reset=100,
                                       iters_per_kf=5, window_size=3,
                                       # window 3 with the default
                                       # prune_coviz 3 is the tautological
                                       # prune that wipes the map
                                       # (_safe_prune_coviz note).
                                       prune_coviz=1,
                                       tile_capacity=128, max_dup=16,
                                       backend="ref"),
            keyframe_config=KeyframeConfig(window_size=3, kf_interval=1),
            system_config=SystemConfig(map_capacity=4096,
                                       capacity_headroom=256),
        )
        if save_dir is not None:
            slam.scfg.save_dir = save_dir
            slam.scfg.ckpt_every = ckpt_every
        return slam

    slam = make(save_dir=str(tmp_path / "run"), ckpt_every=2)
    slam.run_async(n_frames=4)
    ckpt_dir = str(tmp_path / "run" / "ckpt")
    import os

    assert os.path.isdir(ckpt_dir), "async run never checkpointed"

    # Cold restore: fresh SLAM, state is None until load_checkpoint
    # rebuilds the template from checkpoint metadata + dataset frame 0.
    slam2 = make()
    assert slam2.state is None
    load_checkpoint(ckpt_dir, slam2)
    resume_at = max(slam2.est_poses) + 1
    assert 1 <= resume_at <= 4
    rmse = slam2.run_async(n_frames=6, start_frame=resume_at)

    # The stitched trajectory covers every frame and stays coherent —
    # a corrupt restored map/window would blow tracking up immediately.
    assert set(slam2.est_poses) == set(range(6))
    assert rmse < 0.05, f"resumed-run ATE {rmse}"
    assert int(slam2.state.gmap.num_active) > 100
