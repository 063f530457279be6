"""Dataset parsers against generated on-disk fixtures (TUM/Replica layouts
per reference utils/dataset.py; no downloads in the zero-egress rig)."""

import json
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def _write_tum_fixture(root, n=4, w=64, h=48):
    os.makedirs(f"{root}/rgb", exist_ok=True)
    os.makedirs(f"{root}/depth", exist_ok=True)
    rgb_lines, depth_lines, gt_lines = [], ["# depth"], ["# ground truth"]
    rng = np.random.RandomState(0)
    for i in range(n):
        t = 100.0 + i * 0.05
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        cv2.imwrite(f"{root}/rgb/{t:.6f}.png", img)
        depth = (rng.uniform(0.5, 3.0, (h, w)) * 5000).astype(np.uint16)
        cv2.imwrite(f"{root}/depth/{t:.6f}.png", depth)
        rgb_lines.append(f"{t:.6f} rgb/{t:.6f}.png")
        depth_lines.append(f"{t + 0.01:.6f} depth/{t:.6f}.png")
        gt_lines.append(
            f"{t + 0.005:.6f} {0.01 * i:.4f} 0.0 0.0 0.0 0.0 0.0 1.0"
        )
    with open(f"{root}/rgb.txt", "w") as f:
        f.write("# rgb\n" + "\n".join(rgb_lines) + "\n")
    with open(f"{root}/depth.txt", "w") as f:
        f.write("\n".join(depth_lines) + "\n")
    with open(f"{root}/groundtruth.txt", "w") as f:
        f.write("\n".join(gt_lines) + "\n")


def _tum_config(root, w=64, h=48):
    return {
        "Dataset": {
            "type": "tum",
            "dataset_path": root,
            "Calibration": {
                "fx": 50.0, "fy": 50.0, "cx": w / 2, "cy": h / 2,
                "width": w, "height": h, "depth_scale": 5000.0,
                "distorted": False,
            },
        },
    }


def test_tum_parser_roundtrip(tmp_path):
    root = str(tmp_path / "tum")
    _write_tum_fixture(root)
    from monogs_tpu.data import load_dataset

    ds = load_dataset(_tum_config(root))
    assert len(ds) == 4
    d = ds[0]
    assert d["rgb"].shape == (48, 64, 3) and d["rgb"].dtype == np.float32
    assert d["rgb"].max() <= 1.0
    assert d["depth"].shape == (48, 64)
    assert 0.4 < np.median(d["depth"]) < 3.1  # depth_scale applied
    assert d["pose"].shape == (4, 4)
    # w2c translation of frame i is -0.01*i on x (gt is c2w with tx=0.01*i).
    np.testing.assert_allclose(ds[2]["pose"][0, 3], -0.02, atol=1e-5)


def test_tum_preload(tmp_path):
    root = str(tmp_path / "tum")
    _write_tum_fixture(root)
    from monogs_tpu.data import load_dataset

    cfg = _tum_config(root)
    cfg["Dataset"]["preload"] = True
    ds = load_dataset(cfg)
    assert type(ds).__name__ == "PreloadedDataset"
    assert ds[1]["rgb"] is ds[1]["rgb"]  # cached object identity
    assert ds.intrinsics.fx == 50.0      # attribute delegation


def test_tum_preload_device(tmp_path):
    """preload: device places image arrays on the default JAX device
    (reference dataset.py:376-394 preloads to GPU tensors)."""
    import jax

    root = str(tmp_path / "tum")
    _write_tum_fixture(root)
    from monogs_tpu.data import load_dataset

    cfg = _tum_config(root)
    cfg["Dataset"]["preload"] = "device"
    ds = load_dataset(cfg)
    d = ds[0]
    assert isinstance(d["rgb"], jax.Array)
    assert isinstance(d["pose"], jax.Array)
    np.testing.assert_allclose(
        np.asarray(ds[2]["pose"])[0, 3], -0.02, atol=1e-5
    )


def test_frame_prefetcher_matches_sync():
    """The prefetcher returns identical frames in sequential and random
    access patterns, bounded pending set."""
    from monogs_tpu.slam.system import _FramePrefetcher

    loads = []

    def load(i):
        if i >= 10:
            raise IndexError(i)
        loads.append(i)
        return {"idx": i}

    pf = _FramePrefetcher(load)
    for i in range(10):
        assert pf.get(i)["idx"] == i
    # Random access (refinement pattern) still yields correct frames.
    for i in [3, 7, 1, 9, 0, 5]:
        assert pf.get(i)["idx"] == i
    assert len(pf._pending) <= 4


def _write_replica_fixture(root, n=3, w=64, h=48):
    os.makedirs(f"{root}/results", exist_ok=True)
    rng = np.random.RandomState(1)
    trajs = []
    for i in range(n):
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        cv2.imwrite(f"{root}/results/frame{i:06d}.jpg", img)
        depth = (rng.uniform(0.5, 3.0, (h, w)) * 6553.5).astype(np.uint16)
        cv2.imwrite(f"{root}/results/depth{i:06d}.png", depth)
        T = np.eye(4)
        T[0, 3] = 0.02 * i  # c2w
        trajs.append(" ".join(str(x) for x in T.reshape(-1)))
    with open(f"{root}/traj.txt", "w") as f:
        f.write("\n".join(trajs) + "\n")


def test_replica_parser(tmp_path):
    root = str(tmp_path / "replica")
    _write_replica_fixture(root)
    from monogs_tpu.data import load_dataset

    ds = load_dataset({
        "Dataset": {
            "type": "replica",
            "dataset_path": root,
            "Calibration": {
                "fx": 50.0, "fy": 50.0, "cx": 32.0, "cy": 24.0,
                "width": 64, "height": 48, "depth_scale": 6553.5,
            },
        },
    })
    assert len(ds) == 3
    d = ds[1]
    assert d["rgb"].shape == (48, 64, 3)
    assert 0.4 < np.median(d["depth"]) < 3.1
    np.testing.assert_allclose(d["pose"][0, 3], -0.02, atol=1e-6)  # inv(c2w)


def test_slam_runs_on_tum_fixture(tmp_path):
    """Two-frame SLAM on the parsed TUM fixture (parser -> pipeline glue)."""
    root = str(tmp_path / "tum")
    _write_tum_fixture(root)
    from monogs_tpu.data import load_dataset
    from monogs_tpu.slam.keyframes import KeyframeConfig
    from monogs_tpu.slam.mapper import MapperConfig
    from monogs_tpu.slam.system import SLAM
    from monogs_tpu.slam.tracker import TrackerConfig
    from monogs_tpu.utils.config import SystemConfig

    ds = load_dataset(_tum_config(root))
    slam = SLAM(
        ds,
        tracker_config=TrackerConfig(tile_size=16, max_iters=5, tile_capacity=128,
                                     max_dup=16, backend="ref",
                                     opacity_threshold=0.5),
        mapper_config=MapperConfig(tile_size=16, init_itr_num=10, iters_per_kf=4,
                                   gaussian_update_every=1000, window_size=3,
                                   prune_coviz=1, tile_capacity=128,
                                   max_dup=16, backend="ref"),
        keyframe_config=KeyframeConfig(window_size=3),
        system_config=SystemConfig(map_capacity=4096, capacity_headroom=256,
                                   eval_every=0),
    )
    slam.process_frame(0)
    slam.process_frame(1)
    assert int(slam.state.gmap.num_active) > 10
    assert 1 in slam.est_poses
