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


def _write_euroc_fixture(root, n=3, w=192, h=96, disp=8):
    """EuRoC mav0 layout (reference dataset.py:218-283): cam0/cam1 png
    streams named by timestamp + state_groundtruth CSV. The right image is
    the left shifted `disp` px so SGBM recovers a known disparity."""
    os.makedirs(f"{root}/mav0/cam0/data", exist_ok=True)
    os.makedirs(f"{root}/mav0/cam1/data", exist_ok=True)
    os.makedirs(f"{root}/mav0/state_groundtruth_estimate0", exist_ok=True)
    rng = np.random.RandomState(7)
    # Lightly smoothed random texture: SGBM block matching needs structure.
    base = cv2.GaussianBlur(
        (rng.rand(h, w + disp) * 255).astype(np.uint8), (0, 0), 1.0
    )
    rows = ["#timestamp, p_x, p_y, p_z, q_w, q_x, q_y, q_z, ..."]
    for i in range(n):
        ts = 1000000 + i * 50000
        # Same scene content at x_right = x_left - disp (positive disparity).
        left = base[:, :-disp]
        right = base[:, disp:]
        cv2.imwrite(f"{root}/mav0/cam0/data/{ts}.png", left)
        cv2.imwrite(f"{root}/mav0/cam1/data/{ts}.png", right)
        rows.append(
            f"{ts},{0.01 * i},0.0,0.0,1.0,0.0,0.0,0.0,0,0,0,0,0,0,0,0"
        )
    with open(f"{root}/mav0/state_groundtruth_estimate0/data.csv", "w") as f:
        f.write("\n".join(rows) + "\n")


def _euroc_config(root, w=192, h=96):
    cam = {"fx": 80.0, "fy": 80.0, "cx": w / 2, "cy": h / 2}
    raw = dict(cam, k1=0.0, k2=0.0, p1=0.0, p2=0.0, k3=0.0)
    eye = {"data": [1.0, 0, 0, 0, 1.0, 0, 0, 0, 1.0]}
    return {
        "Dataset": {
            "type": "euroc",
            "dataset_path": root,
            "Calibration": {
                "width": w, "height": h, "depth_scale": 1.0,
                "cam0": {"raw": raw, "opt": dict(cam), "R": eye},
                "cam1": {"raw": raw, "opt": dict(cam), "R": eye},
            },
        },
    }


def test_euroc_parser_sgbm_depth(tmp_path):
    """Rectification + SGBM stereo path (data/euroc.py:117-144,
    reference dataset.py:571-616): the synthetic pair's constant disparity
    must come back as depth ~= BF / disp."""
    root = str(tmp_path / "euroc")
    _write_euroc_fixture(root, disp=8)
    from monogs_tpu.data import load_dataset
    from monogs_tpu.data.euroc import BF

    ds = load_dataset(_euroc_config(root))
    assert len(ds) == 3
    d = ds[0]
    assert d["rgb"].shape == (96, 192, 3) and d["rgb"].dtype == np.float32
    assert d["depth"].shape == (96, 192)
    expected = BF / 8.0
    valid = d["depth"] > 0
    assert valid.mean() > 0.2, "SGBM produced almost no valid disparity"
    med = np.median(d["depth"][valid])
    assert abs(med - expected) / expected < 0.25, (med, expected)
    # w2c pose: gt c2w body translation 0.01*i through T_I_C0.
    assert d["pose"].shape == (4, 4)
    assert not np.allclose(ds[2]["pose"][:3, 3], ds[0]["pose"][:3, 3])


def test_slam_step_on_euroc_fixture(tmp_path):
    """The stereo path must feed the SLAM pipeline (BASELINE config 5's
    sensor mode): init + one tracked frame on the SGBM depth."""
    root = str(tmp_path / "euroc")
    _write_euroc_fixture(root)
    from monogs_tpu.data import load_dataset
    from monogs_tpu.slam.keyframes import KeyframeConfig
    from monogs_tpu.slam.mapper import MapperConfig
    from monogs_tpu.slam.system import SLAM
    from monogs_tpu.slam.tracker import TrackerConfig
    from monogs_tpu.utils.config import SystemConfig

    ds = load_dataset(_euroc_config(root))
    slam = SLAM(
        ds,
        tracker_config=TrackerConfig(tile_size=16, max_iters=4,
                                     tile_capacity=128, max_dup=16,
                                     backend="ref", opacity_threshold=0.5),
        mapper_config=MapperConfig(tile_size=16, init_itr_num=8,
                                   iters_per_kf=3, gaussian_update_every=1000,
                                   window_size=3, prune_coviz=1,
                                   tile_capacity=128, max_dup=16,
                                   backend="ref"),
        keyframe_config=KeyframeConfig(window_size=3),
        system_config=SystemConfig(map_capacity=4096, capacity_headroom=256,
                                   eval_every=0),
    )
    slam.process_frame(0)
    slam.process_frame(1)
    assert int(slam.state.gmap.num_active) > 10
    assert 1 in slam.est_poses


def _write_kubric_fixture(root, n=3, w=64, h=48):
    """Kubric layout (reference dataset.py:24-79): metadata.json camera +
    rgba/*.png + depth/*.tiff + segmentation/*.png."""
    for sub in ("rgba", "depth", "segmentation"):
        os.makedirs(f"{root}/{sub}", exist_ok=True)
    rng = np.random.RandomState(2)
    positions, quaternions = [], []
    for i in range(n):
        rgba = (rng.rand(h, w, 4) * 255).astype(np.uint8)
        cv2.imwrite(f"{root}/rgba/rgba_{i:05d}.png", rgba)
        depth = rng.uniform(0.5, 3.0, (h, w)).astype(np.float32)
        cv2.imwrite(f"{root}/depth/depth_{i:05d}.tiff", depth)
        seg = np.zeros((h, w), np.uint8)
        seg[h // 2:, :] = 1  # object id 1 in the lower half
        cv2.imwrite(f"{root}/segmentation/segmentation_{i:05d}.png", seg)
        positions.append([0.02 * i, 0.0, 0.0])
        quaternions.append([1.0, 0.0, 0.0, 0.0])
    with open(f"{root}/metadata.json", "w") as f:
        json.dump(
            {"camera": {"positions": positions, "quaternions": quaternions}}, f
        )


def test_kubric_parser(tmp_path):
    root = str(tmp_path / "kubric")
    _write_kubric_fixture(root)
    from monogs_tpu.data import load_dataset

    ds = load_dataset({
        "Dataset": {
            "type": "kubric",
            "dataset_path": root,
            "Calibration": {
                "fx": 50.0, "fy": 50.0, "cx": 32.0, "cy": 24.0,
                "width": 64, "height": 48, "depth_scale": 1.0,
            },
            "Objects": {"static": [0], "dynamic": [1], "masked": [1]},
        },
    })
    assert len(ds) == 3
    d = ds[1]
    assert d["rgb"].shape == (48, 64, 3) and d["rgb"].max() <= 1.0
    assert d["depth"].shape == (48, 64)
    assert 0.4 < np.median(d["depth"]) < 3.1
    assert d["segmentation"].dtype == np.int32
    assert set(np.unique(d["segmentation"])) == {0, 1}
    # masked object id 1 excluded from the loss mask.
    assert not d["mask"][40, 10] and d["mask"][5, 10]
    # OpenGL-flip pose convention: c2w x-translation inverts in w2c.
    np.testing.assert_allclose(d["pose"][0, 3], -0.02, atol=1e-6)
    assert ds.nr_objects == 2


def _write_davis_fixture(root, n=3, w=64, h=48):
    os.makedirs(f"{root}/rgb", exist_ok=True)
    os.makedirs(f"{root}/segmentation", exist_ok=True)
    rng = np.random.RandomState(3)
    for i in range(n):
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        cv2.imwrite(f"{root}/rgb/{i:05d}.jpg", img)
        seg = np.zeros((h, w), np.uint8)
        seg[:, : w // 2] = 2
        cv2.imwrite(f"{root}/segmentation/{i:05d}.png", seg)


def test_davis_parser(tmp_path):
    root = str(tmp_path / "davis")
    _write_davis_fixture(root)
    from monogs_tpu.data import load_dataset

    ds = load_dataset({
        "Dataset": {
            "type": "davis",
            "dataset_path": root,
            "Calibration": {
                "fx": 50.0, "fy": 50.0, "cx": 32.0, "cy": 24.0,
                "width": 64, "height": 48,
            },
            "Objects": {"static": [0], "dynamic": [2], "masked": [2]},
        },
    })
    assert len(ds) == 3
    d = ds[0]
    assert d["rgb"].shape == (48, 64, 3)
    assert d["depth"] is None  # monocular, no sensor depth
    np.testing.assert_allclose(d["pose"], np.eye(4))  # no gt trajectory
    assert not d["mask"][10, 5] and d["mask"][10, 60]


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


# --- synthetic stereo (BASELINE config 5 sensor mode, zero-egress rig) ----


def _synth_stereo_config(tmp_cache, baseline=0.25):
    return {
        "Dataset": {
            "type": "synthetic",
            "sensor_type": "stereo",
            "Calibration": {
                "width": 160, "height": 120,
                "fx": 120.0, "fy": 120.0, "cx": 80.0, "cy": 60.0,
                "depth_scale": 1.0,
            },
            "Objects": {"static": [0], "dynamic": [], "masked": []},
            "synthetic": {
                "n_frames": 4, "n_gaussians": 2000, "seed": 3,
                "motion_scale": 0.01, "render_tile_capacity": 512,
                "stereo": {
                    "baseline": baseline, "num_disparities": 32,
                    "block_size": 9, "uniqueness_ratio": 10,
                },
            },
        },
    }


def test_synthetic_stereo_sgbm_depth(tmp_path, monkeypatch):
    """Full stereo sensor path on the synthetic rig (reference
    dataset.py:571-616 semantics without EuRoC assets): rectify-remap both
    eyes, SGBM disparity, depth = fx*b/disp — recovered depth must agree
    with the GT depth render where SGBM reports valid disparity."""
    monkeypatch.setenv("MONOGS_SYNTH_CACHE_DIR", str(tmp_path / "cache"))
    from monogs_tpu.data import load_dataset
    from monogs_tpu.data.synthetic import SyntheticDataset

    cfg = _synth_stereo_config(tmp_path)
    ds = load_dataset(cfg)
    d = ds[0]
    assert d["rgb"].shape == (120, 160, 3)
    assert d["depth"].shape == (120, 160)
    valid = d["depth"] > 0
    assert valid.mean() > 0.25, (
        f"SGBM matched only {valid.mean():.0%} of pixels")

    # GT depth from the mono dataset over the identical scene/trajectory.
    mono_cfg = {"Dataset": dict(cfg["Dataset"])}
    mono_cfg["Dataset"].pop("sensor_type")
    gt = SyntheticDataset(mono_cfg)[0]
    both = valid & (gt["depth"] > 0)
    rel = np.abs(d["depth"][both] - gt["depth"][both]) / gt["depth"][both]
    # SGBM quantizes at 1/16 px: at fx*b=30 px*m and z~2.5 m, one
    # quantum is ~1.3% depth; median must land well inside match noise.
    assert np.median(rel) < 0.08, f"median stereo depth error {np.median(rel):.3f}"


def test_slam_on_synthetic_stereo(tmp_path, monkeypatch):
    """SGBM-derived depth must drive the SLAM pipeline end-to-end (init +
    tracked frames), mirroring test_slam_step_on_euroc_fixture but with
    depth from the real stereo matcher, not a constant-disparity card."""
    monkeypatch.setenv("MONOGS_SYNTH_CACHE_DIR", str(tmp_path / "cache"))
    from monogs_tpu.data import load_dataset
    from monogs_tpu.slam.keyframes import KeyframeConfig
    from monogs_tpu.slam.mapper import MapperConfig
    from monogs_tpu.slam.system import SLAM
    from monogs_tpu.slam.tracker import TrackerConfig
    from monogs_tpu.utils.config import SystemConfig

    ds = load_dataset(_synth_stereo_config(tmp_path))
    slam = SLAM(
        ds,
        tracker_config=TrackerConfig(tile_size=16, max_iters=6,
                                     tile_capacity=256, max_dup=16,
                                     backend="ref", opacity_threshold=0.5),
        mapper_config=MapperConfig(tile_size=16, init_itr_num=10,
                                   iters_per_kf=4, gaussian_update_every=1000,
                                   window_size=3, prune_coviz=1,
                                   tile_capacity=256, max_dup=16,
                                   backend="ref"),
        keyframe_config=KeyframeConfig(window_size=3),
        system_config=SystemConfig(map_capacity=8192, capacity_headroom=512,
                                   eval_every=0),
    )
    slam.process_frame(0)
    slam.process_frame(1)
    assert int(slam.state.gmap.num_active) > 10
    assert 1 in slam.est_poses
