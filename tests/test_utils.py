"""Config loading, PLY I/O, eval math, losses, SH, viewer plumbing."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monogs_tpu.ops import losses, sh
from monogs_tpu.utils.config import load_config
from monogs_tpu.utils.eval import ate_rmse, pose_w2c_to_c2w, umeyama_alignment
from monogs_tpu.utils.ply import load_ply, save_ply


def test_config_inherit_chain(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text("A:\n  x: 1\n  y: 2\nB: 3\n")
    child = tmp_path / "child.yaml"
    child.write_text(f"inherit_from: \"{base}\"\nA:\n  y: 9\nC: 4\n")
    cfg = load_config(str(child))
    assert cfg["A"] == {"x": 1, "y": 9}
    assert cfg["B"] == 3 and cfg["C"] == 4


def test_repo_configs_load():
    for path in [
        "configs/rgbd/tum/fr3_office.yaml",
        "configs/rgbd/replica/office0.yaml",
        "configs/mono/tum/fr3_office.yaml",
        "configs/stereo/euroc/mh02.yaml",
        "configs/mono/kubric/dynamic.yaml",
        "configs/mono/davis/car-turn.yaml",
        "configs/synthetic/test.yaml",
    ]:
        cfg = load_config(path)
        assert cfg["Training"]["init_itr_num"] > 0
        assert "Calibration" in cfg["Dataset"], path

    from monogs_tpu.utils.config import (
        build_keyframe_config,
        build_mapper_config,
        build_system_config,
        build_tracker_config,
    )

    cfg = load_config("configs/rgbd/tum/fr3_office.yaml")
    t = build_tracker_config(cfg)
    m = build_mapper_config(cfg)
    assert t.max_iters == 100
    assert m.gaussian_update_every == 150
    assert build_keyframe_config(cfg).window_size == 8
    assert build_system_config(cfg).map_capacity == 131072


def test_ply_roundtrip(tmp_path):
    n = 17
    rng = np.random.RandomState(0)
    args = dict(
        xyz=rng.randn(n, 3), rgb=rng.rand(n, 3), opacity_logit=rng.randn(n),
        log_scales=rng.randn(n, 3), quats=rng.randn(n, 4),
    )
    path = str(tmp_path / "x.ply")
    save_ply(path, **args)
    out = load_ply(path)
    for k in args:
        np.testing.assert_allclose(
            out[k].reshape(np.asarray(args[k]).shape), args[k], rtol=1e-6
        )


def test_umeyama_recovers_similarity():
    rng = np.random.RandomState(1)
    src = rng.randn(50, 3)
    from monogs_tpu.ops import lie

    R_true = np.asarray(lie.so3_exp(jnp.array([0.2, -0.4, 0.1])))
    t_true = np.array([1.0, -2.0, 0.5])
    s_true = 1.7
    dst = (s_true * (R_true @ src.T)).T + t_true
    s, R, t = umeyama_alignment(src, dst, with_scale=True)
    np.testing.assert_allclose(s, s_true, rtol=1e-6)
    np.testing.assert_allclose(R, R_true, atol=1e-6)
    np.testing.assert_allclose(t, t_true, atol=1e-6)


def test_ate_zero_for_identical():
    Ts = [np.eye(4) for _ in range(5)]
    for i, T in enumerate(Ts):
        T[0, 3] = i
    assert ate_rmse(Ts, Ts) == 0.0


def test_ssim_perfect_and_degraded():
    img = jax.random.uniform(jax.random.PRNGKey(0), (32, 32, 3))
    assert float(losses.ssim(img, img)) > 0.999
    noisy = jnp.clip(img + 0.3 * jax.random.normal(jax.random.PRNGKey(1), img.shape), 0, 1)
    assert float(losses.ssim(img, noisy)) < 0.9


def test_psnr_known_value():
    a = jnp.zeros((8, 8, 3))
    b = jnp.full((8, 8, 3), 0.1)
    np.testing.assert_allclose(float(losses.psnr(a, b)), 20.0, atol=1e-3)


def test_sh_degree0_matches_c0():
    sh_coeffs = jnp.ones((5, 3, 1))
    dirs = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (5, 1))
    out = sh.eval_sh(0, sh_coeffs, dirs)
    np.testing.assert_allclose(out, sh.C0, rtol=1e-6)
    rgb = jnp.array([[0.2, 0.5, 0.8]])
    np.testing.assert_allclose(sh.sh_to_rgb(sh.rgb_to_sh(rgb)), rgb, rtol=1e-6)


def test_grad_mask_marks_edges():
    # Both sides above the validity eps (0.01) — near-black pixels are
    # excluded by image_gradient_mask, matching reference slam_utils.py:26.
    img = jnp.full((32, 32, 3), 0.3).at[:, 16:, :].set(0.7)
    mask = losses.compute_grad_mask(img)
    assert bool(mask[8, 16]) or bool(mask[8, 15])
    assert not bool(mask[8, 4])


def test_median_depth_ignores_invalid():
    d = jnp.array([[0.0, 2.0], [4.0, 0.0]])
    np.testing.assert_allclose(float(losses.get_median_depth(d)), 3.0)


def test_viewer_packets_latest_slot():
    from monogs_tpu.viewer.packets import LatestSlot

    s = LatestSlot()
    assert s.get() is None
    s.put(1)
    s.put(2)
    assert s.get() == 2


def test_probe_derived_entry_capacity_and_bump():
    """SLAM derives entry_capacity from the init-frame occupancy probe when
    configs leave it None, and raises it on overflow (VERDICT r1 #7)."""
    import jax.numpy as jnp

    from monogs_tpu.data.synthetic import SyntheticDataset
    from monogs_tpu.ops.binning import SLAB
    from monogs_tpu.slam.keyframes import KeyframeConfig
    from monogs_tpu.slam.mapper import MapperConfig
    from monogs_tpu.slam.system import SLAM
    from monogs_tpu.slam.tracker import TrackerConfig
    from monogs_tpu.utils.config import SystemConfig

    cfg = {
        "Dataset": {
            "type": "synthetic",
            "Calibration": {
                "width": 64, "height": 48,
                "fx": 50.0, "fy": 50.0, "cx": 32.0, "cy": 24.0,
                "depth_scale": 1.0,
            },
            "Objects": {"static": [0], "dynamic": [], "masked": []},
            "synthetic": {"n_frames": 2, "n_gaussians": 400, "seed": 3,
                          "motion_scale": 0.008},
        },
    }
    ds = SyntheticDataset(cfg)
    slam = SLAM(
        ds,
        tracker_config=TrackerConfig(tile_size=16, max_iters=4,
                                     tile_capacity=128, max_dup=8,
                                     backend="ref", opacity_threshold=0.5),
        mapper_config=MapperConfig(tile_size=16, init_itr_num=4,
                                   iters_per_kf=2, gaussian_update_every=1000,
                                   window_size=3, tile_capacity=128, max_dup=8,
                                   backend="ref"),
        keyframe_config=KeyframeConfig(window_size=3),
        system_config=SystemConfig(map_capacity=2048, capacity_headroom=128,
                                   eval_every=0),
    )
    assert slam.tcfg.entry_capacity is None
    slam.process_frame(0)
    cap = slam.tcfg.entry_capacity
    assert cap is not None and cap % SLAB == 0 and cap >= SLAB
    assert slam.mcfg.entry_capacity is not None

    # Overflow backstop: small overflow is ignored, large overflow bumps.
    slam._bump_entry_capacity(3)
    assert slam.tcfg.entry_capacity == cap
    slam._bump_entry_capacity(10**6)
    bumped = slam.tcfg.entry_capacity
    # Either raised 1.5x (SLAB-rounded) or already clamped at the safe auto.
    assert bumped >= cap and bumped % SLAB == 0
    if bumped == cap:
        from monogs_tpu.ops.binning import auto_entry_capacity

        tiles = 4 * 3
        assert cap == auto_entry_capacity(
            slam.state.gmap.capacity, slam.tcfg.max_dup, tiles,
            slam.tcfg.tile_capacity,
        )


def test_const_velocity_init_exact_on_constant_motion():
    """SE(3) extrapolation reproduces the next pose exactly for a constant
    rigid motion (TrackerConfig.const_velocity; reference slam_tracker.py
    :92-100 has this commented out)."""
    import numpy as np

    from monogs_tpu.slam.system import const_velocity_init

    rng = np.random.RandomState(0)

    def rot(ax, angle):
        ax = ax / np.linalg.norm(ax)
        K = np.array([[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]],
                      [-ax[1], ax[0], 0]])
        return np.eye(3) + np.sin(angle) * K + (1 - np.cos(angle)) * K @ K

    R_step = rot(rng.randn(3), 0.05)
    t_step = rng.randn(3) * 0.02
    T_step = np.eye(4)
    T_step[:3, :3], T_step[:3, 3] = R_step, t_step
    T0 = np.eye(4)
    T0[:3, :3], T0[:3, 3] = rot(rng.randn(3), 0.7), rng.randn(3)
    T1 = T_step @ T0
    T2 = T_step @ T1
    R, t = const_velocity_init(
        (T1[:3, :3], T1[:3, 3]), (T0[:3, :3], T0[:3, 3])
    )
    np.testing.assert_allclose(R, T2[:3, :3], atol=1e-12)
    np.testing.assert_allclose(t, T2[:3, 3], atol=1e-12)
