"""Web viewer: HTTP surface served over a live SLAM instance."""

import urllib.request

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
        "synthetic": {"n_frames": 3, "n_gaussians": 300, "seed": 9,
                      "motion_scale": 0.008},
    },
}


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def test_viewer_serves_pages_and_renders(tmp_path):
    ds = SyntheticDataset(CFG)
    slam = SLAM(
        ds,
        tracker_config=TrackerConfig(tile_size=16, max_iters=5,
                                     tile_capacity=128, max_dup=16,
                                     backend="ref", opacity_threshold=0.5),
        mapper_config=MapperConfig(tile_size=16, init_itr_num=10,
                                   iters_per_kf=2, gaussian_update_every=1000,
                                   window_size=3, prune_coviz=1,
                                   tile_capacity=128, max_dup=16,
                                   backend="ref"),
        keyframe_config=KeyframeConfig(window_size=3),
        system_config=SystemConfig(map_capacity=2048, capacity_headroom=128,
                                   eval_every=0, save_dir=str(tmp_path)),
    )
    viewer = slam.start_viewer(port=18899)
    try:
        slam.process_frame(0)
        slam.process_frame(1)

        code, ctype, body = _get("http://127.0.0.1:18899/")
        assert code == 200 and b"monogs_tpu viewer" in body

        code, ctype, body = _get("http://127.0.0.1:18899/state")
        assert code == 200 and b"frame" in body

        for shader in ["rgb", "depth", "segmentation", "time", "ellipsoids"]:
            code, ctype, body = _get(
                f"http://127.0.0.1:18899/render?follow=1&shader={shader}"
            )
            assert code == 200 and ctype == "image/png", shader
            assert body[:8] == b"\x89PNG\r\n\x1a\n", shader
            assert len(body) > 500, shader  # an actual rendered image

        code, ctype, body = _get("http://127.0.0.1:18899/input")
        assert code == 200 and body[:8] == b"\x89PNG\r\n\x1a\n"

        # Per-KF view select + full-res screenshot (VERDICT r1 #9;
        # reference slam_viewer.py:226-278).
        import json as _json
        import os

        code, _, body = _get("http://127.0.0.1:18899/state")
        st = _json.loads(body)
        assert st["kfs"], st
        kf0 = st["kfs"][0]
        code, ctype, body = _get(
            f"http://127.0.0.1:18899/render?kf={kf0}&shader=rgb"
        )
        assert code == 200 and body[:8] == b"\x89PNG\r\n\x1a\n"
        code, _, body = _get(
            f"http://127.0.0.1:18899/screenshot?kf={kf0}&shader=rgb"
        )
        shot = _json.loads(body)["path"]
        assert os.path.exists(shot) and os.path.getsize(shot) > 500

        # Pause relay (ViewerToMainPacket counterpart).
        _get("http://127.0.0.1:18899/pause?on=1")
        assert viewer.paused
        _get("http://127.0.0.1:18899/pause?on=0")
        assert not viewer.paused

        import pytest

        with pytest.raises(urllib.error.HTTPError) as exc:
            _get("http://127.0.0.1:18899/nope")
        assert exc.value.code == 404
    finally:
        viewer.stop()


def test_masked_objects_excluded_from_losses():
    """Dynamic-object masking (kubric/davis semantics): masked pixels must
    not contribute to tracking or mapping losses."""
    import jax.numpy as jnp

    from monogs_tpu.ops.losses import get_loss_mapping, get_loss_tracking

    H, W = 16, 16
    render_rgb = jnp.zeros((H, W, 3))
    render_depth = jnp.ones((H, W))
    render_opacity = jnp.ones((H, W))
    gt_depth = jnp.ones((H, W))
    grad_mask = jnp.ones((H, W), bool)
    z = jnp.zeros(())

    # A bright dynamic object occupies the left half; masked out.
    gt_rgb = jnp.zeros((H, W, 3)).at[:, : W // 2, :].set(1.0)
    mask = jnp.ones((H, W), bool).at[:, : W // 2].set(False)

    l_masked = get_loss_tracking(render_rgb, render_depth, render_opacity,
                                 gt_rgb, gt_depth, mask, grad_mask, z, z,
                                 opacity_threshold=0.5)
    l_clean = get_loss_tracking(render_rgb, render_depth, render_opacity,
                                jnp.zeros((H, W, 3)), gt_depth,
                                jnp.ones((H, W), bool), grad_mask, z, z,
                                opacity_threshold=0.5)
    np.testing.assert_allclose(float(l_masked), float(l_clean), atol=1e-6)

    m_masked = get_loss_mapping(render_rgb, render_depth, gt_rgb, gt_depth,
                                mask, z, z)
    m_clean = get_loss_mapping(render_rgb, render_depth,
                               jnp.zeros((H, W, 3)), gt_depth,
                               jnp.ones((H, W), bool), z, z)
    np.testing.assert_allclose(float(m_masked), float(m_clean), atol=1e-6)
