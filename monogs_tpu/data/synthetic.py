"""Synthetic RGB-D sequences rendered from a ground-truth Gaussian scene.

No counterpart in the reference (whose tests download TUM/Replica): in a
zero-egress TPU environment this dataset is the deterministic end-to-end
fixture — the scene, trajectory, and therefore the true ATE/PSNR optimum are
known in closed form. Frames are rendered once (lazily) with the in-repo
rasterizer itself, so SLAM-on-synthetic also exercises the renderer at
dataset-build time.
"""

from __future__ import annotations

import numpy as np

from .base import BaseDataset

DEFAULT_CONFIG = {
    "Dataset": {
        "type": "synthetic",
        "Calibration": {
            "width": 160, "height": 120,
            "fx": 120.0, "fy": 120.0, "cx": 80.0, "cy": 60.0,
            "depth_scale": 1.0,
        },
        "Objects": {"static": [0], "dynamic": [], "masked": []},
        "synthetic": {
            "n_frames": 30,
            "n_gaussians": 1500,
            "seed": 0,
            "motion_scale": 0.012,   # per-frame translation magnitude
        },
    },
}


def _gt_scene(n: int, seed: int):
    rng = np.random.RandomState(seed)
    # A shallow "wall" of gaussians 1.5-3.5m in front of the camera plus
    # near-field structure, guaranteeing full image coverage and parallax.
    means = np.stack(
        [
            rng.uniform(-1.6, 1.6, n),
            rng.uniform(-1.2, 1.2, n),
            rng.uniform(1.5, 3.5, n),
        ],
        axis=1,
    )
    scales = np.exp(rng.uniform(-3.4, -2.4, (n, 3)))
    quats = rng.normal(size=(n, 4)) + np.array([3.0, 0, 0, 0])
    opac = 1.0 / (1.0 + np.exp(-rng.normal(1.0, 1.0, n)))
    rgb = rng.uniform(0.05, 0.95, (n, 3))
    return means, scales, quats, opac, rgb


def _trajectory(n_frames: int, motion: float):
    """Smooth sideways arc with slight rotation (w2c poses)."""
    from ..ops import lie
    import jax.numpy as jnp

    poses = []
    for i in range(n_frames):
        s = i * motion
        theta = np.array([0.0, 0.25 * s, 0.0])
        rho = np.array([s, 0.15 * np.sin(2.0 * s), 0.05 * s])
        T = np.asarray(lie.se3_exp(jnp.asarray(np.concatenate([rho, theta]),
                                               dtype=np.float32)))
        poses.append(T)
    return poses


class SyntheticDataset(BaseDataset):
    def __init__(self, config: dict | None = None):
        if config is None:
            config = DEFAULT_CONFIG
        super().__init__(config)
        syn = config["Dataset"].get("synthetic", DEFAULT_CONFIG["Dataset"]["synthetic"])
        self.n_frames = int(syn.get("n_frames", 30))
        self.n_gaussians = int(syn.get("n_gaussians", 1500))
        self.seed = int(syn.get("seed", 0))
        self.motion = float(syn.get("motion_scale", 0.012))
        self.scene = _gt_scene(self.n_gaussians, self.seed)
        self.poses = _trajectory(self.n_frames, self.motion)
        self.use_depth = bool(syn.get("use_depth", True))  # False = monocular
        self._cache: dict[int, dict] = {}

    def __len__(self):
        return self.n_frames

    def _render_frame(self, idx: int) -> dict:
        import jax.numpy as jnp

        from ..ops.render import render

        means, scales, quats, opac, rgb = self.scene
        T = self.poses[idx]
        out = render(
            jnp.asarray(means, jnp.float32), jnp.asarray(scales, jnp.float32),
            jnp.asarray(quats, jnp.float32), jnp.asarray(opac, jnp.float32),
            jnp.asarray(rgb, jnp.float32),
            jnp.asarray(T[:3, :3], jnp.float32), jnp.asarray(T[:3, 3], jnp.float32),
            self.intrinsics, tile_capacity=256, max_dup=32,
        )
        opacity = np.asarray(out.opacity)
        covered = opacity > 0.5
        depth = np.where(covered, np.asarray(out.depth) /
                         np.maximum(opacity, 1e-6), 0.0)
        return {
            "rgb": np.clip(np.asarray(out.rgb), 0.0, 1.0).astype(np.float32),
            "depth": depth.astype(np.float32),
            "pose": T.astype(np.float32),  # w2c
            "mask": covered,
            "segmentation": np.zeros(depth.shape, np.int32),
        }

    def __getitem__(self, idx: int) -> dict:
        if idx not in self._cache:
            self._cache[idx] = self._render_frame(idx)
        d = self._cache[idx]
        if not self.use_depth:
            d = dict(d, depth=None)
        return d
