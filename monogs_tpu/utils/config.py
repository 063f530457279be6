"""Config loading: YAML with recursive `inherit_from` deep-merge.

Parity: /root/reference/utils/config_utils.py:4-50. Additionally builds the
typed static configs (TrackerConfig / MapperConfig / KeyframeConfig) that the
jitted SLAM steps take as hashable arguments — restoring full config-driven
behavior where the reference fork hard-codes values (SURVEY.md §5 note on
slam_tracker.py:63-73, slam_mapper.py:61-90).
"""

from __future__ import annotations

import dataclasses

import yaml


def update_recursive(dict1: dict, dict2: dict):
    """Deep-merge dict2 into dict1 (config_utils.py:36-50)."""
    for k, v in dict2.items():
        if k not in dict1:
            dict1[k] = {}
        if isinstance(v, dict):
            update_recursive(dict1[k], v)
        else:
            dict1[k] = v


def load_config(path: str, default_path: str | None = None) -> dict:
    """config_utils.py:4-33: load YAML, recursively resolving inherit_from."""
    with open(path) as f:
        cfg_special = yaml.full_load(f)

    inherit = cfg_special.get("inherit_from")
    if inherit is not None:
        cfg = load_config(inherit, default_path)
    elif default_path is not None:
        with open(default_path) as f:
            cfg = yaml.full_load(f)
    else:
        cfg = {}
    update_recursive(cfg, cfg_special)
    return cfg


def _get(cfg: dict, *path, default=None):
    cur = cfg
    for p in path:
        if not isinstance(cur, dict) or p not in cur:
            return default
        cur = cur[p]
    return cur


def build_tracker_config(cfg: dict, backend: str = "pallas"):
    from ..slam.tracker import TrackerConfig

    g = lambda *p, d=None: _get(cfg, *p, default=d)
    return TrackerConfig(
        max_iters=g("Training", "tracking_itr_num", d=100),
        lr_rot=g("Training", "lr", "cam_rot_delta", d=0.003),
        lr_trans=g("Training", "lr", "cam_trans_delta", d=0.001),
        tile_size=g("Raster", "tile_size", d=32),
        tile_capacity=g("Raster", "tracking_tile_capacity", d=2048),
        max_dup=g("Raster", "max_dup", d=4),
        max_dup_gen=g("Raster", "max_dup_gen", d=16),
        entry_capacity=g("Raster", "tracking_entry_capacity", d=None),
        cull_alpha=g("Raster", "cull_alpha", d=1.0 / 255.0),
        backend=backend,
        isotropic=g("Gaussians", "isotropic", d=False),
        const_velocity=g("Training", "const_velocity", d=False),
        exposure_reg=g("Training", "exposure_reg", d=0.0),
    )


def build_mapper_config(cfg: dict, backend: str = "pallas"):
    from ..slam.mapper import MapperConfig

    g = lambda *p, d=None: _get(cfg, *p, default=d)
    return MapperConfig(
        init_itr_num=g("Training", "init_itr_num", d=1050),
        init_gaussian_update=g("Training", "init_gaussian_update", d=100),
        init_gaussian_reset=g("Training", "init_gaussian_reset", d=500),
        init_gaussian_th=g("Training", "init_gaussian_th", d=0.005),
        init_gaussian_extent=g("Training", "init_gaussian_extent", d=30.0),
        iters_per_kf=g("Training", "mapping_itr_num", d=300),
        gaussian_update_every=g("Training", "gaussian_update_every", d=150),
        gaussian_update_offset=g("Training", "gaussian_update_offset", d=50),
        gaussian_th=g("Training", "gaussian_th", d=0.7),
        gaussian_extent=g("Training", "gaussian_extent", d=1.0),
        gaussian_reset=g("Training", "gaussian_reset", d=2001),
        size_threshold=g("Training", "size_threshold", d=20.0),
        window_size=g("Training", "window_size", d=8),
        prune_coviz=_safe_prune_coviz(
            g("Training", "prune_coviz", d=3),
            g("Training", "window_size", d=8),
        ),
        densify_grad_threshold=g(
            "opt_params", "densify_grad_threshold", d=2e-4
        ),
        percent_dense=g("opt_params", "percent_dense", d=0.01),
        position_lr_init=g("opt_params", "position_lr_init", d=1.6e-3),
        position_lr_final=g("opt_params", "position_lr_final", d=1.6e-6),
        position_lr_delay_mult=g("opt_params", "position_lr_delay_mult", d=0.01),
        position_lr_max_steps=g("opt_params", "position_lr_max_steps", d=30000),
        feature_lr=g("opt_params", "feature_lr", d=2.5e-3),
        opacity_lr=g("opt_params", "opacity_lr", d=0.05),
        scaling_lr=g("opt_params", "scaling_lr", d=1e-3),
        rotation_lr=g("opt_params", "rotation_lr", d=1e-3),
        lr_rot=g("Training", "lr", "cam_rot_delta", d=0.003) * 0.5,
        lr_trans=g("Training", "lr", "cam_trans_delta", d=0.001) * 0.5,
        lambda_ssim=g("opt_params", "lambda_ssim", d=0.2),
        tile_size=g("Raster", "tile_size", d=32),
        tile_capacity=g("Raster", "tile_capacity", d=1024),
        max_dup=g("Raster", "max_dup", d=4),
        max_dup_gen=g("Raster", "max_dup_gen", d=16),
        entry_capacity=g("Raster", "entry_capacity", d=None),
        cull_alpha=g("Raster", "cull_alpha", d=1.0 / 255.0),
        backend=backend,
        isotropic=g("Gaussians", "isotropic", d=False),
        isotropic_loss_weight=g("Training", "isotropic_loss_weight", d=0.0),
        refine_colors_only=g("Training", "refine_colors_only", d=True),
        converged_eps=g("Training", "mapping_converged_eps", d=0.0),
        lambda_depth=g("Training", "lambda_depth", d=0.9),
        converged_patience=g("Training", "mapping_converged_patience", d=4),
        exposure_reg=g("Training", "exposure_reg", d=0.0),
        monocular=g("Dataset", "sensor_type", d="depth") == "monocular"
        and not g("Dataset", "Calibration", "use_depth", d=False),
        # Seed synthesized depth into matcher dropout holes. OPT-IN: the
        # r5 stereo A/B measured it catastrophic as a default — blind
        # median-depth splats in SGBM holes (occlusions/texture-poor
        # regions whose true depth differs) corrupt the map from the
        # init keyframe and tracking diverges from ~frame 5 (ATE 1.17
        # vs 0.0208 with it off; RESULTS.md stereo note).
        fill_depth_dropout=g("Dataset", "fill_depth_dropout", d=False),
        pcd_downsample_init=g("Dataset", "pcd_downsample_init", d=32),
        pcd_downsample=g("Dataset", "pcd_downsample", d=64),
        point_size=g("Dataset", "point_size", d=0.01),
    )


def _safe_prune_coviz(prune_coviz: int, window_size: int) -> int:
    """Covisibility pruning removes Gaussians observed <= prune_coviz times
    across the window; with window_size <= prune_coviz the test is
    tautological (max nr_obs == window_size) and silently wipes the map.
    Clamp and warn."""
    if window_size <= prune_coviz:
        from .logging import Log

        safe = max(window_size - 2, 1)
        Log(
            f"prune_coviz {prune_coviz} >= window_size {window_size} would "
            f"prune every Gaussian; clamping to {safe}",
            tag="System",
        )
        return safe
    return prune_coviz


def build_keyframe_config(cfg: dict):
    from ..slam.keyframes import KeyframeConfig

    g = lambda *p, d=None: _get(cfg, *p, default=d)
    return KeyframeConfig(
        kf_translation=g("Training", "kf_translation", d=0.08),
        kf_min_translation=g("Training", "kf_min_translation", d=0.05),
        kf_overlap=g("Training", "kf_overlap", d=0.9),
        kf_cutoff=g("Training", "kf_cutoff", d=0.3),
        window_size=g("Training", "window_size", d=8),
        kf_interval=g("Training", "kf_interval", d=1),
        check_viewpoints_overlap=g(
            "Training", "check_viewpoints_overlap", d=False
        ),
    )


@dataclasses.dataclass
class SystemConfig:
    """Top-level run options (reference slam.py Args/System dataclasses)."""

    map_capacity: int = 1 << 17
    capacity_headroom: int = 8192   # grow when free slots drop below this
    seed: int = 0
    save_dir: str | None = None
    eval_every: int = 10            # save_trj_every (slam_tracker.py:67)
    use_gt_pose: bool = False       # debug: skip tracking
    backend: str = "pallas"
    # Shard the mapping window across this many devices (0 = single device).
    # The map replicates; per-keyframe render+backward runs SPMD with the
    # Gaussian-gradient all-reduce inserted by XLA (parallel/mesh.py).
    mesh_devices: int = 0
    # Overlap next-frame load/decode/transfer with device steps (host-thread
    # lookahead; the reference hides this in its tracker process instead).
    prefetch: bool = True
    use_wandb: bool = False         # Results.use_wandb (slam.py:612-619)
    # Reference single_thread semantics (configs *_sp.yaml): True = the
    # deterministic synchronous path; False = tracker ∥ mapper concurrency.
    single_thread: bool = True
    ckpt_every: int = 0             # checkpoint every N keyframes (0 = off)
    # Async bootstrap (r5): run the first N keyframe events synchronously
    # (tracker blocks on the mapper result) before switching to full
    # tracker ∥ mapper overlap. While the map is young — one seeding pass,
    # little multi-view constraint — tracking against a stale snapshot
    # compounds; with noisy stereo (SGBM) depth this diverges outright
    # (measured: async stereo ATE 0.597 vs sync 0.0208 over 100 frames;
    # r4's good async stereo number was rescued by cold-cache data
    # throttling that serialized the threads de facto). 0 = off (parity:
    # the reference overlaps from frame 0 and has the same exposure).
    async_bootstrap_kfs: int = 0


def build_system_config(cfg: dict) -> SystemConfig:
    g = lambda *p, d=None: _get(cfg, *p, default=d)
    return SystemConfig(
        map_capacity=g("System", "map_capacity", d=1 << 17),
        capacity_headroom=g("System", "capacity_headroom", d=8192),
        seed=g("System", "seed", d=0),
        save_dir=g("Results", "save_dir", d=None),
        eval_every=g("Results", "save_trj_kf_intv", d=10),
        backend=g("System", "backend", d="pallas"),
        mesh_devices=g("System", "mesh_devices", d=0),
        prefetch=g("System", "prefetch", d=True),
        use_wandb=g("Results", "use_wandb", d=False),
        # Dataset.single_thread (scene yaml) overrides Training.single_thread
        # (base yaml), matching the reference's merged-config precedence.
        single_thread=g(
            "Dataset", "single_thread",
            d=g("Training", "single_thread", d=True),
        ),
        ckpt_every=g("System", "ckpt_every", d=0),
        async_bootstrap_kfs=g("System", "async_bootstrap_kfs", d=0),
    )
