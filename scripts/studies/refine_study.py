"""Offline refine study on the r4 flagship pre-refine PLY.

Question: post-refine(3000) PSNR collapsed to 16.75 from a pre-refine map
that re-renders ~22.8. Refine telemetry showed 6.7k dropped entries per
refine render and the POST-refine map overflows eval caps at 54k (vs 20k
pre) — hypothesis: truncated tiles render black -> gradients widen/darken
splats -> more truncation (feedback loop). Variants (300 iters each):

  A. status quo        (all params,   eval caps dup32/tile4096, entry auto)
  B. geometry frozen   (rgb+opacity,  eval caps)
  C. geometry frozen   (rgb+opacity,  production caps dup8/tile2048/E225280)
  D. all params        (big caps dup96/tile8192, entry auto)

Prints PSNR after each; baseline first.
"""

import dataclasses
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

RUN = "/root/repo/results/synthetic_run/2026-08-21-18-10-57"


def main():
    import jax
    import jax.numpy as jnp

    from monogs_tpu.data import load_dataset
    from monogs_tpu.slam.camera import window_from_list
    from monogs_tpu.slam.mapper import init_mapper_state
    from monogs_tpu.slam.system import SLAM
    from monogs_tpu.utils.config import (
        build_keyframe_config,
        build_mapper_config,
        build_system_config,
        build_tracker_config,
        load_config,
    )
    from monogs_tpu.utils.ply import load_ply

    cfg = load_config("/root/repo/configs/synthetic/room_final.yaml")
    ds = load_dataset(cfg)
    slam = SLAM(
        ds,
        tracker_config=build_tracker_config(cfg),
        mapper_config=build_mapper_config(cfg),
        keyframe_config=build_keyframe_config(cfg),
        system_config=build_system_config(cfg),
    )

    # Reconstruct mapper state from the pre-refine PLY.
    d0 = ds[0]
    from monogs_tpu.slam.camera import make_frame

    f0 = make_frame(0, jnp.asarray(d0["rgb"]), jnp.asarray(d0["depth"]),
                    jnp.asarray(d0["pose"]))
    state = init_mapper_state(
        slam.scfg.map_capacity, 1,
        window_from_list([f0], slam._window_capacity()), seed=0)
    ply = load_ply(f"{RUN}/point_cloud/final/point_cloud.ply")
    N = ply["xyz"].shape[0]
    C = slam.scfg.map_capacity
    print(f"PLY: {N} gaussians, capacity {C}")

    def put(template, arr):
        out = np.zeros(template.shape, np.float32)
        out[:N] = arr
        return jnp.asarray(out)

    params0 = {
        "xyz": put(state.gmap.params["xyz"], ply["xyz"]),
        "rgb": put(state.gmap.params["rgb"], ply["rgb"]),
        "log_scales": put(state.gmap.params["log_scales"],
                          ply["log_scales"]),
        "quats": put(state.gmap.params["quats"], ply["quats"]),
        "opacity_logit": put(state.gmap.params["opacity_logit"],
                             ply["opacity_logit"]),
    }
    active = jnp.asarray(np.arange(C) < N)
    # nr_iters matters for the xyz lr schedule: the real run reached
    # ~200 frames * 150 iters; use the same ballpark.
    state = state._replace(
        gmap=state.gmap._replace(params=params0, active=active),
        nr_iters=jnp.asarray(30000, jnp.int32),
    )
    slam.state = state

    trj = json.load(open(f"{RUN}/plot/trj_final.json"))
    for i, T in zip(trj["trj_id"], trj["trj_est"]):
        Tw = np.linalg.inv(np.asarray(T))   # c2w -> w2c
        slam.est_poses[int(i)] = (
            Tw[:3, :3].astype(np.float32), Tw[:3, 3].astype(np.float32))
        Tg = np.linalg.inv(np.asarray(trj["trj_gt"][int(i)]))
        slam.gt_poses[int(i)] = (
            Tg[:3, :3].astype(np.float32), Tg[:3, 3].astype(np.float32))
    slam.kf_history = set(range(0, 200, 5))   # kf set approximation

    def psnr(tag):
        r = slam.eval_rendering(every=5, label=f"study_{tag}")
        print(f"== {tag}: PSNR {r['mean_psnr']:.2f} SSIM "
              f"{r['mean_ssim']:.3f}", flush=True)
        return r["mean_psnr"]

    base_mcfg = slam.mcfg
    psnr("baseline_prerefine")

    variants = {
        "A_statusquo": base_mcfg,
        "B_frozen_geom_evalcaps": dataclasses.replace(
            base_mcfg, position_lr_init=0.0, position_lr_final=0.0,
            scaling_lr=0.0, rotation_lr=0.0),
        "C_frozen_geom_prodcaps": dataclasses.replace(
            base_mcfg, position_lr_init=0.0, position_lr_final=0.0,
            scaling_lr=0.0, rotation_lr=0.0,
            refine_tile_capacity=0, refine_max_dup=0),  # fall back to prod
        "D_allparams_bigcaps": dataclasses.replace(
            base_mcfg, refine_tile_capacity=8192, refine_max_dup=96),
    }
    for tag, mcfg in variants.items():
        slam.state = state  # restore pre-refine params + fresh moments
        slam.mcfg = mcfg
        t0 = time.time()
        slam.refine(iters=304)
        dt = time.time() - t0
        print(f"{tag}: refine 304 iters in {dt:.0f}s "
              f"({dt/304*1000:.0f} ms/iter), overflow_max "
              f"{slam.metrics.get('refine_overflow_max')}", flush=True)
        slam.mcfg = base_mcfg  # eval at the standard eval caps
        psnr(tag)


if __name__ == "__main__":
    main()
