"""Settle the r3-vs-r4 iso PSNR discrepancy: evaluate BOTH iso PLYs
(r3 14-12-28, r4 19-33-41 pre-refine) on HELD-OUT views vs TRAIN
(keyframe) views. Hypothesis: r3's offline '22.85 dB' re-render used
train views (kf_history empty -> idxs = all multiples of 5 = keyframes),
while the protocol number is held-out."""

import json
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

RUNS = {
    "r3_iso": "/root/repo/results/synthetic_run/2026-08-21-14-12-28",
    "r4_iso": "/root/repo/results/synthetic_run/2026-08-21-19-33-41",
}


def main():
    import jax.numpy as jnp

    from monogs_tpu.data import load_dataset
    from monogs_tpu.slam.camera import make_frame, window_from_list
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
    d0 = ds[0]
    f0 = make_frame(0, jnp.asarray(d0["rgb"]), jnp.asarray(d0["depth"]),
                    jnp.asarray(d0["pose"]))

    for tag, run in RUNS.items():
        ply = load_ply(f"{run}/point_cloud/final/point_cloud.ply")
        N = ply["xyz"].shape[0]
        C = max(slam.scfg.map_capacity, -(-N // 4096) * 4096)
        state = init_mapper_state(
            C, 1, window_from_list([f0], slam._window_capacity()), seed=0)

        def put(template, arr):
            out = np.zeros(template.shape, np.float32)
            out[:N] = arr
            return jnp.asarray(out)

        params = {k: put(state.gmap.params[k], ply[k])
                  for k in ("xyz", "rgb", "log_scales", "quats",
                            "opacity_logit")}
        slam.state = state._replace(
            gmap=state.gmap._replace(
                params=params, active=jnp.asarray(np.arange(C) < N)))

        trj = json.load(open(f"{run}/plot/trj_final.json"))
        slam.est_poses, slam.gt_poses = {}, {}
        for i, T in zip(trj["trj_id"], trj["trj_est"]):
            Tw = np.linalg.inv(np.asarray(T))
            slam.est_poses[int(i)] = (
                Tw[:3, :3].astype(np.float32), Tw[:3, 3].astype(np.float32))

        # Held-out protocol: kf set = multiples of 5 -> eval strides the
        # NON-keyframe frames. Train views: kf_history empty -> eval takes
        # the multiples of 5 themselves (the mapper's training views).
        slam.kf_history = set(range(0, 200, 5))
        held = slam.eval_rendering(every=5, label=f"{tag}_held")
        slam.kf_history = set()
        train = slam.eval_rendering(every=5, label=f"{tag}_train")
        print(f"== {tag}: held-out PSNR {held['mean_psnr']:.2f} "
              f"SSIM {held['mean_ssim']:.3f} | train-view PSNR "
              f"{train['mean_psnr']:.2f} SSIM {train['mean_ssim']:.3f}",
              flush=True)


if __name__ == "__main__":
    main()
