"""CLI entry point: run Gaussian-splatting SLAM from a YAML config.

Counterpart of /root/reference/slam.py:502-627 (tyro CLI + SLAM bootstrap):
    python slam.py --config configs/rgbd/tum/fr3_office.yaml [--eval] ...
Creates a timestamped results/<dataset>_<scene>/<datetime> save dir with the
merged config dumped (slam.py:592-609), runs the system, and optionally the
rendering evaluation (--eval, README.md:134-140 semantics).
"""

from __future__ import annotations

import argparse
import os
import time


def main():
    ap = argparse.ArgumentParser(description="TPU-native Gaussian Splatting SLAM")
    ap.add_argument("--config", default=None,
                    help="YAML config path (optional with --resume-run: "
                         "defaults to the run's saved config.yml)")
    ap.add_argument("--eval", action="store_true",
                    help="run rendering evaluation (PSNR/SSIM) at the end")
    ap.add_argument("--n-frames", type=int, default=None,
                    help="limit the number of processed frames")
    ap.add_argument("--backend", default=None, choices=["pallas", "ref"],
                    help="rasterizer backend override")
    ap.add_argument("--refine", type=int, default=0,
                    help="color refinement iterations after SLAM")
    ap.add_argument("--refine-curve", default=None, metavar="N1,N2,...",
                    help="refine incrementally and eval PSNR/SSIM at each "
                         "cumulative milestone (e.g. 3000,10000,26000) — "
                         "the saturation curve reconciling our 3k protocol "
                         "with the reference's 26k "
                         "(slam_mapper.py:521). Writes refine_curve.json")
    ap.add_argument("--ate-align", action="store_true",
                    help="Umeyama-align trajectories before ATE")
    ap.add_argument("--ate-align-scale", action="store_true",
                    help="Sim(3) (scale-correcting) alignment before ATE — "
                         "the monocular protocol (scale is unobservable)")
    ap.add_argument("--viewer", type=int, default=0, metavar="PORT",
                    help="start the live web viewer on this port")
    ap.add_argument("--async-mode", action="store_true",
                    help="tracker and mapper run concurrently")
    ap.add_argument("--sync", action="store_true",
                    help="force the synchronous single-thread path even when "
                         "the config sets single_thread: False")
    ap.add_argument("--resume", default=None, metavar="CKPT_DIR",
                    help="resume from a checkpoint directory (see --ckpt-every)")
    ap.add_argument("--resume-run", default=None, metavar="RUN_DIR",
                    help="resume a finished-or-died run IN PLACE: reuses "
                         "RUN_DIR as the save dir, skips every phase "
                         "recorded complete in RUN_DIR/phase.json (SLAM "
                         "frame loop, --refine) and reruns the rest, so a "
                         "native process death during refine/eval finishes "
                         "with identical artifacts (VERDICT r4 weak #5)")
    ap.add_argument("--no-phase-ckpt", action="store_true",
                    help="disable the end-of-SLAM phase checkpoint that "
                         "makes --resume-run possible")
    ap.add_argument("--ckpt-every", type=int, default=None, metavar="N",
                    help="checkpoint the full SLAM state every N keyframes")
    ap.add_argument("--dist-coordinator", default=None, metavar="HOST:PORT",
                    help="jax.distributed coordinator (multi-host runs)")
    ap.add_argument("--dist-procs", type=int, default=None,
                    help="total process count of the multi-host run")
    ap.add_argument("--dist-rank", type=int, default=None,
                    help="this process's rank in the multi-host run")
    args = ap.parse_args()
    if args.resume_run:
        args.config = args.config or os.path.join(args.resume_run,
                                                  "config.yml")
    if not args.config:
        ap.error("--config is required (unless --resume-run is given)")

    import yaml

    from monogs_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    # Multi-host: bring up the distributed runtime before any computation;
    # every process then sees the global device set (parallel/distributed).
    from monogs_tpu.parallel.distributed import (
        initialize_distributed,
        is_primary,
        sync_hosts,
    )

    initialize_distributed(args.dist_coordinator, args.dist_procs,
                           args.dist_rank)
    from monogs_tpu.data import load_dataset
    from monogs_tpu.slam.system import SLAM
    from monogs_tpu.utils.config import (
        build_keyframe_config,
        build_mapper_config,
        build_system_config,
        build_tracker_config,
        load_config,
    )
    from monogs_tpu.utils.logging import Log

    config = load_config(args.config)
    backend = args.backend or config.get("System", {}).get("backend", "pallas")

    # Timestamped save dir with merged-config dump (slam.py:592-609).
    ds_cfg = config.get("Dataset", {})
    scene = os.path.basename(os.path.normpath(ds_cfg.get("dataset_path", "run")))
    stamp = time.strftime("%Y-%m-%d-%H-%M-%S")
    save_root = config.get("Results", {}).get("save_dir", "results")
    save_dir = os.path.join(save_root, f"{ds_cfg.get('type','x')}_{scene}", stamp)
    if args.resume_run:
        # In-place resume: same run dir, artifacts overwrite their partial
        # versions. The saved config.yml carries the ORIGINAL run's
        # Results.save_dir; pin it back to the run dir itself.
        save_dir = args.resume_run
    if not is_primary():
        # Replicated host drivers on secondary processes write only scratch.
        import jax

        save_dir = os.path.join("/tmp", f"monogs_rank{jax.process_index()}",
                                stamp)
    os.makedirs(save_dir, exist_ok=True)
    config.setdefault("Results", {})["save_dir"] = save_dir
    with open(os.path.join(save_dir, "config.yml"), "w") as f:
        yaml.dump(config, f)
    if is_primary():
        Log(f"Results -> {save_dir}", tag="System")

    dataset = load_dataset(config)
    slam = SLAM(
        dataset,
        tracker_config=build_tracker_config(config, backend=backend),
        mapper_config=build_mapper_config(config, backend=backend),
        keyframe_config=build_keyframe_config(config),
        system_config=build_system_config(config),
    )
    slam.scfg.save_dir = save_dir
    if args.ckpt_every is not None:
        slam.scfg.ckpt_every = args.ckpt_every
    if args.viewer and is_primary():
        slam.start_viewer(port=args.viewer)

    start_frame = 0
    if args.resume:
        from monogs_tpu.utils.ckpt import load_checkpoint

        load_checkpoint(args.resume, slam)
        start_frame = max(slam.est_poses) + 1
        Log(f"Resumed from {args.resume} at frame {start_frame}",
            tag="System")
    elif (args.resume_run
          and os.path.isdir(os.path.join(args.resume_run, "ckpt"))
          and not os.path.exists(os.path.join(args.resume_run,
                                              "phase.json"))):
        # Died mid-frame-loop with --ckpt-every checkpoints: continue the
        # frame loop in place from the periodic checkpoint.
        from monogs_tpu.utils.ckpt import load_checkpoint

        load_checkpoint(os.path.join(args.resume_run, "ckpt"), slam)
        start_frame = max(slam.est_poses) + 1
        Log(f"Resumed mid-run {args.resume_run} at frame {start_frame}",
            tag="System")

    # Background compiles of every hot program (remote compiler service,
    # concurrent) — no-op unless the config pins entry capacities.
    slam.prewarm()

    # Mode: the reference's single_thread config key (configs *_sp.yaml)
    # selects the deterministic synchronous path; single_thread: False runs
    # tracker ∥ mapper (the reference's default 2-process topology).
    # CLI flags override in either direction.
    use_async = (args.async_mode or not slam.scfg.single_thread) \
        and not args.sync

    # Phase ledger (self-healing long runs, VERDICT r4 weak #5): the frame
    # loop and --refine each checkpoint the full state + host metrics when
    # they complete, so `slam.py --resume-run <dir>` after a native process
    # death (observed once on axon, r4) skips the finished phases and
    # produces metrics.json exactly as an uninterrupted run would — no
    # offline recovery scripts.
    import json as _json

    phase_path = os.path.join(save_dir, "phase.json")
    phase = {}
    if args.resume_run and os.path.exists(phase_path):
        with open(phase_path) as f:
            phase = _json.load(f)

    def _jsonable(x):
        # metrics may hold numpy/jax scalars (deferred telemetry reads).
        if isinstance(x, dict):
            return {k: _jsonable(v) for k, v in x.items()}
        if isinstance(x, (list, tuple)):
            return [_jsonable(v) for v in x]
        if isinstance(x, (str, bool, int, float)) or x is None:
            return x
        import numpy as _np

        a = _np.asarray(x)
        return a.item() if a.size == 1 else a.tolist()

    def _write_phase():
        if args.no_phase_ckpt or not is_primary():
            return
        tmp = phase_path + ".tmp"
        with open(tmp, "w") as f:
            _json.dump(_jsonable(phase), f)
        os.replace(tmp, phase_path)

    def _phase_ckpt(name):
        if args.no_phase_ckpt or not is_primary():
            return
        from monogs_tpu.utils.ckpt import save_checkpoint

        save_checkpoint(os.path.join(save_dir, name), slam)

    if phase.get("slam_done"):
        from monogs_tpu.utils.ckpt import load_checkpoint

        ckpt_name = ("ckpt_refined" if phase.get("refine_done_iters")
                     else "ckpt_slam_end")
        load_checkpoint(os.path.join(save_dir, ckpt_name), slam)
        slam.metrics.update(phase.get("metrics", {}))
        rmse = phase.get("rmse")
        Log(f"Resumed run {save_dir} past SLAM "
            f"(refine done: {phase.get('refine_done_iters', 0)})",
            tag="System")
    else:
        if use_async:
            rmse = slam.run_async(n_frames=args.n_frames,
                                  start_frame=start_frame)
        else:
            rmse = slam.run(n_frames=args.n_frames, start_frame=start_frame)
        _phase_ckpt("ckpt_slam_end")
        phase = {"slam_done": True, "rmse": rmse, "metrics": slam.metrics}
        _write_phase()
    if args.refine:
        done_iters = int(phase.get("refine_done_iters", 0))
        if done_iters < args.refine:
            slam.refine(iters=args.refine - done_iters)
            _phase_ckpt("ckpt_refined")
            phase["refine_done_iters"] = int(args.refine)
            phase["metrics"] = slam.metrics
            _write_phase()
        else:
            Log(f"refine already complete ({done_iters} iters)",
                tag="System")
    refine_curve = []
    if args.refine_curve:
        # Refine DEVICE work runs on every process (multi-host collectives
        # need all peers — running it under is_primary() only would hang a
        # --coordinator run); only eval renders + the curve artifact are
        # primary-only (ADVICE r4).
        import json as _json

        milestones = sorted(int(x) for x in args.refine_curve.split(","))
        done = args.refine or 0
        for m in milestones:
            if m > done:
                slam.refine(iters=m - done)
                done = m
            if not is_primary():
                continue
            r = slam.eval_rendering(every=5, label=f"refine{m}")
            refine_curve.append(
                {"iters": m, "psnr": float(r["mean_psnr"]),
                 "ssim": float(r["mean_ssim"])})
            Log(f"refine {m}: PSNR {r['mean_psnr']:.2f} "
                f"SSIM {r['mean_ssim']:.3f}", tag="Eval")
        if is_primary():
            with open(os.path.join(save_dir, "refine_curve.json"), "w") as f:
                _json.dump(refine_curve, f, indent=1)
    # Artifacts/eval on the primary process only (host logic is replicated
    # across processes in multi-host runs; device work is already shared).
    if is_primary():
        eval_res = None
        if args.eval or config.get("Results", {}).get("eval_rendering", False):
            eval_res = slam.eval_rendering(every=5)
            Log(f"PSNR {eval_res['mean_psnr']:.2f} "
                f"SSIM {eval_res['mean_ssim']:.3f}", tag="Eval")
        if args.ate_align:
            Log(f"aligned ATE {slam.eval_ate(label='aligned', align=True):.4f}",
                tag="Eval")
        if args.ate_align_scale:
            rs = slam.eval_ate(label="aligned_scale", align=True,
                               align_scale=True)
            Log(f"scale-aligned ATE {rs:.4f}", tag="Eval")
        # Run-summary artifact: throughput + telemetry next to the eval
        # JSONs (reference keeps fps only in its README claims).
        import json

        summary = {
            # Protocol identity: which config produced this run. bench.py
            # selects the flagship throughput run by this field (latest
            # matching run, so regressions show) instead of max-fps over
            # heterogeneous configs.
            "config": os.path.basename(args.config),
            "n_frames": len(slam.metrics["frame_times"]),
            "fps": slam.metrics.get("fps"),
            "wall_s": slam.metrics.get("wall_s"),
            "final_ate_rmse": rmse,
            "tracking_iters_mean": (
                float(sum(slam.metrics["tracking_iters"]))
                / max(len(slam.metrics["tracking_iters"]), 1)
            ),
            "overflow_max": max(slam.metrics["overflow"], default=0),
            "n_keyframes": len(slam.kf_history),
            "map_active": int(slam.state.gmap.num_active),
            "mode": "async" if use_async else "sync",
            "refine_iters": int(args.refine or 0),
        }
        # Quality from the SAME run, in the same artifact as the
        # throughput (VERDICT r3 weak #1: fps and PSNR of record must not
        # come from different runs; reference eval_utils.py:26-208
        # produces ATE+PSNR together).
        if eval_res is not None:
            summary["psnr"] = float(eval_res["mean_psnr"])
            summary["ssim"] = float(eval_res["mean_ssim"])
            if eval_res.get("train_view_inflated"):
                summary["psnr_train_view_inflated"] = True
        if refine_curve:
            summary["refine_curve"] = refine_curve
        # Host-blocking stage decomposition (utils/profiling.section):
        # where the wall clock went — the round-2 fps gap was 4x dispatch
        # overhead and this is the evidence trail for closing it.
        from monogs_tpu.utils.profiling import summary as _prof_summary

        summary["stages"] = _prof_summary()
        with open(os.path.join(save_dir, "metrics.json"), "w") as f:
            json.dump(summary, f, indent=1)
    slam.wandb.finish()
    sync_hosts("run-end")
    return rmse


if __name__ == "__main__":
    main()
