"""Assemble a results table row from a run's save_dir artifacts.

Usage: python scripts/collect_results.py results/synthetic_run/<timestamp>
Prints one markdown table row: ATE RMSE, PSNR, SSIM, fps, map size,
tracking iters — the committed-results protocol (VERDICT r1 #2).
"""

import json
import os
import sys


def main(run_dir):
    def load(*p):
        path = os.path.join(run_dir, *p)
        if os.path.exists(path):
            with open(path) as f:
                return json.load(f)
        return {}

    stats = load("plot", "stats_final.json")
    psnr = load("psnr", "final", "final_result.json")
    metrics = load("metrics.json")
    ply = os.path.join(run_dir, "point_cloud", "final", "point_cloud.ply")
    n_gauss = None
    if os.path.exists(ply):
        with open(ply, "rb") as f:
            for line in f:
                if line.startswith(b"element vertex"):
                    n_gauss = int(line.split()[-1])
                    break
                if line.strip() == b"end_header":
                    break

    row = {
        "run": os.path.basename(run_dir.rstrip("/")),
        "ate_rmse_m": stats.get("rmse"),
        "n_frames": stats.get("n_frames"),
        "psnr": psnr.get("mean_psnr"),
        "ssim": psnr.get("mean_ssim"),
        "lpips": psnr.get("mean_lpips"),
        "fps": metrics.get("fps"),
        "wall_s": metrics.get("wall_s"),
        "gaussians": n_gauss,
        "mean_tracking_iters": metrics.get("tracking_iters_mean"),
        "overflow_max": metrics.get("overflow_max"),
    }
    print(json.dumps(row, indent=2))
    fmt = lambda v, n=4: ("-" if v is None else f"{v:.{n}f}"
                          if isinstance(v, float) else str(v))
    print(
        f"| {row['run']} | {fmt(row['ate_rmse_m'])} | {fmt(row['psnr'], 2)} "
        f"| {fmt(row['ssim'], 3)} | {fmt(row['fps'], 2)} | {row['gaussians']} |"
    )


if __name__ == "__main__":
    if len(sys.argv) < 2:
        print(__doc__.strip(), file=sys.stderr)
        sys.exit(2)
    if not os.path.isdir(sys.argv[1]):
        print(f"error: run_dir not found: {sys.argv[1]}", file=sys.stderr)
        sys.exit(2)
    main(sys.argv[1])
