"""Tracking-iteration latency sweep over rasterizer layout knobs (TPU).

Same workload as bench.py (640x480, N=100k) but with CLI-selectable
tile_size / tile_capacity / entry_capacity; BLOCK_CHUNKS and CHUNK come
from the MONOGS_BLOCK_CHUNKS / MONOGS_CHUNK env vars (read at import).

The tile-32 default was measured before the slab rasterizer + exact
peak-alpha corner cull landed; with the cull, tile-16 rects cull 4x finer
(entries grow sub-linearly while per-entry pixel work drops 4x), so the
sweet spot may have moved.

Usage:  python scripts/bench_track_sweep.py TILE K ENTRY_CAP [N_ITERS]
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    tile = int(sys.argv[1])
    cap = int(sys.argv[2])
    ecap = int(sys.argv[3])
    n_iters = int(sys.argv[4]) if len(sys.argv) > 4 else 48

    import jax
    import jax.numpy as jnp

    from monogs_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import monogs_tpu.ops.binning as binning
    from monogs_tpu.ops.graphics import Intrinsics
    from monogs_tpu.slam.camera import make_frame
    from monogs_tpu.slam.tracker import TrackerConfig, track_frame

    W, H, N = 640, 480, 100_000
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    params = {
        "xyz": jnp.concatenate(
            [
                jax.random.uniform(ks[0], (N, 2), minval=-2.0, maxval=2.0),
                jax.random.uniform(ks[1], (N, 1), minval=0.8, maxval=5.0),
            ],
            axis=1,
        ),
        "log_scales": jax.random.uniform(ks[2], (N, 3), minval=-5.5, maxval=-4.0),
        "quats": jax.random.normal(ks[3], (N, 4)) + jnp.array([2.0, 0, 0, 0]),
        "opacity_logit": jax.random.normal(ks[4], (N,)),
        "rgb": jax.random.uniform(ks[5], (N, 3)),
    }
    active = jnp.ones((N,), bool)
    intr = Intrinsics(fx=520.9, fy=521.0, cx=W / 2, cy=H / 2, width=W, height=H)
    frame = make_frame(
        1,
        jax.random.uniform(ks[6], (H, W, 3)),
        jax.random.uniform(ks[7], (H, W), minval=0.5, maxval=4.0),
        jnp.eye(4),
    )

    cfg = TrackerConfig(
        max_iters=n_iters, convergence_threshold=0.0, opacity_threshold=0.5,
        tile_size=tile, tile_capacity=cap, entry_capacity=ecap,
    )

    # Overflow check at the initial pose (same binning the loop will reuse).
    from monogs_tpu.ops.binning import tile_bin
    from monogs_tpu.ops.projection import project_gaussians
    from monogs_tpu.models.gaussian_map import get_opacity, get_scales

    proj = project_gaussians(
        params["xyz"], get_scales(params, False), params["quats"],
        get_opacity(params), params["rgb"], frame.R, frame.t,
        jnp.zeros(3), jnp.zeros(3), intr, active=active,
    )
    bins = tile_bin(
        proj.mean2d, proj.radius, proj.depth, proj.valid,
        img_w=W, img_h=H, tile_size=tile, tile_capacity=cap,
        max_dup=cfg.max_dup, entry_capacity=ecap,
        opacity=jnp.where(proj.valid, proj.opacity, 0.0), conic=proj.conic,
    )
    occupancy = int(jnp.sum((bins.counts + binning.SLAB - 1)
                            // binning.SLAB) * binning.SLAB)
    overflow = int(bins.overflow)

    t0 = time.perf_counter()
    res = track_frame(params, active, frame, intr, cfg)
    assert int(res.n_iters) == n_iters
    compile_s = time.perf_counter() - t0
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        res = track_frame(params, active, frame, intr, cfg)
        _ = float(res.t[0])
    ms = (time.perf_counter() - t0) / (reps * n_iters) * 1000.0
    print(json.dumps({
        "tile": tile, "K": cap, "entry_cap": ecap,
        "block_chunks": binning.BLOCK_CHUNKS, "chunk": binning.CHUNK,
        "ms_per_iter": round(ms, 2), "occupancy_rows": occupancy,
        "overflow": overflow, "compile_s": round(compile_s, 0),
    }))


if __name__ == "__main__":
    main()
