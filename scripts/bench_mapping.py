"""Mapping-iteration latency benchmark (TPU): window-8 mapping_chunk.

Measures ms per mapping iteration — render all window keyframes, one
backward, masked Gaussian Adam + keyframe-pose Adam + retraction — on the
ROADMAP reference workload: 640x480, map capacity 131072 with 80k live
Gaussians, window 8, Pallas backend, rebin every 8 iterations (the
production mapping_chunk unit, SURVEY.md §3 hot loop dominant cost).

Run standalone on the TPU host:  python scripts/bench_mapping.py
(serialize with other TPU jobs — only one process can hold the grant).
"""

import sys
import time

sys.path.insert(0, "/root/repo")


def build_state(n_live=80_000, capacity=131_072, window=8, w=640, h=480,
                seed=0):
    import jax
    import jax.numpy as jnp

    from monogs_tpu.models import gaussian_map as gm
    from monogs_tpu.ops.graphics import Intrinsics
    from monogs_tpu.slam.camera import make_frame, window_from_list
    from monogs_tpu.slam.mapper import init_mapper_state

    key = jax.random.PRNGKey(seed)
    ks = jax.random.split(key, 10)
    intr = Intrinsics(fx=520.9, fy=521.0, cx=w / 2, cy=h / 2,
                      width=w, height=h)

    frames = []
    for i in range(window):
        pose = jnp.eye(4)
        pose = pose.at[:3, 3].set(
            jnp.array([0.02 * i, -0.01 * i, 0.03 * i])
        )
        frames.append(
            make_frame(
                i,
                jax.random.uniform(ks[i % 8], (h, w, 3)),
                jax.random.uniform(ks[(i + 1) % 8], (h, w),
                                   minval=0.5, maxval=4.0),
                pose,
            )
        )
    win = window_from_list(frames, window)

    state = init_mapper_state(capacity, 1, win)
    C = capacity
    params = {
        "xyz": jnp.concatenate(
            [
                jax.random.uniform(ks[0], (C, 2), minval=-2.0, maxval=2.0),
                jax.random.uniform(ks[1], (C, 1), minval=0.8, maxval=5.0),
            ],
            axis=1,
        ),
        "log_scales": jax.random.uniform(ks[2], (C, 3), minval=-5.5,
                                         maxval=-4.0),
        "quats": jax.random.normal(ks[3], (C, 4)) + jnp.array([2.0, 0, 0, 0]),
        "opacity_logit": jax.random.normal(ks[4], (C,)),
        "rgb": jax.random.uniform(ks[5], (C, 3)),
    }
    active = jnp.arange(C) < n_live
    gmap = state.gmap._replace(params=params, active=active)
    return state._replace(gmap=gmap), intr


def main():
    """Usage: bench_mapping.py [TILE TILE_CAP ENTRY_CAP MAX_DUP MAX_DUP_GEN]
    Defaults = the ROADMAP reference workload (tile 32, K 1024, E 210432,
    dup 4/16). MONOGS_BLOCK_CHUNKS sweeps the kernel block size."""
    import json

    from monogs_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import monogs_tpu.ops.binning as binning
    from monogs_tpu.slam.mapper import MapperConfig, mapping_span

    a = sys.argv[1:]
    tile = int(a[0]) if len(a) > 0 else 32
    kcap = int(a[1]) if len(a) > 1 else 1024
    ecap = int(a[2]) if len(a) > 2 else 210432
    mdup = int(a[3]) if len(a) > 3 else 4
    mgen = int(a[4]) if len(a) > 4 else 16

    state, intr = build_state()
    cfg = MapperConfig(tile_size=tile, tile_capacity=kcap,
                       entry_capacity=ecap, max_dup=mdup, max_dup_gen=mgen)
    n_steps = cfg.rebin_every

    t0 = time.perf_counter()
    state2, aux = mapping_span(state, intr, cfg, False, 0, n_steps)
    _ = float(aux.loss)  # fence (block_until_ready returns early on axon)
    compile_s = time.perf_counter() - t0

    reps = 4
    t0 = time.perf_counter()
    st = state
    for _ in range(reps):
        st, aux = mapping_span(st, intr, cfg, False, 0, n_steps)
        _ = float(aux.loss)
    ms = (time.perf_counter() - t0) / (reps * n_steps) * 1000.0
    print(json.dumps({
        "tile": tile, "K": kcap, "entry_cap": ecap,
        "max_dup": mdup, "max_dup_gen": mgen,
        "block_chunks": binning.BLOCK_CHUNKS,
        "ms_per_iter": round(ms, 1),
        "overflow_per_iter": int(aux.overflow),
        "compile_s": round(compile_s, 0),
    }))


if __name__ == "__main__":
    main()
