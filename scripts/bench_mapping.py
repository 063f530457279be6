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
    import jax

    from monogs_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from monogs_tpu.slam.mapper import MapperConfig, mapping_chunk

    state, intr = build_state()
    cfg = MapperConfig(entry_capacity=210432)
    n_steps = cfg.rebin_every

    t0 = time.perf_counter()
    state2, aux = mapping_chunk(state, intr, cfg, False, n_steps)
    _ = float(aux.loss)  # fence (block_until_ready returns early on axon)
    print(f"first call (compile): {time.perf_counter() - t0:.1f}s; "
          f"overflow={int(aux.overflow)}")

    reps = 4
    t0 = time.perf_counter()
    st = state
    for _ in range(reps):
        st, aux = mapping_chunk(st, intr, cfg, False, n_steps)
        _ = float(aux.loss)
    ms = (time.perf_counter() - t0) / (reps * n_steps) * 1000.0
    print(f"mapping iteration: {ms:.1f} ms "
          f"(window 8, 80k live / 131072 cap, 640x480)")


if __name__ == "__main__":
    main()
