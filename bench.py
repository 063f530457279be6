"""Benchmark: differentiable rasterizer fwd+bwd latency on real hardware.

Prints ONE JSON line. Primary metric: full tracking-gradient step latency
(render forward + backward incl. pose gradients) at 640x480 on a
100k-Gaussian map — the innermost unit of both SLAM hot loops
(SURVEY.md §3 "hot loops, ranked").

Baseline derivation (BASELINE.md): the reference runs "up to 10 fps"
monocular tracking on an RTX 4090 (README.md:45) where each tracked frame
performs up to ~100 rasterize fwd+bwd iterations plus mapping work —
i.e. ~1.0 ms per fwd+bwd iteration. vs_baseline reports
baseline_ms / our_ms (>1 = faster than the reference per iteration).
"""

import json
import time

BASELINE_MS = 1.0


def main():
    import jax
    import jax.numpy as jnp

    from monogs_tpu.ops.graphics import Intrinsics
    from monogs_tpu.ops.losses import get_loss_tracking
    from monogs_tpu.ops.render import render

    W, H, N = 640, 480, 100_000
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    means = jnp.concatenate(
        [
            jax.random.uniform(ks[0], (N, 2), minval=-2.0, maxval=2.0),
            jax.random.uniform(ks[1], (N, 1), minval=0.8, maxval=5.0),
        ],
        axis=1,
    )
    scales = jnp.exp(jax.random.uniform(ks[2], (N, 3), minval=-5.5, maxval=-4.0))
    quats = jax.random.normal(ks[3], (N, 4)) + jnp.array([2.0, 0, 0, 0])
    opac = jax.nn.sigmoid(jax.random.normal(ks[4], (N,)))
    rgb = jax.random.uniform(ks[5], (N, 3))
    intr = Intrinsics(fx=520.9, fy=521.0, cx=W / 2, cy=H / 2, width=W, height=H)
    R, t = jnp.eye(3), jnp.zeros(3)

    gt_rgb = jax.random.uniform(ks[6], (H, W, 3))
    gt_depth = jax.random.uniform(ks[7], (H, W), minval=0.5, maxval=4.0)
    ones = jnp.ones((H, W), bool)

    def loss_fn(means, scales, quats, opac, rgb, rho, theta, ea, eb):
        out = render(
            means, scales, quats, opac, rgb, R, t, intr, rho=rho, theta=theta,
            tile_capacity=1024, max_dup=16,
        )
        return get_loss_tracking(
            out.rgb, out.depth, out.opacity, gt_rgb, gt_depth, ones, ones,
            ea, eb, opacity_threshold=0.5,
        )

    step = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4, 5, 6, 7, 8)))
    args = (means, scales, quats, opac, rgb, jnp.zeros(3), jnp.zeros(3),
            jnp.zeros(()), jnp.zeros(()))

    g = step(*args)
    jax.block_until_ready(g)
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        g = step(*args)
    jax.block_until_ready(g)
    ms = (time.perf_counter() - t0) / iters * 1000.0

    print(
        json.dumps(
            {
                "metric": "rasterize_fwd_bwd_ms_640x480_100k",
                "value": round(ms, 3),
                "unit": "ms",
                "vs_baseline": round(BASELINE_MS / ms, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
