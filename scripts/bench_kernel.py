"""Compositing-kernel microbenchmark (TPU): composite_slab fwd / fwd+bwd.

Times JUST the Pallas compositing kernels on the tracking workload slab
(640x480, 100k Gaussians, tile 32, entry_capacity 210432) — isolating the
two ops that dominate both SLAM hot loops (mapping profile: bwd 27 +
fwd 13 of 80.8 ms/iter) from binning/pack/projection.

Measured (TPU v5e, 2026-08-19, 101k entries): fwd 2.41, fwd+bwd 6.30
ms/iter. Variant experiments (both reverted, see ops/tile_raster.py
comments): bf16 prefix-matmul inputs 6.32 (wash — kernels are
VPU/transcendental-bound, not MXU-bound); VPU rank-1 fma chain replacing
the K=5 cotangent contraction 8.49 (regression — the MXU path overlaps
with VPU work).

Serialize with other TPU jobs (one grant).
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")


def fence(x):
    import jax.numpy as jnp
    return float(jnp.ravel(x)[0])


def main():
    import jax
    import jax.numpy as jnp

    from monogs_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import monogs_tpu.ops.tile_raster as tr
    from monogs_tpu.ops.binning import tile_bin
    from monogs_tpu.ops.graphics import Intrinsics
    from monogs_tpu.ops.projection import project_gaussians_ch

    W, H, N = 640, 480, 100_000
    TILE, K, MAX_DUP, E_CAP = 32, 2048, 8, 210432
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    xyz = jnp.concatenate(
        [jax.random.uniform(ks[0], (N, 2), minval=-2.0, maxval=2.0),
         jax.random.uniform(ks[1], (N, 1), minval=0.8, maxval=5.0)], axis=1)
    scales = jnp.exp(jax.random.uniform(ks[2], (N, 3), minval=-5.5,
                                        maxval=-4.0))
    quats = jax.random.normal(ks[3], (N, 4)) + jnp.array([2.0, 0, 0, 0])
    opac = jax.nn.sigmoid(jax.random.normal(ks[4], (N,)))
    rgb = jax.random.uniform(ks[5], (N, 3))
    intr = Intrinsics(fx=520.9, fy=521.0, cx=W / 2, cy=H / 2,
                      width=W, height=H)
    cfg = tr.make_raster_config(W, H, TILE)

    @jax.jit
    def prep():
        p = project_gaussians_ch(xyz, scales, quats, opac,
                                 jnp.eye(3), jnp.zeros(3),
                                 jnp.zeros(3), jnp.zeros(3), intr)
        bins = tile_bin(None, p.radius, p.depth, p.valid,
                        img_w=W, img_h=H, tile_size=TILE, tile_capacity=K,
                        max_dup=MAX_DUP, entry_capacity=E_CAP,
                        opacity=jnp.where(p.valid, p.opacity, 0.0),
                        conic=(p.ca, p.cb, p.cc), uv=(p.u, p.v))
        opa_m = jnp.where(p.valid, p.opacity, 0.0)
        feats = tr.pack_features_slab(
            p.u, p.v, p.ca, p.cb, p.cc, opa_m, rgb, p.depth,
            bins.gauss_of_pos, bins.gsort_pos, bins.gseg_start, bins.g_last,
            MAX_DUP)
        return feats[None], bins.owner_blk, bins.seg_first, \
            bins.pstart_blk, bins.counts

    feats, owner, first, pstart, counts = jax.block_until_ready(prep())
    fence(counts)
    print(f"entries: {int(jnp.sum(counts))}, blocks: {owner.shape[0]}")

    # Device-side iteration loops: one host dispatch costs ~25-50 ms through
    # the axon tunnel (CLAUDE.md), so per-call timing is meaningless — chain
    # ITERS kernel applications inside one jit via a scalar data dependency.
    ITERS = 50

    @jax.jit
    def fwd_loop(f):
        def body(_, carry):
            s, f = carry
            out, _ = tr.composite_slab(f * (1.0 + 0.0 * s), owner, first,
                                       pstart, counts, cfg, K, False)
            return s + out[0, 0, 0], f
        s, _ = jax.lax.fori_loop(0, ITERS, body, (jnp.float32(0.0), f))
        return s

    @jax.jit
    def fwdbwd_loop(f):
        def loss(f):
            out, _ = tr.composite_slab(f, owner, first, pstart, counts,
                                       cfg, K, False)
            return jnp.sum(out[:, :, 0:5])

        def body(_, carry):
            s, f = carry
            df = jax.grad(loss)(f * (1.0 + 0.0 * s))
            return s + df[0, 0, 0], f
        s, _ = jax.lax.fori_loop(0, ITERS, body, (jnp.float32(0.0), f))
        return s

    for name, fn in [("fwd", fwd_loop), ("fwd+bwd", fwdbwd_loop)]:
        fence(fn(feats))
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            fence(fn(feats))
        ms = (time.perf_counter() - t0) / (reps * ITERS) * 1000.0
        print(f"{name}: {ms:.2f} ms/iter")

    flags = {k: os.environ.get(k, "0") for k in ("MONOGS_MXU_POWER",)}
    print("flags:", flags)


if __name__ == "__main__":
    main()
