"""Grid-step fixed-cost probe (TPU): what do DEAD slab blocks cost?

The compositing kernels' grid runs over ALL entry_capacity/SLAB blocks;
binning packs live per-tile segments as a prefix, so capacity slack is a
tail of dead blocks (owner = sentinel, 0 live chunks) that skip compute but
still pay the grid-step fixed cost (DMA issue + scalar work + pipeline
bubble; ~6 us/step was measured at BLOCK_CHUNKS=1, ROADMAP dead-ends).

This probe times composite_slab fwd and fwd+bwd at several entry
capacities holding the SAME live entries, plus an all-dead variant
(counts=0), to separate:
  per-live-block cost ~ (t_normal - t_alldead) / live_blocks
  per-dead-block cost ~ slope of t vs capacity blocks at fixed occupancy
If the dead-block slope is material, tight capacities (the occupancy probe)
are a first-order perf lever for both SLAM loops — the mapping window pays
8x the tail every iteration.

Also times a zero-opacity variant (no tile ever saturates -> no chunk
skipping) to quantify how much the dynamic LOG_SKIP saturation skip
already saves on the normal workload.

Serialize with other TPU jobs (one grant)."""

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
    from monogs_tpu.ops.binning import SLAB, tile_bin
    from monogs_tpu.ops.graphics import Intrinsics
    from monogs_tpu.ops.projection import project_gaussians_ch

    W, H, N = 640, 480, 100_000
    TILE, K, MAX_DUP, MAX_DUP_GEN = 32, 2048, 4, 16
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
    ITERS = 50

    def build(e_cap, opa_override=None):
        o = opac if opa_override is None else jnp.full_like(opac, opa_override)

        @jax.jit
        def prep():
            p = project_gaussians_ch(xyz, scales, quats, o,
                                     jnp.eye(3), jnp.zeros(3),
                                     jnp.zeros(3), jnp.zeros(3), intr)
            opa_m = jnp.where(p.valid, p.opacity, 0.0)
            bins = tile_bin(None, p.radius, p.depth, p.valid,
                            img_w=W, img_h=H, tile_size=TILE,
                            tile_capacity=K, max_dup=MAX_DUP,
                            max_dup_gen=MAX_DUP_GEN, entry_capacity=e_cap,
                            opacity=opa_m,
                            conic=(p.ca, p.cb, p.cc), uv=(p.u, p.v))
            feats = tr.pack_features_slab(
                p.u, p.v, p.ca, p.cb, p.cc, opa_m, rgb, p.depth,
                bins.gauss_of_pos, bins.gsort_pos, bins.gseg_start,
                bins.g_last, MAX_DUP)
            return feats[None], bins.owner_blk, bins.seg_first, \
                bins.pstart_blk, bins.counts
        out = jax.block_until_ready(prep())
        fence(out[4])
        return out

    def timed(feats, owner, first, pstart, counts, mode):
        @jax.jit
        def loop(f):
            def loss(f):
                out, _ = tr.composite_slab(f, owner, first, pstart, counts,
                                           cfg, K, False)
                return jnp.sum(out[:, :, 0:5])

            def body(_, carry):
                s, f = carry
                if mode == "fwd":
                    out, _ = tr.composite_slab(
                        f * (1.0 + 0.0 * s), owner, first, pstart, counts,
                        cfg, K, False)
                    return s + out[0, 0, 0], f
                df = jax.grad(loss)(f * (1.0 + 0.0 * s))
                return s + df[0, 0, 0], f
            s, _ = jax.lax.fori_loop(0, ITERS, body, (jnp.float32(0.0), f))
            return s

        fence(loop(feats))
        reps = 3
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fence(loop(feats))
            ts.append((time.perf_counter() - t0) / ITERS * 1000.0)
        return sorted(ts)[reps // 2]

    variants = []
    for e_cap in (161792, 210432, 420864):
        feats, owner, first, pstart, counts = build(e_cap)
        live_blk = int(jnp.sum((counts + SLAB - 1) // SLAB))
        tot_blk = e_cap // SLAB
        row = {"e_cap": e_cap, "blocks": tot_blk, "live_blocks": live_blk,
               "entries": int(jnp.sum(counts))}
        for mode in ("fwd", "fwdbwd"):
            row[mode] = timed(feats, owner, first, pstart, counts, mode)
        variants.append(row)
        print(row, flush=True)

    # All-dead: zero counts (owner map unchanged) — pure fixed cost.
    feats, owner, first, pstart, counts = build(210432)
    z = jnp.zeros_like(counts)
    print({"variant": "all-dead", "blocks": 210432 // SLAB,
           "fwd": timed(feats, owner, first, pstart, z, "fwd"),
           "fwdbwd": timed(feats, owner, first, pstart, z, "fwdbwd")},
          flush=True)

    # No-saturation: constant opacity 0.01 (above the 1/255 cull floor, but
    # 1-alpha=0.99 never saturates a tile) -> the chunk skip never fires.
    feats, owner, first, pstart, counts = build(210432, opa_override=0.01)
    print({"variant": "no-saturation(opa=0.01)",
           "entries": int(jnp.sum(counts)),
           "fwd": timed(feats, owner, first, pstart, counts, "fwd"),
           "fwdbwd": timed(feats, owner, first, pstart, counts, "fwdbwd")},
          flush=True)


if __name__ == "__main__":
    main()
