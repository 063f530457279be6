"""Microbench: window feature-table pack + slab gather variants (TPU).

The mapping-iteration profile attributes ~15 ms/iter (window 8) to the
per-kf (N+1, 16) feature-table stack/concat that feeds the row gathers
(ROADMAP "Next optimizations" #2). This times isolated variants of the
pack+gather forward and fwd+bwd on the ROADMAP workload (640x480, 131072
capacity / 80k live, window 8, entry_capacity 210432):

  A: current pack_features_window (vmapped stack -> unrolled row gathers)
  S: vmapped table build only (no gather) — isolates the stack cost
  B: per-kf unrolled table build + gather (no vmapped stack)
  C: channel-major (16, N+1) concat + transpose -> row-major gather

Run standalone on the TPU host (serialize with other TPU jobs).
"""

import sys
import time

sys.path.insert(0, "/root/repo")


def fence(x):
    import jax.numpy as jnp
    return float(jnp.ravel(x)[0])


def timeit(fn, *args, reps=20, label=""):
    t0 = time.perf_counter()
    out = fn(*args)
    fence(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        fence(out)
    ms = (time.perf_counter() - t0) / reps * 1000.0
    print(f"{label:36s} {ms:7.2f} ms   (compile {compile_s:.0f}s)")
    return ms


def main():
    import jax
    import jax.numpy as jnp

    from monogs_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from monogs_tpu.ops import tile_raster as tr
    from monogs_tpu.ops.binning import tile_bin
    from monogs_tpu.ops.graphics import Intrinsics
    from monogs_tpu.ops.projection import project_gaussians

    W, H, C, n_live, Wn = 640, 480, 131_072, 80_000, 8
    E_cap = 210_432
    max_dup = 8
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    intr = Intrinsics(fx=520.9, fy=521.0, cx=W / 2, cy=H / 2,
                      width=W, height=H)
    xyz = jnp.concatenate(
        [jax.random.uniform(ks[0], (C, 2), minval=-2.0, maxval=2.0),
         jax.random.uniform(ks[1], (C, 1), minval=0.8, maxval=5.0)], axis=1)
    scales = jnp.exp(jax.random.uniform(ks[2], (C, 3), minval=-5.5,
                                        maxval=-4.0))
    quats = jax.random.normal(ks[3], (C, 4)) + jnp.array([2.0, 0, 0, 0])
    opa = jax.nn.sigmoid(jax.random.normal(ks[4], (C,)))
    rgb = jax.random.uniform(ks[5], (C, 3))
    active = jnp.arange(C) < n_live

    # Per-kf projection + bins (not timed).
    @jax.jit
    def prep(i):
        t = jnp.array([0.02, -0.01, 0.03]) * i
        proj = project_gaussians(xyz, scales, quats, opa, rgb,
                                 jnp.eye(3), t, jnp.zeros(3), jnp.zeros(3),
                                 intr, active=active)
        bins = tile_bin(proj.mean2d, proj.radius, proj.depth, proj.valid,
                        img_w=W, img_h=H, tile_size=32, tile_capacity=2048,
                        max_dup=max_dup, entry_capacity=E_cap,
                        opacity=jnp.where(proj.valid, proj.opacity, 0.0),
                        conic=proj.conic)
        opak = jnp.where(proj.valid, proj.opacity, 0.0)
        return (proj.mean2d, proj.conic, opak, proj.rgb, proj.depth,
                bins.gauss_of_pos, bins.gsort_pos, bins.gseg_start,
                bins.g_last)

    packed = [prep(i) for i in range(Wn)]
    stk = lambda j: jnp.stack([p[j] for p in packed])
    mean2d, conic, opac, rgbw, depth = (stk(j) for j in range(5))
    gop, gsp, gsf, gl = (stk(j) for j in range(5, 9))
    fence(gl)
    print(f"prepared: {Wn} kfs, E_cap {E_cap}, live {n_live}/{C}")

    FR = tr.FEAT_ROWS

    # --- variants ---------------------------------------------------------
    def variant_a(m2, cn, op, rg, dp):
        # channel-form signature; rgb is shared (unbatched) across kfs
        return tr.pack_features_window(
            m2[..., 0], m2[..., 1], cn[..., 0], cn[..., 1], cn[..., 2],
            op, dp, rg[0, :, 0], rg[0, :, 1], rg[0, :, 2],
            gop, gsp, gsf, gl, max_dup)

    def stack_only(m2, cn, op, rg, dp):
        return jax.vmap(tr._stack_features)(m2, cn, op, rg, dp)

    def table_b(m2, cn, op, rg, dp):
        return tr._stack_features(m2, cn, op, rg, dp)

    def variant_b(m2, cn, op, rg, dp):
        rows = jnp.stack([
            jnp.take(table_b(m2[w], cn[w], op[w], rg[w], dp[w]),
                     gop[w], axis=0)
            for w in range(Wn)])
        rows = jax.lax.optimization_barrier(rows)
        return rows.transpose(0, 2, 1)

    def table_c(m2, cn, op, rg, dp):
        N = m2.shape[0]
        cm = jnp.concatenate([
            m2[:, 0][None], m2[:, 1][None],
            cn[:, 0][None], cn[:, 1][None], cn[:, 2][None],
            op[None], rg[:, 0][None], rg[:, 1][None], rg[:, 2][None],
            dp[None],
            jnp.zeros((FR - 10, N), jnp.float32),
        ], axis=0)                                   # (16, N)
        cm = jnp.pad(cm, ((0, 0), (0, 1)))           # sentinel column
        return cm.T                                  # (N+1, 16)

    def variant_c(m2, cn, op, rg, dp):
        rows = jnp.stack([
            jnp.take(jax.lax.optimization_barrier(
                table_c(m2[w], cn[w], op[w], rg[w], dp[w])), gop[w], axis=0)
            for w in range(Wn)])
        rows = jax.lax.optimization_barrier(rows)
        return rows.transpose(0, 2, 1)

    variants = [("A current pack_features_window", variant_a),
                ("S vmapped stack only (no gather)", stack_only),
                ("B per-kf table + gather", variant_b),
                ("C channel-major concat+T + gather", variant_c)]

    args = (mean2d, conic, opac, rgbw, depth)
    for label, fn in variants:
        timeit(jax.jit(fn), *args, label=label + " [fwd]")

    # fwd+bwd only for A (its custom VJP is the shared production backward;
    # B/C under plain autodiff would time the scatter-add pathology instead).
    def loss(*a):
        return jnp.sum(variant_a(*a) ** 2)

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
    timeit(lambda *a: g(*a)[0], *args, label="A [fwd+bwd]")


if __name__ == "__main__":
    main()
