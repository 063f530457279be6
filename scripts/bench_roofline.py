"""Roofline memo data: empirical VPU op ceilings vs compositing kernels.

Round-2 VERDICT #1a: convert "the compositing kernels are VPU-bound"
(ROADMAP.md) into a %-of-floor number. Three measurements on the real chip:

1. Pallas microbenchmarks of the per-element op classes the kernel's inner
   loop is made of — fused mul/add chains and transcendentals (exp, log1p)
   — on the kernel's own (P, CHUNK) block shape. This gives the empirical
   per-element ns the VPU can sustain, independent of any spec sheet.
2. The tracking workload's pair count: sum over tiles of
   ceil(count_t / CHUNK) * CHUNK * P — every (pixel, slot) pair the kernel
   actually evaluates (capacity padding included, LOG_SKIP not credited).
3. The measured composite_slab fwd / fwd+bwd latency on that workload
   (scripts/bench_kernel.py's numbers, re-measured here).

Floor model (documented assumption): transcendentals and elementwise math
share the VPU, so floor = pairs * (n_transcendental * t_exp + n_flops *
t_fma); MXU matmuls (prefix sums, color accumulation, K<=6 contractions)
overlap with VPU work and are not charged (measured: bf16 prefix matmuls
changed nothing — tile_raster._prefix_dot note).

Per-pair op counts (read from ops/tile_raster.py kernels):
  fwd: 3 transcendentals (exp(power), log1p(-alpha), exp(logT+excl)),
       ~20 elementwise flops (quadratic 9, clip/where 6, w/acc updates 5).
  bwd: 3 transcendentals + 1 divide (S/(1-alpha)) + ~30 elementwise flops
       (replay 15 + cotangent/moment math 15).

Serialize with other TPU jobs (one grant).
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def fence(x):
    import jax.numpy as jnp

    return float(jnp.ravel(x)[0])


def op_microbench(op: str, n_rep: int = 512, blocks: int = 256, lanes: int = 4):
    """Per-element latency of one VPU op class, measured on the kernel's
    (P, CHUNK)=(1024, 128) block shape. `lanes` INDEPENDENT chains run in
    the loop body so the measurement is throughput (ILP-exposed), not
    dependent-chain latency — a single chain measured ~4x slower than the
    production kernels' effective rate."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    P, C = 1024, 128

    def one(acc, k):
        if op == "exp":
            return jnp.exp(-jnp.abs(acc)) + 1e-3 * k
        if op == "log1p":
            return -jnp.log1p(-jnp.minimum(jnp.abs(acc), 0.9)) + 1e-3 * k
        if op == "fma":
            return acc * 0.9995 + 1e-4 * k
        if op == "div":
            return 1.0 / (jnp.abs(acc) + 1.0 + 1e-3 * k)
        raise ValueError(op)

    def kern(x_ref, o_ref):
        def body(i, accs):
            return tuple(one(a, k + 1) for k, a in enumerate(accs))

        x = x_ref[...]
        accs = jax.lax.fori_loop(
            0, n_rep, body,
            tuple(x * (1.0 + 0.01 * k) for k in range(lanes)),
        )
        acc = accs[0]
        for a in accs[1:]:
            acc = acc + a
        o_ref[...] = acc

    x = jnp.ones((blocks, P, C), jnp.float32) * 0.5

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((1, P, C), jnp.float32),
            grid=(blocks,),
            in_specs=[pl.BlockSpec((1, P, C), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, P, C), lambda b: (0, 0, 0),
                                   memory_space=pltpu.VMEM),
        )(x)

    fence(run(x))
    reps = 3
    t0 = time.perf_counter()
    for _ in range(reps):
        fence(run(x))
    dt = (time.perf_counter() - t0) / reps
    n_elem = blocks * P * C * n_rep * lanes
    return dt / n_elem * 1e9  # ns per element-op


def main():
    import jax
    import jax.numpy as jnp

    from monogs_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    rates = {}
    for op in ("fma", "exp", "log1p", "div"):
        rates[op] = op_microbench(op)
        print(f"{op}: {rates[op]:.4f} ns/elem "
              f"({1.0 / rates[op]:.2f} Gelem/s)", flush=True)

    # Workload pair count (bench.py tracking scene, tile 32, K=2048).
    import monogs_tpu.ops.binning as binning
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
    intr = Intrinsics(fx=520.9, fy=521.0, cx=W / 2, cy=H / 2,
                      width=W, height=H)
    p = project_gaussians_ch(xyz, scales, quats, opac,
                             jnp.eye(3), jnp.zeros(3),
                             jnp.zeros(3), jnp.zeros(3), intr)
    bins = tile_bin(None, p.radius, p.depth, p.valid,
                    img_w=W, img_h=H, tile_size=TILE, tile_capacity=K,
                    max_dup=MAX_DUP, entry_capacity=E_CAP,
                    opacity=jnp.where(p.valid, p.opacity, 0.0),
                    conic=(p.ca, p.cb, p.cc), uv=(p.u, p.v),
                    max_dup_gen=16)
    counts = bins.counts
    CHUNK = binning.CHUNK
    P = TILE * TILE
    entries = int(jnp.sum(counts))
    chunks = int(jnp.sum((counts + CHUNK - 1) // CHUNK))
    pairs = chunks * CHUNK * P
    print(f"entries {entries}, padded chunks {chunks}, "
          f"pairs {pairs / 1e6:.1f} M")

    # Floors (ns -> ms), assumption: transcendental + flops share the VPU.
    t_fma, t_exp, t_log, t_div = (rates[k] for k in
                                  ("fma", "exp", "log1p", "div"))
    floor_fwd_ms = pairs * (t_exp * 2 + t_log + 20 * t_fma) / 1e6
    floor_bwd_ms = pairs * (t_exp * 2 + t_log + t_div + 30 * t_fma) / 1e6
    out = {
        "rates_ns_per_elem": {k: round(v, 4) for k, v in rates.items()},
        "pairs_M": round(pairs / 1e6, 1),
        "entries": entries,
        "floor_fwd_ms": round(floor_fwd_ms, 3),
        "floor_fwdbwd_ms": round(floor_fwd_ms + floor_bwd_ms, 3),
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
