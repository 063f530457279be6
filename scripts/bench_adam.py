"""Microbench: masked-Adam latency vs parameter-array layout (TPU).

The mapping-iteration profile puts ~19 ms/iter in "Adam/rest". The params
pytree stores (C,3)/(C,4) arrays whose minor dim occupies 3-4 of 128 TPU
lanes (CLAUDE.md lane-waste fact). This times adam_step on the production
pytree (C=131072) in three layouts:

  R row-major    xyz (C,3), quats (C,4), ... (current storage)
  T channel-major xyz (3,C), quats (4,C), ...
  F flat         every leaf reshaped to 1-D

Run standalone on the TPU host (serialize with other TPU jobs).
"""

import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from monogs_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from monogs_tpu.models.optim import adam_step, init_adam

    C = 131_072
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    params = {
        "xyz": jax.random.normal(ks[0], (C, 3)),
        "log_scales": jax.random.normal(ks[1], (C, 3)),
        "quats": jax.random.normal(ks[2], (C, 4)),
        "opacity_logit": jax.random.normal(ks[3], (C,)),
        "rgb": jax.random.normal(ks[4], (C, 3)),
    }
    lrs = {k: 1e-3 for k in params}
    grads = jax.tree.map(lambda x: x * 0.01, params)

    def fence(tree):
        leaf = jax.tree.leaves(tree)[0]
        return float(jnp.ravel(leaf)[0])

    def run(label, p):
        g = jax.tree.map(lambda x: x * 0.01, p)
        st = init_adam(p)
        f = jax.jit(lambda p_, g_, s_: adam_step(p_, g_, s_, lrs))
        t0 = time.perf_counter()
        out = f(p, g, st)
        fence(out[0])
        compile_s = time.perf_counter() - t0
        reps = 50
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(p, g, st)
            fence(out[0])
        ms = (time.perf_counter() - t0) / reps * 1000.0
        print(f"{label:24s} {ms:7.3f} ms  (compile {compile_s:.0f}s)")

    run("R row-major (C,3)", params)
    run("T channel-major (3,C)", {k: (v.T if v.ndim == 2 else v)
                                  for k, v in params.items()})
    run("F flat 1-D", jax.tree.map(lambda x: x.reshape(-1), params))


if __name__ == "__main__":
    main()
