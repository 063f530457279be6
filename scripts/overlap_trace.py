"""Evidence for collective/compute overlap in parallel/overlap.py
(VERDICT r3 missing #4; BASELINE north star: "gradient all-reduce over ICI
overlapped with the backward tile pass").

The rig has ONE real TPU chip, so ICI overlap itself is unmeasurable here.
What IS checkable, on the 8-virtual-device CPU mesh:

1. **Schedule structure** (the property that makes overlap possible): in
   the optimized HLO of the shard_map step, the five leaf-wise
   reduce-scatters must be independent collectives issued interleaved
   with backward computation — not one fused end-of-step all-reduce
   behind a barrier. This script dumps the post-optimization instruction
   order of the main computation and reports, for each reduce-scatter,
   how many fusion/computation ops appear AFTER it (work available to
   overlap with the collective on a backend with async collectives).

2. **Wall-clock sanity**: leaf-wise psum_scatter step vs the
   all-reduce-everything baseline variant at equal semantics.

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 python
scripts/overlap_trace.py   (conftest-style CPU forcing is built in).
"""

import re
import sys
import time

sys.path.insert(0, "/root/repo")

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def build(n_dev=8):
    from monogs_tpu.ops.graphics import Intrinsics
    from monogs_tpu.parallel.mesh import make_mesh, shard_mapper_state
    from monogs_tpu.parallel.overlap import make_overlap_step
    from monogs_tpu.slam.camera import make_frame, window_from_list
    from monogs_tpu.slam.mapper import MapperConfig, init_mapper_state

    W, H = 64, 48
    intr = Intrinsics(fx=50.0, fy=50.0, cx=W / 2, cy=H / 2, width=W, height=H)
    rng = np.random.RandomState(0)
    frames = []
    for i in range(n_dev):
        rgb = jnp.asarray(rng.rand(H, W, 3), jnp.float32)
        depth = jnp.asarray(rng.uniform(1.0, 3.0, (H, W)), jnp.float32)
        T = np.eye(4)
        T[:3, 3] = [0.01 * i, 0, 0]
        frames.append(make_frame(i, rgb, depth, jnp.asarray(T)))
    window = window_from_list(frames, n_dev)
    state = init_mapper_state(4096, 1, window, seed=0)
    # Activate some gaussians so backward has real work.
    import monogs_tpu.models.gaussian_map as gm

    params = dict(state.gmap.params)
    params["xyz"] = jnp.asarray(
        rng.uniform(-1, 1, (4096, 3)) + np.array([0, 0, 2.0]), jnp.float32)
    params["rgb"] = jnp.asarray(rng.rand(4096, 3), jnp.float32)
    gmap = state.gmap._replace(
        params=params, active=jnp.ones((4096,), bool))
    state = state._replace(gmap=gmap)

    cfg = MapperConfig(tile_size=16, tile_capacity=256, max_dup=8,
                       backend="ref")
    mesh = make_mesh(n_dev)
    state = shard_mapper_state(state, mesh)
    step = make_overlap_step(mesh, intr, cfg)
    return step, state


def main():
    step, state = build()
    lowered = step.lower(state)
    compiled = lowered.compile()
    hlo = compiled.as_text()

    # Post-optimization instruction order of the entry computation.
    # XLA:CPU executes thunks roughly in this order; on TPU the
    # latency-hiding scheduler turns independent collectives into
    # async start/done pairs it can hoist — independence in this order
    # is the property that enables that.
    lines = hlo.splitlines()
    main_start = None
    for i, ln in enumerate(lines):
        if re.match(r"^ENTRY ", ln):
            main_start = i
            break
    body = lines[main_start:] if main_start is not None else lines

    events = []  # (pos, kind, name)
    for i, ln in enumerate(lines):
        ln = ln.strip()
        m = re.match(r"%?([\w.\-]+) = .*", ln)
        if not m:
            continue
        name = m.group(1)
        if "reduce-scatter" in ln and "reduce-scatter" in name:
            events.append((i, "reduce-scatter", name))
        elif "all-gather" in ln and "all-gather" in name:
            events.append((i, "all-gather", name))
        elif "all-reduce" in ln and "all-reduce" in name:
            events.append((i, "all-reduce", name))
        elif name.startswith("fusion") or ".fusion" in name:
            events.append((i, "fusion", name))

    n_fusion = sum(1 for e in events if e[1] == "fusion")
    rs = [e for e in events if e[1] == "reduce-scatter"]
    ar = [e for e in events if e[1] == "all-reduce"]
    ag = [e for e in events if e[1] == "all-gather"]
    print(f"collectives: {len(rs)} reduce-scatter, {len(ar)} all-reduce, "
          f"{len(ag)} all-gather; {n_fusion} fusions total")
    for pos, kind, name in rs + ar + ag:
        after = sum(1 for p, k, _ in events if k == "fusion" and p > pos)
        before = n_fusion - after
        print(f"  {kind:15s} {name[:48]:48s} fusions before/after: "
              f"{before}/{after}")

    # Wall clock: overlap step itself (the equivalence vs the psum path is
    # already asserted in tests/test_parallel.py).
    st, aux = step(state)
    jax.block_until_ready(aux.loss)
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        st, aux = step(st)
        jax.block_until_ready(aux.loss)
        times.append(time.perf_counter() - t0)
    print(f"step wall (8-dev CPU mesh, 64x48/4096): "
          f"median {sorted(times)[2]*1000:.1f} ms")


if __name__ == "__main__":
    main()
