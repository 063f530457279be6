"""Evidence for collective/compute overlap in parallel/overlap.py
(VERDICT r3 missing #4; BASELINE north star: "gradient all-reduce over ICI
overlapped with the backward tile pass").

The rig has ONE real TPU chip, so a live multi-chip trace is impossible —
but jax.experimental.topologies supports AOT compilation against an
abstract v5e 2x4 topology. The OPTIMIZED TPU HLO of the shard_map step is
post-scheduling: XLA's latency-hiding scheduler has already rewritten
collectives into async start/done pairs and placed them. Counting the
compute ops scheduled BETWEEN each start and its done IS the overlap:
those fusions execute on the TensorCore while the collective rides ICI.

Run: python scripts/overlap_trace.py          (TPU AOT; no chip needed)
     python scripts/overlap_trace.py --cpu    (8-virt-device smoke; NOTE
     XLA:CPU lowers psum_scatter to all-reduce+slice and runs collectives
     synchronously — structure only, no overlap evidence there)

Findings are recorded in docs/OVERLAP.md.
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


def build(mesh, n_kf=8):
    from monogs_tpu.ops.graphics import Intrinsics
    from monogs_tpu.parallel.overlap import make_overlap_step
    from monogs_tpu.slam.camera import make_frame, window_from_list
    from monogs_tpu.slam.mapper import MapperConfig, init_mapper_state

    W, H = 64, 48
    intr = Intrinsics(fx=50.0, fy=50.0, cx=W / 2, cy=H / 2, width=W, height=H)
    rng = np.random.RandomState(0)
    frames = []
    for i in range(n_kf):
        rgb = jnp.asarray(rng.rand(H, W, 3), jnp.float32)
        depth = jnp.asarray(rng.uniform(1.0, 3.0, (H, W)), jnp.float32)
        T = np.eye(4)
        T[:3, 3] = [0.01 * i, 0, 0]
        frames.append(make_frame(i, rgb, depth, jnp.asarray(T)))
    window = window_from_list(frames, n_kf)
    state = init_mapper_state(4096, 1, window, seed=0)
    params = dict(state.gmap.params)
    params["xyz"] = jnp.asarray(
        rng.uniform(-1, 1, (4096, 3)) + np.array([0, 0, 2.0]), jnp.float32)
    params["rgb"] = jnp.asarray(rng.rand(4096, 3), jnp.float32)
    gmap = state.gmap._replace(
        params=params, active=jnp.ones((4096,), bool))
    state = state._replace(gmap=gmap)

    cfg = MapperConfig(tile_size=16, tile_capacity=256, max_dup=8,
                       backend="ref")
    step = make_overlap_step(mesh, intr, cfg)
    return step, state


def analyze(hlo: str):
    """Post-scheduling instruction walk of the entry computation: for each
    async collective start/done pair, count fusions/computation ops
    scheduled between them (= overlapped compute)."""
    # Entry computation body only.
    m = re.search(r"^ENTRY [^\n]*\{(.*?)^\}", hlo, re.S | re.M)
    body = m.group(1).splitlines() if m else hlo.splitlines()

    COMPUTE = ("fusion", "convolution", "dot", "custom-call")
    starts = {}     # pair key -> pos
    pairs = []      # (kind, start_pos, done_pos)
    compute_pos = []
    for i, ln in enumerate(body):
        ln = ln.strip()
        mm = re.match(r"%?([\w.\-]+) = ", ln)
        if not mm:
            continue
        name = mm.group(1)
        # The opcode follows the (possibly tuple/layout-annotated) type:
        # `%n = f32[..]{..} fusion(...)` / `%n = (f32[..], ..) while(...)`.
        om = re.search(r"[\}\])\]] ([a-z][\w\-]*)\(", ln)
        op = om.group(1) if om else ""
        # v5e async machinery: collectives appear as kCustom fusions named
        # async-collective-start[.k] / async-collective-done[.k] (the
        # start fusion may CONTAIN compute — "async collective fusion").
        sm = re.match(r"(?:async-collective|[\w\-]+?)-start(\.\d+)?$", name)
        dm = re.match(r"(?:async-collective|[\w\-]+?)-done(\.\d+)?$", name)
        if sm and ("start" in name):
            starts[name.replace("-start", "")] = (i, name)
        elif dm and ("done" in name):
            key = name.replace("-done", "")
            if key in starts:
                sp, sname = starts[key]
                pairs.append((sname, sp, i))
        elif any(op.startswith(c) for c in COMPUTE) or op in ("while",):
            compute_pos.append(i)

    print(f"entry: {len(compute_pos)} compute ops, "
          f"{len(pairs)} async collective pairs")
    total_overlapped = 0
    for kind, sp, dp in pairs:
        n_in = sum(1 for p in compute_pos if sp < p < dp)
        total_overlapped += n_in
        print(f"  {kind:24s} span {dp - sp:5d} instrs, "
              f"{n_in:4d} compute ops scheduled inside")
    return len(pairs), total_overlapped


def main():
    if "--cpu" in sys.argv:
        from monogs_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(8)
        step, state = build(mesh)
        from monogs_tpu.parallel.mesh import shard_mapper_state

        state = shard_mapper_state(state, mesh)
        hlo = step.lower(state).compile().as_text()
        analyze(hlo)
        st, aux = step(state)
        jax.block_until_ready(aux.loss)
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            st, aux = step(st)
            jax.block_until_ready(aux.loss)
            times.append(time.perf_counter() - t0)
        print(f"step wall (8-dev CPU mesh): {sorted(times)[2]*1000:.1f} ms")
        return

    from jax.experimental import topologies
    from jax.sharding import Mesh, NamedSharding

    from monogs_tpu.parallel.mesh import WINDOW_AXIS
    from monogs_tpu.parallel.overlap import _state_specs

    topo = topologies.get_topology_desc(
        platform="tpu", topology_name="v5e:2x4",
        chips_per_host_bounds=(2, 4, 1), num_slices=1,
    )
    mesh = Mesh(np.array(topo.devices), (WINDOW_AXIS,))
    step, state = build(mesh)
    specs = _state_specs(state)
    shapes = jax.tree.map(
        lambda x, s: jax.ShapeDtypeStruct(
            jnp.shape(x), jnp.result_type(x),
            sharding=NamedSharding(mesh, s)),
        state, specs,
    )
    print("AOT-compiling the overlap step for v5e 2x4 ...", flush=True)
    compiled = step.lower(shapes).compile()
    hlo = compiled.as_text()
    n_pairs, n_over = analyze(hlo)
    out = "/tmp/overlap_tpu_hlo.txt"
    with open(out, "w") as f:
        f.write(hlo)
    print(f"full optimized HLO -> {out}")
    if n_pairs == 0:
        print("NO async collective pairs found — scheduler serialized; "
              "see docs/OVERLAP.md for implications")


if __name__ == "__main__":
    main()
