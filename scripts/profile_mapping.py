"""Capture a device trace of one mapping_chunk and print top ops by time.

Runs the ROADMAP mapping workload (window 8, 131072 cap / 80k live,
640x480), captures a jax.profiler trace of one warm 8-iteration chunk, and
aggregates TPU op durations from the trace-viewer JSON. Output guides
kernel-level optimization (which XLA fusions / Pallas kernels dominate an
85 ms mapping iteration).

Run standalone on the TPU host (serialize with other TPU jobs).
"""

import glob
import gzip
import json
import sys
import time
from collections import defaultdict

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")


def main():
    import jax

    from monogs_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bench_mapping import build_state
    from monogs_tpu.slam.mapper import MapperConfig, mapping_chunk

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
    print(f"config: tile {tile} K {kcap} E {ecap} dup {mdup}/{mgen}")

    t0 = time.perf_counter()
    st, aux = mapping_chunk(state, intr, cfg, False, n_steps)
    _ = float(aux.loss)
    print(f"compile+first: {time.perf_counter() - t0:.1f}s")
    st, aux = mapping_chunk(st, intr, cfg, False, n_steps)
    _ = float(aux.loss)

    logdir = "/tmp/mapping_trace"
    jax.profiler.start_trace(logdir)
    st, aux = mapping_chunk(st, intr, cfg, False, n_steps)
    _ = float(aux.loss)
    jax.profiler.stop_trace()

    files = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True))
    if not files:
        print("no trace files found under", logdir)
        return
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)

    # Aggregate complete events by name on TPU device tracks (pid of the
    # device track carries 'TPU' in its process_name metadata).
    pids = {}
    tids = {}
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M":
            if ev.get("name") == "process_name":
                pids[ev["pid"]] = ev["args"].get("name", "")
            if ev.get("name") == "thread_name":
                tids[(ev["pid"], ev["tid"])] = ev["args"].get("name", "")
    dev_pids = {p for p, n in pids.items() if "TPU" in n or "/device" in n}
    # Only the "XLA Ops" lane holds leaf op spans; "Steps"/"XLA Modules"
    # duplicate the same wall time as parent groupings.
    op_tids = {k for k, n in tids.items()
               if k[0] in dev_pids and n == "XLA Ops"}

    # SELF time per event: trace spans nest (jit > while > op); summing raw
    # durations double-counts parents (the r2 profile showed 248 "ms/iter"
    # for a 64 ms iteration). Subtract each event's children via a stack
    # sweep per (pid, tid) track.
    tracks = defaultdict(list)
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "X":
            continue
        if (ev.get("pid"), ev.get("tid", 0)) not in op_tids:
            continue
        tracks[(ev["pid"], ev.get("tid", 0))].append(ev)

    durs = defaultdict(float)
    counts = defaultdict(int)
    total = 0.0
    for evs in tracks.values():
        evs.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
        stack = []  # (end_ts, child_total_accum index into entries)
        entries = []  # mutable [name, dur, child_total]
        for ev in evs:
            ts = ev["ts"]
            dur = ev.get("dur", 0)
            while stack and ts >= stack[-1][0]:
                stack.pop()
            if stack:
                entries[stack[-1][1]][2] += dur
            entries.append([ev.get("name", "?"), dur, 0.0])
            stack.append((ts + dur, len(entries) - 1))
        for name, dur, child in entries:
            self_ms = max(dur - child, 0.0) / 1e3
            durs[name] += self_ms
            counts[name] += 1
            total += self_ms
    print(f"\ntotal device op time in chunk: {total:.1f} ms "
          f"({n_steps} iters -> {total / n_steps:.1f} ms/iter)")
    print(f"{'op':70s} {'ms':>8s} {'n':>5s}")
    ranked = sorted(durs.items(), key=lambda kv: -kv[1])
    for name, d in ranked[:40]:
        print(f"{name[:70]:70s} {d:8.2f} {counts[name]:5d}")

    # Tail composition by op-class (strip trailing .N id).
    import re

    classes = defaultdict(float)
    for name, d in ranked[40:]:
        classes[re.sub(r"[.\d]+$", "", name)] += d
    tail = sum(d for _, d in ranked[40:])
    print(f"\ntail (ops beyond top-40): {tail:.1f} ms, by class:")
    for name, d in sorted(classes.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {name[:66]:66s} {d:8.2f}")

    with open("/tmp/mapping_trace_ops.txt", "w") as f:
        for name, d in ranked:
            f.write(f"{d:10.3f} {counts[name]:6d} {name}\n")
    print("\nfull op list -> /tmp/mapping_trace_ops.txt")


if __name__ == "__main__":
    main()
