"""Compare mapping_chunk (static fori/scan) vs mapping_span (nested
while_loop, traced trip counts) on the ROADMAP mapping workload, then
profile mapping_span and aggregate device-op self-times by class.

Purpose (r5, VERDICT task 1b / ROADMAP item 1): the r4 end-of-round device
profile attributed ~5 ms/iter of mapping time to loop-carry/array `copy`
ops (39.7 ms per 8-iter chunk) and asked whether the r4 while_loop carries
in mapping_span introduce copies that XLA did not emit for the fori_loop
in mapping_chunk. This measures both sides A/B on identical state.

Run standalone on the TPU host (serialize with other TPU jobs).
"""

import glob
import gzip
import json
import re
import sys
import time
from collections import defaultdict

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")


def aggregate(logdir):
    files = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True))
    if not files:
        return None, None
    with gzip.open(files[-1], "rt") as f:
        trace = json.load(f)
    pids, tids = {}, {}
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M":
            if ev.get("name") == "process_name":
                pids[ev["pid"]] = ev["args"].get("name", "")
            if ev.get("name") == "thread_name":
                tids[(ev["pid"], ev["tid"])] = ev["args"].get("name", "")
    dev_pids = {p for p, n in pids.items() if "TPU" in n or "/device" in n}
    op_tids = {k for k, n in tids.items()
               if k[0] in dev_pids and n == "XLA Ops"}
    tracks = defaultdict(list)
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "X":
            continue
        if (ev.get("pid"), ev.get("tid", 0)) not in op_tids:
            continue
        tracks[(ev["pid"], ev.get("tid", 0))].append(ev)
    durs = defaultdict(float)
    counts = defaultdict(int)
    for evs in tracks.values():
        evs.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
        stack, entries = [], []
        for ev in evs:
            ts, dur = ev["ts"], ev.get("dur", 0)
            while stack and ts >= stack[-1][0]:
                stack.pop()
            if stack:
                entries[stack[-1][1]][2] += dur
            entries.append([ev.get("name", "?"), dur, 0.0])
            stack.append((ts + dur, len(entries) - 1))
        for name, dur, child in entries:
            durs[name] += max(dur - child, 0.0) / 1e3
            counts[name] += 1
    return durs, counts


def main():
    from monogs_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from bench_mapping import build_state
    from monogs_tpu.slam.mapper import (
        MapperConfig, mapping_chunk, mapping_span,
    )

    state, intr = build_state()
    cfg = MapperConfig(entry_capacity=210432)
    n = cfg.rebin_every
    reps = 5

    results = {}
    for name, call in [
        ("span", lambda st: mapping_span(st, intr, cfg, False, 0, n)),
        ("chunk", lambda st: mapping_chunk(st, intr, cfg, False, n)),
    ]:
        t0 = time.perf_counter()
        st, aux = call(state)
        _ = float(aux.loss)
        compile_s = time.perf_counter() - t0
        per = []
        for _ in range(reps):
            t0 = time.perf_counter()
            st, aux = call(st)
            _ = float(aux.loss)
            per.append((time.perf_counter() - t0) / n * 1000.0)
        per.sort()
        results[name] = per[len(per) // 2]
        print(f"{name}: median {per[len(per) // 2]:.1f} ms/iter "
              f"(min {per[0]:.1f}, max {per[-1]:.1f}; compile {compile_s:.0f}s)",
              flush=True)

    print(json.dumps({"span_ms": round(results['span'], 2),
                      "chunk_ms": round(results['chunk'], 2)}), flush=True)

    # Profile whichever is slower (span expected) and break down by class.
    for tag, call in [
        ("span", lambda st: mapping_span(st, intr, cfg, False, 0, n)),
        ("chunk", lambda st: mapping_chunk(st, intr, cfg, False, n)),
    ]:
        logdir = f"/tmp/{tag}_trace"
        jax.profiler.start_trace(logdir)
        st, aux = call(state)
        _ = float(aux.loss)
        jax.profiler.stop_trace()
        durs, counts = aggregate(logdir)
        if durs is None:
            print(f"{tag}: no trace captured")
            continue
        classes = defaultdict(float)
        for name, d in durs.items():
            classes[re.sub(r"[.\d\-]+$", "", name)] += d
        total = sum(durs.values())
        print(f"\n[{tag}] total device op time: {total:.1f} ms "
              f"({total / n:.1f} ms/iter), top classes:")
        for name, d in sorted(classes.items(), key=lambda kv: -kv[1])[:18]:
            print(f"  {name[:64]:64s} {d:8.2f}")
        with open(f"/tmp/{tag}_trace_ops.txt", "w") as f:
            for name, d in sorted(durs.items(), key=lambda kv: -kv[1]):
                f.write(f"{d:10.3f} {counts[name]:6d} {name}\n")
    print("\nfull op lists -> /tmp/{span,chunk}_trace_ops.txt")


if __name__ == "__main__":
    main()
