"""Decompose ONE keyframe mapping event (kf.optimize analogue) on the
flagship workload: where do 14.35 s/event go — spans (device) vs densify vs
visibility vs readbacks? Run standalone on the TPU host."""
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")  # bench_mapping import

from monogs_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench_mapping import build_state  # noqa: E402
from monogs_tpu.slam.mapper import (  # noqa: E402
    MapperConfig, _span_args, densify_event, mapping_span, run_optimize_map,
    visibility_pass,
)

state, intr = build_state()
cfg = MapperConfig(entry_capacity=225280, converged_eps=2.0e-4,
                   converged_patience=6, gaussian_reset=1000000)


def fence(x):
    return float(jnp.asarray(x).reshape(-1)[0])


def timed(name, fn, reps=2):
    # first call may compile; report each rep
    outs = []
    for i in range(reps):
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        print(f"  {name} rep{i}: {dt:.3f}s", flush=True)
        outs.append(out)
    return outs[-1]


print("== mapping_span (150 iters, eps on) ==", flush=True)
n_seg, tail = _span_args(150, cfg.rebin_every)


def span_call():
    st, aux = mapping_span(state, intr, cfg, False, n_seg, tail)
    fence(aux.loss)
    return st, aux


st, aux = timed("span150", span_call, reps=3)

print("== overflow readback marginal ==", flush=True)
t0 = time.perf_counter()
ov = int(aux.overflow)
print(f"  int(aux.overflow) after fenced span: {time.perf_counter()-t0:.3f}s",
      flush=True)

print("== densify_event ==", flush=True)


def dens_call():
    st2, _ = densify_event(st, cfg, init_phase=False)
    fence(st2.gmap.params["xyz"])
    return st2


timed("densify", dens_call, reps=3)

print("== visibility_pass ==", flush=True)


def vis_call():
    v = visibility_pass(st, intr, cfg)
    fence(v)
    return v


timed("visibility", vis_call, reps=3)

print("== run_optimize_map(150) end to end ==", flush=True)


def rom_call():
    st3, vis = run_optimize_map(state, intr, cfg, 150)
    fence(vis)
    return st3


timed("run_optimize_map", rom_call, reps=3)
print("done", flush=True)
