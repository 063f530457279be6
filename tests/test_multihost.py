"""Multi-host execution: a REAL two-process jax.distributed run.

Two CPU processes with 4 virtual devices each form one 8-device global
mesh; each runs the sharded mapping step (window axis over the global
mesh, map replicated, XLA-inserted cross-process collectives) and both
must agree on the loss. This exercises the code path a TPU pod slice
uses (parallel/distributed.py), which cannot be covered in-process.
"""

import os
import re
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
sys.path.insert(0, os.environ["MONOGS_REPO"])
import jax
jax.config.update("jax_platforms", "cpu")

from monogs_tpu.parallel.distributed import (
    initialize_distributed, is_primary, sync_hosts)

rank = int(os.environ["MONOGS_RANK"])
initialize_distributed(os.environ["MONOGS_COORD"], 2, rank)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4

import jax.numpy as jnp
from monogs_tpu.ops.graphics import Intrinsics
from monogs_tpu.slam.camera import make_frame, window_from_list
from monogs_tpu.slam.mapper import MapperConfig, init_mapper_state, mapping_step
from monogs_tpu.parallel.mesh import make_mesh, shard_mapper_state

W, H, N = 64, 48, 256
intr = Intrinsics(fx=60.0, fy=60.0, cx=W / 2, cy=H / 2, width=W, height=H)
key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 8)
frames = [
    make_frame(
        i,
        jax.random.uniform(jax.random.fold_in(ks[6], i), (H, W, 3)),
        jax.random.uniform(jax.random.fold_in(ks[7], i), (H, W),
                           minval=0.5, maxval=4.0),
        jnp.eye(4),
    )
    for i in range(8)
]
window = window_from_list(frames, 8)
state = init_mapper_state(N, 1, window)
params = dict(state.gmap.params)
params["xyz"] = jnp.concatenate(
    [jax.random.uniform(ks[0], (N, 2), minval=-0.5, maxval=0.5),
     jax.random.uniform(ks[1], (N, 1), minval=1.0, maxval=3.0)], axis=1)
params["log_scales"] = jax.random.uniform(ks[2], (N, 3), minval=-3.5,
                                          maxval=-2.5)
params["quats"] = jax.random.normal(ks[3], (N, 4)) + jnp.array([2., 0, 0, 0])
params["opacity_logit"] = jax.random.normal(ks[4], (N,))
params["rgb"] = jax.random.uniform(ks[5], (N, 3))
state = state._replace(gmap=state.gmap._replace(
    params=params, active=jnp.ones((N,), bool)))

mesh = make_mesh()           # global: spans both processes' devices
assert mesh.devices.size == 8
state = shard_mapper_state(state, mesh)
cfg = MapperConfig(tile_size=16, tile_capacity=256, max_dup=8)
state, aux = mapping_step(state, intr, cfg, init=False)
loss = float(aux.loss)
sync_hosts("done")

# --- DCN-aware 2-level (host, ici) mesh: placement assertions + one step.
from monogs_tpu.parallel.mesh import (
    HOST_AXIS, ICI_AXIS, make_mesh_2level, window_sharding,
    gaussian_sharding)
from jax.sharding import PartitionSpec as P

mesh2 = make_mesh_2level()
assert mesh2.axis_names == (HOST_AXIS, ICI_AXIS)
assert mesh2.shape[HOST_AXIS] == 2 and mesh2.shape[ICI_AXIS] == 4
# Each mesh row must hold exactly one process's devices: the host axis IS
# the process (DCN) axis.
for r in range(2):
    row_procs = {d.process_index for d in mesh2.devices[r]}
    assert row_procs == {r}, (r, row_procs)
assert window_sharding(mesh2).spec == P((HOST_AXIS, ICI_AXIS))
assert gaussian_sharding(mesh2).spec == P(ICI_AXIS)

state2 = init_mapper_state(N, 1, window)
state2 = state2._replace(gmap=state2.gmap._replace(
    params=params, active=jnp.ones((N,), bool)))
state2 = shard_mapper_state(state2, mesh2)
# Window keyframes split host-major over both axes; the ZeRO Adam moments
# shard over the ICI axis only (replicated across hosts): the Adam
# reduce-scatter/all-gather cycle never crosses DCN.
rgb_sh = state2.window.frames.rgb.sharding
assert rgb_sh.spec == P((HOST_AXIS, ICI_AXIS)), rgb_sh.spec
mu_sh = state2.adam.mu["xyz"].sharding
assert mu_sh.spec == P(ICI_AXIS), mu_sh.spec
# A moment shard must be addressable on every host (host-replication).
assert len({d.process_index for d in mu_sh.device_set}) == 2
state2, aux2 = mapping_step(state2, intr, cfg, init=False)
loss2 = float(aux2.loss)
assert abs(loss2 - loss) < 1e-5, (loss2, loss)
sync_hosts("done2")
print(f"MULTIHOST_OK rank={rank} primary={is_primary()} loss={loss:.6f} "
      f"loss2={loss2:.6f}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_global_mesh(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = []
    for rank in range(2):
        env = dict(os.environ)
        env.update(
            MONOGS_REPO=REPO,
            MONOGS_RANK=str(rank),
            MONOGS_COORD=coord,
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            JAX_PLATFORMS="cpu",
        )
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-3000:]}"
        assert "MULTIHOST_OK" in out, out[-3000:]
    losses = [
        float(re.search(r"loss=([-\d.]+)", o).group(1)) for o in outs
    ]
    assert losses[0] == pytest.approx(losses[1], abs=1e-6)
    assert "primary=True" in outs[0] and "primary=False" in outs[1]
