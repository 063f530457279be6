"""Device mesh construction and sharding specs for the SLAM state.

The reference's only parallelism is OS processes on one GPU (SURVEY.md §2.3);
the TPU-native scaling axis is the *mapping window*: each device renders and
differentiates its shard of keyframes, and Gaussian-parameter gradients
all-reduce over ICI. Implementation follows the mesh + sharding-annotation
recipe: annotate the window's leading axis with P("win"), replicate the map,
jit the existing batched mapping step, and let XLA's SPMD partitioner insert
the psum collectives.

Multi-host: initialize jax.distributed before calling make_mesh(); the mesh
spans all global devices and the same code runs per host.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

WINDOW_AXIS = "win"
# Two-level (DCN-aware) mesh axes: "host" strides the data-center network
# between processes, "ici" the chip interconnect within one host's devices.
HOST_AXIS = "host"
ICI_AXIS = "ici"


def make_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (WINDOW_AXIS,))


def make_mesh_2level(devices=None) -> Mesh:
    """(host, ici) mesh: rows group devices by owning process, so axis 0
    collectives ride DCN and axis 1 collectives stay on intra-host ICI.

    Sharding layout built on it (VERDICT r4 task 9 / SURVEY §2.3 TPU plan):
    the keyframe window splits host-major over BOTH axes (cross-host
    traffic is the per-iteration map-gradient sum only — one all-reduce of
    the (C,) channel gradients, hierarchical: ICI reduce per host, then
    the small DCN hop), while the ZeRO optimizer state shards over the ICI
    axis only — the reduce-scatter feeding the sharded Adam update and the
    parameter all-gather after it never leave a host."""
    devices = list(jax.devices()) if devices is None else list(devices)
    by_proc: dict[int, list] = {}
    for d in devices:
        by_proc.setdefault(d.process_index, []).append(d)
    counts = {len(v) for v in by_proc.values()}
    if len(counts) != 1:
        raise ValueError(
            f"heterogeneous device counts per process: "
            f"{ {k: len(v) for k, v in by_proc.items()} }")
    rows = [by_proc[k] for k in sorted(by_proc)]
    return Mesh(np.array(rows), (HOST_AXIS, ICI_AXIS))


def is_2level(mesh: Mesh) -> bool:
    return HOST_AXIS in mesh.axis_names


def window_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (window) axis sharded across devices (host-major on a
    2-level mesh: a host's keyframes are contiguous)."""
    if is_2level(mesh):
        return NamedSharding(mesh, P((HOST_AXIS, ICI_AXIS)))
    return NamedSharding(mesh, P(WINDOW_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def gaussian_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (gaussian capacity) axis sharding for the ZeRO-style
    optimizer state. On a 2-level mesh the capacity shards over the ICI
    axis ONLY (replicated across hosts): the per-iteration
    reduce-scatter + Adam + all-gather cycle stays ICI-local, and only
    the raw gradient sum crosses DCN."""
    if is_2level(mesh):
        return NamedSharding(mesh, P(ICI_AXIS))
    return NamedSharding(mesh, P(WINDOW_AXIS))


def _zero_divisor(mesh: Mesh) -> int:
    """Mesh size the ZeRO capacity axis must divide."""
    if is_2level(mesh):
        return mesh.shape[ICI_AXIS]
    return mesh.devices.size


def shard_mapper_state(state, mesh: Mesh, shard_optimizer: bool = True):
    """Place a MapperState on the mesh: window + pose-optimizer leaves
    sharded on their leading (window) axis, map replicated.

    shard_optimizer=True additionally shards the Gaussian Adam moments on
    their leading (capacity) axis — the ZeRO-2 recipe: XLA's SPMD
    partitioner then lowers the Gaussian-gradient all-reduce into a
    reduce-scatter feeding a 1/n-per-device Adam update, followed by an
    all-gather of the updated parameters (same ICI bytes as the all-reduce,
    but the moment math and memory divide by the mesh size). Falls back to
    replication when the capacity doesn't divide the mesh."""
    win_s = window_sharding(mesh)
    rep = replicated(mesh)
    n = _zero_divisor(mesh)

    def place(x, sharding):
        return jax.device_put(x, sharding)

    def place_adam(x):
        if (shard_optimizer and getattr(x, "ndim", 0) >= 1
                and x.shape[0] % n == 0):
            return place(x, gaussian_sharding(mesh))
        return place(x, rep)

    window = jax.tree.map(lambda x: place(x, win_s), state.window)
    pose_adam = type(state.pose_adam)(
        *[place(x, win_s) if getattr(x, "ndim", 0) >= 1 else place(x, rep)
          for x in state.pose_adam]
    )
    return state._replace(
        gmap=jax.tree.map(lambda x: place(x, rep), state.gmap),
        adam=type(state.adam)(
            mu=jax.tree.map(place_adam, state.adam.mu),
            nu=jax.tree.map(place_adam, state.adam.nu),
            step=place(state.adam.step, rep),
        ),
        window=window,
        pose_adam=pose_adam,
        nr_iters=place(state.nr_iters, rep),
        rng=place(state.rng, rep),
    )
