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


def make_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (WINDOW_AXIS,))


def window_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (window) axis sharded across devices."""
    return NamedSharding(mesh, P(WINDOW_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_mapper_state(state, mesh: Mesh):
    """Place a MapperState on the mesh: window + pose-optimizer leaves
    sharded on their leading (window) axis, map/Adam replicated."""
    win_s = window_sharding(mesh)
    rep = replicated(mesh)

    def place(x, sharding):
        return jax.device_put(x, sharding)

    window = jax.tree.map(lambda x: place(x, win_s), state.window)
    pose_adam = type(state.pose_adam)(
        *[place(x, win_s) if getattr(x, "ndim", 0) >= 1 else place(x, rep)
          for x in state.pose_adam]
    )
    return state._replace(
        gmap=jax.tree.map(lambda x: place(x, rep), state.gmap),
        adam=jax.tree.map(lambda x: place(x, rep), state.adam),
        window=window,
        pose_adam=pose_adam,
        nr_iters=place(state.nr_iters, rep),
        rng=place(state.rng, rep),
    )
