"""Multi-host (multi-process) execution support.

The reference scales with OS processes sharing one GPU (SURVEY.md §2.3,
utils/multiprocessing_utils.py); the TPU-native scaling story is SPMD over a
global device mesh spanning hosts:

- every process runs the SAME host driver on the SAME input stream
  (replicated host logic — the SLAM frontier is host-cheap, all heavy work
  is device-side),
- arrays are GLOBAL: `jax.device_put(host_value, NamedSharding(mesh, spec))`
  with a mesh over `jax.devices()` (all processes' devices) gives every
  process its addressable shards, and jitted steps run as one SPMD program
  per host with XLA-inserted ICI/DCN collectives,
- the window axis shards over the mesh exactly as single-host
  (parallel/mesh.py); gradients of the replicated map all-reduce.

Initialization must happen before the first JAX computation. On a TPU pod
slice, `jax.distributed.initialize()` needs no arguments (the runtime
discovers the topology); elsewhere pass coordinator/num_processes/rank —
the CLI exposes --dist-coordinator/--dist-procs/--dist-rank.

Tested with real multi-process meshes in tests/test_multihost.py: two CPU
processes x 4 virtual devices each form one 8-device global mesh and run
the sharded mapping step.
"""

from __future__ import annotations

import jax


def initialize_distributed(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids=None,
) -> bool:
    """Start the JAX distributed runtime for multi-host meshes.

    Call BEFORE any JAX computation. Returns True if a multi-process
    runtime was initialized. With all arguments None this is only valid on
    environments the runtime can auto-discover (TPU pods); for explicit
    setups pass coordinator ("host:port"), num_processes, and process_id.
    A num_processes of 1 (or None outside auto-discovery) is a no-op.
    """
    if num_processes is None and coordinator is None:
        return False
    if num_processes is not None and num_processes <= 1:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return True


def is_primary() -> bool:
    """True on the process that owns artifacts (results, viewer, logs)."""
    return jax.process_index() == 0


def sync_hosts(name: str = "monogs-barrier") -> None:
    """Barrier across all processes (no-op single-process)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
