"""Test rig: deterministic 8-virtual-device CPU backend.

The TPU-world analogue of a fake backend (SURVEY.md §4): sharding tests get a
real 8-device mesh without hardware; Pallas kernels run in interpreter mode
(ops/tile_raster.py:_interpret_mode) so fwd/bwd semantics are still exercised.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# The axon sitecustomize pins JAX_PLATFORMS=axon (remote TPU tunnel); tests
# must run on the local CPU backend — the env var alone is overridden, so we
# also set the config flag before any backend is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Tests compare against numpy float64-free references; keep matmuls exact.
jax.config.update("jax_default_matmul_precision", "highest")

# NOTE: the persistent compilation cache is deliberately NOT enabled here.
# CPU compiles are fast, and long multi-module runs with the cache on
# crashed natively inside compilation_cache get/put (round-2 VERDICT
# weak #3: 3/3 full-suite runs segfaulted/aborted; every module green in
# isolation). The cache exists for the slow axon remote-compile path and
# is opt-in via MONOGS_JAX_CACHE there; MONOGS_DISABLE_JAX_CACHE=1 is the
# global kill-switch (monogs_tpu/utils/cache.py).
os.environ.setdefault("MONOGS_DISABLE_JAX_CACHE", "1")
