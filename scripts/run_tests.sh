#!/usr/bin/env bash
# Canonical CI suite runner: the full suite in a few pytest PROCESSES.
#
# Why not one `pytest tests/ -q`: on this host (jax 0.9.0, XLA:CPU,
# 2 CPUs, 128 GB) a single long-lived process segfaults natively inside
# `backend_compile_and_load` (in-process LLVM) after ~60-70 compiled
# modules — with the persistent compilation cache DISABLED and nothing
# else running, so it is neither the round-2 cache corruption nor memory
# pressure (faulthandler stack committed in CLAUDE.md notes). Splitting
# the suite into a handful of fresh processes keeps each under the
# compile-count horizon. Groups are balanced by measured runtime.
set -u
cd "$(dirname "$0")/.."

GROUPS_LIST=(
  "tests/test_raster.py tests/test_lie.py tests/test_map_model.py tests/test_mapping_exit.py"
  "tests/test_slam_e2e.py tests/test_viewer.py tests/test_ckpt.py tests/test_phase_resume.py"
  "tests/test_slam_e2e_pallas.py tests/test_async.py tests/test_utils.py tests/test_graft_entry.py tests/test_dynamic.py"
  "tests/test_parallel.py tests/test_multihost.py tests/test_datasets.py"
)

fail=0
for g in "${GROUPS_LIST[@]}"; do
  echo "=== pytest $g ==="
  python -m pytest $g -q "$@" || fail=1
done
exit $fail
