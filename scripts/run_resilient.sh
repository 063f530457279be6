#!/usr/bin/env bash
# Self-healing SLAM driver (VERDICT r4 weak #5): run slam.py; if the
# process dies (observed: one native axon death entering refine, r4),
# resume the SAME run dir with --resume-run, which skips every phase the
# phase.json ledger records complete. Up to $MONOGS_MAX_RESUMES restarts.
#
# Usage: bash scripts/run_resilient.sh --config ... [slam.py args...]
set -u
cd "$(dirname "$0")/.."
LOG=$(mktemp /tmp/slam_resilient.XXXX.log)
MAX=${MONOGS_MAX_RESUMES:-3}

python slam.py "$@" 2>&1 | tee "$LOG"
rc=${PIPESTATUS[0]}
attempt=0
while [ "$rc" -ne 0 ] && [ "$attempt" -lt "$MAX" ]; do
    attempt=$((attempt + 1))
    run_dir=$(grep -o 'Results -> [^ ]*' "$LOG" | tail -1 | cut -d' ' -f3)
    if [ -z "$run_dir" ] || [ ! -f "$run_dir/phase.json" ]; then
        echo "run_resilient: no resumable phase ledger (died before the" \
             "SLAM phase checkpoint) — restarting from scratch" >&2
        python slam.py "$@" 2>&1 | tee "$LOG"
        rc=${PIPESTATUS[0]}
        continue
    fi
    echo "run_resilient: resuming $run_dir (attempt $attempt/$MAX)" >&2
    python slam.py --resume-run "$run_dir" "$@" 2>&1 | tee -a "$LOG"
    rc=${PIPESTATUS[0]}
done
exit "$rc"
