#!/bin/bash
# Supervised training loop: relaunch train.py with --continue whenever it
# self-preempts on the host-RSS watchdog (exit 75 = EX_TEMPFAIL).
#
# Why: this platform's PJRT client leaks every H2D batch payload on the
# host (~10 MB/step at B=32; tools/host_rss_probe.py), so a 100-epoch run
# outgrows a 128 GB host. The Trainer snapshots and exits 75 before the
# kernel OOM-killer can SIGKILL it (a SIGKILL also seat-locks the remote
# TPU ~25 min); this wrapper resumes the run, which is bit-identical
# (deterministic data stream + full-state snapshots — PARITY.md).
#
# Usage: tools/train_supervised.sh [train.py args...]
#   e.g. tools/train_supervised.sh --config h36m3d_r50 --data_root /data
#
# Any exit code other than 75 (success, error, SIGTERM) ends the loop.
set -u
cd "$(dirname "$0")/.."

attempt=0
extra=()
while :; do
  python train.py "$@" "${extra[@]}"
  rc=$?
  if [ "$rc" -ne 75 ]; then
    exit "$rc"
  fi
  attempt=$((attempt + 1))
  echo "train_supervised: RSS watchdog preempt #$attempt -> relaunching with --continue" >&2
  extra=(--continue)
done
