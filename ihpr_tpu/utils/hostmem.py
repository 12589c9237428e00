"""Host-memory watchdog helpers.

Why this exists: on this platform EVERY host->device transfer leaks its
full payload in the PJRT client's host staging path (measured by
tools/host_rss_probe.py on the real chip: 9.6-10.9 MB of RSS per 10 MB
device_put, invariant to source-buffer reuse, forced transfer completion,
and gc; numpy-only control 0.00). A long training run therefore grows by
~one uint8 batch of host RSS per step until the kernel OOM-killer
SIGKILLs it — which on top of losing the run also seat-locks the remote
TPU for ~25 minutes (CLAUDE.md). The Trainer polls ``host_rss_mb`` at
epoch boundaries and, past the limit, snapshots and exits CLEANLY with
``EX_TEMPFAIL`` so a supervisor can relaunch with ``--continue`` (resume
is bit-identical: deterministic data stream + full-state snapshots).
"""

from __future__ import annotations

from typing import Optional

#: sysexits.h EX_TEMPFAIL — "temporary failure, retry". A supervisor
#: (tools/train_supervised.sh) relaunches with --continue on this code.
EX_TEMPFAIL = 75


def host_rss_mb() -> float:
    """This process's resident set size in MB (0.0 if /proc is absent)."""
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        pass
    return 0.0


def host_total_mb() -> float:
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                if line.startswith("MemTotal:"):
                    return int(line.split()[1]) / 1024.0
    except OSError:
        pass
    return 0.0


def resolve_rss_limit_mb(limit: Optional[float]) -> Optional[float]:
    """None -> auto (80% of MemTotal; None if /proc is absent).
    0 or negative -> disabled (None). Positive -> as given."""
    if limit is None:
        total = host_total_mb()
        return 0.8 * total if total > 0 else None
    if limit <= 0:
        return None
    return float(limit)
