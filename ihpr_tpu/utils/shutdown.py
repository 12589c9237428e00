"""Graceful SIGTERM handling for TPU client processes.

On this platform the TPU is reached through a tunnel relay, and an
UNCLEANLY exiting client seat-locks the remote terminal for 25-75 min
(CLAUDE.md: measured after SIGKILL mid-training and after a mid-compile
crash) — the relay only releases the seat promptly when the PJRT client
disconnects gracefully at interpreter teardown.

Every bounded TPU run in this repo uses ``timeout N python ...``
(tools/tpu_queue.sh), and GNU timeout delivers SIGTERM, whose *default*
Python action terminates the process without unwinding — operationally
identical to SIGKILL for the seat. This module converts SIGTERM into a
normal ``SystemExit`` so ``finally``/``atexit``/module teardown (and with
them the PJRT disconnect) run, with a daemon hard-exit timer so a wedged
teardown can never leave the ``timeout`` caller waiting forever.

The reference has no analogue (its CUDA processes own their local GPUs;
`main/train.py:~1-90` installs no signal handling) — this is
platform-specific runtime hardening.
"""

from __future__ import annotations

import os
import signal
import sys
import threading

_INSTALLED = False


def install_graceful_shutdown(hard_exit_s: float = 90.0) -> bool:
    """Install a SIGTERM handler that exits the interpreter cleanly.

    Call at the top of every CLI/tool ``main()`` that may open a TPU
    client under a ``timeout`` bound. Returns True if the handler was
    installed; False when it can't or shouldn't be (non-main thread, a
    non-default handler already owns SIGTERM, or no SIGTERM on this OS).

    ``hard_exit_s``: if the graceful unwind itself hangs (e.g. a blocking
    tunnel pull that never returns), a daemon timer ``os._exit(143)``s so
    the bounding ``timeout`` is released. Keep it under any ``timeout -k``
    kill grace so SIGKILL (which WOULD seat-lock) never fires.
    """
    global _INSTALLED
    if _INSTALLED:
        return True
    if threading.current_thread() is not threading.main_thread():
        return False
    if not hasattr(signal, "SIGTERM"):  # pragma: no cover - non-POSIX
        return False
    current = signal.getsignal(signal.SIGTERM)
    if current not in (signal.SIG_DFL, None):
        # Someone else (an embedding server, a test harness) owns SIGTERM;
        # don't fight them.
        return False

    def _handler(signum, frame):  # pragma: no cover - exercised in subprocess
        timer = threading.Timer(hard_exit_s, os._exit, args=(143,))
        timer.daemon = True
        timer.start()
        print(
            "ihpr_tpu: SIGTERM — exiting cleanly so the TPU seat is released "
            f"(hard exit in {hard_exit_s:.0f}s if teardown hangs)",
            file=sys.stderr,
            flush=True,
        )
        # 143 = 128 + SIGTERM, the conventional code a default-action
        # SIGTERM death would have produced.
        raise SystemExit(143)

    signal.signal(signal.SIGTERM, _handler)
    _INSTALLED = True
    return True
