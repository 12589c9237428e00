"""Graceful SIGTERM shutdown (ihpr_tpu/utils/shutdown.py).

Every bounded TPU run goes through ``timeout``, which delivers SIGTERM;
the handler must convert that into a normal interpreter exit (so the
PJRT client disconnects and the tunnel seat is released) rather than the
default unwind-free death. Verified in a real subprocess.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import threading
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import atexit, sys, time
from ihpr_tpu.utils.shutdown import install_graceful_shutdown

assert install_graceful_shutdown() is True
atexit.register(lambda: print("ATEXIT-RAN", flush=True))
try:
    print("READY", flush=True)
    while True:
        time.sleep(0.05)
finally:
    print("FINALLY-RAN", flush=True)
"""


def test_sigterm_exits_cleanly_with_unwind():
    proc = subprocess.Popen(
        [sys.executable, "-c", CHILD],
        cwd=REPO,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )
    try:
        line = proc.stdout.readline()
        assert line.strip() == "READY", line
        proc.send_signal(signal.SIGTERM)
        out = proc.communicate(timeout=30)[0]
    finally:
        if proc.poll() is None:
            proc.kill()
    # 143 = 128 + SIGTERM via SystemExit, NOT the negative returncode a
    # default-action signal death produces (subprocess reports that as -15).
    assert proc.returncode == 143, (proc.returncode, out)
    assert "FINALLY-RAN" in out
    assert "ATEXIT-RAN" in out
    assert "exiting cleanly" in out


def test_install_refuses_foreign_handler():
    code = r"""
import signal, sys
signal.signal(signal.SIGTERM, lambda *_: None)
from ihpr_tpu.utils.shutdown import install_graceful_shutdown
assert install_graceful_shutdown() is False
print("OK")
"""
    out = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, capture_output=True, text=True
    )
    assert out.returncode == 0, out.stderr
    assert "OK" in out.stdout


def test_install_refuses_non_main_thread():
    from ihpr_tpu.utils.shutdown import install_graceful_shutdown

    result = {}
    t = threading.Thread(target=lambda: result.setdefault("r", install_graceful_shutdown()))
    t.start()
    t.join()
    assert result["r"] is False
    # And SIGTERM disposition in THIS process is untouched by the refusal.
    assert signal.getsignal(signal.SIGTERM) in (signal.SIG_DFL, signal.default_int_handler)


def test_hard_exit_cap_when_teardown_hangs():
    # A child whose SystemExit path hangs (finally: sleep forever) must
    # still die via the daemon hard-exit timer, code 143.
    code = r"""
import sys, time
from ihpr_tpu.utils.shutdown import install_graceful_shutdown
install_graceful_shutdown(hard_exit_s=1.0)
try:
    print("READY", flush=True)
    while True:
        time.sleep(0.05)
finally:
    time.sleep(3600)
"""
    proc = subprocess.Popen(
        [sys.executable, "-c", code],
        cwd=REPO,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )
    try:
        assert proc.stdout.readline().strip() == "READY"
        t0 = time.time()
        proc.send_signal(signal.SIGTERM)
        out = proc.communicate(timeout=30)[0]
        elapsed = time.time() - t0
    finally:
        if proc.poll() is None:
            proc.kill()
    assert proc.returncode == 143, (proc.returncode, out)
    assert elapsed < 15, elapsed
