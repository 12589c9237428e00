#!/bin/sh
# Real-TPU HEAD health queue. Every round-specific queue item through
# round 5 ran and is reconciled in PARITY.md; what remains useful to
# (re)run after a relay outage or before handing the chip back is this
# standing health set:
#     PYTHONUNBUFFERED=1 sh tools/tpu_queue.sh > /tmp/tpu_queue.log 2>&1 &
# Each item is bounded and logs separately; a failure does not stop the
# queue (every tool traps its own exceptions so the TPU client exits
# cleanly — see CLAUDE.md seat-lock gotcha).
set -x
cd "$(dirname "$0")/.."
export PYTHONUNBUFFERED=1

# 0. seat probe: cheap chained matmul; if this hangs the seat is locked.
# The probe (like every item below) converts timeout's SIGTERM into a
# clean interpreter exit so the PJRT disconnect runs — an unclean
# SIGTERM death is what seat-locks the tunnel (CLAUDE.md). -k 120 is a
# last-resort SIGKILL that never fires before the handler's 90 s
# hard-exit cap.
timeout -k 120 300 python -c "
from ihpr_tpu.utils.shutdown import install_graceful_shutdown
install_graceful_shutdown()
import jax, jax.numpy as jnp
x = jnp.ones((256, 256))
for _ in range(4): x = x @ x / 256.0
print('seat ok', float(x.sum()))" || exit 1

# 1. Mosaic + engine smoke (kernels, train step, server, export)
timeout -k 120 3000 python tools/tpu_smoke.py --fast > /tmp/q1_smoke.log 2>&1
echo "q1 rc=$?"

# 2. driver metric at HEAD
timeout -k 120 3000 python bench.py > /tmp/q2_bench.json 2>/tmp/q2_bench.log
echo "q2 rc=$?"

# 3. eval FPS + train-incl-pipeline decomposition (4 phases, one process)
timeout -k 120 6000 python tools/eval_bench.py > /tmp/q3_eval_bench.log 2>&1
echo "q3 rc=$?"

# 4. sustained + chip-side serving rows
timeout -k 120 3000 python tools/serving_bench.py > /tmp/q4_serving.log 2>&1
echo "q4 rc=$?"
echo QUEUE-DONE
