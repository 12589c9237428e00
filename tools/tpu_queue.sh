#!/bin/sh
# Pending real-TPU measurement queue (SURVEY.md round-3 section).
# Run the moment the tunnel relay is back:
#     PYTHONUNBUFFERED=1 sh tools/tpu_queue.sh > /tmp/tpu_queue.log 2>&1 &
# Each item is bounded and logs separately; a failure does not stop the
# queue (every tool traps its own exceptions so the TPU client exits
# cleanly — see CLAUDE.md seat-lock gotcha). Review logs in order; the
# exp2/bexp adoption decision (flip IHPR_EXP2 default, bexp accuracy A/B)
# is a HUMAN step between items 3 and 6, not automated here.
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

# 1. Mosaic smoke incl. exp2 lowering after the backward fold
timeout -k 120 3000 python tools/tpu_smoke.py --fast > /tmp/q1_smoke.log 2>&1
echo "q1 rc=$?"

# 2. marginal exp/exp2/bexp VPU pass cost at production geometry
timeout -k 120 3000 python tools/exp_probe.py > /tmp/q2_exp_probe.log 2>&1
echo "q2 rc=$?"

# 3. in-situ step A/B of the kernel exp modes
timeout -k 120 6000 python tools/bwd_experiments.py \
    --variants baseline,exp2,bexp,exp2_bexp > /tmp/q3_bwd.log 2>&1
echo "q3 rc=$?"

# 4. sustained serving throughput (+ pipelined full-path requests/s)
timeout -k 120 3000 python tools/serving_bench.py > /tmp/q4_serving.log 2>&1
echo "q4 rc=$?"

# 5. eval FPS + train-incl-pipeline re-measure at HEAD
timeout -k 120 6000 python tools/eval_bench.py > /tmp/q5_eval_bench.log 2>&1
echo "q5 rc=$?"

# 6. driver metric at HEAD (pre-adoption; re-run manually if a mode wins)
timeout -k 120 3000 python bench.py > /tmp/q6_bench.json 2>/tmp/q6_bench.log
echo "q6 rc=$?"

# Items below are LONG accuracy runs. An UNATTENDED launch (relay_watch
# exports QUEUE_DEADLINE) skips them past the deadline so the chip's seat
# is free when the driver runs its end-of-round bench (two clients
# contend for the single tunnel seat). Manual runs have no deadline —
# pass QUEUE_DEADLINE=<epoch-seconds> to set one (0 = none).
DEADLINE="${QUEUE_DEADLINE:-0}"
past_deadline() {
    [ "$DEADLINE" != 0 ] && [ "$(date -u +%s)" -ge "$DEADLINE" ]
}

# 7. mixed H36M+MPII trainset accuracy evidence (reference common/base.py
#    multi-dataset recipe; BASELINE "mixed H36M+MPII batches"): 2D rows
#    must not hurt 3D eval — same 130 mm bar as the plain tiny preset.
if past_deadline; then echo "q7 SKIPPED (deadline)"; else
timeout -k 120 6000 python tools/accuracy_loop.py --preset tiny --mixed \
    --output_dir /tmp/accuracy_tiny_mixed > /tmp/q7_mixed.log 2>&1
echo "q7 rc=$?"
fi

# 8. BASELINE config #4 VERBATIM: R152 @ 288x384, mixed H36M+MPII
#    batches, bf16 — the one config whose committed accuracy row lacked
#    the mix. Longest item, least adoption-critical: strictly last.
if past_deadline; then echo "q8 SKIPPED (deadline)"; else
timeout -k 120 10800 python tools/accuracy_loop.py --preset r152 --mixed \
    --end_epoch 100 --output_dir /tmp/accuracy_r152_mixed \
    > /tmp/q8_mixed_r152.log 2>&1
echo "q8 rc=$?"
fi
echo QUEUE-DONE
