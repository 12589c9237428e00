#!/usr/bin/env python
"""Measure backbone-backward optimization variants on the real chip.

VERDICT r2 #1: the flagship step is HBM-bound in the backbone backward
(BN/ReLU elementwise chains between dgrad/wgrad matmuls, ~11 ms of the
25 ms B=32 step). This harness A/Bs the candidate levers IN SITU on the
production train step (B=128, lean metrics, donated state — exactly
bench.py's methodology: chained steps, one scalar pull at the end):

  baseline     flagship h36m3d_r50 as committed
  lean_bn      bn_mode='lean'  (bf16 normalize chains, fp32 stats)
  remat        block_remat     (save block inputs only, recompute)
  lean_remat   both
  bf16_logits  fp32_logits=False (halves integral-kernel HBM traffic)
  all          lean_bn + remat + bf16_logits

Each variant is wrapped in try/except so a Mosaic/compile failure exits
cleanly (an unclean TPU client exit seat-locks the tunnel — CLAUDE.md).

    PYTHONUNBUFFERED=1 python tools/bwd_experiments.py [--variants a,b] \
        > /tmp/bwd_exp.log 2>&1 &
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = {
    "baseline": {},
    "lean_bn": dict(bn_mode="lean"),
    "remat": dict(block_remat=True),
    "lean_remat": dict(bn_mode="lean", block_remat=True),
    "bf16_logits": dict(fp32_logits=False),
    "all": dict(bn_mode="lean", block_remat=True, fp32_logits=False),
    # Selective remat: keep conv outputs, recompute only BN/ReLU tails.
    "conv_outs": dict(block_remat=True, remat_policy="conv_outs"),
    "lean_conv_outs": dict(
        bn_mode="lean", block_remat=True, remat_policy="conv_outs"
    ),
    # Batch-size sweep at the winning bn mode ("_batch" = per-device batch;
    # throughput normalizes per image so variants stay comparable).
    # bf16 statistics too (measurement mode; numerically unsafe for prod).
    "lean16": dict(bn_mode="lean16"),
    # Running-stats-only BN (measurement mode): deletes every batch-stats
    # reduce and stats-bwd term while keeping the apply FMA — an upper
    # bound on what conv+BN-stats epilogue fusion could ever recover.
    "frozen_bn": dict(bn_mode="frozen"),
    # Subsampled BN statistics: estimate mean/var from every N-th image
    # row — the stats reduce and its backward read 1/N of the bytes,
    # approaching the frozen_bn bound while keeping live batch stats
    # (still >=65k samples/channel at sub8; the torch reference's
    # per-GPU stats use a comparable sample count).
    "lean_sub4": dict(bn_mode="lean_sub4"),
    "lean_sub8": dict(bn_mode="lean_sub8"),
    # Live batch stats, but lax.stop_gradient on mean/var: forward
    # identical to lean, stats-backward reduces deleted. Isolates the
    # bwd share of the frozen_bn bound.
    "lean_sg": dict(bn_mode="lean_sg"),
    # Stop-grad on the variance only: deletes the bwd dy*x reduce (the
    # activation re-read) but keeps the mean-centering projection that
    # lean_sg's accuracy run showed is the stabilizer.
    "lean_sgv": dict(bn_mode="lean_sgv"),
    # Pallas fused 1x1-conv + BN-stats (epilogue) + bn2-apply (prologue).
    "fused_1x1": dict(bn_mode="lean", fused_1x1=True),
    "lean_b96": dict(bn_mode="lean", _batch=96),
    "lean_b160": dict(bn_mode="lean", _batch=160),
    "lean_b192": dict(bn_mode="lean", _batch=192),
    # Base-2 softmax in the fused head+integral kernel (IHPR_EXP2 is read
    # at trace time, so setting it per-variant before the re-trace works).
    "exp2": dict(_env={"IHPR_EXP2": "1"}),
    # bf16 backward exp (gradient-perturbing measurement mode; adoption
    # additionally needs a from-scratch accuracy A/B).
    "bexp": dict(_env={"IHPR_BEXP": "1"}),
    "exp2_bexp": dict(_env={"IHPR_EXP2": "1", "IHPR_BEXP": "1"}),
}


def measure(cfg, batches, iters=30, warmup=3):
    import jax

    from ihpr_tpu.models.pose_net import build_pose_net
    from ihpr_tpu.parallel import create_train_state, make_mesh, make_train_step

    mesh = make_mesh()
    model = build_pose_net(cfg, mesh=mesh)
    state, tx = create_train_state(model, cfg, jax.random.key(0), 100, mesh=mesh)
    step = make_train_step(model, tx, cfg, mesh, donate=True, lean=True)
    rng = jax.random.key(1)

    t0 = time.perf_counter()
    state, metrics = step(state, batches[0], rng)
    loss0 = float(metrics["loss"])
    compile_s = time.perf_counter() - t0
    for i in range(warmup):
        state, metrics = step(state, batches[i % 2], rng)
    _ = float(metrics["loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, batches[i % 2], rng)
    loss = float(metrics["loss"])  # ONE pull forces the chained pipeline
    dt = (time.perf_counter() - t0) / iters
    assert loss == loss, "NaN loss"
    del state
    return dt, compile_s, loss0


def main():
    from ihpr_tpu.utils.shutdown import install_graceful_shutdown

    install_graceful_shutdown()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--variants", default=",".join(VARIANTS))
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax

    from ihpr_tpu.config import get_config
    from ihpr_tpu.data import skeletons
    from ihpr_tpu.data.datasets import PoseDataset, make_synthetic
    from ihpr_tpu.data.pipeline import BatchLoader, prefetch_to_device
    from ihpr_tpu.parallel import batch_sharding, make_mesh

    base = get_config("h36m3d_r50")
    n_chips = len(jax.devices())
    batch = base.optim.batch_size_per_device * n_chips
    print(f"backend {jax.default_backend()} x{n_chips}, global batch {batch}")

    skel = skeletons.H36M
    ds = PoseDataset(
        "Human36M", skel, make_synthetic(skel, 3 * batch, seed=0, img_size=320), True
    )
    loader = BatchLoader([ds], base, batch, train=True, num_workers=8)
    sharding = batch_sharding(make_mesh())
    batches = [b for b, _ in prefetch_to_device(loader.epoch(0), sharding)][:2]

    results = {}
    for name in args.variants.split(","):
        kw = dict(VARIANTS[name])
        env = kw.pop("_env", {})
        for k, v in env.items():
            os.environ[k] = v
        vbatch_per_dev = kw.pop("_batch", base.optim.batch_size_per_device)
        vbatch = vbatch_per_dev * n_chips
        cfg = base.replace(
            name=f"exp_{name}",
            model=dataclasses.replace(base.model, **kw),
            optim=dataclasses.replace(
                base.optim, batch_size_per_device=vbatch_per_dev
            ),
        )
        vbatches = batches
        if vbatch != batch:
            vloader = BatchLoader([ds], cfg, vbatch, train=True, num_workers=8)
            vbatches = [
                b for b, _ in prefetch_to_device(vloader.epoch(0), sharding)
            ][:2]
        try:
            dt, compile_s, loss0 = measure(cfg, vbatches, iters=args.iters)
            ips = vbatch / dt / n_chips
            results[name] = round(ips, 1)
            print(
                f"{name:12s} {dt * 1e3:7.1f} ms/step  {ips:8.1f} img/s/chip "
                f"(compile {compile_s:.0f}s, first loss {loss0:.3f})",
                flush=True,
            )
        except Exception:
            print(f"{name:12s} FAILED:", flush=True)
            traceback.print_exc()
            results[name] = None
        finally:
            for k in env:
                os.environ.pop(k, None)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
