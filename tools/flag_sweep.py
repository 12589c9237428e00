#!/usr/bin/env python
"""A/B XLA compiler options on the production train step (real chip).

XLA_FLAGS cannot carry TPU backend flags here: the local CPU client's
parse_flags_from_env aborts on flags it does not know. But per-compile
``lowered.compile(compiler_options=...)`` is forwarded through the axon
PJRT plugin to the remote TPU compiler (probe-verified), so each variant
compiles the SAME jitted step with different backend options.

    PYTHONUNBUFFERED=1 python tools/flag_sweep.py > /tmp/flag_sweep.log 2>&1 &
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = {
    "base": {},
    # Raise the per-fusion VMEM scratch budget (v5e has 128 MiB VMEM;
    # the default scoped limit is far smaller). More scratch -> bigger
    # fusions -> fewer HBM round-trips in the BN/ReLU-heavy backbone bwd.
    "vmem96m": {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    "lhs": {"xla_tpu_enable_latency_hiding_scheduler": "true"},
    "vmem96m_lhs": {
        "xla_tpu_scoped_vmem_limit_kib": "98304",
        "xla_tpu_enable_latency_hiding_scheduler": "true",
    },
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("variants", nargs="*", default=None)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax

    from ihpr_tpu.config import get_config
    from ihpr_tpu.data import skeletons
    from ihpr_tpu.data.datasets import PoseDataset, make_synthetic
    from ihpr_tpu.data.pipeline import BatchLoader, prefetch_to_device
    from ihpr_tpu.models.pose_net import build_pose_net
    from ihpr_tpu.parallel import (
        batch_sharding,
        create_train_state,
        make_mesh,
        make_train_step,
    )

    cfg = get_config("h36m3d_r50")
    n_chips = len(jax.devices())
    batch = cfg.optim.batch_size_per_device * n_chips
    skel = skeletons.H36M
    ds = PoseDataset(
        "Human36M", skel, make_synthetic(skel, 2 * batch, seed=0, img_size=320), True
    )
    loader = BatchLoader([ds], cfg, batch, train=True, num_workers=8)
    mesh = make_mesh()
    model = build_pose_net(cfg, mesh=mesh)
    state0, tx = create_train_state(model, cfg, jax.random.key(0), len(loader), mesh=mesh)
    # donate=False: every variant re-runs from the same state/batches.
    step = make_train_step(model, tx, cfg, mesh, donate=False, lean=True)
    sharding = batch_sharding(mesh)
    batches = [b for b, _ in prefetch_to_device(loader.epoch(0), sharding)][:2]
    rng = jax.random.key(1)

    results = {}
    for name in args.variants or list(VARIANTS):
        opts = VARIANTS[name]
        t0 = time.perf_counter()
        try:
            compiled = step.lower(state0, batches[0], rng).compile(
                compiler_options=opts or None
            )
        except Exception as e:
            print(f"[{name}] compile FAILED: {type(e).__name__}: {e}", flush=True)
            continue
        state, metrics = compiled(state0, batches[0], rng)
        first = float(metrics["loss"])
        compile_s = time.perf_counter() - t0
        for i in range(3):
            state, metrics = compiled(state, batches[i % 2], rng)
        _ = float(metrics["loss"])
        t0 = time.perf_counter()
        for i in range(args.iters):
            state, metrics = compiled(state, batches[i % 2], rng)
        _ = float(metrics["loss"])  # single truthful pull (axon early-ready)
        dt = (time.perf_counter() - t0) / args.iters
        ips = batch / dt / n_chips
        results[name] = ips
        print(
            f"[{name}] {opts}: compile {compile_s:.0f}s, "
            f"{dt * 1e3:.2f} ms/step, {ips:.1f} img/s/chip (loss0 {first:.4f})",
            flush=True,
        )
        del compiled, state

    print("== flag sweep done ==")
    for k, v in sorted(results.items(), key=lambda kv: -kv[1]):
        print(f"  {k}: {v:.1f} img/s/chip")


if __name__ == "__main__":
    main()
