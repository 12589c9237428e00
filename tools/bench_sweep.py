#!/usr/bin/env python
"""A/B throughput sweep on the real chip: flagship train-step variants.

Same chained-steps methodology as bench.py (this platform's
block_until_ready resolves early; only a final scalar pull is truthful).
Each variant compiles fresh (~30-400 s remote), so run this in background:

    PYTHONUNBUFFERED=1 python tools/bench_sweep.py > /tmp/sweep.log 2>&1 &

Variants are named on the command line; default runs the full grid.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def measure(cfg, iters=30, warmup=3, donate=False, lean=False, tag=""):
    import jax

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

    n_chips = len(jax.devices())
    batch = cfg.optim.batch_size_per_device * n_chips
    skel = skeletons.H36M
    ds = PoseDataset("Human36M", skel, make_synthetic(skel, 2 * batch, seed=0, img_size=320), True)
    loader = BatchLoader([ds], cfg, batch, train=True, num_workers=8)
    mesh = make_mesh()
    model = build_pose_net(cfg, mesh=mesh)
    state, tx = create_train_state(model, cfg, jax.random.key(0), len(loader), mesh=mesh)
    step = make_train_step(model, tx, cfg, mesh, donate=donate, lean=lean)
    sharding = batch_sharding(mesh)
    batches = [b for b, _ in prefetch_to_device(loader.epoch(0), sharding)][:2]

    rng = jax.random.key(1)
    t0 = time.perf_counter()
    state, metrics = step(state, batches[0], rng)
    _ = float(metrics["loss"])
    compile_s = time.perf_counter() - t0

    for i in range(warmup):
        state, metrics = step(state, batches[i % 2], rng)
    _ = float(metrics["loss"])

    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = step(state, batches[i % 2], rng)
    _ = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters
    ips = batch / dt / n_chips
    print(
        f"[{tag}] B/dev={cfg.optim.batch_size_per_device} donate={donate} lean={lean}: "
        f"compile {compile_s:.0f}s, {dt * 1e3:.2f} ms/step, {ips:.1f} img/s/chip",
        flush=True,
    )
    # free device memory between variants
    del state, step, batches
    return ips


def main():
    from ihpr_tpu.config import get_config

    ap = argparse.ArgumentParser()
    ap.add_argument("variants", nargs="*", default=None)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    base = get_config("h36m3d_r50")

    def with_bs(cfg, bs):
        import dataclasses

        return cfg.replace(optim=dataclasses.replace(cfg.optim, batch_size_per_device=bs))

    def with_model(cfg, **kw):
        import dataclasses

        return cfg.replace(model=dataclasses.replace(cfg.model, **kw))

    grid = {
        "base32": lambda: (base, False),
        "base32_donate": lambda: (base, True),
        "s2d32": lambda: (with_model(base, s2d_stem=True), False),
        "base64": lambda: (with_bs(base, 64), False),
        "s2d64": lambda: (with_bs(with_model(base, s2d_stem=True), 64), False),
        "base128": lambda: (with_bs(base, 128), False),
        "base128_donate": lambda: (with_bs(base, 128), True),
        "s2d128": lambda: (with_bs(with_model(base, s2d_stem=True), 128), False),
        "base256": lambda: (with_bs(base, 256), False),
        "lean128_donate": lambda: (with_bs(base, 128), True, True),
        # In-situ A/B for the fused 3x3-conv+BN kernel (ops/conv_bn.py):
        # identical to lean128_donate (= the bench.py production step)
        # except stage-3/4 stride-1 mid-convs run fused. Gate measured in
        # tools/conv_bn_probe.py; compare against lean128_donate.
        "fused3_lean128_donate": lambda: (
            with_bs(with_model(base, fused_conv3=True), 128), True, True,
        ),
        "lean256_donate": lambda: (with_bs(base, 256), True, True),
        "s2d_lean128_donate": lambda: (with_bs(with_model(base, s2d_stem=True), 128), True, True),
    }
    names = args.variants or list(grid)
    results = {}
    for name in names:
        if name not in grid:
            print(f"unknown variant {name}; have {list(grid)}", file=sys.stderr)
            continue
        spec = grid[name]()
        cfg, donate, lean = spec if len(spec) == 3 else (*spec, False)
        try:
            results[name] = measure(cfg, iters=args.iters, donate=donate, lean=lean, tag=name)
        except Exception as e:  # keep sweeping on OOM etc.
            print(f"[{name}] FAILED: {type(e).__name__}: {e}", flush=True)
    print("== sweep done ==")
    for k, v in sorted(results.items(), key=lambda kv: -kv[1]):
        print(f"  {k}: {v:.1f} img/s/chip")


if __name__ == "__main__":
    main()
