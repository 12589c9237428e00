#!/usr/bin/env python
"""Measure ACHIEVED HBM bandwidth of the production step's phases.

PARITY.md's ceiling claim ("the backbone is HBM-bound in BOTH directions,
so ~50% MFU ≈ 1.9k img/s is the physical max") was derived from activation
byte counts; this tool replaces the arithmetic with a measurement:

  achieved GB/s  =  XLA's post-fusion HBM byte accounting for the compiled
                    program ("bytes accessed" from compiled.cost_analysis(),
                    i.e. fusion-boundary traffic — exactly the bytes that
                    cross HBM)  /  measured wall time (chained-dispatch
                    methodology, same as bench.py — the only truthful timer
                    on this tunneled platform).

Phases measured at the flagship shape (R50 @ 256^2, B=128, bf16, lean BN):
  backbone fwd (train-mode stats)     |  backbone fwd+bwd  |  bwd = delta
  full model fwd train+loss           |  full fwd+bwd      |
  full production train step (lean)   |

v5e roofs: 819 GB/s HBM, 197 TFLOP/s bf16. A phase sitting at >=~80% of
the HBM roof is measured bandwidth-bound; well below means headroom the
roofline arithmetic missed.

Run in background (each phase compiles fresh, 30-400 s on the tunnel):
  PYTHONUNBUFFERED=1 python tools/hbm_roofline.py > /tmp/roofline.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HBM_ROOF_GBPS = 819.0  # TPU v5e (v5 lite) HBM2 bandwidth
BF16_ROOF_TFLOPS = 197.0


def cost_bytes_flops(compiled):
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    return float(ca.get("bytes accessed", float("nan"))), float(
        ca.get("flops", float("nan"))
    )


def measure(tag, jfn, args, iters=30, warmup=3):
    """Compile, pull cost analysis, then chained-dispatch timing with one
    final scalar pull (bench.py methodology). Returns (seconds, bytes,
    flops) and prints the phase row."""
    import jax

    lowered = jfn.lower(*args)
    t0 = time.perf_counter()
    compiled = lowered.compile()
    nbytes, flops = cost_bytes_flops(compiled)
    out = compiled(*args)
    jax.block_until_ready(out)
    _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    compile_s = time.perf_counter() - t0
    for _ in range(warmup):
        out = compiled(*args)
    _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = compiled(*args)
    _ = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    gbps = nbytes / dt / 1e9
    tflops = flops / dt / 1e12
    print(
        f"[{tag}] {dt * 1e3:7.2f} ms | {nbytes / 1e9:6.2f} GB -> "
        f"{gbps:6.1f} GB/s ({gbps / HBM_ROOF_GBPS * 100:4.1f}% of HBM roof) | "
        f"{flops / 1e9:7.1f} GFLOP -> {tflops:6.1f} TF/s "
        f"({tflops / BF16_ROOF_TFLOPS * 100:4.1f}% MFU) | compile {compile_s:.0f}s",
        flush=True,
    )
    return dt, nbytes, flops


def main():
    from ihpr_tpu.utils.shutdown import install_graceful_shutdown

    install_graceful_shutdown()
    import jax
    import jax.numpy as jnp

    from ihpr_tpu.config import get_config
    from ihpr_tpu.data import skeletons
    from ihpr_tpu.data.datasets import PoseDataset, make_synthetic
    from ihpr_tpu.data.pipeline import BatchLoader, prefetch_to_device
    from ihpr_tpu.models.pose_net import build_pose_net
    from ihpr_tpu.models.resnet import ResNetBackbone
    from ihpr_tpu.ops import joint_location_loss
    from ihpr_tpu.parallel import (
        batch_sharding,
        create_train_state,
        make_mesh,
        make_train_step,
    )

    cfg = get_config("h36m3d_r50")
    B = cfg.optim.batch_size_per_device
    skel = skeletons.H36M
    J, D = skel.joint_num, cfg.data.depth_dim
    print(f"hbm_roofline: {jax.devices()} B={B}", flush=True)

    img = jnp.asarray(
        np.random.RandomState(0).randn(B, 256, 256, 3).astype(np.float32)
    )
    tgt = jnp.asarray(np.random.RandomState(1).rand(B, J, 3).astype(np.float32) * 16)
    vis = jnp.ones((B, J), jnp.float32)
    hd = jnp.ones((B,), jnp.float32)

    # --- backbone phases ---
    bb = ResNetBackbone(
        resnet_type=cfg.model.resnet_type,
        compute_dtype=cfg.model.compute_dtype,
        bn_mode=cfg.model.bn_mode,
    )
    bvars = bb.init(jax.random.key(0), img[:1], train=False)

    @jax.jit
    def bb_fwd(params, stats, image):
        y, _ = bb.apply(
            {"params": params, "batch_stats": stats},
            image,
            train=True,
            mutable=["batch_stats"],
        )
        return jnp.mean(jnp.abs(y))

    @jax.jit
    def bb_fwd_bwd(params, stats, image):
        def loss_fn(p):
            y, _ = bb.apply(
                {"params": p, "batch_stats": stats},
                image,
                train=True,
                mutable=["batch_stats"],
            )
            return jnp.mean(jnp.abs(y))

        return jax.value_and_grad(loss_fn)(params)

    t_f, b_f, f_f = measure("backbone fwd        ", bb_fwd, (bvars["params"], bvars["batch_stats"], img))
    t_fb, b_fb, f_fb = measure("backbone fwd+bwd    ", bb_fwd_bwd, (bvars["params"], bvars["batch_stats"], img))
    dt, db, dfl = t_fb - t_f, b_fb - b_f, f_fb - f_f
    print(
        f"[backbone bwd (delta)] {dt * 1e3:7.2f} ms | {db / 1e9:6.2f} GB -> "
        f"{db / dt / 1e9:6.1f} GB/s ({db / dt / 1e9 / HBM_ROOF_GBPS * 100:4.1f}% of roof) | "
        f"{dfl / 1e9:7.1f} GFLOP -> {dfl / dt / 1e12:6.1f} TF/s",
        flush=True,
    )

    # --- full model phases ---
    mesh = make_mesh()
    model = build_pose_net(cfg, mesh=mesh)
    ds = PoseDataset(
        "Human36M", skel, make_synthetic(skel, 2 * B, seed=0, img_size=320), True
    )
    loader = BatchLoader([ds], cfg, B, train=True, num_workers=4)
    state, tx = create_train_state(model, cfg, jax.random.key(0), len(loader), mesh=mesh)

    @jax.jit
    def full_fwd(params, stats, image):
        coords, _ = model.apply(
            {"params": params, "batch_stats": stats},
            image,
            train=True,
            mutable=["batch_stats"],
            method=model.coords,
        )
        return joint_location_loss(coords, tgt, vis, hd)

    @jax.jit
    def full_fwd_bwd(params, stats, image):
        def loss_fn(p):
            coords, _ = model.apply(
                {"params": p, "batch_stats": stats},
                image,
                train=True,
                mutable=["batch_stats"],
                method=model.coords,
            )
            return joint_location_loss(coords, tgt, vis, hd)

        return jax.value_and_grad(loss_fn)(params)

    t_mf, b_mf, f_mf = measure("model fwd+loss      ", full_fwd, (state.params, state.batch_stats, img))
    t_mfb, b_mfb, f_mfb = measure("model fwd+bwd       ", full_fwd_bwd, (state.params, state.batch_stats, img))
    dt, db, dfl = t_mfb - t_mf, b_mfb - b_mf, f_mfb - f_mf
    print(
        f"[model bwd (delta)]   {dt * 1e3:7.2f} ms | {db / 1e9:6.2f} GB -> "
        f"{db / dt / 1e9:6.1f} GB/s ({db / dt / 1e9 / HBM_ROOF_GBPS * 100:4.1f}% of roof) | "
        f"{dfl / 1e9:7.1f} GFLOP -> {dfl / dt / 1e12:6.1f} TF/s",
        flush=True,
    )

    # --- production train step (exactly what bench.py runs, donate=False so
    # the chained-arg methodology can reuse a compiled signature) ---
    step = make_train_step(model, tx, cfg, mesh, donate=False, lean=True)
    batch = next(iter(prefetch_to_device(loader.epoch(0), batch_sharding(mesh))))[0]
    rng = jax.random.key(1)

    lowered = step.lower(state, batch, rng)
    t0 = time.perf_counter()
    compiled = lowered.compile()
    nbytes, flops = cost_bytes_flops(compiled)
    st, metrics = compiled(state, batch, rng)
    _ = float(metrics["loss"])
    compile_s = time.perf_counter() - t0
    for _ in range(3):
        st, metrics = compiled(st, batch, rng)
    _ = float(metrics["loss"])
    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        st, metrics = compiled(st, batch, rng)
    _ = float(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters
    gbps = nbytes / dt / 1e9
    print(
        f"[production step]     {dt * 1e3:7.2f} ms | {nbytes / 1e9:6.2f} GB -> "
        f"{gbps:6.1f} GB/s ({gbps / HBM_ROOF_GBPS * 100:4.1f}% of HBM roof) | "
        f"{flops / 1e9:7.1f} GFLOP -> {flops / dt / 1e12:6.1f} TF/s "
        f"({flops / dt / 1e12 / BF16_ROOF_TFLOPS * 100:4.1f}% MFU) | "
        f"compile {compile_s:.0f}s | {B / dt:.1f} img/s",
        flush=True,
    )
    print("hbm_roofline: DONE", flush=True)


if __name__ == "__main__":
    main()
