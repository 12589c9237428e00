#!/usr/bin/env python
"""One-command TPU smoke suite: runs the checks that CANNOT run under the
CPU test harness (Mosaic kernel lowering, real-chip numerics, serving).

Usage: python tools/tpu_smoke.py [--fast]

Asserts (and prints) on the real chip:
  1. fused Pallas integral fwd vs fp64 ground truth, grad vs plain-JAX
     autodiff (production shape J=18, D=64, 64x64).
  2. padded odd-joint path (J=17) and the large config-#4 plane (96x72).
  3. flagship train step: finite loss + grads, chained-steps timing.
  4. PoseServer end-to-end request.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

# runnable from anywhere: repo root is one level up from tools/
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fast", action="store_true", help="skip timing loops")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    assert jax.default_backend() == "tpu", jax.default_backend()
    print(f"devices: {jax.devices()}")

    from ihpr_tpu.ops import soft_argmax_3d
    from ihpr_tpu.ops.integral_pallas import soft_argmax_from_heatmap

    # --- 1. kernel numerics ---
    rng = np.random.RandomState(0)
    B, J, D, H, W = 8, 18, 64, 64, 64
    hm = rng.randn(B, H, W, J * D).astype(np.float32)
    x = jnp.asarray(hm)
    coords = np.asarray(jax.jit(lambda v: soft_argmax_from_heatmap(v, J, D))(x))
    v64 = hm.reshape(B, H, W, J, D).transpose(0, 3, 4, 1, 2).astype(np.float64).reshape(B, J, -1)
    p = np.exp(v64 - v64.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    p = p.reshape(B, J, D, H, W)
    gt = np.stack(
        [
            (p.sum((2, 3)) * np.arange(W)).sum(-1),
            (p.sum((2, 4)) * np.arange(H)).sum(-1),
            (p.sum((3, 4)) * np.arange(D)).sum(-1),
        ],
        -1,
    )
    err = np.abs(coords - gt).max()
    assert err < 5e-4, err
    print(f"1a. kernel fwd vs fp64: {err:.2e} OK")

    g_f = jax.jit(jax.grad(lambda v: soft_argmax_from_heatmap(v, J, D).sum()))(x)
    g_p = jax.jit(
        jax.grad(
            lambda v: soft_argmax_3d(
                v.reshape(B, H, W, J, D).transpose(0, 3, 4, 1, 2)
            ).sum()
        )
    )(x)
    gerr = float(jnp.abs(g_f - g_p).max())
    assert gerr < 1e-5, gerr
    print(f"1b. kernel grad vs plain autodiff: {gerr:.2e} OK")

    # --- 2. odd joints + config-#4 plane ---
    hm17 = jnp.asarray(rng.randn(2, 64, 64, 17 * 64).astype(np.float32))
    c17 = jax.jit(lambda v: soft_argmax_from_heatmap(v, 17, 64))(hm17)
    ref17 = soft_argmax_3d(hm17.reshape(2, 64, 64, 17, 64).transpose(0, 3, 4, 1, 2))
    d17 = float(jnp.abs(c17 - ref17).max())
    assert d17 < 5e-4 and not bool(jnp.isnan(c17).any()), d17
    print(f"2a. J=17 padded path: {d17:.2e} OK")

    hm96 = jnp.asarray(rng.randn(1, 96, 72, 18 * 64).astype(np.float32))
    c96 = jax.jit(lambda v: soft_argmax_from_heatmap(v, 18, 64))(hm96)
    ref96 = soft_argmax_3d(hm96.reshape(1, 96, 72, 18, 64).transpose(0, 3, 4, 1, 2))
    d96 = float(jnp.abs(c96 - ref96).max())
    assert d96 < 5e-4, d96
    print(f"2b. 96x72 plane (config #4): {d96:.2e} OK")

    # --- 3. flagship train step ---
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
    skel = skeletons.H36M
    ds = PoseDataset("Human36M", skel, make_synthetic(skel, 96, seed=0, img_size=320), True)
    loader = BatchLoader([ds], cfg, 32, train=True, num_workers=4)
    mesh = make_mesh(1)
    model = build_pose_net(cfg)
    state, tx = create_train_state(model, cfg, jax.random.key(0), 10, mesh=mesh)
    step = make_train_step(model, tx, cfg, mesh, donate=True)
    batches = [b for b, _ in prefetch_to_device(loader.epoch(0), batch_sharding(mesh))][:2]
    rngk = jax.random.key(1)
    state, m = step(state, batches[0], rngk)
    loss = float(m["loss"])
    gn = float(m["grad_norm"])
    assert np.isfinite(loss) and np.isfinite(gn), (loss, gn)
    print(f"3a. train step: loss {loss:.3f} |g| {gn:.3f} OK")
    if not args.fast:
        for i in range(3):
            state, m = step(state, batches[(i + 1) % 2], rngk)
        _ = float(m["loss"])
        n = 20
        t0 = time.perf_counter()
        for i in range(n):
            state, m = step(state, batches[i % 2], rngk)
        _ = float(m["loss"])
        dt = (time.perf_counter() - t0) / n
        print(f"3b. {dt * 1e3:.1f} ms/step -> {32 / dt:.0f} img/s/chip")

    # --- 4. serving ---
    from ihpr_tpu.engine.server import PoseServer
    from ihpr_tpu.models.pose_net import init_pose_net

    params, bstats = init_pose_net(model, jax.random.key(0), cfg.data.input_shape)
    srv = PoseServer(cfg, params, bstats, max_batch=8)
    imgs = [rng.randint(0, 255, (400, 300, 3)).astype(np.uint8) for _ in range(3)]
    res = srv.predict(imgs, np.array([[50, 60, 180, 260]] * 3, np.float32), root_z=np.full(3, 4000.0))
    assert len(res) == 3 and all(np.isfinite(r.coords_img).all() for r in res)
    print("4. PoseServer end-to-end OK")
    print("ALL TPU SMOKE CHECKS PASSED")


if __name__ == "__main__":
    main()
