#!/usr/bin/env python
"""Stage-wise timing of the flagship train step on the real chip.

The axon tunnel has no working per-op profiler path, so this decomposes the
step by jitting each stage standalone and timing chained executions (same
methodology as bench.py). Run in background; each stage compiles fresh.

    PYTHONUNBUFFERED=1 python tools/step_breakdown.py > /tmp/breakdown.log 2>&1 &
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, args, iters=30, warmup=3, tag=""):
    """Chained timing: fn must return something whose [0] element feeds back
    as args[0] (state-like) or be side-effect free; we re-run on the same
    args and pull one scalar at the end."""
    import jax

    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    try:
        first = float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    except (TypeError, ValueError):
        first = float('nan')
    compile_s = time.perf_counter() - t0
    for _ in range(warmup):
        out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    dt = (time.perf_counter() - t0) / iters
    print(f"[{tag}] {dt * 1e3:.2f} ms (compile {compile_s:.0f}s, first={first:.4g})", flush=True)
    return dt


def main():
    from ihpr_tpu.utils.shutdown import install_graceful_shutdown

    install_graceful_shutdown()
    import jax
    import jax.numpy as jnp
    import optax

    from ihpr_tpu.config import get_config
    from ihpr_tpu.data import skeletons
    from ihpr_tpu.data.datasets import PoseDataset, make_synthetic
    from ihpr_tpu.data.pipeline import BatchLoader, prefetch_to_device
    from ihpr_tpu.models.pose_net import build_pose_net
    from ihpr_tpu.models.resnet import ResNetBackbone
    from ihpr_tpu.models.head import DeconvHead
    from ihpr_tpu.parallel import (
        batch_sharding,
        create_train_state,
        make_mesh,
        make_train_step,
    )
    from ihpr_tpu.ops import joint_location_loss

    cfg = get_config("h36m3d_r50")
    # A/B the BN implementation without an interface change:
    #   IHPR_EXP_BN=lean python tools/step_breakdown.py
    bn_mode = os.environ.get("IHPR_EXP_BN", cfg.model.bn_mode)
    if bn_mode != cfg.model.bn_mode:
        import dataclasses

        cfg = cfg.replace(model=dataclasses.replace(cfg.model, bn_mode=bn_mode))
        print(f"bn_mode={bn_mode}")
    B = cfg.optim.batch_size_per_device
    skel = skeletons.H36M
    J, D = skel.joint_num, cfg.data.depth_dim
    ds = PoseDataset("Human36M", skel, make_synthetic(skel, 2 * B, seed=0, img_size=320), True)
    loader = BatchLoader([ds], cfg, B, train=True, num_workers=4)
    mesh = make_mesh()
    model = build_pose_net(cfg, mesh=mesh)
    state, tx = create_train_state(model, cfg, jax.random.key(0), len(loader), mesh=mesh)
    step = make_train_step(model, tx, cfg, mesh, donate=False)
    batch = next(iter(prefetch_to_device(loader.epoch(0), batch_sharding(mesh))))[0]
    rng = jax.random.key(1)

    dt_full = timeit(lambda s, b: step(s, b, rng)[0].params, (state, batch), tag="full train step")

    # fwd-only coords (the eval forward, no flip)
    @jax.jit
    def fwd_coords(params, stats, image):
        return model.apply(
            {"params": params, "batch_stats": stats}, image, train=False, method=model.coords
        )

    cdt = cfg.model.compute_dtype
    img = jnp.asarray(np.random.RandomState(0).randn(B, 256, 256, 3), jnp.float32)
    timeit(fwd_coords, (state.params, state.batch_stats, img), tag="fwd coords (eval)")

    # fwd-only in TRAIN mode (batch stats computed) incl. loss
    tgt = jnp.asarray(np.random.RandomState(1).rand(B, J, 3) * 16, jnp.float32)
    vis = jnp.ones((B, J), jnp.float32)
    hd = jnp.ones((B,), jnp.float32)

    @jax.jit
    def fwd_train(params, stats, image):
        coords, upd = model.apply(
            {"params": params, "batch_stats": stats},
            image, train=True, mutable=["batch_stats"], method=model.coords,
        )
        return joint_location_loss(coords, tgt, vis, hd)

    timeit(fwd_train, (state.params, state.batch_stats, img), tag="fwd train+loss")

    # fwd+bwd (no optimizer)
    @jax.jit
    def fwd_bwd(params, stats, image):
        def loss_fn(p):
            coords, upd = model.apply(
                {"params": p, "batch_stats": stats},
                image, train=True, mutable=["batch_stats"], method=model.coords,
            )
            return joint_location_loss(coords, tgt, vis, hd)
        l, g = jax.value_and_grad(loss_fn)(params)
        return l, g

    timeit(lambda p, s, i: fwd_bwd(p, s, i)[0], (state.params, state.batch_stats, img), tag="fwd+bwd")

    # optimizer-only: adam update on a grads-shaped tree
    grads = jax.tree.map(jnp.ones_like, state.params)

    @jax.jit
    def opt_only(opt_state, params, grads):
        upd, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), new_opt

    timeit(lambda o, p, g: opt_only(o, p, g)[0], (state.opt_state, state.params, grads), tag="adam update")

    # backbone-only fwd+bwd
    bb = ResNetBackbone(
        resnet_type=cfg.model.resnet_type,
        compute_dtype=cdt,
        bn_mode=cfg.model.bn_mode,
    )
    bvars = bb.init(jax.random.key(0), img[:1], train=False)

    @jax.jit
    def bb_fwd_bwd(params, stats, image):
        def loss_fn(p):
            y, _ = bb.apply(
                {"params": p, "batch_stats": stats}, image, train=True, mutable=["batch_stats"]
            )
            return jnp.mean(jnp.abs(y))
        return jax.value_and_grad(loss_fn)(params)

    timeit(
        lambda p, s, i: bb_fwd_bwd(p, s, i)[0],
        (bvars["params"], bvars["batch_stats"], img),
        tag="backbone fwd+bwd",
    )

    @jax.jit
    def bb_fwd(params, stats, image):
        y, _ = bb.apply(
            {"params": params, "batch_stats": stats},
            image, train=True, mutable=["batch_stats"],
        )
        return jnp.mean(jnp.abs(y))

    timeit(lambda p, s, i: bb_fwd(p, s, i), (bvars["params"], bvars["batch_stats"], img), tag="backbone fwd(train)")

    # head-only (deconvs + fused final-conv+integral) fwd+bwd on 8x8x2048
    head = DeconvHead(
        out_channels=J * D,
        compute_dtype=cdt,
        fp32_logits=cfg.model.fp32_logits,
        bn_mode=cfg.model.bn_mode,
    )
    feat = jnp.asarray(np.random.RandomState(2).randn(B, 8, 8, 2048), cdt)
    hvars = head.init(jax.random.key(0), feat[:1], train=False, mode="coords", joint_num=J, depth_dim=D)

    @jax.jit
    def head_fwd_bwd(params, stats, feat):
        def loss_fn(p):
            coords, _ = head.apply(
                {"params": p, "batch_stats": stats},
                feat, train=True, mutable=["batch_stats"],
                mode="coords", joint_num=J, depth_dim=D,
            )
            return joint_location_loss(coords, tgt, vis, hd)
        return jax.value_and_grad(loss_fn)(params)

    timeit(
        lambda p, s, f: head_fwd_bwd(p, s, f)[0],
        (hvars["params"], hvars["batch_stats"], feat),
        tag="head fwd+bwd (deconv+integral)",
    )

    # deconv stack only fwd+bwd (no final conv / integral)
    class _Deconvs(DeconvHead):
        pass

    @jax.jit
    def head_logits_fwd_bwd(params, stats, feat):
        def loss_fn(p):
            logits, _ = head.apply(
                {"params": p, "batch_stats": stats},
                feat, train=True, mutable=["batch_stats"], mode="logits",
            )
            return jnp.mean(jnp.abs(logits))
        return jax.value_and_grad(loss_fn)(params)

    timeit(
        lambda p, s, f: head_logits_fwd_bwd(p, s, f)[0],
        (hvars["params"], hvars["batch_stats"], feat),
        tag="head fwd+bwd (logits, unfused)",
    )

    print(f"full step reference: {dt_full * 1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
