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
    from ihpr_tpu.utils.shutdown import install_graceful_shutdown

    install_graceful_shutdown()
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

    # --- 2c. fused matmul+BN-stats kernel (ops/matmul_bn.py) ---
    # Mosaic lowering + numerics: fp32 gradcheck at a supported fp32
    # shape, then a bf16 fwd/bwd run at the Bottleneck stage-3 conv1
    # shape the production path would use. Only the real chip exercises
    # the Mosaic path (CPU tests run in interpret mode).
    from ihpr_tpu.ops.matmul_bn import _reference, fused_matmul_bn, supported

    m3, k3, n3 = 2048, 256, 512
    xb = jnp.asarray(rng.randn(m3, k3).astype(np.float32) * 0.1)
    wb = jnp.asarray(rng.randn(k3, n3).astype(np.float32) * 0.05)
    mulb = jnp.asarray(np.abs(rng.randn(k3)).astype(np.float32) + 0.5)
    addb = jnp.asarray(rng.randn(k3).astype(np.float32) * 0.1)
    assert supported(m3, k3, n3, 4)

    def fused_loss(x, w, mul, add):
        y, s1, s2 = fused_matmul_bn(x, w, mul, add)
        return jnp.sum(y * y) + jnp.sum(s1) + 1e-3 * jnp.sum(s2)

    def ref_loss(x, w, mul, add):
        y, s1, s2 = _reference(x, w, mul, add)
        return jnp.sum(y * y) + jnp.sum(s1) + 1e-3 * jnp.sum(s2)

    yf, s1f, s2f = jax.jit(fused_matmul_bn)(xb, wb, mulb, addb)
    yr, s1r, s2r = jax.jit(_reference)(xb, wb, mulb, addb)
    dy = float(jnp.abs(yf - yr).max())
    ds = float(jnp.abs(s1f - s1r).max() / (jnp.abs(s1r).max() + 1))
    assert dy < 1e-3 and ds < 1e-4, (dy, ds)
    gf = jax.jit(jax.grad(fused_loss, argnums=(0, 1, 2, 3)))(xb, wb, mulb, addb)
    gr = jax.jit(jax.grad(ref_loss, argnums=(0, 1, 2, 3)))(xb, wb, mulb, addb)
    gmax = max(
        float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1))
        for a, b in zip(gf, gr)
    )
    assert gmax < 1e-4, gmax
    print(f"2c. fused matmul+BN kernel fwd {dy:.2e} grad {gmax:.2e} OK")

    # bf16 at the production stage-3 conv1 shape (M=B*H*W, 1024 -> 256):
    # fused vs plain-JAX twin, both in bf16 (reduction-order differences
    # only — the stats epilogue accumulates fp32 either way).
    mh, kh, nh = 4096, 1024, 256
    xh = jnp.asarray(rng.randn(mh, kh).astype(np.float32) * 0.1).astype(jnp.bfloat16)
    wh = jnp.asarray(rng.randn(kh, nh).astype(np.float32) * 0.05).astype(jnp.bfloat16)
    mulh = jnp.asarray(np.abs(rng.randn(kh)).astype(np.float32) + 0.5)
    addh = jnp.asarray(rng.randn(kh).astype(np.float32) * 0.1)
    assert supported(mh, kh, nh, 2)
    yh, s1h, s2h = jax.jit(fused_matmul_bn)(xh, wh, mulh, addh)
    yhr, s1hr, s2hr = jax.jit(_reference)(xh, wh, mulh, addh)
    rel = float(jnp.abs(s1h - s1hr).max() / (jnp.abs(s1hr).max() + 1e-6))
    gh = jax.jit(jax.grad(lambda *a: fused_loss(*a), argnums=(0, 1)))(xh, wh, mulh, addh)
    ghr = jax.jit(jax.grad(lambda *a: ref_loss(*a), argnums=(0, 1)))(xh, wh, mulh, addh)
    relg = max(
        float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max()
              / (jnp.abs(b.astype(jnp.float32)).max() + 1e-6))
        for a, b in zip(gh, ghr)
    )
    assert rel < 2e-2 and relg < 3e-2 and bool(jnp.isfinite(yh.astype(jnp.float32)).all()), (rel, relg)
    print(f"2d. fused matmul+BN bf16 stage-3 shape: stats {rel:.2e} grad {relg:.2e} OK")

    # --- 2e. fused head+integral kernel: exp vs exp2 (base-2 softmax) ---
    # Identical math up to one fp rounding of the log2e-scaled weights;
    # the real chip additionally proves jnp.exp2 Mosaic lowering inside
    # the fused kernel. IHPR_EXP2 is read at trace time.
    from ihpr_tpu.ops.fused_head_integral import fused_final_conv_integral

    fe = jnp.asarray(rng.randn(2, 64, 64, 256).astype(np.float32) * 0.3)
    ke = jnp.asarray(rng.randn(256, 18 * 64).astype(np.float32) * 0.02)
    be = jnp.asarray(rng.randn(18 * 64).astype(np.float32) * 0.05)

    def head_loss(f, k, bb):
        return jnp.sum(fused_final_conv_integral(f, k, bb, 18, 64) ** 2)

    os.environ.pop("IHPR_EXP2", None)
    c_e = jax.jit(lambda f, k, bb: fused_final_conv_integral(f, k, bb, 18, 64))(fe, ke, be)
    g_e = jax.jit(jax.grad(head_loss, argnums=(0, 1, 2)))(fe, ke, be)
    os.environ["IHPR_EXP2"] = "1"
    c_2 = jax.jit(lambda f, k, bb: fused_final_conv_integral(f, k, bb, 18, 64))(fe, ke, be)
    g_2 = jax.jit(jax.grad(head_loss, argnums=(0, 1, 2)))(fe, ke, be)
    os.environ.pop("IHPR_EXP2", None)
    dc = float(jnp.abs(c_e - c_2).max())
    dg = max(
        float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-9))
        for a, b in zip(g_e, g_2)
    )
    assert dc < 1e-3 and dg < 1e-3 and bool(jnp.isfinite(c_2).all()), (dc, dg)
    print(f"2e. fused head exp2 vs exp: coords {dc:.2e} grad {dg:.2e} OK")

    # --- 2f. bexp backward Mosaic lowering (bf16 exp inside the kernel) ---
    # Compile-checks the measurement mode BEFORE tools/bwd_experiments.py
    # runs it on the production step — a Mosaic failure there would cost a
    # ~75 min seat-lock (CLAUDE.md). Forward is untouched by design;
    # gradients may differ ~2^-9 relative (bf16 transcendental).
    os.environ["IHPR_BEXP"] = "1"
    try:
        g_b = jax.jit(jax.grad(head_loss, argnums=(0, 1, 2)))(fe, ke, be)
        db_rel = max(
            float(jnp.abs(a - b).max() / (jnp.abs(b).max() + 1e-9))
            for a, b in zip(g_b, g_e)
        )
        assert db_rel < 3e-2 and all(
            bool(jnp.isfinite(a).all()) for a in g_b
        ), db_rel
        print(f"2f. fused head bexp backward: grad delta {db_rel:.2e} OK")
    finally:
        os.environ.pop("IHPR_BEXP", None)

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

    # --- 5. StableHLO serving artifact on the real chip ---
    # Export (plain-XLA composition, weights baked in), deserialize, run
    # on-TPU, and compare against the live server on the same patches.
    from ihpr_tpu.engine.export import export_server, load_exported

    patches = rng.randint(0, 255, (8, *cfg.data.input_shape, 3)).astype(np.uint8)
    live = srv.predict_patches(patches)
    fn = load_exported(export_server(srv))
    art = np.asarray(fn(patches, np.ones((8, 3), np.float32)))
    d = np.abs(art - live).max()
    # live path may use the Mosaic kernel; the artifact uses the plain
    # composition — equivalence-tested numerics, loose fp tolerance here.
    assert d < 1e-3, d
    print(f"5. exported artifact vs live server: {d:.2e} OK")
    print("ALL TPU SMOKE CHECKS PASSED")


if __name__ == "__main__":
    main()
