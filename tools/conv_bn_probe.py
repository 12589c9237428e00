#!/usr/bin/env python
"""On-chip A/B of the fused 3x3-conv+BN-stats kernel vs XLA's conv.

VERDICT r3 task 4: before accepting ~1381 img/s as the ceiling, measure
ONE Pallas conv block with a fused BN-stats epilogue on the highest-
traffic 3x3 convs (R50 stage-2/3 bottleneck mid-convs). This probe
times, per shape and per direction (fwd, fwd+bwd):

  - XLA twin: lax.conv + separate stats sums (what the unfused
    Bottleneck costs today, including the stats re-read of y)
  - Pallas fused_conv3x3_bn (stats computed in VMEM pre-cast)
  - both with the relu(x*mul+add) prologue (the in-situ configuration,
    where the preceding BN-apply activation never exists in HBM) and
    without it

Methodology (CLAUDE.md): the axon tunnel's block_until_ready returns
early, so every timing chains the computation through a data dependence
and pulls ONE scalar at the end.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ihpr_tpu.utils.shutdown import install_graceful_shutdown

install_graceful_shutdown()

from ihpr_tpu.ops.conv_bn import _reference, fused_conv3x3_bn, supported

# R50 @ 256x256: stage-2 and stage-3 bottleneck mid-convs at B=128 (the
# driver bench config). Equal-FLOP shapes: 18*B*HW*C*N = 4.95 TFLOP each.
SHAPES = [
    ("stage2 conv2 128x32x32x128->128", 128, 32, 32, 128, 128),
    ("stage3 conv2 128x16x16x256->256", 128, 16, 16, 256, 256),
    ("stage4 conv2 128x8x8x512->512", 128, 8, 8, 512, 512),
]


def _time_chained(fn, x0, iters=30, warmup=3):
    """fn: x -> (scalar-ish array, x-like feedback). Chains feedback into
    the next call; one float() pull at the end."""
    x = x0
    out = None
    for _ in range(warmup):
        out, x = fn(x)
    _ = float(out)  # settle
    t0 = time.perf_counter()
    x = x0
    for _ in range(iters):
        out, x = fn(x)
    _ = float(out)
    return (time.perf_counter() - t0) / iters


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.RandomState(0)
    results = {}
    for name, b, h, w, c, n in SHAPES:
        assert c == n, "feedback chaining assumes C == N"
        if not supported(b, h, w, c, n, 1, 2):
            # e.g. stage4 512ch: the 9 resident fp32 dw blocks alone
            # (9*512*512*6 B) exceed the VMEM budget for the backward.
            print(f"[{name}] SKIPPED: unsupported (VMEM budget)", flush=True)
            continue
        x0 = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32) * 0.3).astype(
            jnp.bfloat16
        )
        wk = jnp.asarray(rng.randn(3, 3, c, n).astype(np.float32) * 0.05).astype(
            jnp.bfloat16
        )
        mul = jnp.asarray(rng.uniform(0.5, 1.5, c).astype(np.float32))
        add = jnp.asarray(rng.randn(c).astype(np.float32) * 0.2)
        flops = 18 * b * h * w * c * n

        def variants(prologue: bool):
            m, a = (mul, add) if prologue else (None, None)

            @jax.jit
            def xla_fwd(x):
                y, s1, s2 = _reference(x, wk, m, a, 1)
                out = s1.sum() + s2.sum()
                return out, x0 + (y * jnp.bfloat16(1e-3))

            @jax.jit
            def pal_fwd(x):
                y, s1, s2 = fused_conv3x3_bn(x, wk, m, a)
                out = s1.sum() + s2.sum()
                return out, x0 + (y * jnp.bfloat16(1e-3))

            def loss_ref(x):
                y, s1, s2 = _reference(x, wk, m, a, 1)
                return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6 + s1.sum() + s2.sum()

            def loss_pal(x):
                y, s1, s2 = fused_conv3x3_bn(x, wk, m, a)
                return jnp.sum(y.astype(jnp.float32) ** 2) * 1e-6 + s1.sum() + s2.sum()

            @jax.jit
            def xla_fb(x):
                v, g = jax.value_and_grad(loss_ref)(x)
                return v, x0 + g.astype(jnp.bfloat16) * jnp.bfloat16(1e-3)

            @jax.jit
            def pal_fb(x):
                v, g = jax.value_and_grad(loss_pal)(x)
                return v, x0 + g.astype(jnp.bfloat16) * jnp.bfloat16(1e-3)

            return xla_fwd, pal_fwd, xla_fb, pal_fb

        for prologue in (False, True):
            tag = "prologue" if prologue else "plain"
            xla_fwd, pal_fwd, xla_fb, pal_fb = variants(prologue)
            for vname, fn in (
                ("xla_fwd", xla_fwd),
                ("pal_fwd", pal_fwd),
                ("xla_fwdbwd", xla_fb),
                ("pal_fwdbwd", pal_fb),
            ):
                try:
                    dt = _time_chained(fn, x0)
                except Exception as e:  # Mosaic failures must exit cleanly
                    print(f"[{name}][{tag}] {vname}: FAILED {type(e).__name__}: "
                          f"{str(e)[:300]}", flush=True)
                    results[(name, tag, vname)] = None
                    continue
                mult = 3 if "bwd" in vname else 1
                tf = mult * flops / dt / 1e12
                results[(name, tag, vname)] = dt
                print(
                    f"[{name}][{tag}] {vname}: {dt * 1e3:.3f} ms "
                    f"({tf:.1f} TFLOP/s eff)",
                    flush=True,
                )

    print("\nsummary (pallas/xla speedup, >1 = pallas wins):", flush=True)
    for name, *_ in SHAPES:
        for tag in ("plain", "prologue"):
            for d in ("fwd", "fwdbwd"):
                a = results.get((name, tag, f"xla_{d}"))
                p = results.get((name, tag, f"pal_{d}"))
                if a and p:
                    print(f"  {name} [{tag}] {d}: {a / p:.3f}x", flush=True)


if __name__ == "__main__":
    main()
