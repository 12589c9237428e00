#!/usr/bin/env python
"""Go/no-go probe: does XLA:TPU run int8 convs at the int8 MXU rate?

SUPERSEDED (round 4) by tools/mxu_int8_probe.py: this probe's timing
token (``y[0, 0, 0, :1] * 0``) lets XLA narrow/fold the conv it is
supposed to time — its bf16 number exceeded the chip's peak — so its
0.67x conclusion was an artifact. Kept for the ledger; use the new probe.

v5e lists 394 int8 TOPS vs 197 bf16 TFLOPs. If lax.conv with int8
operands + int32 accumulation approaches 2x the bf16 conv rate, an
int8-quantized serving path is worth building; if XLA upcasts or the
rate is flat, it is not (at least not without a hand-written Mosaic
kernel).

    PYTHONUNBUFFERED=1 python tools/int8_probe.py > /tmp/int8_probe.log 2>&1 &
"""

from __future__ import annotations

import time

import numpy as np


def time_conv(x, w, iters=30):
    import jax
    import jax.numpy as jnp

    acc_dtype = jnp.int32 if x.dtype == jnp.int8 else jnp.float32

    @jax.jit
    def step(x, w, acc):
        # acc feeds the input so iterations are truly serialized; all ops
        # stay inside one compiled program.
        xi = x + acc.astype(x.dtype)
        y = jax.lax.conv_general_dilated(
            xi,
            w,
            window_strides=(1, 1),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=acc_dtype,
        )
        return (y[0, 0, 0, :1] * 0).astype(acc_dtype)

    acc = jnp.zeros((1,), acc_dtype)
    acc = step(x, w, acc)  # compile
    _ = int(np.asarray(acc[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        acc = step(x, w, acc)
    _ = int(np.asarray(acc[0]))  # single truthful pull
    dt = (time.perf_counter() - t0) / iters
    return dt


def main():
    import jax
    import jax.numpy as jnp

    B, H, W, C = 64, 64, 64, 256
    K = 3
    rng = np.random.RandomState(0)
    xf = rng.randn(B, H, W, C).astype(np.float32)
    wf = (rng.randn(K, K, C, C) * 0.05).astype(np.float32)
    flops = 2 * B * H * W * C * C * K * K

    results = {}
    for name, xa, wa in (
        ("bf16", jnp.asarray(xf, jnp.bfloat16), jnp.asarray(wf, jnp.bfloat16)),
        (
            "int8",
            jnp.asarray(np.clip(np.round(xf * 10), -127, 127), jnp.int8),
            jnp.asarray(np.clip(np.round(wf * 100), -127, 127), jnp.int8),
        ),
        ("fp32", jnp.asarray(xf), jnp.asarray(wf)),
    ):
        try:
            dt = time_conv(xa, wa)
            results[name] = dt
            print(
                f"[{name}] {dt * 1e3:.3f} ms = {flops / dt / 1e12:.1f} T(fl)op/s",
                flush=True,
            )
        except Exception as e:
            print(f"[{name}] FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
    if "bf16" in results and "int8" in results:
        print(f"int8 speedup over bf16: {results['bf16'] / results['int8']:.2f}x")


if __name__ == "__main__":
    main()
