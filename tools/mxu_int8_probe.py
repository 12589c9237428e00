#!/usr/bin/env python
"""Is the v5e's double-rate int8 MXU reachable at all — and through what?

PARITY.md's int8 row (tools/int8_probe.py) measured XLA's int8
`conv_general_dilated` at 0.67x the bf16 conv rate and concluded int8
serving "would need hand-written Mosaic conv kernels to pay off; not
pursued". That probe tested exactly ONE lowering. This one measures the
remaining candidates, each int8-vs-bf16 at the same shape:

  dot      : XLA `lax.dot_general` M=N=K=4096 (does XLA's MATMUL path —
             as opposed to its conv path — hit the int8 MXU rate?)
  pallas   : a tiled Pallas matmul (K-innermost grid, VMEM fp32/int32
             accumulator) — does MOSAIC emit double-rate int8 MXU ops?
  conv9    : a 3x3 SAME conv expressed as 9 shifted (B*H*W, C) @ (C, C)
             dots at tools/int8_probe.py's exact conv shape — if the dot
             path is double-rate, this is the no-custom-kernel recipe an
             int8 serving backbone would use
  convref  : XLA `conv_general_dilated` at the same shape (re-run of the
             round-2 probe inside this harness, so every comparison is
             same-process)

Decision rule: if neither `dot` nor `pallas` exceeds ~1.3x its bf16 twin,
the double-rate path is unreachable from this software stack and the
PARITY row upgrades from "not pursued" to "measured out". If one of them
does, conv9's number says whether a quantized serving backbone inherits
the win after the shift/reshape overhead.

Timing follows CLAUDE.md's axon rules (block_until_ready returns early):
iterations chained through a scan-carried data dependency (loop-variant
single-element perturbation, not hoistable/foldable), warmed with the
SAME static scan length as the timed call, one scalar pull per
measurement. Every phase is try/except'd so a Mosaic rejection exits the
process cleanly (an unclean death seat-locks the chip).

Run on the real chip:
    PYTHONUNBUFFERED=1 python tools/mxu_int8_probe.py > /tmp/mxu_int8.log 2>&1 &
CPU sanity (interpret-mode Pallas, tiny shapes, correctness asserts):
    JAX_PLATFORMS=cpu python tools/mxu_int8_probe.py --check
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _perturb(x, tok):
    """Loop-variant, non-foldable single-element nudge of the carried
    input (exp_probe's trick, extended to integer dtypes)."""
    idx = (0,) * x.ndim
    if jnp.issubdtype(x.dtype, jnp.integer):
        return x.at[idx].add((tok % 2).astype(x.dtype))
    return x.at[idx].add(tok.astype(x.dtype) * 1e-30)


def make_runner(f, tok_dtype):
    """f(x, w) -> scalar token. Returns run(x, w, n_iters) with the
    iterations serialized through the carry."""

    @functools.partial(jax.jit, static_argnums=2)
    def run(x, w, n_iters):
        def body(carry, _):
            x, tok = carry
            x = _perturb(x, tok)
            tok = f(x, w)
            return (x, tok), None

        (_, tok), _ = jax.lax.scan(
            body, (x, jnp.zeros((), tok_dtype)), None, length=n_iters
        )
        return tok

    return run


def time_runner(run, x, w, iters):
    _ = float(run(x, w, iters))  # compile + warm the EXACT timed program
    t0 = time.perf_counter()
    _ = float(run(x, w, iters))
    return (time.perf_counter() - t0) / iters


# ---------------------------------------------------------------- phases


def xla_dot(x, w):
    acc = jnp.int32 if x.dtype == jnp.int8 else jnp.float32
    y = jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())), preferred_element_type=acc
    )
    # Token = full-output reduce: a single-element token lets XLA narrow
    # the whole matmul/conv to the slice that feeds it (first run of this
    # probe measured a 294 TF/s "conv" — above the chip's 197 peak — from
    # exactly that). The reduce adds one read pass over y, identical for
    # both dtypes of each comparison pair.
    return jnp.sum(y)


def _mm_kernel(a_ref, b_ref, o_ref, acc_ref, *, ksteps):
    @pl.when(pl.program_id(2) == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jnp.dot(
        a_ref[...], b_ref[...], preferred_element_type=acc_ref.dtype
    )

    @pl.when(pl.program_id(2) == ksteps - 1)
    def _emit():
        o_ref[...] = acc_ref[...]


def pallas_mm(m, n, k, dtype, bm=512, bn=512, bk=None):
    """Tiled (m, k) @ (k, n) with a VMEM accumulator. Block sizes keep the
    estimated scoped VMEM well under Mosaic's 16 MB stack (double-buffered
    a/b tiles + the resident accumulator)."""
    acc = jnp.int32 if dtype == jnp.int8 else jnp.float32
    if bk is None:
        bk = 1024 if dtype == jnp.int8 else 512
    assert m % bm == 0 and n % bn == 0 and k % bk == 0
    ksteps = k // bk
    f = pl.pallas_call(
        functools.partial(_mm_kernel, ksteps=ksteps),
        grid=(m // bm, n // bn, ksteps),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((m, n), acc),
        scratch_shapes=[pltpu.VMEM((bm, bn), acc)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")
        ),
        interpret=jax.default_backend() != "tpu",
    )
    return f


def conv9(x, w):
    """3x3 SAME conv as 9 shifted matmuls (the XLA-level analog of
    ops/conv_bn.py's Mosaic structure); x (B,H,W,C) w (3,3,C,C)."""
    b, h, wd, c = x.shape
    acc = jnp.int32 if x.dtype == jnp.int8 else jnp.float32
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = jnp.zeros((b * h * wd, c), acc)
    for dy in range(3):
        for dx in range(3):
            xs = xp[:, dy : dy + h, dx : dx + wd, :].reshape(b * h * wd, c)
            out = out + jax.lax.dot_general(
                xs, w[dy, dx], (((1,), (0,)), ((), ())),
                preferred_element_type=acc,
            )
    return jnp.sum(out)


def xla_conv(x, w):
    acc = jnp.int32 if x.dtype == jnp.int8 else jnp.float32
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=acc,
    )
    return jnp.sum(y)


# ------------------------------------------------------------------ main


def _mats(rng, m, n, k, dtype):
    a = rng.randn(m, k).astype(np.float32)
    b = (rng.randn(k, n) * 0.05).astype(np.float32)
    if dtype == jnp.int8:
        a = np.clip(np.round(a * 10), -127, 127)
        b = np.clip(np.round(b * 100), -127, 127)
    return jnp.asarray(a, dtype), jnp.asarray(b, dtype)


def check():
    """Interpret-mode correctness of the Pallas matmul + conv9 algebra."""
    rng = np.random.RandomState(0)
    for dtype in (jnp.bfloat16, jnp.int8):
        a, b = _mats(rng, 1024, 1024, 1024, dtype)
        got = pallas_mm(1024, 1024, 1024, dtype)(a, b)
        acc = jnp.int32 if dtype == jnp.int8 else jnp.float32
        want = jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=acc
        )
        if dtype == jnp.int8:
            assert (np.asarray(got) == np.asarray(want)).all(), "int8 mm"
        else:
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(want), rtol=2e-2
            )
    x = jnp.asarray(
        np.clip(rng.randn(2, 8, 8, 128) * 10, -127, 127), jnp.int8
    )
    w = jnp.asarray(
        np.clip(rng.randn(3, 3, 128, 128) * 5, -127, 127), jnp.int8
    )
    # conv9 vs XLA conv, full-tensor version of the token scalars
    b_, h_, w_, c_ = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = jnp.zeros((b_ * h_ * w_, c_), jnp.int32)
    for dy in range(3):
        for dx in range(3):
            xs = xp[:, dy : dy + h_, dx : dx + w_, :].reshape(-1, c_)
            out = out + jax.lax.dot_general(
                xs, w[dy, dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    ).reshape(-1, c_)
    assert (np.asarray(out) == np.asarray(ref)).all(), "conv9 algebra"
    print("check OK: pallas_mm (bf16+int8) and conv9 match references")


def main():
    from ihpr_tpu.utils.shutdown import install_graceful_shutdown

    install_graceful_shutdown()
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()
    if args.check:
        check()
        return

    rng = np.random.RandomState(0)
    M = N = K = 4096
    mm_flops = 2 * M * N * K
    B, H, W, C = 64, 64, 64, 256
    conv_flops = 2 * B * H * W * C * C * 9
    results: dict[str, float] = {}

    def phase(name, f, x, w, flops):
        tok_dtype = jnp.int32 if x.dtype == jnp.int8 else jnp.float32
        try:
            dt = time_runner(make_runner(f, tok_dtype), x, w, args.iters)
            results[name] = flops / dt
            print(
                f"{name:14s} {dt * 1e3:7.3f} ms = "
                f"{flops / dt / 1e12:6.1f} T(fl)op/s",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001 — clean exit keeps the TPU seat
            print(
                f"{name:14s} FAILED: {type(e).__name__}: {str(e)[:300]}",
                flush=True,
            )

    tiles = [(512, 512, 1024), (512, 1024, 512), (1024, 1024, 512),
             (256, 512, 2048)]
    for dtype, tag in ((jnp.bfloat16, "bf16"), (jnp.int8, "int8")):
        a, b = _mats(rng, M, N, K, dtype)
        phase(f"dot_{tag}", xla_dot, a, b, mm_flops)
        for bm, bn, bk in tiles:
            phase(
                f"pallas_{tag}_{bm}x{bn}x{bk}",
                lambda x, w, _f=pallas_mm(M, N, K, dtype, bm, bn, bk): jnp.sum(
                    _f(x, w)
                ),
                a,
                b,
                mm_flops,
            )
        best = max(
            (v for p, v in results.items() if p.startswith(f"pallas_{tag}_")),
            default=None,
        )
        if best is not None:
            results[f"pallas_{tag}"] = best

    xf = rng.randn(B, H, W, C).astype(np.float32)
    wf = (rng.randn(3, 3, C, C) * 0.05).astype(np.float32)
    for dtype, tag in ((jnp.bfloat16, "bf16"), (jnp.int8, "int8")):
        if dtype == jnp.int8:
            x = jnp.asarray(np.clip(np.round(xf * 10), -127, 127), dtype)
            w = jnp.asarray(np.clip(np.round(wf * 100), -127, 127), dtype)
        else:
            x, w = jnp.asarray(xf, dtype), jnp.asarray(wf, dtype)
        phase(f"conv9_{tag}", conv9, x, w, conv_flops)
        phase(f"convref_{tag}", xla_conv, x, w, conv_flops)

    print()
    for pair in ("dot", "pallas", "conv9", "convref"):
        b8, i8 = results.get(f"{pair}_bf16"), results.get(f"{pair}_int8")
        if b8 and i8:
            print(f"{pair}: int8 is {i8 / b8:.2f}x bf16", flush=True)


if __name__ == "__main__":
    main()
