"""Isolate the exp cost inside the fused integral kernel's hot loop.

PARITY.md's chunk-size entry concludes the fused head+integral kernel is
"VPU/exp-bound (604M exps/step)" — inferred from the chunk-size sweep, never
measured directly. This probe separates the candidate costs at the kernel's
EXACT production geometry (fp32 (256, 1152) blocks, grid (B, 16), one
streaming input read) by timing single-purpose Pallas kernels that differ in
ONE VPU pass:

  read      : DMA the block, write an 8x128 token      (HBM read floor)
  sum       : + one full-block reduce                   (1 VPU pass)
  max+sum   : + a second full-block reduce              (2 VPU passes)
  exp+sum   : sum(exp(v - const))                       (reduce + exp pass)
  exp2+sum  : sum(exp2(v - const))                      (is the *ln2 mul free?)
  bexp+sum  : bf16 exp, fp32 accumulate                 (is there a 2x bf16 path?)

exp+sum minus sum = the marginal cost of the exp pass itself; that times two
(fwd e-pass + bwd p-pass) bounds what ANY exp-avoidance rewrite could save on
the 92.9 ms production step. bexp/exp2 show whether a cheaper exp exists on
this VPU at all.

Timing follows CLAUDE.md's axon rules: chained dispatches, one scalar pull.
Run on the real chip: `python tools/exp_probe.py [--iters 30]`.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, CHUNK, LANES, NCHUNK = 128, 256, 1152, 16


def _kernel(v_ref, o_ref, *, mode):
    v = v_ref[0]
    if mode == "read":
        o_ref[...] = v[:8, :128]
        return
    if mode == "sum":
        r = jnp.sum(v)
    elif mode == "maxsum":
        r = jnp.max(v) + jnp.sum(v)
    elif mode == "expsum":
        r = jnp.sum(jnp.exp(v - 3.0))
    elif mode == "exp2sum":
        r = jnp.sum(jnp.exp2(v - 3.0))
    elif mode == "bexpsum":
        r = jnp.sum(jnp.exp(v.astype(jnp.bfloat16) - 3.0).astype(jnp.float32))
    else:
        raise ValueError(mode)
    o_ref[...] = jnp.full((8, 128), r, jnp.float32)


def build(mode, dtype=jnp.float32):
    f = pl.pallas_call(
        functools.partial(_kernel, mode=mode),
        grid=(B, NCHUNK),
        in_specs=[
            pl.BlockSpec(
                (1, CHUNK, LANES), lambda bi, ci: (bi, ci, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (8, 128), lambda bi, ci: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )

    # Chain iterations through a data dependency (axon: block_until_ready
    # returns early; only a scalar pull is a real barrier). The input rides
    # the scan carry and each iteration perturbs ONE element by tok*1e-30
    # (in-place dynamic-update-slice on the carried buffer) — a dependency
    # XLA can neither hoist (loop-variant) nor fold away (eps*tok is not
    # algebraically zero), and it adds no measurable HBM traffic, unlike
    # a full `x + carry` elementwise add (3x traffic inflation).
    @functools.partial(jax.jit, static_argnums=1)
    def run(x, n_iters):
        def body(carry, _):
            x, tok = carry
            x = x.at[0, 0, 0].add(tok * 1e-30)
            tok = f(x)[0, 0]
            return (x, tok), None

        (_, tok), _ = jax.lax.scan(
            body, (x, jnp.float32(0)), None, length=n_iters
        )
        return tok * 1e-30

    return run


def main():
    from ihpr_tpu.utils.shutdown import install_graceful_shutdown

    install_graceful_shutdown()
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    x = jax.random.normal(jax.random.key(0), (B, CHUNK * NCHUNK, LANES), jnp.float32)
    x = x - 3.0  # exp operand range matches the stabilized kernel
    gb = x.size * 4 / 1e9
    results = {}
    for mode in ["read", "sum", "maxsum", "expsum", "exp2sum", "bexpsum"]:
        try:
            run = build(mode)
            # Warm with the SAME static n_iters as the timed call: the scan
            # length is baked into the jaxpr, so run(x, 2) would compile a
            # DIFFERENT program and the timed call would pay its own 30-400 s
            # remote compile inside the perf_counter window.
            float(run(x, args.iters))  # compile + warm the timed program
            t0 = time.perf_counter()
            float(run(x, args.iters))
            dt = (time.perf_counter() - t0) / args.iters
            results[mode] = dt
            print(
                f"{mode:8s} {dt * 1e3:7.2f} ms  ({gb / dt:6.1f} GB/s read)",
                flush=True,
            )
        except Exception as e:  # noqa: BLE001 — clean exit keeps the TPU seat
            print(f"{mode:8s} FAILED: {type(e).__name__}: {e}", flush=True)
    if "read" in results and results["read"] < gb / 1200:
        # v5e HBM is ~820 GB/s; a "read" under the 1.2 TB/s bound means the
        # scan chain was optimized away and every number here is a lie.
        print(
            f"\nWARNING: read floor {results['read'] * 1e3:.2f} ms implies "
            f">1.2 TB/s — the dependency chain broke; numbers invalid."
        )
    if "sum" in results and "expsum" in results:
        d = results["expsum"] - results["sum"]
        print(
            f"\nmarginal exp pass: {d * 1e3:.2f} ms per {B * CHUNK * NCHUNK * LANES / 1e6:.0f}M exps"
            f" -> fwd+bwd bound ~{2 * d * 1e3:.2f} ms of the 92.9 ms step"
        )


if __name__ == "__main__":
    main()
