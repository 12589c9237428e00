#!/usr/bin/env python
"""Dispatch-cost probes for the exported StableHLO artifact on the axon tunnel.

Round-5 evidence behind PARITY.md's "Exported-artifact decomposition": the
artifact's true per-dispatch cost, the tunnel RTT, and the intermittent
chained-`Exported.call` pathology. Run on the real chip:

    python tools/export_chain_probe.py

Phases (B=32, flip-test on, h36m3d_r50):
  chain sweep   — outer-jit chain of the artifact, N=3..32, one final pull:
                  ms/link = exec + RTT/N; the asymptote is the exec cost.
  per-link pull — synchronous float() pull after every dispatch, for both
                  the artifact and the LIVE server program: the live
                  (perlink − chained) difference measures the tunnel RTT,
                  which then corrects the artifact's per-link figure.
  live chained  — serving_bench 2b's RTT-free methodology (control).
  unchained     — N=20 vs N=40 linearity check: on this backend unchained
                  batches are elided (total wall time ~constant in N), so
                  unchained timing is untrustworthy (CLAUDE.md rule).

Measured 2026-08-20 (committed in PARITY.md): artifact exec 15.7–16.5 ms
vs live 12.0–12.4 ms (1.31×); RTT ~24 ms; pathology: chains around a
deserialized Exported.call intermittently collapse to ~1 s/link when eager
ops interleave with fed-back outputs (fresh processes chain cleanly).
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from ihpr_tpu.utils.shutdown import install_graceful_shutdown

install_graceful_shutdown()

import numpy as np
import jax
import jax.numpy as jnp

from ihpr_tpu.config import get_config
from ihpr_tpu.data import skeletons
from ihpr_tpu.engine.server import PoseServer
from ihpr_tpu.engine.export import export_server, load_exported
from ihpr_tpu.models.pose_net import build_pose_net, init_pose_net


def main():
    cfg = get_config("h36m3d_r50")
    model = build_pose_net(cfg)
    params, bstats = init_pose_net(
        model, jax.random.key(0), cfg.data.input_shape
    )
    server = PoseServer(cfg, params, bstats, max_batch=32, flip_test=True)
    mb = 32
    patches = (
        np.random.RandomState(0)
        .randint(0, 255, (mb, 256, 256, 3))
        .astype(np.uint8)
    )
    dev_patches = jnp.asarray(patches)
    dev_ones = jnp.ones((mb, 3), np.float32)
    fn = load_exported(export_server(server, batch=mb))
    out = fn(dev_patches, dev_ones)
    _ = np.asarray(out)
    print("exported+compiled", flush=True)

    @jax.jit
    def chained_art(patch_u8, ones, prev):
        eps = jnp.sum(prev[:1, :1, :1]) * 0.0
        return fn(patch_u8, ones + eps)

    _ = np.asarray(chained_art(dev_patches, dev_ones, out))

    for n in (3, 5, 8, 12, 16, 24, 32):
        prev = fn(dev_patches, dev_ones)
        _ = np.asarray(prev)  # settled start
        t0 = time.perf_counter()
        for _ in range(n):
            prev = chained_art(dev_patches, dev_ones, prev)
        _ = float(prev.sum())
        dt = time.perf_counter() - t0
        print(f"artifact chain N={n}: {dt / n * 1e3:.1f} ms/link", flush=True)

    def per_link_pull_ms(f, *fargs, iters=10):
        _ = float(f(*fargs).sum())
        t0 = time.perf_counter()
        for _ in range(iters):
            _ = float(f(*fargs).sum())
        return (time.perf_counter() - t0) / iters * 1e3

    live_jit = jax.jit(server._forward)
    _ = np.asarray(live_jit(params, bstats, dev_patches, dev_ones))
    print(
        f"per-link pull artifact: "
        f"{per_link_pull_ms(fn, dev_patches, dev_ones):.1f} ms/link",
        flush=True,
    )
    print(
        f"per-link pull live:     "
        f"{per_link_pull_ms(live_jit, params, bstats, dev_patches, dev_ones):.1f}"
        " ms/link",
        flush=True,
    )

    @jax.jit
    def chained_live(p, b, patch_u8, ones, prev):
        eps = jnp.sum(prev[:1, :1, :1]) * 0.0
        return server._forward(p, b, patch_u8, ones + eps)

    prev = chained_live(
        params, bstats, dev_patches, dev_ones,
        jnp.zeros_like(out),
    )
    _ = np.asarray(prev)
    n = 32
    t0 = time.perf_counter()
    for _ in range(n):
        prev = chained_live(params, bstats, dev_patches, dev_ones, prev)
    _ = float(prev.sum())
    dt = time.perf_counter() - t0
    print(f"live chained x{n}: {dt / n * 1e3:.1f} ms/link", flush=True)

    def unchained(n):
        t0 = time.perf_counter()
        hs = [fn(dev_patches, dev_ones) for _ in range(n)]
        _ = float(jnp.stack([h.sum() for h in hs]).sum())
        return time.perf_counter() - t0

    unchained(5)  # settle
    for n in (20, 40):
        dt = unchained(n)
        print(
            f"UNCHAINED x{n}: {dt:.2f} s total ({dt / n * 1e3:.1f} ms/"
            f"dispatch) — expect ~constant total (elided), not linear",
            flush=True,
        )


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # clean exit — never seat-lock the chip
        print(f"PROBE FAILED: {type(e).__name__}: {e}", flush=True)
        raise SystemExit(0)
