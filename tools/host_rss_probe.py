"""Host-RSS probe: localize the per-step host memory growth that
OOM-killed the 100-epoch r152 accuracy run (130 GB anon RSS after ~12k
steps ~= one uint8 batch per step, suggesting the H2D staging path
retains host buffers).

Phases (each reports delta-RSS per iteration):
  1. device_put of a FRESH numpy array each iter, result dropped.
  2. same, but the result is block_until_ready'd and a scalar is pulled
     (does completion release the staging buffer?).
  3. same as 1 with gc.collect() every 16 iters (is it collectable?).
  4. device_put of the SAME numpy array each iter (is retention keyed on
     the source buffer or per-transfer?).
  5. control: numpy-only churn (allocator noise floor).

Run on the real TPU (the suspected leak is in the tunnel PJRT client's
transfer path; the CPU backend shares none of it):
    python tools/host_rss_probe.py --iters 64 --mb 10
"""

from __future__ import annotations

import argparse
import gc
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return -1.0


def report(name: str, before: float, after: float, iters: int):
    print(
        f"[{name}] RSS {before:.0f} -> {after:.0f} MB "
        f"(+{after - before:.0f} MB, {(after - before) / iters:.2f} MB/iter)",
        flush=True,
    )


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--mb", type=float, default=10.0)
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    from ihpr_tpu.utils.shutdown import install_graceful_shutdown

    install_graceful_shutdown()

    import jax
    import jax.numpy as jnp

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    dev = jax.devices()[0]
    print("platform:", dev.platform, dev, flush=True)

    n = int(args.mb * 1e6)
    iters = args.iters

    # Warm the allocator + tunnel once so one-time costs don't pollute
    # phase 1 (also proves the seat is live before the long loops).
    x = jax.device_put(np.zeros(n, np.uint8))
    _ = float(jnp.sum(x.astype(jnp.float32))[...])
    del x

    # 1. fresh source buffer per iter, result dropped (the trainer's
    # pattern: prefetch_to_device makes a new HostBatch every step).
    gc.collect()
    b = rss_mb()
    for i in range(iters):
        src = np.full(n, i % 251, np.uint8)
        y = jax.device_put(src)
        del src, y
    report("1 fresh src, drop", b, rss_mb(), iters)

    # 2. fresh source, transfer FORCED complete before drop.
    gc.collect()
    b = rss_mb()
    for i in range(iters):
        src = np.full(n, i % 251, np.uint8)
        y = jax.device_put(src)
        _ = float(jnp.sum(y[:8].astype(jnp.float32))[...])
        del src, y
    report("2 fresh src, forced", b, rss_mb(), iters)

    # 3. fresh source + periodic gc.
    b = rss_mb()
    for i in range(iters):
        src = np.full(n, i % 251, np.uint8)
        y = jax.device_put(src)
        del src, y
        if i % 16 == 15:
            gc.collect()
    gc.collect()
    report("3 fresh src, gc", b, rss_mb(), iters)

    # 4. SAME source buffer each iter.
    gc.collect()
    src = np.full(n, 7, np.uint8)
    b = rss_mb()
    for _ in range(iters):
        y = jax.device_put(src)
        del y
    report("4 same src, drop", b, rss_mb(), iters)
    del src

    # 5. control: pure numpy churn.
    gc.collect()
    b = rss_mb()
    for i in range(iters):
        src = np.full(n, i % 251, np.uint8)
        del src
    report("5 numpy only", b, rss_mb(), iters)

    # Final forced sync so the process exits with a drained tunnel.
    z = jax.device_put(np.ones((128, 128), np.float32))
    _ = float(jnp.sum(z @ z)[...])
    print("done", time.strftime("%H:%M:%S"), flush=True)


if __name__ == "__main__":
    main()
