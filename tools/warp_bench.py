#!/usr/bin/env python
"""Host input-pipeline microbench: native fused JPEG decode+warp.

Reproduces the PARITY.md "native fused JPEG decode+warp" row with a fixed
methodology so the number can be re-measured at any HEAD:

  - 32 synthetic-renderer frames at 640px, JPEG q90 (realistic entropy;
    random-noise images inflate decode cost ~6x and are NOT what the
    loader sees),
  - production-style augmentation affines (gen_trans_np: person-box crop
    ~400px, scale/rot jitter, every other sample flipped),
  - best-of-5 batches on however many cores this host has (1 in this
    container), plus the decode-then-warp split and the cv2-in-Python
    reference path.

CPU-only: runs with JAX forced to CPU, no TPU required.
"""

from __future__ import annotations

import io
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    from PIL import Image

    from ihpr_tpu.data import native, skeletons
    from ihpr_tpu.data.datasets import make_synthetic, render_synthetic_image
    from ihpr_tpu.data.warp import gen_trans_np

    assert native.available() and native.has_jpeg()
    skel = skeletons.H36M
    samples = make_synthetic(skel, 8, seed=0, img_size=640)
    blobs = []
    for s in samples:
        img = render_synthetic_image(s)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, "JPEG", quality=90)
        blobs.append(buf.getvalue())
    B, OH, OW = 32, 256, 256
    blobs = (blobs * 4)[:B]
    print(
        f"{B} frames @640px, avg {int(np.mean([len(b) for b in blobs]))} B/jpeg, "
        f"{native._load().omp_max_threads()} omp threads"
    )

    rng = np.random.RandomState(1)
    invs = np.stack(
        [
            gen_trans_np(
                320.0 + rng.uniform(-40, 40),
                330.0 + rng.uniform(-40, 40),
                400.0 * rng.uniform(0.9, 1.15),
                400.0 * rng.uniform(0.9, 1.15),
                OW,
                OH,
                1.0,
                rng.uniform(-30, 30),
                inv=True,
            )
            .astype(np.float32)
            .reshape(6)
            for _ in range(B)
        ]
    )
    flips = (np.arange(B) % 2).astype(np.int32)

    def best(fn, n=5):
        t = 1e9
        out = None
        for _ in range(n):
            t0 = time.perf_counter()
            out = fn()
            t = min(t, time.perf_counter() - t0)
        return t, out

    t_fused, (out, ok) = best(
        lambda: native.decode_and_warp_batch(blobs, invs, flips, OH, OW)
    )
    assert ok.all()
    print(
        f"fused decode+warp : {t_fused * 1e3:6.1f} ms/batch = "
        f"{B / t_fused:6.0f} img/s/core"
    )

    arrs = [np.asarray(Image.open(io.BytesIO(b))).copy() for b in blobs]
    t_warp, ref = best(lambda: native.warp_batch(arrs, invs, flips, OH, OW))
    print(
        f"warp only         : {t_warp * 1e3:6.1f} ms/batch "
        f"(decode leg ~{(t_fused - t_warp) * 1e3:.1f} ms)"
    )
    diff = np.abs(out.astype(np.int32) - ref.astype(np.int32))
    print(f"fused vs split    : max {diff.max()}  p99 {np.percentile(diff, 99)}")

    try:
        import cv2

        def _fwd_from_inv(inv):
            m = np.vstack([inv.reshape(2, 3), [0, 0, 1]]).astype(np.float64)
            return np.linalg.inv(m)[:2].astype(np.float32)

        # Speed reference only (the reference's decode+warp worker loop);
        # flip folding is skipped — it does not change the cost shape.
        def cv2_path():
            o = np.empty((B, OH, OW, 3), np.uint8)
            for i, b in enumerate(blobs):
                img = cv2.imdecode(np.frombuffer(b, np.uint8), cv2.IMREAD_COLOR)
                o[i] = cv2.warpAffine(
                    # width-axis mirror (the reference's flip); costed via
                    # .copy() like the reference's contiguous slice
                    img[:, ::-1].copy() if flips[i] else img,
                    _fwd_from_inv(invs[i]),
                    (OW, OH),
                    flags=cv2.INTER_LINEAR,
                )
            return o

        t_cv2, _ = best(cv2_path, n=3)
        print(
            f"cv2-in-Python     : {t_cv2 * 1e3:6.1f} ms/batch = "
            f"{B / t_cv2:6.0f} img/s/core"
        )
    except Exception as e:  # pragma: no cover
        print(f"cv2 path skipped: {e}")


if __name__ == "__main__":
    main()
