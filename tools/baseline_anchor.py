#!/usr/bin/env python
"""Measure the torch-CPU training-step cost of the reference architecture,
to anchor the H100 baseline estimate in BASELINE.md / bench.py.

The reference (PyTorch ``main/train.py``) publishes no throughput, the
mount is empty, and no H100 exists in this environment — so the 1300
img/s "1x H100" anchor used by bench.py is a DERIVED number. This tool
contributes the locally-measurable leg of that derivation:

  1. per-image fwd+bwd+Adam wall time of the exact reference model
     (R50 @ 256x256 -> 3-deconv head -> 64^3 soft-argmax -> L1) under
     torch-CPU on this host;
  2. the achieved FLOP/s that implies, against the XLA-cost-analysis FLOP
     count of the same architecture (52.2 GFLOP/img fwd+bwd, PARITY.md).

The cross-scaling to H100 (peak-FLOPs ratios, MLPerf-class conv MFU
bands) lives in BASELINE.md's "Anchor derivation" section; this tool
re-generates the measured row. Run: python tools/baseline_anchor.py
"""

from __future__ import annotations

import json
import time

FWD_BWD_GFLOP_PER_IMG = 52.2  # XLA cost analysis, flagship model @256^2 (PARITY.md)


def main():
    import torch

    from tools.torch_reference import PoseNet, soft_argmax_3d

    torch.manual_seed(0)
    model = PoseNet(resnet_type=50, joint_num=18, depth_dim=64)
    model.train()
    opt = torch.optim.Adam(model.parameters(), lr=1e-3)

    B = 2
    img = torch.randn(B, 3, 256, 256)
    gt = torch.rand(B, 18, 3) * 64

    def step():
        opt.zero_grad(set_to_none=True)
        hm = model(img)
        coords = soft_argmax_3d(hm, 18, 64)
        loss = (coords - gt).abs().mean()
        loss.backward()
        opt.step()
        return float(loss.detach())

    step()  # warmup (allocator, oneDNN primitive caches)
    n = 3
    t0 = time.perf_counter()
    for _ in range(n):
        step()
    dt = (time.perf_counter() - t0) / n

    per_img_s = dt / B
    nthreads = torch.get_num_threads()
    achieved_gflops = FWD_BWD_GFLOP_PER_IMG / per_img_s
    out = {
        "torch_cpu_step_s": round(dt, 3),
        "batch": B,
        "torch_threads": nthreads,
        "per_image_s": round(per_img_s, 3),
        "achieved_gflop_per_s": round(achieved_gflops, 2),
        "assumed_gflop_per_img": FWD_BWD_GFLOP_PER_IMG,
        "img_per_s_cpu": round(1.0 / per_img_s, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    main()
