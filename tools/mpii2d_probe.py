#!/usr/bin/env python
"""End-to-end evidence for the 2D config family (BASELINE config #2).

Trains ``mpii2d_r50`` — ResNet-50 + 64x64 2D integral (depth_dim=1) — on
synthetic MPII-skeleton data and evaluates PCKh@0.5 on an UNSEEN split
through the full stack (Tester -> warp-back to original pixels ->
Head-Neck-normalized PCKh; reference data/MPII/MPII.py:evaluate). The 3D
MPJPE probes (tools/accuracy_loop.py) already pin framework parity vs
torch to ~0 mm; this probe demonstrates the depth_dim=1 path end to end.

Chance level on this task is PCKh ~= 0.05; the stated bar is 0.85.

    PYTHONUNBUFFERED=1 python tools/mpii2d_probe.py > /tmp/mpii2d.log 2>&1 &
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from ihpr_tpu.utils.shutdown import install_graceful_shutdown

    install_graceful_shutdown()
    import numpy as np

    from ihpr_tpu.config import get_config
    from ihpr_tpu.data import skeletons
    from ihpr_tpu.data.datasets import (
        PoseDataset,
        make_synthetic,
        materialize_synthetic,
    )
    from ihpr_tpu.engine.tester import Tester
    from ihpr_tpu.engine.trainer import Trainer

    out_dir = "/tmp/mpii2d_probe"
    bar = 0.85
    cfg = get_config("mpii2d_r50").replace(
        name="mpii2d_probe",
        output_dir=out_dir,
        data=dataclasses.replace(
            get_config("mpii2d_r50").data, use_aug=False
        ),
        optim=dataclasses.replace(
            get_config("mpii2d_r50").optim,
            end_epoch=40,
            lr_dec_epoch=(30, 36),
            snapshot_interval=20,
            snapshot_keep=2,
        ),
    )
    # flip-test off: hue-coded blobs are not mirror-symmetric (see
    # tools/accuracy_loop.py).
    cfg = cfg.replace(eval=dataclasses.replace(cfg.eval, flip_test=False))

    skel = skeletons.MPII
    train = materialize_synthetic(
        make_synthetic(skel, 4096, seed=31, img_size=320), f"{out_dir}/imgs"
    )
    test = materialize_synthetic(
        make_synthetic(skel, 256, seed=32, img_size=320), f"{out_dir}/imgs"
    )
    t0 = time.perf_counter()
    trainer = Trainer(
        cfg, datasets=[PoseDataset("MPII", skel, train, True)], num_workers=8
    )
    state = trainer.train()
    train_s = time.perf_counter() - t0

    tester = Tester(
        cfg, dataset=PoseDataset("MPII", skel, test, False), state=state, num_workers=8
    )
    metrics = tester.evaluate()
    pckh = metrics["PCKh@0.5"]
    print(f"\nPCKh@0.5 on 256 unseen synthetic MPII frames: {pckh:.4f} (bar {bar})")
    result = dict(
        config=cfg.name,
        pckh_at_05=round(pckh, 4),
        bar=bar,
        train_size=4096,
        test_size=256,
        end_epoch=cfg.optim.end_epoch,
        train_seconds=round(train_s, 1),
        metrics={k: round(v, 4) for k, v in metrics.items()},
    )
    with open(f"{out_dir}/mpii2d_probe.json", "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {out_dir}/mpii2d_probe.json")
    print("mpii2d_probe:", "PASS" if pckh >= bar else "FAIL")
    sys.exit(0 if pckh >= bar else 1)


if __name__ == "__main__":
    main()
