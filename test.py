#!/usr/bin/env python
"""Evaluation CLI.

Reference: ``main/test.py`` (argparse --gpu/--test_epoch; no-grad loop with
flip-test; db.evaluate -> per-action MPJPE table).

Examples:
    python test.py --config h36m3d_r50 --test_epoch 24 --data_root /data/Human36M
    python test.py --config h36m3d_r50 --synthetic
"""

from __future__ import annotations

import argparse


def main():
    from ihpr_tpu.utils.shutdown import install_graceful_shutdown

    install_graceful_shutdown()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="h36m3d_r50")
    ap.add_argument("--data_root", default=None)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--test_epoch", type=int, default=None, help="snapshot epoch (default: latest)")
    ap.add_argument("--synthetic_size", type=int, default=128)
    ap.add_argument("--num_workers", type=int, default=8)
    ap.add_argument("--output_dir", default=None)
    ap.add_argument("--vis", action="store_true", help="dump keypoint overlays to output/vis")
    ap.add_argument(
        "--multihost",
        action="store_true",
        help="call jax.distributed.initialize() for multi-host DCN eval "
        "(each process evaluates its row block; predictions are "
        "process_allgathered before the metric — engine/tester.py)",
    )
    ap.add_argument(
        "--spatial", type=int, default=None, metavar="N",
        help="shard each sample's image rows over N chips "
        "(2-axis (data, spatial) mesh; N must divide the per-host device count)",
    )
    args = ap.parse_args()

    if args.multihost:
        import jax

        jax.distributed.initialize()

    from ihpr_tpu.config import get_config
    from ihpr_tpu.engine.tester import Tester

    cfg = get_config(args.config)
    if args.output_dir:
        cfg = cfg.replace(output_dir=args.output_dir)
    if args.spatial:
        import dataclasses

        cfg = cfg.replace(
            parallel=dataclasses.replace(cfg.parallel, spatial_axis_size=args.spatial)
        )
    data_root = "synthetic" if args.synthetic else args.data_root

    tester = Tester(
        cfg,
        test_epoch=args.test_epoch,
        data_root=data_root,
        num_workers=args.num_workers,
        synthetic_size=args.synthetic_size,
    )
    metrics = tester.evaluate(vis=args.vis)
    print(metrics)


if __name__ == "__main__":
    main()
