#!/usr/bin/env python
"""Training CLI.

Reference: ``main/train.py`` (argparse --gpu/--continue; epoch loop).
Flag-compatible spirit: --config names one of the five BASELINE configs,
--continue resumes the latest snapshot.

Examples:
    python train.py --config h36m3d_r50 --data_root /data/Human36M
    python train.py --config h36m3d_r50 --synthetic --steps 20   # smoke run
    python train.py --config h36m3d_r50 --continue
"""

from __future__ import annotations

import argparse


def main():
    from ihpr_tpu.utils.shutdown import install_graceful_shutdown

    install_graceful_shutdown()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default="h36m3d_r50")
    ap.add_argument("--data_root", default=None, help="dataset root directory")
    ap.add_argument(
        "--trainset", default=None,
        help="comma-separated dataset override, e.g. Human36M or Human36M,MPII",
    )
    ap.add_argument("--no_aug", action="store_true", help="disable augmentation")
    ap.add_argument("--synthetic", action="store_true", help="train on synthetic data")
    ap.add_argument("--continue", dest="continue_train", action="store_true")
    ap.add_argument("--end_epoch", type=int, default=None)
    ap.add_argument("--steps", type=int, default=None, help="cap steps/epoch (smoke runs)")
    ap.add_argument("--synthetic_size", type=int, default=512)
    ap.add_argument("--pretrained", default=None, help="converted backbone .msgpack")
    ap.add_argument("--num_workers", type=int, default=8)
    ap.add_argument("--output_dir", default=None)
    ap.add_argument("--profile_dir", default=None, help="capture a jax.profiler trace")
    ap.add_argument(
        "--multihost",
        action="store_true",
        help="call jax.distributed.initialize() for multi-host DCN training",
    )
    ap.add_argument(
        "--spatial", type=int, default=None, metavar="N",
        help="shard each sample's image rows over N chips "
        "(2-axis (data, spatial) mesh; N must divide the per-host device count)",
    )
    ap.add_argument(
        "--shard_opt_state", action="store_true",
        help="ZeRO-1 analog: shard Adam moments over the data axis",
    )
    ap.add_argument(
        "--rss_limit_mb", type=float, default=None,
        help="host-RSS watchdog threshold (default: 80%% of MemTotal, "
        "0 disables). This platform's PJRT client leaks every H2D batch "
        "on the host; past the limit the trainer snapshots and exits "
        "EX_TEMPFAIL(75) for a --continue relaunch "
        "(tools/train_supervised.sh automates the loop)",
    )
    ap.add_argument(
        "--rss_check_steps", type=int, default=100,
        help="run the RSS watchdog vote every N steps (mid-epoch snapshot "
        "+ EX_TEMPFAIL on trip; resume replays the epoch stream and skips "
        "the consumed batches). 0 = epoch boundaries only",
    )
    args = ap.parse_args()

    if args.multihost:
        import jax

        jax.distributed.initialize()

    from ihpr_tpu.config import get_config
    from ihpr_tpu.engine.trainer import Trainer

    cfg = get_config(args.config)
    if args.output_dir:
        cfg = cfg.replace(output_dir=args.output_dir)
    if args.trainset or args.no_aug:
        import dataclasses

        kw = {}
        if args.trainset:
            kw["trainset"] = tuple(args.trainset.split(","))
        if args.no_aug:
            kw["use_aug"] = False
        cfg = cfg.replace(data=dataclasses.replace(cfg.data, **kw))
    if args.spatial or args.shard_opt_state:
        import dataclasses

        kw = {}
        if args.spatial:
            kw["spatial_axis_size"] = args.spatial
        if args.shard_opt_state:
            kw["shard_opt_state"] = True
        cfg = cfg.replace(parallel=dataclasses.replace(cfg.parallel, **kw))
    data_root = "synthetic" if args.synthetic else args.data_root

    trainer = Trainer(
        cfg,
        data_root=data_root,
        continue_train=args.continue_train,
        num_workers=args.num_workers,
        synthetic_size=args.synthetic_size,
        rss_limit_mb=args.rss_limit_mb,
        rss_check_interval_steps=args.rss_check_steps,
    )
    if args.pretrained:
        trainer.load_pretrained_backbone(args.pretrained)
    if args.steps is not None:
        trainer.cap_steps_per_epoch(args.steps)
    trainer.train(args.end_epoch, profile_dir=args.profile_dir)


if __name__ == "__main__":
    main()
