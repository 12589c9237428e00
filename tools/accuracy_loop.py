#!/usr/bin/env python
"""End-to-end accuracy evidence: synthetic train -> Tester MPJPE -> torch oracle.

Closes the loop VERDICT r1 asked for: real H36M frames and ImageNet weights
don't exist in this environment, so the strongest available accuracy proxy is

  1. train the network on synthetic-but-learnable data (Gaussian blobs with
     hue-coded joint identity and radius-coded depth,
     datasets.render_synthetic_image) until it beats a stated MPJPE-mm bar
     through the FULL eval stack (Tester -> warp-back -> pixel2cam ->
     root-align -> per-action MPJPE; reference
     data/Human36M/Human36M.py:evaluate), and
  2. push the SAME trained weights through the torch-CPU reference network
     (tools/torch_reference.py, reference main/model.py semantics) on the
     SAME test patches and the SAME metric code path
     (tester.metrics_from_voxel_preds), so the only difference is the
     framework's forward — any MPJPE gap is ours.

Both presets run on the ambient backend (the real TPU here — XLA:CPU conv
training is ~16 s/step at even the tiny shape, so CPU runs are for the
pytest fixtures only); the torch oracle always runs on CPU (oneDNN).

Usage (one command each, ~5 / ~15 min on the chip):

    python tools/accuracy_loop.py --preset tiny
    python tools/accuracy_loop.py --preset flagship

Writes <output_dir>/accuracy_loop.json and prints a markdown table for
PARITY.md.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _torch_oracle_preds(cfg, loader, joint_num, params, batch_stats):
    """Run the exported network through torch_reference on the SAME host
    patches the Tester feeds the TPU path (incl. flip-test averaging),
    returning (N, J, 3) voxel coords in loader.index order."""
    import torch

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import torch_reference as tref
    from convert_torch_ckpt import flax_to_torch_state_dict

    import jax

    params = jax.tree.map(np.asarray, params)
    batch_stats = jax.tree.map(np.asarray, batch_stats)
    sd = flax_to_torch_state_dict(
        params, batch_stats, cfg.model.resnet_type, cfg.model.num_deconv_layers
    )
    tm = tref.PoseNet(cfg.model.resnet_type, joint_num, cfg.data.depth_dim).eval()
    tm.load_state_dict(sd)

    from ihpr_tpu.data import skeletons

    flip_perm = skeletons.get_skeleton(cfg.data.testset).flip_permutation()
    out_w = cfg.data.output_shape[1]
    mean = np.asarray(cfg.data.pixel_mean, np.float32) * 255.0
    std = np.asarray(cfg.data.pixel_std, np.float32) * 255.0

    n = len(loader.index)
    preds = np.zeros((n, joint_num, 3), np.float32)
    seen = np.zeros(n, bool)
    if not loader.host_warp:
        raise SystemExit(
            "torch oracle needs the host-warp loader (HostBatch has no "
            "pre-warped .patch on this host — build native/ first: "
            "./native/build.sh)"
        )
    with torch.no_grad():
        for hb in loader.epoch():
            # numpy twin of augment.finalize_patch (eval: color_scale == 1)
            img = (hb.patch.astype(np.float32) - mean) / std
            x = torch.from_numpy(np.ascontiguousarray(img.transpose(0, 3, 1, 2)))
            hm = tm(x)
            c = tref.soft_argmax_3d(hm, joint_num, cfg.data.depth_dim).numpy()
            if cfg.eval.flip_test:
                hmf = tm(torch.flip(x, dims=(3,)))
                cf = tref.soft_argmax_3d(hmf, joint_num, cfg.data.depth_dim).numpy()
                cf[..., 0] = out_w - 1.0 - cf[..., 0]
                cf = cf[:, flip_perm, :]
                c = (c + cf) * 0.5
            preds[hb.sample_idx] = c
            seen[hb.sample_idx] = True
    assert seen.all()
    return preds


def main():
    from ihpr_tpu.utils.shutdown import install_graceful_shutdown

    install_graceful_shutdown()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--preset", choices=["tiny", "flagship", "r152"], default="tiny"
    )
    ap.add_argument("--train_size", type=int, default=None)
    ap.add_argument("--test_size", type=int, default=None)
    ap.add_argument("--end_epoch", type=int, default=None)
    ap.add_argument("--mpjpe_bar_mm", type=float, default=None)
    ap.add_argument("--oracle_tol_mm", type=float, default=1.0)
    ap.add_argument("--output_dir", default=None)
    ap.add_argument("--skip_oracle", action="store_true")
    ap.add_argument(
        "--hue_mode",
        choices=["index", "semantic"],
        default=None,
        help="synthetic hue coding; 'semantic' renders mirror-consistently "
        "(required for --flip_ab/--use_aug, and forced on by them)",
    )
    ap.add_argument(
        "--flip_ab",
        action="store_true",
        help="after the headline (no-flip) eval, re-evaluate with "
        "flip_test=True and require MPJPE_flip <= MPJPE_noflip + flip_tol "
        "(validates the reference's flip-averaging end-to-end, "
        "main/test.py:~30-70)",
    )
    ap.add_argument("--flip_tol_mm", type=float, default=2.0)
    ap.add_argument(
        "--use_aug",
        action="store_true",
        help="train with the full augmentation pipeline (flip/rot/scale/"
        "color through the native fused decode+warp path); bar is relaxed "
        "by --aug_bar_mult since aug makes the synthetic task harder",
    )
    ap.add_argument("--aug_bar_mult", type=float, default=1.4)
    ap.add_argument(
        "--mixed",
        action="store_true",
        help="mix a synthetic MPII (2D-only) trainset into the H36M one — "
        "the reference's headline recipe (common/base.py multi-dataset "
        "trainset + transform_joint_to_other_db; BASELINE 'mixed H36M+MPII "
        "batches'). MPII rows supervise x,y only (z masked by "
        "joints_have_depth); their frames reuse the H36M hue per joint "
        "name (make_synthetic hue_skeleton) so joint-identity coding is "
        "consistent across the mix, as it is for real photos. The bar is "
        "unchanged: mixed 2D data must not hurt 3D eval",
    )
    ap.add_argument(
        "--mixed_size",
        type=int,
        default=None,
        help="synthetic MPII trainset size (default: same as train_size)",
    )
    ap.add_argument(
        "--platform",
        default=None,
        help="force a jax platform (e.g. 'cpu' for host-side smokes) — "
        "the JAX_PLATFORMS env var is frozen before main() on this host, "
        "so only the in-process config update works (CLAUDE.md gotcha)",
    )
    ap.add_argument(
        "--bn_mode",
        default=None,
        help="override cfg.model.bn_mode (e.g. lean_sg) — used to price "
        "the accuracy cost of a perf-mode candidate before adopting it "
        "in the production configs",
    )
    ap.add_argument(
        "--continue",
        dest="continue_train",
        action="store_true",
        help="resume training from the latest snapshot in --output_dir "
        "(same semantics as train.py --continue; the synthetic datasets "
        "are seed-deterministic and their JPEGs cache on disk, so the "
        "resumed run sees the identical data stream)",
    )
    args = ap.parse_args()

    hue_mode = args.hue_mode or (
        "semantic" if (args.flip_ab or args.use_aug) else "index"
    )
    if (args.flip_ab or args.use_aug) and hue_mode != "semantic":
        raise SystemExit("--flip_ab/--use_aug need --hue_mode semantic")

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    # True fp32 on the MXU: default-precision fp32 convs quantize inputs
    # to bf16 (CLAUDE.md gotcha), which alone shifts coords ~0.25 voxel
    # (~9 mm here) vs the fp32 torch oracle. HIGHEST makes fp32 mean fp32
    # so the oracle gap measures the framework, not MXU rounding.
    jax.config.update("jax_default_matmul_precision", "highest")

    from ihpr_tpu.config import DataConfig, ModelConfig, OptimConfig, get_config
    from ihpr_tpu.data import skeletons
    from ihpr_tpu.data.datasets import PoseDataset, make_synthetic
    from ihpr_tpu.engine.tester import Tester, metrics_from_voxel_preds
    from ihpr_tpu.engine.trainer import Trainer

    if args.preset == "tiny":
        # R18 @ 128^2 input, 32^3 volume — the regime round-1's overfit
        # probes proved learnable (at 64^2 the warped blobs shrink below
        # ~2 px and the depth-coding radius aliases away; nets plateau at
        # the center-guess loss). From-scratch localization needs O(1k)
        # steps, hence 100 epochs x 16 steps.
        cfg = get_config("h36m3d_r50").replace(
            name="accuracy_tiny",
            model=ModelConfig(resnet_type=18),
            data=DataConfig(
                trainset=("Human36M",),
                input_shape=(128, 128),
                output_shape=(32, 32),
                depth_dim=32,
                use_aug=False,  # probe measures the pipeline, not aug robustness
            ),
            optim=OptimConfig(
                batch_size_per_device=32,
                end_epoch=60,
                lr=1e-3,
                lr_dec_epoch=(45, 55),
                # A full snapshot outlasts the 2 s epoch on this 1-core
                # host; thin them so IO doesn't serialize the run.
                snapshot_interval=20,
                snapshot_keep=2,
            ),
        )
        # 4k images: a 512-image set is memorized (42 mm train / 432 mm
        # unseen); generalization to fresh samples needs the larger set.
        # Bar: untrained/center-guess floor on this set measures ~435 mm;
        # 130 mm (~3.3x better) on UNSEEN samples demonstrates real
        # learning within the 32^3 volume's 62.5 mm z-voxel resolution.
        defaults = dict(train_size=4096, test_size=256, end_epoch=60, bar=130.0)
        img_size = 400
    elif args.preset == "r152":
        # BASELINE config #4 verbatim (R152 @ 384x288 input, 96x72x64
        # volume, bf16) trained SHORT: the point is end-to-end accuracy
        # evidence for the non-square 96x72x64 kernel tiling and its torch
        # oracle gap (VERDICT r2 Missing #5), not a low MPJPE — hence the
        # loose bar (chance floor ~435 mm) and the oracle tolerance doing
        # the real work.
        cfg = get_config("h36m3d_r152_384").replace(name="accuracy_r152")
        cfg = cfg.replace(
            data=dataclasses.replace(
                cfg.data, trainset=("Human36M",), use_aug=False
            ),
            optim=dataclasses.replace(
                cfg.optim,
                end_epoch=30,
                lr_dec_epoch=(22, 27),
                snapshot_interval=15,
                snapshot_keep=2,
            ),
        )
        defaults = dict(train_size=2048, test_size=128, end_epoch=30, bar=250.0)
        img_size = 320
    else:
        # The flagship h36m3d_r50 config verbatim (R50 @ 256^2, 64^3 volume,
        # bf16 convs + fp32 integral), trained only long enough to beat the
        # bar on synthetic data.
        cfg = get_config("h36m3d_r50").replace(name="accuracy_flagship")
        cfg = cfg.replace(
            data=dataclasses.replace(
                cfg.data, trainset=("Human36M",), use_aug=False
            ),
            optim=dataclasses.replace(
                cfg.optim,
                end_epoch=60,
                lr_dec_epoch=(45, 55),
                snapshot_interval=20,
                snapshot_keep=2,
            ),
        )
        # Bar: the 64^3 volume halves the z-voxel to 31 mm and R50 has 4x
        # the capacity; 75 mm on unseen samples (~6x better than the
        # ~435 mm chance floor) is the stated target.
        defaults = dict(train_size=8192, test_size=256, end_epoch=60, bar=75.0)
        img_size = 320

    train_size = args.train_size or defaults["train_size"]
    test_size = args.test_size or defaults["test_size"]
    end_epoch = args.end_epoch or defaults["end_epoch"]
    if args.end_epoch and args.end_epoch != defaults["end_epoch"]:
        # Scale the step-decay epochs with the overridden horizon —
        # otherwise e.g. `--preset r152 --end_epoch 100` would decay lr
        # at the preset's epoch 22 and freeze the from-scratch plateau
        # in place for the remaining 78 epochs.
        scale = args.end_epoch / defaults["end_epoch"]
        cfg = cfg.replace(
            optim=dataclasses.replace(
                cfg.optim,
                end_epoch=args.end_epoch,
                lr_dec_epoch=tuple(
                    max(1, round(e * scale)) for e in cfg.optim.lr_dec_epoch
                ),
            )
        )
    bar = args.mpjpe_bar_mm or defaults["bar"]
    out_dir = args.output_dir or f"/tmp/accuracy_{args.preset}"
    cfg = cfg.replace(output_dir=out_dir)
    if args.bn_mode:
        cfg = cfg.replace(
            model=dataclasses.replace(cfg.model, bn_mode=args.bn_mode)
        )

    if args.use_aug:
        cfg = cfg.replace(data=dataclasses.replace(cfg.data, use_aug=True))
        bar *= args.aug_bar_mult

    # The headline eval runs flip_test=False in every mode so numbers stay
    # comparable across rounds. Default 'index' hues are NOT mirror-
    # consistent (one hue per joint index: the flip branch's L/R remap
    # would mislabel paired blobs); 'semantic' hues ARE, and --flip_ab adds
    # a second flip_test=True eval to prove the averaging helps/is neutral.
    cfg = cfg.replace(eval=dataclasses.replace(cfg.eval, flip_test=False))

    skel = skeletons.H36M
    train_samples = make_synthetic(
        skel, train_size, seed=11, img_size=img_size, easy_depth=True,
        hue_mode=hue_mode,
    )
    test_samples = make_synthetic(
        skel, test_size, seed=22, img_size=img_size, easy_depth=True,
        hue_mode=hue_mode,
    )
    # Train from real JPEG files through the production input path (fused
    # decode + C++ warp); rendering once also keeps per-epoch host cost flat.
    from ihpr_tpu.data.datasets import materialize_synthetic

    train_samples = materialize_synthetic(train_samples, f"{out_dir}/imgs")
    test_samples = materialize_synthetic(test_samples, f"{out_dir}/imgs")
    train_ds = PoseDataset("Human36M", skel, train_samples, True)
    test_ds = PoseDataset("Human36M", skel, test_samples, False)

    train_datasets = [train_ds]
    mixed_size = 0
    if args.mixed:
        mixed_size = train_size if args.mixed_size is None else args.mixed_size
        cfg = cfg.replace(
            data=dataclasses.replace(cfg.data, trainset=("Human36M", "MPII"))
        )
        mpii_samples = make_synthetic(
            skeletons.MPII,
            mixed_size,
            seed=33,
            img_size=img_size,
            hue_mode=hue_mode,
            hue_skeleton=skel,
        )
        mpii_samples = materialize_synthetic(mpii_samples, f"{out_dir}/imgs")
        if mpii_samples:  # --mixed_size 0 = config-only control run
            train_datasets.append(
                PoseDataset("MPII", skeletons.MPII, mpii_samples, True)
            )

    t0 = time.perf_counter()
    trainer = Trainer(
        cfg,
        datasets=train_datasets,
        num_workers=8,
        continue_train=args.continue_train,
    )
    state = trainer.train(end_epoch=end_epoch)
    train_s = time.perf_counter() - t0

    tester = Tester(cfg, dataset=test_ds, state=state, num_workers=4)
    t0 = time.perf_counter()
    metrics = tester.evaluate()
    eval_s = time.perf_counter() - t0
    ours = metrics["MPJPE total"]
    print(f"\nours (TPU-path) MPJPE total: {ours:.2f} mm (bar {bar:.0f} mm)")

    # Memorization-vs-generalization signal: the same eval on a train
    # subset. A large train/test gap means the model memorized (more data
    # needed); a small one with high absolute MPJPE means undertraining.
    # Secondary evals get their own output_dir and no upstream artifact
    # dumps so the headline test-set result/ files are not clobbered.
    aux_cfg = cfg.replace(
        eval=dataclasses.replace(cfg.eval, dump_artifacts=False),
        output_dir=f"{out_dir}/train_subset",
    )
    train_sub = PoseDataset("Human36M", skel, train_samples[:test_size], False)
    train_mpjpe = Tester(
        aux_cfg, dataset=train_sub, state=state, num_workers=4
    ).evaluate()["MPJPE total"]
    print(f"train-subset MPJPE total: {train_mpjpe:.2f} mm")

    flip_mpjpe = None
    if args.flip_ab:
        flip_cfg = cfg.replace(
            eval=dataclasses.replace(
                cfg.eval, flip_test=True, dump_artifacts=False
            ),
            output_dir=f"{out_dir}/flip_eval",
        )
        flip_mpjpe = Tester(
            flip_cfg, dataset=test_ds, state=state, num_workers=4
        ).evaluate()["MPJPE total"]
        print(
            f"flip-test MPJPE total: {flip_mpjpe:.2f} mm "
            f"(no-flip {ours:.2f}, tol +{args.flip_tol_mm} mm)"
        )

    result = {
        "preset": args.preset,
        "hue_mode": hue_mode,
        "use_aug": bool(args.use_aug),
        "mixed_mpii_size": mixed_size,
        "config": cfg.name,
        "resnet": cfg.model.resnet_type,
        "input_shape": list(cfg.data.input_shape),
        "depth_dim": cfg.data.depth_dim,
        "train_size": train_size,
        "test_size": test_size,
        "end_epoch": end_epoch,
        "train_seconds": round(train_s, 1),
        "eval_seconds": round(eval_s, 1),
        "mpjpe_bar_mm": bar,
        "mpjpe_ours_mm": round(ours, 2),
        "mpjpe_flip_mm": None if flip_mpjpe is None else round(flip_mpjpe, 2),
        "mpjpe_train_subset_mm": round(train_mpjpe, 2),
        "metrics_ours": {k: round(v, 2) for k, v in metrics.items()},
    }

    if not args.skip_oracle:
        if cfg.model.s2d_stem:
            raise SystemExit("oracle comparison needs s2d_stem=False")
        # The oracle is fp32; compare it against an fp32 eval of the SAME
        # trained weights (for bf16 configs this is a second eval pass —
        # the headline MPJPE above stays the production dtype). With
        # matmul precision HIGHEST both sides are true fp32 and any gap
        # is the framework's.
        if cfg.model.compute_dtype == "float32":
            ours_fp32 = ours
        else:
            cfg_fp32 = cfg.replace(
                model=dataclasses.replace(
                    cfg.model, compute_dtype="float32", fp32_logits=True
                ),
                eval=dataclasses.replace(cfg.eval, dump_artifacts=False),
                output_dir=f"{out_dir}/fp32_eval",
            )
            ours_fp32 = Tester(
                cfg_fp32, dataset=test_ds, state=state, num_workers=4
            ).evaluate()["MPJPE total"]
            print(f"ours (fp32 eval, same weights) MPJPE total: {ours_fp32:.2f} mm")
            result["mpjpe_ours_fp32_mm"] = round(ours_fp32, 2)
        t0 = time.perf_counter()
        preds_torch = _torch_oracle_preds(
            cfg, tester.loader, test_ds.joint_num, state.params, state.batch_stats
        )
        oracle_s = time.perf_counter() - t0
        tm_metrics, _, _, _ = metrics_from_voxel_preds(
            cfg, tester.loader, test_ds, preds_torch
        )
        torch_mpjpe = tm_metrics["MPJPE total"]
        gap = abs(ours_fp32 - torch_mpjpe)
        print(
            f"torch-CPU oracle MPJPE total: {torch_mpjpe:.2f} mm "
            f"(|gap| {gap:.3f} mm vs fp32 eval, tol {args.oracle_tol_mm} mm, "
            f"{oracle_s:.0f}s)"
        )
        result.update(
            mpjpe_torch_mm=round(torch_mpjpe, 2),
            mpjpe_gap_mm=round(gap, 3),
            oracle_tol_mm=args.oracle_tol_mm,
            oracle_seconds=round(oracle_s, 1),
            metrics_torch={k: round(v, 2) for k, v in tm_metrics.items()},
        )

    os.makedirs(out_dir, exist_ok=True)
    with open(f"{out_dir}/accuracy_loop.json", "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {out_dir}/accuracy_loop.json")

    # PARITY.md-ready row
    tm = result.get("mpjpe_torch_mm", float("nan"))
    label = args.preset + ("+mpii" if args.mixed else "")
    print(
        f"| {label} | r{cfg.model.resnet_type} @ "
        f"{cfg.data.input_shape[0]}^2, {cfg.data.depth_dim}^3 vol | "
        f"{train_size} imgs x {end_epoch} ep | {ours:.1f} | {tm:.1f} | "
        f"{result.get('mpjpe_gap_mm', float('nan')):.3f} |"
    )

    ok = ours <= bar
    if not args.skip_oracle:
        ok = ok and result["mpjpe_gap_mm"] <= args.oracle_tol_mm
    if args.flip_ab:
        ok = ok and flip_mpjpe <= ours + args.flip_tol_mm
    print("accuracy_loop:", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
