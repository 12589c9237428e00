#!/usr/bin/env python
"""Export a trained snapshot as a self-contained StableHLO serving
artifact (ihpr_tpu/engine/export.py).

    python tools/export_artifact.py --config h36m3d_r50 \
        --snapshot_dir /path/to/run [--epoch N] [--batch 16] \
        [--platforms tpu,cpu] [--flip_test] --out pose_r50.stablehlo

The artifact bakes the weights in; a serving process loads it with only
jax installed:

    from ihpr_tpu.engine.export import load_exported
    fn = load_exported(open("pose_r50.stablehlo", "rb").read())
    coords = fn(patches_u8, np.ones((B, 3), np.float32))

Use --platform cpu to force the local leg onto CPU (e.g. exporting on a
host whose TPU tunnel is down — lowering needs no device execution).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--snapshot_dir", required=True)
    ap.add_argument("--epoch", type=int, default=None)
    ap.add_argument(
        "--batch",
        default="16",
        help="fixed batch size, or 'poly' for a batch-polymorphic artifact",
    )
    ap.add_argument("--platforms", default="tpu,cpu")
    ap.add_argument("--flip_test", action="store_true")
    ap.add_argument("--out", required=True)
    ap.add_argument("--platform", default=None, help="force local jax platform")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from ihpr_tpu.config import get_config
    from ihpr_tpu.engine.export import export_server
    from ihpr_tpu.engine.server import load_server

    batch = args.batch if args.batch == "poly" else int(args.batch)
    cfg = get_config(args.config)
    srv = load_server(
        cfg,
        snapshot_dir=args.snapshot_dir,
        epoch=args.epoch,
        max_batch=16 if batch == "poly" else batch,
        flip_test=args.flip_test,
    )
    blob = export_server(
        srv, batch=batch, platforms=tuple(args.platforms.split(","))
    )
    with open(args.out, "wb") as f:
        f.write(blob)

    # Metadata sidecar: everything a consumer needs to interpret the
    # (B, J, 3) voxel coords without importing ihpr_tpu — joint identity
    # and the volume->pixel/mm conversion constants (the math itself is
    # geometry.warp_coord_to_original; formula restated here).
    import json

    skel = srv.skeleton
    meta = {
        "config": cfg.name,
        "inputs": [
            f"uint8 patches ({args.batch}, {cfg.data.input_shape[0]}, "
            f"{cfg.data.input_shape[1]}, 3), RGB",
            f"float32 color_scale ({args.batch}, 3) — ones for eval",
        ],
        "output": "float32 voxel coords (batch, joint_num, 3) as (x, y, z)",
        "joint_names": list(skel.joints_name),
        "flip_pairs": [list(p) for p in skel.flip_pairs],
        "input_shape": list(cfg.data.input_shape),
        "output_shape": list(cfg.data.output_shape),
        "depth_dim": cfg.data.depth_dim,
        "bbox_3d_shape_mm": list(cfg.data.bbox_3d_shape),
        "flip_test_fused": bool(srv.flip_test),
        "platforms": args.platforms.split(","),
        "to_pixels": "px = voxel_xy * input_shape/output_shape, then apply "
        "the inverse bbox affine; mm_z = (voxel_z/depth_dim - 0.5) * "
        "bbox_3d_shape_mm[0] + root_z",
    }
    with open(args.out + ".json", "w") as f:
        json.dump(meta, f, indent=1)
    print(
        f"wrote {args.out}: {len(blob) / 1e6:.1f} MB, batch {args.batch}, "
        f"platforms {args.platforms}, flip_test {srv.flip_test} "
        f"(+ {args.out}.json metadata)"
    )


if __name__ == "__main__":
    main()
