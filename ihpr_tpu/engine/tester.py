"""Tester: eval loop with flip-test + dataset metric dispatch.

Reference: ``common/base.py:Tester`` + ``main/test.py`` (no-grad loop,
flip-test, preds accumulation, ``db.evaluate``) + per-dataset evaluate
(``data/Human36M/Human36M.py:evaluate`` warp-back -> pixel2cam ->
root-align -> per-action MPJPE).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import jax
import numpy as np

from ihpr_tpu.config import Config
from ihpr_tpu.data import geometry, skeletons
from ihpr_tpu.data.datasets import (
    PoseDataset,
    build_dataset,
    evaluate_h36m,
    evaluate_mpii_pckh,
    evaluate_mscoco,
)
from ihpr_tpu.data.pipeline import BatchLoader, prefetch_to_device
from ihpr_tpu.data.warp import gen_trans
from ihpr_tpu.engine.checkpoint import CheckpointManager
from ihpr_tpu.engine.logger import colorlogger
from ihpr_tpu.models.pose_net import build_pose_net
from ihpr_tpu.parallel import batch_sharding, create_train_state, make_eval_step, make_mesh


class Tester:
    def __init__(
        self,
        cfg: Config,
        test_epoch: Optional[int] = None,
        data_root: Optional[str] = None,
        dataset: Optional[PoseDataset] = None,
        state=None,
        num_workers: int = 8,
        synthetic_size: int = 128,
    ):
        self.cfg = cfg
        self.logger = colorlogger(f"{cfg.output_dir}/log", "test_logs.txt")
        if dataset is None:
            dataset = build_dataset(cfg.data.testset, "test", cfg, data_root, synthetic_size)
        self.dataset = dataset
        self.mesh = make_mesh(cfg.parallel.data_axis_size, cfg.parallel.data_axis_name)
        n_dev = self.mesh.devices.size
        self.loader = BatchLoader(
            [dataset],
            cfg,
            cfg.eval.batch_size_per_device * n_dev,
            train=False,
            num_workers=num_workers,
        )
        self.model = build_pose_net(cfg, dataset.joint_num)
        if state is None:
            template, _ = create_train_state(
                self.model, cfg, jax.random.key(0), steps_per_epoch=1
            )
            ckpt = CheckpointManager(cfg.output_dir)
            epoch = test_epoch if test_epoch is not None else ckpt.latest_epoch()
            if epoch is None:
                raise FileNotFoundError(
                    f"no snapshot in {cfg.output_dir}/model_dump; train first"
                )
            state, _, _ = ckpt.load(epoch, template, jax.random.key(0))
            self.logger.info(f"loaded snapshot_{epoch}")
        self.state = state
        self.eval_step = make_eval_step(self.model, cfg, self.mesh)

    def predict_voxels(self) -> np.ndarray:
        """Run the model over the test set -> (N, J, 3) voxel coords in
        dataset order (duplicate padding of the final batch dropped)."""
        n = len(self.loader.index)
        out = np.zeros((n, self.dataset.joint_num, 3), np.float32)
        seen = np.zeros(n, bool)
        sharding = batch_sharding(self.mesh)
        pos = 0
        for batch, sample_idx in prefetch_to_device(self.loader.epoch(), sharding):
            coords, _, _ = self.eval_step(self.state.params, self.state.batch_stats, batch)
            coords = np.asarray(jax.device_get(coords))
            bs = coords.shape[0]
            rows = np.arange(pos, min(pos + bs, n))
            out[rows] = coords[: len(rows)]
            seen[rows] = True
            pos += bs
        assert seen.all()
        return out

    def evaluate(self, vis: bool = False, vis_count: int = 8) -> Dict[str, float]:
        cfg = self.cfg
        preds_voxel = self.predict_voxels()
        name = self.dataset.name
        in_shape, out_shape = cfg.data.input_shape, cfg.data.output_shape
        depth = cfg.data.depth_dim
        bbox3d_z = cfg.data.bbox_3d_shape[0]

        # voxel -> original-image px (+ absolute mm depth) per sample
        preds_img = np.zeros_like(preds_voxel)
        samples = []
        for i, (di, si, bbox) in enumerate(self.loader.index):
            sample = self.dataset.samples[si]
            samples.append(sample)
            c_x, c_y = bbox[0] + bbox[2] / 2, bbox[1] + bbox[3] / 2
            inv = np.asarray(
                gen_trans(c_x, c_y, bbox[2], bbox[3], in_shape[1], in_shape[0], 1.0, 0.0, inv=True)
            )
            preds_img[i] = geometry.warp_coord_to_original(
                preds_voxel[i], inv, out_shape, in_shape, depth, bbox3d_z, sample["root_z"]
            )

        if name == "Human36M":
            preds_cam = np.stack(
                [
                    geometry.pixel2cam(p, s["f"], s["c"])
                    for p, s in zip(preds_img, samples)
                ]
            )
            metrics = evaluate_h36m(preds_cam, samples, cfg.eval.protocol)
        elif name == "MPII":
            metrics = evaluate_mpii_pckh(preds_img, samples)
        elif name == "MSCOCO":
            metrics = evaluate_mscoco(preds_img, samples)
        else:
            raise KeyError(name)

        if vis:  # reference: common/utils/vis.py overlays dumped to output/vis
            from ihpr_tpu.data.datasets import render_synthetic_image
            from ihpr_tpu.utils.vis import vis_keypoints

            vis_dir = f"{cfg.output_dir}/vis"
            os.makedirs(vis_dir, exist_ok=True)
            import cv2

            for i in range(min(vis_count, len(samples))):
                s = samples[i]
                img = (
                    render_synthetic_image(s)
                    if s.get("img_path") is None
                    else cv2.imread(s["img_path"])[:, :, ::-1]
                )
                overlay = vis_keypoints(img, preds_img[i], self.dataset.skeleton)
                cv2.imwrite(f"{vis_dir}/pred_{i}.jpg", overlay[:, :, ::-1])
            self.logger.info(f"wrote {min(vis_count, len(samples))} overlays to {vis_dir}")

        os.makedirs(f"{cfg.output_dir}/result", exist_ok=True)
        for k, v in sorted(metrics.items()):
            self.logger.info(f"{k}: {v:.2f}")
        import json

        with open(f"{cfg.output_dir}/result/metrics_{name}.json", "w") as f:
            json.dump(metrics, f, indent=1)
        np.save(f"{cfg.output_dir}/result/preds_{name}.npy", preds_img)
        return metrics
