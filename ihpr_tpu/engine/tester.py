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
from ihpr_tpu.data.warp import gen_trans_np
from ihpr_tpu.engine.checkpoint import CheckpointManager
from ihpr_tpu.engine.logger import colorlogger
from ihpr_tpu.models.pose_net import build_pose_net
from ihpr_tpu.parallel import batch_sharding, create_train_state, make_eval_step, make_mesh


def metrics_from_voxel_preds(
    cfg: Config, loader: BatchLoader, dataset: PoseDataset, preds_voxel: np.ndarray
):
    """(N, J, 3) voxel predictions in loader.index order -> (metrics,
    preds_img, samples, preds_cam). The SINGLE evaluation code path (warp-back ->
    pixel2cam -> dataset metric) shared by the Tester and the torch-CPU
    oracle in tools/accuracy_loop.py, so MPJPE comparisons differ only in
    the network forward. Reference: Human36M.evaluate / MPII.evaluate.
    """
    name = dataset.name
    in_shape, out_shape = cfg.data.input_shape, cfg.data.output_shape
    depth = cfg.data.depth_dim
    bbox3d_z = cfg.data.bbox_3d_shape[0]

    # voxel -> original-image px (+ absolute mm depth): one vectorized
    # numpy pass (a per-sample jnp gen_trans would dispatch thousands of
    # tiny accelerator programs over the axon tunnel).
    samples = [dataset.samples[si] for _, si, _ in loader.index]
    bboxes = np.stack([b for _, _, b in loader.index]).astype(np.float32)
    invs = gen_trans_np(
        bboxes[:, 0] + bboxes[:, 2] / 2,
        bboxes[:, 1] + bboxes[:, 3] / 2,
        bboxes[:, 2],
        bboxes[:, 3],
        in_shape[1],
        in_shape[0],
        1.0,
        0.0,
        inv=True,
    )
    preds_img = np.zeros_like(preds_voxel)
    for i, (sample, inv) in enumerate(zip(samples, invs)):
        preds_img[i] = geometry.warp_coord_to_original(
            preds_voxel[i], inv, out_shape, in_shape, depth, bbox3d_z, sample["root_z"]
        )

    preds_cam = None
    if name == "Human36M":
        preds_cam = np.stack(
            [geometry.pixel2cam(p, s["f"], s["c"]) for p, s in zip(preds_img, samples)]
        )
        metrics = evaluate_h36m(preds_cam, samples, cfg.eval.protocol)
    elif name == "MPII":
        metrics = evaluate_mpii_pckh(preds_img, samples)
    elif name == "MSCOCO":
        metrics = evaluate_mscoco(preds_img, samples)
    else:
        raise KeyError(name)
    return metrics, preds_img, samples, preds_cam


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
        # cfg.model.matmul_precision is threaded per-call through the
        # model (build_pose_net) — no process-global precision mutation.
        self.logger = colorlogger(f"{cfg.output_dir}/log", "test_logs.txt")
        if dataset is None:
            dataset = build_dataset(cfg.data.testset, "test", cfg, data_root, synthetic_size)
        self.dataset = dataset
        self.mesh = make_mesh(
            cfg.parallel.data_axis_size,
            cfg.parallel.data_axis_name,
            cfg.parallel.spatial_axis_size,
            cfg.parallel.spatial_axis_name,
        )
        if cfg.parallel.spatial_axis_size > 1:
            # Same invariant as the Trainer: whole data rows per host (the
            # eval allgather additionally relies on process-contiguous
            # row blocks — pinned by tools/multiprocess_dp.py).
            assert jax.local_device_count() % cfg.parallel.spatial_axis_size == 0, (
                "spatial_axis_size must divide the per-host device count",
                cfg.parallel.spatial_axis_size,
            )
            assert cfg.data.input_shape[0] % cfg.parallel.spatial_axis_size == 0, (
                cfg.data.input_shape, cfg.parallel.spatial_axis_size
            )
        n_dev = self.mesh.shape[cfg.parallel.data_axis_name]
        self.loader = BatchLoader(
            [dataset],
            cfg,
            cfg.eval.batch_size_per_device * n_dev,
            train=False,
            num_workers=num_workers,
        )
        self.model = build_pose_net(cfg, dataset.joint_num, mesh=self.mesh)
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
            state, _, _, _ = ckpt.load(epoch, template, jax.random.key(0))
            self.logger.info(f"loaded snapshot_{epoch}")
        self.state = state
        self.eval_step = make_eval_step(self.model, cfg, self.mesh)

    def predict_voxels(self) -> np.ndarray:
        """Run the model over the test set -> (N, J, 3) voxel coords in
        loader.index order.

        Rows are scattered by the loader's explicit ``sample_idx`` (never by
        assumed sequential position), so final-batch duplicate padding and
        multi-process row interleaving are both handled. Under multi-host
        the batch-sharded coords are not fully addressable — every host
        allgathers the global coords plus every host's index block before
        scattering."""
        n = len(self.loader.index)
        out = np.zeros((n, self.dataset.joint_num, 3), np.float32)
        seen = np.zeros(n, bool)
        sharding = batch_sharding(self.mesh)
        multi = jax.process_count() > 1
        for batch, sample_idx in prefetch_to_device(self.loader.epoch(), sharding):
            coords, _, _ = self.eval_step(self.state.params, self.state.batch_stats, batch)
            if multi:
                from jax.experimental import multihost_utils

                # Global coords in global-batch order; per-process index
                # blocks concatenated in process order. _batch_selection
                # hands process p rows [p*local, (p+1)*local) of the global
                # batch and the default mesh orders devices by process, so
                # the two concatenations line up row-for-row.
                coords = np.asarray(multihost_utils.process_allgather(coords, tiled=True))
                sample_idx = np.asarray(
                    multihost_utils.process_allgather(np.asarray(sample_idx), tiled=True)
                )
            else:
                coords = np.asarray(jax.device_get(coords))
            out[sample_idx] = coords
            seen[sample_idx] = True
        assert seen.all()
        return out

    def evaluate(self, vis: bool = False, vis_count: int = 8) -> Dict[str, float]:
        cfg = self.cfg
        preds_voxel = self.predict_voxels()
        name = self.dataset.name
        metrics, preds_img, samples, preds_cam = metrics_from_voxel_preds(
            cfg, self.loader, self.dataset, preds_voxel
        )

        # Every process computes (and returns) the metrics — predictions
        # are identical after the allgather — but only process 0 writes
        # files: concurrent same-path writers on a shared filesystem can
        # interleave/truncate each other (same rule as checkpoint.save).
        import jax

        if jax.process_index() != 0:
            return metrics

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
        if cfg.eval.dump_artifacts:
            self._write_upstream_artifacts(name, preds_img, samples, preds_cam)
        return metrics

    def _write_upstream_artifacts(self, name, preds_img, samples, preds_cam=None):
        """Result dumps in the reference's layouts (SURVEY.md §3.2), next to
        our metrics json, so the official toolkits can consume them:
        - MPII: ``pred.mat`` with key 'preds' (N, 16, 2), MATLAB 1-based px
          (reference data/MPII/MPII.py:evaluate -> savemat).
        - Human36M: ``bbox_root_pose_h36m_output.json`` — list of per-sample
          dicts with image-space and camera-space joints (reference
          Human36M.evaluate result dump).
        - MSCOCO: official detections json consumable by COCOeval
          (``person_keypoints_result.json``).
        """
        result_dir = f"{self.cfg.output_dir}/result"
        if name == "MPII":
            from scipy.io import savemat

            savemat(
                f"{result_dir}/pred.mat",
                {"preds": preds_img[:, :, :2].astype(np.float64) + 1.0},
            )
            self.logger.info(f"wrote {result_dir}/pred.mat (official MPII layout)")
        elif name == "Human36M":
            import json

            if preds_cam is None:  # not computed by the metric path
                preds_cam = np.stack(
                    [
                        geometry.pixel2cam(p, s["f"], s["c"])
                        for p, s in zip(preds_img, samples)
                    ]
                )
            out = []
            for pred, cam, s in zip(preds_img, preds_cam, samples):
                out.append(
                    dict(
                        image_path=s.get("img_path"),
                        action=s.get("action", ""),
                        joint_img=pred.tolist(),
                        joint_cam=cam.tolist(),
                    )
                )
            with open(f"{result_dir}/bbox_root_pose_h36m_output.json", "w") as f:
                json.dump(out, f)
            self.logger.info(
                f"wrote {result_dir}/bbox_root_pose_h36m_output.json "
                "(upstream H36M result layout)"
            )
        elif name == "MSCOCO":
            import json

            out = []
            for i, (pred, s) in enumerate(zip(preds_img, samples)):
                kpts = np.concatenate(
                    [pred[:, :2], np.ones((pred.shape[0], 1), np.float32)], 1
                )
                out.append(
                    dict(
                        image_id=int(s.get("image_id", i)),
                        category_id=1,
                        keypoints=[round(float(v), 2) for v in kpts.reshape(-1)],
                        score=1.0,
                    )
                )
            with open(f"{result_dir}/person_keypoints_result.json", "w") as f:
                json.dump(out, f)
            self.logger.info(
                f"wrote {result_dir}/person_keypoints_result.json (COCOeval layout)"
            )
