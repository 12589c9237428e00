"""Batched inference server path (BASELINE config #5).

The reference has no serving story (``main/test.py`` is batch eval only);
this module provides the production-inference building block: a
``PoseServer`` that accepts single crops or (image, bbox) pairs, batches
them to a fixed shape (one compiled program — no shape churn), runs the
jitted forward + fused integral on the accelerator, optionally flip-test
averaged, and maps coordinates back to original-image pixels + millimeter
depth on the host.

Latency model: requests are padded to ``max_batch``; a compiled step is
reused for every call. For sustained throughput pair this with the native
host-warp preprocessor (ihpr_tpu/data/native.py) exactly as the trainer
does.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ihpr_tpu.config import Config
from ihpr_tpu.data import geometry, native, skeletons
from ihpr_tpu.data.augment import finalize_patch
from ihpr_tpu.data.warp import gen_trans_np
from ihpr_tpu.models.pose_net import PoseNet, build_pose_net
from ihpr_tpu.ops.integral_pallas import soft_argmax_from_heatmap


@dataclasses.dataclass
class PoseResult:
    coords_voxel: np.ndarray  # (J, 3) heatmap-space
    coords_img: np.ndarray  # (J, 3) original px + mm depth (root-relative
    # unless root_z was provided)


class PoseServer:
    def __init__(
        self,
        cfg: Config,
        params,
        batch_stats,
        max_batch: int = 16,
        flip_test: Optional[bool] = None,
        mesh=None,
        partition: str = "spatial",
    ):
        """``mesh``: a multi-device ``jax.sharding.Mesh`` enables multi-chip
        serving; ``partition`` picks the axis (BASELINE config #5 composes
        both halves — multi-chip training AND a multi-chip server):

        - ``"spatial"`` (latency): the patch's image-row axis is sharded
          over the mesh's first axis and XLA inserts the conv halo
          exchanges, so a single small request uses every chip. Routes
          through the plain-XLA soft-argmax composition (GSPMD has no
          pallas partitioning rule); coordinates are identical (tested on
          the virtual CPU mesh). in_h must be divisible by the mesh size.
        - ``"data"`` (throughput): the batch axis is sharded over the mesh
          — each chip runs whole samples, the same layout the dp train
          step uses. The model is built WITH the mesh, so inference takes
          ``model.coords``: the fused final-conv+integral kernel launches
          per-shard via shard_map (ops/fused_head_integral._sharded_fused)
          — the max-throughput path on every chip, not just one.
          max_batch must be divisible by the mesh size (requests are
          padded to max_batch, so every dispatch is full and divisible;
          flip-test's 2B concat stays divisible too)."""
        self.cfg = cfg
        # cfg.model.matmul_precision is threaded per-call through the
        # model (build_pose_net) — no process-global precision mutation.
        self.skeleton = skeletons.get_skeleton(cfg.data.testset)
        self.params = params
        self.batch_stats = batch_stats
        self.max_batch = max_batch
        self.flip_test = cfg.eval.flip_test if flip_test is None else flip_test
        self.flip_perm = self.skeleton.flip_permutation()
        self.mesh = mesh if (mesh is not None and mesh.size > 1) else None
        assert partition in ("spatial", "data"), partition
        self.partition = partition if self.mesh is not None else "spatial"
        self.model: PoseNet = build_pose_net(
            cfg,
            self.skeleton.joint_num,
            mesh=self.mesh if self.partition == "data" else None,
        )
        # params travel as jit ARGUMENTS: closing over them would bake ~100MB
        # of weights into the executable as constants and silently ignore
        # later weight updates.
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            ax = self.mesh.axis_names[0]
            rep = NamedSharding(self.mesh, P())
            if self.partition == "data":
                assert max_batch % self.mesh.shape[ax] == 0, (
                    "data-parallel serving pads every dispatch to max_batch, "
                    f"which must divide over the mesh ({max_batch} vs "
                    f"{dict(self.mesh.shape)})"
                )
                self._in_shard = NamedSharding(self.mesh, P(ax, None, None, None))
                out = NamedSharding(self.mesh, P(ax, None, None))
            else:
                assert cfg.data.input_shape[0] % self.mesh.size == 0, (
                    cfg.data.input_shape,
                    self.mesh.size,
                )
                self._in_shard = NamedSharding(self.mesh, P(None, ax, None, None))
                out = rep
            self.params = jax.device_put(self.params, rep)
            self.batch_stats = jax.device_put(self.batch_stats, rep)
            self._jitted = jax.jit(self._forward, out_shardings=out)
        else:
            self._jitted = jax.jit(self._forward)

    def _fn(self, patch_u8, color_scale):
        if self.mesh is not None:
            patch_u8 = jax.device_put(jnp.asarray(patch_u8), self._in_shard)
        return self._jitted(self.params, self.batch_stats, patch_u8, color_scale)

    def _forward(self, params, batch_stats, patch_u8, color_scale):
        image = finalize_patch(patch_u8, color_scale, self.cfg.data)

        def infer(img):
            vars_ = {"params": params, "batch_stats": batch_stats}
            if self.mesh is not None and self.partition == "spatial":
                # Spatial mode: heatmap forward (every op partitionable) +
                # plain-XLA soft-argmax — pallas_call has no GSPMD rule.
                return self.model.apply(
                    vars_, img, train=False, method=self.model.coords_plain
                )
            # Single-device AND data-parallel: model.coords — the fused
            # kernel (per-shard shard_map launch when the model holds a
            # multi-device mesh).
            return self.model.apply(
                vars_, img, train=False, method=self.model.coords
            )

        if not self.flip_test:
            return infer(image)
        # One 2B dispatch instead of two B dispatches: on the tunneled
        # platform per-dispatch latency dominates small batches (same
        # treatment as parallel/train_step.py:make_eval_step).
        b = image.shape[0]
        both = infer(jnp.concatenate([image, image[:, :, ::-1, :]], axis=0))
        coords, cf = both[:b], both[b:]
        x = self.cfg.data.output_shape[1] - 1.0 - cf[..., 0]
        cf = jnp.concatenate([x[..., None], cf[..., 1:]], axis=-1)
        cf = cf[:, self.flip_perm, :]
        return (coords + cf) * 0.5

    def submit_patches(self, patches_u8: np.ndarray):
        """Async submit of ONE chunk: (B <= max_batch, in_h, in_w, 3) uint8
        -> device-resident (B, J, 3) voxel coords WITHOUT host
        synchronization. Dispatch returns immediately (JAX async), so the
        caller can preprocess the next request while this one computes —
        the building block for sustained/pipelined serving
        (tools/serving_bench.py). Call ``np.asarray`` on the result (or
        chain it into a reduction) to materialize."""
        b = len(patches_u8)
        assert b <= self.max_batch, (b, self.max_batch)
        if b == 0:
            # np.asarray([]) is rank-1; padding it would dispatch a
            # malformed input into the fixed-shape program.
            return jnp.zeros((0, self.skeleton.joint_num, 3), jnp.float32)
        pad = self.max_batch - b
        chunk = np.asarray(patches_u8)
        if pad:
            chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)])
        ones = np.ones((self.max_batch, 3), np.float32)
        coords = self._fn(jnp.asarray(chunk), jnp.asarray(ones))
        return coords[:b]

    def predict_patches(self, patches_u8: np.ndarray) -> np.ndarray:
        """(N, in_h, in_w, 3) uint8 pre-cropped patches -> (N, J, 3) voxel
        coords. N may be any size; processed in fixed max_batch chunks
        (each chunk delegates to ``submit_patches``; the np.asarray pull
        at the end of the loop body synchronizes per chunk)."""
        n = len(patches_u8)
        out = np.empty((n, self.skeleton.joint_num, 3), np.float32)
        for s in range(0, n, self.max_batch):
            chunk = patches_u8[s : s + self.max_batch]
            out[s : s + len(chunk)] = np.asarray(self.submit_patches(chunk))
        return out

    def _preprocess(self, images: Sequence[np.ndarray], bboxes: np.ndarray):
        """Host leg of the full path: bbox aspect-fix + affine crop to the
        network input (native C++ warp when available). Returns the uint8
        patches plus the per-person inverse affines needed for warp-back."""
        d = self.cfg.data
        in_h, in_w = d.input_shape
        aspect = in_w / in_h
        boxes = []
        for i, bb in enumerate(np.asarray(bboxes, np.float32)):
            fixed = geometry.process_bbox(
                bb, images[i].shape[1], images[i].shape[0], aspect, d.bbox_margin
            )
            boxes.append(fixed if fixed is not None else bb)
        boxes = np.stack(boxes)
        cx = boxes[:, 0] + boxes[:, 2] / 2
        cy = boxes[:, 1] + boxes[:, 3] / 2
        invs = np.stack(
            [
                gen_trans_np(cx[i], cy[i], boxes[i, 2], boxes[i, 3], in_w, in_h, 1.0, 0.0, inv=True)
                for i in range(len(boxes))
            ]
        )
        if native.available():
            patches = native.warp_batch(
                list(images), invs, np.zeros(len(boxes), np.int32), in_h, in_w
            )
        else:  # pure-JAX on-device warp fallback
            from ihpr_tpu.data.warp import affine_warp_bilinear

            maxh = max(im.shape[0] for im in images)
            maxw = max(im.shape[1] for im in images)
            canv = np.zeros((len(images), maxh, maxw, 3), np.uint8)
            for i, im in enumerate(images):
                canv[i, : im.shape[0], : im.shape[1]] = im
            patches = np.asarray(
                affine_warp_bilinear(jnp.asarray(canv), jnp.asarray(invs), (in_h, in_w))
            ).astype(np.uint8)
        return patches, invs

    def _postprocess(
        self, voxels: np.ndarray, invs: np.ndarray, root_z: Optional[np.ndarray]
    ) -> list:
        """Voxel coords -> original-image px + mm depth (host, numpy)."""
        d = self.cfg.data
        results = []
        for i, vox in enumerate(np.asarray(voxels)):
            img_coords = geometry.warp_coord_to_original(
                vox,
                invs[i],
                d.output_shape,
                d.input_shape,
                d.depth_dim,
                d.bbox_3d_shape[0],
                root_z=float(root_z[i]) if root_z is not None else 0.0,
            )
            results.append(PoseResult(coords_voxel=vox, coords_img=img_coords))
        return results

    def predict(
        self,
        images: Sequence[np.ndarray],
        bboxes: np.ndarray,
        root_z: Optional[np.ndarray] = None,
        f: Optional[np.ndarray] = None,
        c: Optional[np.ndarray] = None,
    ) -> list:
        """Full path: original images + person bboxes -> per-person results
        in original-image pixels (and camera-space mm when intrinsics are
        given). Uses the native C++ warp when available."""
        patches, invs = self._preprocess(images, bboxes)
        voxels = self.predict_patches(patches)
        return self._postprocess(voxels, invs, root_z)

    def predict_stream(self, requests, depth: int = 2):
        """Pipelined full-path serving: iterate ``(images, bboxes)`` or
        ``(images, bboxes, root_z)`` requests, yielding one ``predict``-
        equivalent result list per request IN ORDER.

        Keeps ``depth`` requests in flight: the host warp of request i+1
        runs while the device computes request i, because
        ``submit_patches`` dispatches asynchronously (the serving analog
        of data/pipeline.prefetch_to_device's double buffering). Results
        are bit-identical to sequential ``predict`` calls — only the
        host/device overlap changes (tools/serving_bench.py measures the
        sustained rate)."""
        import collections

        q = collections.deque()

        def stage(req):
            images, bboxes = req[0], req[1]
            root_z = req[2] if len(req) > 2 else None
            patches, invs = self._preprocess(images, bboxes)
            # async device dispatch per max_batch chunk — no host sync here
            handles = [
                self.submit_patches(patches[s : s + self.max_batch])
                for s in range(0, len(patches), self.max_batch)
            ]
            return handles, invs, root_z

        def finish(handles, invs, root_z):
            voxels = (
                np.concatenate([np.asarray(h) for h in handles])
                if handles
                else np.zeros((0, self.skeleton.joint_num, 3), np.float32)
            )
            return self._postprocess(voxels, invs, root_z)

        for req in requests:
            q.append(stage(req))
            if len(q) >= depth:
                yield finish(*q.popleft())
        while q:
            yield finish(*q.popleft())


def load_server(
    cfg: Config, snapshot_dir: Optional[str] = None, epoch: Optional[int] = None, **kw
) -> PoseServer:
    """Build a server from a training snapshot (reference --test_epoch)."""
    from ihpr_tpu.engine.checkpoint import CheckpointManager
    from ihpr_tpu.parallel import create_train_state

    model = build_pose_net(cfg)
    template, _ = create_train_state(model, cfg, jax.random.key(0), 1)
    ckpt = CheckpointManager(snapshot_dir or cfg.output_dir)
    e = epoch if epoch is not None else ckpt.latest_epoch()
    state, _, _, _ = ckpt.load(e, template, jax.random.key(0))
    return PoseServer(cfg, state.params, state.batch_stats, **kw)
