"""Host -> HBM input pipeline: canvas extraction, batching, double-buffered
device feed.

Replaces the reference's ``torch.utils.data.DataLoader`` worker-process
pipeline (``common/base.py:_make_batch_generator`` + ``data/dataset.py``).
Division of labor (BASELINE.json "jit-compiled on-device pipeline feeding
double-buffered HBM batches"):

  host (this file, thread pool):  JPEG decode, fixed-size uint8 canvas crop
      around the bbox (pure slice + pad — interpolation-free whenever the
      needed extent fits the canvas), joint-order unification onto the
      primary skeleton;
  device (augment.make_patch_batch, jit):  affine warp, flip/rot/scale/color
      augmentation, normalization, joint transforms.

Because the canvas crop is a pure translation (scale 1) for typical bboxes,
the device warp samples the same pixels the reference's single
cv2.warpAffine would — host interpolation only kicks in for people larger
than ``canvas_px / span`` pixels, recorded in ``canvas_scale``.

``prefetch_to_device`` keeps two batches in flight (device_put is async)
so host work overlaps device compute; pass a NamedSharding to land batches
pre-sharded across the data-parallel mesh.
"""

from __future__ import annotations

import concurrent.futures as cf
import dataclasses
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from ihpr_tpu.config import Config
from ihpr_tpu.data import skeletons
from ihpr_tpu.data.datasets import PoseDataset, render_synthetic_image


def _read_bytes(path: str) -> bytes:
    with open(path, "rb") as f:
        return f.read()


def _load_image(sample: dict) -> np.ndarray:
    if sample.get("img_path") is None:
        return render_synthetic_image(sample)
    import cv2

    img = cv2.imread(sample["img_path"], cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(sample["img_path"])
    return img[:, :, ::-1]  # BGR -> RGB (reference trains on cv2 BGR order
    # fed through ImageNet-normalized torchvision stats; we standardize on
    # RGB so converted torchvision backbones see the channel order they
    # were trained with)


def extract_canvas(
    img: np.ndarray, bbox: np.ndarray, canvas_px: int, span: float
):
    """Crop a (canvas_px, canvas_px) uint8 window centered on the bbox.

    span: required extent as a multiple of the bbox long side (2.0 covers
    rotation+scale augmentation; ~1.05 suffices for eval). Returns
    (canvas, origin (2,), scale) with original_px = origin + scale * canvas_px.
    """
    h, w = img.shape[:2]
    side = max(bbox[2], bbox[3]) * span
    scale = max(1.0, side / canvas_px)
    win = int(round(canvas_px * scale))
    cx, cy = bbox[0] + bbox[2] / 2.0, bbox[1] + bbox[3] / 2.0
    x0 = int(round(cx - win / 2.0))
    y0 = int(round(cy - win / 2.0))

    sx0, sy0 = max(0, x0), max(0, y0)
    sx1, sy1 = min(w, x0 + win), min(h, y0 + win)
    out = np.zeros((win, win, img.shape[2]), img.dtype)
    if sx1 > sx0 and sy1 > sy0:
        out[sy0 - y0 : sy1 - y0, sx0 - x0 : sx1 - x0] = img[sy0:sy1, sx0:sx1]
    origin = np.array([x0, y0], np.float32)
    if scale > 1.0:
        import cv2

        out = cv2.resize(out, (canvas_px, canvas_px), interpolation=cv2.INTER_LINEAR)
        # cv2.resize maps dst pixel p -> src (p + 0.5) * scale - 0.5, while
        # consumers assume orig = origin + scale * p; shift the origin by
        # 0.5*(scale - 1) so labels stay aligned with the resampled pixels.
        origin += 0.5 * (scale - 1.0)
    return out, origin, np.float32(scale)


@dataclasses.dataclass
class HostBatch:
    """Columnar numpy batch for the on-device warp path."""

    canvas: np.ndarray  # (B, C, C, 3) uint8
    canvas_origin: np.ndarray  # (B, 2)
    canvas_scale: np.ndarray  # (B,)
    bbox: np.ndarray  # (B, 4)
    joints: np.ndarray  # (B, J, 3)
    joint_vis: np.ndarray  # (B, J)
    joints_have_depth: np.ndarray  # (B,)
    sample_idx: np.ndarray  # (B,) flat positions into BatchLoader.index
    # (THIS process's rows of the global batch; eval scatters by these)


@dataclasses.dataclass
class WarpedHostBatch:
    """Columnar numpy batch for the native host-warp fast path: patches are
    already warped (native/warp.cc, reference cv2 semantics); the device
    only runs the fused color-jitter + normalize tail
    (augment.finalize_patch)."""

    patch: np.ndarray  # (B, in_h, in_w, 3) uint8
    color_scale: np.ndarray  # (B, 3)
    joint_img: np.ndarray  # (B, J, 3) voxel coords
    joint_vis: np.ndarray  # (B, J)
    joints_have_depth: np.ndarray  # (B,)
    sample_idx: np.ndarray  # (B,)


class BatchLoader:
    """Shuffled epoch iterator over one or more datasets, with joint-order
    unification onto the primary (first) dataset's skeleton.

    Reference: ``common/base.py:Trainer._make_batch_generator`` — multi-
    dataset concat + ``transform_joint_to_other_db`` + DataLoader(shuffle).
    """

    def __init__(
        self,
        datasets: Sequence[PoseDataset],
        cfg: Config,
        batch_size: int,
        train: bool = True,
        canvas_px: int = 384,
        num_workers: int = 8,
        seed: int = 0,
        drop_last: Optional[bool] = None,
        host_warp: Optional[bool] = None,
    ):
        from ihpr_tpu.data import native

        self.datasets = list(datasets)
        self.cfg = cfg
        self.batch_size = batch_size
        self.train = train
        self.canvas_px = canvas_px
        self.span = 2.0 if train and cfg.data.use_aug else 1.05
        self.seed = seed
        self.drop_last = train if drop_last is None else drop_last
        self.primary = self.datasets[0].skeleton
        self._pool = cf.ThreadPoolExecutor(num_workers) if num_workers > 0 else None
        # Host-warp fast path by default when the native library is present
        # (TPU gathers make the on-device warp latency-bound; a host core
        # warps an image in ~1 ms, fully overlapped by prefetch).
        self.host_warp = native.available() if host_warp is None else host_warp

        aspect = cfg.data.input_shape[1] / cfg.data.input_shape[0]
        from ihpr_tpu.data.geometry import process_bbox

        # flatten (dataset_idx, sample_idx); pre-fix bboxes once
        self.index: List[tuple] = []
        for di, ds in enumerate(self.datasets):
            for si, s in enumerate(ds.samples):
                bb = process_bbox(
                    np.asarray(s["bbox"], np.float32),
                    s["img_shape"][1],
                    s["img_shape"][0],
                    aspect,
                    cfg.data.bbox_margin,
                )
                if bb is None:
                    continue
                self.index.append((di, si, bb))

    @property
    def joint_num(self) -> int:
        return self.primary.joint_num

    def __len__(self):
        n = len(self.index)
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def _build_sample(self, entry):
        di, si, bbox = entry
        ds = self.datasets[di]
        sample = ds.samples[si]
        img = _load_image(sample)
        canvas, origin, cscale = extract_canvas(img, bbox, self.canvas_px, self.span)
        joints = sample["joint_img"]
        vis = sample["joint_vis"]
        if ds.skeleton.name != self.primary.name:
            joints = skeletons.transform_joint_to_other_db(joints, ds.skeleton, self.primary)
            vis = skeletons.transform_joint_to_other_db(
                vis[:, None], ds.skeleton, self.primary
            )[:, 0]
        return canvas, origin, cscale, bbox, joints, vis, float(ds.skeleton.has_depth)

    def _batch_selection(self, epoch_idx: int):
        """Yields this PROCESS's sample indices for each global batch. All
        hosts shuffle with the same seed/epoch, so the global batch is
        consistent; each host materializes only its contiguous row block
        (matching the default mesh's device-per-process order) — decoding
        the full global batch on every host would multiply input work by
        the process count."""
        import jax

        pidx, pcount = jax.process_index(), jax.process_count()
        order = np.arange(len(self.index))
        if self.train:
            np.random.RandomState(self.seed + epoch_idx).shuffle(order)
        bs = self.batch_size
        assert bs % pcount == 0, (bs, pcount)
        local = bs // pcount
        for b in range(len(self)):
            sel = order[b * bs : (b + 1) * bs]
            if len(sel) < bs:  # pad the final eval batch by repeating
                sel = np.concatenate(
                    [sel, np.full(bs - len(sel), sel[-1] if len(sel) else 0)]
                )
            yield sel[pidx * local : (pidx + 1) * local]

    def epoch(self, epoch_idx: int = 0, max_steps: Optional[int] = None) -> Iterator:
        """Yield one epoch of batches; ``max_steps`` truncates the epoch
        (smoke runs / capped benchmarks)."""
        import itertools

        it = self._epoch_host_warp(epoch_idx) if self.host_warp else self._epoch_full(epoch_idx)
        yield from itertools.islice(it, max_steps)

    def _epoch_full(self, epoch_idx: int) -> Iterator:
        for sel in self._batch_selection(epoch_idx):
            entries = [self.index[i] for i in sel]
            if self._pool is not None:
                rows = list(self._pool.map(self._build_sample, entries))
            else:
                rows = [self._build_sample(e) for e in entries]
            canvas, origin, cscale, bbox, joints, vis, hd = zip(*rows)
            yield HostBatch(
                canvas=np.stack(canvas),
                canvas_origin=np.stack(origin),
                canvas_scale=np.asarray(cscale, np.float32),
                bbox=np.stack(bbox).astype(np.float32),
                joints=np.stack(joints).astype(np.float32),
                joint_vis=np.stack(vis).astype(np.float32),
                joints_have_depth=np.asarray(hd, np.float32),
                sample_idx=np.asarray(sel, np.int64),
            )

    # ---- native host-warp fast path -------------------------------------

    def _load_entry_image(self, entry):
        di, si, _ = entry
        return _load_image(self.datasets[di].samples[si])

    def _epoch_host_warp(self, epoch_idx: int) -> Iterator[WarpedHostBatch]:
        """Fully batch-vectorized host path: the only per-sample Python work
        is image decode (thread pool) and the OpenMP C++ warp; augmentation
        sampling, affine construction, and joint transforms run as single
        numpy batch expressions (per-sample loops cost ~100 ms/batch and
        made the host the bottleneck at 4x device speed)."""
        from ihpr_tpu.data import native
        from ihpr_tpu.data.warp import gen_trans_np

        d = self.cfg.data
        in_h, in_w = d.input_shape
        out_h, out_w = d.output_shape
        perm = self.primary.flip_permutation()
        jnum = self.primary.joint_num

        # Pre-unify joints/vis/depth-flag once per epoch (cheap, reusable).
        if not hasattr(self, "_unified"):
            all_joints, all_vis, all_hd = [], [], []
            for di, si, _bbox in self.index:
                ds = self.datasets[di]
                s = ds.samples[si]
                j, v = s["joint_img"], s["joint_vis"]
                if ds.skeleton.name != self.primary.name:
                    j = skeletons.transform_joint_to_other_db(j, ds.skeleton, self.primary)
                    v = skeletons.transform_joint_to_other_db(
                        v[:, None], ds.skeleton, self.primary
                    )[:, 0]
                all_joints.append(j)
                all_vis.append(v)
                all_hd.append(float(ds.skeleton.has_depth))
            self._unified = (
                np.stack(all_joints).astype(np.float32),
                np.stack(all_vis).astype(np.float32),
                np.asarray(all_hd, np.float32),
                np.stack([e[2] for e in self.index]).astype(np.float32),  # bboxes
            )
        u_joints, u_vis, u_hd, u_bbox = self._unified

        for bi, sel in enumerate(self._batch_selection(epoch_idx)):
            entries = [self.index[i] for i in sel]
            b = len(entries)
            ent_samples = [self.datasets[di].samples[si] for di, si, _ in entries]
            # image widths come from the annotations (img_shape), so flip
            # matrices exist BEFORE decode — enabling the fused C++
            # decode+warp below.
            img_w = np.asarray([s["img_shape"][1] for s in ent_samples], np.float32)

            # --- batched aug sampling (reference get_aug_config dists) ---
            # Draws cover the GLOBAL batch and each process slices its own
            # rows: all hosts seed identically, so drawing only the local
            # rows would hand every process the SAME values for different
            # samples (aug entropy / process_count) and make the stream
            # depend on the process layout. Single-process is unchanged
            # (full slice, same consumption order); multi-process now
            # augments exactly like the equivalent single-process run
            # (pinned by tools/multiprocess_dp.py's aug-on spatial phase).
            rng = np.random.RandomState(
                (self.seed * 1000003 + epoch_idx * 131071 + bi) % (2**31)
            )
            import jax as _jax

            gb = self.batch_size
            lo = _jax.process_index() * (gb // _jax.process_count())
            rows = slice(lo, lo + b)
            if self.train and d.use_aug:
                scale = (1.0 + d.scale_factor * np.clip(rng.randn(gb), -1, 1))[rows]
                # reference: clip(randn,-2,2) * rot_factor (range +-2*rf)
                rot_all = d.rot_factor * np.clip(rng.randn(gb), -2, 2)
                rot = np.where(rng.rand(gb) <= d.rot_prob, rot_all, 0.0)[rows]
                flips = (rng.rand(gb) <= d.flip_prob).astype(np.int32)[rows]
                colors = rng.uniform(
                    1 - d.color_factor, 1 + d.color_factor, (gb, 3)
                ).astype(np.float32)[rows]
            else:
                scale = np.ones(b)
                rot = np.zeros(b)
                flips = np.zeros(b, np.int32)
                colors = np.ones((b, 3), np.float32)

            bbox = u_bbox[sel]
            c_x = bbox[:, 0] + bbox[:, 2] * 0.5
            c_y = bbox[:, 1] + bbox[:, 3] * 0.5
            c_x = np.where(flips, img_w - 1.0 - c_x, c_x)  # reference flip
            invs = gen_trans_np(c_x, c_y, bbox[:, 2], bbox[:, 3], in_w, in_h, scale, rot, inv=True)
            fwds = gen_trans_np(c_x, c_y, bbox[:, 2], bbox[:, 3], in_w, in_h, scale, rot)

            jpegable = native.has_jpeg() and all(
                (s.get("img_path") or "").lower().endswith((".jpg", ".jpeg"))
                for s in ent_samples
            )
            if jpegable:
                # fused libjpeg decode + warp: full-res images stay in C++
                paths = [s["img_path"] for s in ent_samples]
                if self._pool is not None:
                    blobs = list(self._pool.map(_read_bytes, paths))
                else:
                    blobs = [_read_bytes(p) for p in paths]
                patches, ok = native.decode_and_warp_batch(blobs, invs, flips, in_h, in_w)
                for k in np.nonzero(~ok)[0]:  # corrupt jpeg -> cv2 fallback
                    img = _load_image(ent_samples[k])
                    patches[k] = native.warp_batch(
                        [img], invs[k : k + 1], flips[k : k + 1], in_h, in_w
                    )[0]
            else:
                if self._pool is not None:
                    images = list(self._pool.map(self._load_entry_image, entries))
                else:
                    images = [self._load_entry_image(e) for e in entries]
                patches = native.warp_batch(images, invs, flips, in_h, in_w)

            # --- batched joint transform ---
            joints = u_joints[sel]  # (b, J, 3)
            vis = u_vis[sel]
            fl = flips.astype(bool)
            xy = joints[:, :, :2].copy()
            z = joints[:, :, 2].copy()
            xy[fl, :, 0] = img_w[fl, None] - 1.0 - xy[fl, :, 0]
            xy[fl] = xy[fl][:, perm]
            z[fl] = z[fl][:, perm]
            vis = vis.copy()
            vis[fl] = vis[fl][:, perm]
            ones = np.ones((b, jnum, 1), np.float32)
            xy_patch = np.einsum(
                "bij,bkj->bki", fwds, np.concatenate([xy, ones], -1)
            )
            x_hm = xy_patch[:, :, 0] / in_w * out_w
            y_hm = xy_patch[:, :, 1] / in_h * out_h
            z_hm = z / (d.bbox_3d_shape[0] / 2.0) * (d.depth_dim / 2.0) + d.depth_dim / 2.0
            inside = (
                (x_hm >= 0) & (x_hm < out_w)
                & (y_hm >= 0) & (y_hm < out_h)
                & (z_hm >= 0) & (z_hm < d.depth_dim)
            )
            yield WarpedHostBatch(
                patch=patches,
                color_scale=colors,
                joint_img=np.stack([x_hm, y_hm, z_hm], -1).astype(np.float32),
                joint_vis=(vis * inside).astype(np.float32),
                joints_have_depth=u_hd[sel],
                sample_idx=np.asarray(sel, np.int64),
            )


def prefetch_to_device(
    it: Iterator[HostBatch], sharding=None, depth: int = 2
) -> Iterator[Dict]:
    """Double-buffered async device_put (BASELINE "double-buffered HBM
    batches"). Yields dicts of device arrays.

    Multi-host (DCN): BatchLoader already yields only this process's row
    block (see ``_batch_selection``); ``jax.make_array_from_process_local_
    data`` assembles the global array from the per-host slices — the SPMD
    replacement for the reference DataLoader's scatter.
    """
    import collections

    import jax

    multi = jax.process_count() > 1

    def put_one(v):
        if sharding is None:
            return jax.device_put(v)
        if multi:
            return jax.make_array_from_process_local_data(sharding, v)
        return jax.device_put(v, sharding)

    def put(hb: HostBatch):
        arrays = dataclasses.asdict(hb)
        arrays.pop("sample_idx")
        return {k: put_one(v) for k, v in arrays.items()}, hb.sample_idx

    queue = collections.deque()
    for hb in it:
        queue.append(put(hb))
        if len(queue) >= depth:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
