"""Dataset loaders + evaluators: Human3.6M, MPII, MSCOCO, Synthetic.

Reference: ``data/Human36M/Human36M.py:~1-260`` (18-joint set, protocol 1/2
splits, world->cam -> cam2pixel sample construction, per-action MPJPE
evaluate), ``data/MPII/MPII.py:~1-110`` (16-joint 2D, COCO-format json),
``data/MSCOCO/MSCOCO.py:~1-150`` (17 keypoints, OKS AP).

Each dataset exposes:
  load_data() -> List[sample dict]     (host-side; file formats below)
  evaluate(preds_voxel, samples, cfg)  (host-side numpy metrics)

Sample dict fields (the device pipeline consumes a columnar batch of these):
  img_path   str or None (None -> synthetic image)
  bbox       (4,) float32, original px (already aspect-fixed + margined)
  joint_img  (J, 3) float32: x, y original px; z root-relative mm
  joint_vis  (J,) float32
  root_z     float  (absolute root depth, mm; 0 for 2D sets)
  f, c       (2,) camera intrinsics (3D sets)
  action     str (H36M eval table)

A ``Synthetic`` dataset generates consistent geometry + blob-rendered
images so the full train/eval path runs in environments without the real
datasets (this one included — SURVEY.md §7 hard part #6).
"""

from __future__ import annotations

import dataclasses
import json
import os
import warnings
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ihpr_tpu.config import Config
from ihpr_tpu.data import geometry, skeletons
from ihpr_tpu.data.coco import COCO, keypoint_ap

# ---------------------------------------------------------------------------


@dataclasses.dataclass
class PoseDataset:
    name: str
    skeleton: skeletons.Skeleton
    samples: List[dict]
    is_train: bool

    def __len__(self):
        return len(self.samples)

    @property
    def joint_num(self):
        return self.skeleton.joint_num


# ---------------------------------------------------------------------------
# Human3.6M


H36M_ACTIONS = (
    "Directions", "Discussion", "Eating", "Greeting", "Phoning", "Photo",
    "Posing", "Purchases", "Sitting", "SittingDown", "Smoking", "Waiting",
    "WalkDog", "Walking", "WalkTogether",
)

# Protocol splits (reference data/Human36M/Human36M.py:~20-40):
# P1 (PA-MPJPE) train S1,5,6,7,8,9 test S11 / P2 (MPJPE) train S1,5,6,7,8
# test S9,S11 — only protocol 2 holds S9 out of training.
H36M_TRAIN_SUBJECTS = {1: (1, 5, 6, 7, 8, 9), 2: (1, 5, 6, 7, 8)}
H36M_TEST_SUBJECTS = {1: (11,), 2: (9, 11)}


_WARNED_ACTION_IDX_FALLBACK = False


def load_h36m(
    root: str, split: str, protocol: int = 2, sampling: Optional[int] = None
) -> List[dict]:
    """Parse upstream-style per-subject annotation json.

    Expected layout (the common release of the reference's preprocessed
    annotations): {root}/annotations/Human36M_subject{N}_{data,camera,joint_3d}.json
    - data: COCO-style images (+file_name, width, height, cam_idx, frame_idx,
      action_name or action_idx) and annotations (bbox).
    - camera: {cam_idx: {R (3,3), t (3,), f (2,), c (2,)}}
    - joint_3d: {action][subaction][frame] -> (17, 3) world mm} or flat
      {image_id: (17, 3)}.
    """
    skel = skeletons.H36M
    subjects = (
        H36M_TRAIN_SUBJECTS[protocol] if split == "train" else H36M_TEST_SUBJECTS[protocol]
    )
    if sampling is None:
        sampling = 5 if split == "train" else 64
    samples: List[dict] = []
    for subj in subjects:
        ann_path = os.path.join(root, "annotations", f"Human36M_subject{subj}_data.json")
        cam_path = os.path.join(root, "annotations", f"Human36M_subject{subj}_camera.json")
        joint_path = os.path.join(root, "annotations", f"Human36M_subject{subj}_joint_3d.json")
        if not os.path.exists(ann_path):
            raise FileNotFoundError(
                f"H36M annotations not found at {ann_path}; point --data_root at "
                "the preprocessed annotation release or use the Synthetic dataset."
            )
        with open(ann_path) as f:
            data = json.load(f)
        with open(cam_path) as f:
            cameras = json.load(f)
        with open(joint_path) as f:
            joints_world = json.load(f)
        db = COCO(dataset=data)
        for i, img_id in enumerate(db.get_img_ids()):
            if i % sampling:
                continue
            img = db.imgs[img_id]
            cam = cameras[str(img["cam_idx"])]
            R = np.asarray(cam["R"], np.float32)
            t = np.asarray(cam["t"], np.float32)
            f_ = np.asarray(cam["f"], np.float32)
            c_ = np.asarray(cam["c"], np.float32)
            try:
                jw = np.asarray(
                    joints_world[str(img["action_idx"])][str(img["subaction_idx"])][
                        str(img["frame_idx"])
                    ],
                    np.float32,
                )
            except (KeyError, TypeError):
                jw = np.asarray(joints_world[str(img_id)], np.float32)
            # world -> camera -> pixel; add Thorax as in the reference
            jc = geometry.world2cam(jw, R, t)
            if jc.shape[0] == 17:
                thorax = (jc[11] + jc[14]) * 0.5  # mid-shoulders
                jc = np.concatenate([jc, thorax[None]], 0)
            jp = geometry.cam2pixel(jc, f_, c_)
            root_z = float(jc[skel.root_idx, 2])
            joint_img = jp.copy()
            joint_img[:, 2] = jc[:, 2] - root_z  # root-relative mm
            anns = db.load_anns(db.get_ann_ids([img_id]))
            bbox = np.asarray(anns[0]["bbox"], np.float32) if anns else _bbox_from_joints(jp)
            action = img.get("action_name")
            if action is None:
                # Unverified indexing guess (upstream action_idx starts at 2);
                # warn once so a real-data run can't silently mislabel the
                # per-action MPJPE table.
                global _WARNED_ACTION_IDX_FALLBACK
                if not _WARNED_ACTION_IDX_FALLBACK:
                    _WARNED_ACTION_IDX_FALLBACK = True
                    import warnings

                    warnings.warn(
                        "H36M annotations lack action_name; deriving the action "
                        "from action_idx-2 — verify the per-action MPJPE table "
                        "against the official toolkit.",
                        stacklevel=2,
                    )
                action = H36M_ACTIONS[int(img.get("action_idx", 2)) - 2]
            samples.append(
                dict(
                    img_path=os.path.join(root, "images", img["file_name"]),
                    img_shape=(img["height"], img["width"]),
                    bbox=bbox,
                    joint_img=joint_img.astype(np.float32),
                    joint_vis=np.ones(skel.joint_num, np.float32),
                    root_z=root_z,
                    f=f_,
                    c=c_,
                    action=action,
                )
            )
    return samples


def _bbox_from_joints(jp: np.ndarray, margin: float = 1.2) -> np.ndarray:
    x0, y0 = jp[:, 0].min(), jp[:, 1].min()
    x1, y1 = jp[:, 0].max(), jp[:, 1].max()
    w, h = x1 - x0, y1 - y0
    cx, cy = (x0 + x1) / 2, (y0 + y1) / 2
    return np.array(
        [cx - w * margin / 2, cy - h * margin / 2, w * margin, h * margin], np.float32
    )


def evaluate_h36m(
    preds_mm: np.ndarray, samples: Sequence[dict], protocol: int = 2
) -> Dict[str, float]:
    """Per-action + total MPJPE (protocol 2) or PA-MPJPE (protocol 1).

    preds_mm: (N, J, 3) camera-space mm, already root-aligned is NOT
    expected — root alignment happens here (reference Human36M.evaluate).
    """
    skel = skeletons.H36M
    ej = list(skel.eval_joints)
    per_action: Dict[str, List[float]] = {a: [] for a in H36M_ACTIONS}
    all_err: List[float] = []
    for pred, sample in zip(preds_mm, samples):
        gt = sample["joint_cam"] if "joint_cam" in sample else _sample_joint_cam(sample)
        pred_rel = pred - pred[skel.root_idx]
        gt_rel = gt - gt[skel.root_idx]
        p, g = pred_rel[ej], gt_rel[ej]
        if protocol == 1:
            p = geometry.rigid_align(p, g)
        err = float(np.sqrt(((p - g) ** 2).sum(-1)).mean())
        all_err.append(err)
        act = sample.get("action")
        if act in per_action:
            per_action[act].append(err)
    out = {f"MPJPE {a}": float(np.mean(v)) for a, v in per_action.items() if v}
    out["MPJPE total"] = float(np.mean(all_err))
    return out


def _sample_joint_cam(sample: dict) -> np.ndarray:
    ji = sample["joint_img"]
    px = ji.copy()
    px[:, 2] = ji[:, 2] + sample["root_z"]
    return geometry.pixel2cam(px, sample["f"], sample["c"])


# ---------------------------------------------------------------------------
# MPII


def load_mpii(root: str, split: str) -> List[dict]:
    """COCO-format MPII annotations (reference data/MPII/MPII.py)."""
    skel = skeletons.MPII
    path = os.path.join(root, "annotations", f"{split}.json")
    db = COCO(path)
    samples: List[dict] = []
    for ann_id in db.get_ann_ids():
        ann = db.anns[ann_id]
        img = db.imgs[ann["image_id"]]
        kpts = np.asarray(ann["keypoints"], np.float32).reshape(-1, 3)
        vis = (kpts[:, 2] > 0).astype(np.float32)
        if vis.sum() == 0:
            continue
        joint_img = np.concatenate([kpts[:, :2], np.zeros((skel.joint_num, 1))], 1)
        sample = dict(
            img_path=os.path.join(root, "images", img["file_name"]),
            img_shape=(img["height"], img["width"]),
            bbox=np.asarray(ann["bbox"], np.float32),
            joint_img=joint_img.astype(np.float32),
            joint_vis=vis,
            root_z=0.0,
            f=np.array([1.0, 1.0], np.float32),
            c=np.array([0.0, 0.0], np.float32),
            action="",
        )
        # Official-metric normalizer when the annotation carries a head box
        # (x1, y1, x2, y2); the common COCO-format release omits it.
        if "head_box" in ann:
            sample["head_box"] = np.asarray(ann["head_box"], np.float32)
        samples.append(sample)
    return samples


# Standard MPII PCKh headbox scaling (the official eval's SC_BIAS): the
# normalizer is 0.6 * headbox diagonal, approximating head segment length.
MPII_SC_BIAS = 0.6


def evaluate_mpii_pckh(
    preds_px: np.ndarray, samples: Sequence[dict], thresh: float = 0.5
) -> Dict[str, float]:
    """PCKh@0.5 with the standard per-joint breakdown.

    Normalizer: when a sample carries the annotated head box
    (``head_box = (x1, y1, x2, y2)``), uses the official
    ``SC_BIAS * headbox diagonal`` — comparable to the MPII leaderboard.
    Otherwise falls back to the Head-Neck segment length, which is only an
    approximation of the official metric (our COCO-format annotations do
    not include head boxes)."""
    skel = skeletons.MPII
    head_idx = skel.joints_name.index("Head")
    neck_idx = skel.joints_name.index("Neck")
    j = skel.joint_num
    correct = np.zeros(j)
    total = np.zeros(j)
    for pred, sample in zip(preds_px, samples):
        gt = sample["joint_img"][:, :2]
        vis = sample["joint_vis"] > 0
        if "head_box" in sample:
            x1, y1, x2, y2 = np.asarray(sample["head_box"], np.float64)
            head_size = MPII_SC_BIAS * float(np.hypot(x2 - x1, y2 - y1))
        else:
            head_size = np.linalg.norm(gt[head_idx] - gt[neck_idx])
        if head_size < 1e-3:
            continue
        d = np.linalg.norm(pred[:, :2] - gt, axis=-1)
        correct += ((d <= thresh * head_size) & vis).astype(np.float64)
        total += vis.astype(np.float64)
    out = {
        f"PCKh@0.5 {name}": float(correct[i] / total[i])
        for i, name in enumerate(skel.joints_name)
        if total[i] > 0
    }
    out["PCKh@0.5"] = float(correct.sum() / max(total.sum(), 1))
    return out


# ---------------------------------------------------------------------------
# MSCOCO


def load_mscoco(root: str, split: str) -> List[dict]:
    """COCO person-keypoints annotations (reference data/MSCOCO/MSCOCO.py)."""
    skel = skeletons.MSCOCO
    path = os.path.join(root, "annotations", f"person_keypoints_{split}.json")
    db = COCO(path)
    samples: List[dict] = []
    for ann_id in db.get_ann_ids():
        ann = db.anns[ann_id]
        if ann.get("iscrowd", 0) or ann.get("num_keypoints", 0) == 0:
            continue
        img = db.imgs[ann["image_id"]]
        kpts = np.asarray(ann["keypoints"], np.float32).reshape(-1, 3)
        vis = (kpts[:, 2] > 0).astype(np.float32)
        joint_img = np.concatenate([kpts[:, :2], np.zeros((skel.joint_num, 1))], 1)
        samples.append(
            dict(
                img_path=os.path.join(root, "images", split, img["file_name"]),
                img_shape=(img["height"], img["width"]),
                bbox=np.asarray(ann["bbox"], np.float32),
                joint_img=joint_img.astype(np.float32),
                joint_vis=vis,
                root_z=0.0,
                f=np.array([1.0, 1.0], np.float32),
                c=np.array([0.0, 0.0], np.float32),
                action="",
                image_id=ann["image_id"],
                area=float(ann.get("area", ann["bbox"][2] * ann["bbox"][3])),
            )
        )
    return samples


def evaluate_mscoco(preds_px: np.ndarray, samples: Sequence[dict]) -> Dict[str, float]:
    """OKS keypoint AP via the numpy COCOeval port."""
    gts, dts = [], []
    for i, (pred, sample) in enumerate(zip(preds_px, samples)):
        img_id = sample.get("image_id", i)
        gt_k = np.concatenate(
            [sample["joint_img"][:, :2], sample["joint_vis"][:, None]], 1
        )
        gts.append(dict(image_id=img_id, keypoints=gt_k, area=sample["area"]))
        dt_k = np.concatenate([pred[:, :2], np.ones((pred.shape[0], 1))], 1)
        dts.append(dict(image_id=img_id, keypoints=dt_k, score=1.0))
    return keypoint_ap(gts, dts)


# ---------------------------------------------------------------------------
# Synthetic (tests / benchmarks / environments without the real data)


def _semantic_hue_coding(skeleton: skeletons.Skeleton):
    """Per-joint (hue_class, tilt) arrays for mirror-consistent rendering.

    Both members of a flip pair share one hue class (mirroring a frame must
    produce a valid rendering of the flipped pose, so hue cannot encode
    chirality); left/right is instead coded as the blob's anisotropy tilt
    (+45 deg for the first pair member, -45 deg for the second, 0 for
    self-paired joints) — a horizontal mirror negates the tilt angle, which
    is exactly the flipped joint's rendering."""
    j = skeleton.joint_num
    hue_class = np.full(j, -1, np.int32)
    tilt = np.zeros(j, np.float32)
    n_class = 0
    for a, b in skeleton.flip_pairs:
        hue_class[a] = hue_class[b] = n_class
        tilt[a], tilt[b] = np.pi / 4, -np.pi / 4
        n_class += 1
    for i in range(j):
        if hue_class[i] < 0:
            hue_class[i] = n_class
            n_class += 1
    return hue_class, tilt, n_class


def make_synthetic(
    skeleton: skeletons.Skeleton,
    n: int,
    seed: int = 0,
    img_size: int = 400,
    with_depth: Optional[bool] = None,
    easy_depth: bool = False,
    hue_mode: str = "index",
    hue_skeleton: Optional[skeletons.Skeleton] = None,
) -> List[dict]:
    """Random but geometrically consistent samples; images are rendered on
    demand by ``render_synthetic_image`` (Gaussian blobs at joints), so a
    model CAN learn to localize them — used by the integration tests.

    ``hue_mode="semantic"`` renders mirror-consistently (shared pair hues +
    chirality-coded blob tilt, ``_semantic_hue_coding``), which makes
    flip-test and horizontal-flip augmentation label-consistent on
    synthetic data; ``"index"`` (default, one hue per joint index) keeps
    the historical probes' data distribution.

    ``hue_skeleton`` assigns each joint the hue its SAME-NAMED joint has in
    that other skeleton — required for mixed-dataset probes (reference
    common/base.py multi-dataset trainset): real photos code joint identity
    by anatomy, identically across datasets, so synthetic MPII frames mixed
    into H36M training must reuse the H36M hue for e.g. "Pelvis" or the two
    datasets would supervise conflicting hue->joint mappings that real data
    never has. Every joint name must exist in ``hue_skeleton``."""
    rng = np.random.RandomState(seed)
    if with_depth is None:
        with_depth = skeleton.has_depth
    f = np.array([1100.0, 1100.0], np.float32)
    c = np.array([img_size / 2, img_size / 2], np.float32)
    name_map = None
    if hue_skeleton is not None and hue_skeleton is not skeleton:
        hs_index = {nm: i for i, nm in enumerate(hue_skeleton.joints_name)}
        missing = [nm for nm in skeleton.joints_name if nm not in hs_index]
        if missing:
            raise ValueError(
                f"hue_skeleton {hue_skeleton.name!r} lacks joints {missing}"
            )
        name_map = np.array(
            [hs_index[nm] for nm in skeleton.joints_name], np.int32
        )
    if hue_mode == "semantic":
        hue_class, tilt, n_hue = _semantic_hue_coding(hue_skeleton or skeleton)
        if name_map is not None:
            hue_class = hue_class[name_map]
            tilt = tilt[name_map]
    elif hue_mode != "index":
        raise ValueError(f"unknown hue_mode {hue_mode!r}")
    samples = []
    for i in range(n):
        j = skeleton.joint_num
        center = rng.uniform(img_size * 0.3, img_size * 0.7, 2)
        spread = rng.uniform(40, 80)
        xy = center + rng.randn(j, 2) * spread
        xy = np.clip(xy, 5, img_size - 5)
        if not with_depth:
            z = np.zeros((j, 1))
        elif easy_depth:
            # Depth as a deterministic function of image position: still
            # exercises the full 3D chain (z supervision -> integral z ->
            # warp-back -> pixel2cam) but the visual cue is the blob's
            # location instead of its ~1 px radius, which the 4x-downsampled
            # heatmap cannot resolve — accuracy probes use this mode.
            # Coded off the y coordinate (mirror-INVARIANT) so flip-test and
            # flip augmentation stay label-consistent: an x-coded depth cue
            # would negate under the horizontal mirror while the label kept
            # its sign.
            z = ((xy[:, 1:2] / img_size) - 0.5) * 1100.0
        else:
            z = rng.uniform(-600, 600, (j, 1))
        joint_img = np.concatenate([xy, z], 1).astype(np.float32)
        bbox = _bbox_from_joints(joint_img)
        s = dict(
            img_path=None,
            synth_seed=seed * 100003 + i,
            img_shape=(img_size, img_size),
            bbox=bbox.astype(np.float32),
            joint_img=joint_img,
            joint_vis=np.ones(j, np.float32),
            root_z=4000.0,
            f=f,
            c=c,
            action=H36M_ACTIONS[i % len(H36M_ACTIONS)],
            # COCO OKS normalizes by instance area; harmless elsewhere.
            area=float(bbox[2] * bbox[3]),
        )
        if hue_mode == "semantic":
            s["hue_mode"] = "semantic"
            s["hue_class"] = hue_class
            s["hue_classes_total"] = n_hue
            s["tilt"] = tilt
        elif name_map is not None:
            # Index-mode hues in the hue_skeleton's index space.
            s["hue_idx"] = name_map
            s["hue_idx_total"] = hue_skeleton.joint_num
        samples.append(s)
    return samples


def render_synthetic_image(sample: dict, sigma: float = 4.0) -> np.ndarray:
    """(H, W, 3) uint8 with a Gaussian blob per joint. Blobs are rendered
    only in a +-4 sigma window — full-frame grids made this the
    input-pipeline bottleneck.

    Joint identity is coded as a unique hue (intensity-only coding left
    joints ambiguous); root-relative DEPTH is coded in the blob radius
    (sigma 2.5..6.5 px over z in [-600, 600] mm), so every label dimension
    is inferable from pixels and a trained model's MPJPE is meaningful.

    ``hue_mode="semantic"`` samples (``make_synthetic(hue_mode="semantic")``)
    render mirror-consistently: hue is shared within each flip pair and
    chirality is coded as an anisotropic blob tilted +-45 deg
    (``_semantic_hue_coding``). A horizontal mirror maps pixel offsets
    dx -> -dx, which together with tilt -> -tilt leaves the rotated-frame
    quadratic form invariant, so flip(render(pose)) == render(flip(pose))
    EXACTLY — the property real humans have and flip-test/flip-aug rely on
    (reference main/test.py:~30-70 flip averaging)."""
    h, w = sample["img_shape"]
    img = np.zeros((h, w, 3), np.float32)
    wmax = np.zeros((h, w), np.float32)  # per-pixel winning blob weight
    joints = sample["joint_img"]
    n = len(joints)
    semantic = sample.get("hue_mode", "index") == "semantic"
    for j, (x, y, z) in enumerate(joints):
        sj = sigma * (0.625 + max(-1.0, min(1.0, z / 600.0)) * 0.5) + 0.5
        r = int(4 * sj * (1.5 if semantic else 1.0))
        xi, yi = int(round(x)), int(round(y))
        x0, x1 = max(0, xi - r), min(w, xi + r + 1)
        y0, y1 = max(0, yi - r), min(h, yi + r + 1)
        if x0 >= x1 or y0 >= y1:
            continue
        ys = np.arange(y0, y1, dtype=np.float32)[:, None]
        xs = np.arange(x0, x1, dtype=np.float32)[None, :]
        if semantic:
            # Anisotropic Gaussian in a frame rotated by the chirality tilt:
            # major axis 1.45 sigma / minor 0.6 sigma (area ~ sigma^2).
            th = float(sample["tilt"][j])
            ct, st = np.cos(th), np.sin(th)
            u = ct * (xs - x) + st * (ys - y)
            v = -st * (xs - x) + ct * (ys - y)
            blob = np.exp(
                -(u**2 / (2 * (1.45 * sj) ** 2) + v**2 / (2 * (0.6 * sj) ** 2))
            )
            ang = 2 * np.pi * sample["hue_class"][j] / max(
                sample["hue_classes_total"], 1
            )
        else:
            blob = np.exp(-((xs - x) ** 2 + (ys - y) ** 2) / (2 * sj**2))
            if "hue_idx" in sample:  # hue_skeleton-unified index hues
                ang = 2 * np.pi * sample["hue_idx"][j] / max(
                    sample["hue_idx_total"], 1
                )
            else:
                ang = 2 * np.pi * j / max(n, 1)
        rgb = 128 + 120 * np.array(
            [np.cos(ang), np.cos(ang - 2 * np.pi / 3), np.cos(ang + 2 * np.pi / 3)]
        )
        # Max compositing: where blobs overlap, the locally-stronger blob
        # keeps its pure hue (additive blending clipped at 255 and turned
        # crowded regions into unidentifiable color soup — nets plateaued
        # at the center-guess loss on such frames).
        win = blob > wmax[y0:y1, x0:x1]
        np.copyto(img[y0:y1, x0:x1], blob[..., None] * rgb, where=win[..., None])
        np.maximum(wmax[y0:y1, x0:x1], blob, out=wmax[y0:y1, x0:x1])
    return np.clip(img, 0, 255).astype(np.uint8)


# Bump whenever render_synthetic_image's output changes for the same
# sample dict (compositing rule, hue formula, ...): the token is part of
# the materialize_synthetic cache key, so stale pre-existing JPEGs from an
# older renderer are never silently reused.
_RENDERER_VERSION = 2


def materialize_synthetic(
    samples: Sequence[dict], out_dir: str, quality: int = 95
) -> List[dict]:
    """Write each synthetic sample's rendered frame as a JPEG and point its
    ``img_path`` at it, so the loader exercises the PRODUCTION input path
    (fused libjpeg decode + C++ warp) instead of per-epoch Python
    rendering. Returns new sample dicts; idempotent (files are reused if
    already present)."""
    import hashlib

    import cv2

    os.makedirs(out_dir, exist_ok=True)
    out = []
    for s in samples:
        # Cache key hashes the CONTENT that determines the rendered pixels:
        # joints (incl. depth-coded radii), frame size, every renderer
        # parameter, and the renderer version — the same synth_seed at a
        # different img_size / JPEG quality / renderer revision would
        # otherwise reuse a stale JPEG whose blobs don't match the labels.
        key = hashlib.sha1(
            np.ascontiguousarray(s["joint_img"], np.float32).tobytes()
            + bytes(
                str((tuple(s["img_shape"]), quality, _RENDERER_VERSION,
                     s.get("hue_mode", "index"))),
                "ascii",
            )
            + (
                np.asarray(s["hue_class"], np.int32).tobytes()
                + np.asarray(s["tilt"], np.float32).tobytes()
                # The angle divisor: under hue_skeleton mapping hue_class
                # is a SUBSET of the hue space, so the total is not
                # derivable from the classes themselves.
                + str(s["hue_classes_total"]).encode("ascii")
                if s.get("hue_mode", "index") == "semantic"
                else b""
            )
            + (
                np.asarray(s["hue_idx"], np.int32).tobytes()
                + str(s["hue_idx_total"]).encode("ascii")
                if "hue_idx" in s
                else b""
            )
        ).hexdigest()[:12]
        path = os.path.join(out_dir, f"synth_{s['synth_seed']}_{key}.jpg")
        if not os.path.exists(path):
            img = render_synthetic_image(s)
            ok = cv2.imwrite(path, img[:, :, ::-1], [cv2.IMWRITE_JPEG_QUALITY, quality])
            assert ok, path
        out.append({**s, "img_path": path})
    return out


# ---------------------------------------------------------------------------


_LOADERS = {
    "Human36M": load_h36m,
    "MPII": load_mpii,
    "MSCOCO": load_mscoco,
}


def build_dataset(
    name: str,
    split: str,
    cfg: Config,
    data_root: Optional[str] = None,
    synthetic_size: int = 256,
    hue_skeleton: Optional[skeletons.Skeleton] = None,
) -> PoseDataset:
    """Factory mirroring the reference's dynamic dataset import
    (``common/base.py:_make_batch_generator`` exec/import dance).

    ``hue_skeleton`` (synthetic roots only): render this dataset's joints
    in another skeleton's hue space so a mixed trainset codes joint
    identity consistently across datasets, as real photos do (reference
    multi-dataset recipe, common/base.py trainset loop). Ignored with a
    warning when the skeletons are hue-incompatible (e.g. MSCOCO's
    eyes/ears have no H36M counterpart)."""
    import zlib

    skel = skeletons.get_skeleton(name)
    root = data_root or os.path.join("data", name)
    if data_root == "synthetic":
        # crc32, not hash(): str hash is randomized per process, which would
        # give every host/restart a different synthetic dataset.
        seed = zlib.crc32(f"{name}/{split}".encode()) % 2**31
        try:
            samples = make_synthetic(
                skel, synthetic_size, seed=seed, hue_skeleton=hue_skeleton
            )
        except ValueError as err:
            # make_synthetic's missing-joint validation (the only ValueError
            # reachable with default hue_mode): warn + fall back rather than
            # fail the CLI.
            warnings.warn(
                f"synthetic {name}: hue_skeleton unification failed ({err}); "
                "falling back to per-dataset index hues (joint-identity "
                "coding will differ across the mixed trainset)"
            )
            samples = make_synthetic(skel, synthetic_size, seed=seed)
    elif not os.path.exists(root):
        raise FileNotFoundError(
            f"dataset root {root!r} does not exist; pass --data_root pointing at "
            f"the {name} release, or --synthetic / data_root='synthetic' for "
            "blob data (refusing to silently substitute synthetic samples)"
        )
    elif name == "Human36M":
        samples = load_h36m(root, split, cfg.eval.protocol)
    else:
        samples = _LOADERS[name](root, split)
    return PoseDataset(name=name, skeleton=skel, samples=samples, is_train=split == "train")
