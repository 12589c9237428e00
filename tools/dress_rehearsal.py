#!/usr/bin/env python
"""Real-data dress rehearsal: materialize an on-disk dataset tree in the
EXACT upstream annotation layout, validate it, and drive the production
CLIs against it.

No real Human3.6M/MPII release exists in this environment, so the
CLI -> validate_data -> load_h36m/load_mpii -> Trainer/Tester path has
only ever been exercised via in-memory synthetic datasets
(``--synthetic``). This tool closes that gap (VERDICT r3 task 7): it
writes a tree that is schema-identical to the upstream preprocessed
release (reference ``data/Human36M/Human36M.py:~load_data`` /
``data/MPII/MPII.py``) — per-subject
``annotations/Human36M_subject{N}_{data,camera,joint_3d}.json`` with
world-space joints + camera extrinsics, COCO-style MPII ``train.json``,
and real JPEG frames under ``images/`` whose rendered blobs are
geometrically consistent with the annotations (same renderer as the
accuracy probes, driven through the SAME world->camera->pixel math the
loader applies, including the loader's Thorax synthesis) — then runs
the preflight validator and, with ``--run``, the real ``train.py`` /
``test.py`` CLIs on it.

    python tools/dress_rehearsal.py --root /tmp/dress_tree          # build + validate
    python tools/dress_rehearsal.py --root /tmp/dress_tree --run    # + CLI smoke (TPU)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _write_json(path: str, obj) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(obj, f)


def _h36m_subject(root: str, subj: int, n_frames: int, img_size: int,
                  rng: np.ndarray) -> int:
    """Write one subject's three upstream annotation files + JPEG frames.

    Pose generation mirrors make_synthetic (blob positions in pixel space,
    depth coded off the mirror-invariant y coordinate) but is INVERTED to
    world space so the tree carries what the upstream release carries:
    17-joint world-mm poses + camera (R, t, f, c). Rendering then REPLAYS
    the loader's own math (world2cam -> thorax synthesis -> cam2pixel) so
    the pixels match what load_h36m will reconstruct, Thorax included."""
    import cv2

    from ihpr_tpu.data import geometry, skeletons
    from ihpr_tpu.data.datasets import H36M_ACTIONS, render_synthetic_image

    skel = skeletons.H36M
    f = np.array([1100.0, 1100.0], np.float32)
    c = np.array([img_size / 2.0, img_size / 2.0], np.float32)
    # Non-trivial extrinsics so world2cam is actually exercised: a fixed
    # small rotation + translation per subject.
    th = 0.05 * subj
    R = np.array(
        [[np.cos(th), -np.sin(th), 0.0], [np.sin(th), np.cos(th), 0.0],
         [0.0, 0.0, 1.0]],
        np.float64,
    )
    t = np.array([10.0 * subj, -5.0 * subj, 0.0], np.float64)
    root_z = 4000.0

    images, annotations = [], []
    joint_3d: dict = {}
    for i in range(n_frames):
        action_idx = 2 + (i % len(H36M_ACTIONS))
        # 17 base joints (Thorax synthesized by the loader): blob centers in
        # pixel space, depth from y (mirror-invariant, as the probes use).
        center = rng.uniform(img_size * 0.35, img_size * 0.65, 2)
        xy = np.clip(center + rng.randn(17, 2) * rng.uniform(35, 70), 8, img_size - 8)
        # The loader re-references depth to the PELVIS's own z, so a coded
        # span of +-s becomes up to 2s pelvis-relative; 700/2 keeps every
        # joint inside the +-1000 mm bbox_3d_shape volume.
        z_rel = ((xy[:, 1:2] / img_size) - 0.5) * 700.0
        px = np.concatenate([xy, z_rel + root_z], 1)
        jc17 = geometry.pixel2cam(px, f, c)  # camera mm
        jw17 = (jc17 - t) @ np.linalg.inv(R).T  # invert world2cam

        # Replay the loader: world -> cam -> +Thorax -> pixel.
        jc = geometry.world2cam(jw17.astype(np.float32), R.astype(np.float32),
                                t.astype(np.float32))
        thorax = (jc[11] + jc[14]) * 0.5
        jc18 = np.concatenate([jc, thorax[None]], 0)
        jp18 = geometry.cam2pixel(jc18, f, c)
        joint_img = jp18.copy()
        joint_img[:, 2] = jc18[:, 2] - float(jc18[skel.root_idx, 2])

        file_name = f"s_{subj:02d}_act_{action_idx:02d}_{i:06d}.jpg"
        img_id = subj * 1000000 + i
        frame = render_synthetic_image(
            dict(joint_img=joint_img.astype(np.float32),
                 img_shape=(img_size, img_size))
        )
        out_path = os.path.join(root, "images", file_name)
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        ok = cv2.imwrite(out_path, frame[:, :, ::-1],
                         [cv2.IMWRITE_JPEG_QUALITY, 95])
        assert ok, out_path

        images.append(
            dict(id=img_id, file_name=file_name, width=img_size, height=img_size,
                 cam_idx=1, frame_idx=i, action_idx=action_idx, subaction_idx=1,
                 action_name=H36M_ACTIONS[action_idx - 2])
        )
        x0, y0 = jp18[:, 0].min(), jp18[:, 1].min()
        w, h = jp18[:, 0].max() - x0, jp18[:, 1].max() - y0
        annotations.append(
            dict(id=img_id, image_id=img_id,
                 bbox=[float(x0 - 0.1 * w), float(y0 - 0.1 * h),
                       float(1.2 * w), float(1.2 * h)])
        )
        joint_3d.setdefault(str(action_idx), {}).setdefault("1", {})[str(i)] = (
            jw17.astype(np.float64).tolist()
        )

    base = os.path.join(root, "annotations", f"Human36M_subject{subj}_")
    _write_json(base + "data.json", dict(images=images, annotations=annotations))
    _write_json(
        base + "camera.json",
        {"1": dict(R=R.tolist(), t=t.tolist(), f=f.tolist(), c=c.tolist())},
    )
    _write_json(base + "joint_3d.json", joint_3d)
    return n_frames


def _mpii_tree(root: str, n: int, img_size: int, rng) -> int:
    """COCO-format MPII train.json + rendered 16-joint 2D frames."""
    import cv2

    from ihpr_tpu.data import skeletons
    from ihpr_tpu.data.datasets import render_synthetic_image

    skel = skeletons.MPII
    images, annotations = [], []
    for i in range(n):
        center = rng.uniform(img_size * 0.35, img_size * 0.65, 2)
        xy = np.clip(center + rng.randn(skel.joint_num, 2) * rng.uniform(35, 70),
                     8, img_size - 8)
        joint_img = np.concatenate([xy, np.zeros((skel.joint_num, 1))], 1)
        file_name = f"mpii_{i:09d}.jpg"
        frame = render_synthetic_image(
            dict(joint_img=joint_img.astype(np.float32),
                 img_shape=(img_size, img_size))
        )
        out_path = os.path.join(root, "images", file_name)
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        ok = cv2.imwrite(out_path, frame[:, :, ::-1],
                         [cv2.IMWRITE_JPEG_QUALITY, 95])
        assert ok, out_path
        images.append(dict(id=i, file_name=file_name, width=img_size,
                           height=img_size))
        kpts = np.concatenate([xy, np.ones((skel.joint_num, 1))], 1)
        x0, y0 = xy[:, 0].min(), xy[:, 1].min()
        w, h = xy[:, 0].max() - x0, xy[:, 1].max() - y0
        annotations.append(
            dict(id=i, image_id=i,
                 bbox=[float(x0 - 0.1 * w), float(y0 - 0.1 * h),
                       float(1.2 * w), float(1.2 * h)],
                 keypoints=kpts.ravel().tolist())
        )
    _write_json(os.path.join(root, "annotations", "train.json"),
                dict(images=images, annotations=annotations))
    return n


def build_tree(root: str, frames_train: int, frames_test: int,
               img_size: int) -> None:
    from ihpr_tpu.data.datasets import H36M_TEST_SUBJECTS, H36M_TRAIN_SUBJECTS

    rng = np.random.RandomState(7)
    total = 0
    for subj in H36M_TRAIN_SUBJECTS[2]:
        total += _h36m_subject(root, subj, frames_train, img_size, rng)
    for subj in H36M_TEST_SUBJECTS[2]:
        total += _h36m_subject(root, subj, frames_test, img_size, rng)
    total += _mpii_tree(root, max(frames_train // 2, 64), img_size, rng)
    print(f"dress_rehearsal: wrote {total} frames under {root}", flush=True)


def validate(root: str) -> None:
    from tools.validate_data import validate_h36m, validate_mpii

    for split in ("train", "test"):
        rep = validate_h36m(root, split, protocol=2, check_images=8)
        rc = rep.dump()
        assert rc == 0, f"validate_data FAILED for Human36M {split}"
    rep = validate_mpii(root, "train", check_images=8)
    rc = rep.dump()
    assert rc == 0, "validate_data FAILED for MPII train"
    print("dress_rehearsal: validate_data OK (H36M train/test + MPII)", flush=True)


def run_clis(root: str, out_dir: str, steps: int) -> None:
    env = dict(os.environ, PYTHONUNBUFFERED="1")
    train_cmd = [
        sys.executable, os.path.join(REPO, "train.py"), "--config", "h36m3d_r50",
        "--data_root", root, "--steps", str(steps), "--end_epoch", "1",
        "--num_workers", "8", "--output_dir", out_dir,
    ]
    print("dress_rehearsal: RUN", " ".join(train_cmd), flush=True)
    subprocess.run(train_cmd, check=True, env=env, timeout=3600)
    test_cmd = [
        sys.executable, os.path.join(REPO, "test.py"), "--config", "h36m3d_r50",
        "--data_root", root, "--num_workers", "8", "--output_dir", out_dir,
    ]
    print("dress_rehearsal: RUN", " ".join(test_cmd), flush=True)
    subprocess.run(test_cmd, check=True, env=env, timeout=3600)
    print("dress_rehearsal: CLI train+test PASS on the materialized tree",
          flush=True)


def main():
    from ihpr_tpu.utils.shutdown import install_graceful_shutdown

    install_graceful_shutdown()
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/dress_tree")
    # 130 per train subject -> 26 loaded each (sampling=5) = 130 train
    # samples >= the flagship global batch 128 -> >=1 step/epoch.
    ap.add_argument("--frames_train", type=int, default=130)
    # 128 per test subject -> 2 loaded each (sampling=64).
    ap.add_argument("--frames_test", type=int, default=128)
    ap.add_argument("--img_size", type=int, default=400)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--run", action="store_true",
                    help="drive train.py/test.py on the tree (TPU)")
    ap.add_argument("--output_dir", default="/tmp/dress_out")
    args = ap.parse_args()

    if not os.path.exists(os.path.join(args.root, "annotations")):
        build_tree(args.root, args.frames_train, args.frames_test, args.img_size)
    else:
        print(f"dress_rehearsal: reusing existing tree at {args.root}", flush=True)
    validate(args.root)
    if args.run:
        run_clis(args.root, args.output_dir, args.steps)


if __name__ == "__main__":
    main()
