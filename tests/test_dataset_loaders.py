"""Annotation-file loaders exercised against on-disk fixture trees.

load_h36m / load_mpii / load_mscoco parse real JSON layouts (reference
data/*/\\*.py); these tests write minimal valid annotation trees to disk and
check geometry, joint counts, camera math, and end-to-end loader batches.
"""

import json
import os

import numpy as np
import pytest

from ihpr_tpu.config import get_config
from ihpr_tpu.data import geometry, skeletons
from ihpr_tpu.data.datasets import (
    H36M_ACTIONS,
    build_dataset,
    load_h36m,
    load_mpii,
    load_mscoco,
)


def _write(path, obj):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(obj, f)


@pytest.fixture()
def h36m_root(tmp_path):
    root = str(tmp_path / "Human36M")
    rng = np.random.RandomState(0)
    for subj in (9, 11):  # protocol-2 test subjects
        images, annotations = [], []
        joints_3d = {}
        cam = {
            "1": dict(
                R=np.eye(3).tolist(),
                t=[0.0, 0.0, 0.0],
                f=[1145.0, 1143.0],
                c=[512.0, 515.0],
            )
        }
        for i in range(4):
            img_id = subj * 100 + i
            images.append(
                dict(
                    id=img_id,
                    file_name=f"s{subj}_{i}.jpg",
                    width=1000,
                    height=1002,
                    cam_idx=1,
                    frame_idx=i,
                    action_idx=2 + (i % 3),
                    subaction_idx=1,
                )
            )
            annotations.append(
                dict(id=img_id, image_id=img_id, bbox=[300.0, 300.0, 350.0, 420.0])
            )
            # 17 world-space joints ~4m from the camera
            jw = rng.uniform(-400, 400, (17, 3)) + np.array([0, 0, 4000.0])
            joints_3d.setdefault(str(2 + (i % 3)), {}).setdefault("1", {})[str(i)] = (
                jw.tolist()
            )
        _write(f"{root}/annotations/Human36M_subject{subj}_data.json",
               dict(images=images, annotations=annotations))
        _write(f"{root}/annotations/Human36M_subject{subj}_camera.json", cam)
        _write(f"{root}/annotations/Human36M_subject{subj}_joint_3d.json", joints_3d)
    return root


def test_load_h36m(h36m_root):
    samples = load_h36m(h36m_root, "test", protocol=2, sampling=1)
    assert len(samples) == 8  # S9 + S11, 4 frames each
    s = samples[0]
    assert s["joint_img"].shape == (18, 3)  # 17 + Thorax
    assert s["action"] in H36M_ACTIONS
    # pelvis z is root-relative 0
    assert abs(s["joint_img"][skeletons.H36M.root_idx, 2]) < 1e-3
    # pixel coords invert back through pixel2cam to ~camera depth range
    px = s["joint_img"].copy()
    px[:, 2] += s["root_z"]
    cam = geometry.pixel2cam(px, s["f"], s["c"])
    assert 3000 < cam[:, 2].mean() < 5000
    # thorax is the shoulder midpoint (reference joint construction)
    np.testing.assert_allclose(
        cam[17], (cam[11] + cam[14]) / 2.0, atol=1e-2
    )
    # subsampling honored
    assert len(load_h36m(h36m_root, "test", protocol=2, sampling=2)) == 4
    # protocol 1 = S11 only
    assert len(load_h36m(h36m_root, "test", protocol=1, sampling=1)) == 4


@pytest.fixture()
def mpii_root(tmp_path):
    root = str(tmp_path / "MPII")
    rng = np.random.RandomState(1)
    images, annotations = [], []
    for i in range(5):
        images.append(dict(id=i, file_name=f"{i:09d}.jpg", width=800, height=600))
        kpts = np.zeros((16, 3))
        kpts[:, 0] = rng.uniform(100, 700, 16)
        kpts[:, 1] = rng.uniform(100, 500, 16)
        kpts[:, 2] = 1
        if i == 4:
            kpts[:, 2] = 0  # fully invisible -> dropped
        annotations.append(
            dict(id=i, image_id=i, bbox=[100.0, 100.0, 300.0, 400.0],
                 keypoints=kpts.ravel().tolist())
        )
    _write(f"{root}/annotations/train.json", dict(images=images, annotations=annotations))
    return root


def test_load_mpii(mpii_root):
    samples = load_mpii(mpii_root, "train")
    assert len(samples) == 4  # invisible sample dropped
    s = samples[0]
    assert s["joint_img"].shape == (16, 3)
    assert (s["joint_img"][:, 2] == 0).all()  # 2D: z = 0
    assert s["root_z"] == 0.0


@pytest.fixture()
def coco_root(tmp_path):
    root = str(tmp_path / "MSCOCO")
    rng = np.random.RandomState(2)
    images, annotations = [], []
    for i in range(4):
        images.append(dict(id=i, file_name=f"{i:012d}.jpg", width=640, height=480))
        kpts = np.zeros((17, 3))
        kpts[:, 0] = rng.uniform(50, 600, 17)
        kpts[:, 1] = rng.uniform(50, 430, 17)
        kpts[:, 2] = 2
        annotations.append(
            dict(id=i, image_id=i, bbox=[50.0, 50.0, 200.0, 300.0],
                 keypoints=kpts.ravel().tolist(), num_keypoints=17,
                 iscrowd=1 if i == 3 else 0, area=60000.0)
        )
    _write(
        f"{root}/annotations/person_keypoints_train2017.json",
        dict(images=images, annotations=annotations),
    )
    return root


def test_load_mscoco(coco_root):
    samples = load_mscoco(coco_root, "train2017")
    assert len(samples) == 3  # crowd dropped
    assert samples[0]["joint_img"].shape == (17, 3)
    assert samples[0]["area"] == 60000.0


def test_build_dataset_raises_on_missing_root(tmp_path):
    cfg = get_config("h36m3d_r50")
    with pytest.raises(FileNotFoundError):
        build_dataset("Human36M", "train", cfg, data_root=str(tmp_path / "nope"))


def test_h36m_loader_through_batchloader(h36m_root, monkeypatch):
    """Full path: json tree -> BatchLoader host-warp batch (images absent on
    disk -> patch loading must fail loudly, so we patch the image reader)."""
    from ihpr_tpu.config import get_config
    from ihpr_tpu.data.datasets import PoseDataset
    from ihpr_tpu.data import pipeline as pl

    cfg = get_config("h36m3d_r50")
    samples = load_h36m(h36m_root, "test", protocol=2, sampling=1)
    ds = PoseDataset("Human36M", skeletons.H36M, samples, is_train=True)

    rng = np.random.RandomState(3)

    def fake_load(sample):
        h, w = sample["img_shape"]
        return rng.randint(0, 255, (h, w, 3)).astype(np.uint8)

    monkeypatch.setattr(pl, "_load_image", fake_load)
    from ihpr_tpu.data import native

    monkeypatch.setattr(native, "has_jpeg", lambda: False)  # no .jpg on disk
    loader = pl.BatchLoader([ds], cfg, 4, train=True, num_workers=0)
    hb = next(loader.epoch(0))
    assert hb.patch.shape == (4, 256, 256, 3)
    assert np.isfinite(hb.joint_img).all()
    assert hb.joints_have_depth.all()


def test_make_synthetic_easy_depth_and_materialize(tmp_path):
    """easy_depth codes z as a deterministic function of y (accuracy-probe
    mode; y not x since round 3 so the cue is mirror-invariant and
    flip-test/flip-aug stay label-consistent); materialize_synthetic writes
    decodable JPEGs, points img_path at them, and is idempotent."""
    import os

    from ihpr_tpu.data.datasets import (
        make_synthetic,
        materialize_synthetic,
        render_synthetic_image,
    )

    samples = make_synthetic(skeletons.H36M, 3, seed=7, img_size=160, easy_depth=True)
    for s in samples:
        j = s["joint_img"]
        expected = ((j[:, 1] / 160.0) - 0.5) * 1100.0
        np.testing.assert_allclose(j[:, 2], expected, atol=1e-4)

    out = materialize_synthetic(samples, str(tmp_path))
    mtimes = {}
    for s0, s1 in zip(samples, out):
        assert os.path.exists(s1["img_path"])
        mtimes[s1["img_path"]] = os.path.getmtime(s1["img_path"])
        import cv2

        img = cv2.imread(s1["img_path"])  # BGR
        rendered = render_synthetic_image(s0)
        assert img.shape == rendered.shape
        # JPEG is lossy; blobs must still land where they were rendered
        assert abs(float(img[..., ::-1].mean()) - float(rendered.mean())) < 2.0
    out2 = materialize_synthetic(samples, str(tmp_path))  # idempotent: reuse
    for s in out2:
        assert os.path.getmtime(s["img_path"]) == mtimes[s["img_path"]]


def test_render_synthetic_max_compositing_keeps_hues():
    """Overlapping blobs must keep the locally-stronger blob's pure hue
    (additive blending made crowded frames unlearnable)."""
    from ihpr_tpu.data.datasets import make_synthetic, render_synthetic_image

    s = make_synthetic(skeletons.H36M, 1, seed=11, img_size=200)[0]
    img = render_synthetic_image(s)
    # every joint center shows its own color => len(set) == joint count
    cols = set()
    for x, y, _ in s["joint_img"]:
        cols.add(tuple(img[int(round(y)), int(round(x))]))
    assert len(cols) == len(s["joint_img"])
    assert img.max() <= 255 and img.min() >= 0
