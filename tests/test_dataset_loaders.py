"""Annotation-file loaders exercised against on-disk fixture trees.

load_h36m / load_mpii / load_mscoco parse real JSON layouts (reference
data/*/\\*.py); these tests write minimal valid annotation trees to disk and
check geometry, joint counts, camera math, and end-to-end loader batches.
"""

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


def test_load_mpii(mpii_root):
    samples = load_mpii(mpii_root, "train")
    assert len(samples) == 4  # invisible sample dropped
    s = samples[0]
    assert s["joint_img"].shape == (16, 3)
    assert (s["joint_img"][:, 2] == 0).all()  # 2D: z = 0
    assert s["root_z"] == 0.0


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
