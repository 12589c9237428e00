"""Geometry + warp parity tests: cv2 is the oracle for the affine path
(SURVEY.md §7 hard part #1), numpy for camera/alignment math."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ihpr_tpu.config import DataConfig
from ihpr_tpu.data import geometry, skeletons
from ihpr_tpu.data.augment import make_patch_batch
from ihpr_tpu.data.warp import affine_warp_bilinear, gen_trans, trans_point2d


def cv2_gen_trans(c_x, c_y, src_w, src_h, dst_w, dst_h, scale, rot, inv=False):
    """The reference's matrix built with cv2 (oracle)."""

    def rot2d(pt, rad):
        sn, cs = np.sin(rad), np.cos(rad)
        return np.array([pt[0] * cs - pt[1] * sn, pt[0] * sn + pt[1] * cs])

    sw, sh = src_w * scale, src_h * scale
    rad = np.pi * rot / 180
    src_center = np.array([c_x, c_y], np.float32)
    src_down = rot2d(np.array([0, sh * 0.5]), rad)
    src_right = rot2d(np.array([sw * 0.5, 0]), rad)
    dst_center = np.array([dst_w * 0.5, dst_h * 0.5], np.float32)
    dst_down = np.array([0, dst_h * 0.5], np.float32)
    dst_right = np.array([dst_w * 0.5, 0], np.float32)
    src = np.stack([src_center, src_center + src_down, src_center + src_right]).astype(np.float32)
    dst = np.stack([dst_center, dst_center + dst_down, dst_center + dst_right]).astype(np.float32)
    if inv:
        src, dst = dst, src
    return cv2.getAffineTransform(src, dst)


@pytest.mark.parametrize("scale,rot", [(1.0, 0.0), (1.2, 25.0), (0.8, -40.0)])
def test_gen_trans_matches_cv2(scale, rot):
    ours = np.asarray(gen_trans(100.0, 80.0, 120.0, 160.0, 256, 256, scale, rot))
    ref = cv2_gen_trans(100.0, 80.0, 120.0, 160.0, 256, 256, scale, rot)
    np.testing.assert_allclose(ours, ref, atol=1e-4)
    ours_inv = np.asarray(gen_trans(100.0, 80.0, 120.0, 160.0, 256, 256, scale, rot, inv=True))
    ref_inv = cv2_gen_trans(100.0, 80.0, 120.0, 160.0, 256, 256, scale, rot, inv=True)
    np.testing.assert_allclose(ours_inv, ref_inv, atol=1e-4)


@pytest.mark.parametrize("scale,rot", [(1.0, 0.0), (1.1, 30.0)])
def test_warp_matches_cv2_warpaffine(scale, rot):
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (200, 180, 3)).astype(np.uint8)
    fwd = cv2_gen_trans(90.0, 100.0, 100.0, 100.0, 64, 64, scale, rot)
    ref = cv2.warpAffine(img, fwd, (64, 64), flags=cv2.INTER_LINEAR).astype(np.float32)

    inv = gen_trans(90.0, 100.0, 100.0, 100.0, 64, 64, scale, rot, inv=True)
    ours = np.asarray(
        affine_warp_bilinear(jnp.asarray(img[None]), inv[None], (64, 64))
    )[0]
    # cv2 INTER_LINEAR uses 5-bit fixed-point interpolation weights; allow
    # ~1 intensity step. Interior only: cv2's border handling differs by
    # half-pixel at the exact edge.
    diff = np.abs(ours[2:-2, 2:-2] - ref[2:-2, 2:-2])
    assert np.percentile(diff, 99) <= 1.5, diff.max()


def test_warp_point_roundtrip():
    fwd = gen_trans(90.0, 100.0, 140.0, 140.0, 256, 256, 1.1, 20.0)
    inv = gen_trans(90.0, 100.0, 140.0, 140.0, 256, 256, 1.1, 20.0, inv=True)
    pts = jnp.asarray([[50.0, 60.0], [90.0, 100.0], [10.0, 200.0]])
    there = trans_point2d(pts, fwd)
    back = trans_point2d(there, inv)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-3)


def test_cam_pixel_roundtrip():
    rng = np.random.RandomState(1)
    cam = rng.rand(20, 3) * 1000 + np.array([0, 0, 3000])
    f, c = (1145.0, 1143.8), (512.5, 515.4)
    px = geometry.cam2pixel(cam, f, c)
    back = geometry.pixel2cam(px, f, c)
    np.testing.assert_allclose(back, cam, rtol=1e-6)


def test_z_norm_roundtrip():
    z = np.linspace(-900, 900, 13)
    vox = geometry.z_mm_to_voxel(z, 2000, 64)
    assert vox.min() >= 0 and vox.max() <= 64
    np.testing.assert_allclose(geometry.z_voxel_to_mm(vox, 2000, 64), z, atol=1e-5)


def test_process_bbox_aspect_and_margin():
    bb = geometry.process_bbox(np.array([10.0, 20.0, 50.0, 100.0]), 500, 500, 1.0)
    # aspect forced to 1.0 -> w == h; margin 1.25
    assert abs(bb[2] - bb[3]) < 1e-4
    assert abs(bb[2] - 100 * 1.25) < 1.3  # ~h * margin (h was the long side)
    # degenerate bbox -> None
    assert geometry.process_bbox(np.array([10.0, 20.0, 0.0, 0.0]), 500, 500, 1.0) is None


def test_rigid_align_recovers_similarity():
    rng = np.random.RandomState(2)
    A = rng.randn(17, 3)
    ang = 0.7
    R = np.array(
        [
            [np.cos(ang), -np.sin(ang), 0],
            [np.sin(ang), np.cos(ang), 0],
            [0, 0, 1],
        ]
    )
    B = 1.7 * A @ R.T + np.array([5.0, -3.0, 2.0])
    aligned = geometry.rigid_align(A, B)
    np.testing.assert_allclose(aligned, B, atol=1e-8)


def test_warp_coord_to_original_roundtrip():
    """voxel -> original px must invert the patch construction."""
    bbox = np.array([50.0, 80.0, 128.0, 128.0], np.float32)
    input_shape, output_shape = (256, 256), (64, 64)
    c_x, c_y = bbox[0] + bbox[2] / 2, bbox[1] + bbox[3] / 2
    fwd = np.asarray(gen_trans(c_x, c_y, bbox[2], bbox[3], 256, 256, 1.0, 0.0))
    inv = np.asarray(gen_trans(c_x, c_y, bbox[2], bbox[3], 256, 256, 1.0, 0.0, inv=True))

    orig_pt = np.array([100.0, 120.0], np.float32)
    patch_xy = np.asarray(trans_point2d(jnp.asarray(orig_pt), jnp.asarray(fwd)))
    voxel = np.array(
        [patch_xy[0] / 256 * 64, patch_xy[1] / 256 * 64, 40.0], np.float32
    )
    out = geometry.warp_coord_to_original(
        voxel[None], inv, output_shape, input_shape, 64, 2000.0, root_z=4000.0
    )[0]
    np.testing.assert_allclose(out[:2], orig_pt, atol=1e-3)
    np.testing.assert_allclose(out[2], (40 / 64 * 2 - 1) * 1000 + 4000, atol=1e-3)


class TestMakePatchBatch:
    def _setup(self, use_aug=False):
        cfg = DataConfig(use_aug=use_aug)
        b, hc, wc = 2, 320, 320
        rng = np.random.RandomState(3)
        canvas = rng.randint(0, 255, (b, hc, wc, 3)).astype(np.uint8)
        origin = np.zeros((b, 2), np.float32)
        cscale = np.ones((b,), np.float32)
        bbox = np.tile(np.array([60.0, 60.0, 200.0, 200.0], np.float32), (b, 1))
        joints = np.zeros((b, 18, 3), np.float32)
        joints[:, :, 0] = rng.uniform(80, 240, (b, 18))
        joints[:, :, 1] = rng.uniform(80, 240, (b, 18))
        joints[:, :, 2] = rng.uniform(-500, 500, (b, 18))
        vis = np.ones((b, 18), np.float32)
        return cfg, canvas, origin, cscale, bbox, joints, vis

    def test_eval_mode_identity_geometry(self):
        cfg, canvas, origin, cscale, bbox, joints, vis = self._setup()
        perm = skeletons.H36M.flip_permutation()
        out = make_patch_batch(
            jnp.asarray(canvas), jnp.asarray(origin), jnp.asarray(cscale),
            jnp.asarray(bbox), jnp.asarray(joints), jnp.asarray(vis),
            jnp.ones((2,)), perm, cfg, rng=None, train=False,
        )
        assert out.image.shape == (2, 256, 256, 3)
        assert out.joint_img.shape == (2, 18, 3)
        # joint x=60 (bbox left edge) -> patch 0 -> voxel 0; center -> 32
        cx = bbox[0, 0] + bbox[0, 2] / 2
        j = np.asarray(out.joint_img)
        expected_x = (joints[0, :, 0] - bbox[0, 0]) / bbox[0, 2] * 64
        np.testing.assert_allclose(j[0, :, 0], expected_x, atol=1e-3)
        expected_z = joints[0, :, 2] / 1000 * 32 + 32
        np.testing.assert_allclose(j[0, :, 2], expected_z, atol=1e-3)
        assert np.all(np.asarray(out.joint_vis) == 1.0)

    def test_patch_pixels_match_cv2(self):
        cfg, canvas, origin, cscale, bbox, joints, vis = self._setup()
        perm = skeletons.H36M.flip_permutation()
        out = make_patch_batch(
            jnp.asarray(canvas), jnp.asarray(origin), jnp.asarray(cscale),
            jnp.asarray(bbox), jnp.asarray(joints), jnp.asarray(vis),
            jnp.ones((2,)), perm, cfg, rng=None, train=False,
        )
        c_x = bbox[0, 0] + bbox[0, 2] / 2
        c_y = bbox[0, 1] + bbox[0, 3] / 2
        fwd = cv2_gen_trans(c_x, c_y, bbox[0, 2], bbox[0, 3], 256, 256, 1.0, 0.0)
        ref = cv2.warpAffine(canvas[0], fwd, (256, 256)).astype(np.float32)
        ref = (ref - np.array(cfg.pixel_mean) * 255) / (np.array(cfg.pixel_std) * 255)
        diff = np.abs(np.asarray(out.image)[0, 2:-2, 2:-2] - ref[2:-2, 2:-2])
        assert np.percentile(diff, 99) < 0.05  # normalized units

    def test_train_aug_deterministic_and_flip_consistent(self):
        cfg, canvas, origin, cscale, bbox, joints, vis = self._setup(use_aug=True)
        perm = skeletons.H36M.flip_permutation()
        args = (
            jnp.asarray(canvas), jnp.asarray(origin), jnp.asarray(cscale),
            jnp.asarray(bbox), jnp.asarray(joints), jnp.asarray(vis),
            jnp.ones((2,)),
        )
        out1 = make_patch_batch(*args, perm, cfg, rng=jax.random.key(7), train=True)
        out2 = make_patch_batch(*args, perm, cfg, rng=jax.random.key(7), train=True)
        np.testing.assert_array_equal(np.asarray(out1.image), np.asarray(out2.image))
        np.testing.assert_array_equal(
            np.asarray(out1.joint_img), np.asarray(out2.joint_img)
        )
        out3 = make_patch_batch(*args, perm, cfg, rng=jax.random.key(8), train=True)
        assert not np.allclose(np.asarray(out1.joint_img), np.asarray(out3.joint_img))
