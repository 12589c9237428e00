"""Native host-warp library: cv2 parity + pipeline-path equivalence."""

import cv2
import numpy as np
import pytest

from ihpr_tpu.config import DataConfig, ModelConfig, OptimConfig, get_config
from ihpr_tpu.data import native, skeletons
from ihpr_tpu.data.datasets import PoseDataset, make_synthetic
from ihpr_tpu.data.pipeline import BatchLoader, WarpedHostBatch
from ihpr_tpu.data.warp import gen_trans, gen_trans_np

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native warp library unavailable"
)


def test_gen_trans_np_matches_jnp():
    rng = np.random.RandomState(0)
    for _ in range(5):
        args = (
            rng.uniform(50, 200),
            rng.uniform(50, 200),
            rng.uniform(80, 250),
            rng.uniform(80, 250),
            256,
            256,
            rng.uniform(0.8, 1.3),
            rng.uniform(-45, 45),
        )
        for inv in (False, True):
            np.testing.assert_allclose(
                gen_trans_np(*args, inv=inv),
                np.asarray(gen_trans(*args, inv=inv)),
                rtol=1e-4,
                atol=1e-3,
            )


@pytest.mark.parametrize("rot,flip", [(0.0, 0), (25.0, 0), (-40.0, 1)])
def test_native_warp_matches_cv2(rot, flip):
    rng = np.random.RandomState(1)
    img = rng.randint(0, 256, (200, 180, 3)).astype(np.uint8)
    c_x, c_y, bw, bh = 90.0, 100.0, 120.0, 120.0
    if flip:
        src = img[:, ::-1]
        c_x_m = img.shape[1] - 1.0 - c_x
    else:
        src = img
        c_x_m = c_x
    fwd = gen_trans_np(c_x_m, c_y, bw, bh, 64, 64, 1.0, rot)
    ref = cv2.warpAffine(
        np.ascontiguousarray(src), fwd, (64, 64), flags=cv2.INTER_LINEAR
    ).astype(np.float32)

    inv = gen_trans_np(c_x_m, c_y, bw, bh, 64, 64, 1.0, rot, inv=True)
    ours = native.warp_batch([img], inv[None], np.asarray([flip]), 64, 64)[0].astype(
        np.float32
    )
    diff = np.abs(ours[2:-2, 2:-2] - ref[2:-2, 2:-2])
    # cv2 uses 5-bit fixed-point interp weights; we use float + round.
    assert np.percentile(diff, 99) <= 2.0, diff.max()


def test_host_warp_loader_matches_device_path_no_aug():
    cfg = get_config("h36m3d_r50").replace(
        model=ModelConfig(resnet_type=18),
        data=DataConfig(trainset=("Human36M",), use_aug=False, depth_dim=16,
                        input_shape=(64, 64), output_shape=(16, 16)),
        optim=OptimConfig(batch_size_per_device=4),
    )
    skel = skeletons.H36M
    ds = PoseDataset("Human36M", skel, make_synthetic(skel, 8, seed=3, img_size=200), True)
    host = BatchLoader([ds], cfg, 4, train=True, num_workers=0, host_warp=True)
    dev = BatchLoader([ds], cfg, 4, train=True, num_workers=0, host_warp=False)
    hb = next(host.epoch(0))
    db = next(dev.epoch(0))
    assert isinstance(hb, WarpedHostBatch)

    # joints computed by the two paths must agree
    import jax.numpy as jnp

    from ihpr_tpu.data.augment import make_patch_batch

    patch = make_patch_batch(
        jnp.asarray(db.canvas), jnp.asarray(db.canvas_origin),
        jnp.asarray(db.canvas_scale), jnp.asarray(db.bbox),
        jnp.asarray(db.joints), jnp.asarray(db.joint_vis),
        jnp.asarray(db.joints_have_depth), skel.flip_permutation(),
        cfg.data, rng=None, train=False,
    )
    np.testing.assert_allclose(hb.joint_img, np.asarray(patch.joint_img), atol=1e-2)
    np.testing.assert_array_equal(hb.joint_vis, np.asarray(patch.joint_vis))

    # warped pixels: host path warps from the ORIGINAL image, device path
    # from the translation-only canvas -> identical samples up to uint8
    # rounding (host) vs float (device).
    img_dev = np.asarray(patch.image)
    from ihpr_tpu.data.augment import finalize_patch

    img_host = np.asarray(
        finalize_patch(jnp.asarray(hb.patch), jnp.asarray(hb.color_scale), cfg.data)
    )
    diff = np.abs(img_host - img_dev)
    assert np.percentile(diff, 99) < 0.05, diff.max()


def test_host_warp_aug_determinism():
    cfg = get_config("h36m3d_r50").replace(
        data=DataConfig(trainset=("Human36M",), use_aug=True, depth_dim=16,
                        input_shape=(64, 64), output_shape=(16, 16)),
    )
    skel = skeletons.H36M
    ds = PoseDataset("Human36M", skel, make_synthetic(skel, 8, seed=4, img_size=200), True)
    l1 = BatchLoader([ds], cfg, 4, train=True, num_workers=0, host_warp=True, seed=7)
    l2 = BatchLoader([ds], cfg, 4, train=True, num_workers=0, host_warp=True, seed=7)
    b1, b2 = next(l1.epoch(3)), next(l2.epoch(3))
    np.testing.assert_array_equal(b1.patch, b2.patch)
    np.testing.assert_array_equal(b1.joint_img, b2.joint_img)
    # different epoch -> different augmentation
    b3 = next(l1.epoch(4))
    assert not np.array_equal(b1.patch, b3.patch)


@pytest.mark.skipif(not native.has_jpeg(), reason="libjpeg not compiled in")
def test_fused_jpeg_decode_warp(tmp_path):
    """decode_and_warp_batch == cv2 decode + warp (same libjpeg underneath)."""
    rng = np.random.RandomState(5)
    img = rng.randint(0, 255, (200, 180, 3)).astype(np.uint8)
    path = str(tmp_path / "t.jpg")
    cv2.imwrite(path, img[:, :, ::-1], [cv2.IMWRITE_JPEG_QUALITY, 95])
    decoded = cv2.imread(path)[:, :, ::-1]  # RGB, post-jpeg-loss

    inv = gen_trans_np(90.0, 100.0, 120.0, 120.0, 64, 64, 1.0, 15.0, inv=True)
    ref = native.warp_batch([decoded], inv[None], np.zeros(1, np.int32), 64, 64)[0]

    with open(path, "rb") as f:
        blob = f.read()
    fused, ok = native.decode_and_warp_batch([blob], inv[None], np.zeros(1, np.int32), 64, 64)
    assert ok.all()
    diff = np.abs(fused[0].astype(np.int32) - ref.astype(np.int32))
    assert np.percentile(diff, 99) <= 2, diff.max()

    # corrupt jpeg -> ok=False, zero patch
    bad, okb = native.decode_and_warp_batch([b"not a jpeg"], inv[None], np.zeros(1, np.int32), 64, 64)
    assert not okb.any() and bad.sum() == 0


@pytest.mark.skipif(not native.has_jpeg(), reason="libjpeg not compiled in")
def test_fused_jpeg_roi_decode_exact(tmp_path):
    """The fused path decodes only the warp's source-row window
    (scanline-skip + early-abort) — must stay BIT-exact vs decoding the
    whole frame and warping, for crops anywhere in the frame, rotated
    and flipped, and produce an all-zero ok patch for mappings entirely
    outside the frame."""
    rng = np.random.RandomState(7)
    img = rng.randint(0, 255, (320, 300, 3)).astype(np.uint8)
    path = str(tmp_path / "t.jpg")
    cv2.imwrite(path, img[:, :, ::-1], [cv2.IMWRITE_JPEG_QUALITY, 92])
    with open(path, "rb") as f:
        blob = f.read()
    decoded = cv2.imread(path)[:, :, ::-1].copy()

    cases = [
        (150.0, 40.0, 100.0, 100.0, 0.0, 0),     # top edge
        (150.0, 280.0, 100.0, 100.0, 20.0, 1),   # bottom edge, rot+flip
        (150.0, 160.0, 120.0, 120.0, -35.0, 0),  # center, rotated
        (150.0, 160.0, 600.0, 600.0, 10.0, 0),   # box larger than frame
    ]
    for cx, cy, bw, bh, rot, flip in cases:
        inv = gen_trans_np(cx, cy, bw, bh, 64, 64, 1.0, rot, inv=True)
        fl = np.asarray([flip], np.int32)
        fused, ok = native.decode_and_warp_batch([blob], inv[None], fl, 64, 64)
        ref = native.warp_batch([decoded], inv[None], fl, 64, 64)
        assert ok.all()
        np.testing.assert_array_equal(
            fused[0], ref[0], err_msg=f"case cx={cx} cy={cy} rot={rot} flip={flip}"
        )

    # progressive JPEG: skip/crop take a different libjpeg path (whole-
    # image coefficient buffering) — must stay exact there too
    import io

    from PIL import Image

    pbuf = io.BytesIO()
    Image.fromarray(img).save(pbuf, "JPEG", quality=92, progressive=True)
    pblob = pbuf.getvalue()
    pdecoded = np.asarray(Image.open(io.BytesIO(pblob))).copy()
    inv = gen_trans_np(150.0, 160.0, 110.0, 110.0, 64, 64, 1.0, -25.0, inv=True)
    fl = np.asarray([1], np.int32)
    fused, okp = native.decode_and_warp_batch([pblob], inv[None], fl, 64, 64)
    ref = native.warp_batch([pdecoded], inv[None], fl, 64, 64)
    assert okp.all()
    np.testing.assert_array_equal(fused[0], ref[0])

    # mapping entirely above the frame -> zero patch, ok (not corrupt)
    inv_out = gen_trans_np(150.0, -500.0, 80.0, 80.0, 64, 64, 1.0, 0.0, inv=True)
    z, okz = native.decode_and_warp_batch([blob], inv_out[None], np.zeros(1, np.int32), 64, 64)
    assert okz.all() and z.sum() == 0
    # and entirely below
    inv_out2 = gen_trans_np(150.0, 900.0, 80.0, 80.0, 64, 64, 1.0, 0.0, inv=True)
    z2, okz2 = native.decode_and_warp_batch([blob], inv_out2[None], np.zeros(1, np.int32), 64, 64)
    assert okz2.all() and z2.sum() == 0


@pytest.mark.skipif(not native.has_jpeg(), reason="libjpeg not compiled in")
def test_ijg_fallback_builds_and_matches(tmp_path):
    """warp.cc must keep building on classic IJG libjpeg (no
    jpeg_skip_scanlines / jpeg_crop_scanline). Compile a probe .so with
    -DIHPR_FORCE_NO_JPEG_ROI and check its decode+warp equals the ROI
    build bit-for-bit."""
    import ctypes
    import os
    import subprocess

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    src = os.path.join(root, "native", "warp.cc")
    so = str(tmp_path / "libihprwarp_noroi.so")
    # Same flags as build.sh: without -march=native the probe would take
    # the scalar interior path, which rounds ±1 LSB differently from the
    # AVX2 gather kernel and breaks the bit-equality check below.
    subprocess.run(
        ["g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
         "-DIHPR_HAVE_JPEG", "-DIHPR_FORCE_NO_JPEG_ROI", "-o", so, src,
         "-ljpeg"],
        check=True, capture_output=True,
    )
    lib = ctypes.CDLL(so)
    assert lib.has_jpeg()

    rng = np.random.RandomState(11)
    img = rng.randint(0, 255, (240, 220, 3)).astype(np.uint8)
    path = str(tmp_path / "t.jpg")
    cv2.imwrite(path, img[:, :, ::-1], [cv2.IMWRITE_JPEG_QUALITY, 90])
    with open(path, "rb") as f:
        blob = f.read()
    inv = gen_trans_np(110.0, 60.0, 90.0, 90.0, 64, 64, 1.0, 20.0, inv=True)
    fl = np.asarray([1], np.int32)
    roi_out, ok = native.decode_and_warp_batch([blob], inv[None], fl, 64, 64)
    assert ok.all()

    buf = np.frombuffer(blob, np.uint8)
    ptrs = (ctypes.c_void_p * 1)(buf.ctypes.data_as(ctypes.c_void_p).value)
    lens = np.asarray([len(blob)], np.int64)
    invs = np.ascontiguousarray(inv[None], np.float32).reshape(1, 6)
    out = np.empty((1, 64, 64, 3), np.uint8)
    okf = np.empty(1, np.int32)
    lib.decode_and_warp_batch(
        ptrs,
        lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        invs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        fl.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        okf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        1, 64, 64,
    )
    assert okf.all()
    np.testing.assert_array_equal(out[0], roi_out[0])


@pytest.mark.skipif(not native.has_jpeg(), reason="libjpeg not compiled in")
def test_host_warp_loader_jpeg_path(tmp_path):
    """The loader's fused-jpeg branch produces the same batch as the cv2
    decode branch."""
    cfg = get_config("h36m3d_r50").replace(
        data=DataConfig(trainset=("Human36M",), use_aug=True, depth_dim=16,
                        input_shape=(64, 64), output_shape=(16, 16)),
    )
    skel = skeletons.H36M
    samples = make_synthetic(skel, 8, seed=6, img_size=200)
    from ihpr_tpu.data.datasets import render_synthetic_image

    for i, s in enumerate(samples):
        p = str(tmp_path / f"{i}.jpg")
        cv2.imwrite(p, render_synthetic_image(s)[:, :, ::-1], [cv2.IMWRITE_JPEG_QUALITY, 98])
        s["img_path"] = p
    ds = PoseDataset("Human36M", skel, samples, True)
    l_jpeg = BatchLoader([ds], cfg, 4, train=True, num_workers=0, host_warp=True, seed=3)
    hb1 = next(l_jpeg.epoch(0))
    # force the cv2 branch by monkeypatching has_jpeg
    import ihpr_tpu.data.native as nat

    orig = nat.has_jpeg
    nat.has_jpeg = lambda: False
    try:
        l_cv2 = BatchLoader([ds], cfg, 4, train=True, num_workers=0, host_warp=True, seed=3)
        hb2 = next(l_cv2.epoch(0))
    finally:
        nat.has_jpeg = orig
    np.testing.assert_array_equal(hb1.joint_img, hb2.joint_img)
    diff = np.abs(hb1.patch.astype(np.int32) - hb2.patch.astype(np.int32))
    assert np.percentile(diff, 99) <= 2, diff.max()
