"""On-device affine crop/warp — the jit replacement for cv2.warpAffine.

The reference runs ``cv2.warpAffine`` per sample on CPU worker processes
(``data/dataset.py:generate_patch_image``, ``gen_trans_from_patch_cv``,
``rotate_2d``, ``trans_point2d``). Here the affine matrices are built with
the exact same 3-point-correspondence math (so joint transforms agree to
fp32) and the image resample runs on the TPU inside jit: inverse-map
bilinear gather over the whole batch at once, fused by XLA with the
normalization and augmentation that follow.

Matrix conventions match the reference: ``gen_trans`` maps SOURCE pixel ->
DESTINATION patch pixel; sampling uses the inverse matrix (dst -> src),
like cv2.warpAffine does internally. Borders are constant-zero, matching
cv2's default BORDER_CONSTANT.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def rotate_2d(pt, rot_rad):
    """Rotate a 2D point (numpy or jnp). Reference: pose_utils.rotate_2d."""
    sn, cs = jnp.sin(rot_rad), jnp.cos(rot_rad)
    x = pt[..., 0] * cs - pt[..., 1] * sn
    y = pt[..., 0] * sn + pt[..., 1] * cs
    return jnp.stack([x, y], axis=-1)


def _affine_from_3pts(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Solve the 2x3 affine M with M @ [src_i, 1] = dst_i for 3 points.

    Replaces cv2.getAffineTransform. src/dst: (..., 3, 2). Closed form: with
    edge vectors u = p1-p0, v = p2-p0 in src and U, V in dst, the linear
    part is L = [U V] @ [u v]^{-1} (an explicit 2x2 inverse) and the
    translation is t = dst0 - L @ src0. Elementwise math only — the batched
    ``jnp.linalg.solve`` this replaces lowers to a LAPACK-style loop that
    costs ~14 ms per batch on TPU."""
    u = src[..., 1, :] - src[..., 0, :]  # (..., 2)
    v = src[..., 2, :] - src[..., 0, :]
    U = dst[..., 1, :] - dst[..., 0, :]
    V = dst[..., 2, :] - dst[..., 0, :]
    det = u[..., 0] * v[..., 1] - u[..., 1] * v[..., 0]
    inv_det = 1.0 / det
    # [u v]^{-1} rows scaled by 1/det
    a = v[..., 1] * inv_det
    b = -v[..., 0] * inv_det
    c = -u[..., 1] * inv_det
    d = u[..., 0] * inv_det
    # L = [U V] @ [[a, b], [c, d]]
    l00 = U[..., 0] * a + V[..., 0] * c
    l01 = U[..., 0] * b + V[..., 0] * d
    l10 = U[..., 1] * a + V[..., 1] * c
    l11 = U[..., 1] * b + V[..., 1] * d
    t0 = dst[..., 0, 0] - (l00 * src[..., 0, 0] + l01 * src[..., 0, 1])
    t1 = dst[..., 0, 1] - (l10 * src[..., 0, 0] + l11 * src[..., 0, 1])
    row0 = jnp.stack([l00, l01, t0], axis=-1)
    row1 = jnp.stack([l10, l11, t1], axis=-1)
    return jnp.stack([row0, row1], axis=-2)  # (..., 2, 3)


def gen_trans(
    c_x,
    c_y,
    src_width,
    src_height,
    dst_width: int,
    dst_height: int,
    scale,
    rot_deg,
    inv: bool = False,
) -> jnp.ndarray:
    """Patch transform from bbox center/size + augmentation scale/rotation.

    Reference: ``data/dataset.py:gen_trans_from_patch_cv`` — three control
    points (center, center+down, center+right), rotated in source space.
    All args may be batched arrays; returns (..., 2, 3).
    """
    c_x, c_y, src_width, src_height, scale, rot_deg = jnp.broadcast_arrays(
        *[jnp.asarray(a, jnp.float32) for a in (c_x, c_y, src_width, src_height, scale, rot_deg)]
    )
    src_w = src_width * scale
    src_h = src_height * scale
    rot_rad = jnp.pi * rot_deg / 180.0

    src_center = jnp.stack([c_x, c_y], axis=-1)
    src_down = rotate_2d(jnp.stack([jnp.zeros_like(src_h), src_h * 0.5], axis=-1), rot_rad)
    src_right = rotate_2d(jnp.stack([src_w * 0.5, jnp.zeros_like(src_w)], axis=-1), rot_rad)

    dst_center = jnp.broadcast_to(
        jnp.array([dst_width * 0.5, dst_height * 0.5], jnp.float32), src_center.shape
    )
    dst_down = jnp.broadcast_to(
        jnp.array([0.0, dst_height * 0.5], jnp.float32), src_center.shape
    )
    dst_right = jnp.broadcast_to(
        jnp.array([dst_width * 0.5, 0.0], jnp.float32), src_center.shape
    )

    src = jnp.stack([src_center, src_center + src_down, src_center + src_right], axis=-2)
    dst = jnp.stack([dst_center, dst_center + dst_down, dst_center + dst_right], axis=-2)
    if inv:
        src, dst = dst, src
    return _affine_from_3pts(src, dst)


def gen_trans_np(
    c_x, c_y, src_width, src_height, dst_width, dst_height, scale, rot_deg, inv=False
) -> np.ndarray:
    """Pure-numpy twin of ``gen_trans`` for host threads (calling the jnp
    version from loader threads would dispatch to the accelerator). Same
    3-point construction; parity pinned by tests."""
    c_x, c_y, src_width, src_height, scale, rot_deg = np.broadcast_arrays(
        *[np.asarray(a, np.float32) for a in (c_x, c_y, src_width, src_height, scale, rot_deg)]
    )
    src_w = src_width * scale
    src_h = src_height * scale
    rad = np.pi * rot_deg / 180.0
    sn, cs = np.sin(rad), np.cos(rad)

    def rot2d(vx, vy):
        return np.stack([vx * cs - vy * sn, vx * sn + vy * cs], -1)

    src_center = np.stack([c_x, c_y], -1)
    src_down = rot2d(np.zeros_like(src_h), src_h * 0.5)
    src_right = rot2d(src_w * 0.5, np.zeros_like(src_w))
    shp = src_center.shape
    dst_center = np.broadcast_to(
        np.array([dst_width * 0.5, dst_height * 0.5], np.float32), shp
    )
    dst_down = np.broadcast_to(np.array([0.0, dst_height * 0.5], np.float32), shp)
    dst_right = np.broadcast_to(np.array([dst_width * 0.5, 0.0], np.float32), shp)

    src = np.stack([src_center, src_center + src_down, src_center + src_right], -2)
    dst = np.stack([dst_center, dst_center + dst_down, dst_center + dst_right], -2)
    if inv:
        src, dst = dst, src

    u = src[..., 1, :] - src[..., 0, :]
    v = src[..., 2, :] - src[..., 0, :]
    U = dst[..., 1, :] - dst[..., 0, :]
    V = dst[..., 2, :] - dst[..., 0, :]
    inv_det = 1.0 / (u[..., 0] * v[..., 1] - u[..., 1] * v[..., 0])
    a = v[..., 1] * inv_det
    b = -v[..., 0] * inv_det
    c = -u[..., 1] * inv_det
    d = u[..., 0] * inv_det
    l00 = U[..., 0] * a + V[..., 0] * c
    l01 = U[..., 0] * b + V[..., 0] * d
    l10 = U[..., 1] * a + V[..., 1] * c
    l11 = U[..., 1] * b + V[..., 1] * d
    t0 = dst[..., 0, 0] - (l00 * src[..., 0, 0] + l01 * src[..., 0, 1])
    t1 = dst[..., 0, 1] - (l10 * src[..., 0, 0] + l11 * src[..., 0, 1])
    return np.stack(
        [np.stack([l00, l01, t0], -1), np.stack([l10, l11, t1], -1)], -2
    ).astype(np.float32)


def trans_point2d_np(pt: np.ndarray, trans: np.ndarray) -> np.ndarray:
    """numpy twin of ``trans_point2d``: (..., 2) points through (..., 2, 3)."""
    ones = np.ones(pt.shape[:-1] + (1,), pt.dtype)
    return np.einsum("...ij,...j->...i", trans, np.concatenate([pt, ones], -1))


def trans_point2d(pt: jnp.ndarray, trans: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 2, 3) affine to (..., 2) points. Reference:
    pose_utils.trans_point2d. HIGHEST precision: joint-label coordinates
    must not quantize to bf16 on the MXU (tiny contraction, exactness is
    the parity contract)."""
    ones = jnp.ones(pt.shape[:-1] + (1,), pt.dtype)
    return jnp.einsum(
        "...ij,...j->...i",
        trans,
        jnp.concatenate([pt, ones], -1),
        precision=jax.lax.Precision.HIGHEST,
    )


def affine_warp_bilinear(
    images: jax.Array,
    inv_trans: jax.Array,
    out_shape: Tuple[int, int],
) -> jax.Array:
    """Batched inverse-map bilinear warp (the cv2.warpAffine equivalent).

    Args:
      images: (B, H, W, C) source canvases (any float/int dtype).
      inv_trans: (B, 2, 3) DESTINATION->SOURCE affines (``gen_trans`` with
        ``inv=True``).
      out_shape: (out_h, out_w).

    Returns (B, out_h, out_w, C) float32; out-of-bounds samples are 0
    (cv2 BORDER_CONSTANT default).
    """
    b, h, w, c = images.shape
    out_h, out_w = out_shape
    imgs = images.astype(jnp.float32)

    # Destination pixel grid -> source coordinates, per sample.
    xs = jnp.arange(out_w, dtype=jnp.float32)
    ys = jnp.arange(out_h, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # (out_h, out_w)
    grid = jnp.stack([gx, gy, jnp.ones_like(gx)], axis=-1)  # (oh, ow, 3)
    # HIGHEST: sampling coordinates drive the gather; bf16 quantization
    # would shift sampled pixels ~1e-2 px (6 flops/px — cost is nil).
    src = jnp.einsum(
        "bij,hwj->bhwi", inv_trans, grid,
        precision=jax.lax.Precision.HIGHEST,
    )  # (B, oh, ow, 2)
    sx, sy = src[..., 0], src[..., 1]

    # One (2, 2, C) slice-gather per output pixel instead of four scalar
    # taps — TPU gathers are latency-bound per start index, so halving the
    # tap count is worth ~25%. Slice starts are clamped into bounds; the
    # bilinear hat weight is then evaluated at each tap's ACTUAL gathered
    # coordinate, so border taps (and fully-outside pixels) get weight 0
    # automatically — exactly cv2's BORDER_CONSTANT-zero semantics.
    x0i = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, w - 2)
    y0i = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, h - 2)

    def per_image(img, yi, xi):
        starts = jnp.stack([yi.ravel(), xi.ravel()], axis=-1)  # (N, 2)
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(), start_index_map=(0, 1)
        )
        return jax.lax.gather(img, starts, dn, slice_sizes=(2, 2, c))

    patches = jax.vmap(per_image)(imgs, y0i, x0i).reshape(b, out_h, out_w, 2, 2, c)

    x0f = x0i.astype(jnp.float32)
    y0f = y0i.astype(jnp.float32)
    wx0 = jnp.maximum(0.0, 1.0 - jnp.abs(sx - x0f))[..., None]
    wx1 = jnp.maximum(0.0, 1.0 - jnp.abs(sx - (x0f + 1.0)))[..., None]
    wy0 = jnp.maximum(0.0, 1.0 - jnp.abs(sy - y0f))[..., None]
    wy1 = jnp.maximum(0.0, 1.0 - jnp.abs(sy - (y0f + 1.0)))[..., None]
    return (
        patches[..., 0, 0, :] * (wy0 * wx0)
        + patches[..., 0, 1, :] * (wy0 * wx1)
        + patches[..., 1, 0, :] * (wy1 * wx0)
        + patches[..., 1, 1, :] * (wy1 * wx1)
    )


def flip_image(images: jax.Array) -> jax.Array:
    """Horizontal flip (B, H, W, C). Reference flips the raw image then
    mirrors the bbox center; we fold the flip into the patch transform by
    flipping the canvas and mirroring c_x (see augment.py)."""
    return images[:, :, ::-1, :]


def flip_joints(
    joints_xy: jax.Array, joint_vis: jax.Array, flip_perm: np.ndarray, width: float
):
    """Mirror joint x and swap left/right pairs.

    Reference: ``data/dataset.py`` flip branch — x -> (W - 1) - x, then
    reorder by flip_pairs. flip_perm is an involution permutation."""
    x = width - 1.0 - joints_xy[..., 0]
    flipped = jnp.concatenate([x[..., None], joints_xy[..., 1:]], axis=-1)
    return flipped[..., flip_perm, :], joint_vis[..., flip_perm]
