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

    Replaces cv2.getAffineTransform. src/dst: (..., 3, 2). Closed-form via
    the 3x3 system inverse (batched, jit-friendly)."""
    ones = jnp.ones(src.shape[:-1] + (1,), src.dtype)
    A = jnp.concatenate([src, ones], axis=-1)  # (..., 3, 3) rows [x, y, 1]
    # M^T = A^{-1} @ dst  (solve A @ M^T = dst)
    mt = jnp.linalg.solve(A, dst)  # (..., 3, 2)
    return jnp.swapaxes(mt, -1, -2)  # (..., 2, 3)


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


def trans_point2d(pt: jnp.ndarray, trans: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 2, 3) affine to (..., 2) points. Reference:
    pose_utils.trans_point2d."""
    ones = jnp.ones(pt.shape[:-1] + (1,), pt.dtype)
    return jnp.einsum("...ij,...j->...i", trans, jnp.concatenate([pt, ones], -1))


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
    src = jnp.einsum("bij,hwj->bhwi", inv_trans, grid)  # (B, oh, ow, 2)
    sx, sy = src[..., 0], src[..., 1]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = sx - x0
    fy = sy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        valid = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        xi_c = jnp.clip(xi, 0, w - 1)
        yi_c = jnp.clip(yi, 0, h - 1)
        # (B, oh, ow, C) gather from (B, H, W, C): take_along_axis on the
        # flattened spatial dim keeps this a single XLA gather per tap.
        flat = imgs.reshape(b, h * w, c)
        idx = (yi_c * w + xi_c).reshape(b, -1, 1)
        vals = jnp.take_along_axis(flat, idx, axis=1).reshape(b, out_h, out_w, c)
        return vals * valid[..., None].astype(jnp.float32)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    fx = fx[..., None]
    fy = fy[..., None]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
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
