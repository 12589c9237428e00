"""Batched on-device augmentation + patch generation (the jit hot path).

Reference: ``data/dataset.py:DatasetLoader.__getitem__:~1-200`` +
``get_aug_config`` — there, per-sample cv2 work on CPU worker processes.
Here one jitted function processes the whole batch on the TPU: sample aug
parameters with ``jax.random``, build the patch affines, bilinear-warp the
canvases, color-jitter, ImageNet-normalize, and push the joints through the
same transform. XLA fuses the elementwise tail into the gather.

Host-side preparation (pipeline.py) supplies fixed-size uint8 ``canvas``
crops around each bbox plus the (origin, scale) mapping canvas pixels back
to original-image pixels; because that crop is translation(+integer-ish
scale) only, warping from the canvas is mathematically identical to the
reference's single warpAffine from the original image.

Augmentation distributions (reference get_aug_config):
  scale ~ 1 + scale_factor * clip(N(0,1), -1, 1)
  rot   ~ rot_factor * clip(N(0,1), -2, 2) with prob rot_prob, else 0
  flip  ~ Bernoulli(0.5)
  color ~ U[1 - color_factor, 1 + color_factor] per RGB channel
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ihpr_tpu.config import DataConfig
from ihpr_tpu.data.warp import affine_warp_bilinear, gen_trans, trans_point2d


@dataclasses.dataclass(frozen=True)
class PatchBatch:
    """Device-side training batch (pytree)."""

    image: jax.Array  # (B, in_h, in_w, 3) float32, normalized
    joint_img: jax.Array  # (B, J, 3) voxel coords (x, y, z)
    joint_vis: jax.Array  # (B, J) {0, 1}
    joints_have_depth: jax.Array  # (B,) {0, 1}


jax.tree_util.register_dataclass(
    PatchBatch,
    data_fields=["image", "joint_img", "joint_vis", "joints_have_depth"],
    meta_fields=[],
)


def finalize_patch(
    patch_u8: jax.Array, color_scale: jax.Array, cfg: DataConfig
) -> jax.Array:
    """Device tail of the native host-warp path: color jitter + clip +
    ImageNet normalize on an already-warped uint8 patch (reference
    data/dataset.py: color scale then ToTensor+Normalize). XLA fuses this
    into the backbone's first conv input."""
    img = patch_u8.astype(jnp.float32) * color_scale[:, None, None, :]
    img = jnp.clip(img, 0.0, 255.0)
    mean = jnp.asarray(cfg.pixel_mean, jnp.float32) * 255.0
    std = jnp.asarray(cfg.pixel_std, jnp.float32) * 255.0
    return (img - mean) / std


def sample_aug_params(rng: jax.Array, batch: int, cfg: DataConfig):
    """Reference: data/dataset.py:get_aug_config, vectorized over the batch."""
    k_s, k_r, k_rp, k_f, k_c = jax.random.split(rng, 5)
    scale = 1.0 + cfg.scale_factor * jnp.clip(
        jax.random.normal(k_s, (batch,)), -1.0, 1.0
    )
    # reference: rot = clip(randn, -2, 2) * rot_factor  (range +-2*rot_factor)
    rot = cfg.rot_factor * jnp.clip(jax.random.normal(k_r, (batch,)), -2.0, 2.0)
    rot = jnp.where(jax.random.uniform(k_rp, (batch,)) <= cfg.rot_prob, rot, 0.0)
    do_flip = jax.random.bernoulli(k_f, cfg.flip_prob, (batch,))
    color = jax.random.uniform(
        k_c,
        (batch, 3),
        minval=1.0 - cfg.color_factor,
        maxval=1.0 + cfg.color_factor,
    )
    return scale, rot, do_flip, color


def make_patch_batch(
    canvas: jax.Array,  # (B, Hc, Wc, 3) uint8/float source crops
    canvas_origin: jax.Array,  # (B, 2) original-px coords of canvas (0,0)
    canvas_scale: jax.Array,  # (B,) original px per canvas px
    bbox: jax.Array,  # (B, 4) x, y, w, h in original px
    joints: jax.Array,  # (B, J, 3) x,y original px; z root-relative mm
    joint_vis: jax.Array,  # (B, J)
    joints_have_depth: jax.Array,  # (B,)
    flip_perm: np.ndarray,  # (J,) left/right involution
    cfg: DataConfig,
    rng: Optional[jax.Array] = None,
    train: bool = True,
) -> PatchBatch:
    """The whole reference __getitem__ pipeline as one batched jit function."""
    b, hc, wc, _ = canvas.shape
    in_h, in_w = cfg.input_shape
    out_h, out_w = cfg.output_shape
    depth_dim = cfg.depth_dim

    if train and cfg.use_aug:
        assert rng is not None
        scale, rot, do_flip, color = sample_aug_params(rng, b, cfg)
    else:
        scale = jnp.ones((b,))
        rot = jnp.zeros((b,))
        do_flip = jnp.zeros((b,), bool)
        color = jnp.ones((b, 3))

    # bbox center/size in canvas pixel units.
    inv_cs = 1.0 / canvas_scale
    c_x = (bbox[:, 0] + bbox[:, 2] * 0.5 - canvas_origin[:, 0]) * inv_cs
    c_y = (bbox[:, 1] + bbox[:, 3] * 0.5 - canvas_origin[:, 1]) * inv_cs
    src_w = bbox[:, 2] * inv_cs
    src_h = bbox[:, 3] * inv_cs

    # Flip: mirror the canvas and the bbox center x (reference flips the
    # original image; identical on the canvas since flip commutes with crop).
    flipped = canvas[:, :, ::-1, :]
    canvas_used = jnp.where(do_flip[:, None, None, None], flipped, canvas)
    c_x = jnp.where(do_flip, wc - 1.0 - c_x, c_x)

    trans_inv = gen_trans(c_x, c_y, src_w, src_h, in_w, in_h, scale, rot, inv=True)
    patch = affine_warp_bilinear(canvas_used, trans_inv, (in_h, in_w))

    # Color jitter + torchvision ToTensor/Normalize (reference transform).
    patch = jnp.clip(patch * color[:, None, None, :], 0.0, 255.0)
    mean = jnp.asarray(cfg.pixel_mean, jnp.float32) * 255.0
    std = jnp.asarray(cfg.pixel_std, jnp.float32) * 255.0
    patch = (patch - mean) / std

    # ---- joints ----
    xy = (joints[:, :, :2] - canvas_origin[:, None, :]) * inv_cs[:, None, None]
    x_f = wc - 1.0 - xy[:, :, 0]
    xy = jnp.where(
        do_flip[:, None, None],
        jnp.stack([x_f, xy[:, :, 1]], -1)[:, flip_perm, :],
        xy,
    )
    vis = jnp.where(do_flip[:, None], joint_vis[:, flip_perm], joint_vis)
    z = jnp.where(do_flip[:, None], joints[:, flip_perm, 2], joints[:, :, 2])

    trans_fwd = gen_trans(c_x, c_y, src_w, src_h, in_w, in_h, scale, rot, inv=False)
    xy_patch = trans_point2d(xy, trans_fwd[:, None, :, :])

    # Rotation of the image plane rotates the pose about the z-axis; the
    # root-relative depth is unaffected (reference keeps z untouched).
    x_hm = xy_patch[..., 0] / in_w * out_w
    y_hm = xy_patch[..., 1] / in_h * out_h
    z_hm = z / (cfg.bbox_3d_shape[0] / 2.0) * (depth_dim / 2.0) + depth_dim / 2.0

    joint_img = jnp.stack([x_hm, y_hm, z_hm], axis=-1)

    # Visibility gated on the joint landing inside the patch volume
    # (reference: vis *= in-patch checks).
    inside = (
        (x_hm >= 0)
        & (x_hm < out_w)
        & (y_hm >= 0)
        & (y_hm < out_h)
        & (z_hm >= 0)
        & (z_hm < depth_dim)
    )
    vis = vis * inside.astype(vis.dtype)

    return PatchBatch(
        image=patch,
        joint_img=joint_img,
        joint_vis=vis,
        joints_have_depth=joints_have_depth.astype(jnp.float32),
    )


def eval_patch_transforms(
    bbox: np.ndarray, input_shape: Tuple[int, int]
) -> Tuple[np.ndarray, np.ndarray]:
    """Host helper: (N, 4) bboxes -> forward and inverse patch affines in
    ORIGINAL image coordinates (no aug). The inverse is what
    ``geometry.warp_coord_to_original`` consumes at eval."""
    import numpy as onp

    n = bbox.shape[0]
    c_x = bbox[:, 0] + bbox[:, 2] * 0.5
    c_y = bbox[:, 1] + bbox[:, 3] * 0.5
    fwd = gen_trans(c_x, c_y, bbox[:, 2], bbox[:, 3], input_shape[1], input_shape[0], 1.0, 0.0)
    inv = gen_trans(
        c_x, c_y, bbox[:, 2], bbox[:, 3], input_shape[1], input_shape[0], 1.0, 0.0, inv=True
    )
    return onp.asarray(fwd), onp.asarray(inv)
