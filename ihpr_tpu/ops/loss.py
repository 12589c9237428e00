"""Joint-coordinate L1 loss with visibility / depth masking.

Reference: ``common/nets/loss.py:JointLocationLoss:~40-60`` —
``|coord_out - gt| * joint_vis`` per axis, with the z term additionally
masked by ``joints_have_depth`` so 2D datasets (MPII/COCO) supervise x, y
only; mean over all (B, J, 3) elements.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def joint_location_loss(
    coord_out: jax.Array,
    joint_img: jax.Array,
    joint_vis: jax.Array,
    joints_have_depth: jax.Array,
) -> jax.Array:
    """Masked mean-L1 over voxel coordinates.

    Args:
      coord_out: (B, J, 3) predicted voxel coords (x, y, z).
      joint_img: (B, J, 3) ground-truth voxel coords.
      joint_vis: (B, J) or (B, J, 1) visibility in {0, 1}.
      joints_have_depth: (B,) or (B, 1) in {0, 1} — 0 for 2D-only samples.

    Returns scalar loss = mean over B*J*3 of the masked absolute errors
    (matching the reference's ``loss.mean()`` over the concatenated x/y/z
    tensor — invisible joints contribute zeros to the mean, not a smaller
    denominator).
    """
    joint_vis = joint_vis.reshape(joint_vis.shape[0], -1, 1).astype(jnp.float32)
    have_depth = joints_have_depth.reshape(-1, 1, 1).astype(jnp.float32)
    err = jnp.abs(coord_out.astype(jnp.float32) - joint_img.astype(jnp.float32))
    z_mask = jnp.concatenate(
        [
            jnp.ones_like(err[..., :2]),
            jnp.broadcast_to(have_depth, err[..., 2:].shape),
        ],
        axis=-1,
    )
    masked = err * joint_vis * z_mask
    return masked.mean()


def joint_location_loss_components(
    coord_out: jax.Array,
    joint_img: jax.Array,
    joint_vis: jax.Array,
    joints_have_depth: jax.Array,
):
    """Diagnostic split of the L1 loss: mean VISIBLE xy error and mean
    supervised z error (in voxels). Not used for gradients — the training
    loss stays ``joint_location_loss`` — but logged so plateaus can be
    attributed to localization vs depth."""
    vis = joint_vis.reshape(joint_vis.shape[0], -1).astype(jnp.float32)
    hd = joints_have_depth.reshape(-1, 1).astype(jnp.float32)
    err = jnp.abs(coord_out.astype(jnp.float32) - joint_img.astype(jnp.float32))
    xy = (err[..., :2].mean(-1) * vis).sum() / jnp.maximum(vis.sum(), 1.0)
    zw = vis * hd
    z = (err[..., 2] * zw).sum() / jnp.maximum(zw.sum(), 1.0)
    return xy, z
