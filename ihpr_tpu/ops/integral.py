"""Integral soft-argmax: volumetric softmax + per-axis expectation.

Plain-JAX reference implementation (the Pallas-fused version lives in
``integral_pallas.py`` and is tested for parity against this one).

Reference semantics (``common/nets/loss.py:soft_argmax:~1-40``):
    view (B, J, D*H*W) -> softmax over the flattened volume
    -> view (B, J, D, H, W)
    -> marginals: accu_x = sum over (z, y); accu_y = sum over (z, x);
       accu_z = sum over (y, x)
    -> expectation: inner product of each marginal with arange(dim)
    -> concat -> (B, J, 3) continuous voxel coordinates, ordered (x, y, z).

The reference adds +1 to each arange then subtracts 1 after the expectation
(a numerically irrelevant shift); we use plain arange directly.

All math is fp32 regardless of input dtype: the softmax over 262,144
elements is precision-sensitive, and the cost is negligible next to the
backbone convs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _expectation(marginal: jax.Array) -> jax.Array:
    """(..., N) probability marginal -> (...,) expected index.

    Pinned to HIGHEST precision: fp32 must MEAN fp32 here (the MXU's
    default quantizes fp32 contractions to bf16, ~1e-2 coordinate error),
    matching the fused kernel's pinned contractions — and independent of
    the process-wide jax_default_matmul_precision. Cost is negligible
    (a (B*J, N) matvec)."""
    n = marginal.shape[-1]
    idx = jnp.arange(n, dtype=marginal.dtype)
    return jnp.matmul(marginal, idx, precision=jax.lax.Precision.HIGHEST)


def soft_argmax_3d(logits: jax.Array) -> jax.Array:
    """(B, J, D, H, W) heatmap logits -> (B, J, 3) voxel coords (x, y, z).

    x indexes W, y indexes H, z indexes D — matching the reference's
    marginalization order.
    """
    b, j, d, h, w = logits.shape
    x = logits.astype(jnp.float32).reshape(b, j, d * h * w)
    p = jax.nn.softmax(x, axis=-1).reshape(b, j, d, h, w)
    accu_x = p.sum(axis=(2, 3))  # (B, J, W)
    accu_y = p.sum(axis=(2, 4))  # (B, J, H)
    accu_z = p.sum(axis=(3, 4))  # (B, J, D)
    return jnp.stack(
        [_expectation(accu_x), _expectation(accu_y), _expectation(accu_z)],
        axis=-1,
    )


def soft_argmax_2d(logits: jax.Array) -> jax.Array:
    """(B, J, H, W) heatmap logits -> (B, J, 2) coords (x, y)."""
    b, j, h, w = logits.shape
    x = logits.astype(jnp.float32).reshape(b, j, h * w)
    p = jax.nn.softmax(x, axis=-1).reshape(b, j, h, w)
    accu_x = p.sum(axis=2)  # (B, J, W)
    accu_y = p.sum(axis=3)  # (B, J, H)
    return jnp.stack([_expectation(accu_x), _expectation(accu_y)], axis=-1)


def soft_argmax_1d(logits: jax.Array) -> jax.Array:
    """(..., N) logits -> (...,) expected index under softmax."""
    p = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return _expectation(p)


def heatmap_to_volume(heatmap: jax.Array, joint_num: int, depth_dim: int) -> jax.Array:
    """Reshape head output (B, H, W, J*D) [NHWC conv layout] into the
    (B, J, D, H, W) volume the integral op consumes.

    The reference head emits (B, J*D, H, W) in NCHW (``main/model.py:HeadNet``)
    and reshapes to (B, J, D*H*W); on TPU convs are NHWC, so the channel axis
    comes last and is split as (J, D) then moved before the spatial axes.
    """
    b, h, w, c = heatmap.shape
    assert c == joint_num * depth_dim, (c, joint_num, depth_dim)
    vol = heatmap.reshape(b, h, w, joint_num, depth_dim)
    return vol.transpose(0, 3, 4, 1, 2)  # (B, J, D, H, W)
