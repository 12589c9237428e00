"""Core ops: integral soft-argmax (plain-JAX + fused Pallas) and losses.

Reference: ``common/nets/loss.py`` (soft_argmax + JointLocationLoss).
"""

from ihpr_tpu.ops.integral import (
    soft_argmax_1d,
    soft_argmax_2d,
    soft_argmax_3d,
)
from ihpr_tpu.ops.integral_pallas import soft_argmax_3d_fused
from ihpr_tpu.ops.loss import joint_location_loss

__all__ = [
    "soft_argmax_1d",
    "soft_argmax_2d",
    "soft_argmax_3d",
    "soft_argmax_3d_fused",
    "joint_location_loss",
]
