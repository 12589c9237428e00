"""PoseNet: backbone + deconv head + integral soft-argmax.

Reference: ``main/model.py:ResPoseNet:~60-110`` (forward = backbone -> head;
soft_argmax applied inside the loss at train time and in test.py at eval).
Here the integral is part of the model's ``coords`` path — one jitted
function emits (B, J, 3) directly through the fused Pallas kernel.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ihpr_tpu.config import Config
from ihpr_tpu.models.head import DeconvHead
from ihpr_tpu.models.resnet import ResNetBackbone
from ihpr_tpu.ops.integral_pallas import soft_argmax_from_heatmap


class PoseNet(nn.Module):
    resnet_type: int = 50
    joint_num: int = 18
    depth_dim: int = 64
    num_deconv_layers: int = 3
    deconv_features: int = 256
    head_init_std: float = 0.001
    compute_dtype: Any = jnp.float32
    fp32_logits: bool = True
    s2d_stem: bool = False
    bn_mode: str = "flax"
    block_remat: bool = False
    remat_policy: str = "full"
    fused_1x1: bool = False
    fused_conv3: bool = False
    # Mesh for the shard_map kernel launches under data parallelism:
    # the head's fused final-conv+integral always uses it (per-sample
    # kernel, no collectives needed); the backbone's fused_1x1 matmul+BN
    # additionally psums statistics (sync-BN like the unfused GSPMD
    # path). None = single-device launch (or the plain GSPMD-partitionable
    # composition when unset under a mesh).
    mesh: Any = None
    # Per-call matmul precision threaded into every conv/einsum (None =
    # ambient default; 'highest' = true-fp32 parity configs). Replaces the
    # old process-global jax_default_matmul_precision mutation — configs
    # no longer leak precision into each other within one process.
    matmul_precision: Any = None

    def setup(self):
        self.backbone = ResNetBackbone(
            self.resnet_type,
            self.compute_dtype,
            self.s2d_stem,
            self.bn_mode,
            self.block_remat,
            self.remat_policy,
            self.fused_1x1,
            self.fused_conv3,
            self.mesh,
            precision=self.matmul_precision,
        )
        self.head = DeconvHead(
            self.joint_num * self.depth_dim,
            self.num_deconv_layers,
            self.deconv_features,
            self.head_init_std,
            self.compute_dtype,
            self.fp32_logits,
            self.bn_mode,
            mesh=self.mesh,
            precision=self.matmul_precision,
        )

    def __call__(self, x, train: bool = False):
        """(B, H, W, 3) normalized image -> (B, H/4, W/4, J*D) heatmap logits."""
        return self.head(self.backbone(x, train), train)

    def coords(self, x, train: bool = False):
        """(B, H, W, 3) image -> (B, J, 3) voxel coordinates (x, y, z).

        Routes through the fused final-conv+integral kernel (the logits
        volume never exists in HBM); falls back internally for unsupported
        shapes. ``__call__`` remains the reference-shaped heatmap path."""
        feat = self.backbone(x, train)
        return self.head(
            feat, train, mode="coords", joint_num=self.joint_num, depth_dim=self.depth_dim
        )

    def coords_plain(self, x, train: bool = False):
        """``coords`` via the reference-shaped heatmap + plain-XLA
        soft-argmax composition (no ``pallas_call``).

        This is the path every GSPMD-partitioned axis must take:
        ``pallas_call`` has no partitioning rule, so spatial sharding
        (PoseServer(mesh=...), the 2-axis training mesh) and portable
        StableHLO export route through here. Every op is partitionable;
        XLA inserts the halo exchanges / reshards."""
        from ihpr_tpu.ops import soft_argmax_3d

        hm = self(x, train)
        b, hh, ww, _ = hm.shape
        vol = hm.reshape(b, hh, ww, self.joint_num, self.depth_dim)
        return soft_argmax_3d(vol.transpose(0, 3, 4, 1, 2))


def build_pose_net(
    cfg: Config, joint_num: int | None = None, mesh=None
) -> PoseNet:
    """Reference: ``main/model.py:get_pose_net``.

    ``mesh``: pass the training/eval mesh so every Pallas kernel in the
    ``coords`` path (the fused final-conv+integral, and the backbone's
    fused 1x1 matmul+BN when ``cfg.model.fused_1x1``) launches per-shard
    via shard_map instead of tripping GSPMD's missing pallas_call
    partitioning rule."""
    if joint_num is None:
        joint_num = cfg.joint_num
    return PoseNet(
        resnet_type=cfg.model.resnet_type,
        joint_num=joint_num,
        depth_dim=cfg.data.depth_dim,
        num_deconv_layers=cfg.model.num_deconv_layers,
        deconv_features=cfg.model.deconv_channels,
        head_init_std=cfg.model.head_final_init_std,
        compute_dtype=jnp.dtype(cfg.model.compute_dtype),
        fp32_logits=cfg.model.fp32_logits,
        s2d_stem=cfg.model.s2d_stem,
        bn_mode=cfg.model.bn_mode,
        block_remat=cfg.model.block_remat,
        remat_policy=cfg.model.remat_policy,
        fused_1x1=cfg.model.fused_1x1,
        fused_conv3=cfg.model.fused_conv3,
        mesh=mesh,
        matmul_precision=cfg.model.matmul_precision,
    )


def init_pose_net(model: PoseNet, rng: jax.Array, input_shape=(256, 256)):
    """Initialize {params, batch_stats} with a dummy batch."""
    dummy = jnp.zeros((1, input_shape[0], input_shape[1], 3), jnp.float32)
    variables = model.init(rng, dummy, train=False)
    return variables["params"], variables["batch_stats"]
