"""Deconvolution head: stride-32 features -> stride-4 heatmap volumes.

Reference (``main/model.py:HeadNet:~1-60``): 3 x [ConvTranspose2d(256, k4,
s2, p1) + BN + ReLU] followed by Conv2d(256 -> joint_num*depth_dim, k1),
weights init normal(std=0.001).

NHWC throughout; the final 1x1 conv emits (B, H/4, W/4, J*D), which is
exactly the layout the fused Pallas integral kernel consumes (free reshape,
no transpose — see ops/integral_pallas.py).

torch ConvTranspose2d(k=4, s=2, p=1) doubles the spatial dims; flax
ConvTranspose with strides (2,2) and padding 'SAME' produces the same
geometry (weight mapping validated numerically in tests/test_convert.py).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ihpr_tpu.models.resnet import _BN


class SubpixelConvTranspose(nn.Module):
    """ConvTranspose(k4, s2, 'SAME') computed as 4 phase convs + pixel
    shuffle — numerically IDENTICAL to flax ``nn.ConvTranspose`` with the
    same ``kernel`` parameter (phase kernel (py, px) is the strided slice
    ``w[py::2, px::2]``).

    Standalone microbenchmarks show ~9x over a lone ConvTranspose grad,
    but inside the full jitted train step XLA already performs this
    decomposition and the manual pixel shuffle only adds relayouts
    (28.5 -> 30.5 ms/step measured), so DeconvHead uses nn.ConvTranspose.
    Kept as a drop-in (param-compatible) alternative and as executable
    documentation of the lowering.
    """

    features: int
    kernel_init: Any = nn.initializers.lecun_normal()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, cin = x.shape
        kernel = self.param(
            "kernel", self.kernel_init, (4, 4, cin, self.features), jnp.float32
        )
        k = kernel.astype(self.dtype)
        # (2, 2, Cin, 4F): output-channel groups ordered (py, px)
        kphase = jnp.concatenate(
            [k[py::2, px::2] for py in (0, 1) for px in (0, 1)], axis=-1
        )
        xp = jnp.pad(x.astype(self.dtype), ((0, 0), (1, 1), (1, 1), (0, 0)))
        y = jax.lax.conv_general_dilated(
            xp,
            kphase,
            window_strides=(1, 1),
            padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # (B, h+1, w+1, 4F)
        f = self.features
        ee = y[:, 0:h, 0:w, 0:f]
        eo = y[:, 0:h, 1 : w + 1, f : 2 * f]
        oe = y[:, 1 : h + 1, 0:w, 2 * f : 3 * f]
        oo = y[:, 1 : h + 1, 1 : w + 1, 3 * f :]
        even = jnp.stack([ee, eo], axis=3).reshape(b, h, 2 * w, f)
        odd = jnp.stack([oe, oo], axis=3).reshape(b, h, 2 * w, f)
        return jnp.stack([even, odd], axis=2).reshape(b, 2 * h, 2 * w, f)


class _FinalConvParams(nn.Module):
    """Owns the final 1x1 conv's parameters with the same tree layout as
    ``nn.Conv(name='final')`` (kernel (1, 1, C, out), bias (out,)) but
    returns the raw arrays, so the fused final-conv+integral kernel and the
    plain logits path share one set of weights."""

    in_features: int
    out_features: int
    init_std: float

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.normal(stddev=self.init_std),
            (1, 1, self.in_features, self.out_features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.out_features,), jnp.float32
        )
        return kernel, bias


class DeconvHead(nn.Module):
    out_channels: int  # joint_num * depth_dim
    num_layers: int = 3
    features: int = 256
    init_std: float = 0.001
    compute_dtype: Any = jnp.float32
    fp32_logits: bool = True
    bn_mode: str = "flax"
    # Device mesh whose first axis row-shards the batch: mode='coords'
    # launches the fused kernel per-shard under shard_map (GSPMD has no
    # pallas_call partitioning rule). None = single-device launch.
    mesh: Any = None
    # Per-call matmul precision for the deconvs + plain final conv (None =
    # ambient default). The fused kernel pins precision from dtype itself.
    precision: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False, mode: str = "logits", joint_num=None, depth_dim=None):
        """mode='logits': (B, H, W, J*D) heatmap logits (reference
        semantics). mode='coords': (B, J, 3) via the fused final-conv +
        integral Pallas kernel — the logits volume never touches HBM."""
        init = nn.initializers.normal(stddev=self.init_std)
        x = x.astype(self.compute_dtype)
        for i in range(self.num_layers):
            # Measured in situ on v5e: XLA already phase-decomposes the
            # transposed conv inside the full train program (28.5 ms/step vs
            # 30.5 with the manual SubpixelConvTranspose above, whose pixel
            # shuffle costs extra relayouts).
            x = nn.ConvTranspose(
                self.features,
                (4, 4),
                strides=(2, 2),
                padding="SAME",
                use_bias=False,
                kernel_init=init,
                dtype=self.compute_dtype,
                param_dtype=jnp.float32,
                precision=self.precision,
                name=f"deconv{i + 1}",
            )(x)
            x = _BN(self.compute_dtype, self.bn_mode, name=f"bn{i + 1}")(x, train)
            x = nn.relu(x)
        kernel, bias = _FinalConvParams(
            self.features, self.out_channels, self.init_std, name="final"
        )()
        k2d = kernel[0, 0].astype(self.compute_dtype)
        if mode == "coords":
            from ihpr_tpu.ops.fused_head_integral import fused_final_conv_integral

            return fused_final_conv_integral(
                x, k2d, bias.astype(self.compute_dtype), joint_num, depth_dim,
                mesh=self.mesh,
            )
        # plain logits: the 1x1 conv is exactly x @ k + b
        x = jnp.einsum(
            "bhwc,co->bhwo", x, k2d, precision=self.precision
        ) + bias.astype(self.compute_dtype)
        # Heatmap logits in fp32 by default: the volumetric softmax is
        # precision-sensitive and the cast is free relative to the convs.
        # fp32_logits=False keeps them in compute_dtype (halves the fused
        # integral kernel's HBM read in bf16 mode, ~0.02 voxel shift).
        return x.astype(jnp.float32) if self.fp32_logits else x
