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
import jax.numpy as jnp

from ihpr_tpu.models.resnet import _BN


class DeconvHead(nn.Module):
    out_channels: int  # joint_num * depth_dim
    num_layers: int = 3
    features: int = 256
    init_std: float = 0.001
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        init = nn.initializers.normal(stddev=self.init_std)
        x = x.astype(self.compute_dtype)
        for i in range(self.num_layers):
            x = nn.ConvTranspose(
                self.features,
                (4, 4),
                strides=(2, 2),
                padding="SAME",
                use_bias=False,
                kernel_init=init,
                dtype=self.compute_dtype,
                param_dtype=jnp.float32,
                name=f"deconv{i + 1}",
            )(x)
            x = _BN(self.compute_dtype, name=f"bn{i + 1}")(x, train)
            x = nn.relu(x)
        x = nn.Conv(
            self.out_channels,
            (1, 1),
            kernel_init=init,
            bias_init=nn.initializers.zeros,
            dtype=self.compute_dtype,
            param_dtype=jnp.float32,
            name="final",
        )(x)
        # Heatmap logits in fp32: the volumetric softmax is precision-
        # sensitive and this cast is free relative to the convs.
        return x.astype(jnp.float32)
