"""ResNet backbone in Flax (NHWC, TPU-native).

Mirrors the torchvision-style backbone the reference uses
(``common/nets/resnet.py:~1-130``: spec table {18: (BasicBlock, [2,2,2,2]),
34, 50: (Bottleneck, [3,4,6,3]), 101, 152: (Bottleneck, [3,8,36,3])},
stride-32 output, avgpool/fc removed) so ImageNet weights convert 1:1
(``tools/convert_torch_ckpt.py``). Downsampling follows torchvision v1.5:
the stride sits on the Bottleneck's 3x3 conv.

TPU choices: NHWC layout feeds XLA's native conv tiling; params stay fp32
while activations/matmuls run in ``compute_dtype`` (bf16 on the MXU for the
large configs); BatchNorm statistics are always fp32.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

# resnet_type -> (block kind, stage depths, channel expansion)
RESNET_SPECS = {
    18: ("basic", (2, 2, 2, 2), 1),
    34: ("basic", (3, 4, 6, 3), 1),
    50: ("bottleneck", (3, 4, 6, 3), 4),
    101: ("bottleneck", (3, 4, 23, 3), 4),
    152: ("bottleneck", (3, 8, 36, 3), 4),
}

_STAGE_WIDTHS = (64, 128, 256, 512)


class _BN(nn.Module):
    """BatchNorm with torch-compatible defaults; stats in fp32."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,  # torch momentum=0.1 == keep 0.9 of the old stat
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


def _conv(features: int, kernel: int, stride: int, dtype, name=None):
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(kernel // 2, kernel // 2)] * 2,
        use_bias=False,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )


class BasicBlock(nn.Module):
    features: int
    stride: int
    dtype: Any

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        y = _conv(self.features, 3, self.stride, self.dtype, name="conv1")(x)
        y = _BN(self.dtype, name="bn1")(y, train)
        y = nn.relu(y)
        y = _conv(self.features, 3, 1, self.dtype, name="conv2")(y)
        y = _BN(self.dtype, name="bn2")(y, train)
        if residual.shape != y.shape:
            residual = _conv(self.features, 1, self.stride, self.dtype, name="down_conv")(x)
            residual = _BN(self.dtype, name="down_bn")(residual, train)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output is 4x this
    stride: int
    dtype: Any

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        y = _conv(self.features, 1, 1, self.dtype, name="conv1")(x)
        y = _BN(self.dtype, name="bn1")(y, train)
        y = nn.relu(y)
        # v1.5: stride on the 3x3 (torchvision semantics -> weight parity)
        y = _conv(self.features, 3, self.stride, self.dtype, name="conv2")(y)
        y = _BN(self.dtype, name="bn2")(y, train)
        y = nn.relu(y)
        y = _conv(self.features * 4, 1, 1, self.dtype, name="conv3")(y)
        y = _BN(self.dtype, name="bn3")(y, train)
        if residual.shape != y.shape:
            residual = _conv(self.features * 4, 1, self.stride, self.dtype, name="down_conv")(x)
            residual = _BN(self.dtype, name="down_bn")(residual, train)
        return nn.relu(y + residual)


class ResNetBackbone(nn.Module):
    """(B, H, W, 3) image -> (B, H/32, W/32, C) feature map.

    C = 512 for resnet 18/34, 2048 for 50/101/152.
    """

    resnet_type: int = 50
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        kind, depths, expansion = RESNET_SPECS[self.resnet_type]
        block_cls = BasicBlock if kind == "basic" else Bottleneck
        x = x.astype(self.compute_dtype)
        x = nn.Conv(
            64,
            (7, 7),
            strides=(2, 2),
            padding=[(3, 3), (3, 3)],
            use_bias=False,
            dtype=self.compute_dtype,
            param_dtype=jnp.float32,
            name="conv1",
        )(x)
        x = _BN(self.compute_dtype, name="bn1")(x, train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for stage, (width, depth) in enumerate(zip(_STAGE_WIDTHS, depths)):
            for i in range(depth):
                stride = 2 if (stage > 0 and i == 0) else 1
                x = block_cls(
                    width,
                    stride,
                    self.compute_dtype,
                    name=f"layer{stage + 1}_{i}",
                )(x, train)
        return x

    @property
    def out_features(self) -> int:
        _, _, expansion = RESNET_SPECS[self.resnet_type]
        return 512 * expansion
