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


class _LeanBN(nn.Module):
    """BatchNorm with fp32 batch statistics but the normalize folded into
    ONE per-channel FMA executed in ``dtype``.

    Same math as ``nn.BatchNorm`` (fast-variance E[x^2]-E[x]^2, fp32
    reduces, torch momentum semantics) — the difference is the elementwise
    chain: flax normalizes as (x - mean) * rsqrt * scale + bias with fp32
    promotion, while this precomputes per-channel mul/add in fp32 and
    applies ``x * mul + add`` in ``dtype``, so in bf16 configs the fwd AND
    AD-generated bwd elementwise traffic over the activation tensor stays
    bf16 (backbone backward is HBM-bound on exactly these chains —
    PARITY.md MFU breakdown). Identical arithmetic at fp32. Param /
    batch_stats tree layout matches ``nn.BatchNorm`` (scale, bias, mean,
    var), so checkpoints and the torch converter are unaffected."""

    dtype: Any = jnp.float32
    momentum: float = 0.9
    epsilon: float = 1e-5
    # Compute the batch statistics in ``dtype`` instead of fp32 — the
    # VERDICT-r2-requested "bf16 BN statistics" datapoint. Measured ~noise
    # perf-wise (XLA upcasts in-register inside the fused reduce either
    # way) and E[x^2]-E[x]^2 in bf16 is catastrophically cancellative, so
    # this stays a measurement mode, not a production one.
    stats_in_dtype: bool = False

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        import jax

        feat = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((feat,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((feat,), jnp.float32)
        )
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(self.dtype if self.stats_in_dtype else jnp.float32)
            mean = jnp.mean(xf, axis=(0, 1, 2))
            var = jnp.maximum(
                jnp.mean(xf * xf, axis=(0, 1, 2)) - mean * mean, 0.0
            )
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean
                )
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * var
                )
        rstd = jax.lax.rsqrt(var + self.epsilon)
        mul = (scale * rstd).astype(self.dtype)
        add = (bias - mean * scale * rstd).astype(self.dtype)
        return x.astype(self.dtype) * mul + add


class _BN(nn.Module):
    """BatchNorm with torch-compatible defaults; stats in fp32.

    ``mode``: "flax" = nn.BatchNorm; "lean" = ``_LeanBN`` (bf16 normalize
    chain; same tree layout). The inner module is named ``BatchNorm_0`` in
    both modes so the two are checkpoint-interchangeable."""

    dtype: Any = jnp.float32
    mode: str = "flax"

    @nn.compact
    def __call__(self, x, train: bool):
        if self.mode in ("lean", "lean16"):
            return _LeanBN(
                self.dtype,
                momentum=0.9,
                epsilon=1e-5,
                stats_in_dtype=self.mode == "lean16",
                name="BatchNorm_0",
            )(x, use_running_average=not train)
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,  # torch momentum=0.1 == keep 0.9 of the old stat
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


def _conv(features: int, kernel: int, stride: int, dtype, name=None):
    conv = nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(kernel // 2, kernel // 2)] * 2,
        use_bias=False,
        dtype=dtype,
        param_dtype=jnp.float32,
        name=name,
    )

    def conv_named(x):
        from jax.ad_checkpoint import checkpoint_name

        # Tag conv outputs so the "conv_outs" remat policy can save exactly
        # the matmul results and recompute only the BN/ReLU elementwise
        # tail in backward (no conv recompute). No-op without remat.
        return checkpoint_name(conv(x), "conv_out")

    return conv_named


class BasicBlock(nn.Module):
    features: int
    stride: int
    dtype: Any
    bn_mode: str = "flax"

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        y = _conv(self.features, 3, self.stride, self.dtype, name="conv1")(x)
        y = _BN(self.dtype, self.bn_mode, name="bn1")(y, train)
        y = nn.relu(y)
        y = _conv(self.features, 3, 1, self.dtype, name="conv2")(y)
        y = _BN(self.dtype, self.bn_mode, name="bn2")(y, train)
        if residual.shape != y.shape:
            residual = _conv(self.features, 1, self.stride, self.dtype, name="down_conv")(x)
            residual = _BN(self.dtype, self.bn_mode, name="down_bn")(residual, train)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output is 4x this
    stride: int
    dtype: Any
    bn_mode: str = "flax"

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        y = _conv(self.features, 1, 1, self.dtype, name="conv1")(x)
        y = _BN(self.dtype, self.bn_mode, name="bn1")(y, train)
        y = nn.relu(y)
        # v1.5: stride on the 3x3 (torchvision semantics -> weight parity)
        y = _conv(self.features, 3, self.stride, self.dtype, name="conv2")(y)
        y = _BN(self.dtype, self.bn_mode, name="bn2")(y, train)
        y = nn.relu(y)
        y = _conv(self.features * 4, 1, 1, self.dtype, name="conv3")(y)
        y = _BN(self.dtype, self.bn_mode, name="bn3")(y, train)
        if residual.shape != y.shape:
            residual = _conv(self.features * 4, 1, self.stride, self.dtype, name="down_conv")(x)
            residual = _BN(self.dtype, self.bn_mode, name="down_bn")(residual, train)
        return nn.relu(y + residual)


class ResNetBackbone(nn.Module):
    """(B, H, W, 3) image -> (B, H/32, W/32, C) feature map.

    C = 512 for resnet 18/34, 2048 for 50/101/152.

    ``s2d_stem``: compute the stem as space-to-depth-2 + a 4x4 stride-1
    conv on 12 channels — mathematically EXACT for a 7x7/2 conv whose
    weights are embedded by ``s2d_stem_kernel`` (3-channel inputs use
    3/128 MXU lanes; the s2d form uses 12 and is several times faster).
    The conv1 param shape becomes (4, 4, 12, 64).
    """

    resnet_type: int = 50
    compute_dtype: Any = jnp.float32
    s2d_stem: bool = False
    bn_mode: str = "flax"
    # Rematerialize each residual block's forward in the backward pass:
    # only block INPUTS are saved; intra-block activations are recomputed.
    # Trades spare MXU FLOPs for HBM residual traffic (the backward is
    # bandwidth-bound; see tools/bwd_experiments.py for measurements).
    block_remat: bool = False
    # With block_remat: "full" saves block inputs only (recomputes convs
    # too — measured 13% SLOWER in situ); "conv_outs" saves every conv
    # output and recomputes only BN/ReLU elementwise.
    remat_policy: str = "full"

    @nn.compact
    def __call__(self, x, train: bool = False):
        kind, depths, expansion = RESNET_SPECS[self.resnet_type]
        block_cls = BasicBlock if kind == "basic" else Bottleneck
        if self.block_remat:
            # static_argnums counts the module instance as argument 0, so
            # ``train`` (a Python bool steering BN mode) is index 2.
            # remat_policy="conv_outs" keeps every conv's OUTPUT as a saved
            # residual and recomputes only the BN/ReLU elementwise tail in
            # backward — no conv recompute, roughly half the saved-residual
            # traffic of no-remat (which keeps conv outs AND relu outs).
            import jax

            policy = (
                jax.checkpoint_policies.save_only_these_names("conv_out")
                if self.remat_policy == "conv_outs"
                else None
            )
            block_cls = nn.remat(block_cls, static_argnums=(2,), policy=policy)
        x = x.astype(self.compute_dtype)
        if self.s2d_stem:
            b, h, w, c = x.shape
            x = (
                x.reshape(b, h // 2, 2, w // 2, 2, c)
                .transpose(0, 1, 3, 2, 4, 5)
                .reshape(b, h // 2, w // 2, 4 * c)
            )
            x = nn.Conv(
                64,
                (4, 4),
                padding=[(2, 1), (2, 1)],
                use_bias=False,
                dtype=self.compute_dtype,
                param_dtype=jnp.float32,
                name="conv1",
            )(x)
        else:
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
        x = _BN(self.compute_dtype, self.bn_mode, name="bn1")(x, train)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for stage, (width, depth) in enumerate(zip(_STAGE_WIDTHS, depths)):
            for i in range(depth):
                stride = 2 if (stage > 0 and i == 0) else 1
                x = block_cls(
                    width,
                    stride,
                    self.compute_dtype,
                    self.bn_mode,
                    name=f"layer{stage + 1}_{i}",
                )(x, train)
        return x

    @property
    def out_features(self) -> int:
        _, _, expansion = RESNET_SPECS[self.resnet_type]
        return 512 * expansion


def s2d_stem_kernel(w7: "np.ndarray") -> "np.ndarray":
    """Embed a (7, 7, C, F) stride-2 stem kernel into the exact (4, 4, 4C, F)
    space-to-depth-2 equivalent.

    Derivation: output(i,j) taps input y = 2i + u - 3; in s2d-2 coordinates
    y = 2r + py, so r - i = floor((u-3)/2) and py = (u-3) mod 2. With
    asymmetric padding (2, 1) the 4x4 kernel index is a = r - i + 2; s2d
    channel layout is (py*2 + px)*C + c (matching the reshape/transpose in
    ResNetBackbone). Unused taps stay zero."""
    import numpy as np

    k, _, c, f = w7.shape
    assert k == 7, w7.shape
    out = np.zeros((4, 4, 4 * c, f), w7.dtype)
    for u in range(7):
        a = (u - 3) // 2 + 2
        py = (u - 3) % 2
        for v in range(7):
            bb = (v - 3) // 2 + 2
            px = (v - 3) % 2
            out[a, bb, (py * 2 + px) * c : (py * 2 + px + 1) * c] = w7[u, v]
    return out
