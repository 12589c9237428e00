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
    # Estimate the batch statistics from every s-th image ROW instead of
    # the full tensor. MEASURED OUT on the flagship step (1075 img/s at
    # s=4 vs 1373 full): the strided slice's backward is a full-size
    # pad-scatter plus an add, so bwd GAINS passes; kept as the recorded
    # negative result (tools/bwd_experiments.py lean_subN).
    stats_subsample: int = 1
    # Do not backpropagate through mean/var (lax.stop_gradient on the
    # batch statistics): forward semantics identical to standard BN, but
    # the stats-backward reduces (d mean / d var terms — reduces over
    # dy and dy*x per BN) disappear. MEASURED OUT for from-scratch
    # training: 1512 img/s/chip but the flagship accuracy run plateaus
    # at chance with exploding |g| — without the stats backward, BN
    # loses its gradient-projection property (updates inflate
    # activations unchecked). "var": stop-grad the VARIANCE only — this
    # deletes the bwd reduce of dy*x (the one that re-reads the
    # activation tensor) while keeping the mean-centering projection
    # (a dy-only reduce) that stabilizes training.
    stats_stop_grad: str | bool = False

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
            s = self.stats_subsample
            if s > 1 and x.ndim == 4 and x.shape[1] >= 2 * s:
                # Offset keeps the subsample centered-ish; H need not
                # divide s (strided slice handles the remainder).
                x_stats = x[:, (s - 1) // 2 :: s]
            else:
                x_stats = x
            xf = x_stats.astype(
                self.dtype if self.stats_in_dtype else jnp.float32
            )
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
            if self.stats_stop_grad:
                if self.stats_stop_grad != "var":
                    mean = jax.lax.stop_gradient(mean)
                var = jax.lax.stop_gradient(var)
        rstd = jax.lax.rsqrt(var + self.epsilon)
        mul = (scale * rstd).astype(self.dtype)
        add = (bias - mean * scale * rstd).astype(self.dtype)
        return x.astype(self.dtype) * mul + add


class _BN(nn.Module):
    """BatchNorm with torch-compatible defaults; stats in fp32.

    ``mode``: "flax" = nn.BatchNorm; "lean" = ``_LeanBN`` (bf16 normalize
    chain; same tree layout); "lean_subN" (e.g. "lean_sub4") = lean with
    batch statistics estimated from every N-th image row (see
    ``_LeanBN.stats_subsample``); "frozen" = ``_LeanBN`` forced onto
    running statistics even in train mode — a MEASUREMENT mode that
    deletes every batch-stats reduce (fwd) and stats-backward term while
    keeping the apply FMA, bounding from above what any conv+BN-stats
    fusion could save (tools/bwd_experiments.py). The inner module is
    named ``BatchNorm_0`` in all modes so they are
    checkpoint-interchangeable."""

    dtype: Any = jnp.float32
    mode: str = "flax"

    @nn.compact
    def __call__(self, x, train: bool):
        if self.mode.startswith("lean") or self.mode == "frozen":
            sub = (
                int(self.mode[len("lean_sub") :])
                if self.mode.startswith("lean_sub")
                else 1
            )
            return _LeanBN(
                self.dtype,
                momentum=0.9,
                epsilon=1e-5,
                stats_in_dtype=self.mode == "lean16",
                stats_subsample=sub,
                stats_stop_grad=(
                    "var" if self.mode == "lean_sgv" else self.mode == "lean_sg"
                ),
                name="BatchNorm_0",
            )(x, use_running_average=(not train) or self.mode == "frozen")
        return nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,  # torch momentum=0.1 == keep 0.9 of the old stat
            epsilon=1e-5,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


def _conv(features: int, kernel: int, stride: int, dtype, name=None, precision=None):
    conv = nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(kernel // 2, kernel // 2)] * 2,
        use_bias=False,
        dtype=dtype,
        param_dtype=jnp.float32,
        precision=precision,
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
    fused_1x1: bool = False  # no 1x1 convs to fuse; accepted for symmetry
    fused_conv3: bool = False  # likewise symmetry-only (basic blocks stay XLA)
    mesh: Any = None  # likewise symmetry-only
    # Per-call matmul precision (None = ambient default); 'highest' makes
    # fp32 configs true-fp32 without mutating process-global jax config.
    precision: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        residual = x
        p = self.precision
        y = _conv(self.features, 3, self.stride, self.dtype, name="conv1", precision=p)(x)
        y = _BN(self.dtype, self.bn_mode, name="bn1")(y, train)
        y = nn.relu(y)
        y = _conv(self.features, 3, 1, self.dtype, name="conv2", precision=p)(y)
        y = _BN(self.dtype, self.bn_mode, name="bn2")(y, train)
        if residual.shape != y.shape:
            residual = _conv(self.features, 1, self.stride, self.dtype, name="down_conv", precision=p)(x)
            residual = _BN(self.dtype, self.bn_mode, name="down_bn")(residual, train)
        return nn.relu(y + residual)


class _ConvParam(nn.Module):
    """Bare kernel parameter for a conv consumed by a fused Pallas kernel
    (matmul_bn's 1x1s, conv_bn's 3x3); path/shape/init match
    ``nn.Conv(features, (k, k), use_bias=False)`` so checkpoints and the
    torch converter see the identical tree."""

    features: int
    ksize: int = 1

    @nn.compact
    def __call__(self, cin: int):
        return self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.ksize, self.ksize, cin, self.features),
            jnp.float32,
        )


class _SumBN(nn.Module):
    """BatchNorm parameterized by PRE-COMPUTED per-channel sums: takes
    (s1, s2, count) from a fused conv+stats kernel (ops/matmul_bn.py) and
    returns the folded (mul, add) pair, updating running stats exactly
    like ``_LeanBN``. Params/variables live under an inner scope named
    ``BatchNorm_0`` so the tree is interchangeable with ``_BN``."""

    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, s1, s2, count: float):
        return _SumBNInner(self.momentum, self.epsilon, name="BatchNorm_0")(
            s1, s2, count
        )


class _SumBNInner(nn.Module):
    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, s1, s2, count: float):
        import jax

        feat = s1.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (feat,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feat,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((feat,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((feat,), jnp.float32)
        )
        mean = s1 / count
        var = jnp.maximum(s2 / count - mean * mean, 0.0)
        if not self.is_initializing():
            ra_mean.value = (
                self.momentum * ra_mean.value + (1 - self.momentum) * mean
            )
            ra_var.value = (
                self.momentum * ra_var.value + (1 - self.momentum) * var
            )
        rstd = jax.lax.rsqrt(var + self.epsilon)
        mul = scale * rstd
        add = bias - mean * scale * rstd
        return mul, add


class Bottleneck(nn.Module):
    features: int  # bottleneck width; output is 4x this
    stride: int
    dtype: Any
    bn_mode: str = "flax"
    fused_1x1: bool = False
    # Fuse the 3x3 mid-conv with the bn1-apply+ReLU prologue and the
    # bn2-statistics epilogue (ops/conv_bn.py): the conv1->conv2
    # activation never exists in HBM and bn2's statistics cost no extra
    # pass. Measured out in situ (round 4: fused step 94.75 vs 92.89
    # ms/step) — off in production; train-only, stride-1 blocks with
    # tileable planes >=256 ch (conv_bn.profitable), others fall through
    # to the plain path. Single-device only (no shard_map launch).
    fused_conv3: bool = False
    # Device mesh whose first axis row-shards the batch: the fused kernel
    # runs per-shard under shard_map with psummed statistics (sync-BN).
    # None = single-device launch.
    mesh: Any = None
    # Per-call matmul precision (None = ambient default). The fused-1x1
    # Pallas path pins precision from operand dtype itself.
    precision: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        # Both fused paths bake LIVE-batch statistics with lean-BN
        # semantics into _SumBN, so they only stand in for bn_mode="lean"
        # (the production mode). Measurement modes whose whole point is a
        # different stats treatment (frozen / lean_sg(v) / lean_subN /
        # flax's promoted normalize) must keep the plain path or the A/B
        # would silently measure lean instead.
        fusable_bn = self.bn_mode == "lean"
        if self.fused_conv3 and fusable_bn and train and self.stride == 1 and (
            self.mesh is None or self.mesh.size == 1
        ):
            from ihpr_tpu.ops import conv_bn

            b, h, w_sp, _ = x.shape
            e = self.features
            if conv_bn.profitable(e, e) and conv_bn.supported(
                b, h, w_sp, e, e, 1, jnp.dtype(self.dtype).itemsize
            ):
                return self._fused3_call(x, train)
        if self.fused_1x1 and fusable_bn and train:
            from ihpr_tpu.ops import matmul_bn

            b, h, w_sp, cin = x.shape
            nshard = self.mesh.size if self.mesh is not None else 1
            m = b * h * w_sp
            e = self.features
            if m % nshard == 0 and matmul_bn.supported(
                m // nshard, cin, e, jnp.dtype(self.dtype).itemsize
            ):
                return self._fused_call(x, train)
        residual = x
        p = self.precision
        y = _conv(self.features, 1, 1, self.dtype, name="conv1", precision=p)(x)
        y = _BN(self.dtype, self.bn_mode, name="bn1")(y, train)
        y = nn.relu(y)
        # v1.5: stride on the 3x3 (torchvision semantics -> weight parity)
        y = _conv(self.features, 3, self.stride, self.dtype, name="conv2", precision=p)(y)
        y = _BN(self.dtype, self.bn_mode, name="bn2")(y, train)
        y = nn.relu(y)
        y = _conv(self.features * 4, 1, 1, self.dtype, name="conv3", precision=p)(y)
        y = _BN(self.dtype, self.bn_mode, name="bn3")(y, train)
        if residual.shape != y.shape:
            residual = _conv(self.features * 4, 1, self.stride, self.dtype, name="down_conv", precision=p)(x)
            residual = _BN(self.dtype, self.bn_mode, name="down_bn")(residual, train)
        return nn.relu(y + residual)

    def _fused_call(self, x, train: bool):
        """Fused-1x1 train path (ops/matmul_bn.py): conv1 and conv3 run as
        Pallas matmuls with a BN-statistics epilogue, conv3 additionally
        with the bn2-apply+ReLU prologue — bn1/bn3 statistics cost no
        extra HBM pass and conv3's input activation never materializes
        (fwd or bwd). Identical parameter tree to the unfused path; eval
        (running statistics) always takes the unfused path."""
        from ihpr_tpu.ops.matmul_bn import fused_matmul_bn

        residual = x
        b, h, w_sp, cin = x.shape
        e = self.features
        dt = self.dtype
        w1 = _ConvParam(e, name="conv1")(cin).reshape(cin, e).astype(dt)
        x2 = x.astype(dt).reshape(b * h * w_sp, cin)
        y1, s1_1, s2_1 = fused_matmul_bn(x2, w1, mesh=self.mesh)
        mul1, add1 = _SumBN(name="bn1")(s1_1, s2_1, float(x2.shape[0]))
        a1 = jnp.maximum(y1 * mul1.astype(dt) + add1.astype(dt), 0)
        a1 = a1.reshape(b, h, w_sp, e)
        c2 = _conv(e, 3, self.stride, dt, name="conv2", precision=self.precision)(a1)
        bb, h2, w2, _ = c2.shape
        m2 = bb * h2 * w2
        c2f = c2.astype(jnp.float32).reshape(m2, e)
        s1_2 = jnp.sum(c2f, axis=0)
        s2_2 = jnp.sum(c2f * c2f, axis=0)
        mul2, add2 = _SumBN(name="bn2")(s1_2, s2_2, float(m2))
        w3 = _ConvParam(e * 4, name="conv3")(e).reshape(e, e * 4).astype(dt)
        y3, s1_3, s2_3 = fused_matmul_bn(
            c2.reshape(m2, e), w3, mul2, add2, mesh=self.mesh
        )
        mul3, add3 = _SumBN(name="bn3")(s1_3, s2_3, float(m2))
        y3 = (y3 * mul3.astype(dt) + add3.astype(dt)).reshape(bb, h2, w2, e * 4)
        if residual.shape != y3.shape:
            residual = _conv(e * 4, 1, self.stride, dt, name="down_conv", precision=self.precision)(x)
            residual = _BN(dt, self.bn_mode, name="down_bn")(residual, train)
        return nn.relu(y3 + residual)

    def _fused3_call(self, x, train: bool):
        """Fused-3x3 train path (ops/conv_bn.py): conv2 runs as a Pallas
        conv with the bn1-apply+ReLU prologue and the bn2-statistics
        epilogue, so the conv1->conv2 activation never materializes in
        HBM (fwd or bwd) and bn2's statistics need no extra pass over
        conv2's output. conv1/conv3 stay XLA (1x1 matmuls) with bn1's
        statistics summed in fp32 from conv1's output — XLA fuses those
        sums into the matmul's epilogue. Identical parameter tree to the
        plain path (bn1/bn2 via _SumBN share _BN's inner scope name);
        eval always takes the unfused path (running statistics)."""
        from ihpr_tpu.ops.conv_bn import fused_conv3x3_bn

        residual = x
        b, h, w_sp, cin = x.shape
        e = self.features
        dt = self.dtype
        p = self.precision
        c1 = _conv(e, 1, 1, dt, name="conv1", precision=p)(x)
        m1 = float(b * h * w_sp)
        c1f = c1.astype(jnp.float32)
        mul1, add1 = _SumBN(name="bn1")(
            jnp.sum(c1f, axis=(0, 1, 2)), jnp.sum(c1f * c1f, axis=(0, 1, 2)), m1
        )
        w2 = _ConvParam(e, 3, name="conv2")(e)
        c2, s1_2, s2_2 = fused_conv3x3_bn(c1, w2, mul1, add1)
        mul2, add2 = _SumBN(name="bn2")(s1_2, s2_2, m1)
        a2 = jnp.maximum(c2 * mul2.astype(dt) + add2.astype(dt), 0)
        y = _conv(e * 4, 1, 1, dt, name="conv3", precision=p)(a2)
        y = _BN(dt, self.bn_mode, name="bn3")(y, train)
        if residual.shape != y.shape:
            residual = _conv(e * 4, 1, self.stride, dt, name="down_conv", precision=p)(x)
            residual = _BN(dt, self.bn_mode, name="down_bn")(residual, train)
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
    # Fuse Bottleneck 1x1 convs with BN statistics (train-mode Pallas
    # kernel, ops/matmul_bn.py); see ModelConfig.fused_1x1.
    fused_1x1: bool = False
    # Fuse Bottleneck 3x3 mid-convs with the bn1-apply+ReLU prologue and
    # bn2-statistics epilogue (ops/conv_bn.py); see ModelConfig.fused_conv3.
    fused_conv3: bool = False
    # Mesh for the fused kernel's shard_map launch under data parallelism
    # (statistics psummed to sync-BN); None = single-device.
    mesh: Any = None
    # Per-call matmul precision for every conv (None = ambient default).
    # 'highest' gives true-fp32 arithmetic WITHOUT mutating the process-
    # wide jax_default_matmul_precision (round-3 advisor finding).
    precision: Any = None

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
                precision=self.precision,
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
                precision=self.precision,
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
                    fused_1x1=self.fused_1x1,
                    fused_conv3=self.fused_conv3,
                    mesh=self.mesh,
                    precision=self.precision,
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
