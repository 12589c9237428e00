"""Fused 3x3-conv + BatchNorm-statistics Pallas kernel (experiment).

The ResNet bottleneck's 3x3 mid-conv (reference structure:
``common/nets/resnet.py:~Bottleneck`` conv2, stride 1, pad 1) is the
last conv family without a fused-statistics path: ``matmul_bn.py``
covers the 1x1s, but the 3x3's BN still re-reads the conv output from
HBM for its statistics, and the preceding BN-apply+ReLU writes an
activation the conv immediately re-reads. This kernel is the measured
answer to "would a Pallas conv stack with BN-stats epilogues beat XLA's
convs?" (PARITY.md's round-3 open question):

  fused_conv3x3_bn(x, w, mul, add) -> (y, s1, s2)

  a = relu(x * mul + add)            # optional per-channel prologue
  y = conv3x3(a, w), stride 1, SAME  # 9 shifted MXU matmuls
  s1 = sum_pixels(y); s2 = sum_pixels(y*y)   # fp32, pre-cast, in VMEM

Layout: tiles of G whole images (G, H, W, C). A tap (dy, dx) is a
zero-fill shift of the tile (``_shift4``: slice + concat-with-zeros on
the H and W axes — zero-fill IS the SAME-padding semantics, so no
boundary masks), flattened to (T, C) rows and accumulated through the
MXU in fp32. The backward is the mirror: per-tap dw = shift_t(a)^T @ g
and da = Sigma_t shift_{-t}(g) @ w_t^T, with the stats cotangents folded
into g = dy + ds1 + 2*y*ds2 (same algebra as matmul_bn, tested against
autodiff of the plain composition).

Stride-2 conv2s (the first block of each stage) and shapes whose image
plane doesn't tile into the VMEM budget fall back to the plain-XLA twin.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ihpr_tpu.ops.integral_pallas import _interpret, _use_pallas
from ihpr_tpu.ops.matmul_bn import _VMEM_BUDGET, _dot_precision

_TAPS = tuple((dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1))


def _fwd_costs(c: int, n: int, item: int) -> tuple[int, int]:
    """(bytes per tile row, fixed bytes): x/y tiles double-buffered, one
    fp32 accumulator + one rolled-copy temp per row; weights (2x margin)
    + resident (1, N) stats + the two (T, 1) index vectors are charged
    per-row at their padded 128-lane width."""
    per_row = 2 * (c + n) * item + 4 * n + c * item + 2 * 128 * 4
    return per_row, 2 * 9 * c * n * item + 8 * n


def _bwd_costs(c: int, n: int, item: int) -> tuple[int, int]:
    """Backward: x, y, dy, dx tiles double-buffered + fp32 g and dx
    accumulator + a rolled temp; 9 fp32 dw blocks resident + weights."""
    per_row = 4 * (c + n) * item + 4 * n + 4 * c + 4 * n + 2 * 128 * 4
    return per_row, 9 * c * n * (item + 4) + 8 * c + 8 * n


def _images_per_tile(
    b: int, hw: int, c: int, n: int, itemsize: int, bwd: bool
) -> int | None:
    """Largest divisor G of B such that G whole images (G*HW rows, a
    multiple of the bf16 sublane 16 whenever HW is) fit the VMEM budget;
    None if even one image does not fit."""
    row_b, fixed_b = (_bwd_costs if bwd else _fwd_costs)(c, n, itemsize)
    cap = max(0, (_VMEM_BUDGET - fixed_b) // row_b) // hw
    cap = min(cap, b)
    for g in range(cap, 0, -1):
        if b % g == 0:
            return g
    return None


def supported(
    b: int, h: int, w: int, c: int, n: int, stride: int, itemsize: int = 2
) -> bool:
    ok_axis = lambda v: v % 128 == 0 or v <= 256
    return (
        stride == 1
        and (h * w) % 8 == 0
        and w >= 2  # W=1 planes make the dx=+-1 taps zero-extent slices
        # inside _shift4 (degenerate concat operands Mosaic need not
        # support); such planes take the XLA twin
        and ok_axis(c)
        and ok_axis(n)
        and _images_per_tile(b, h * w, c, n, itemsize, bwd=False) is not None
        and _images_per_tile(b, h * w, c, n, itemsize, bwd=True) is not None
    )


def profitable(c: int, n: int) -> bool:
    """Channel-depth gate for the fused path, measured on the real chip
    (2026-08-19). The standalone probe (tools/conv_bn_probe.py) showed
    the 128-channel stage-2 shape losing consistently and the
    256-channel stage-3 shape winning in SOME runs (fwd up to 3.1x) but
    with large run-to-run variance in XLA's own conv timing on this
    tunnel. The decisive in-situ A/B (tools/bench_sweep.py
    fused3_lean128_donate vs lean128_donate, same process, 30 chained
    steps) measured the FUSED full train step SLOWER: 94.75 vs 92.89
    ms/step (-2%) — the same verdict as matmul_bn's fused_1x1: pulling
    convs out of XLA's fusion pipeline costs more than the saved BN
    stats passes, and the custom VJP saves y as an extra residual.
    Production default is therefore fused_conv3=False; the gate only
    shapes which blocks fuse when the knob is turned on for measurement.
    Override: IHPR_CONV3_MIN_CH (default 256)."""
    import os

    min_ch = int(os.environ.get("IHPR_CONV3_MIN_CH", "256"))
    return min(c, n) >= min_ch


def _shift4(v, dy: int, dx: int):
    """Zero-fill tap shift on a (G, H, W, C) tile:
    result[g, r, c] = v[g, r+dy, c+dx], zero outside the image — exactly
    the SAME-padding conv semantics, so no boundary masks are needed.
    Implemented as slice + concat-with-zeros (H is an untiled dim; W is
    the sublane dim — Mosaic compiles the sublane-offset concat, unlike
    pltpu.roll on bf16 rows or lane->1 iota reshapes, both of which
    crash its compiler on this backend; see tools/conv_bn_probe.py)."""
    g, h, w, c = v.shape
    if dy > 0:
        v = jnp.concatenate(
            [v[:, dy:], jnp.zeros((g, dy, w, c), v.dtype)], axis=1
        )
    elif dy < 0:
        v = jnp.concatenate(
            [jnp.zeros((g, -dy, w, c), v.dtype), v[:, :dy]], axis=1
        )
    if dx > 0:
        v = jnp.concatenate(
            [v[:, :, dx:], jnp.zeros((g, h, dx, c), v.dtype)], axis=2
        )
    elif dx < 0:
        v = jnp.concatenate(
            [jnp.zeros((g, h, -dx, c), v.dtype), v[:, :, :dx]], axis=2
        )
    return v


def _prologue(x, mul_ref, add_ref):
    if mul_ref is None:
        return x
    xf = x.astype(jnp.float32)
    return jnp.maximum(xf * mul_ref[0:1] + add_ref[0:1], 0.0).astype(x.dtype)


def _fwd_kernel(*refs, apply_in: bool, g: int, h: int, w: int):
    if apply_in:
        x_ref, w_ref, mul_ref, add_ref, y_ref, s1_ref, s2_ref = refs
    else:
        x_ref, w_ref, y_ref, s1_ref, s2_ref = refs
        mul_ref = add_ref = None
    mi = pl.program_id(0)
    t = g * h * w
    cdim = x_ref.shape[-1]
    a4 = _prologue(
        x_ref[...].reshape(t, cdim), mul_ref, add_ref
    ).reshape(g, h, w, cdim)
    prec = _dot_precision(a4.dtype)
    acc = jnp.zeros((t, w_ref.shape[-1]), jnp.float32)
    for ti, (dy, dx) in enumerate(_TAPS):
        shifted = _shift4(a4, dy, dx).reshape(t, cdim)
        acc = acc + jnp.dot(
            shifted, w_ref[ti], preferred_element_type=jnp.float32,
            precision=prec,
        )
    y_ref[...] = acc.reshape(y_ref.shape).astype(y_ref.dtype)
    s1 = jnp.sum(acc, axis=0, keepdims=True)
    s2 = jnp.sum(acc * acc, axis=0, keepdims=True)
    s1_ref[...] = jnp.where(mi == 0, s1, s1_ref[...] + s1)
    s2_ref[...] = jnp.where(mi == 0, s2, s2_ref[...] + s2)


def _bwd_kernel(*refs, apply_in: bool, g: int, h: int, w: int):
    if apply_in:
        (x_ref, w_ref, mul_ref, add_ref, y_ref, dy_ref, ds_ref,
         dx_ref, dw_ref, dmul_ref, dadd_ref) = refs
    else:
        (x_ref, w_ref, y_ref, dy_ref, ds_ref, dx_ref, dw_ref) = refs
        mul_ref = add_ref = dmul_ref = dadd_ref = None
    mi = pl.program_id(0)
    t = g * h * w
    cdim = x_ref.shape[-1]
    ndim = w_ref.shape[-1]
    x = x_ref[...].reshape(t, cdim)
    prec = _dot_precision(x.dtype)

    gg = (
        dy_ref[...].reshape(t, ndim).astype(jnp.float32)
        + ds_ref[0:1]
        + 2.0 * y_ref[...].reshape(t, ndim).astype(jnp.float32) * ds_ref[1:2]
    )
    gc = gg.astype(x.dtype)
    gc4 = gc.reshape(g, h, w, ndim)

    a4 = _prologue(x, mul_ref, add_ref).reshape(g, h, w, cdim)
    da = jnp.zeros((t, cdim), jnp.float32)
    for ti, (dy, dx) in enumerate(_TAPS):
        # dw_t = shift_t(a)^T @ g — the same shifted operand as forward.
        sa = _shift4(a4, dy, dx).reshape(t, cdim)
        dw_c = jax.lax.dot_general(
            sa, gc, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        dw_ref[ti] = jnp.where(mi == 0, dw_c, dw_ref[ti] + dw_c)
        # da[g, r, c] receives from y[g, r-dy, c-dx]: the REVERSE shift.
        sg = _shift4(gc4, -dy, -dx).reshape(t, ndim)
        da = da + jax.lax.dot_general(
            sg, w_ref[ti], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
    if apply_in:
        xf = x.astype(jnp.float32)
        pre = xf * mul_ref[0:1] + add_ref[0:1]
        mask = (pre > 0.0).astype(jnp.float32)
        tpre = da * mask
        dx_ref[...] = (tpre * mul_ref[0:1]).reshape(dx_ref.shape).astype(dx_ref.dtype)
        dmul_c = jnp.sum(tpre * xf, axis=0, keepdims=True)
        dadd_c = jnp.sum(tpre, axis=0, keepdims=True)
        dmul_ref[...] = jnp.where(mi == 0, dmul_c, dmul_ref[...] + dmul_c)
        dadd_ref[...] = jnp.where(mi == 0, dadd_c, dadd_ref[...] + dadd_c)
    else:
        dx_ref[...] = da.reshape(dx_ref.shape).astype(dx_ref.dtype)


def _const_spec(shape):
    return pl.BlockSpec(
        shape, lambda mi: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )


def _img_spec(g: int, h: int, w: int, c: int):
    return pl.BlockSpec(
        (g, h, w, c), lambda mi: (mi, 0, 0, 0), memory_space=pltpu.VMEM
    )


def _fwd_call(x, w9, mul, add):
    b, h, wd, c = x.shape
    n = w9.shape[-1]
    apply_in = mul is not None
    g = _images_per_tile(b, h * wd, c, n, x.dtype.itemsize, bwd=False)
    kernel = functools.partial(_fwd_kernel, apply_in=apply_in, g=g, h=h, w=wd)
    ins = [x, w9] + ([mul.reshape(1, c), add.reshape(1, c)] if apply_in else [])
    in_specs = [_img_spec(g, h, wd, c), _const_spec((9, c, n))] + (
        [_const_spec((1, c))] * 2 if apply_in else []
    )
    hw = h * wd
    y, s1, s2 = pl.pallas_call(
        kernel,
        grid=(b // g,),
        in_specs=in_specs,
        out_specs=[_img_spec(g, h, wd, n), _const_spec((1, n)), _const_spec((1, n))],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, wd, n), x.dtype),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=18 * b * hw * c * n,
            bytes_accessed=(b * hw * (c + n)) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(*ins)
    return y, s1.reshape(n), s2.reshape(n)


def _bwd_call(x, w9, mul, add, y, dy, ds1, ds2):
    b, h, wd, c = x.shape
    n = w9.shape[-1]
    apply_in = mul is not None
    g = _images_per_tile(b, h * wd, c, n, x.dtype.itemsize, bwd=True)
    kernel = functools.partial(_bwd_kernel, apply_in=apply_in, g=g, h=h, w=wd)
    ds = jnp.concatenate([ds1.reshape(1, n), ds2.reshape(1, n)], axis=0)
    ins = [x, w9]
    in_specs = [_img_spec(g, h, wd, c), _const_spec((9, c, n))]
    if apply_in:
        ins += [mul.reshape(1, c), add.reshape(1, c)]
        in_specs += [_const_spec((1, c))] * 2
    ins += [y, dy, ds]
    in_specs += [_img_spec(g, h, wd, n), _img_spec(g, h, wd, n), _const_spec((2, n))]
    out_specs = [_img_spec(g, h, wd, c), _const_spec((9, c, n))]
    out_shape = [
        jax.ShapeDtypeStruct((b, h, wd, c), x.dtype),
        jax.ShapeDtypeStruct((9, c, n), jnp.float32),
    ]
    if apply_in:
        out_specs += [_const_spec((1, c)), _const_spec((1, c))]
        out_shape += [
            jax.ShapeDtypeStruct((1, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ]
    hw = h * wd
    outs = pl.pallas_call(
        kernel,
        grid=(b // g,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=3 * 18 * b * hw * c * n,
            bytes_accessed=(2 * b * hw * (c + n)) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(*ins)
    if apply_in:
        dx, dw, dmul, dadd = outs
        return dx, dw, dmul.reshape(c), dadd.reshape(c)
    dx, dw = outs
    return dx, dw, None, None


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _fused_apply(x, w9, mul, add):
    return _fwd_call(x, w9, mul, add)


def _fused_apply_fwd(x, w9, mul, add):
    y, s1, s2 = _fwd_call(x, w9, mul, add)
    return (y, s1, s2), (x, w9, mul, add, y)


def _fused_apply_bwd(res, cts):
    x, w9, mul, add, y = res
    dy, ds1, ds2 = cts
    dx, dw, dmul, dadd = _bwd_call(x, w9, mul, add, y, dy, ds1, ds2)
    return dx, dw.astype(w9.dtype), dmul, dadd


_fused_apply.defvjp(_fused_apply_fwd, _fused_apply_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _fused_plain(x, w9):
    return _fwd_call(x, w9, None, None)


def _fused_plain_fwd(x, w9):
    y, s1, s2 = _fwd_call(x, w9, None, None)
    return (y, s1, s2), (x, w9, y)


def _fused_plain_bwd(res, cts):
    x, w9, y = res
    dy, ds1, ds2 = cts
    dx, dw, _, _ = _bwd_call(x, w9, None, None, y, dy, ds1, ds2)
    return dx, dw.astype(w9.dtype)


_fused_plain.defvjp(_fused_plain_fwd, _fused_plain_bwd)


def _reference(x, w, mul, add, stride: int):
    """Plain-JAX twin (fallback): conv via lax, stats as separate sums."""
    a = x
    if mul is not None:
        af = x.astype(jnp.float32) * mul + add
        a = jnp.maximum(af, 0.0).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        a, w.astype(a.dtype),
        window_strides=(stride, stride), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=_dot_precision(x.dtype),
    )
    # Stats from the output tensor in fp32 (post-cast for bf16 inputs —
    # the production _LeanBN semantics; the fused kernel's pre-cast stats
    # are slightly MORE accurate, tested to tolerance).
    yf = y.astype(jnp.float32)
    return y, jnp.sum(yf, axis=(0, 1, 2)), jnp.sum(yf * yf, axis=(0, 1, 2))


def fused_conv3x3_bn(
    x: jax.Array,
    w: jax.Array,
    mul: jax.Array | None = None,
    add: jax.Array | None = None,
    *,
    stride: int = 1,
):
    """NHWC (B, H, W, C) x HWIO (3, 3, C, N) SAME conv with optional
    per-channel relu(x*mul+add) prologue and BN-statistics epilogue.
    Returns (y, s1, s2): y in x.dtype, s1 = sum(y) and s2 = sum(y^2) over
    all pixels in fp32 (computed pre-cast inside the kernel).

    Gradients flow to x, w, mul, add through one fused backward kernel;
    mean/var/momentum updates belong outside on the (N,) outputs.
    Unsupported shapes (stride 2, non-tileable planes) take the XLA twin.
    """
    b, h, wd, c = x.shape
    n = w.shape[-1]
    if (
        _use_pallas()
        and w.shape[:2] == (3, 3)
        and supported(b, h, wd, c, n, stride, x.dtype.itemsize)
    ):
        w9 = w.reshape(9, c, n).astype(x.dtype)
        if mul is not None:
            return _fused_apply(
                x, w9, mul.astype(jnp.float32), add.astype(jnp.float32)
            )
        return _fused_plain(x, w9)
    return _reference(
        x, w,
        None if mul is None else mul.astype(jnp.float32),
        None if add is None else add.astype(jnp.float32),
        stride,
    )
