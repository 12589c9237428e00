"""Fused 1x1-conv (matmul) + BatchNorm-statistics Pallas kernel.

A Bottleneck block's 1x1 convs are plain matmuls over the flattened
spatial axis. XLA runs them at MXU speed but the BatchNorm around them
costs extra full passes over the conv tensors (reference structure:
``common/nets/resnet.py:~Bottleneck`` — conv1x1 -> BN -> ReLU ... ->
conv1x1 -> BN):

  - BN statistics are a separate reduce that re-READS the conv output;
  - the BN-apply + ReLU before the next 1x1 conv WRITES an activation
    tensor that the conv immediately re-reads (and the backward reads
    again for wgrad).

This op fuses both into the matmul while the tiles are in VMEM:

  fused_matmul_bn(x, w, mul, add) -> (y, s1, s2)

  a  = relu(x * mul + add)   # optional per-channel prologue (BN-apply)
  y  = a @ w                 # MXU, fp32 accumulation
  s1 = sum_rows(y)           # BN statistics epilogue, fp32, free:
  s2 = sum_rows(y * y)       #   computed before y leaves VMEM

so the mid-block activation ``a`` never exists in HBM (fwd OR bwd — the
backward recomputes it in-register from ``x``), and the statistics
reduce costs no extra HBM pass. The backward is one kernel producing
dx / dw / dmul / dadd with the same prologue recompute, with the stats
cotangents folded into the local gradient:

  g  = dy + ds1 + 2 * y * ds2      # d/dy of (y, s1, s2) contributions
  dx = (g @ w^T) * relu'(..) * mul
  dw = a^T @ g        dmul = sum(da * relu' * x)    dadd = sum(da * relu')

Statistics are computed from the fp32 accumulator BEFORE the cast to the
compute dtype, so they are slightly MORE accurate than a separate reduce
over a bf16 tensor. mean/var/running-stat updates stay outside in JAX on
(N,)-sized tensors, where autodiff composes with these custom-VJP
primitives.

Mosaic legality: every block's last dim is either a multiple of 128 or
the full array extent (sub-128 channel counts like stage1's 64 run with
partial lane tiles — less MXU-efficient, but those layers are
bandwidth-bound). Row tiles are multiples of 8 (fp32 sublane).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ihpr_tpu.ops.integral_pallas import _interpret, _use_pallas

# Whole-kernel scoped-VMEM budget (estimated). Mosaic's 16 MB scoped
# stack limit is hard and its real accounting runs ~1.3x above the naive
# blocks+scratch sum (measured: a 12.6 MB naive fwd estimate compiled to
# 16.00 MB and was rejected), so the tile chooser targets 6 MB estimated
# per kernel — ~8 MB actual, half the limit.
_VMEM_BUDGET = 6 * 1024 * 1024


def _dot_precision(dtype):
    # Same rule as the fused head kernel: fp32 operands must MEAN fp32.
    return (
        jax.lax.Precision.HIGHEST
        if dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def _fwd_costs(k: int, n: int, item: int) -> tuple[int, int]:
    """(bytes per tile row, fixed bytes) of the forward kernel: x and y
    tiles double-buffered by the Mosaic pipeline + an fp32 accumulator
    row term; w (2x margin) + the resident (1, N) stats outputs fixed."""
    return 2 * (k + n) * item + 4 * n, 2 * k * n * item + 8 * n


def _bwd_costs(k: int, n: int, item: int) -> tuple[int, int]:
    """Backward: x, y, dy, dx tiles double-buffered + fp32 g/da temps;
    w (2x margin), the VMEM-resident fp32 dw block, and dmul/dadd."""
    return (
        4 * (k + n) * item + 4 * (k + n),
        k * n * (2 * item + 4) + 8 * k + 8 * n,
    )


def _row_tile(m: int, k: int, n: int, itemsize: int, bwd: bool) -> int | None:
    """Largest divisor of m that is a multiple of 256 (generous sublane
    alignment for both dtypes) and keeps the kernel's estimated scoped
    VMEM under ``_VMEM_BUDGET``; None if no such divisor (callers fall
    back to XLA)."""
    row_b, fixed_b = (_bwd_costs if bwd else _fwd_costs)(k, n, itemsize)
    cap = max(0, (_VMEM_BUDGET - fixed_b) // row_b)
    cap = min(cap, m)
    if cap < 8:
        return None
    for t in range(cap - cap % 256, 255, -256):
        if m % t == 0:
            return t
    return m if m <= cap else None


def supported(m: int, k: int, n: int, itemsize: int = 2) -> bool:
    """Shapes the kernel accepts: row count tileable within the VMEM
    budget for BOTH directions, channel axes either 128-multiples or
    small-but-full extents (Mosaic lane rule)."""
    ok_axis = lambda c: c % 128 == 0 or c <= 256
    return (
        m % 8 == 0
        and ok_axis(k)
        and ok_axis(n)
        and _row_tile(m, k, n, itemsize, bwd=False) is not None
        and _row_tile(m, k, n, itemsize, bwd=True) is not None
    )


def _prologue(x, mul_ref, add_ref):
    if mul_ref is None:
        return x
    xf = x.astype(jnp.float32)
    a = xf * mul_ref[0:1] + add_ref[0:1]
    return jnp.maximum(a, 0.0).astype(x.dtype)


def _fwd_kernel(*refs, apply_in: bool, n: int):
    # Stats accumulate directly into the constant-index output blocks —
    # Mosaic keeps them resident in VMEM across the whole grid (output
    # revisiting), so no scratch copy and no extra footprint.
    if apply_in:
        x_ref, w_ref, mul_ref, add_ref, y_ref, s1_ref, s2_ref = refs
    else:
        x_ref, w_ref, y_ref, s1_ref, s2_ref = refs
        mul_ref = add_ref = None
    mi = pl.program_id(0)
    a = _prologue(x_ref[...], mul_ref, add_ref)
    yf = jnp.dot(
        a,
        w_ref[...],
        preferred_element_type=jnp.float32,
        precision=_dot_precision(a.dtype),
    )
    y_ref[...] = yf.astype(y_ref.dtype)
    s1 = jnp.sum(yf, axis=0, keepdims=True)  # (1, N) fp32
    s2 = jnp.sum(yf * yf, axis=0, keepdims=True)
    s1_ref[...] = jnp.where(mi == 0, s1, s1_ref[...] + s1)
    s2_ref[...] = jnp.where(mi == 0, s2, s2_ref[...] + s2)


def _bwd_kernel(*refs, apply_in: bool, n: int, k: int):
    # dw / dmul / dadd accumulate directly into their constant-index
    # output blocks (VMEM-resident across the grid) — no scratch.
    if apply_in:
        (x_ref, w_ref, mul_ref, add_ref, y_ref, dy_ref, ds_ref,
         dx_ref, dw_ref, dmul_ref, dadd_ref) = refs
    else:
        (x_ref, w_ref, y_ref, dy_ref, ds_ref, dx_ref, dw_ref) = refs
        mul_ref = add_ref = dmul_ref = dadd_ref = None
    mi = pl.program_id(0)
    x = x_ref[...]
    w = w_ref[...]
    prec = _dot_precision(x.dtype)

    # g = dy + ds1 + 2*y*ds2 in fp32 (ds rows: [ds1; ds2] as (2, N)).
    g = (
        dy_ref[...].astype(jnp.float32)
        + ds_ref[0:1]
        + 2.0 * y_ref[...].astype(jnp.float32) * ds_ref[1:2]
    )
    gc = g.astype(x.dtype)

    a = _prologue(x, mul_ref, add_ref)
    dw_c = jax.lax.dot_general(
        a, gc, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )  # (K, N)
    dw_ref[...] = jnp.where(mi == 0, dw_c, dw_ref[...] + dw_c)

    da = jax.lax.dot_general(
        gc, w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )  # (M_tile, K) fp32
    if apply_in:
        xf = x.astype(jnp.float32)
        pre = xf * mul_ref[0:1] + add_ref[0:1]
        mask = (pre > 0.0).astype(jnp.float32)
        t = da * mask  # d(pre-activation)
        dx_ref[...] = (t * mul_ref[0:1]).astype(dx_ref.dtype)
        dmul_c = jnp.sum(t * xf, axis=0, keepdims=True)  # (1, K)
        dadd_c = jnp.sum(t, axis=0, keepdims=True)
        dmul_ref[...] = jnp.where(mi == 0, dmul_c, dmul_ref[...] + dmul_c)
        dadd_ref[...] = jnp.where(mi == 0, dadd_c, dadd_ref[...] + dadd_c)
    else:
        dx_ref[...] = da.astype(dx_ref.dtype)


def _const_spec(shape):
    return pl.BlockSpec(
        shape, lambda mi: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )


def _fwd_call(x, w, mul, add):
    m, k = x.shape
    n = w.shape[1]
    apply_in = mul is not None
    tile = _row_tile(m, k, n, x.dtype.itemsize, bwd=False)
    row_spec = lambda c: pl.BlockSpec(
        (tile, c), lambda mi: (mi, 0), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(_fwd_kernel, apply_in=apply_in, n=n)
    ins = [x, w] + ([mul.reshape(1, k), add.reshape(1, k)] if apply_in else [])
    in_specs = [row_spec(k), _const_spec((k, n))] + (
        [_const_spec((1, k))] * 2 if apply_in else []
    )
    y, s1, s2 = pl.pallas_call(
        kernel,
        grid=(m // tile,),
        in_specs=in_specs,
        out_specs=[row_spec(n), _const_spec((1, n)), _const_spec((1, n))],
        out_shape=[
            jax.ShapeDtypeStruct((m, n), x.dtype),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((1, n), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=(m * k + m * n) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(*ins)
    return y, s1.reshape(n), s2.reshape(n)


def _bwd_call(x, w, mul, add, y, dy, ds1, ds2):
    m, k = x.shape
    n = w.shape[1]
    apply_in = mul is not None
    tile = _row_tile(m, k, n, x.dtype.itemsize, bwd=True)
    row_spec = lambda c: pl.BlockSpec(
        (tile, c), lambda mi: (mi, 0), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(_bwd_kernel, apply_in=apply_in, n=n, k=k)
    ds = jnp.concatenate([ds1.reshape(1, n), ds2.reshape(1, n)], axis=0)
    ins = [x, w]
    in_specs = [row_spec(k), _const_spec((k, n))]
    if apply_in:
        ins += [mul.reshape(1, k), add.reshape(1, k)]
        in_specs += [_const_spec((1, k))] * 2
    ins += [y, dy, ds]
    in_specs += [row_spec(n), row_spec(n), _const_spec((2, n))]
    out_specs = [row_spec(k), _const_spec((k, n))]
    out_shape = [
        jax.ShapeDtypeStruct((m, k), x.dtype),
        jax.ShapeDtypeStruct((k, n), jnp.float32),
    ]
    if apply_in:
        out_specs += [_const_spec((1, k)), _const_spec((1, k))]
        out_shape += [
            jax.ShapeDtypeStruct((1, k), jnp.float32),
            jax.ShapeDtypeStruct((1, k), jnp.float32),
        ]
    outs = pl.pallas_call(
        kernel,
        grid=(m // tile,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=6 * m * k * n,
            bytes_accessed=(2 * m * k + 2 * m * n) * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(*ins)
    if apply_in:
        dx, dw, dmul, dadd = outs
        return dx, dw, dmul.reshape(k), dadd.reshape(k)
    dx, dw = outs
    return dx, dw, None, None


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _fused_apply(x, w, mul, add):
    y, s1, s2 = _fwd_call(x, w, mul, add)
    return y, s1, s2


def _fused_apply_fwd(x, w, mul, add):
    y, s1, s2 = _fwd_call(x, w, mul, add)
    return (y, s1, s2), (x, w, mul, add, y)


def _fused_apply_bwd(res, cts):
    x, w, mul, add, y = res
    dy, ds1, ds2 = cts
    dx, dw, dmul, dadd = _bwd_call(x, w, mul, add, y, dy, ds1, ds2)
    return dx, dw.astype(w.dtype), dmul, dadd


_fused_apply.defvjp(_fused_apply_fwd, _fused_apply_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _fused_plain(x, w):
    y, s1, s2 = _fwd_call(x, w, None, None)
    return y, s1, s2


def _fused_plain_fwd(x, w):
    y, s1, s2 = _fwd_call(x, w, None, None)
    return (y, s1, s2), (x, w, y)


def _fused_plain_bwd(res, cts):
    x, w, y = res
    dy, ds1, ds2 = cts
    dx, dw, _, _ = _bwd_call(x, w, None, None, y, dy, ds1, ds2)
    return dx, dw.astype(w.dtype)


_fused_plain.defvjp(_fused_plain_fwd, _fused_plain_bwd)


def _reference(x, w, mul, add):
    """Plain-JAX twin (also the fallback path): identical math, lets XLA
    fuse what it can. Used when shapes are unsupported or off-TPU."""
    a = x
    if mul is not None:
        af = x.astype(jnp.float32) * mul + add
        a = jnp.maximum(af, 0.0).astype(x.dtype)
    yf = jnp.dot(
        a,
        w,
        preferred_element_type=jnp.float32,
        precision=_dot_precision(x.dtype),
    )
    y = yf.astype(x.dtype)
    return y, jnp.sum(yf, axis=0), jnp.sum(yf * yf, axis=0)


def fused_matmul_bn(
    x: jax.Array,
    w: jax.Array,
    mul: jax.Array | None = None,
    add: jax.Array | None = None,
    *,
    mesh=None,
    axis: str | None = None,
):
    """(M, K) @ (K, N) with optional per-channel relu(x*mul+add) prologue
    and BN-statistics epilogue. Returns (y, s1, s2): y in x.dtype,
    s1 = colsum(y), s2 = colsum(y^2) in fp32 (computed pre-cast).

    Gradients flow to x, w, mul, add via a single fused backward kernel;
    mean/var/momentum updates belong OUTSIDE on the (N,) outputs.

    ``mesh``: a ``jax.sharding.Mesh`` whose first (or ``axis``-named) axis
    row-shards x — GSPMD has no partitioning rule for pallas_call, so the
    multi-device path runs the kernel per-shard under ``jax.shard_map``
    and psums the statistics into global sums (sync-BN semantics, same as
    the unfused GSPMD path). Gradients flow through the shard_map (psum
    transposes to a broadcast of the stats cotangents).
    """
    m, k = x.shape
    n = w.shape[1]
    if mesh is not None and mesh.size > 1:
        ax = axis or mesh.axis_names[0]
        nshard = mesh.shape[ax]
        if (
            _use_pallas()
            and m % nshard == 0
            and supported(m // nshard, k, n, x.dtype.itemsize)
        ):
            return _sharded_call(x, w, mul, add, mesh, ax)
        # Fallback: plain-JAX twin under GSPMD (XLA partitions the matmul
        # and turns the stats sums into cross-device reduces itself).
    elif _use_pallas() and supported(m, k, n, x.dtype.itemsize):
        if mul is not None:
            return _fused_apply(
                x, w, mul.astype(jnp.float32), add.astype(jnp.float32)
            )
        return _fused_plain(x, w)
    return _reference(
        x,
        w,
        None if mul is None else mul.astype(jnp.float32),
        None if add is None else add.astype(jnp.float32),
    )


def _sharded_call(x, w, mul, add, mesh, ax: str):
    """Row-sharded kernel launch: each device runs the fused kernel on its
    local (M/n, K) shard, then the per-shard statistics are psummed into
    the global column sums. check_vma=False because pallas_call outputs
    carry no varying-mesh-axes annotation."""
    from jax.sharding import PartitionSpec as P

    apply_in = mul is not None

    def local(*args):
        if apply_in:
            y, s1, s2 = _fused_apply(
                args[0], args[1],
                args[2].astype(jnp.float32), args[3].astype(jnp.float32),
            )
        else:
            y, s1, s2 = _fused_plain(args[0], args[1])
        return y, jax.lax.psum(s1, ax), jax.lax.psum(s2, ax)

    rep = P(*(None,) * 2)
    in_specs = [P(ax, None), rep] + ([P(None)] * 2 if apply_in else [])
    f = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(ax, None), P(None), P(None)),
        check_vma=False,
    )
    return f(*([x, w, mul, add] if apply_in else [x, w]))
