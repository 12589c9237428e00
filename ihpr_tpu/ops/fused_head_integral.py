"""Fused final-1x1-conv + integral soft-argmax Pallas kernel.

The head's last op is a 1x1 conv 256 -> J*D followed by the volumetric
soft-argmax. Run separately, the (B, H*W, J*D) logits volume round-trips
HBM: written by the conv, read by the integral forward, read again by its
backward, and its cotangent written+read around the conv backward —
~4 volume passes (~2.4 GB per 32-batch step).

This kernel fuses them: each grid program takes a (chunk, 256) slab of the
head's penultimate features, computes the logits slab on the MXU
(feat @ W + b), and feeds it STRAIGHT into the online-softmax statistics
tail (integral_pallas._online_stats_tail) — the volume never exists in HBM.
Backward recomputes the logits slab, forms dv in-register
(integral_pallas._dv_from_rows), and contracts it immediately:
    dfeat = dv @ W^T        (chunk, 256)   written out
    dW   += feat^T @ dv     (256, J*D)     accumulated in VMEM scratch
    db   += colsum(dv)      (J*D,)         accumulated in VMEM scratch
with the weight gradients written once by the final grid program. Gradient
math is the exact VJP of (conv -> softmax -> expectation); the logits
recompute is bit-identical to the forward (same matmul, same precision).

Numerics: logit matmuls run at the MXU's native bf16 (same as XLA's conv
lowering) with fp32 accumulation; everything downstream of the exp is fp32.

HBM traffic per step (B=32, 64^3, C=256): read feat 2x (0.27 GB bf16),
write dfeat (0.13 GB) — vs ~2.7 GB unfused. Activation memory also drops by
the 0.6 GB volume, which XLA would otherwise keep as a residual.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ihpr_tpu.ops.integral_pallas import (
    _PAD_VALUE,
    _SEG_LANES,
    _chunk_rows,
    _dv_from_rows,
    _interpret,
    _online_stats_tail,
    _padded_joint_num,
    _segment_matrix,
    _supported,
    fold_bwd_rows,
)


def fused_supported(joint_num: int, depth_dim: int, hw: int, channels: int) -> bool:
    return (
        _supported(joint_num, depth_dim, hw)
        and channels % 128 == 0
        and (_chunk_rows(hw, joint_num * depth_dim) or 0) % 8 == 0
    )


def _pad_plan(joint_num: int, depth_dim: int, hw: int, channels: int) -> int | None:
    """Fused-launch plan: the padded joint count J' >= J to run the kernel
    at (J itself when J*D is already lane-aligned), or None when no legal
    tiling exists (callers fall back). Mirrors ``_dispatch``'s volume
    padding, applied to the final-conv WEIGHTS instead: padded output
    lanes get zero kernel columns and a ``_PAD_VALUE`` bias, so their
    logits sit far below every real lane (never win the shared max, s=0,
    p=0 in the backward) and the padded coords slice off outside the
    custom_vjp — autodiff through pad/slice is JAX's."""
    if fused_supported(joint_num, depth_dim, hw, channels):
        return joint_num
    j2 = _padded_joint_num(joint_num, depth_dim, hw)
    # Padding beyond 2x the real joints wastes more than the fusion saves.
    if (
        j2 is not None
        and j2 <= 2 * joint_num
        and fused_supported(j2, depth_dim, hw, channels)
    ):
        return j2
    return None


def _pad_weights(kernel, bias, joint_num: int, j2: int, depth_dim: int):
    if j2 == joint_num:
        return kernel, bias
    pad = (j2 - joint_num) * depth_dim
    return (
        jnp.pad(kernel, ((0, 0), (0, pad))),
        jnp.pad(bias, (0, pad), constant_values=_PAD_VALUE),
    )


def _use_exp2() -> bool:
    """IHPR_EXP2=1 switches the fused kernel's softmax to base 2 with the
    log2e factor folded into the final-conv weights — mathematically the
    identical softmax, minus exp's internal *log2e VPU pass over the
    volume. Off by default pending the real-chip A/B (tools/exp_probe.py
    measures the marginal exp/exp2 pass cost)."""
    import os

    return os.environ.get("IHPR_EXP2", "0") == "1"


def _use_bexp() -> bool:
    """IHPR_BEXP=1: recompute the backward's probabilities with a bf16
    exp (fp32 stabilized argument, bf16 transcendental, fp32 downstream).
    MEASUREMENT MODE — perturbs gradients by ~2^-9 relative (forward and
    the parity contract are untouched), so adoption requires both the
    exp_probe showing a 2x bf16 VPU exp rate AND a from-scratch accuracy
    A/B like the lean_sg gate. Composes with IHPR_EXP2, but the combo
    perturbs aggregate gradients ~10x more than bexp alone (base-2
    arguments are log2(e)x larger, so the bf16 argument cast loses more:
    measured 2.8% vs 0.03% on |dW| sums in interpret mode) — gate the
    combo on its own accuracy A/B, not bexp's."""
    import os

    return os.environ.get("IHPR_BEXP", "0") == "1"


def _dot_precision(dtype):
    """Kernel matmul precision, pinned from the operand dtype so the
    ambient ``jax_default_matmul_precision`` cannot leak in (Mosaic
    rejects fp32 contract precision on bf16 operands): fp32 operands run
    HIGHEST — fp32 must MEAN fp32 in this kernel, matching the parity
    configs — and bf16 operands run the native bf16 MXU pass."""
    return (
        jax.lax.Precision.HIGHEST
        if dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def _fwd_kernel(
    feat_ref, w_ref, b_ref, seg_ref, vout_ref, m_ref, macc_ref, acc_ref,
    *, d, w, chunk, base2
):
    feat = feat_ref[0]  # (chunk, C) compute dtype
    v = (
        jnp.dot(
            feat,
            w_ref[...],
            preferred_element_type=jnp.float32,
            precision=_dot_precision(feat.dtype),
        )
        + b_ref[0:1].astype(jnp.float32)
    )  # (chunk, J*D) fp32 logits (base-2 domain when base2: W,b pre-scaled)
    _online_stats_tail(
        v, seg_ref, vout_ref, m_ref, macc_ref, acc_ref, d=d, w=w, chunk=chunk,
        exp_fn=jnp.exp2 if base2 else jnp.exp,
    )


def _bwd_kernel(
    feat_ref, w_ref, b_ref, rows_ref, dfeat_ref, dw_ref, db_ref,
    dw_acc, db_acc, *, d, w, chunk, base2, bexp=False
):
    bi = pl.program_id(0)
    ci = pl.program_id(1)
    nb = pl.num_programs(0)
    nc = pl.num_programs(1)
    feat = feat_ref[0]  # (chunk, C)
    wmat = w_ref[...]  # (C, J*D)
    prec = _dot_precision(feat.dtype)
    v = (
        jnp.dot(feat, wmat, preferred_element_type=jnp.float32, precision=prec)
        + b_ref[0:1].astype(jnp.float32)
    )
    # base2: rows carry a ln2 gradient scale, so dv = ln2 * dL/dv and the
    # contraction against the log2e-scaled W yields dfeat exactly; the
    # caller rescales dW/db by log2e once outside.
    exp_fn = jnp.exp2 if base2 else jnp.exp
    if bexp:  # bf16 transcendental, fp32 argument/downstream (see _use_bexp)
        base_fn = exp_fn
        exp_fn = lambda a: base_fn(a.astype(jnp.bfloat16)).astype(jnp.float32)
    dv = _dv_from_rows(
        v, rows_ref[0], w=w, chunk=chunk, exp_fn=exp_fn
    )  # (chunk, J*D) fp32
    dvc = dv.astype(wmat.dtype)

    # dfeat = dv @ W^T (contract the J*D axis; no transpose materialized)
    dfeat_ref[0] = jax.lax.dot_general(
        dvc,
        wmat,
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    ).astype(dfeat_ref.dtype)

    # dW += feat^T @ dv ; db += colsum(dv) — accumulated across the WHOLE
    # grid (batch and chunks run sequentially on one core).
    dw_c = jax.lax.dot_general(
        feat,
        dvc,
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )  # (C, J*D)
    db_c = jnp.sum(dv, axis=0, keepdims=True)  # (1, J*D)
    first = jnp.logical_and(bi == 0, ci == 0)
    dw_acc[...] = jnp.where(first, dw_c, dw_acc[...] + dw_c)
    db_acc[0:1] = jnp.where(first, db_c, db_acc[0:1] + db_c)

    @pl.when(jnp.logical_and(bi == nb - 1, ci == nc - 1))
    def _():
        dw_ref[...] = dw_acc[...]
        db_ref[0:1] = db_acc[0:1]


_LOG2E = 1.4426950408889634  # log2(e)
_LN2 = 0.6931471805599453  # 1 / log2(e)


def _base2_scale(wmat, bias):
    """Pre-scale the final-conv parameters by log2(e) so the kernel's
    matmul emits base-2 logits and the softmax runs on ``exp2`` — softmax
    is invariant under the base change, so outputs are bitwise-comparable
    to the exp path up to one fp rounding of the scaled weights, while the
    VPU skips exp's internal *log2e multiply over the 604M-element volume.
    Scaled in fp32 so bf16 weights pay a single rounding."""
    w2 = (wmat.astype(jnp.float32) * _LOG2E).astype(wmat.dtype)
    b2 = (bias.astype(jnp.float32) * _LOG2E).astype(bias.dtype)
    return w2, b2


def _fwd_call(feat, wmat, bias, joint_num, depth_dim, h, w, base2=False):
    b, hw, c = feat.shape
    jd = joint_num * depth_dim
    chunk = _chunk_rows(hw, jd)
    seg = jnp.asarray(_segment_matrix(joint_num, depth_dim))
    if base2:
        wmat, bias = _base2_scale(wmat, bias)
    kernel = functools.partial(
        _fwd_kernel, d=depth_dim, w=w, chunk=chunk, base2=base2
    )
    feat_spec = pl.BlockSpec(
        (1, chunk, c), lambda bi, ci: (bi, ci, 0), memory_space=pltpu.VMEM
    )
    const = lambda shape: pl.BlockSpec(
        shape, lambda bi, ci: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    vout, m = pl.pallas_call(
        kernel,
        grid=(b, hw // chunk),
        in_specs=[feat_spec, const((c, jd)), const((1, jd)), const((jd, _SEG_LANES))],
        out_specs=[
            pl.BlockSpec(
                (1, 4, _SEG_LANES), lambda bi, ci: (bi, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, 1, 1), lambda bi, ci: (bi, 0, 0), memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 4, _SEG_LANES), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.SMEM((1,), jnp.float32),
            pltpu.VMEM((8, _SEG_LANES), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * hw * c * jd,
            bytes_accessed=b * hw * c * feat.dtype.itemsize,
            transcendentals=b * hw * jd,
        ),
        interpret=_interpret(),
    )(feat, wmat, bias.reshape(1, jd), seg)
    s = vout[:, 0, :joint_num]
    coords = vout[:, 1:4, :joint_num].transpose(0, 2, 1)
    return coords, m.reshape(b), s


def _bwd_call(
    feat, wmat, bias, m, s, coords, g, joint_num, depth_dim, h, w, base2=False
):
    b, hw, c = feat.shape
    jd = joint_num * depth_dim
    chunk = _chunk_rows(hw, jd)
    rows = fold_bwd_rows(
        m, s, coords, g, joint_num, depth_dim,
        base2=base2, g_scale=_LN2 if base2 else 1.0,
    )
    if base2:
        wmat, bias = _base2_scale(wmat, bias)
    kernel = functools.partial(
        _bwd_kernel, d=depth_dim, w=w, chunk=chunk, base2=base2,
        bexp=_use_bexp(),  # bwd-only measurement mode, read at trace time
    )
    feat_spec = pl.BlockSpec(
        (1, chunk, c), lambda bi, ci: (bi, ci, 0), memory_space=pltpu.VMEM
    )
    const = lambda shape: pl.BlockSpec(
        shape, lambda bi, ci: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )
    dfeat, dw, db = pl.pallas_call(
        kernel,
        grid=(b, hw // chunk),
        in_specs=[
            feat_spec,
            const((c, jd)),
            const((1, jd)),
            pl.BlockSpec((1, 5, jd), lambda bi, ci: (bi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[feat_spec, const((c, jd)), const((1, jd))],
        out_shape=[
            jax.ShapeDtypeStruct(feat.shape, feat.dtype),
            jax.ShapeDtypeStruct((c, jd), jnp.float32),
            jax.ShapeDtypeStruct((1, jd), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((c, jd), jnp.float32),
            pltpu.VMEM((8, jd), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=6 * b * hw * c * jd,
            bytes_accessed=2 * b * hw * c * feat.dtype.itemsize,
            transcendentals=b * hw * jd,
        ),
        interpret=_interpret(),
    )(feat, wmat, bias.reshape(1, jd), rows)
    if base2:
        # Kernel-side dv carries the ln2 gradient scale (see _bwd_kernel);
        # undo it on the tiny weight grads (dfeat came out exact).
        dw = dw * _LOG2E
        db = db * _LOG2E
    return dfeat, dw.astype(wmat.dtype), db.reshape(jd).astype(bias.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _fused(feat, wmat, bias, joint_num, depth_dim, h, w, base2):
    coords, _, _ = _fwd_call(
        feat, wmat, bias, joint_num, depth_dim, h, w, base2
    )
    return coords


def _fused_fwd(feat, wmat, bias, joint_num, depth_dim, h, w, base2):
    coords, m, s = _fwd_call(
        feat, wmat, bias, joint_num, depth_dim, h, w, base2
    )
    return coords, (feat, wmat, bias, m, s, coords)


def _fused_bwd(joint_num, depth_dim, h, w, base2, res, g):
    feat, wmat, bias, m, s, coords = res
    return _bwd_call(
        feat, wmat, bias, m, s, coords, g, joint_num, depth_dim, h, w, base2
    )


_fused.defvjp(_fused_fwd, _fused_bwd)


def _sharded_fused(feat, wmat, bias, joint_num, depth_dim, h, w, base2, mesh, ax):
    """Per-shard kernel launch over the mesh's data axis.

    GSPMD has no partitioning rule for ``pallas_call``: inside a jit whose
    batch is sharded over ``ax``, a bare ``_fused`` call would force an
    all-gather of the (B, H*W, C) head features around the custom call —
    exactly the HBM traffic the fusion exists to avoid — or fail to
    partition. The kernel is purely per-sample (no cross-batch statistics),
    so a ``shard_map`` over the batch rows is exact: each device runs the
    Mosaic kernel on its local (B/n, H*W, C) shard with the tiny conv
    weights replicated. Gradients flow through the shard_map transpose
    (dfeat stays row-sharded; the replicated-weight cotangents dW/db are
    psummed by the transpose — same machinery DP8-equivalence-tested for
    ops/matmul_bn.py). check_vma=False because pallas_call outputs carry
    no varying-mesh-axes annotation."""
    from jax.sharding import PartitionSpec as P

    def local(f, wm, b_):
        return _fused(f, wm, b_, joint_num, depth_dim, h, w, base2)

    return jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(ax, None, None), P(None, None), P(None)),
        out_specs=P(ax, None, None),
        check_vma=False,
    )(feat, wmat, bias)


def fused_final_conv_integral(
    features: jax.Array,
    kernel: jax.Array,
    bias: jax.Array,
    joint_num: int,
    depth_dim: int,
    mesh=None,
) -> jax.Array:
    """(B, H, W, C) head features + (C, J*D) final-conv weights ->
    (B, J, 3) voxel coords, with the logits volume never materialized.

    ``mesh``: a multi-device 1-axis ``jax.sharding.Mesh`` launches the
    kernel per-shard over the batch rows via ``shard_map``
    (see _sharded_fused); multi-device meshes with no legal per-shard
    launch fall back to the fully-plain composition (every op GSPMD-
    partitionable). Single-device / no-mesh falls back to
    conv-then-dispatch when the shapes have no legal tiling.
    """
    b, h, w, c = features.shape
    jd = kernel.shape[-1]
    assert jd == joint_num * depth_dim, (kernel.shape, joint_num, depth_dim)
    feat = features.reshape(b, h * w, c)
    from ihpr_tpu.ops.integral_pallas import _use_pallas

    j2 = _pad_plan(joint_num, depth_dim, h * w, c) if _use_pallas() else None
    if mesh is not None and mesh.size > 1:
        ax = mesh.axis_names[0]
        if (
            len(mesh.axis_names) == 1
            and j2 is not None
            and b % mesh.shape[ax] == 0
        ):
            k2, b2 = _pad_weights(kernel, bias, joint_num, j2, depth_dim)
            coords = _sharded_fused(
                feat, k2, b2, j2, depth_dim, h, w, _use_exp2(), mesh, ax
            )
            return coords[:, :joint_num]
        # Multi-device but no legal per-shard launch (2-axis mesh, odd
        # batch, unsupported tiling): the fully-plain composition —
        # _dispatch would route back into pallas_call and trip the same
        # missing GSPMD rule this branch exists to avoid.
        from ihpr_tpu.ops import integral

        logits = (
            jnp.dot(
                feat,
                kernel,
                preferred_element_type=jnp.float32,
                precision=_dot_precision(feat.dtype),
            )
            + bias.astype(jnp.float32)
        )
        vol = logits.reshape(b, h * w, joint_num, depth_dim).transpose(0, 2, 3, 1)
        return integral.soft_argmax_3d(vol.reshape(b, joint_num, depth_dim, h, w))

    if j2 is not None:
        k2, b2 = _pad_weights(kernel, bias, joint_num, j2, depth_dim)
        coords = _fused(feat, k2, b2, j2, depth_dim, h, w, _use_exp2())
        return coords[:, :joint_num]
    from ihpr_tpu.ops.integral_pallas import _dispatch

    # Same precision rule as the fused kernel so IHPR_PALLAS=off triage
    # and unsupported-shape fallbacks are numerically comparable to it.
    logits = (
        jnp.dot(
            feat,
            kernel,
            preferred_element_type=jnp.float32,
            precision=_dot_precision(feat.dtype),
        )
        + bias.astype(jnp.float32)
    )
    return _dispatch(logits, joint_num, depth_dim, h, w)
