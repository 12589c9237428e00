"""Fused Pallas TPU kernel for the integral soft-argmax.

The reference computes this as a chain (``common/nets/loss.py:soft_argmax``):
softmax over the flattened 64^3 volume, reshape, three marginal sums, three
inner products — materializing the (B, J, 262144) probability tensor in HBM
(~18 MB per sample at J=18, fp32) and reading it three more times.

Here the whole thing is ONE kernel: each grid program streams one sample's
full (H*W, J*D) plane HBM->VMEM in row chunks (fully contiguous DMA) and
maintains ONLINE softmax statistics — running max m, normalizer s, and the
three weighted moments, the same rescaling trick that underlies
blockwise/flash attention — so the normalized probabilities never exist in
HBM and VMEM holds only one chunk. HBM traffic drops from ~5 volume passes
to exactly 1 read (fwd) and 1 read + 1 write (bwd).

Performance notes (v5e-tuned):
- Layout: the head's final 1x1 conv emits NHWC (B, H, W, J*D); a free
  reshape gives (B, H*W, J*D). No transpose of the volume ever touches HBM.
- Per-joint bookkeeping is kept OFF the VPU hot path: per-chunk segment
  sums over the J*D lane axis are one tiny MXU matmul against a constant
  0/1 segment matrix (J*D, 128); scalar loops over joints would dominate
  runtime with tiny-op overhead.
- Softmax stabilization uses a SHARED max over all joints of a sample
  (scalar). The stabilizer cancels exactly in each joint's moment ratio,
  so coordinates are mathematically identical to per-joint stabilization;
  the only caveat is fp32 underflow if one joint's logits sit ~80+ below
  another joint's max, which does not occur for trained heads (and the
  plain-JAX path in ``integral.py`` remains the fallback oracle).
- Coordinates are recovered from indices: for lane l and global row
  r = c*C + r_local, z = l mod D, x = r mod W, y = r div W; x/y enter as
  (chunk, 1) columns and z as a (1, J*D) row, so every broadcast is along
  a single dimension (Mosaic supports those; two-axis splats it does not).

Backward (via ``jax.custom_vjp``): for coords c_k = sum_i p_i * g^k_i,
    dL/dv_i = p_i * sum_k gbar_k * (g^k_i - c_k)
— one elementwise pass, recomputing p from the saved (m, s). All per-joint
constants are folded OUTSIDE the kernel into five (B, J*D) lane-rows
(m, 1/s, gx, gy, and a bias collecting the z/center terms).

fp32 math throughout regardless of input dtype (bf16 inputs are upcast
in-register after the HBM read, halving read bandwidth in bf16 mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float("-inf")
# Joint-padding fill: far below any real logit so padded lanes never win the
# shared max, yet finite so no inf arithmetic leaks into real lanes.
_PAD_VALUE = -1e30


def _interpret() -> bool:
    # When the kernel does run off-TPU (IHPR_PALLAS=interpret, used by the
    # kernel tests), Pallas interpret mode keeps the same code path
    # numerically live there.
    return jax.default_backend() != "tpu"


def _use_pallas() -> bool:
    """Kernel routing policy. interpret-mode Pallas is ~1000x slower than
    the plain-JAX composition at real shapes, so off-TPU backends default
    to plain JAX; IHPR_PALLAS=interpret forces the kernels (tests),
    IHPR_PALLAS=off forces the fallback everywhere (triage)."""
    import os

    mode = os.environ.get("IHPR_PALLAS", "auto")
    if mode == "interpret":
        return True
    if mode == "off":
        return False
    return jax.default_backend() == "tpu"


# Per-chunk VMEM budget; the streaming state makes this independent of H*W.
# IHPR_CHUNK_BYTES overrides for A/B tuning (tools/ sweeps).
import os as _os

_MAX_CHUNK_BYTES = int(_os.environ.get("IHPR_CHUNK_BYTES", 2 * 1024 * 1024))
# Segment matmul emits (4, _SEG_LANES); joints beyond this fall back.
_SEG_LANES = 128


def _supported(joint_num: int, depth_dim: int, hw: int = 4096) -> bool:
    """The kernel handles lane extents that are 128-aligned (Mosaic's lane
    rule), at most _SEG_LANES joints, and HW planes with a legal chunking."""
    return (
        (joint_num * depth_dim) % 128 == 0
        and joint_num <= _SEG_LANES
        and _chunk_rows(hw, joint_num * depth_dim) is not None
    )


def _padded_joint_num(joint_num: int, depth_dim: int, hw: int) -> int | None:
    """Smallest J' >= J for which the kernel applies (zero-pad joints)."""
    if 128 % depth_dim != 0:
        return None
    g = max(1, 128 // depth_dim)
    j2 = -(-joint_num // g) * g
    return j2 if _supported(j2, depth_dim, hw) else None


def _chunk_rows(hw: int, lanes: int) -> int | None:
    """Largest divisor of hw that is a multiple of 8 (fp32 sublane tile) and
    fits the VMEM chunk budget; hw itself for small planes; None when no
    legal chunking exists (callers fall back to the plain-JAX path — a
    non-dividing chunk would silently drop trailing rows)."""
    cap = max(8, _MAX_CHUNK_BYTES // (lanes * 4))
    if hw <= cap:
        return hw
    for c in range(cap, 7, -1):
        if hw % c == 0 and c % 8 == 0:
            return c
    return None


@functools.lru_cache(maxsize=None)
def _segment_matrix(joint_num: int, depth_dim: int) -> np.ndarray:
    """(J*D, _SEG_LANES) 0/1 matrix summing each joint's D lanes via MXU."""
    s = np.zeros((joint_num * depth_dim, _SEG_LANES), np.float32)
    for j in range(joint_num):
        s[j * depth_dim : (j + 1) * depth_dim, j] = 1.0
    return s


def _online_stats_tail(
    v, seg_ref, vout_ref, m_ref, macc_ref, acc_ref, *, d, w, chunk,
    exp_fn=jnp.exp,
):
    """Shared per-chunk tail: online softmax statistics + MXU-factored
    moments for one fp32 (chunk, J*D) logits block ``v``. Used by both the
    standalone integral kernel and the fused final-conv+integral kernel.

    Only TWO full-block VPU passes touch the plane — the max-reduce and the
    exp. The x/y/sum moments ride one (3, chunk) @ (chunk, J*D) matmul
    (rows [1, x(r), y(r)]) and per-joint segment sums ride a
    (4, J*D) @ (J*D, 128) matmul. Scratch: acc (8, 128) VMEM rows
    [s, sx, sy, sz]; macc SMEM running max (shared stabilizer — see module
    docstring).

    ``exp_fn``: the softmax base. ``jnp.exp2`` callers (the fused head op's
    base-2 mode) must feed PRE-SCALED logits v' = v*log2(e) — softmax is
    invariant under that base change, so outputs are identical while the
    VPU skips exp's internal *log2(e) multiply pass."""
    ci = pl.program_id(1)
    nc = pl.num_programs(1)
    jd = v.shape[1]

    m_c = jnp.max(v)
    m_old = jnp.where(ci == 0, _NEG_INF, macc_ref[0])
    m_new = jnp.maximum(m_old, m_c)
    scale = exp_fn(m_old - m_new)  # exp(-inf) = 0 on the first chunk
    macc_ref[0] = m_new

    e = exp_fn(v - m_new)  # (chunk, J*D)

    # W3 rows: [1, x(r), y(r)] for global row r = ci*chunk + col.
    ridx = jax.lax.broadcasted_iota(jnp.int32, (8, chunk), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (8, chunk), 1) + ci * chunk
    x_ids = (col % w).astype(jnp.float32)
    y_ids = (col // w).astype(jnp.float32)
    w3 = jnp.where(ridx == 0, 1.0, jnp.where(ridx == 1, x_ids, y_ids))
    w3 = jnp.where(ridx >= 3, 0.0, w3)  # (8, chunk), rows 3..7 zero

    # HIGHEST precision everywhere on the MXU: v5e multiplies bf16
    # natively; without it these contractions quantize to ~1e-2.
    a = jnp.dot(
        w3, e, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (8, J*D): rows [sum_e, sum_ex, sum_ey, 0...]
    z_row = (jax.lax.broadcasted_iota(jnp.int32, (1, jd), 1) % d).astype(jnp.float32)
    stacked = jnp.concatenate(
        [a[0:3], a[0:1] * z_row], axis=0
    )  # (4, J*D): [e, ex, ey, ez]
    sums = jnp.dot(
        stacked, seg_ref[...],
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (4, 128) per-joint

    acc_old = acc_ref[0:4]  # garbage on ci==0, discarded by the where
    acc_new = jnp.where(ci == 0, sums, acc_old * scale + sums)
    acc_ref[0:4] = acc_new

    @pl.when(ci == nc - 1)
    def _():
        s = acc_new[0:1]  # (1, 128); 0 for lanes past J and padded joints
        inv_s = jnp.where(s > 0, 1.0 / s, 0.0)
        vout_ref[0, 0:1] = s
        vout_ref[0, 1:4] = acc_new[1:4] * inv_s  # coords x, y, z
        m_ref[0, 0, 0] = m_new


def _fwd_kernel(v_ref, seg_ref, vout_ref, m_ref, macc_ref, acc_ref, *, d, w, chunk):
    """Grid (B, HW/chunk); streams chunks of one sample's (HW, J*D) plane
    through the shared online-stats tail."""
    v = v_ref[0].astype(jnp.float32)  # (chunk, J*D)
    _online_stats_tail(
        v, seg_ref, vout_ref, m_ref, macc_ref, acc_ref, d=d, w=w, chunk=chunk
    )


def _dv_from_rows(v, rows, *, w, chunk, exp_fn=jnp.exp):
    """Shared backward elementwise: dv = p * (gx*x + gy*y + bias) with
    p = exp(v - row0) — row0 pre-folds the softmax normalizer as
    m + log(s) (``fold_bwd_rows``), so recovering p costs ONE full-block
    VPU pass instead of exp + a (chunk, J*D) multiply. The rank-3 spatial
    term is one (chunk, 3) @ (3, J*D) MXU matmul. ``rows``: (5, J*D);
    row1 (inv_s) is retained for layout/debug but unused here.

    ``exp_fn=jnp.exp2`` callers must fold base-2 logits/rows (see
    ``fold_bwd_rows(base2=True)`` and the fused head op)."""
    ci = pl.program_id(1)
    p = exp_fn(v - rows[0:1])
    cidx = jax.lax.broadcasted_iota(jnp.int32, (chunk, 8), 1)
    r_glob = jax.lax.broadcasted_iota(jnp.int32, (chunk, 8), 0) + ci * chunk
    x_ids = (r_glob % w).astype(jnp.float32)
    y_ids = (r_glob // w).astype(jnp.float32)
    wc = jnp.where(
        cidx == 0, x_ids, jnp.where(cidx == 1, y_ids, jnp.where(cidx == 2, 1.0, 0.0))
    )
    g8 = jnp.concatenate(
        [rows[2:5], jnp.zeros((5, rows.shape[1]), jnp.float32)], axis=0
    )
    term = jnp.dot(
        wc, g8, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return p * term


def _bwd_kernel(v_ref, rows_ref, dv_ref, *, w, chunk):
    """Standalone backward: per-joint constants pre-folded into (5, J*D)
    lane-rows outside the kernel (see _dv_from_rows)."""
    v = v_ref[0].astype(jnp.float32)
    dv_ref[0] = _dv_from_rows(v, rows_ref[0], w=w, chunk=chunk).astype(dv_ref.dtype)


def _vol_spec(chunk: int, lanes: int) -> pl.BlockSpec:
    return pl.BlockSpec(
        (1, chunk, lanes), lambda bi, ci: (bi, ci, 0), memory_space=pltpu.VMEM
    )


def _fwd_call(vol: jax.Array, joint_num: int, depth_dim: int, h: int, w: int):
    """vol: (B, H*W, J*D) -> coords (B, J, 3), m (B,), s (B, J)."""
    b, hw, jd = vol.shape
    assert hw == h * w and jd == joint_num * depth_dim, (vol.shape, joint_num, depth_dim, h, w)
    assert _supported(joint_num, depth_dim, hw), (joint_num, depth_dim, hw)
    chunk = _chunk_rows(hw, jd)
    assert chunk is not None and hw % chunk == 0, (hw, jd, chunk)
    seg = jnp.asarray(_segment_matrix(joint_num, depth_dim))
    kernel = functools.partial(_fwd_kernel, d=depth_dim, w=w, chunk=chunk)
    vout, m = pl.pallas_call(
        kernel,
        grid=(b, hw // chunk),
        in_specs=[
            _vol_spec(chunk, jd),
            pl.BlockSpec(
                (jd, _SEG_LANES), lambda bi, ci: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
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
            flops=8 * b * hw * jd,
            bytes_accessed=b * hw * jd * vol.dtype.itemsize,
            transcendentals=b * hw * jd,
        ),
        interpret=_interpret(),
    )(vol, seg)
    s = vout[:, 0, :joint_num]  # (B, J)
    coords = vout[:, 1:4, :joint_num].transpose(0, 2, 1)  # (B, J, 3)
    return coords, m.reshape(b), s


def fold_bwd_rows(
    m: jax.Array,
    s: jax.Array,
    coords: jax.Array,
    g: jax.Array,
    joint_num: int,
    depth_dim: int,
    base2: bool = False,
    g_scale: float = 1.0,
) -> jax.Array:
    """Fold all per-joint backward constants into five (B, J*D) lane-rows
    (XLA ops on tiny tensors): row0 = m + log(s) (the softmax normalizer
    folded into the exp argument — p = exp(v - row0) directly, saving one
    full-block VPU multiply in the kernel; s==0 padded joints get row0=+inf
    so p underflows to exactly 0), 1/s (layout/debug only), gx, gy, and
    bias = gz*(z - cz) - gx*cx - gy*cy. Shared with the fused head op.

    ``base2``: m is in base-2 logit domain (fused exp2 mode) — fold log2(s)
    instead so p = exp2(v' - row0). ``g_scale``: extra factor on gx/gy/bias
    (the fused exp2 mode scales dv by ln2 so dfeat contracts against the
    log2e-scaled weights exactly)."""
    b = m.shape[0]
    jd = joint_num * depth_dim
    g = g.astype(jnp.float32) * g_scale
    rep = lambda a: jnp.repeat(a, depth_dim, axis=-1)  # (B, J) -> (B, J*D)
    inv_s = jnp.where(s > 0, 1.0 / s, 0.0)
    log_s = jnp.where(
        s > 0, jnp.log2(s) if base2 else jnp.log(s), jnp.inf
    )
    z_pat = jnp.tile(jnp.arange(depth_dim, dtype=jnp.float32), joint_num)  # (J*D,)
    gx, gy, gz = rep(g[..., 0]), rep(g[..., 1]), rep(g[..., 2])
    cx, cy, cz = rep(coords[..., 0]), rep(coords[..., 1]), rep(coords[..., 2])
    bias = gz * (z_pat[None, :] - cz) - gx * cx - gy * cy
    m_row = rep(m[:, None] + log_s)  # (B, J) -> (B, J*D)
    return jnp.stack([m_row, rep(inv_s), gx, gy, bias], axis=1)  # (B, 5, J*D)


def _bwd_call(
    vol: jax.Array,
    m: jax.Array,
    s: jax.Array,
    coords: jax.Array,
    g: jax.Array,
    joint_num: int,
    depth_dim: int,
    h: int,
    w: int,
) -> jax.Array:
    b, hw, jd = vol.shape
    chunk = _chunk_rows(hw, jd)
    assert chunk is not None and hw % chunk == 0, (hw, jd, chunk)
    rows = fold_bwd_rows(m, s, coords, g, joint_num, depth_dim)
    kernel = functools.partial(_bwd_kernel, w=w, chunk=chunk)
    return pl.pallas_call(
        kernel,
        grid=(b, hw // chunk),
        in_specs=[
            _vol_spec(chunk, jd),
            pl.BlockSpec((1, 5, jd), lambda bi, ci: (bi, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=_vol_spec(chunk, jd),
        out_shape=jax.ShapeDtypeStruct(vol.shape, vol.dtype),
        cost_estimate=pl.CostEstimate(
            flops=8 * b * hw * jd,
            bytes_accessed=2 * b * hw * jd * vol.dtype.itemsize,
            transcendentals=b * hw * jd,
        ),
        interpret=_interpret(),
    )(vol, rows)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def _soft_argmax_fused(vol, joint_num, depth_dim, h, w):
    coords, _, _ = _fwd_call(vol, joint_num, depth_dim, h, w)
    return coords


def _soft_argmax_fused_fwd(vol, joint_num, depth_dim, h, w):
    coords, m, s = _fwd_call(vol, joint_num, depth_dim, h, w)
    return coords, (vol, m, s, coords)


def _soft_argmax_fused_bwd(joint_num, depth_dim, h, w, res, g):
    vol, m, s, coords = res
    dv = _bwd_call(vol, m, s, coords, g, joint_num, depth_dim, h, w)
    return (dv,)


_soft_argmax_fused.defvjp(_soft_argmax_fused_fwd, _soft_argmax_fused_bwd)


def _dispatch(vol: jax.Array, joint_num: int, depth_dim: int, h: int, w: int) -> jax.Array:
    """Route (B, HW, J*D) through the kernel, padding the joint axis to a
    legal lane tiling when needed; falls back to the plain-JAX composition
    for shapes with no reasonable tiling (e.g. the tiny 2D D=1 case, which
    is not bandwidth-bound anyway). Padding/slicing sits OUTSIDE the
    custom_vjp, so autodiff through it is handled by JAX; padded joints
    receive zero cotangent and contribute nothing to the backward kernel."""
    hw = h * w
    use = _use_pallas()
    if use and _supported(joint_num, depth_dim, hw):
        return _soft_argmax_fused(vol, joint_num, depth_dim, h, w)
    j2 = _padded_joint_num(joint_num, depth_dim, hw) if use else None
    # Padding beyond 2x the real joints wastes more than the fusion saves.
    if j2 is not None and j2 <= 2 * joint_num:
        padded = jnp.pad(
            vol,
            ((0, 0), (0, 0), (0, (j2 - joint_num) * depth_dim)),
            constant_values=_PAD_VALUE,
        )
        coords = _soft_argmax_fused(padded, j2, depth_dim, h, w)
        return coords[:, :joint_num]
    from ihpr_tpu.ops import integral  # fallback: plain-JAX composition

    b = vol.shape[0]
    logits = vol.reshape(b, hw, joint_num, depth_dim).transpose(0, 2, 3, 1)
    return integral.soft_argmax_3d(logits.reshape(b, joint_num, depth_dim, h, w))


def soft_argmax_from_heatmap(
    heatmap: jax.Array, joint_num: int, depth_dim: int
) -> jax.Array:
    """Production path: (B, H, W, J*D) NHWC head output -> (B, J, 3) coords.

    Only a free reshape separates the conv output from the kernel — the
    volume is never transposed in HBM.
    """
    b, h, w, c = heatmap.shape
    assert c == joint_num * depth_dim, (heatmap.shape, joint_num, depth_dim)
    vol = heatmap.reshape(b, h * w, c)
    return _dispatch(vol, joint_num, depth_dim, h, w)


def soft_argmax_3d_fused(logits: jax.Array) -> jax.Array:
    """Drop-in fused equivalent of ``integral.soft_argmax_3d``.

    (B, J, D, H, W) -> (B, J, 3). Incurs one transpose into the kernel's
    native (B, HW, JD) layout; prefer ``soft_argmax_from_heatmap`` in the
    model's forward pass, which needs no transpose.
    """
    b, j, d, h, w = logits.shape
    vol = logits.transpose(0, 3, 4, 1, 2).reshape(b, h * w, j * d)
    return _dispatch(vol, j, d, h, w)
