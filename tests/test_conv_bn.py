"""Fused 3x3-conv + BN-statistics kernel vs the plain-XLA twin.

Interpret-mode Pallas on CPU: numerics only (Mosaic lowering is covered
by tools/conv_bn_probe.py on the real chip). Shapes are small stand-ins
for the R50 stage-2/3 mid-convs the kernel targets."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ihpr_tpu.ops.conv_bn import (
    _images_per_tile,
    _reference,
    fused_conv3x3_bn,
    supported,
)


def _mk(b, h, w, c, n, seed=0, dtype=np.float32):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(b, h, w, c).astype(dtype) * 0.5)
    wk = jnp.asarray(rng.randn(3, 3, c, n).astype(dtype) * 0.05)
    mul = jnp.asarray(rng.uniform(0.5, 1.5, c).astype(np.float32))
    add = jnp.asarray(rng.randn(c).astype(np.float32) * 0.2)
    return x, wk, mul, add


@pytest.mark.parametrize("g_split", ["one_image", "multi_image"])
@pytest.mark.parametrize("prologue", [False, True])
def test_fused_conv_matches_reference(g_split, prologue):
    # multi_image forces >1 image per tile; one_image forces tile == image
    b, h, w, c, n = (4, 8, 8, 128, 128) if g_split == "multi_image" else (2, 16, 16, 128, 128)
    x, wk, mul, add = _mk(b, h, w, c, n)
    assert supported(b, h, w, c, n, 1, 4)
    args = (mul, add) if prologue else (None, None)
    y, s1, s2 = fused_conv3x3_bn(x, wk, *args)
    yr, s1r, s2r = _reference(x, wk, *args, stride=1)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr), atol=2e-4)
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s1r), rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s2r), rtol=1e-4, atol=1e-2)


@pytest.mark.parametrize("prologue", [False, True])
def test_fused_conv_grads_match_autodiff(prologue):
    b, h, w, c, n = 2, 8, 8, 128, 128
    x, wk, mul, add = _mk(b, h, w, c, n, seed=3)
    ct_y = jnp.asarray(np.random.RandomState(4).randn(b, h, w, n).astype(np.float32))
    ct1 = jnp.asarray(np.random.RandomState(5).randn(n).astype(np.float32) * 0.1)
    ct2 = jnp.asarray(np.random.RandomState(6).randn(n).astype(np.float32) * 0.01)

    def scalarize(fn, *args):
        y, s1, s2 = fn(*args)
        return jnp.sum(y * ct_y) + jnp.sum(s1 * ct1) + jnp.sum(s2 * ct2)

    if prologue:
        f = lambda xx, ww, mm, aa: scalarize(fused_conv3x3_bn, xx, ww, mm, aa)
        r = lambda xx, ww, mm, aa: scalarize(_reference, xx, ww, mm, aa, 1)
        gf = jax.grad(f, argnums=(0, 1, 2, 3))(x, wk, mul, add)
        gr = jax.grad(r, argnums=(0, 1, 2, 3))(x, wk, mul, add)
        names = ("dx", "dw", "dmul", "dadd")
    else:
        f = lambda xx, ww: scalarize(fused_conv3x3_bn, xx, ww, None, None)
        r = lambda xx, ww: scalarize(_reference, xx, ww, None, None, 1)
        gf = jax.grad(f, argnums=(0, 1))(x, wk)
        gr = jax.grad(r, argnums=(0, 1))(x, wk)
        names = ("dx", "dw")
    for a, bb, name in zip(gf, gr, names):
        a = np.asarray(a, np.float64)
        bb = np.asarray(bb, np.float64)
        # the fused kernel reshapes w to (9, c, n); grads come back HWIO
        a = a.reshape(bb.shape)
        rel = np.linalg.norm(a - bb) / (np.linalg.norm(bb) + 1e-12)
        assert rel < 2e-5, (name, rel)


def test_fused_conv_bf16_close():
    b, h, w, c, n = 2, 8, 8, 128, 128
    x, wk, mul, add = _mk(b, h, w, c, n, seed=7)
    xb, wb = x.astype(jnp.bfloat16), wk.astype(jnp.bfloat16)
    y, s1, s2 = fused_conv3x3_bn(xb, wb, mul, add)
    yr, s1r, s2r = _reference(xb, wb, mul, add, 1)
    assert y.dtype == jnp.bfloat16
    d = np.abs(np.asarray(y, np.float32) - np.asarray(yr, np.float32))
    assert float(d.max()) < 0.15, float(d.max())
    np.testing.assert_allclose(
        np.asarray(s1), np.asarray(s1r), rtol=5e-2, atol=1.0
    )


def test_stride2_falls_back():
    b, h, w, c, n = 2, 8, 8, 128, 128
    x, wk, _, _ = _mk(b, h, w, c, n, seed=8)
    assert not supported(b, h, w, c, n, 2, 4)
    y, s1, s2 = fused_conv3x3_bn(x, wk, stride=2)
    assert y.shape == (b, 4, 4, n)
    yr, s1r, _ = _reference(x, wk, None, None, 2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(yr), atol=1e-5)


def test_images_per_tile_divides_batch():
    g = _images_per_tile(12, 64, 128, 128, 2, bwd=False)
    assert g is not None and 12 % g == 0


def test_bottleneck_fused_conv3_matches_plain(monkeypatch):
    """In-situ: the fused-conv3 Bottleneck path must match the plain path
    on the SAME parameter tree — train-mode output, parameter gradients,
    and the bn1/bn2 running-statistics updates (lean BN, the production
    mode). The 128-channel test shape sits below the measured
    profitability gate, so lower it for the equivalence check."""
    import flax.linen as nn

    from ihpr_tpu.models.resnet import Bottleneck

    monkeypatch.setenv("IHPR_CONV3_MIN_CH", "128")
    b, h, w, e = 2, 8, 8, 128
    x = jnp.asarray(
        np.random.RandomState(0).randn(b, h, w, 4 * e).astype(np.float32) * 0.5
    )
    plain = Bottleneck(e, 1, jnp.float32, bn_mode="lean")
    fused = Bottleneck(e, 1, jnp.float32, bn_mode="lean", fused_conv3=True)
    v = plain.init(jax.random.key(0), x, True)
    params, bstats = v["params"], v["batch_stats"]
    assert set(params) == set(
        fused.init(jax.random.key(0), x, True)["params"]
    ), "fused path must share the plain parameter tree"

    def run(mod, p):
        out, mut = mod.apply(
            {"params": p, "batch_stats": bstats}, x, True,
            mutable=["batch_stats"],
        )
        return out, mut["batch_stats"]

    out_p, bs_p = run(plain, params)
    out_f, bs_f = run(fused, params)
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_p), atol=5e-4
    )
    jax.tree_util.tree_map_with_path(
        lambda k, vp, vf: np.testing.assert_allclose(
            np.asarray(vf), np.asarray(vp), rtol=1e-4, atol=1e-5,
            err_msg=str(k),
        ),
        bs_p,
        bs_f,
    )

    def loss(mod):
        def f(p):
            out, _ = mod.apply(
                {"params": p, "batch_stats": bstats}, x, True,
                mutable=["batch_stats"],
            )
            return jnp.sum(out.astype(jnp.float32) ** 2)
        return f

    gp = jax.grad(loss(plain))(params)
    gf = jax.grad(loss(fused))(params)
    fp = jax.tree.leaves(gp)
    ff = jax.tree.leaves(gf)
    num = sum(float(np.linalg.norm(np.asarray(a) - np.asarray(bb)) ** 2)
              for a, bb in zip(ff, fp)) ** 0.5
    den = sum(float(np.linalg.norm(np.asarray(bb)) ** 2) for bb in fp) ** 0.5
    assert num / (den + 1e-12) < 5e-5, num / den
