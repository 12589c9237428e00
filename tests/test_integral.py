"""Integral soft-argmax: plain-JAX vs torch reference vs fused Pallas kernel.

The torch function here re-derives the reference ``common/nets/loss.py:
soft_argmax`` semantics independently (flatten -> softmax -> marginals ->
expectation); it is the parity oracle demanded by SURVEY.md §4.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from ihpr_tpu.ops import (
    joint_location_loss,
    soft_argmax_2d,
    soft_argmax_3d,
    soft_argmax_3d_fused,
)
from ihpr_tpu.ops.integral import heatmap_to_volume
from ihpr_tpu.ops.integral_pallas import soft_argmax_from_heatmap


def torch_soft_argmax_3d(logits: np.ndarray) -> np.ndarray:
    """Reference semantics in torch-CPU (independent oracle)."""
    t = torch.from_numpy(logits).float()
    b, j, d, h, w = t.shape
    p = torch.softmax(t.reshape(b, j, -1), dim=2).reshape(b, j, d, h, w)
    accu_x = p.sum(dim=(2, 3))  # (B,J,W)
    accu_y = p.sum(dim=(2, 4))  # (B,J,H)
    accu_z = p.sum(dim=(3, 4))  # (B,J,D)
    x = (accu_x * torch.arange(w).float()).sum(dim=2)
    y = (accu_y * torch.arange(h).float()).sum(dim=2)
    z = (accu_z * torch.arange(d).float()).sum(dim=2)
    return torch.stack([x, y, z], dim=2).numpy()


@pytest.fixture(scope="module")
def logits_small():
    rng = np.random.RandomState(0)
    # Small volume keeps CPU tests fast; shapes exercise D != H != W.
    return rng.randn(2, 4, 8, 16, 12).astype(np.float32) * 3.0


def test_plain_matches_torch(logits_small):
    ours = np.asarray(soft_argmax_3d(jnp.asarray(logits_small)))
    ref = torch_soft_argmax_3d(logits_small)
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-5)


def test_peaked_volume_recovers_argmax():
    vol = np.full((1, 1, 8, 8, 8), -10.0, np.float32)
    vol[0, 0, 3, 5, 2] = 30.0  # z=3, y=5, x=2
    coords = np.asarray(soft_argmax_3d(jnp.asarray(vol)))
    np.testing.assert_allclose(coords[0, 0], [2.0, 5.0, 3.0], atol=1e-3)


def test_uniform_volume_gives_center():
    vol = np.zeros((1, 1, 4, 6, 8), np.float32)
    coords = np.asarray(soft_argmax_3d(jnp.asarray(vol)))
    np.testing.assert_allclose(coords[0, 0], [3.5, 2.5, 1.5], atol=1e-5)


def test_fused_matches_plain(logits_small):
    plain = np.asarray(soft_argmax_3d(jnp.asarray(logits_small)))
    fused = np.asarray(soft_argmax_3d_fused(jnp.asarray(logits_small)))
    np.testing.assert_allclose(fused, plain, rtol=0, atol=1e-5)


def test_fused_odd_joint_count():
    rng = np.random.RandomState(1)
    logits = rng.randn(1, 3, 4, 8, 8).astype(np.float32)
    plain = np.asarray(soft_argmax_3d(jnp.asarray(logits)))
    fused = np.asarray(soft_argmax_3d_fused(jnp.asarray(logits)))
    np.testing.assert_allclose(fused, plain, rtol=0, atol=1e-5)


def test_fused_from_heatmap_layout():
    rng = np.random.RandomState(2)
    b, h, w, j, d = 2, 8, 8, 4, 8
    heatmap = rng.randn(b, h, w, j * d).astype(np.float32)
    vol = heatmap_to_volume(jnp.asarray(heatmap), j, d)
    plain = np.asarray(soft_argmax_3d(vol))
    fused = np.asarray(soft_argmax_from_heatmap(jnp.asarray(heatmap), j, d))
    np.testing.assert_allclose(fused, plain, rtol=0, atol=1e-5)


def test_fused_gradient_matches_plain(logits_small):
    x = jnp.asarray(logits_small)
    t = jnp.asarray(np.random.RandomState(3).rand(2, 4, 3).astype(np.float32) * 8)

    def loss_plain(v):
        return jnp.sum((soft_argmax_3d(v) - t) ** 2)

    def loss_fused(v):
        return jnp.sum((soft_argmax_3d_fused(v) - t) ** 2)

    g_plain = np.asarray(jax.grad(loss_plain)(x))
    g_fused = np.asarray(jax.grad(loss_fused)(x))
    np.testing.assert_allclose(g_fused, g_plain, rtol=1e-4, atol=1e-6)


def test_fused_gradient_vs_torch_autograd(logits_small):
    t_in = torch.from_numpy(logits_small).float().requires_grad_(True)
    b, j, d, h, w = t_in.shape
    p = torch.softmax(t_in.reshape(b, j, -1), dim=2).reshape(b, j, d, h, w)
    x = (p.sum(dim=(2, 3)) * torch.arange(w).float()).sum(dim=2)
    y = (p.sum(dim=(2, 4)) * torch.arange(h).float()).sum(dim=2)
    z = (p.sum(dim=(3, 4)) * torch.arange(d).float()).sum(dim=2)
    coords = torch.stack([x, y, z], dim=2)
    coords.sum().backward()
    g_torch = t_in.grad.numpy()

    g_fused = np.asarray(
        jax.grad(lambda v: jnp.sum(soft_argmax_3d_fused(v)))(jnp.asarray(logits_small))
    )
    np.testing.assert_allclose(g_fused, g_torch, rtol=1e-4, atol=1e-6)


def test_soft_argmax_2d():
    vol = np.full((1, 2, 8, 8), -5.0, np.float32)
    vol[0, 0, 6, 1] = 20.0
    vol[0, 1, 2, 7] = 20.0
    coords = np.asarray(soft_argmax_2d(jnp.asarray(vol)))
    np.testing.assert_allclose(coords[0, 0], [1.0, 6.0], atol=1e-3)
    np.testing.assert_allclose(coords[0, 1], [7.0, 2.0], atol=1e-3)


def test_bf16_input_fused_close_to_fp32():
    rng = np.random.RandomState(4)
    logits = rng.randn(1, 2, 8, 8, 8).astype(np.float32)
    fp32 = np.asarray(soft_argmax_3d_fused(jnp.asarray(logits)))
    bf16 = np.asarray(soft_argmax_3d_fused(jnp.asarray(logits, jnp.bfloat16)))
    np.testing.assert_allclose(bf16, fp32, atol=0.05)


class TestJointLocationLoss:
    def test_matches_manual(self):
        rng = np.random.RandomState(5)
        pred = rng.rand(2, 3, 3).astype(np.float32) * 64
        gt = rng.rand(2, 3, 3).astype(np.float32) * 64
        vis = np.array([[1, 0, 1], [1, 1, 0]], np.float32)
        have_depth = np.array([1.0, 0.0], np.float32)

        err = np.abs(pred - gt) * vis[..., None]
        err[..., 2] *= have_depth[:, None]
        expected = err.mean()

        got = joint_location_loss(
            jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(vis), jnp.asarray(have_depth)
        )
        np.testing.assert_allclose(float(got), expected, rtol=1e-6)

    def test_depth_mask_blocks_z_gradient(self):
        pred = jnp.zeros((1, 2, 3))
        gt = jnp.ones((1, 2, 3))
        vis = jnp.ones((1, 2))
        g = jax.grad(
            lambda p: joint_location_loss(p, gt, vis, jnp.zeros((1,)))
        )(pred)
        assert np.all(np.asarray(g)[..., 2] == 0.0)
        assert np.any(np.asarray(g)[..., :2] != 0.0)

    def test_2d_sample_in_3d_batch(self):
        # Mixed H36M+MPII batch: z loss only from the 3D sample.
        pred = jnp.zeros((2, 1, 3))
        gt = jnp.ones((2, 1, 3))
        vis = jnp.ones((2, 1))
        have_depth = jnp.asarray([1.0, 0.0])
        loss = joint_location_loss(pred, gt, vis, have_depth)
        # sample0: |1|*3 terms; sample1: x,y only -> total 5 ones over 6 slots
        np.testing.assert_allclose(float(loss), 5.0 / 6.0, rtol=1e-6)
