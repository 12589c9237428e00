"""Numerical parity: torch reference network -> converted Flax weights.

The converter (tools/convert_torch_ckpt.py) replaces the reference's
model-zoo pretrained init; these tests prove a randomly-initialized torch
network and its converted Flax twin produce the same activations, which
validates conv/deconv/BN weight-layout mapping AND the architecture match
(padding, stride placement, BN eps) in one shot.
"""

import sys
from pathlib import Path

import jax
import numpy as np
import jax.numpy as jnp
import pytest
import torch

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import torch_reference as tref  # noqa: E402
from convert_torch_ckpt import convert_backbone, convert_posenet  # noqa: E402

from ihpr_tpu.models import ResNetBackbone
from ihpr_tpu.models.pose_net import PoseNet


def _nhwc(x: np.ndarray) -> np.ndarray:
    return x.transpose(0, 2, 3, 1)


@pytest.mark.parametrize("rt", [18, 50])
def test_backbone_parity(rt):
    torch.manual_seed(0)
    tm = tref.ResNetBackbone(rt).eval()
    # non-trivial running stats so BN conversion is actually exercised
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.5, 0.5)
                m.running_var.uniform_(0.5, 1.5)

    x = np.random.RandomState(0).randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ty = tm(torch.from_numpy(x)).numpy()

    params, stats = convert_backbone(tm.state_dict(), rt)
    fm = ResNetBackbone(resnet_type=rt)
    fy = fm.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(_nhwc(x)),
        train=False,
    )
    np.testing.assert_allclose(np.asarray(fy), _nhwc(ty), rtol=1e-4, atol=1e-4)


def test_posenet_parity_and_coords():
    torch.manual_seed(1)
    joint_num, depth_dim = 4, 8
    tm = tref.PoseNet(18, joint_num, depth_dim).eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.8, 1.2)
        # make heatmaps non-flat so soft-argmax is discriminative
        tm.head.final.weight.mul_(50.0)

    x = np.random.RandomState(1).randn(2, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        t_hm = tm(torch.from_numpy(x))
        t_coords = tref.soft_argmax_3d(t_hm, joint_num, depth_dim).numpy()

    # bgr_input=False: both models see the identical array here, so the
    # RGB<->BGR stem reversal (meant for real cv2-trained snapshots) must
    # be disabled for a like-for-like parity check.
    params, stats = convert_posenet(tm.state_dict(), 18, bgr_input=False)
    fm = PoseNet(resnet_type=18, joint_num=joint_num, depth_dim=depth_dim)
    f_hm = fm.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(_nhwc(x)), train=False
    )
    # heatmap parity: torch (B, J*D, H, W) vs flax (B, H, W, J*D)
    np.testing.assert_allclose(
        np.asarray(f_hm), _nhwc(t_hm.numpy()), rtol=1e-3, atol=1e-3
    )
    f_coords = fm.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(_nhwc(x)),
        train=False,
        method=fm.coords,
    )
    # BASELINE config #1: joint-coordinate parity vs the torch reference
    np.testing.assert_allclose(np.asarray(f_coords), t_coords, atol=2e-3)


def test_dataparallel_prefix_stripped():
    """Reference snapshots are saved through nn.DataParallel and carry
    'module.' prefixes (common/base.py:save_model)."""
    torch.manual_seed(2)
    tm = tref.ResNetBackbone(18)
    sd = {"module." + k: v for k, v in tm.state_dict().items()}
    stripped = {k[7:]: v for k, v in sd.items()}
    p1, _ = convert_backbone(stripped, 18)
    assert "conv1" in p1 and "layer4_1" in p1


def test_s2d_stem_backbone_parity():
    """s2d_stem=True + s2d_stem_kernel-embedded weights must reproduce the
    standard backbone exactly (measured perf-neutral in situ on v5e; kept as
    a documented option)."""
    torch.manual_seed(3)
    tm = tref.ResNetBackbone(18).eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.3, 0.3)
                m.running_var.uniform_(0.7, 1.3)
    x = np.random.RandomState(4).randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        ty = tm(torch.from_numpy(x)).numpy()

    params, stats = convert_backbone(tm.state_dict(), 18, s2d_stem=True)
    fm = ResNetBackbone(resnet_type=18, s2d_stem=True)
    fy = fm.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(_nhwc(x)), train=False
    )
    np.testing.assert_allclose(np.asarray(fy), _nhwc(ty), rtol=1e-4, atol=1e-4)
