"""Model architecture tests: shapes and parameter counts.

Parameter counts are pinned against torchvision's published totals (minus
the avgpool/fc the reference strips — common/nets/resnet.py) so the Flax
rebuild is structurally identical to the reference backbone.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ihpr_tpu.config import get_config
from ihpr_tpu.models import ResNetBackbone
from ihpr_tpu.models.pose_net import build_pose_net, init_pose_net

# torchvision totals minus fc (512*1000+1000 or 2048*1000+1000)
BACKBONE_PARAM_COUNTS = {
    18: 11_176_512,
    34: 21_284_672,
    50: 23_508_032,
    101: 42_500_160,
    152: 58_143_808,
}


def _count(tree):
    return sum(np.prod(x.shape) for x in jax.tree.leaves(tree))


@pytest.mark.parametrize("rt", [18, 50])
def test_backbone_shape(rt):
    model = ResNetBackbone(resnet_type=rt)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = model.init(jax.random.key(0), x, train=False)
    y = model.apply(vars_, x, train=False)
    c = 512 if rt == 18 else 2048
    assert y.shape == (1, 2, 2, c)


@pytest.mark.parametrize("rt", sorted(BACKBONE_PARAM_COUNTS))
def test_backbone_param_count(rt):
    model = ResNetBackbone(resnet_type=rt)
    x = jnp.zeros((1, 32, 32, 3))
    vars_ = jax.eval_shape(lambda: model.init(jax.random.key(0), x, train=False))
    assert _count(vars_["params"]) == BACKBONE_PARAM_COUNTS[rt]


def test_pose_net_heatmap_shape():
    cfg = get_config("parity_r50")
    model = build_pose_net(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = model.init(jax.random.key(0), x, train=False)
    hm = model.apply(vars_, x, train=False)
    # stride-4 output with J*D channels
    assert hm.shape == (1, 16, 16, 18 * 64)
    assert hm.dtype == jnp.float32


def test_pose_net_coords_path():
    cfg = get_config("parity_r50")
    model = build_pose_net(cfg)
    x = jnp.zeros((2, 64, 64, 3))
    params, batch_stats = init_pose_net(model, jax.random.key(0), (64, 64))
    coords = model.apply(
        {"params": params, "batch_stats": batch_stats},
        x,
        train=False,
        method=model.coords,
    )
    assert coords.shape == (2, 18, 3)
    assert bool(jnp.isfinite(coords).all())


def test_train_mode_updates_batch_stats():
    cfg = get_config("parity_r50")
    model = build_pose_net(cfg)
    x = jax.random.normal(jax.random.key(1), (2, 64, 64, 3))
    vars_ = model.init(jax.random.key(0), x, train=False)
    _, updates = model.apply(
        vars_, x, train=True, mutable=["batch_stats"]
    )
    old = jax.tree.leaves(vars_["batch_stats"])
    new = jax.tree.leaves(updates["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_bf16_compute_dtype_fp32_logits():
    cfg = get_config("h36m3d_r50_dp")  # bf16 matmuls config
    model = build_pose_net(cfg)
    x = jnp.zeros((1, 64, 64, 3))
    vars_ = model.init(jax.random.key(0), x, train=False)
    hm = model.apply(vars_, x, train=False)
    assert hm.dtype == jnp.float32  # head casts logits back to fp32
    # params remain fp32 master copies
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(vars_["params"]))


def test_subpixel_deconv_matches_convtranspose():
    """SubpixelConvTranspose must be bit-equivalent to nn.ConvTranspose
    (same 'kernel' param) — it exists purely as a faster lowering."""
    import flax.linen as nn

    from ihpr_tpu.models.head import SubpixelConvTranspose

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 7, 5, 3).astype(np.float32))
    w = jnp.asarray(rng.randn(4, 4, 3, 6).astype(np.float32))
    ref = nn.ConvTranspose(6, (4, 4), strides=(2, 2), padding="SAME", use_bias=False)
    ours = SubpixelConvTranspose(6)
    y_ref = ref.apply({"params": {"kernel": w}}, x)
    y_ours = ours.apply({"params": {"kernel": w}}, x)
    assert y_ours.shape == y_ref.shape == (2, 14, 10, 6)
    np.testing.assert_allclose(np.asarray(y_ours), np.asarray(y_ref), rtol=1e-5, atol=1e-5)
