"""BASELINE config #2: MPII 2D integral regression end-to-end.

depth_dim=1 exercises the plain-JAX integral fallback (no legal 128-lane
tiling), the z-masked loss (joints_have_depth=0), and the PCKh evaluator.
"""

import jax
import numpy as np
import pytest

from ihpr_tpu.config import DataConfig, ModelConfig, OptimConfig, get_config
from ihpr_tpu.data import skeletons
from ihpr_tpu.data.datasets import (
    PoseDataset,
    evaluate_mpii_pckh,
    make_synthetic,
)
from ihpr_tpu.data.pipeline import BatchLoader, prefetch_to_device
from ihpr_tpu.parallel import (
    batch_sharding,
    create_train_state,
    make_eval_step,
    make_mesh,
    make_train_step,
)


@pytest.fixture(scope="module")
def mpii_cfg():
    return get_config("mpii2d_r50").replace(
        model=ModelConfig(resnet_type=18),
        data=DataConfig(
            trainset=("MPII",),
            testset="MPII",
            input_shape=(64, 64),
            output_shape=(16, 16),
            depth_dim=1,
            use_aug=False,
        ),
        optim=OptimConfig(batch_size_per_device=4),
    )


@pytest.fixture(scope="module")
def mpii_data():
    skel = skeletons.MPII
    return PoseDataset("MPII", skel, make_synthetic(skel, 8, seed=5, img_size=200), True)


def test_mpii_train_step_runs_and_z_grad_zero(mpii_cfg, mpii_data):
    from ihpr_tpu.models.pose_net import build_pose_net

    mesh = make_mesh(1)
    loader = BatchLoader([mpii_data], mpii_cfg, 4, train=True, num_workers=0)
    model = build_pose_net(mpii_cfg)
    assert model.joint_num == 16 and model.depth_dim == 1
    state, tx = create_train_state(model, mpii_cfg, jax.random.key(0), 10)
    step = make_train_step(model, tx, mpii_cfg, mesh, donate=False)
    hb = next(loader.epoch(0))
    batch, _ = next(iter(prefetch_to_device(iter([hb]), batch_sharding(mesh))))
    state, metrics = step(state, batch, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))


def test_mpii_eval_and_pckh(mpii_cfg, mpii_data):
    from ihpr_tpu.models.pose_net import build_pose_net

    mesh = make_mesh(1)
    loader = BatchLoader([mpii_data], mpii_cfg, 4, train=False, num_workers=0)
    model = build_pose_net(mpii_cfg)
    state, _ = create_train_state(model, mpii_cfg, jax.random.key(0), 10)
    ev = make_eval_step(model, mpii_cfg, mesh)
    hb = next(loader.epoch(0))
    batch, _ = next(iter(prefetch_to_device(iter([hb]), batch_sharding(mesh))))
    coords, _, _ = ev(state.params, state.batch_stats, batch)
    assert coords.shape == (4, 16, 3)

    # PCKh on perfect predictions = 1.0; on garbage ~0
    samples = mpii_data.samples[:4]
    perfect = np.stack([s["joint_img"] for s in samples])
    m = evaluate_mpii_pckh(perfect, samples)
    assert m["PCKh@0.5"] == 1.0
    garbage = perfect + 500.0
    m2 = evaluate_mpii_pckh(garbage, samples)
    assert m2["PCKh@0.5"] < 0.1


def test_coco_oks_ap_sanity():
    from ihpr_tpu.data.coco import keypoint_ap

    rng = np.random.RandomState(0)
    gts, dts_good, dts_bad = [], [], []
    for i in range(10):
        k = rng.uniform(50, 150, (17, 2))
        gt = np.concatenate([k, np.ones((17, 1))], 1)
        gts.append(dict(image_id=i, keypoints=gt, area=4000.0))
        dts_good.append(dict(image_id=i, keypoints=np.concatenate([k + rng.randn(17, 2) * 0.5, np.ones((17, 1))], 1), score=0.9))
        dts_bad.append(dict(image_id=i, keypoints=np.concatenate([k + 300, np.ones((17, 1))], 1), score=0.9))
    good = keypoint_ap(gts, dts_good)
    bad = keypoint_ap(gts, dts_bad)
    assert good["AP"] > 0.9, good
    assert bad["AP"] < 0.05, bad
