"""Spatial partitioning: image rows sharded across mesh devices.

The CNN analog of sequence parallelism (SURVEY.md §2 parallelism
inventory; the reference has DP only): a 2-axis ``(data, spatial)`` mesh
shards each sample's H axis so ONE sample's compute/memory spreads over
chips — GSPMD inserts the conv halo exchanges. These tests pin, on the
8-virtual-CPU-device mesh, that the spatially-partitioned program is the
SAME program: identical loss/gradients/coordinates to an unpartitioned
run of the same global batch (the integral routes through the plain-XLA
composition under spatial sharding — pallas_call has no GSPMD rule).
"""

import dataclasses

import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from ihpr_tpu.config import DataConfig, ModelConfig, OptimConfig, get_config
from ihpr_tpu.data import skeletons
from ihpr_tpu.data.datasets import PoseDataset, make_synthetic
from ihpr_tpu.data.pipeline import BatchLoader, prefetch_to_device
from ihpr_tpu.parallel import (
    batch_sharding,
    create_train_state,
    make_eval_step,
    make_mesh,
    make_train_step,
)


@pytest.fixture(scope="module")
def tiny_cfg():
    return get_config("h36m3d_r50").replace(
        model=ModelConfig(resnet_type=18),
        data=DataConfig(
            trainset=("Human36M",),
            input_shape=(64, 64),
            output_shape=(16, 16),
            depth_dim=16,
            bbox_3d_shape=(2000, 2000, 2000),
            use_aug=False,
        ),
        optim=OptimConfig(batch_size_per_device=1, lr=1e-2),
    )


@pytest.fixture(scope="module")
def tiny_data(tiny_cfg):
    skel = skeletons.H36M
    samples = make_synthetic(skel, 16, seed=0, img_size=200)
    return PoseDataset("Human36M", skel, samples, is_train=True)


def _mesh_1x1():
    """Unpartitioned reference with the SAME code path: a 2-axis mesh of
    one device still selects the plain-composition integral, so any
    difference vs the sharded run is partitioning, not kernel numerics."""
    return Mesh(np.asarray(jax.devices()[:1]).reshape(1, 1), ("data", "spatial"))


def test_make_mesh_spatial_shape():
    m = make_mesh(spatial_axis_size=4)
    assert dict(m.shape) == {"data": 2, "spatial": 4}
    m = make_mesh(2, spatial_axis_size=2)
    assert dict(m.shape) == {"data": 2, "spatial": 2}
    # 1-axis behavior unchanged
    assert dict(make_mesh(8).shape) == {"data": 8}
    # invalid grids fail loudly, not as 0-device meshes / dropped chips
    with pytest.raises(ValueError):
        make_mesh(spatial_axis_size=16)  # > device count
    with pytest.raises(ValueError):
        make_mesh(spatial_axis_size=3)  # does not divide 8
    with pytest.raises(ValueError):
        make_mesh(4, spatial_axis_size=4)  # 16 devices needed, 8 visible


def test_spatial_train_step_matches_unpartitioned(tiny_cfg, tiny_data):
    """The spatially-partitioned program is the SAME program.

    (a) eval-mode loss + gradients on a (2, 4) mesh — batch over data,
    rows over spatial — equal the unpartitioned plain-path run to fp32
    reduction noise (fixed BN stats, same reasoning as the DP8 gradient
    test: train-mode batch-stat rsqrt amplifies cross-shard reduction
    order on near-constant synthetic images and would mask real
    partitioning bugs). (b) the full train-mode step still agrees on the
    loss. Post-Adam params are NOT compared: Adam maps near-zero gradient
    noise to ±lr sign flips on the first step."""
    assert jax.device_count() >= 8
    cfg = tiny_cfg
    loader = BatchLoader([tiny_data], cfg, 2, train=True, num_workers=0)
    hb = next(loader.epoch(0))

    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ihpr_tpu.data.augment import finalize_patch
    from ihpr_tpu.models.pose_net import build_pose_net
    from ihpr_tpu.ops import joint_location_loss
    from ihpr_tpu.parallel.mesh import image_sharding, replicated_sharding

    model = build_pose_net(cfg)
    state, tx = create_train_state(model, cfg, jax.random.key(0), 10)
    rng = jax.random.key(2)

    def make_grad_fn(mesh):
        def loss_fn(params, batch):
            image = finalize_patch(batch["patch"], batch["color_scale"], cfg.data)
            image = jax.lax.with_sharding_constraint(image, image_sharding(mesh))
            c = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                image, train=False, method=model.coords_plain,
            )
            return joint_location_loss(
                c, batch["joint_img"], batch["joint_vis"], batch["joints_have_depth"]
            )

        rep = replicated_sharding(mesh)
        return jax.jit(
            jax.value_and_grad(loss_fn), in_shardings=(rep, batch_sharding(mesh))
        )

    def put(mesh):
        b, _ = next(iter(prefetch_to_device(iter([hb]), batch_sharding(mesh))))
        return b

    mesh_sp = make_mesh(2, spatial_axis_size=4)
    mesh_1 = _mesh_1x1()
    l_sp, g_sp = make_grad_fn(mesh_sp)(state.params, put(mesh_sp))
    l_1, g_1 = make_grad_fn(mesh_1)(state.params, put(mesh_1))
    np.testing.assert_allclose(float(l_sp), float(l_1), rtol=1e-6)
    gn = float(optax.global_norm(g_1))
    for a, b in zip(jax.tree.leaves(g_sp), jax.tree.leaves(g_1)):
        d = np.linalg.norm(np.asarray(a, np.float64) - np.asarray(b, np.float64))
        # 1e-5 (vs the DP8 test's 1e-6): halo-exchange partitioning also
        # re-tiles every conv's SPATIAL reduction, not just the batch sum.
        assert d < 1e-5 * max(gn, 1.0), (np.asarray(a).shape, d)

    # full train-mode step (live BN stats) still agrees on the loss
    def run(mesh):
        step = make_train_step(model, tx, cfg, mesh, donate=False)
        return step(state, put(mesh), rng)

    _, m_sp = run(mesh_sp)
    _, m_1 = run(mesh_1)
    np.testing.assert_allclose(float(m_sp["loss"]), float(m_1["loss"]), rtol=1e-5)


def test_spatial_eval_step_matches_unpartitioned(tiny_cfg, tiny_data):
    """Eval (with the reference flip-test averaging) under a (2, 4)
    spatial mesh equals the unpartitioned plain-path eval."""
    assert jax.device_count() >= 8
    cfg = tiny_cfg
    loader = BatchLoader([tiny_data], cfg, 4, train=False, num_workers=0)
    hb = next(loader.epoch(0))

    from ihpr_tpu.models.pose_net import build_pose_net

    model = build_pose_net(cfg)
    state, _ = create_train_state(model, cfg, jax.random.key(0), 10)

    def run(mesh):
        ev = make_eval_step(model, cfg, mesh)
        batch, _ = next(iter(prefetch_to_device(iter([hb]), batch_sharding(mesh))))
        coords, ji, jv = ev(state.params, state.batch_stats, batch)
        return np.asarray(coords)

    c_sp = run(make_mesh(2, spatial_axis_size=4))
    c_1 = run(_mesh_1x1())
    np.testing.assert_allclose(c_sp, c_1, atol=1e-4)


def test_trainer_spatial_wiring(tiny_cfg, tiny_data, tmp_path):
    """Trainer builds the 2-axis mesh from ParallelConfig and sizes the
    global batch by the DATA axis only; one real capped train step runs
    through the spatial program (loss finite)."""
    cfg = tiny_cfg.replace(
        output_dir=str(tmp_path),
        parallel=dataclasses.replace(tiny_cfg.parallel, spatial_axis_size=2),
        optim=dataclasses.replace(tiny_cfg.optim, end_epoch=1),
    )
    from ihpr_tpu.engine.trainer import Trainer

    tr = Trainer(cfg, datasets=[tiny_data], num_workers=0)
    assert dict(tr.mesh.shape) == {"data": 4, "spatial": 2}
    assert tr.loader.batch_size == 4  # batch_size_per_device * data axis
    tr.cap_steps_per_epoch(1)
    state = tr.train(end_epoch=1)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(state.params))


def test_zero_sharded_opt_state_matches_replicated(tiny_cfg, tiny_data):
    """ZeRO-1 analog (ParallelConfig.shard_opt_state): Adam moments shard
    over the data axis along each leaf's largest divisible dim. The Adam
    math is elementwise, so a train step with sharded opt state must
    reproduce the replicated run's loss and post-step parameters; the
    moment leaves must actually BE sharded (not silently replicated)."""
    assert jax.device_count() >= 8
    cfg = tiny_cfg
    loader = BatchLoader([tiny_data], cfg, 8, train=True, num_workers=0)
    hb = next(loader.epoch(0))
    mesh = make_mesh(8)

    from ihpr_tpu.models.pose_net import build_pose_net
    from ihpr_tpu.parallel import state_shardings

    model = build_pose_net(cfg)

    def run(shard_opt):
        c = cfg.replace(
            parallel=dataclasses.replace(cfg.parallel, shard_opt_state=shard_opt)
        )
        state, tx = create_train_state(model, c, jax.random.key(0), 10, mesh=mesh)
        step = make_train_step(model, tx, c, mesh, donate=False)
        batch, _ = next(iter(prefetch_to_device(iter([hb]), batch_sharding(mesh))))
        new_state, metrics = step(state, batch, jax.random.key(2))
        return new_state, float(metrics["loss"])

    s_z, l_z = run(True)
    s_r, l_r = run(False)
    np.testing.assert_allclose(l_z, l_r, rtol=1e-6)
    for a, b in zip(jax.tree.leaves(s_z.params), jax.tree.leaves(s_r.params)):
        np.testing.assert_allclose(
            np.asarray(a, np.float64), np.asarray(b, np.float64), atol=1e-7
        )
    # the big moment leaves really are distributed
    sharded = [
        x for x in jax.tree.leaves(s_z.opt_state)
        if hasattr(x, "sharding") and x.size >= 1024
        and not x.sharding.is_fully_replicated
    ]
    assert sharded, "no opt-state leaf ended up sharded"
    # and the layout round-trips: a second step reuses the compiled program
    # (same shardings in == out), which `state_shardings` pins
    tmpl = state_shardings(s_z, mesh, True)
    for leaf, sh in zip(jax.tree.leaves(s_z.opt_state), jax.tree.leaves(tmpl.opt_state)):
        assert leaf.sharding.is_equivalent_to(sh, leaf.ndim), (leaf.shape,)


def test_zero_sharded_checkpoint_roundtrip(tiny_cfg, tiny_data, tmp_path):
    """Orbax save/restore with ZeRO-sharded moment leaves: restoring into
    a sharded template reproduces the arrays AND their layout."""
    assert jax.device_count() >= 8
    cfg = tiny_cfg.replace(
        parallel=dataclasses.replace(tiny_cfg.parallel, shard_opt_state=True)
    )
    mesh = make_mesh(8)
    from ihpr_tpu.engine.checkpoint import CheckpointManager
    from ihpr_tpu.models.pose_net import build_pose_net

    model = build_pose_net(cfg)
    state, tx = create_train_state(model, cfg, jax.random.key(0), 10, mesh=mesh)
    ckpt = CheckpointManager(str(tmp_path))
    ckpt.save(0, state, jax.random.key(1))
    template, _ = create_train_state(model, cfg, jax.random.key(9), 10, mesh=mesh)
    restored, _, epoch, _ = ckpt.load_latest(template, jax.random.key(9))
    assert epoch == 0
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restore materializes host arrays; the jitted step's in_shardings
    # re-establish the ZeRO layout on the first post-resume step
    step = make_train_step(model, tx, cfg, mesh, donate=False)
    loader = BatchLoader([tiny_data], cfg, 8, train=True, num_workers=0)
    hb = next(loader.epoch(0))
    batch, _ = next(iter(prefetch_to_device(iter([hb]), batch_sharding(mesh))))
    new_state, metrics = step(restored, batch, jax.random.key(2))
    assert np.isfinite(float(metrics["loss"]))
    sharded = [
        x for x in jax.tree.leaves(new_state.opt_state)
        if hasattr(x, "sharding") and x.size >= 1024
        and not x.sharding.is_fully_replicated
    ]
    assert sharded, "post-resume step lost the ZeRO layout"


def test_trainer_zero_wiring(tiny_cfg, tiny_data, tmp_path):
    """Trainer end-to-end with shard_opt_state: cap_steps_per_epoch
    re-inits the optimizer (inheriting replicated layout), so it must
    re-place the state into the ZeRO layout the jitted step pins."""
    cfg = tiny_cfg.replace(
        output_dir=str(tmp_path),
        parallel=dataclasses.replace(tiny_cfg.parallel, shard_opt_state=True),
        optim=dataclasses.replace(tiny_cfg.optim, end_epoch=1),
    )
    from ihpr_tpu.engine.trainer import Trainer

    tr = Trainer(cfg, datasets=[tiny_data], num_workers=0)
    tr.cap_steps_per_epoch(1)
    state = tr.train(end_epoch=1)
    assert all(np.isfinite(np.asarray(x)).all() for x in jax.tree.leaves(state.params))
    sharded = [
        x for x in jax.tree.leaves(state.opt_state)
        if hasattr(x, "sharding") and x.size >= 1024
        and not x.sharding.is_fully_replicated
    ]
    assert sharded, "trained state lost the ZeRO layout"


@pytest.mark.parametrize("shard_opt", [False, True])
def test_checkpoint_topology_change_resume(tiny_cfg, tiny_data, tmp_path, shard_opt):
    """Resume a dp8 snapshot on a DIFFERENT device count (dp4 and dp1, plus
    dp1 -> dp8) — the first thing that happens when a pod shrinks or a run
    moves hosts (VERDICT r4 Missing #5). Checkpoints hold full host arrays
    (ckpt.save device_gets), so the restored tree is layout-free; the new
    topology's jitted step must re-lay it out — including the
    device-count-DEPENDENT ZeRO moment shards when shard_opt_state=True —
    and continue with the same global-batch math: the post-resume step on
    dp4/dp1 must match the uninterrupted dp8 run."""
    from ihpr_tpu.engine.checkpoint import CheckpointManager
    from ihpr_tpu.models.pose_net import build_pose_net

    assert jax.device_count() >= 8
    cfg = tiny_cfg.replace(
        parallel=dataclasses.replace(tiny_cfg.parallel, shard_opt_state=shard_opt)
    )
    model = build_pose_net(cfg)
    loader = BatchLoader([tiny_data], cfg, 8, train=True, num_workers=0)
    hb0, hb1 = list(loader.epoch(0))[:2]

    def one_step(mesh, state, hb):
        _, tx = create_train_state(model, cfg, jax.random.key(0), 10)
        step = make_train_step(model, tx, cfg, mesh, donate=False)
        batch, _ = next(iter(prefetch_to_device(iter([hb]), batch_sharding(mesh))))
        new_state, metrics = step(state, batch, jax.random.key(2))
        return new_state, float(metrics["loss"])

    # dp8: one step, snapshot (async save drained by latest_epoch inside load)
    mesh8 = make_mesh(8)
    state8, _ = create_train_state(model, cfg, jax.random.key(0), 10, mesh=mesh8)
    state8, _ = one_step(mesh8, state8, hb0)
    ckpt = CheckpointManager(str(tmp_path))
    ckpt.save(0, state8, jax.random.key(1))
    # uninterrupted continuation on dp8 = the truth
    _, loss_ref = one_step(mesh8, state8, hb1)

    for n in (4, 1):
        mesh_n = make_mesh(n)
        template, _ = create_train_state(model, cfg, jax.random.key(9), 10, mesh=mesh_n)
        restored, _, epoch, itr = ckpt.load(0, template, jax.random.key(9))
        assert (epoch, itr) == (0, -1)
        new_state, loss_n = one_step(mesh_n, restored, hb1)
        np.testing.assert_allclose(loss_n, loss_ref, rtol=1e-5, err_msg=f"dp{n}")
        if shard_opt and n > 1:
            sharded = [
                x for x in jax.tree.leaves(new_state.opt_state)
                if hasattr(x, "sharding") and x.size >= 1024
                and not x.sharding.is_fully_replicated
            ]
            assert sharded, f"dp{n} post-resume step lost the ZeRO layout"

    # reverse direction: a dp1 snapshot restored + continued on dp8. The
    # reference is the dp1 run's OWN continuation (state1 != state8 by BN
    # reduction-order noise, so state8's continuation is a different
    # trajectory — only the same-snapshot comparison is meaningful).
    mesh1 = make_mesh(1)
    state1, _ = create_train_state(model, cfg, jax.random.key(0), 10, mesh=mesh1)
    state1, _ = one_step(mesh1, state1, hb0)
    _, loss_ref1 = one_step(mesh1, state1, hb1)
    ckpt2 = CheckpointManager(str(tmp_path / "up"))
    ckpt2.save(0, state1, jax.random.key(1))
    template, _ = create_train_state(model, cfg, jax.random.key(9), 10, mesh=mesh8)
    restored, _, _, _ = ckpt2.load(0, template, jax.random.key(9))
    _, loss_up = one_step(mesh8, restored, hb1)
    np.testing.assert_allclose(loss_up, loss_ref1, rtol=1e-5, err_msg="dp1->dp8")
