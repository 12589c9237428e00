"""Integration: synthetic end-to-end training, DP equivalence, resume.

SURVEY.md §4: 2-step train on synthetic data (loss decreases, grads finite,
checkpoint save/restore round-trips); the 8-fake-device mesh substitutes for
multi-chip hardware — the sharded gradient must equal the single-device
gradient of the same global batch.
"""

import shutil
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ihpr_tpu.config import DataConfig, ModelConfig, OptimConfig, get_config
from ihpr_tpu.data import skeletons
from ihpr_tpu.data.datasets import PoseDataset, make_synthetic
from ihpr_tpu.data.pipeline import BatchLoader, prefetch_to_device
from ihpr_tpu.engine.checkpoint import CheckpointManager
from ihpr_tpu.parallel import (
    batch_sharding,
    create_train_state,
    make_eval_step,
    make_mesh,
    make_train_step,
)


@pytest.fixture(scope="module")
def tiny_cfg():
    # resnet 18 + small volume keeps CPU runtime tolerable
    return get_config("h36m3d_r50").replace(
        model=ModelConfig(resnet_type=18),
        data=DataConfig(
            trainset=("Human36M",),
            input_shape=(64, 64),
            output_shape=(16, 16),
            depth_dim=16,
            bbox_3d_shape=(2000, 2000, 2000),
            use_aug=False,  # deterministic batches so loss-decrease is testable
        ),
        optim=OptimConfig(batch_size_per_device=1, lr=1e-2),
    )


@pytest.fixture(scope="module")
def tiny_data(tiny_cfg):
    skel = skeletons.H36M
    samples = make_synthetic(skel, 16, seed=0, img_size=200)
    return PoseDataset("Human36M", skel, samples, is_train=True)


def _make_all(cfg, dataset, mesh, batch_size):
    from ihpr_tpu.models.pose_net import build_pose_net

    loader = BatchLoader([dataset], cfg, batch_size, train=True, num_workers=0)
    model = build_pose_net(cfg)
    state, tx = create_train_state(model, cfg, jax.random.key(0), len(loader))
    step = make_train_step(model, tx, cfg, mesh, donate=False)
    return loader, model, state, tx, step


def test_loss_decreases_and_grads_finite(tiny_cfg, tiny_data):
    mesh = make_mesh(1)
    loader, model, state, tx, step = _make_all(tiny_cfg, tiny_data, mesh, 8)
    rng = jax.random.key(1)
    losses = []
    hb = next(loader.epoch(0))  # overfit one fixed batch
    for i in range(8):
        batch, _ = next(iter(prefetch_to_device(iter([hb]), batch_sharding(mesh))))
        state, metrics = step(state, batch, rng)
        assert np.isfinite(float(metrics["loss"]))
        assert np.isfinite(float(metrics["grad_norm"]))
        losses.append(float(metrics["loss"]))
    # z is random on blob images (irreducible), so the floor is nonzero;
    # require a clear monotone-ish drop rather than a fixed ratio.
    assert losses[-1] < losses[0] - 0.05, losses


def test_dp8_matches_single_device_gradient(tiny_cfg, tiny_data):
    """allreduce grads over the 8-device mesh == single-device grads of the
    concatenated batch (SURVEY.md §4 distributed-without-a-cluster).

    BN runs in inference mode here: train-mode batch-stat reductions are
    numerically chaotic on near-constant synthetic images (var ~ eps, so
    rsqrt amplifies cross-shard reduction-order noise by ~1e4), which would
    mask real partitioning bugs. With fixed stats the partitioned program
    must agree to fp32 reduction noise (~1e-8); the train-BN loss value is
    additionally checked at 1e-5."""
    assert jax.device_count() >= 8
    cfg = tiny_cfg
    # device-warp path: the custom loss below consumes raw canvases
    loader = BatchLoader([tiny_data], cfg, 8, train=True, num_workers=0, host_warp=False)
    hb = next(loader.epoch(0))

    mesh8 = make_mesh(8)
    mesh1 = make_mesh(1)
    from ihpr_tpu.data.augment import make_patch_batch
    from ihpr_tpu.models.pose_net import build_pose_net
    from ihpr_tpu.ops import joint_location_loss
    from ihpr_tpu.ops.integral_pallas import soft_argmax_from_heatmap
    from ihpr_tpu.parallel.mesh import replicated_sharding

    model = build_pose_net(cfg)
    state, tx = create_train_state(model, cfg, jax.random.key(0), 10)
    perm = tiny_data.skeleton.flip_permutation()

    def make_grad_fn(mesh):
        def loss_fn(params, batch):
            patch = make_patch_batch(
                batch["canvas"], batch["canvas_origin"], batch["canvas_scale"],
                batch["bbox"], batch["joints"], batch["joint_vis"],
                batch["joints_have_depth"], perm, cfg.data, rng=None, train=False,
            )
            hm = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                patch.image, train=False,
            )
            c = soft_argmax_from_heatmap(hm, 18, cfg.data.depth_dim)
            return joint_location_loss(
                c, patch.joint_img, patch.joint_vis, patch.joints_have_depth
            )

        rep = replicated_sharding(mesh)
        return jax.jit(
            jax.value_and_grad(loss_fn), in_shardings=(rep, batch_sharding(mesh))
        )

    def put(mesh):
        b, _ = next(iter(prefetch_to_device(iter([hb]), batch_sharding(mesh))))
        return b

    l8, g8 = make_grad_fn(mesh8)(state.params, put(mesh8))
    l1, g1 = make_grad_fn(mesh1)(state.params, put(mesh1))
    np.testing.assert_allclose(float(l8), float(l1), rtol=1e-6)
    import optax

    gn = float(optax.global_norm(g1))
    for a, b in zip(jax.tree.leaves(g8), jax.tree.leaves(g1)):
        d = np.linalg.norm(np.asarray(a, np.float64) - np.asarray(b, np.float64))
        assert d < 1e-6 * max(gn, 1.0), (np.asarray(a).shape, d)

    # full train-mode step still agrees on the loss across meshes
    step8 = make_train_step(model, tx, cfg, mesh8, donate=False)
    step1 = make_train_step(model, tx, cfg, mesh1, donate=False)
    rng = jax.random.key(2)
    _, m8 = step8(state, put(mesh8), rng)
    _, m1 = step1(state, put(mesh1), rng)
    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]), rtol=1e-5)


def test_checkpoint_roundtrip_and_resume(tiny_cfg, tiny_data):
    mesh = make_mesh(1)
    loader, model, state, tx, step = _make_all(tiny_cfg, tiny_data, mesh, 4)
    rng = jax.random.key(3)
    hb = next(loader.epoch(0))
    batch, _ = next(iter(prefetch_to_device(iter([hb]), batch_sharding(mesh))))
    state, _ = step(state, batch, rng)

    tmp = tempfile.mkdtemp()
    try:
        ckpt = CheckpointManager(tmp)
        ckpt.save(0, state, rng)  # async; latest_epoch/load drain it
        assert ckpt.latest_epoch() == 0
        template, _ = create_train_state(model, tiny_cfg, jax.random.key(9), 10)
        restored, r_rng, epoch, itr = ckpt.load_latest(template, jax.random.key(9))
        assert itr == -1
        assert epoch == 0
        for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # one more step from the restored state must equal one from the live
        s_a, m_a = step(state, batch, rng)
        s_b, m_b = step(restored, batch, r_rng)
        np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]), rtol=1e-6)
    finally:
        shutil.rmtree(tmp)


def test_checkpoint_retention_keep(tiny_cfg, tiny_data):
    """keep=N retains only the newest N snapshots; resume still works
    from the latest survivor (OptimConfig.snapshot_keep)."""
    mesh = make_mesh(1)
    _, model, state, _, step = _make_all(tiny_cfg, tiny_data, mesh, 4)
    rng = jax.random.key(3)
    tmp = tempfile.mkdtemp()
    try:
        ckpt = CheckpointManager(tmp, keep=2)
        for e in range(4):
            ckpt.save(e, state, rng)
        ckpt.wait()
        assert ckpt._epochs_on_disk() == [2, 3]
        assert ckpt.latest_epoch() == 3
        template, _ = create_train_state(model, tiny_cfg, jax.random.key(9), 10)
        _, _, epoch, _ = ckpt.load_latest(template, jax.random.key(9))
        assert epoch == 3
    finally:
        shutil.rmtree(tmp)


def test_trainer_snapshot_interval(tiny_cfg, tiny_data, tmp_path):
    """snapshot_interval thins per-epoch saves; the final epoch is always
    saved so --continue/Tester see the end state."""
    import dataclasses

    from ihpr_tpu.engine.trainer import Trainer

    cfg = tiny_cfg.replace(
        output_dir=str(tmp_path),
        optim=dataclasses.replace(
            tiny_cfg.optim, end_epoch=5, snapshot_interval=2, snapshot_keep=2
        ),
    )
    tr = Trainer(cfg, datasets=[tiny_data], num_workers=0)
    tr.cap_steps_per_epoch(1)
    tr.train(end_epoch=5)
    # saved at epochs 1, 3 (interval) and 4 (final); keep=2 -> {3, 4}
    assert tr.ckpt._epochs_on_disk() == [3, 4]


def test_eval_step_flip_test(tiny_cfg, tiny_data):
    mesh = make_mesh(2)
    cfg = tiny_cfg
    loader = BatchLoader([tiny_data], cfg, 4, train=False, num_workers=0)
    from ihpr_tpu.models.pose_net import build_pose_net

    model = build_pose_net(cfg)
    state, _ = create_train_state(model, cfg, jax.random.key(0), 10)
    ev = make_eval_step(model, cfg, mesh)
    hb = next(loader.epoch(0))
    batch, _ = next(iter(prefetch_to_device(iter([hb]), batch_sharding(mesh))))
    coords, joint_img, vis = ev(state.params, state.batch_stats, batch)
    assert coords.shape == (4, 18, 3)
    assert bool(jnp.isfinite(coords).all())


def test_mixed_h36m_mpii_training(tiny_cfg):
    """Mixed H36M+MPII batches — the BASELINE default trainset. MPII rows
    are unified onto the H36M 18-joint order (reference common/base.py +
    transform_joint_to_other_db): z supervision masked off
    (joints_have_depth=0), H36M-only joints (Torso, Nose) invisible; one
    production step trains finite on the mixed batch."""
    import dataclasses

    cfg = tiny_cfg.replace(
        data=dataclasses.replace(tiny_cfg.data, trainset=("Human36M", "MPII"))
    )
    h36m = PoseDataset(
        "Human36M", skeletons.H36M, make_synthetic(skeletons.H36M, 8, seed=0, img_size=200), True
    )
    mpii = PoseDataset(
        "MPII", skeletons.MPII, make_synthetic(skeletons.MPII, 8, seed=1, img_size=200), True
    )
    loader = BatchLoader([h36m, mpii], cfg, 4, train=True, num_workers=0)

    h36m_only = [
        i
        for i, n in enumerate(skeletons.H36M.joints_name)
        if n not in skeletons.MPII.joints_name
    ]
    assert h36m_only == [7, 9]  # Torso, Nose

    seen_depth = set()
    batches = list(loader.epoch(0))
    for hb in batches:
        assert hb.joint_img.shape[1] == 18  # primary (H36M) joint order
        for r in range(len(hb.joints_have_depth)):
            seen_depth.add(float(hb.joints_have_depth[r]))
            if hb.joints_have_depth[r] == 0.0:  # MPII-origin row
                assert (hb.joint_vis[r, h36m_only] == 0).all()
    assert seen_depth == {0.0, 1.0}  # both datasets fed the epoch

    from ihpr_tpu.models.pose_net import build_pose_net

    mesh = make_mesh(2)
    model = build_pose_net(cfg)
    state, tx = create_train_state(model, cfg, jax.random.key(0), 4, mesh=mesh)
    step = make_train_step(model, tx, cfg, mesh, donate=False)
    batch, _ = next(iter(prefetch_to_device(iter(batches[:1]), batch_sharding(mesh))))
    _, metrics = step(state, batch, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))


def test_train_drains_checkpoint_on_abnormal_exit(tiny_cfg, tiny_data, tmp_path):
    """Any exit from Trainer.train — including the SIGTERM -> SystemExit
    unwind installed by the CLIs (utils/shutdown.py) — must drain the
    in-flight async orbax snapshot, or interpreter shutdown races the
    post-commit metadata write and can strand a metadata-less snapshot."""
    import dataclasses

    from ihpr_tpu.engine.trainer import Trainer

    cfg = tiny_cfg.replace(
        output_dir=str(tmp_path),
        optim=dataclasses.replace(tiny_cfg.optim, end_epoch=3, snapshot_interval=1),
    )
    tr = Trainer(cfg, datasets=[tiny_data], num_workers=0)
    tr.cap_steps_per_epoch(1)

    drained = []
    real_wait = tr.ckpt.wait
    tr.ckpt.wait = lambda: (drained.append(True), real_wait())[1]

    # Interrupt mid-epoch-1, right after epoch 0's async save was issued.
    def exploding(fn):
        def wrapped(state, batch, rng):
            if int(state.step) >= 1:
                raise SystemExit(143)  # what the SIGTERM handler raises
            return fn(state, batch, rng)

        return wrapped

    tr.lean_step_fn = exploding(tr.lean_step_fn)
    tr.step_fn = exploding(tr.step_fn)
    with pytest.raises(SystemExit):
        tr.train(end_epoch=3)
    assert drained, "Trainer.train must call ckpt.wait() on abnormal exit"
    # The drained snapshot is complete and restorable.
    template = jax.tree.map(lambda x: x, tr.state)
    _, _, epoch, _ = tr.ckpt.load_latest(template, jax.random.key(9))
    assert epoch == 0  # epoch 0's snapshot, committed + metadata complete


def test_trainer_rss_watchdog_preempts_and_resumes(tiny_cfg, tiny_data, tmp_path):
    """Host-RSS watchdog (utils/hostmem.py): the platform's PJRT client
    leaks every H2D batch on the host, so long runs must self-preempt
    BEFORE the kernel OOM-killer SIGKILLs them (which would also
    seat-lock the TPU). With an impossible 1 MB limit the Trainer must
    snapshot epoch 0 and raise SystemExit(EX_TEMPFAIL); a continue_train
    relaunch (what tools/train_supervised.sh automates) must resume at
    epoch 1 and finish the run."""
    import dataclasses

    from ihpr_tpu.engine.trainer import Trainer
    from ihpr_tpu.utils.hostmem import EX_TEMPFAIL, resolve_rss_limit_mb

    cfg = tiny_cfg.replace(
        output_dir=str(tmp_path),
        optim=dataclasses.replace(
            tiny_cfg.optim, end_epoch=3, snapshot_interval=10, snapshot_keep=3
        ),
    )
    tr = Trainer(cfg, datasets=[tiny_data], num_workers=0, rss_limit_mb=1.0)
    tr.cap_steps_per_epoch(1)
    with pytest.raises(SystemExit) as exc:
        tr.train(end_epoch=3)
    assert exc.value.code == EX_TEMPFAIL
    tr.ckpt.wait()
    # interval=10 would not have saved epoch 0 — the watchdog must have
    assert tr.ckpt._epochs_on_disk() == [0]

    tr2 = Trainer(
        cfg, datasets=[tiny_data], num_workers=0, continue_train=True,
        rss_limit_mb=0,  # 0 disables the watchdog
    )
    assert tr2.rss_limit_mb is None
    assert tr2.start_epoch == 1
    tr2.cap_steps_per_epoch(1)
    tr2.train(end_epoch=3)
    tr2.ckpt.wait()
    assert 2 in tr2.ckpt._epochs_on_disk()  # final epoch saved

    # default (None) resolves to 80% of MemTotal — present and generous
    auto = resolve_rss_limit_mb(None)
    assert auto is None or auto > 1000


def test_trainer_rss_watchdog_trips_mid_epoch_resume_bit_identical(
    tiny_cfg, tiny_data, tmp_path
):
    """Step-granular RSS watchdog (VERDICT r4 Weak #5: the H2D leak is
    per-STEP, so a real-data epoch can OOM between epoch-boundary checks).
    With rss_check_interval_steps=1 and an impossible limit the Trainer
    must snapshot MID-epoch (itr recorded) and exit EX_TEMPFAIL; the
    --continue relaunch must skip exactly the consumed batches and finish
    with parameters BIT-IDENTICAL to an uninterrupted run."""
    import dataclasses

    from ihpr_tpu.engine.trainer import Trainer
    from ihpr_tpu.utils.hostmem import EX_TEMPFAIL

    def mk(outdir):
        return tiny_cfg.replace(
            output_dir=str(tmp_path / outdir),
            optim=dataclasses.replace(
                tiny_cfg.optim, end_epoch=2, snapshot_interval=10
            ),
        )

    # Reference: uninterrupted 2-epoch run, watchdog off. 16 samples /
    # global batch 8 = 2 steps per epoch.
    tr_ref = Trainer(mk("ref"), datasets=[tiny_data], num_workers=0, rss_limit_mb=0)
    ref_state = tr_ref.train(end_epoch=2)

    # Interrupted run: vote every step -> trips after itr 0 of epoch 0
    # (itr 0 is not the last itr, so this is the MID-epoch path).
    cfg = mk("run")
    tr = Trainer(
        cfg, datasets=[tiny_data], num_workers=0,
        rss_limit_mb=1.0, rss_check_interval_steps=1,
    )
    with pytest.raises(SystemExit) as exc:
        tr.train(end_epoch=2)
    assert exc.value.code == EX_TEMPFAIL
    tr.ckpt.wait()
    st, _, epoch, itr = tr.ckpt.load(0, tr.state, jax.random.key(0))
    assert (epoch, itr) == (0, 0)
    assert int(np.asarray(st.step)) == 1  # exactly one completed step

    # Relaunch with --continue semantics: resumes INSIDE epoch 0, skipping
    # the one consumed batch, and must reproduce the reference exactly.
    tr2 = Trainer(
        cfg, datasets=[tiny_data], num_workers=0,
        continue_train=True, rss_limit_mb=0,
    )
    assert (tr2.start_epoch, tr2.resume_skip) == (0, 1)
    final = tr2.train(end_epoch=2)
    assert int(np.asarray(final.step)) == int(np.asarray(ref_state.step))
    for a, b in zip(
        jax.tree.leaves(jax.device_get(ref_state.params)),
        jax.tree.leaves(jax.device_get(final.params)),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_legacy_snapshot_without_itr_field(tiny_cfg, tiny_data, tmp_path):
    """Pre-round-5 snapshots carry no 'itr' field; load() must fall back to
    the legacy template and report itr=-1 (epoch complete)."""
    mesh = make_mesh(1)
    loader, model, state, tx, step = _make_all(tiny_cfg, tiny_data, mesh, 8)
    ckpt = CheckpointManager(str(tmp_path))
    legacy = {
        "state": jax.device_get(state),
        "rng": np.asarray(jax.random.key_data(jax.random.key(5))),
        "epoch": np.asarray(7, np.int32),
    }
    ckpt._ckpt.save(ckpt._path(7), legacy, force=True)
    ckpt._ckpt.wait_until_finished()
    st, rng, epoch, itr = ckpt.load(7, state, jax.random.key(0))
    assert (epoch, itr) == (7, -1)
    a = np.concatenate([np.ravel(x) for x in jax.tree.leaves(jax.device_get(state.params))])
    b = np.concatenate([np.ravel(x) for x in jax.tree.leaves(st["params"] if isinstance(st, dict) else st.params)])
    np.testing.assert_array_equal(a, b)


def test_profiler_window_survives_mid_epoch_preempt_and_resume(
    tiny_cfg, tiny_data, tmp_path
):
    """Two profiler/preempt edges: (a) an RSS preempt INSIDE the profile
    window [start, stop) must close the trace (train()'s finally) rather
    than leave it open across the process exit; (b) a mid-epoch resume
    landing inside the window skips the start itr, so the stop itr must
    not call stop_trace without a start (it raises)."""
    import dataclasses

    from ihpr_tpu.engine.trainer import Trainer
    from ihpr_tpu.utils.hostmem import EX_TEMPFAIL

    cfg = tiny_cfg.replace(
        output_dir=str(tmp_path / "run"),
        optim=dataclasses.replace(
            tiny_cfg.optim, end_epoch=2, snapshot_interval=10
        ),
    )
    # 16 samples / global batch 8 = 2 steps/epoch; trip at itr 0 with the
    # trace started at itr 0 (profile_steps=(0, 1)).
    tr = Trainer(
        cfg, datasets=[tiny_data], num_workers=0,
        rss_limit_mb=1.0, rss_check_interval_steps=1,
    )
    with pytest.raises(SystemExit) as exc:
        tr.train(
            end_epoch=2,
            profile_dir=str(tmp_path / "prof"),
            profile_steps=(0, 1),
        )
    assert exc.value.code == EX_TEMPFAIL
    assert tr._tracing is False, "preempt inside the window left the trace open"

    # --continue resumes at itr 1 == stop itr, with no start this run.
    tr2 = Trainer(
        cfg, datasets=[tiny_data], num_workers=0,
        continue_train=True, rss_limit_mb=0,
    )
    assert (tr2.start_epoch, tr2.resume_skip) == (0, 1)
    tr2.train(
        end_epoch=2,
        profile_dir=str(tmp_path / "prof2"),
        profile_steps=(0, 1),
    )
    assert tr2._tracing is False
