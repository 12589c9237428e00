"""Round-2 regression coverage: protocol splits, multi-process input
selection, eval scatter by sample_idx, epoch truncation, batched flip-test,
PCKh headbox normalizer, BGR stem conversion, upstream result artifacts.

Reference behaviors pinned here (reconstructed, mount empty):
``data/Human36M/Human36M.py:~20-40`` protocol subject splits,
``main/test.py:~30-70`` flip-test, MPII official eval's SC_BIAS headbox
normalizer.
"""

import json
import os
import shutil
import tempfile

import jax
import numpy as np
import pytest

from ihpr_tpu.config import DataConfig, EvalConfig, ModelConfig, OptimConfig, get_config
from ihpr_tpu.data import skeletons
from ihpr_tpu.data.datasets import (
    H36M_TEST_SUBJECTS,
    H36M_TRAIN_SUBJECTS,
    PoseDataset,
    evaluate_mpii_pckh,
    make_synthetic,
)
from ihpr_tpu.data.pipeline import BatchLoader, prefetch_to_device
from ihpr_tpu.parallel import batch_sharding, create_train_state, make_eval_step, make_mesh


@pytest.fixture(scope="module")
def tiny_cfg():
    return get_config("h36m3d_r50").replace(
        model=ModelConfig(resnet_type=18),
        data=DataConfig(
            trainset=("Human36M",),
            input_shape=(64, 64),
            output_shape=(16, 16),
            depth_dim=16,
            use_aug=False,
        ),
        optim=OptimConfig(batch_size_per_device=2),
        eval=EvalConfig(flip_test=True, batch_size_per_device=2),
    )


@pytest.fixture(scope="module")
def eval_data():
    skel = skeletons.H36M
    # 10 samples with batch 4 -> final batch padded by repetition
    return PoseDataset("Human36M", skel, make_synthetic(skel, 10, seed=3), False)


# ---------------------------------------------------------------------------


def test_h36m_protocol_subject_splits():
    """Protocol 1 trains on S9 too; protocol 2 holds S9 out for testing
    (reference Human36M.py)."""
    assert H36M_TRAIN_SUBJECTS[1] == (1, 5, 6, 7, 8, 9)
    assert H36M_TRAIN_SUBJECTS[2] == (1, 5, 6, 7, 8)
    assert H36M_TEST_SUBJECTS[1] == (11,)
    assert H36M_TEST_SUBJECTS[2] == (9, 11)


def test_batch_selection_multiprocess(monkeypatch, tiny_cfg, eval_data):
    """Every global batch must be the concatenation, in process order, of
    the per-process row blocks (the mesh's device-per-process order) — and
    processes' blocks must be disjoint."""
    loader = BatchLoader([eval_data], tiny_cfg, 8, train=True, num_workers=0)
    globals_sel = [s.copy() for s in loader._batch_selection(0)]

    pcount = 4
    per_proc = []
    for pidx in range(pcount):
        monkeypatch.setattr(jax, "process_index", lambda p=pidx: p)
        monkeypatch.setattr(jax, "process_count", lambda: pcount)
        per_proc.append([s.copy() for s in loader._batch_selection(0)])
    monkeypatch.undo()

    for b, full in enumerate(globals_sel):
        blocks = [per_proc[p][b] for p in range(pcount)]
        np.testing.assert_array_equal(np.concatenate(blocks), full)
        assert all(len(blk) == len(full) // pcount for blk in blocks)


def test_epoch_yields_flat_positions_and_padding(tiny_cfg, eval_data):
    """Eval epochs must yield sample_idx = flat positions into loader.index
    so a scatter (not sequential fill) reconstructs dataset order; the final
    short batch pads by repeating the last index."""
    loader = BatchLoader([eval_data], tiny_cfg, 4, train=False, num_workers=0)
    n = len(loader.index)
    assert n == 10
    seen = np.zeros(n, bool)
    batches = list(loader.epoch(0))
    for hb in batches:
        idx = hb.sample_idx
        assert idx.min() >= 0 and idx.max() < n
        seen[idx] = True
    assert seen.all()
    # eval order is unshuffled: first batch covers positions 0..3
    np.testing.assert_array_equal(batches[0].sample_idx, [0, 1, 2, 3])
    # last batch (10 % 4 = 2 real rows) pads with the final position
    np.testing.assert_array_equal(batches[-1].sample_idx, [8, 9, 9, 9])


def test_epoch_max_steps(tiny_cfg, eval_data):
    loader = BatchLoader([eval_data], tiny_cfg, 2, train=False, num_workers=0)
    assert len(list(loader.epoch(0, max_steps=2))) == 2
    assert len(list(loader.epoch(0))) == 5


def test_flip_test_batched_matches_two_dispatch(tiny_cfg, eval_data):
    """The single 2B-dispatch flip-test must equal the naive two-forward
    average (reference main/test.py flip-test semantics)."""
    import jax.numpy as jnp

    from ihpr_tpu.data.augment import PatchBatch, finalize_patch, make_patch_batch
    from ihpr_tpu.models.pose_net import build_pose_net

    cfg = tiny_cfg
    mesh = make_mesh(2)
    loader = BatchLoader([eval_data], cfg, 4, train=False, num_workers=0)
    model = build_pose_net(cfg)
    state, _ = create_train_state(model, cfg, jax.random.key(0), 10)
    ev = make_eval_step(model, cfg, mesh)
    hb = next(loader.epoch(0))
    batch, _ = next(iter(prefetch_to_device(iter([hb]), batch_sharding(mesh))))
    coords, _, _ = ev(state.params, state.batch_stats, batch)

    # naive reference: two separate forwards, mirror + permute, average
    if "patch" in batch:
        image = finalize_patch(batch["patch"], batch["color_scale"], cfg.data)
    else:
        perm = eval_data.skeleton.flip_permutation()
        image = make_patch_batch(
            batch["canvas"], batch["canvas_origin"], batch["canvas_scale"],
            batch["bbox"], batch["joints"], batch["joint_vis"],
            batch["joints_have_depth"], perm, cfg.data, rng=None, train=False,
        ).image

    def infer(img):
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            img, train=False, method=model.coords,
        )

    perm = eval_data.skeleton.flip_permutation()
    c0 = infer(image)
    cf = infer(image[:, :, ::-1, :])
    x = cfg.data.output_shape[1] - 1.0 - cf[..., 0]
    cf = jnp.concatenate([x[..., None], cf[..., 1:]], axis=-1)[:, perm, :]
    want = (c0 + cf) * 0.5
    np.testing.assert_allclose(np.asarray(coords), np.asarray(want), atol=2e-5)


def test_pckh_headbox_normalizer():
    """With head_box present the normalizer is SC_BIAS * diagonal: a pred
    exactly 0.5*0.6*diag away is counted correct at eps under, not over."""
    skel = skeletons.MPII
    j = skel.joint_num
    gt = np.zeros((j, 2), np.float32)
    gt[:, 0] = np.arange(j) * 50.0
    diag = 100.0  # head_box (0,0,60,80)
    sample = dict(
        joint_img=np.concatenate([gt, np.zeros((j, 1))], 1),
        joint_vis=np.ones(j, np.float32),
        head_box=(0.0, 0.0, 60.0, 80.0),
    )
    thresh_px = 0.5 * 0.6 * diag  # 30 px
    pred_in = gt + np.array([thresh_px - 0.1, 0.0])
    pred_out = gt + np.array([thresh_px + 0.1, 0.0])
    m_in = evaluate_mpii_pckh(pred_in[None], [sample])
    m_out = evaluate_mpii_pckh(pred_out[None], [sample])
    assert m_in["PCKh@0.5"] == 1.0
    assert m_out["PCKh@0.5"] == 0.0


def test_convert_backbone_bgr_stem_reversal():
    """bgr_input reverses only the stem's input-channel axis (ADVICE round 1:
    reference snapshots were trained on cv2 BGR frames)."""
    torch = pytest.importorskip("torch")
    from tools.convert_torch_ckpt import convert_backbone

    sd = {}
    rng = np.random.RandomState(0)

    def t(*shape):
        return torch.from_numpy(rng.randn(*shape).astype(np.float32))

    sd["conv1.weight"] = t(64, 3, 7, 7)
    sd["bn1.weight"], sd["bn1.bias"] = t(64), t(64)
    sd["bn1.running_mean"], sd["bn1.running_var"] = t(64), t(64)
    for stage, (depth, ch) in enumerate(zip((2, 2, 2, 2), (64, 128, 256, 512))):
        for i in range(depth):
            pre = f"layer{stage + 1}.{i}"
            in_ch = ch if i or stage == 0 else ch // 2
            sd[f"{pre}.conv1.weight"] = t(ch, in_ch, 3, 3)
            sd[f"{pre}.conv2.weight"] = t(ch, ch, 3, 3)
            for c in (1, 2):
                sd[f"{pre}.bn{c}.weight"] = t(ch)
                sd[f"{pre}.bn{c}.bias"] = t(ch)
                sd[f"{pre}.bn{c}.running_mean"] = t(ch)
                sd[f"{pre}.bn{c}.running_var"] = t(ch)
            if i == 0 and stage > 0:
                sd[f"{pre}.downsample.0.weight"] = t(ch, ch // 2, 1, 1)
                sd[f"{pre}.downsample.1.weight"] = t(ch)
                sd[f"{pre}.downsample.1.bias"] = t(ch)
                sd[f"{pre}.downsample.1.running_mean"] = t(ch)
                sd[f"{pre}.downsample.1.running_var"] = t(ch)
    p_rgb, _ = convert_backbone(sd, 18)
    p_bgr, _ = convert_backbone(sd, 18, bgr_input=True)
    np.testing.assert_array_equal(
        p_bgr["conv1"]["kernel"], p_rgb["conv1"]["kernel"][:, :, ::-1, :]
    )
    # everything else untouched
    np.testing.assert_array_equal(
        p_bgr["layer1_0"]["conv1"]["kernel"], p_rgb["layer1_0"]["conv1"]["kernel"]
    )


def test_flax_to_torch_roundtrip_forward_parity(tiny_cfg):
    """Our trained Flax PoseNet exported through flax_to_torch_state_dict
    must produce the same heatmap logits in the torch-CPU oracle (the
    accuracy-evidence loop depends on this seam)."""
    torch = pytest.importorskip("torch")
    from ihpr_tpu.models.pose_net import build_pose_net, init_pose_net
    from tools.convert_torch_ckpt import flax_to_torch_state_dict
    from tools.torch_reference import PoseNet as TorchPoseNet

    cfg = tiny_cfg
    model = build_pose_net(cfg)
    params, stats = init_pose_net(model, jax.random.key(7), cfg.data.input_shape)
    sd = flax_to_torch_state_dict(params, stats, cfg.model.resnet_type)
    tnet = TorchPoseNet(cfg.model.resnet_type, 18, cfg.data.depth_dim)
    missing, unexpected = tnet.load_state_dict(sd, strict=True), None
    tnet.eval()

    x = np.random.RandomState(0).randn(2, *cfg.data.input_shape, 3).astype(np.float32)
    ours = np.asarray(
        model.apply({"params": params, "batch_stats": stats}, x, train=False)
    )  # (B, H, W, J*D)
    with torch.no_grad():
        theirs = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(
        ours, theirs.transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-4
    )


def test_tester_evaluate_artifacts_and_scatter(tiny_cfg, eval_data):
    """Full Tester.evaluate on synthetic H36M: metrics finite, preds in
    dataset order via the sample_idx scatter, upstream-format result json
    written with camera-space joints."""
    from ihpr_tpu.engine.tester import Tester
    from ihpr_tpu.models.pose_net import build_pose_net

    tmp = tempfile.mkdtemp()
    try:
        cfg = tiny_cfg.replace(output_dir=tmp)
        model = build_pose_net(cfg)
        state, _ = create_train_state(model, cfg, jax.random.key(0), 10)
        tester = Tester(cfg, dataset=eval_data, state=state, num_workers=0)
        metrics = tester.evaluate()
        assert np.isfinite(metrics["MPJPE total"])
        out_path = os.path.join(tmp, "result", "bbox_root_pose_h36m_output.json")
        assert os.path.exists(out_path)
        with open(out_path) as f:
            dump = json.load(f)
        assert len(dump) == len(tester.loader.index)
        jc = np.asarray(dump[0]["joint_cam"])
        assert jc.shape == (eval_data.joint_num, 3)
        assert np.isfinite(jc).all()
    finally:
        shutil.rmtree(tmp)


@pytest.mark.skipif(
    not os.environ.get("IHPR_MULTIPROC_TEST"),
    reason="~5 min on 1 CPU core; run via IHPR_MULTIPROC_TEST=1 or "
    "`python tools/multiprocess_dp.py` (committed PASS in SURVEY.md §9)",
)
def test_real_two_process_dp_matches_single_process():
    """True multi-process (DCN-path) validation: two jax.distributed
    processes must produce the single-process loss (tools/multiprocess_dp)."""
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, os.path.join(root, "tools", "multiprocess_dp.py")],
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    assert "multiprocess_dp: PASS" in out.stdout
