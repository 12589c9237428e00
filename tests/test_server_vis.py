"""Serving path + visualization + large-config shape coverage."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ihpr_tpu.config import DataConfig, ModelConfig, get_config
from ihpr_tpu.data import skeletons
from ihpr_tpu.engine.server import PoseServer
from ihpr_tpu.models.pose_net import build_pose_net, init_pose_net
from ihpr_tpu.utils import vis


@pytest.fixture(scope="module")
def tiny_server():
    cfg = get_config("h36m3d_r50").replace(
        model=ModelConfig(resnet_type=18),
        data=DataConfig(
            trainset=("Human36M",),
            testset="Human36M",
            input_shape=(64, 64),
            output_shape=(16, 16),
            depth_dim=16,
        ),
    )
    model = build_pose_net(cfg)
    params, bstats = init_pose_net(model, jax.random.key(0), (64, 64))
    return PoseServer(cfg, params, bstats, max_batch=4)


def test_server_predict_patches_any_n(tiny_server):
    patches = np.random.RandomState(0).randint(0, 255, (6, 64, 64, 3)).astype(np.uint8)
    out = tiny_server.predict_patches(patches)
    assert out.shape == (6, 18, 3)
    assert np.isfinite(out).all()
    # chunked execution must equal single-shot per item
    out2 = tiny_server.predict_patches(patches[:1])
    np.testing.assert_allclose(out[0], out2[0], atol=1e-5)


def test_server_submit_patches_matches_sync(tiny_server):
    """Async submit (pipelined-serving building block) returns the same
    coords as the synchronous path, including short (padded) chunks."""
    patches = np.random.RandomState(2).randint(0, 255, (3, 64, 64, 3)).astype(np.uint8)
    sync = tiny_server.predict_patches(patches)
    dev = tiny_server.submit_patches(patches)  # no host sync until asarray
    np.testing.assert_allclose(np.asarray(dev), sync, atol=1e-5)
    assert dev.shape == (3, 18, 3)
    # empty flush: no dispatch, well-formed (0, J, 3) result on both paths
    assert tiny_server.submit_patches([]).shape == (0, 18, 3)
    assert tiny_server.predict_patches(np.zeros((0, 64, 64, 3), np.uint8)).shape == (0, 18, 3)


def test_server_full_path_original_images(tiny_server):
    rng = np.random.RandomState(1)
    images = [rng.randint(0, 255, (200, 180, 3)).astype(np.uint8) for _ in range(3)]
    bboxes = np.array([[40, 40, 100, 120]] * 3, np.float32)
    results = tiny_server.predict(images, bboxes, root_z=np.full(3, 4000.0))
    assert len(results) == 3
    for r in results:
        assert r.coords_img.shape == (18, 3)
        assert np.isfinite(r.coords_img).all()
        # x, y land inside (or near) the original image
        assert (-50 <= r.coords_img[:, 0]).all() and (r.coords_img[:, 0] < 250).all()


def test_server_predict_stream_matches_sequential(tiny_server):
    """Pipelined serving must be result-identical to sequential predict:
    only host/device overlap changes."""
    rng = np.random.RandomState(3)
    reqs = []
    for k in range(4):
        n = 1 + k % 3
        images = [
            rng.randint(0, 255, (160 + 10 * k, 150, 3)).astype(np.uint8)
            for _ in range(n)
        ]
        bboxes = np.tile(np.array([30, 30, 90, 100], np.float32), (n, 1))
        reqs.append((images, bboxes, np.full(n, 4000.0)))
    seq = [tiny_server.predict(*r) for r in reqs]
    stream = list(tiny_server.predict_stream(reqs, depth=2))
    assert len(stream) == len(seq)
    for a, b in zip(stream, seq):
        assert len(a) == len(b)
        for ra, rb in zip(a, b):
            np.testing.assert_allclose(ra.coords_voxel, rb.coords_voxel, atol=1e-6)
            np.testing.assert_allclose(ra.coords_img, rb.coords_img, atol=1e-5)


def test_server_flip_one_dispatch_matches_two(tiny_server):
    """The server's single 2B flip-test dispatch must equal the explicit
    two-forward composition (reference main/test.py flip semantics)."""
    srv = tiny_server
    patches = np.random.RandomState(2).randint(0, 255, (4, 64, 64, 3)).astype(np.uint8)
    ones = np.ones((4, 3), np.float32)
    fused = np.asarray(srv._fn(jnp.asarray(patches), jnp.asarray(ones)))

    def infer(img_u8):
        from ihpr_tpu.data.augment import finalize_patch

        img = finalize_patch(jnp.asarray(img_u8), jnp.asarray(ones), srv.cfg.data)
        return srv.model.apply(
            {"params": srv.params, "batch_stats": srv.batch_stats},
            img,
            train=False,
            method=srv.model.coords,
        )

    c = np.array(infer(patches))
    cf = np.array(infer(patches[:, :, ::-1, :]))
    cf[..., 0] = srv.cfg.data.output_shape[1] - 1.0 - cf[..., 0]
    cf = cf[:, srv.flip_perm, :]
    np.testing.assert_allclose(fused, (c + cf) * 0.5, atol=1e-4)


def test_server_spatial_mesh_matches_single_device(tiny_server):
    """PoseServer(mesh=...) shards the patch's image-row axis across the
    mesh (GSPMD inserts the conv halo exchanges) — coordinates must match
    the single-device server. Latency-scaling serving mode: one small
    request uses every chip."""
    from jax.sharding import Mesh

    cfg = tiny_server.cfg
    mesh = Mesh(np.array(jax.devices()), ("sp",))
    srv_sp = PoseServer(
        cfg, tiny_server.params, tiny_server.batch_stats, max_batch=4,
        mesh=mesh,
    )
    patches = np.random.RandomState(5).randint(0, 255, (2, 64, 64, 3)).astype(np.uint8)
    ref = tiny_server.predict_patches(patches)
    out = srv_sp.predict_patches(patches)
    np.testing.assert_allclose(out, ref, atol=2e-3)


def test_server_data_parallel_matches_single_device(tiny_server):
    """PoseServer(mesh=..., partition="data") — BASELINE config #5's
    composition: the batch axis shards over the mesh (the dp train step's
    layout) so every chip serves whole samples. Coordinates must match the
    single-device server, flip-test on AND off."""
    from jax.sharding import Mesh

    cfg = tiny_server.cfg
    mesh = Mesh(np.array(jax.devices()), ("data",))
    patches = (
        np.random.RandomState(6).randint(0, 255, (11, 64, 64, 3)).astype(np.uint8)
    )
    for flip in (False, True):
        ref_srv = PoseServer(
            cfg, tiny_server.params, tiny_server.batch_stats, max_batch=8,
            flip_test=flip,
        )
        srv_dp = PoseServer(
            cfg, tiny_server.params, tiny_server.batch_stats, max_batch=8,
            flip_test=flip, mesh=mesh, partition="data",
        )
        ref = ref_srv.predict_patches(patches)
        out = srv_dp.predict_patches(patches)
        np.testing.assert_allclose(out, ref, atol=1e-4)


def test_server_data_parallel_fused_shardmap(tiny_server, monkeypatch):
    """The dp server must route through the fused kernel's shard_map
    per-shard launch (model built WITH the mesh). CPU defaults to the
    plain composition, so force the Pallas kernels via interpret mode —
    this executes ops/fused_head_integral._sharded_fused under the
    8-device mesh inside the server's jit."""
    from jax.sharding import Mesh

    monkeypatch.setenv("IHPR_PALLAS", "interpret")
    cfg = tiny_server.cfg
    mesh = Mesh(np.array(jax.devices()), ("data",))
    srv_dp = PoseServer(
        cfg, tiny_server.params, tiny_server.batch_stats, max_batch=8,
        flip_test=False, mesh=mesh, partition="data",
    )
    patches = (
        np.random.RandomState(7).randint(0, 255, (8, 64, 64, 3)).astype(np.uint8)
    )
    out = srv_dp.predict_patches(patches)
    monkeypatch.delenv("IHPR_PALLAS")
    ref = tiny_server.predict_patches(patches)
    np.testing.assert_allclose(out, ref, atol=5e-4)


def test_server_data_parallel_rejects_indivisible_batch(tiny_server):
    from jax.sharding import Mesh

    mesh = Mesh(np.array(jax.devices()), ("data",))
    with pytest.raises(AssertionError):
        PoseServer(
            tiny_server.cfg, tiny_server.params, tiny_server.batch_stats,
            max_batch=6, mesh=mesh, partition="data",
        )


def test_vis_keypoints_and_grid(tmp_path):
    skel = skeletons.H36M
    img = np.zeros((64, 64, 3), np.uint8)
    xy = np.random.RandomState(2).uniform(5, 59, (18, 2))
    out = vis.vis_keypoints(img, xy, skel)
    assert out.shape == img.shape and out.sum() > 0
    fig = vis.vis_3d_skeleton(
        np.concatenate([xy, np.zeros((18, 1))], 1), skel,
        save_path=str(tmp_path / "skel.png"),
    )
    assert (tmp_path / "skel.png").exists()
    imgs = np.zeros((4, 64, 64, 3), np.float32)
    grid = vis.save_debug_grid(
        imgs, np.tile(xy[None], (4, 1, 1)), skel, str(tmp_path / "grid.png"),
        (0.485, 0.456, 0.406), (0.229, 0.224, 0.225),
    )
    assert (tmp_path / "grid.png").exists()


def test_r152_384_config_shapes():
    """BASELINE config #4: ResNet-152 @ 288x384 emits 96x72 heatmaps and the
    fused kernel has a legal tiling for the 6912-row plane (eval_shape only —
    no CPU conv time)."""
    cfg = get_config("h36m3d_r152_384")
    assert cfg.model.compute_dtype == "bfloat16"
    model = build_pose_net(cfg)
    dummy = jnp.zeros((1, 384, 288, 3), jnp.float32)
    shapes = jax.eval_shape(
        lambda: model.init(jax.random.key(0), dummy, train=False)
    )
    hm_shape = jax.eval_shape(
        lambda v: model.apply(v, dummy, train=False), shapes
    )
    assert hm_shape.shape == (1, 96, 72, 18 * 64)

    from ihpr_tpu.ops.integral_pallas import _chunk_rows, _supported

    assert _supported(18, 64)
    chunk = _chunk_rows(96 * 72, 18 * 64)
    assert (96 * 72) % chunk == 0 and chunk % 8 == 0


def test_all_five_baseline_configs_construct():
    from ihpr_tpu.config import CONFIGS

    for name in ["parity_r50", "mpii2d_r50", "h36m3d_r50", "h36m3d_r152_384", "h36m3d_r50_dp"]:
        cfg = CONFIGS[name]
        model = build_pose_net(cfg)
        h, w = cfg.data.input_shape
        dummy = jnp.zeros((1, h, w, 3), jnp.float32)
        out = jax.eval_shape(lambda m=model, d=dummy: m.init(jax.random.key(0), d, train=False))
        assert "params" in out
