"""StableHLO serving artifacts (ihpr_tpu/engine/export.py): the
serialized program must reproduce the live PoseServer bit-for-bit-ish
(same platform, same math) with the weights baked in."""

import numpy as np
import jax
import pytest

from ihpr_tpu.config import DataConfig, ModelConfig, get_config
from ihpr_tpu.engine.export import export_server, load_exported
from ihpr_tpu.engine.server import PoseServer
from ihpr_tpu.models.pose_net import build_pose_net, init_pose_net


@pytest.fixture(scope="module")
def tiny_setup():
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
    return cfg, params, bstats


def test_export_roundtrip_matches_server(tiny_setup):
    cfg, params, bstats = tiny_setup
    server = PoseServer(cfg, params, bstats, max_batch=4, flip_test=False)
    patches = (
        np.random.RandomState(0).randint(0, 255, (4, 64, 64, 3)).astype(np.uint8)
    )
    ref = server.predict_patches(patches)

    blob = export_server(server)
    assert isinstance(blob, bytes) and len(blob) > 0
    fn = load_exported(blob)
    out = np.asarray(fn(patches, np.ones((4, 3), np.float32)))
    assert out.shape == (4, 18, 3)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_export_covers_flip_test_branch(tiny_setup):
    cfg, params, bstats = tiny_setup
    server = PoseServer(cfg, params, bstats, max_batch=2, flip_test=True)
    patches = (
        np.random.RandomState(1).randint(0, 255, (2, 64, 64, 3)).astype(np.uint8)
    )
    ref = server.predict_patches(patches)
    fn = load_exported(export_server(server))
    out = np.asarray(fn(patches, np.ones((2, 3), np.float32)))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_export_batch_polymorphic(tiny_setup):
    # One artifact, any batch size — including through the flip-test
    # branch, whose concat doubles the symbolic dim.
    cfg, params, bstats = tiny_setup
    server = PoseServer(cfg, params, bstats, max_batch=4, flip_test=True)
    fn = load_exported(export_server(server, batch="poly"))
    for n in (1, 3):
        patches = (
            np.random.RandomState(n)
            .randint(0, 255, (n, 64, 64, 3))
            .astype(np.uint8)
        )
        ref = server.predict_patches(patches)
        out = np.asarray(fn(patches, np.ones((n, 3), np.float32)))
        np.testing.assert_allclose(out, ref, atol=1e-5)


def test_export_is_weight_dependent(tiny_setup):
    # Artifacts bake the weights in: different params -> different blob
    # behavior (guards against accidentally exporting an unweighted fn).
    cfg, params, bstats = tiny_setup
    model = build_pose_net(cfg)
    params2, bstats2 = init_pose_net(model, jax.random.key(7), (64, 64))
    a = PoseServer(cfg, params, bstats, max_batch=2, flip_test=False)
    b = PoseServer(cfg, params2, bstats2, max_batch=2, flip_test=False)
    patches = (
        np.random.RandomState(2).randint(0, 255, (2, 64, 64, 3)).astype(np.uint8)
    )
    fa = load_exported(export_server(a))
    fb = load_exported(export_server(b))
    ones = np.ones((2, 3), np.float32)
    # Untrained nets both predict ~volume-center, so compare exactly: any
    # weight dependence shows up in the low-order bits.
    assert not np.array_equal(
        np.asarray(fa(patches, ones)), np.asarray(fb(patches, ones))
    )


def test_export_env_restored(tiny_setup, monkeypatch):
    # monkeypatch (not a bare pop) so the conftest's process-wide
    # IHPR_PALLAS=interpret survives this test — popping it silently
    # rerouted every later test through the plain-JAX path (caught by
    # test_fused_head's shard_map route spy).
    cfg, params, bstats = tiny_setup
    server = PoseServer(cfg, params, bstats, max_batch=2, flip_test=False)
    monkeypatch.setenv("IHPR_PALLAS", "interpret")
    import os

    export_server(server)
    assert os.environ["IHPR_PALLAS"] == "interpret"
