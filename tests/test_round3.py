"""Round-3 regression tests (ADVICE fixes + new features)."""

import numpy as np
import pytest


class TestCheckpointKeepGuard:
    def test_keep_zero_rejected(self, tmp_path):
        # keep=0 used to make _prune delete EVERY snapshot ([:-0 or None]
        # == [:None]) — silent total checkpoint loss. Now rejected.
        from ihpr_tpu.engine.checkpoint import CheckpointManager

        with pytest.raises(ValueError, match="keep"):
            CheckpointManager(str(tmp_path), keep=0)
        with pytest.raises(ValueError, match="keep"):
            CheckpointManager(str(tmp_path), keep=-1)
        CheckpointManager(str(tmp_path), keep=1)  # fine
        CheckpointManager(str(tmp_path), keep=None)  # fine

    def test_save_is_process0_only(self, tmp_path, monkeypatch):
        # Multi-host: non-zero processes must not write (concurrent writers
        # into one snapshot dir on a shared FS corrupt it); process 0 does.
        import jax

        from ihpr_tpu.engine.checkpoint import CheckpointManager

        state = {"w": np.ones(3, np.float32)}
        rng = jax.random.key(0)

        ckpt = CheckpointManager(str(tmp_path / "p1"))
        monkeypatch.setattr(jax, "process_index", lambda: 1)
        ckpt.save(0, state, rng)
        ckpt.wait()
        assert ckpt.latest_epoch() is None

        monkeypatch.setattr(jax, "process_index", lambda: 0)
        ckpt0 = CheckpointManager(str(tmp_path / "p0"))
        ckpt0.save(0, state, rng)
        ckpt0.wait()
        assert ckpt0.latest_epoch() == 0


class TestSemanticRenderer:
    """hue_mode='semantic' must render mirror-consistently: a horizontal
    flip of the rendered frame equals the rendering of the flipped pose
    (joints permuted by flip_permutation, x mirrored). This is the property
    flip-test and flip augmentation rely on for real humans."""

    def test_mirror_consistency(self):
        from ihpr_tpu.data import skeletons
        from ihpr_tpu.data.datasets import make_synthetic, render_synthetic_image

        skel = skeletons.get_skeleton("Human36M")
        perm = skel.flip_permutation()
        w = 128
        samples = make_synthetic(
            skel, 3, seed=5, img_size=w, easy_depth=True, hue_mode="semantic"
        )
        for s in samples:
            img = render_synthetic_image(s)
            s2 = dict(s)
            ji = s["joint_img"][perm].copy()
            ji[:, 0] = (w - 1) - ji[:, 0]
            s2["joint_img"] = ji
            img2 = render_synthetic_image(s2)
            diff = np.abs(img[:, ::-1].astype(int) - img2.astype(int))
            # Exact up to uint8 rounding + max-compositing tie-break flips on
            # blob-crossing boundary pixels (a measure-zero set).
            assert diff.mean() < 0.5, diff.mean()
            assert (diff > 2).mean() < 2e-3, (diff > 2).mean()

    def test_easy_depth_is_mirror_invariant(self):
        # z must be coded off y (mirror-invariant), never x: flip-test
        # un-mirrors x only, so an x-coded depth cue would negate under the
        # flip while the label kept its sign.
        from ihpr_tpu.data import skeletons
        from ihpr_tpu.data.datasets import make_synthetic

        skel = skeletons.get_skeleton("Human36M")
        (s,) = make_synthetic(skel, 1, seed=3, img_size=200, easy_depth=True)
        ji = s["joint_img"]
        np.testing.assert_allclose(
            ji[:, 2], ((ji[:, 1] / 200) - 0.5) * 1100.0, rtol=1e-5
        )

    def test_index_mode_unchanged(self):
        # Default samples carry no semantic fields and render as before.
        from ihpr_tpu.data import skeletons
        from ihpr_tpu.data.datasets import make_synthetic

        skel = skeletons.get_skeleton("Human36M")
        (s,) = make_synthetic(skel, 1, seed=3, img_size=100)
        assert "hue_mode" not in s and "tilt" not in s


class TestBNModesAndRemat:
    """bn_mode='lean' and block_remat must be drop-in: identical math at
    fp32 (same params/batch_stats tree, same outputs, same grads) — the
    perf-mode A/B (tools/bwd_experiments.py) then measures only speed."""

    def _build(self, **model_kw):
        import jax
        import jax.numpy as jnp

        from ihpr_tpu.models.pose_net import PoseNet

        model = PoseNet(
            resnet_type=18, joint_num=4, depth_dim=8, deconv_features=32,
            **model_kw,
        )
        x = jax.random.normal(jax.random.key(0), (2, 64, 64, 3), jnp.float32)
        variables = model.init(jax.random.key(1), x, train=False)
        return model, variables, x

    def test_lean_bn_matches_flax_fp32(self):
        import jax
        import numpy as np

        ref_model, variables, x = self._build(bn_mode="flax")
        lean_model, lean_vars, _ = self._build(bn_mode="lean")
        # identical tree layout -> the flax-init variables load directly
        assert jax.tree_util.tree_structure(
            lean_vars
        ) == jax.tree_util.tree_structure(variables)

        def run(model, train):
            def f(params):
                out, upd = model.apply(
                    {"params": params, "batch_stats": variables["batch_stats"]},
                    x,
                    train=train,
                    mutable=["batch_stats"],
                )
                return out.sum(), (out, upd["batch_stats"])

            (s, (out, stats)), grads = jax.value_and_grad(f, has_aux=True)(
                variables["params"]
            )
            return out, stats, grads

        for train in (False, True):
            out_a, stats_a, g_a = run(ref_model, train)
            out_b, stats_b, g_b = run(lean_model, train)
            np.testing.assert_allclose(out_a, out_b, rtol=2e-4, atol=2e-4)
            jax.tree.map(
                lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4),
                stats_a,
                stats_b,
            )
            jax.tree.map(
                lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-3, atol=2e-3),
                g_a,
                g_b,
            )

    def test_lean_sub_estimates_full_stats(self):
        """bn_mode='lean_subN' (stats from every N-th image row) must keep
        the identical variable tree and produce eval outputs equal to
        'lean' (eval never subsamples), while train-mode statistics stay
        close to the full-tensor statistics (it is an estimator, not an
        exact drop-in — the A/B accuracy runs price the residual)."""
        import jax
        import numpy as np

        ref_model, variables, x = self._build(bn_mode="lean")
        sub_model, sub_vars, _ = self._build(bn_mode="lean_sub4")
        assert jax.tree_util.tree_structure(
            sub_vars
        ) == jax.tree_util.tree_structure(variables)

        def run(model, train):
            out, upd = model.apply(
                {"params": variables["params"],
                 "batch_stats": variables["batch_stats"]},
                x, train=train, mutable=["batch_stats"],
            )
            return out, upd["batch_stats"]

        out_a, _ = run(ref_model, False)
        out_b, _ = run(sub_model, False)
        np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))

        out_a, stats_a = run(ref_model, True)
        out_b, stats_b = run(sub_model, True)
        # Train outputs/stats: close, not identical (estimator).
        np.testing.assert_allclose(out_a, out_b, rtol=0.2, atol=0.2)
        flat_a = jax.tree.leaves(stats_a)
        flat_b = jax.tree.leaves(stats_b)
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_allclose(a, b, rtol=0.25, atol=0.1)

    @pytest.mark.parametrize("policy", ["full", "conv_outs"])
    def test_block_remat_matches_baseline(self, policy):
        import jax
        import numpy as np

        ref_model, variables, x = self._build(block_remat=False)
        rem_model, rem_vars, _ = self._build(
            block_remat=True, remat_policy=policy
        )
        assert jax.tree_util.tree_structure(
            rem_vars
        ) == jax.tree_util.tree_structure(variables)

        def grad_of(model):
            def f(params):
                out, _ = model.apply(
                    {"params": params, "batch_stats": variables["batch_stats"]},
                    x,
                    train=True,
                    mutable=["batch_stats"],
                )
                return (out * out).mean()

            return jax.value_and_grad(f)(variables["params"])

        la, ga = grad_of(ref_model)
        lb, gb = grad_of(rem_model)
        np.testing.assert_allclose(la, lb, rtol=1e-5)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5),
            ga,
            gb,
        )


class TestHueSkeleton:
    """make_synthetic(hue_skeleton=...) codes joint identity in ANOTHER
    skeleton's hue space — mixed-dataset probes need MPII frames whose
    'Pelvis' has the same hue H36M frames give it, because real photos code
    joint identity anatomically, identically across datasets (reference
    common/base.py multi-dataset trainset)."""

    def test_index_hue_idx_is_name_mapped(self):
        from ihpr_tpu.data import skeletons
        from ihpr_tpu.data.datasets import make_synthetic

        (s,) = make_synthetic(
            skeletons.MPII, 1, seed=0, img_size=64,
            hue_skeleton=skeletons.H36M,
        )
        h36m_index = {n: i for i, n in enumerate(skeletons.H36M.joints_name)}
        for j, name in enumerate(skeletons.MPII.joints_name):
            assert s["hue_idx"][j] == h36m_index[name]
        assert s["hue_idx_total"] == skeletons.H36M.joint_num

    def test_index_hue_matches_h36m_rendering(self):
        # An isolated MPII joint renders the EXACT pixels its same-named
        # H36M joint renders (same position/depth): one joint in frame,
        # the rest pushed far outside the +-4 sigma render window.
        from ihpr_tpu.data import skeletons
        from ihpr_tpu.data.datasets import make_synthetic, render_synthetic_image

        (mp,) = make_synthetic(
            skeletons.MPII, 1, seed=1, img_size=64,
            hue_skeleton=skeletons.H36M,
        )
        (h36m,) = make_synthetic(skeletons.H36M, 1, seed=2, img_size=64)
        name = "R_Knee"
        jm = skeletons.MPII.joints_name.index(name)
        jh = skeletons.H36M.joints_name.index(name)
        for s, j in ((mp, jm), (h36m, jh)):
            ji = np.full_like(s["joint_img"], -500.0)
            ji[j] = (32.0, 32.0, 0.0)
            s["joint_img"] = ji
        img_m = render_synthetic_image(mp)
        img_h = render_synthetic_image(h36m)
        assert img_m[32, 32].any()  # blob actually rendered
        np.testing.assert_array_equal(img_m, img_h)

    def test_semantic_hue_skeleton_mirror_consistent(self):
        # Cross-skeleton semantic hues keep the mirror-consistency property
        # under the MPII flip permutation (pair-shared hue class, opposite
        # tilts survive the name mapping).
        from ihpr_tpu.data import skeletons
        from ihpr_tpu.data.datasets import make_synthetic, render_synthetic_image

        skel = skeletons.MPII
        perm = skel.flip_permutation()
        w = 128
        samples = make_synthetic(
            skel, 2, seed=7, img_size=w, hue_mode="semantic",
            hue_skeleton=skeletons.H36M,
        )
        for s in samples:
            for a, b in skel.flip_pairs:
                assert s["hue_class"][a] == s["hue_class"][b]
                assert s["tilt"][a] == -s["tilt"][b]
            img = render_synthetic_image(s)
            s2 = dict(s)
            ji = s["joint_img"][perm].copy()
            ji[:, 0] = (w - 1) - ji[:, 0]
            s2["joint_img"] = ji
            img2 = render_synthetic_image(s2)
            diff = np.abs(img[:, ::-1].astype(int) - img2.astype(int))
            assert diff.mean() < 0.5, diff.mean()
            assert (diff > 2).mean() < 2e-3, (diff > 2).mean()

    def test_missing_joint_raises(self):
        # MSCOCO has eyes/ears H36M lacks — silent zero-hues would alias
        # several joints onto one color; must raise instead.
        import pytest

        from ihpr_tpu.data import skeletons
        from ihpr_tpu.data.datasets import make_synthetic

        with pytest.raises(ValueError, match="L_Eye"):
            make_synthetic(
                skeletons.MSCOCO, 1, img_size=64, hue_skeleton=skeletons.H36M
            )

    def test_build_dataset_unifies_hues(self):
        # The Trainer's CLI path (--synthetic --trainset Human36M,MPII)
        # goes through build_dataset: secondary synthetic datasets must
        # land in the primary skeleton's hue space.
        from ihpr_tpu.config import get_config
        from ihpr_tpu.data import skeletons
        from ihpr_tpu.data.datasets import build_dataset

        cfg = get_config("h36m3d_r50")
        ds = build_dataset(
            "MPII", "train", cfg, "synthetic", 4,
            hue_skeleton=skeletons.H36M,
        )
        h36m_index = {n: i for i, n in enumerate(skeletons.H36M.joints_name)}
        for s in ds.samples:
            for j, name in enumerate(skeletons.MPII.joints_name):
                assert s["hue_idx"][j] == h36m_index[name]

    def test_build_dataset_incompatible_hue_warns(self):
        # MSCOCO eyes/ears have no H36M counterpart: warn + fall back to
        # per-dataset index hues rather than raise (the CLI must still run).
        import pytest

        from ihpr_tpu.config import get_config
        from ihpr_tpu.data import skeletons
        from ihpr_tpu.data.datasets import build_dataset

        cfg = get_config("h36m3d_r50")
        with pytest.warns(UserWarning, match="hue_skeleton"):
            ds = build_dataset(
                "MSCOCO", "train", cfg, "synthetic", 2,
                hue_skeleton=skeletons.H36M,
            )
        assert all("hue_idx" not in s for s in ds.samples)

    def test_trainer_builds_unified_mixed_trainset(self, tmp_path):
        # The CLI path end-to-end minus argparse: Trainer(datasets=None,
        # data_root="synthetic") must build the mixed trainset itself and
        # render secondary datasets in the primary skeleton's hue space.
        import dataclasses

        from ihpr_tpu.config import DataConfig, ModelConfig, OptimConfig, get_config
        from ihpr_tpu.data import skeletons
        from ihpr_tpu.engine.trainer import Trainer

        cfg = get_config("h36m3d_r50").replace(
            model=ModelConfig(resnet_type=18),
            data=DataConfig(
                trainset=("Human36M", "MPII"),
                input_shape=(64, 64),
                output_shape=(16, 16),
                depth_dim=16,
            ),
            optim=OptimConfig(batch_size_per_device=2),
            output_dir=str(tmp_path),
        )
        tr = Trainer(cfg, data_root="synthetic", num_workers=0, synthetic_size=16)
        by_name = {d.name: d for d in tr.loader.datasets}
        assert set(by_name) == {"Human36M", "MPII"}
        assert all("hue_idx" not in s for s in by_name["Human36M"].samples)
        h36m_index = {n: i for i, n in enumerate(skeletons.H36M.joints_name)}
        for s in by_name["MPII"].samples:
            for j, name in enumerate(skeletons.MPII.joints_name):
                assert s["hue_idx"][j] == h36m_index[name]

    def test_materialize_key_covers_hue_idx(self, tmp_path):
        # Same joints, different hue space -> different pixels -> the JPEG
        # cache key must differ (the ADVICE-r2 stale-cache lesson).
        from ihpr_tpu.data import skeletons
        from ihpr_tpu.data.datasets import make_synthetic, materialize_synthetic

        plain = make_synthetic(skeletons.MPII, 1, seed=4, img_size=64)
        unified = make_synthetic(
            skeletons.MPII, 1, seed=4, img_size=64,
            hue_skeleton=skeletons.H36M,
        )
        a = materialize_synthetic(plain, str(tmp_path))
        b = materialize_synthetic(unified, str(tmp_path))
        assert a[0]["img_path"] != b[0]["img_path"]


class TestMaterializeCacheKey:
    def test_quality_changes_key(self, tmp_path):
        from ihpr_tpu.data import skeletons
        from ihpr_tpu.data.datasets import make_synthetic, materialize_synthetic

        samples = make_synthetic(skeletons.get_skeleton("Human36M"), 2, img_size=64)
        a = materialize_synthetic(samples, str(tmp_path), quality=95)
        b = materialize_synthetic(samples, str(tmp_path), quality=50)
        assert a[0]["img_path"] != b[0]["img_path"]
        # idempotent at equal parameters
        a2 = materialize_synthetic(samples, str(tmp_path), quality=95)
        assert a[0]["img_path"] == a2[0]["img_path"]
