"""Regression tests for the round-1 code-review findings."""

import numpy as np
import jax
import jax.numpy as jnp

from segmentation_training_pipeline_tpu.ops.aug import build_augmentation
from segmentation_training_pipeline_tpu.ops.aug import warp as W
from segmentation_training_pipeline_tpu.data.batcher import (
    _masks_u8_to_onehot, _paths_available, make_batches)
from segmentation_training_pipeline_tpu.data.datasets import (
    LambdaDataSet, SubDataSet)


class TestNonSquareRouting:
    def test_rot90_nonsquare_not_all_fill(self):
        """Non-square + Rot90 must route to the exact gather warp, not the
        multipass path whose factorization degenerates at 90 deg."""
        rng = np.random.RandomState(0)
        imgs = rng.randint(100, 255, (4, 48, 64, 3), np.uint8)
        masks = np.ones((4, 48, 64, 1), np.float32)
        aug = build_augmentation([{"name": "Rot90", "args": [1, 1]}])
        oi, om = jax.jit(aug)(jax.random.PRNGKey(0), jnp.asarray(imgs),
                              jnp.asarray(masks))
        assert float(jnp.mean(oi)) > 50.0       # not all black
        assert float(jnp.mean(om)) > 0.5        # mask survived

    def test_large_rotation_nonsquare_not_all_fill(self):
        rng = np.random.RandomState(0)
        imgs = rng.randint(100, 255, (2, 48, 64, 3), np.uint8)
        masks = np.ones((2, 48, 64, 1), np.float32)
        aug = build_augmentation([
            {"name": "Affine", "args": {"rotate": [85.0, 95.0]}}])
        oi, _ = jax.jit(aug)(jax.random.PRNGKey(1), jnp.asarray(imgs),
                             jnp.asarray(masks))
        assert float(jnp.mean(oi)) > 30.0


class TestElasticLowResAmplitude:
    def test_stride4_matches_stride1_std(self):
        k = jax.random.PRNGKey(0)
        B, H, Wd = 4, 256, 256
        alpha = jnp.full((B,), 30.0)
        sigma = jnp.full((B,), 4.0)
        d1, _ = W.elastic_field(k, B, H, Wd, alpha, sigma, 8, stride=1)
        d4, _ = W.elastic_field(k, B, H, Wd, alpha, sigma, 8, stride=4)
        s1, s4 = float(jnp.std(d1)), float(jnp.std(d4))
        assert abs(s4 - s1) / s1 < 0.25, (s1, s4)


class TestNativeLoaderFallback:
    def test_subdataset_over_arrays_uses_python_path(self):
        """SubDataSet defines image_path unconditionally; the batcher must
        probe the parent instead of trusting hasattr."""
        xs = np.zeros((6, 8, 8, 3), np.uint8)
        ys = np.zeros((6, 8, 8, 1), np.uint8)
        ds = SubDataSet(LambdaDataSet(xs, ys), [0, 1, 2, 3])
        assert not _paths_available(ds, 0)
        batches = list(make_batches(ds, [0, 1, 2, 3], (8, 8, 3), 1,
                                    "sigmoid", 2))
        assert len(batches) == 2  # no AttributeError from the native path


class TestPerItemMaskThreshold:
    def test_mixed_01_and_0255_batch(self):
        m = np.zeros((2, 4, 4), np.uint8)
        m[0, :2] = 1      # {0,1} convention
        m[1, :2] = 255    # {0,255} convention
        out = _masks_u8_to_onehot(m, 1, "sigmoid")
        assert out[0].sum() == 8.0  # the {0,1} mask must stay positive
        assert out[1].sum() == 8.0


class TestDebugNansRestored:
    def test_debug_flag_scoped_to_fit(self, tmp_path):
        from segmentation_training_pipeline_tpu.config import parse_dict

        cfg = parse_dict(dict(
            architecture="Unet", backbone="resnet18", shape=[32, 32, 3],
            classes=1, activation="sigmoid", loss="binary_crossentropy",
            batch=2, folds_count=2, debug=True, verbose=0,
            directory=str(tmp_path), stages=[{"epochs": 1}]))
        xs = np.random.RandomState(0).randint(0, 255, (4, 32, 32, 3),
                                              np.uint8)
        ys = (xs[..., :1] > 127).astype(np.uint8) * 255
        before = bool(jax.config.jax_debug_nans)
        cfg.fit(LambdaDataSet(xs, ys), foldsToExecute=[0])
        assert bool(jax.config.jax_debug_nans) == before


class TestRot90Direction:
    def test_fast_and_warp_paths_both_ccw(self):
        """imgaug's Rot90 is np.rot90 (CCW); both the flips/rot90 fast
        path and the general warp path must rotate the same direction."""
        imgs = (np.arange(16 * 16 * 3, dtype=np.uint8)
                .reshape(1, 16, 16, 3) % 251)
        masks = np.zeros((1, 16, 16, 1), np.float32)
        key = jax.random.PRNGKey(0)
        ccw = np.rot90(imgs[0], 1, axes=(0, 1)).astype(np.float32)

        fast = build_augmentation([{"name": "Rot90", "args": 1}])
        oi, _ = fast(key, jnp.asarray(imgs), jnp.asarray(masks))
        assert float(np.abs(np.asarray(oi)[0] - ccw).max()) < 1e-3

        warp_path = build_augmentation([
            {"name": "Rot90", "args": 1},
            {"name": "Affine", "args": {"rotate": 0}}])
        oi2, _ = warp_path(key, jnp.asarray(imgs), jnp.asarray(masks))
        assert float(np.abs(np.asarray(oi2)[0] - ccw).max()) < 1.0


class TestSecondReviewBatch:
    def test_lr_scheduler_epoch0_applies(self):
        from segmentation_training_pipeline_tpu.train.callbacks import (
            LearningRateScheduler, TrainingControl)

        ctl = TrainingControl(base_lr=1e-2)
        cb = LearningRateScheduler(schedule={0: 1e-3, 2: 1e-4})
        cb.on_train_begin(ctl)
        assert abs(ctl.effective_lr - 1e-3) < 1e-12  # epoch-0 entry fires
        cb.on_epoch_end(1, {}, ctl)
        assert abs(ctl.effective_lr - 1e-4) < 1e-12

    def test_stage_batch_override_reshards(self, tmp_path):
        """A stage batch not divisible by the fit-level mesh data axis
        must rebuild a narrower mesh instead of crashing at shard time."""
        from segmentation_training_pipeline_tpu.config import parse_dict

        cfg = parse_dict(dict(
            architecture="Unet", backbone="resnet18", shape=[32, 32, 3],
            classes=1, activation="sigmoid", loss="binary_crossentropy",
            batch=8, folds_count=2, verbose=0, directory=str(tmp_path),
            stages=[{"epochs": 1, "batch": 6}]))  # 6 % 8-dev mesh != 0
        xs = np.random.RandomState(0).randint(0, 255, (12, 32, 32, 3),
                                              np.uint8)
        ys = (xs[..., :1] > 127).astype(np.uint8) * 255
        res = cfg.fit(LambdaDataSet(xs, ys), foldsToExecute=[0])
        assert res["fold0.stage0"]["epochs"] >= 1

    def test_psp_adaptive_pool_bins(self):
        from segmentation_training_pipeline_tpu.models.decoders.pspnet import (
            adaptive_avg_pool)

        y = jnp.asarray(np.random.RandomState(0).rand(1, 16, 16, 4),
                        jnp.float32)
        for b in (1, 2, 3, 6):
            p = adaptive_avg_pool(y, b)
            assert p.shape == (1, b, b, 4), (b, p.shape)
        # exactness vs manual segments for b=3, n=16
        p3 = np.asarray(adaptive_avg_pool(y, 3))
        seg = [(0, 6), (5, 11), (10, 16)]
        seg = [((i * 16) // 3, -(-((i + 1) * 16) // 3)) for i in range(3)]
        want = np.asarray(y)[0, seg[1][0]: seg[1][1],
                             seg[2][0]: seg[2][1]].mean(axis=(0, 1))
        np.testing.assert_allclose(p3[0, 1, 2], want, rtol=1e-5)

    def test_unknown_tta_rejected(self):
        import pytest
        from segmentation_training_pipeline_tpu.config import (
            ConfigError, parse_dict)

        with pytest.raises(ConfigError, match="testTimeAugmentation"):
            parse_dict(dict(architecture="Unet", backbone="resnet18",
                            shape=[32, 32, 3],
                            testTimeAugmentation="d16"))

    def test_mask_dir_stem_mismatch_rejected(self, tmp_path):
        import cv2
        import pytest
        from segmentation_training_pipeline_tpu.data.datasets import (
            DirectoryDataSet)

        (tmp_path / "images").mkdir()
        (tmp_path / "masks").mkdir()
        cv2.imwrite(str(tmp_path / "images" / "a.png"),
                    np.zeros((8, 8, 3), np.uint8))
        cv2.imwrite(str(tmp_path / "masks" / "a_mask.png"),
                    np.zeros((8, 8), np.uint8))
        with pytest.raises(ValueError, match="stem"):
            DirectoryDataSet(str(tmp_path / "images"),
                             str(tmp_path / "masks"))

    def test_smooth_field_matches_scipy(self):
        from scipy.ndimage import gaussian_filter
        from segmentation_training_pipeline_tpu.ops.aug.warp import (
            smooth_field)

        f = np.random.RandomState(0).uniform(-1, 1, (1, 64, 64)
                                             ).astype(np.float32)
        out = np.asarray(smooth_field(jnp.asarray(f), jnp.asarray([4.0]),
                                      radius=12))[0]
        ref = gaussian_filter(f[0], 4.0, mode="reflect", truncate=3.0)
        assert np.abs(out - ref).max() < 1e-5


class TestRound5Review:
    """Regression tests for the round-5 code-review findings."""

    def _run(self, spec, imgs=None, masks=None, seed=0):
        if imgs is None:
            rng = np.random.RandomState(0)
            imgs = rng.randint(0, 256, (4, 32, 32, 3), np.uint8)
        if masks is None:
            masks = (np.random.RandomState(1).rand(4, 32, 32, 1)
                     > 0.5).astype(np.float32)
        aug = build_augmentation(spec)
        oi, om = jax.jit(aug)(jax.random.PRNGKey(seed), jnp.asarray(imgs),
                              jnp.asarray(masks))
        return np.asarray(oi), np.asarray(om), imgs, masks

    def test_jigsaw_rejected_in_colorspace_scopes(self):
        """Jigsaw moves pixels AND the mask; scope combinators discard the
        child's mask, so it must be rejected like geometric children."""
        import pytest
        for outer, args in (
            ("WithHueAndSaturation", {"children": {"Jigsaw": {
                "nb_rows": 2, "nb_cols": 2, "max_steps": 2}}}),
            ("WithBrightnessChannels", {"children": {"Jigsaw": {
                "nb_rows": 2, "nb_cols": 2, "max_steps": 2}}}),
            ("WithChannels", {"channels": [0], "children": {"Jigsaw": {
                "nb_rows": 2, "nb_cols": 2, "max_steps": 2}}}),
        ):
            with pytest.raises(ValueError, match="photometric"):
                build_augmentation([{"name": outer, "args": args}])

    def test_bare_solarize_applies(self):
        """`Solarize:` (YAML null args) means imgaug defaults p=1,
        threshold=128 — it must neither crash (float(None)) nor no-op."""
        oi, _, imgs, _ = self._run([{"name": "Solarize", "args": None}])
        hi = imgs >= 129
        assert hi.any()
        assert np.abs(oi[hi] - imgs[hi].astype(np.float32)).max() > 1.0

    def test_bare_edge_augmenters_apply(self):
        """`Canny:` / `DirectedEdgeDetect:` with null args must use the
        imgaug default alpha ranges, not a silent alpha=0 no-op."""
        for name in ("Canny", "DirectedEdgeDetect"):
            changed = 0.0
            for seed in range(3):
                oi, _, imgs, _ = self._run([{"name": name, "args": None}],
                                           seed=seed)
                changed = max(changed,
                              np.abs(oi - imgs.astype(np.float32)).max())
            assert changed > 1.0, name

    def test_bare_add_applies(self):
        """The null-args fix is structural (_bare): every bare photometric
        name gets its imgaug default distribution, e.g. Add ~ U(-20, 20)."""
        imgs = np.full((4, 32, 32, 3), 128, np.uint8)
        changed = 0.0
        for seed in range(3):
            oi, _, _, _ = self._run([{"name": "Add", "args": None}],
                                    imgs=imgs, seed=seed)
            changed = max(changed, np.abs(oi - 128.0).max())
        assert changed > 0.5

    def test_bare_identity_default_family_applies(self):
        """Names whose dict-form default used to be the identity must draw
        the imgaug-0.4 default range on a bare `Name:` instead of silently
        no-opping (Multiply 1.0, GaussianBlur sigma 0, LinearContrast 1.0,
        AdditiveGaussianNoise scale 0, EdgeDetect alpha 0, ...)."""
        rng = np.random.RandomState(2)
        imgs = rng.randint(40, 216, (4, 32, 32, 3), np.uint8)
        for name in ("Multiply", "GaussianBlur", "LinearContrast",
                     "GammaContrast", "LogContrast", "AdditiveGaussianNoise",
                     "AdditiveLaplaceNoise", "EdgeDetect"):
            changed = 0.0
            for seed in range(3):
                oi, _, _, _ = self._run([{"name": name, "args": None}],
                                        imgs=imgs, seed=seed)
                changed = max(changed,
                              np.abs(oi - imgs.astype(np.float32)).max())
            assert changed > 0.5, name

    def test_every_bare_form_applies_or_errors(self):
        """Structural guard generalizing the Solarize/Canny findings: for
        EVERY registered augmenter, a bare `Name:` (args None) must either
        raise a pointed ValueError/KeyError (e.g. children/size required)
        or visibly transform at least one of a few seeds — a silent
        identity or a raw TypeError is a product bug."""
        from segmentation_training_pipeline_tpu import config as C
        C._populate_registries()
        canons = sorted(set(C.AUGMENTERS._canonical.values()))
        # identity-by-design or identity-by-imgaug-default bare forms
        identity_ok = {
            "noop", "identity",
            "affine",        # imgaug Affine() is the identity transform
            "cropandpad",    # px/percent default 0 (imgaug: None -> 0)
            "pad",           # same
            "crop",          # same
            "dropout2d",     # p=0.1 over 3 channels: a tiny batch can
                             # legitimately draw zero drops across seeds
        }
        rng = np.random.RandomState(3)
        imgs = rng.randint(30, 226, (2, 40, 40, 3), np.uint8)
        masks = (rng.rand(2, 40, 40, 1) > 0.5).astype(np.float32)
        silent, crashed = [], []
        for canon in canons:
            if canon.lower() in identity_ok:
                continue
            try:
                aug = build_augmentation([{"name": canon, "args": None}])
            except (ValueError, KeyError):
                continue                      # pointed error: acceptable
            except Exception as e:            # raw crash: the Solarize bug
                crashed.append((canon, type(e).__name__, str(e)[:60]))
                continue
            changed = 0.0
            try:
                for seed in range(4):
                    oi, om = aug(jax.random.PRNGKey(seed),
                                 jnp.asarray(imgs), jnp.asarray(masks))
                    d_i = np.abs(np.asarray(oi)
                                 - imgs.astype(np.float32)).max()
                    d_m = np.abs(np.asarray(om) - masks).max()
                    changed = max(changed, d_i, d_m)
                    if changed > 0.5:
                        break
            except (ValueError, KeyError):
                continue   # pointed error at trace time: also acceptable
            except Exception as e:
                crashed.append((canon, type(e).__name__, str(e)[:60]))
                continue
            if changed <= 0.5:
                silent.append(canon)
        assert not crashed, crashed
        assert not silent, silent
