"""Regression tests for the round-1 code-review findings."""

import numpy as np
import jax
import jax.numpy as jnp

from segmentation_training_pipeline_tpu.ops.aug import build_augmentation
from segmentation_training_pipeline_tpu.ops.aug import warp as W
from segmentation_training_pipeline_tpu.data.batcher import (
    _masks_u8_to_float, _paths_available, make_batches)
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
        out = _masks_u8_to_float(m, 1, "sigmoid")
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
