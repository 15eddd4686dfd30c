"""Round-4 breadth batch 2: ReplaceElementwise, WithChannels, and the
px: forms of Crop/CropAndPad/Pad (imgaug parity, SURVEY §2b imgaug row)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from segmentation_training_pipeline_tpu.ops.aug import build_augmentation


def _run(specs, imgs, masks, seed=0):
    fn = build_augmentation([{"name": n, "args": a} for n, a in specs])
    oi, om = jax.jit(fn)(jax.random.PRNGKey(seed), jnp.asarray(imgs),
                         jnp.asarray(masks))
    return np.asarray(oi), np.asarray(om)


class TestReplaceElementwise:
    def test_p_zero_identity_p_one_all_replaced(self):
        imgs = np.full((2, 8, 8, 3), 100, np.uint8)
        masks = np.zeros((2, 8, 8, 1), np.float32)
        oi, _ = _run([("ReplaceElementwise",
                       {"mask": 0.0, "replacement": 255.0})], imgs, masks)
        np.testing.assert_allclose(oi, 100.0, atol=1e-3)
        oi, _ = _run([("ReplaceElementwise",
                       {"mask": 1.0, "replacement": 255.0})], imgs, masks)
        np.testing.assert_allclose(oi, 255.0, atol=1e-3)

    def test_fraction_and_replacement_range(self):
        imgs = np.full((4, 32, 32, 3), 100, np.uint8)
        masks = np.zeros((4, 32, 32, 1), np.float32)
        oi, _ = _run([("ReplaceElementwise",
                       {"mask": 0.25, "replacement": [200.0, 250.0]})],
                     imgs, masks)
        repl = oi != 100.0
        frac = repl.mean()
        assert 0.15 < frac < 0.35
        assert oi[repl].min() >= 199.0 and oi[repl].max() <= 251.0
        # default (not per_channel): whole pixels replace together
        per_pixel = repl.all(axis=-1) | (~repl.any(axis=-1))
        assert per_pixel.all()

    def test_per_channel(self):
        imgs = np.full((4, 32, 32, 3), 100, np.uint8)
        masks = np.zeros((4, 32, 32, 1), np.float32)
        oi, _ = _run([("ReplaceElementwise",
                       {"mask": 0.5, "replacement": 255.0,
                        "per_channel": True})], imgs, masks)
        repl = oi != 100.0
        # channels replace independently: mixed pixels must exist
        mixed = repl.any(axis=-1) & ~repl.all(axis=-1)
        assert mixed.mean() > 0.3


class TestWithChannels:
    def test_only_selected_channels_change(self):
        imgs = np.full((2, 8, 8, 3), 100, np.uint8)
        masks = np.zeros((2, 8, 8, 1), np.float32)
        oi, _ = _run([("WithChannels",
                       {"channels": [0], "children": {"Add": 50.0}})],
                     imgs, masks)
        np.testing.assert_allclose(oi[..., 0], 150.0, atol=1e-3)
        np.testing.assert_allclose(oi[..., 1], 100.0, atol=1e-3)
        np.testing.assert_allclose(oi[..., 2], 100.0, atol=1e-3)

    def test_scalar_channel_and_two_channels(self):
        imgs = np.full((1, 4, 4, 3), 100, np.uint8)
        masks = np.zeros((1, 4, 4, 1), np.float32)
        oi, _ = _run([("WithChannels",
                       {"channels": [1, 2], "children": {"Invert": 1.0}})],
                     imgs, masks)
        np.testing.assert_allclose(oi[..., 0], 100.0, atol=1e-3)
        np.testing.assert_allclose(oi[..., 1], 155.0, atol=1e-3)

    def test_geometric_children_rejected(self):
        with pytest.raises(ValueError, match="photometric"):
            build_augmentation([{"name": "WithChannels",
                                 "args": {"channels": [0],
                                          "children": {"Fliplr": 1.0}}}])

    def test_config_validates_children(self):
        from segmentation_training_pipeline_tpu.config import (ConfigError,
                                                               parse_dict)

        with pytest.raises(ConfigError, match="unknown augmenter"):
            parse_dict({"augmentation": {
                "WithChannels": {"channels": [0],
                                 "children": {"Bogus": 1.0}}}})
        cfg = parse_dict({"augmentation": {
            "WithChannels": {"channels": [0, 1],
                             "children": {"Multiply": [0.8, 1.2]}}}})
        assert cfg.augmentation[0]["args"]["children"][0]["name"] == \
            "Multiply"


class TestCropPx:
    def test_crop_px_zooms_content(self):
        # bright center square: cropping 4px per side at 16px frame zooms
        # the center out toward the edges
        imgs = np.zeros((1, 16, 16, 1), np.uint8)
        imgs[0, 6:10, 6:10] = 200
        masks = np.zeros((1, 16, 16, 1), np.float32)
        masks[0, 6:10, 6:10] = 1.0
        oi, om = _run([("Crop", {"px": 4.0})], imgs, masks)
        # the 4x4 bright square becomes ~8x8 centered
        assert om.sum() > 2.5 * masks.sum()
        assert oi.max() > 150.0

    def test_pad_px_shrinks_content(self):
        imgs = np.full((1, 16, 16, 1), 100, np.uint8)
        masks = np.ones((1, 16, 16, 1), np.float32)
        oi, om = _run([("Pad", {"px": 8.0})], imgs, masks)
        # padding 8px per side on a 16px frame halves the content
        assert 0.2 < om.mean() < 0.35
        # fill corners are 0
        assert oi[0, 0, 0, 0] < 5.0

    def test_cropandpad_px_range(self):
        r = np.random.RandomState(0)
        imgs = r.randint(0, 255, (4, 16, 16, 3)).astype(np.uint8)
        masks = (r.rand(4, 16, 16, 1) > 0.5).astype(np.float32)
        oi, om = _run([("CropAndPad", {"px": [-3, 3]})], imgs, masks)
        assert oi.shape == imgs.shape
        assert np.isfinite(oi).all()
        assert set(np.unique(om)) <= {0.0, 1.0}

    def test_crop_px_with_rotation_stays_finite(self):
        r = np.random.RandomState(1)
        imgs = r.randint(0, 255, (2, 32, 32, 3)).astype(np.uint8)
        masks = (r.rand(2, 32, 32, 1) > 0.5).astype(np.float32)
        oi, om = _run([("Affine", {"rotate": [-15, 15]}),
                       ("Crop", {"px": [0, 4]})], imgs, masks)
        assert np.isfinite(oi).all()
        assert set(np.unique(om)) <= {0.0, 1.0}
