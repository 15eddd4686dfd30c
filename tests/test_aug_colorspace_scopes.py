"""Round-5: colorspace-scoping combinators (WithHueAndSaturation,
WithBrightnessChannels, WithColorspace[HSV]) — the last lowerable (c)
names off the do-not-lower list.  Oracle: colorsys (cv2 uint8 scale:
H 0..180, S/V 0..255)."""

import colorsys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from segmentation_training_pipeline_tpu.config import (
    ConfigError, _normalize_augmentation, _populate_registries)
from segmentation_training_pipeline_tpu.ops.aug import build_augmentation

_populate_registries()


def _run(specs, imgs, masks=None, seed=0):
    if masks is None:
        masks = np.zeros(imgs.shape[:3] + (1,), np.float32)
    fn = build_augmentation([{"name": n, "args": a} for n, a in specs])
    oi, om = jax.jit(fn)(jax.random.PRNGKey(seed), jnp.asarray(imgs),
                         jnp.asarray(masks))
    return np.asarray(oi), np.asarray(om)


def _hsv_oracle(imgs, add_hs=None, add_hsv=None):
    """Per-pixel colorsys reference for the Add-child scopes."""
    out = np.zeros(imgs.shape, np.float32)
    b, hh, ww, _ = imgs.shape
    for bi in range(b):
        for y in range(hh):
            for x in range(ww):
                r, g, bl = (float(v) / 255.0 for v in imgs[bi, y, x])
                h, s, v = colorsys.rgb_to_hsv(r, g, bl)
                ch, cs, cv = h * 180.0, s * 255.0, v * 255.0
                if add_hs is not None:
                    ch = (ch + add_hs) % 180.0
                    cs = min(max(cs + add_hs, 0.0), 255.0)
                if add_hsv is not None:
                    ch = (ch + add_hsv) % 180.0
                    cs = min(max(cs + add_hsv, 0.0), 255.0)
                    cv = min(max(cv + add_hsv, 0.0), 255.0)
                rgb = colorsys.hsv_to_rgb(ch / 180.0, cs / 255.0, cv / 255.0)
                out[bi, y, x] = np.array(rgb) * 255.0
    return out


class TestWithHueAndSaturation:
    def test_add_zero_identity(self):
        r = np.random.RandomState(0)
        imgs = r.randint(0, 256, (2, 8, 8, 3)).astype(np.uint8)
        oi, _ = _run([("WithHueAndSaturation", {"children": {"Add": 0}})],
                     imgs)
        np.testing.assert_allclose(oi, imgs.astype(np.float32), atol=0.51)

    @pytest.mark.parametrize("add", [25.0, -40.0])
    def test_add_matches_colorsys(self, add):
        r = np.random.RandomState(1)
        imgs = r.randint(0, 256, (1, 5, 5, 3)).astype(np.uint8)
        oi, _ = _run([("WithHueAndSaturation",
                       {"children": {"Add": add}})], imgs)
        np.testing.assert_allclose(oi, _hsv_oracle(imgs, add_hs=add),
                                   atol=1.0)

    def test_negative_hue_wraps_not_clips(self):
        # pure red: H=0; Add -40 must wrap to 140, not clip to 0
        imgs = np.zeros((1, 2, 2, 3), np.uint8)
        imgs[..., 0] = 255
        oi, _ = _run([("WithHueAndSaturation",
                       {"children": {"Add": -40}})], imgs)
        np.testing.assert_allclose(oi, _hsv_oracle(imgs, add_hs=-40.0),
                                   atol=1.0)
        assert oi[0, 0, 0, 2] > 100  # wrapped into the violet sector

    def test_value_plane_untouched(self):
        r = np.random.RandomState(2)
        imgs = r.randint(0, 256, (1, 6, 6, 3)).astype(np.uint8)
        oi, _ = _run([("WithHueAndSaturation",
                       {"children": {"Add": [10, 40]}})], imgs, seed=3)
        np.testing.assert_allclose(oi.max(axis=-1),
                                   imgs.astype(np.float32).max(axis=-1),
                                   atol=1.0)

    def test_rgb_only_child_rejected(self):
        with pytest.raises(ValueError, match="RGB"):
            _run([("WithHueAndSaturation",
                   {"children": {"Grayscale": 1.0}})],
                 np.zeros((1, 4, 4, 3), np.uint8))

    def test_geometric_child_rejected(self):
        with pytest.raises(ValueError, match="photometric"):
            _run([("WithHueAndSaturation",
                   {"children": {"Affine": {"rotate": [0, 10]}}})],
                 np.zeros((1, 4, 4, 3), np.uint8))


class TestWithBrightnessChannels:
    def test_multiply_scales_all_channels(self):
        imgs = np.zeros((1, 4, 4, 3), np.float32)
        imgs[..., :] = [200.0, 100.0, 50.0]
        oi, _ = _run([("WithBrightnessChannels",
                       {"children": {"Multiply": 0.5}})],
                     imgs, np.zeros((1, 4, 4, 1), np.float32))
        np.testing.assert_allclose(oi[0, 0, 0], [100.0, 50.0, 25.0],
                                   atol=0.51)

    def test_black_brightens_to_gray(self):
        imgs = np.zeros((1, 4, 4, 3), np.uint8)
        oi, _ = _run([("WithBrightnessChannels",
                       {"children": {"Add": 50}})], imgs)
        np.testing.assert_allclose(oi, 50.0, atol=0.51)

    def test_identity(self):
        r = np.random.RandomState(4)
        imgs = r.randint(0, 256, (2, 8, 8, 3)).astype(np.uint8)
        oi, _ = _run([("WithBrightnessChannels",
                       {"children": {"Multiply": 1.0}})], imgs)
        np.testing.assert_allclose(oi, imgs.astype(np.float32), atol=0.51)

    def test_mask_untouched(self):
        imgs = np.full((1, 8, 8, 3), 90, np.uint8)
        masks = (np.random.RandomState(5).rand(1, 8, 8, 1) > 0.5
                 ).astype(np.float32)
        _, om = _run([("WithBrightnessChannels",
                       {"children": {"Multiply": [0.5, 1.5]}})], imgs, masks)
        np.testing.assert_array_equal(om, masks)


class TestWithColorspace:
    def test_hsv_add_matches_colorsys(self):
        r = np.random.RandomState(6)
        imgs = r.randint(0, 256, (1, 5, 5, 3)).astype(np.uint8)
        oi, _ = _run([("WithColorspace",
                       {"to_colorspace": "HSV",
                        "children": {"Add": 15.0}})], imgs)
        np.testing.assert_allclose(oi, _hsv_oracle(imgs, add_hsv=15.0),
                                   atol=1.0)

    def test_non_hsv_rejected(self):
        with pytest.raises(ValueError, match="HSV"):
            _run([("WithColorspace",
                   {"to_colorspace": "Lab", "children": {"Add": 10}})],
                 np.zeros((1, 4, 4, 3), np.uint8))

    def test_identity(self):
        r = np.random.RandomState(7)
        imgs = r.randint(0, 256, (2, 8, 8, 3)).astype(np.uint8)
        oi, _ = _run([("WithColorspace",
                       {"to_colorspace": "HSV",
                        "children": {"Add": 0}})], imgs)
        np.testing.assert_allclose(oi, imgs.astype(np.float32), atol=0.51)


class TestParseTimeValidation:
    def test_child_typo_errors_at_parse(self):
        with pytest.raises(ConfigError, match="unknown augmenter"):
            _normalize_augmentation(
                {"WithHueAndSaturation": {"children": {"Addd": 10}}})

    def test_child_arg_typo_errors_at_parse(self):
        with pytest.raises(ConfigError, match="sigma"):
            _normalize_augmentation(
                {"WithBrightnessChannels":
                 {"children": {"GaussianBlur": {"sigmaa": [0, 1]}}}})

    def test_missing_children_errors(self):
        with pytest.raises(ConfigError, match="children"):
            _normalize_augmentation({"WithHueAndSaturation": {}})

    def test_non_hsv_colorspace_errors_at_parse(self):
        with pytest.raises(ConfigError, match="HSV"):
            _normalize_augmentation(
                {"WithColorspace": {"to_colorspace": "Lab",
                                    "children": {"Add": 10}}})

    def test_unknown_arg_key_errors(self):
        with pytest.raises(ConfigError, match="childrn|children"):
            _normalize_augmentation(
                {"WithColorspace": {"to_colorspace": "HSV",
                                    "childrn": {"Add": 10}}})

    def test_sampled_colorspaces_arg_gets_pointer(self):
        with pytest.raises(ConfigError, match="HSV-V"):
            _normalize_augmentation(
                {"WithBrightnessChannels":
                 {"to_colorspaces": ["HSV", "Lab"],
                  "children": {"Add": 10}}})
