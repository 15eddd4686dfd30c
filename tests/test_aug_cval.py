"""Affine/Crop-family `cval` fill values + Sometimes else-branch
(imgaug parity; SURVEY §2b imgaug row).

imgaug fills out-of-frame warp regions with ``cval`` (default 0) for
images and always 0 for segmentation maps; Sometimes(p, then, else)
applies the else branch to the images the coin does NOT select.
"""

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


class TestCval:
    def test_translate_fill_is_cval_and_content_preserved(self):
        imgs = np.full((2, 16, 16, 3), 100, np.uint8)
        masks = np.ones((2, 16, 16, 1), np.float32)
        oi, om = _run([("Affine", {"translate_px": {"x": 4.0},
                                   "cval": 255.0})], imgs, masks)
        # fill region: the 4 leftmost columns (interior of them — the
        # boundary column blends bilinearly)
        assert oi[:, :, :3].min() >= 254.0
        # content shifted right, preserved
        np.testing.assert_allclose(oi[:, :, 6:], 100.0, atol=1.0)
        # masks ALWAYS fill with 0 (imgaug segmentation-map rule)
        assert om[:, :, :3].max() == 0.0
        assert om[:, :, 6:].min() == 1.0

    def test_cval_range_samples_per_image(self):
        imgs = np.zeros((16, 16, 16, 1), np.uint8)
        masks = np.zeros((16, 16, 16, 1), np.float32)
        oi, _ = _run([("Affine", {"translate_px": {"x": 8.0},
                                  "cval": [50.0, 200.0]})], imgs, masks)
        fills = oi[:, :, :4].mean(axis=(1, 2, 3))
        assert fills.min() >= 49.0 and fills.max() <= 201.0
        assert fills.std() > 5.0  # actually varies per image

    def test_pad_cval(self):
        imgs = np.full((1, 16, 16, 1), 80, np.uint8)
        masks = np.zeros((1, 16, 16, 1), np.float32)
        oi, _ = _run([("Pad", {"percent": 0.25, "pad_cval": 200.0})],
                     imgs, masks)
        # padding shrinks content into the center; corners are fill
        assert oi[0, 0, 0, 0] >= 199.0
        assert abs(float(oi[0, 8, 8, 0]) - 80.0) < 2.0

    def test_cval_zero_matches_default(self):
        r = np.random.RandomState(0)
        imgs = r.randint(0, 255, (2, 16, 16, 3)).astype(np.uint8)
        masks = (r.rand(2, 16, 16, 1) > 0.5).astype(np.float32)
        spec = {"rotate": [-20, 20], "translate_px": {"x": [-3, 3]}}
        a, am = _run([("Affine", spec)], imgs, masks, seed=7)
        b, bm = _run([("Affine", {**spec, "cval": 0.0})], imgs, masks,
                     seed=7)
        np.testing.assert_allclose(a, b, atol=0.75)
        np.testing.assert_array_equal(am, bm)

    def test_cval_with_elastic_path(self):
        imgs = np.full((2, 32, 32, 1), 100, np.uint8)
        masks = np.zeros((2, 32, 32, 1), np.float32)
        oi, _ = _run([("Affine", {"translate_px": {"x": 8.0}, "cval": 250.0}),
                      ("ElasticTransformation",
                       {"alpha": [0, 10], "sigma": 4.0})], imgs, masks)
        # fill region interior stays ~cval even through the elastic kernel
        assert oi[:, 8:24, :3].min() >= 200.0
        assert np.isfinite(oi).all()

    def test_unsupported_mode_errors(self):
        with pytest.raises(ValueError, match="constant"):
            build_augmentation([{"name": "Affine",
                                 "args": {"rotate": [-5, 5],
                                          "mode": "edge"}}])


class TestSometimesElse:
    def test_else_branch_applies_to_unselected(self):
        imgs = np.full((64, 4, 4, 1), 100, np.uint8)
        masks = np.zeros((64, 4, 4, 1), np.float32)
        oi, _ = _run([("Sometimes", {"p": 0.5, "then": {"Add": 50.0},
                                     "else": {"Add": -50.0}})], imgs, masks)
        per_img = np.round(oi.reshape(64, -1).mean(axis=1)).astype(int)
        # every image took exactly one branch; none stayed at 100
        assert set(np.unique(per_img)) == {50, 150}
        frac = (per_img == 150).mean()
        assert 0.2 < frac < 0.8

    def test_else_p1_never_fires(self):
        imgs = np.full((8, 4, 4, 1), 100, np.uint8)
        masks = np.zeros((8, 4, 4, 1), np.float32)
        oi, _ = _run([("Sometimes", {"p": 1.0, "then": {"Add": 50.0},
                                     "else": {"Add": -50.0}})], imgs, masks)
        np.testing.assert_allclose(oi, 150.0, atol=1e-3)

    def test_else_geometry_moves_masks(self):
        imgs = np.zeros((8, 8, 8, 1), np.uint8)
        masks = np.zeros((8, 8, 8, 1), np.float32)
        masks[:, :4] = 1.0
        _, om = _run([("Sometimes", {"p": 0.0, "then": {"Noop": {}},
                                     "else": {"Flipud": 1.0}})], imgs, masks)
        np.testing.assert_array_equal(om, masks[:, ::-1])

    def test_config_validates_else_children(self):
        from segmentation_training_pipeline_tpu.config import (ConfigError,
                                                               parse_dict)

        with pytest.raises(ConfigError, match="unknown augmenter"):
            parse_dict({"augmentation": {
                "Sometimes": {"p": 0.5, "then": {"Fliplr": 1.0},
                              "else": {"Bogus": 1.0}}}})
        cfg = parse_dict({"augmentation": {
            "Sometimes": {"p": 0.5, "then": {"Fliplr": 1.0},
                          "else": {"Flipud": 1.0}}}})
        assert cfg.augmentation[0]["args"]["else"][0]["name"] == "Flipud"


def test_config_affine_cval_parses():
    from segmentation_training_pipeline_tpu.config import parse_dict

    cfg = parse_dict({"augmentation": {
        "Affine": {"rotate": [-10, 10], "cval": 128}}})
    assert cfg.augmentation[0]["args"]["cval"] == 128
