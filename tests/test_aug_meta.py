"""Round-2 augmentation hardening: user block-order preservation, meta-
augmenters (Sometimes/OneOf/SomeOf), PiecewiseAffine/PerspectiveTransform
displacement-field lowerings, HSV ops, and per_channel semantics.

imgaug-documented semantics are the oracle throughout (SURVEY §2b).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from segmentation_training_pipeline_tpu.ops.aug import build_augmentation


def _imgs(b=2, h=16, w=16, c=3, seed=0):
    r = np.random.RandomState(seed)
    return r.randint(0, 255, (b, h, w, c)).astype(np.uint8)


def _masks(b=2, h=16, w=16, seed=1):
    return (np.random.RandomState(seed).rand(b, h, w, 1) > 0.6).astype(
        np.float32)


def _run(specs, imgs, masks, seed=0):
    fn = build_augmentation([{"name": n, "args": a} for n, a in specs])
    oi, om = jax.jit(fn)(jax.random.PRNGKey(seed), jnp.asarray(imgs),
                         jnp.asarray(masks))
    return np.asarray(oi), np.asarray(om)


class TestBlockOrder:
    """imgaug applies augmenters sequentially; round-1 silently hoisted all
    geometry before all photometrics."""

    def test_add_before_flip_vs_after(self):
        imgs = np.zeros((1, 4, 4, 1), np.uint8)
        imgs[0, :, :2] = 100  # left half bright
        masks = _masks(1, 4, 4)
        # Add THEN flip == flip THEN Add for a constant add — use a
        # geometry-sensitive probe instead: Add after a crop-zoom changes
        # the fill region, Add before does not.
        specs_add_first = [("Add", 50.0), ("Fliplr", 1.0)]
        specs_add_last = [("Fliplr", 1.0), ("Add", 50.0)]
        a, _ = _run(specs_add_first, imgs, masks)
        b, _ = _run(specs_add_last, imgs, masks)
        np.testing.assert_allclose(a, b, atol=1e-3)  # flips commute with add
        # now a warp with out-of-bounds fill: translate right by 2px
        warp = ("Affine", {"translate_px": {"x": 2.0}})
        before, _ = _run([("Add", 50.0), warp], imgs, masks)
        after, _ = _run([warp, ("Add", 50.0)], imgs, masks)
        # fill region (left 2 cols): Add-before leaves fill at 0;
        # Add-after leaks +50 into it — imgaug's sequential semantics
        assert float(before[0, :, :2].max()) == 0.0
        assert float(after[0, :, :2].min()) >= 49.0

    def test_photo_geo_photo_three_segments(self):
        imgs, masks = _imgs(), _masks()
        oi, om = _run([("Multiply", 1.2), ("Fliplr", 1.0), ("Add", 10.0)],
                      imgs, masks)
        expect = np.clip(imgs[:, :, ::-1].astype(np.float32) * 1.2 + 10.0,
                         0, 255)
        np.testing.assert_allclose(oi, expect, atol=1e-2)
        np.testing.assert_array_equal(om, masks[:, :, ::-1])


class TestSometimes:
    def test_p0_identity_p1_always(self):
        imgs, masks = _imgs(4), _masks(4)
        oi, _ = _run([("Sometimes", {"p": 0.0, "then": {"Invert": 1.0}})],
                     imgs, masks)
        np.testing.assert_allclose(oi, imgs.astype(np.float32), atol=1e-4)
        oi, _ = _run([("Sometimes", {"p": 1.0, "then": {"Invert": 1.0}})],
                     imgs, masks)
        np.testing.assert_allclose(oi, 255.0 - imgs.astype(np.float32),
                                   atol=1e-4)

    def test_per_image_selection(self):
        imgs = np.full((64, 4, 4, 1), 100, np.uint8)
        masks = np.zeros((64, 4, 4, 1), np.float32)
        oi, _ = _run([("Sometimes", {"p": 0.5, "then": {"Add": 55.0}})],
                     imgs, masks)
        per_img = oi.reshape(64, -1).mean(axis=1)
        n_changed = int((per_img > 120).sum())
        assert 10 <= n_changed <= 54  # binomial(64, .5), loose bounds
        # each image is entirely augmented or entirely not
        assert set(np.round(np.unique(per_img)).astype(int)) <= {100, 155}

    def test_geometry_children_move_masks(self):
        imgs, masks = _imgs(2), _masks(2)
        oi, om = _run([("Sometimes", {"p": 1.0, "then": {"Flipud": 1.0}})],
                      imgs, masks)
        np.testing.assert_array_equal(om, masks[:, ::-1])


class TestOneOf:
    def test_exactly_one_child_applies(self):
        imgs = np.full((128, 4, 4, 1), 100, np.uint8)
        masks = np.zeros((128, 4, 4, 1), np.float32)
        oi, _ = _run([("OneOf", [{"Add": 50.0}, {"Add": -50.0}])],
                     imgs, masks)
        per_img = np.round(oi.reshape(128, -1).mean(axis=1)).astype(int)
        assert set(np.unique(per_img)) == {50, 150}  # never 100, never both
        frac = (per_img == 150).mean()
        assert 0.3 < frac < 0.7


class TestSomeOf:
    def test_exactly_n_children(self):
        imgs = np.full((32, 4, 4, 1), 0, np.uint8)
        masks = np.zeros((32, 4, 4, 1), np.float32)
        # three children each add a distinct power of 2: the sum identifies
        # exactly which subset fired
        children = [{"Add": 1.0}, {"Add": 2.0}, {"Add": 4.0}]
        oi, _ = _run([("SomeOf", {"n": 2, "children": children})],
                     imgs, masks)
        sums = np.round(oi.reshape(32, -1).mean(axis=1)).astype(int)
        assert set(np.unique(sums)) <= {3, 5, 6}  # exactly two of {1,2,4}

    def test_n_range(self):
        imgs = np.full((256, 4, 4, 1), 0, np.uint8)
        masks = np.zeros((256, 4, 4, 1), np.float32)
        children = [{"Add": 1.0}, {"Add": 2.0}]
        oi, _ = _run([("SomeOf", {"n": [0, 2], "children": children})],
                     imgs, masks)
        sums = np.round(oi.reshape(256, -1).mean(axis=1)).astype(int)
        assert set(np.unique(sums)) <= {0, 1, 2, 3}
        assert len(np.unique(sums)) >= 3  # 0, 1 and 2 children all occur


class TestPiecewiseAffine:
    def test_scale_zero_identity(self):
        imgs, masks = _imgs(2, 32, 32), _masks(2, 32, 32)
        oi, om = _run([("PiecewiseAffine", {"scale": 0.0})], imgs, masks)
        np.testing.assert_allclose(oi, imgs.astype(np.float32), atol=1e-3)
        np.testing.assert_array_equal(om, masks)

    def test_deforms_but_preserves_mask_binarity(self):
        imgs, masks = _imgs(2, 32, 32), _masks(2, 32, 32)
        oi, om = _run([("PiecewiseAffine", {"scale": [0.02, 0.04]})],
                      imgs, masks)
        assert np.abs(oi - imgs.astype(np.float32)).max() > 1.0
        assert set(np.unique(om)) <= {0.0, 1.0}
        assert oi.shape == imgs.shape


class TestPerspectiveTransform:
    def test_scale_zero_identity(self):
        imgs, masks = _imgs(2, 32, 32), _masks(2, 32, 32)
        oi, om = _run([("PerspectiveTransform", {"scale": 0.0})], imgs, masks)
        np.testing.assert_allclose(oi, imgs.astype(np.float32), atol=1e-2)
        np.testing.assert_array_equal(om, masks)

    def test_corners_move_inward(self):
        # a bright border frame: inward corner jitter pulls interior pixels
        # toward the border, so the output border must stay bright (content
        # zooms out of the frame, no black fill at the corners)
        imgs = np.zeros((4, 32, 32, 3), np.uint8)
        imgs[:, :2] = imgs[:, -2:] = imgs[:, :, :2] = imgs[:, :, -2:] = 200
        masks = np.zeros((4, 32, 32, 1), np.float32)
        oi, _ = _run([("PerspectiveTransform", {"scale": [0.05, 0.08]})],
                     imgs, masks)
        assert np.abs(oi - imgs.astype(np.float32)).max() > 10.0
        assert np.isfinite(oi).all()


class TestHSV:
    def test_add_zero_identity(self):
        imgs, masks = _imgs(2), _masks(2)
        oi, _ = _run([("AddToHueAndSaturation", {"value": 0.0})], imgs, masks)
        np.testing.assert_allclose(oi, imgs.astype(np.float32), atol=0.5)

    def test_mul_one_identity(self):
        imgs, masks = _imgs(2), _masks(2)
        oi, _ = _run([("MultiplyHueAndSaturation", {"mul": 1.0})], imgs,
                     masks)
        np.testing.assert_allclose(oi, imgs.astype(np.float32), atol=0.5)

    def test_desaturate_moves_toward_gray(self):
        imgs = np.zeros((1, 4, 4, 3), np.uint8)
        imgs[..., 0] = 200  # pure red: high saturation
        masks = np.zeros((1, 4, 4, 1), np.float32)
        oi, _ = _run([("MultiplyHueAndSaturation",
                       {"mul_hue": 1.0, "mul_saturation": 0.0})], imgs, masks)
        # zero saturation -> all channels equal (gray), value preserved
        np.testing.assert_allclose(oi[..., 0], oi[..., 1], atol=0.5)
        np.testing.assert_allclose(oi[..., 0], 200.0, atol=0.5)

    def test_value_channel_invariant_under_hue_shift(self):
        imgs, masks = _imgs(2), _masks(2)
        oi, _ = _run([("AddToHueAndSaturation",
                       {"value_hue": 80.0, "value_saturation": 0.0})],
                     imgs, masks)
        np.testing.assert_allclose(oi.max(axis=-1),
                                   imgs.astype(np.float32).max(axis=-1),
                                   atol=1.0)


class TestPerChannel:
    def test_multiply_per_channel_differs_across_channels(self):
        imgs = np.full((8, 4, 4, 3), 100, np.uint8)
        masks = np.zeros((8, 4, 4, 1), np.float32)
        oi, _ = _run([("Multiply", {"mul": [0.5, 1.5], "per_channel": True})],
                     imgs, masks)
        ch_means = oi.mean(axis=(1, 2))  # (8, 3)
        assert np.abs(ch_means[:, 0] - ch_means[:, 1]).max() > 1.0

    def test_multiply_default_is_joint(self):
        imgs = np.full((8, 4, 4, 3), 100, np.uint8)
        masks = np.zeros((8, 4, 4, 1), np.float32)
        oi, _ = _run([("Multiply", {"mul": [0.5, 1.5]})], imgs, masks)
        ch_means = oi.mean(axis=(1, 2))
        np.testing.assert_allclose(ch_means[:, 0], ch_means[:, 1], atol=1e-3)


def test_config_validates_meta_children():
    from segmentation_training_pipeline_tpu.config import ConfigError, parse_dict

    with pytest.raises(ConfigError, match="unknown augmenter"):
        parse_dict({"augmentation": {
            "Sometimes": {"p": 0.5, "then": {"Flipzz": 1.0}}}})
    with pytest.raises(ConfigError, match="unknown augmenter"):
        parse_dict({"augmentation": {
            "OneOf": [{"Fliplr": 1.0}, {"Bogus": 1}]}})
    cfg = parse_dict({"augmentation": {
        "Sometimes": {"p": 0.3, "then": {"Affine": {"rotate": [-5, 5]}}},
        "OneOf": [{"Fliplr": 1.0}, {"Flipud": 1.0}],
        "SomeOf": {"n": 1, "children": [{"Add": 5}, {"Multiply": 1.1}]},
        "PiecewiseAffine": {"scale": [0.01, 0.03]},
        "PerspectiveTransform": {"scale": 0.05},
        "AddToHueAndSaturation": {"value": [-20, 20]},
    }})
    names = [s["name"] for s in cfg.augmentation]
    assert names[0] == "Sometimes"
    # children were normalized to {"name","args"} lists
    assert cfg.augmentation[0]["args"]["then"][0]["name"] == "Affine"
