"""BlendAlpha family (imgaug blend combinators, SURVEY §2b imgaug row).

imgaug-documented semantics are the oracle: images mix as
``alpha·fg + (1−alpha)·bg``; segmentation maps take the branch whose
alpha is ≥ 0.5 (per image for BlendAlpha, per pixel for the spatial mask
generators).  Deviations (value-noise simplex approximation, fixed octave
set) are listed in docs/schema.md.
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


class TestBlendAlpha:
    def test_factor_one_is_child_factor_zero_is_input(self):
        imgs, masks = _imgs(), _masks()
        oi, _ = _run([("BlendAlpha",
                       {"factor": 1.0, "foreground": {"Invert": 1.0}})],
                     imgs, masks)
        np.testing.assert_allclose(oi, 255.0 - imgs.astype(np.float32),
                                   atol=1e-3)
        oi, _ = _run([("BlendAlpha",
                       {"factor": 0.0, "foreground": {"Invert": 1.0}})],
                     imgs, masks)
        np.testing.assert_allclose(oi, imgs.astype(np.float32), atol=1e-3)

    def test_factor_half_is_midpoint(self):
        imgs, masks = _imgs(), _masks()
        oi, _ = _run([("BlendAlpha",
                       {"factor": 0.5, "foreground": {"Invert": 1.0}})],
                     imgs, masks)
        np.testing.assert_allclose(oi, np.full_like(oi, 127.5), atol=1e-2)

    def test_mask_follows_majority_alpha(self):
        imgs, masks = _imgs(2), _masks(2)
        # fg flips vertically: factor >= 0.5 must take the flipped mask
        oi, om = _run([("BlendAlpha",
                        {"factor": 0.7, "foreground": {"Flipud": 1.0}})],
                      imgs, masks)
        np.testing.assert_array_equal(om, masks[:, ::-1])
        _, om = _run([("BlendAlpha",
                       {"factor": 0.3, "foreground": {"Flipud": 1.0}})],
                     imgs, masks)
        np.testing.assert_array_equal(om, masks)

    def test_alpha_legacy_name_and_arg(self):
        imgs, masks = _imgs(), _masks()
        a, _ = _run([("Alpha", {"alpha": 1.0, "first": {"Invert": 1.0}})],
                    imgs, masks)
        np.testing.assert_allclose(a, 255.0 - imgs.astype(np.float32),
                                   atol=1e-3)

    def test_background_branch(self):
        imgs, masks = _imgs(), _masks()
        oi, _ = _run([("BlendAlpha",
                       {"factor": 0.0, "foreground": {"Noop": {}},
                        "background": {"Add": 50.0}})], imgs, masks)
        np.testing.assert_allclose(
            oi, np.clip(imgs.astype(np.float32) + 50.0, 0, 255), atol=1e-2)

    def test_per_channel_varies_channels(self):
        imgs = np.full((8, 4, 4, 3), 100, np.uint8)
        masks = np.zeros((8, 4, 4, 1), np.float32)
        oi, _ = _run([("BlendAlpha",
                       {"factor": [0.0, 1.0], "per_channel": True,
                        "foreground": {"Add": 100.0}})], imgs, masks)
        ch_means = oi.mean(axis=(1, 2))  # (8, 3)
        assert np.abs(ch_means[:, 0] - ch_means[:, 1]).max() > 1.0


class TestBlendAlphaElementwise:
    def test_envelope_and_variation(self):
        imgs = np.full((2, 16, 16, 3), 100, np.uint8)
        masks = _masks()
        oi, _ = _run([("BlendAlphaElementwise",
                       {"factor": [0.0, 1.0],
                        "foreground": {"Add": 100.0}})], imgs, masks)
        assert oi.min() >= 100.0 - 1e-3 and oi.max() <= 200.0 + 1e-3
        # per-pixel alpha: the blended image varies within one image
        assert oi[0].std() > 5.0

    def test_mask_per_pixel_routing(self):
        imgs = _imgs(1, 8, 8)
        masks = np.zeros((1, 8, 8, 1), np.float32)
        # fg sets mask via TotalDropout? use a geometric child instead:
        # flipud the mask, then per-pixel alpha 0/1 choice mixes rows
        masks[0, :4] = 1.0  # top half on
        _, om = _run([("BlendAlphaElementwise",
                       {"factor": [0.0, 1.0, 0.0, 1.0],  # choice {0,1}
                        "foreground": {"Flipud": 1.0}})], imgs, masks)
        flipped = masks[:, ::-1]
        # every output pixel comes from one of the two branches
        ok = (om == masks) | (om == flipped)
        assert ok.all()
        # and both branches actually appear in rows where they differ
        assert (om != masks).any() and (om != flipped).any()


class TestGradients:
    def test_vertical_gradient_top_original_bottom_child(self):
        imgs = np.full((1, 16, 16, 1), 100, np.uint8)
        masks = np.zeros((1, 16, 16, 1), np.float32)
        oi, _ = _run([("BlendAlphaVerticalLinearGradient",
                       {"start_at": 0.0, "end_at": 1.0,
                        "foreground": {"Add": 100.0}})], imgs, masks)
        assert abs(float(oi[0, 0].mean()) - 100.0) < 2.0      # alpha 0 at top
        assert abs(float(oi[0, -1].mean()) - 200.0) < 2.0     # alpha 1 bottom
        col = oi[0, :, 0, 0]
        assert (np.diff(col) >= -1e-3).all()                  # monotone

    def test_horizontal_gradient(self):
        imgs = np.full((1, 16, 16, 1), 100, np.uint8)
        masks = np.zeros((1, 16, 16, 1), np.float32)
        oi, _ = _run([("BlendAlphaHorizontalLinearGradient",
                       {"start_at": 0.0, "end_at": 1.0,
                        "foreground": {"Add": 100.0}})], imgs, masks)
        assert abs(float(oi[0, :, 0].mean()) - 100.0) < 2.0
        assert abs(float(oi[0, :, -1].mean()) - 200.0) < 2.0

    def test_reversed_gradient(self):
        imgs = np.full((1, 16, 16, 1), 100, np.uint8)
        masks = np.zeros((1, 16, 16, 1), np.float32)
        oi, _ = _run([("BlendAlphaVerticalLinearGradient",
                       {"start_at": 1.0, "end_at": 0.0,
                        "foreground": {"Add": 100.0}})], imgs, masks)
        assert abs(float(oi[0, 0].mean()) - 200.0) < 2.0
        assert abs(float(oi[0, -1].mean()) - 100.0) < 2.0


class TestGridBlends:
    def test_regular_grid_cells_are_pure(self):
        imgs = np.full((4, 16, 16, 1), 100, np.uint8)
        masks = np.zeros((4, 16, 16, 1), np.float32)
        oi, _ = _run([("BlendAlphaRegularGrid",
                       {"nb_rows": 4, "nb_cols": 4,
                        "foreground": {"Add": 100.0}})], imgs, masks)
        # default per-cell alpha is a 0/1 coin: every 4x4 cell is wholly
        # 100 or wholly 200
        cells = oi.reshape(4, 4, 4, 4, 4, 1)        # (B, gy, cy, gx, cx, C)
        cells = cells.transpose(0, 1, 3, 2, 4, 5).reshape(4, 16, 16)
        for cell in cells.reshape(-1, 16):
            assert cell.std() < 1e-3
            assert round(float(cell[0])) in (100, 200)
        # with 64 cells both values occur with overwhelming probability
        vals = set(np.round(cells.mean(axis=-1)).astype(int).ravel())
        assert vals == {100, 200}

    def test_checkerboard_alternates(self):
        imgs = np.full((1, 8, 8, 1), 0, np.uint8)
        masks = np.zeros((1, 8, 8, 1), np.float32)
        oi, _ = _run([("BlendAlphaCheckerboard",
                       {"nb_rows": 4, "nb_cols": 4,
                        "foreground": {"Add": 100.0}})], imgs, masks)
        # 2x2-pixel cells alternate 100/0 starting at 100 top-left
        expect = np.zeros((8, 8), np.float32)
        for y in range(8):
            for x in range(8):
                if ((y // 2) + (x // 2)) % 2 == 0:
                    expect[y, x] = 100.0
        np.testing.assert_allclose(oi[0, :, :, 0], expect, atol=1e-3)

    def test_grid_row_range_spec(self):
        imgs = np.full((16, 16, 16, 1), 100, np.uint8)
        masks = np.zeros((16, 16, 16, 1), np.float32)
        oi, _ = _run([("BlendAlphaRegularGrid",
                       {"nb_rows": [2, 4], "nb_cols": [2, 4],
                        "foreground": {"Add": 100.0}})], imgs, masks)
        assert np.isfinite(oi).all()
        assert set(np.round(np.unique(oi)).astype(int)) <= {100, 200}


class TestNoiseBlends:
    def test_simplex_noise_blend_in_envelope(self):
        imgs = np.full((4, 32, 32, 3), 100, np.uint8)
        masks = np.zeros((4, 32, 32, 1), np.float32)
        oi, _ = _run([("BlendAlphaSimplexNoise",
                       {"foreground": {"Add": 100.0}})], imgs, masks)
        assert oi.min() >= 100.0 - 1e-3 and oi.max() <= 200.0 + 1e-3
        # blob masks: spatial variation inside each image
        assert oi.reshape(4, -1).std(axis=1).min() > 1.0
        # different images get different masks
        assert np.abs(oi[0] - oi[1]).max() > 1.0

    def test_frequency_noise_blend_in_envelope(self):
        imgs = np.full((4, 32, 32, 3), 100, np.uint8)
        masks = np.zeros((4, 32, 32, 1), np.float32)
        oi, _ = _run([("BlendAlphaFrequencyNoise",
                       {"exponent": -2.0, "foreground": {"Add": 100.0}})],
                     imgs, masks)
        assert oi.min() >= 100.0 - 1e-3 and oi.max() <= 200.0 + 1e-3
        assert oi.reshape(4, -1).std(axis=1).min() > 1.0

    def test_legacy_alias_names(self):
        imgs, masks = _imgs(2, 32, 32), _masks(2, 32, 32)
        for nm in ("SimplexNoiseAlpha", "FrequencyNoiseAlpha"):
            oi, _ = _run([(nm, {"foreground": {"Invert": 1.0}})], imgs,
                         masks)
            assert np.isfinite(oi).all()
            assert oi.shape == imgs.shape


def test_config_validates_blend_children():
    from segmentation_training_pipeline_tpu.config import (ConfigError,
                                                           parse_dict)

    with pytest.raises(ConfigError, match="unknown augmenter"):
        parse_dict({"augmentation": {
            "BlendAlpha": {"factor": 0.5, "foreground": {"Flipzz": 1.0}}}})
    with pytest.raises(ConfigError, match="foreground"):
        parse_dict({"augmentation": {"BlendAlpha": {"factor": 0.5}}})
    # (BlendAlphaSomeColors lowers since late r5 — probe the mask-object
    # variant, which never can)
    with pytest.raises(ConfigError, match="does not lower"):
        parse_dict({"augmentation": {
            "BlendAlphaMask": {"foreground": {"Invert": 1.0}}}})
    cfg = parse_dict({"augmentation": {
        "BlendAlpha": {"factor": [0.2, 0.8],
                       "foreground": {"Sharpen": {"alpha": 1.0}}},
        "BlendAlphaSimplexNoise": {"foreground": {"EdgeDetect": {"alpha": 1.0}}},
    }})
    assert cfg.augmentation[0]["args"]["foreground"][0]["name"] == "Sharpen"

    # the normalized config round-trips through the lowering
    fn = build_augmentation(cfg.augmentation)
    oi, om = jax.jit(fn)(jax.random.PRNGKey(0),
                         jnp.asarray(_imgs(2, 32, 32)),
                         jnp.asarray(_masks(2, 32, 32)))
    assert np.isfinite(np.asarray(oi)).all()


def test_transforms_block_accepts_blends():
    """Blends are deterministic under transforms: (fixed key)."""
    from segmentation_training_pipeline_tpu.config import parse_dict

    cfg = parse_dict({"transforms": {
        "BlendAlpha": {"factor": 1.0, "foreground": {"Grayscale": 1.0}}}})
    assert cfg.transforms[0]["name"] == "BlendAlpha"
