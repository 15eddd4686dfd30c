"""Aug-kernel oracle tests (SURVEY §4): flips/rot90 exact vs numpy,
affine vs scipy.ndimage.affine_transform, image+mask joint consistency.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from segmentation_training_pipeline_tpu.ops.aug import build_augmentation
from segmentation_training_pipeline_tpu.ops.aug import warp as W


def _imgs(b=2, h=16, w=16, c=3, seed=0):
    r = np.random.RandomState(seed)
    return r.randint(0, 255, (b, h, w, c)).astype(np.uint8)


def _masks(b=2, h=16, w=16, seed=1):
    r = np.random.RandomState(seed)
    m = (r.rand(b, h, w, 1) > 0.6).astype(np.float32)
    return m


def _run(specs, imgs, masks, seed=0):
    fn = build_augmentation(
        [{"name": n, "args": a} for n, a in specs])
    out_i, out_m = jax.jit(fn)(jax.random.PRNGKey(seed),
                               jnp.asarray(imgs), jnp.asarray(masks))
    return np.asarray(out_i), np.asarray(out_m)


class TestFlips:
    def test_fliplr_p1_exact(self):
        imgs, masks = _imgs(), _masks()
        oi, om = _run([("Fliplr", 1.0)], imgs, masks)
        np.testing.assert_allclose(oi, imgs[:, :, ::-1].astype(np.float32),
                                   atol=1e-4)
        np.testing.assert_array_equal(om, masks[:, :, ::-1])

    def test_fliplr_p0_identity(self):
        imgs, masks = _imgs(), _masks()
        oi, om = _run([("Fliplr", 0.0)], imgs, masks)
        np.testing.assert_allclose(oi, imgs.astype(np.float32), atol=1e-4)
        np.testing.assert_array_equal(om, masks)

    def test_flipud_p1_exact(self):
        imgs, masks = _imgs(), _masks()
        oi, om = _run([("Flipud", 1.0)], imgs, masks)
        np.testing.assert_allclose(oi, imgs[:, ::-1].astype(np.float32),
                                   atol=1e-4)
        np.testing.assert_array_equal(om, masks[:, ::-1])

    def test_double_flip_is_identity(self):
        imgs, masks = _imgs()[:1], _masks(1)
        oi, om = _run([("Fliplr", 1.0), ("Fliplr", 1.0)], imgs, masks)
        np.testing.assert_allclose(oi, imgs.astype(np.float32), atol=1e-3)


class TestRot90:
    def test_k_fixed_square_matches_numpy(self):
        imgs, masks = _imgs(1, 16, 16), _masks(1, 16, 16)
        oi, om = _run([("Rot90", 1)], imgs, masks)
        cand = [np.rot90(imgs[0], k, axes=(0, 1)) for k in (1, 3)]
        err = [np.abs(oi[0] - c.astype(np.float32)).max() for c in cand]
        assert min(err) < 1e-3  # matches one rotation direction exactly
        # mask got the same transform as the image
        k_match = (1, 3)[int(np.argmin(err))]
        np.testing.assert_array_equal(om[0], np.rot90(masks[0], k_match,
                                                      axes=(0, 1)))

    def test_k2_is_180(self):
        imgs, masks = _imgs(1), _masks(1)
        oi, om = _run([("Rot90", 2)], imgs, masks)
        np.testing.assert_allclose(oi[0], imgs[0, ::-1, ::-1].astype(np.float32),
                                   atol=1e-3)


class TestAffine:
    def test_identity(self):
        imgs, masks = _imgs(), _masks()
        oi, om = _run([("Affine", {"rotate": 0})], imgs, masks)
        np.testing.assert_allclose(oi, imgs.astype(np.float32), atol=1e-3)

    def test_translate_px_exact(self):
        imgs, masks = _imgs(1), _masks(1)
        oi, om = _run([("Affine", {"translate_px": {"x": 3, "y": 0}})],
                      imgs, masks)
        # forward shift right by 3: out[:, 3:] == in[:, :-3]
        np.testing.assert_allclose(oi[0][:, 3:], imgs[0][:, :-3], atol=1e-3)
        assert np.abs(oi[0][:, :3]).max() < 1e-3  # filled with 0

    def test_rotation_vs_scipy(self):
        from scipy.ndimage import affine_transform

        h = w = 32
        img = np.random.RandomState(3).rand(h, w).astype(np.float32) * 255
        theta = np.deg2rad(23.0)
        img = np.round(img)  # keep uint8 cast lossless vs the scipy oracle
        # exact single-pass footprint gather (the elastic-path sampler);
        # the multipass fast path is convention-checked in test_fast_warp
        mats = W.rotation_about((w - 1) / 2.0, (h - 1) / 2.0,
                                jnp.full((1,), theta, jnp.float32))
        oi, _ = W.warp_joint(
            jnp.asarray(img[None, :, :, None]),
            jnp.zeros((1, h, w, 1), jnp.float32), mats)
        oi = np.asarray(oi)
        # scipy: src = M @ dst + offset (same inverse-mapping convention)
        c, s = np.cos(theta), np.sin(theta)
        cx = cy = (w - 1) / 2.0
        M = np.array([[c, s], [-s, c]])  # rows are (y, x)? build in xy then swap
        # our matrix in (x, y): [[c, s],[ -s, c]] with offset
        A = np.array([[c, s], [-s, c]])
        off = np.array([cx - c * cx - s * cy, cy + s * cx - c * cy])
        # scipy works in (row=y, col=x) order: permute
        A_rc = np.array([[A[1, 1], A[1, 0]], [A[0, 1], A[0, 0]]])
        off_rc = np.array([off[1], off[0]])
        ref = affine_transform(np.round(img).astype(np.float32), A_rc,
                               offset=off_rc, order=1, mode="constant")
        interior = (slice(8, 24), slice(8, 24))
        assert np.abs(oi[0, :, :, 0][interior] - ref[interior]).max() < 1.0

    def test_scale_zoom_in_keeps_center(self):
        imgs = np.zeros((1, 32, 32, 3), np.uint8)
        imgs[0, 12:20, 12:20] = 200
        masks = np.zeros((1, 32, 32, 1), np.float32)
        masks[0, 12:20, 12:20] = 1
        oi, om = _run([("Affine", {"scale": 2.0})], imgs, masks)
        assert om[0, 16, 16, 0] == 1.0  # center stays inside
        assert om.sum() > masks.sum() * 2  # area grew ~4x


class TestElastic:
    def test_alpha0_identity(self):
        imgs, masks = _imgs(1), _masks(1)
        oi, om = _run([("ElasticTransformation", {"alpha": 0.0, "sigma": 3.0})],
                      imgs, masks)
        np.testing.assert_allclose(oi[0], imgs[0].astype(np.float32), atol=1e-2)

    def test_deforms_but_preserves_mask_values(self):
        imgs, masks = _imgs(2, 32, 32), _masks(2, 32, 32)
        oi, om = _run([("ElasticTransformation", {"alpha": [8, 10], "sigma": 4.0})],
                      imgs, masks)
        assert set(np.unique(om)) <= {0.0, 1.0}  # nearest keeps labels crisp
        assert np.abs(oi - imgs.astype(np.float32)).mean() > 1.0  # moved


class TestPhotometric:
    def test_multiply_exact(self):
        imgs, masks = _imgs(), _masks()
        oi, om = _run([("Multiply", [2.0, 2.0])], imgs, masks)
        np.testing.assert_allclose(
            oi, np.clip(imgs.astype(np.float32) * 2, 0, 255), atol=1e-3)
        np.testing.assert_array_equal(om, masks)  # mask untouched

    def test_add_and_contrast(self):
        imgs, masks = _imgs(), _masks()
        oi, _ = _run([("Add", [10.0, 10.0])], imgs, masks)
        np.testing.assert_allclose(
            oi, np.clip(imgs.astype(np.float32) + 10, 0, 255), atol=1e-3)
        oi, _ = _run([("LinearContrast", [1.5, 1.5])], imgs, masks)
        want = np.clip(127 + 1.5 * (imgs.astype(np.float32) - 127), 0, 255)
        np.testing.assert_allclose(oi, want, atol=1e-3)

    def test_noise_changes_image_not_mask(self):
        imgs, masks = _imgs(), _masks()
        oi, om = _run([("AdditiveGaussianNoise", {"scale": [10, 10]})],
                      imgs, masks)
        assert np.abs(oi - imgs.astype(np.float32)).mean() > 1.0
        np.testing.assert_array_equal(om, masks)

    def test_blur_reduces_variance(self):
        imgs, masks = _imgs(1, 32, 32), _masks(1, 32, 32)
        oi, _ = _run([("GaussianBlur", {"sigma": [2.0, 2.0]})], imgs, masks)
        assert oi.std() < imgs.astype(np.float32).std()

    def test_coarse_dropout_zeroes_blocks(self):
        imgs = np.full((1, 32, 32, 3), 200, np.uint8)
        oi, _ = _run([("CoarseDropout", {"p": 0.5, "size_percent": 0.25})],
                     imgs, _masks(1, 32, 32))
        frac = (oi == 0).mean()
        assert 0.1 < frac < 0.9

    def test_grayscale_full(self):
        imgs, masks = _imgs(), _masks()
        oi, _ = _run([("Grayscale", 1.0)], imgs, masks)
        assert np.abs(oi[..., 0] - oi[..., 1]).max() < 1e-2


class TestPipelineProperties:
    def test_deterministic_per_key(self):
        imgs, masks = _imgs(), _masks()
        specs = [("Fliplr", 0.5), ("Affine", {"rotate": [-15, 15]}),
                 ("Multiply", [0.8, 1.2])]
        a_i, a_m = _run(specs, imgs, masks, seed=7)
        b_i, b_m = _run(specs, imgs, masks, seed=7)
        np.testing.assert_array_equal(a_i, b_i)
        c_i, _ = _run(specs, imgs, masks, seed=8)
        assert np.abs(a_i - c_i).max() > 1.0

    def test_full_block_composes(self):
        imgs, masks = _imgs(4, 32, 32), _masks(4, 32, 32)
        specs = [("Fliplr", 0.5), ("Flipud", 0.5),
                 ("Affine", {"rotate": [-10, 10], "scale": [0.9, 1.1],
                             "translate_percent": {"x": [-0.1, 0.1]}}),
                 ("ElasticTransformation", {"alpha": [0, 5], "sigma": 3.0}),
                 ("Multiply", [0.9, 1.1]), ("GaussianBlur", {"sigma": [0, 1]})]
        oi, om = _run(specs, imgs, masks)
        assert oi.shape == (4, 32, 32, 3) and om.shape == (4, 32, 32, 1)
        assert np.isfinite(oi).all()
        assert set(np.unique(om)) <= {0.0, 1.0}

    def test_unknown_augmenter_raises(self):
        # a name that bypassed config validation (lowering is driven
        # directly here) must still fail loudly, not silently no-op
        with pytest.raises(KeyError, match="lowering"):
            _run([("Frobnicate", 0.5)], _imgs(), _masks())


class TestNewPhotometric:
    def test_invert_p1(self):
        imgs, masks = _imgs(2, 16, 16), _masks(2, 16, 16)
        oi, om = _run([("Invert", 1.0)], imgs, masks)
        np.testing.assert_allclose(oi, 255.0 - imgs.astype(np.float32),
                                   atol=1e-4)
        np.testing.assert_array_equal(om, masks)

    def test_solarize_threshold0_inverts_all(self):
        # r5: bare scalar is imgaug's p (probability); threshold via dict
        imgs, masks = _imgs(1, 16, 16), _masks(1, 16, 16)
        oi, _ = _run([("Solarize", {"p": 1.0, "threshold": 0.0})],
                     imgs, masks)
        np.testing.assert_allclose(oi, 255.0 - imgs.astype(np.float32),
                                   atol=1e-4)

    def test_dropout_p1_zeros(self):
        imgs, masks = _imgs(1, 16, 16), _masks(1, 16, 16)
        oi, _ = _run([("Dropout", 1.0)], imgs, masks)
        assert np.abs(oi).max() == 0.0

    def test_salt_and_pepper_extremes_only(self):
        imgs = np.full((1, 16, 16, 3), 100, np.uint8)
        oi, _ = _run([("SaltAndPepper", 1.0)], imgs, _masks(1, 16, 16))
        assert set(np.unique(oi)) <= {0.0, 255.0}

    def test_sharpen_alpha0_identity(self):
        imgs, masks = _imgs(1, 16, 16), _masks(1, 16, 16)
        oi, _ = _run([("Sharpen", {"alpha": 0.0})], imgs, masks)
        np.testing.assert_allclose(oi, imgs.astype(np.float32), atol=1e-3)

    def test_sharpen_emboss_change_pixels(self):
        imgs, masks = _imgs(1, 16, 16), _masks(1, 16, 16)
        for spec in [("Sharpen", {"alpha": 1.0}),
                     ("Emboss", {"alpha": 1.0, "strength": 1.0})]:
            oi, om = _run([spec], imgs, masks)
            assert np.abs(oi - imgs.astype(np.float32)).mean() > 0.5
            np.testing.assert_array_equal(om, masks)  # masks untouched


class TestContrastOps:
    """GammaContrast / SigmoidContrast / LogContrast vs the imgaug
    formulas (deterministic params → closed-form numpy oracle)."""

    def test_gamma(self):
        imgs, masks = _imgs(), _masks()
        oi, _ = _run([("GammaContrast", 2.0)], imgs, masks)
        ref = ((imgs.astype(np.float32) / 255.0) ** 2.0) * 255.0
        np.testing.assert_allclose(oi, np.clip(ref, 0, 255), atol=1e-2)

    def test_sigmoid(self):
        imgs, masks = _imgs(), _masks()
        oi, _ = _run([("SigmoidContrast", {"gain": 8.0, "cutoff": 0.4})],
                     imgs, masks)
        x = imgs.astype(np.float32) / 255.0
        ref = 255.0 / (1.0 + np.exp(8.0 * (0.4 - x)))
        np.testing.assert_allclose(oi, np.clip(ref, 0, 255), atol=1e-2)

    def test_log(self):
        imgs, masks = _imgs(), _masks()
        oi, _ = _run([("LogContrast", 0.8)], imgs, masks)
        ref = 255.0 * 0.8 * np.log2(1.0 + imgs.astype(np.float32) / 255.0)
        np.testing.assert_allclose(oi, np.clip(ref, 0, 255), atol=1e-2)


class TestCropAndPad:
    def test_negative_percent_equals_crop(self):
        """CropAndPad(percent=-c) ≡ Crop(percent=c) (deterministic c)."""
        imgs, masks = _imgs(h=32, w=32), _masks(h=32, w=32)
        ci, cm = _run([("Crop", {"percent": 0.1})], imgs, masks)
        pi, pm = _run([("CropAndPad", {"percent": -0.1})], imgs, masks)
        np.testing.assert_allclose(pi, ci, atol=1e-3)
        np.testing.assert_array_equal(pm, cm)

    def test_pad_shrinks_content_with_fill_border(self):
        """Pad(percent=p, keep_size) squeezes the frame into the center;
        the border is warp fill (0)."""
        imgs = np.full((1, 32, 32, 3), 200, np.uint8)
        masks = np.ones((1, 32, 32, 1), np.float32)
        oi, om = _run([("Pad", {"percent": 0.25})], imgs, masks)
        # src = 1.5·x − 8: the dst frame maps to src [−8, 39] → content
        # occupies dst x ∈ [6, 26]-ish; corners are fill
        assert oi[0, 0, 0, 0] == 0.0 and oi[0, -1, -1, 0] == 0.0
        assert om[0, 0, 0, 0] == 0.0
        assert abs(oi[0, 16, 16, 0] - 200.0) < 1.0
        assert om[0, 16, 16, 0] == 1.0
        frac = om.mean()
        assert 0.35 < frac < 0.55  # (1/1.5)² ≈ 0.44 of the frame

    def test_pad_never_crops(self):
        """Pad clamps negative samples to 0 — content never zooms in."""
        imgs, masks = _imgs(h=32, w=32), _masks(h=32, w=32)
        oi, om = _run([("Pad", {"percent": [-0.2, 0.0]})], imgs, masks)
        np.testing.assert_allclose(oi, imgs.astype(np.float32), atol=1e-3)

    def test_scalar_and_list_percent_forms(self):
        """`Crop: 0.1` and `Crop: [0, 0.1]` (bare scalar/range) are valid
        imgaug spellings — regression for the dict-only percent parsing."""
        imgs, masks = _imgs(h=32, w=32), _masks(h=32, w=32)
        for name, args in [("Crop", 0.1), ("CropAndPad", 0.1),
                           ("Pad", [0.0, 0.1]), ("Crop", [0.0, 0.1])]:
            oi, om = _run([(name, args)], imgs, masks)
            assert oi.shape == imgs.shape and om.shape == masks.shape


class TestAnisotropicScalePadding:
    def test_aniso_scale_rotation_content_preserved(self):
        """s1 = tan(rot)*(sy/sx): anisotropic scale dicts MULTIPLY the
        shear, so the spec-derived canvas pad must include the anisotropy
        bound — regression for silent edge-content loss (code review)."""
        from segmentation_training_pipeline_tpu.ops.aug import (
            fast_warp as FW)

        r = np.random.RandomState(0)
        imgs = r.randint(0, 255, (4, 128, 128, 3), np.uint8)
        masks = (r.rand(4, 128, 128, 1) > 0.5).astype(np.float32)
        spec = [{"name": "Affine",
                 "args": {"rotate": [-20, 20],
                          "scale": {"x": [0.7, 1.3], "y": [0.7, 1.3]}}}]
        fn = build_augmentation([dict(s) for s in spec])
        oi, om = jax.jit(fn)(jax.random.PRNGKey(3), jnp.asarray(imgs),
                             jnp.asarray(masks))

        # lossless reference: force a full-dim pad through the same path
        orig = FW.warp_joint_multipass

        def padded(*a, **kw):
            kw["pad_frac"] = 1.0
            return orig(*a, **kw)

        FW.warp_joint_multipass = padded
        try:
            fn2 = build_augmentation([dict(s) for s in spec])
            ri, rm = jax.jit(fn2)(jax.random.PRNGKey(3), jnp.asarray(imgs),
                                  jnp.asarray(masks))
        finally:
            FW.warp_joint_multipass = orig
        d = np.abs(np.asarray(oi) - np.asarray(ri))
        assert (d > 1.0).sum() == 0, f"{(d > 1.0).sum()} px clipped to fill"
        assert np.mean(np.asarray(om) != np.asarray(rm)) == 0.0


class TestBlurAndPoisson:
    def test_average_blur_k3_matches_numpy_box(self):
        imgs, masks = _imgs(h=16, w=16), _masks(h=16, w=16)
        oi, _ = _run([("AverageBlur", 3)], imgs, masks)
        x = imgs.astype(np.float32)
        padded = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        ref = np.zeros_like(x)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                ref += padded[:, 1 + dy:17 + dy, 1 + dx:17 + dx, :]
        ref /= 9.0
        np.testing.assert_allclose(oi, np.clip(ref, 0, 255), atol=1e-2)

    def test_average_blur_k1_identity(self):
        imgs, masks = _imgs(), _masks()
        oi, _ = _run([("AverageBlur", 1)], imgs, masks)
        np.testing.assert_allclose(oi, imgs.astype(np.float32), atol=1e-3)

    def test_poisson_noise_statistics(self):
        imgs = np.full((2, 64, 64, 3), 50, np.uint8)
        masks = _masks(h=64, w=64)
        oi, om = _run([("AdditivePoissonNoise", 8.0)], imgs, masks)
        delta = oi - 50.0
        assert delta.min() >= 0.0          # Poisson adds, never subtracts
        assert abs(delta.mean() - 8.0) < 0.5   # E[Poisson(8)] = 8
        np.testing.assert_array_equal(om, masks)

    def test_single_axis_scale_dict_includes_implicit_one(self):
        """scale: {x: [0.55, 0.8]} — the missing y defaults to 1.0 at
        runtime, so the anisotropy bound must span [0.55, 1.0]."""
        from segmentation_training_pipeline_tpu.ops.aug import (
            fast_warp as FW)

        r = np.random.RandomState(2)
        imgs = r.randint(0, 255, (4, 128, 128, 3), np.uint8)
        masks = (r.rand(4, 128, 128, 1) > 0.5).astype(np.float32)
        spec = [{"name": "Affine",
                 "args": {"rotate": [-25, 25], "scale": {"x": [0.55, 0.8]}}}]
        fn = build_augmentation([dict(s) for s in spec])
        oi, om = jax.jit(fn)(jax.random.PRNGKey(5), jnp.asarray(imgs),
                             jnp.asarray(masks))
        orig = FW.warp_joint_multipass

        def padded(*a, **kw):
            kw["pad_frac"] = 1.0
            return orig(*a, **kw)

        FW.warp_joint_multipass = padded
        try:
            fn2 = build_augmentation([dict(s) for s in spec])
            ri, rm = jax.jit(fn2)(jax.random.PRNGKey(5), jnp.asarray(imgs),
                                  jnp.asarray(masks))
        finally:
            FW.warp_joint_multipass = orig
        d = np.abs(np.asarray(oi) - np.asarray(ri))
        assert (d > 1.0).sum() == 0, f"{(d > 1.0).sum()} px clipped"
        assert np.mean(np.asarray(om) != np.asarray(rm)) == 0.0

    def test_stacked_affine_rotations_sum(self):
        """Two Affine(rotate ±25) ops can compose to 50° — the pad bound
        must sum rotations, not take the max."""
        from segmentation_training_pipeline_tpu.ops.aug import (
            fast_warp as FW)

        r = np.random.RandomState(6)
        imgs = r.randint(0, 255, (4, 128, 128, 3), np.uint8)
        masks = (r.rand(4, 128, 128, 1) > 0.5).astype(np.float32)
        spec = [{"name": "Affine", "args": {"rotate": [24.0, 25.0]}},
                {"name": "Affine", "args": {"rotate": [24.0, 25.0]}}]
        fn = build_augmentation([dict(s) for s in spec])
        oi, om = jax.jit(fn)(jax.random.PRNGKey(7), jnp.asarray(imgs),
                             jnp.asarray(masks))
        orig = FW.warp_joint_multipass

        def padded(*a, **kw):
            kw["pad_frac"] = 1.0
            return orig(*a, **kw)

        FW.warp_joint_multipass = padded
        try:
            fn2 = build_augmentation([dict(s) for s in spec])
            ri, rm = jax.jit(fn2)(jax.random.PRNGKey(7), jnp.asarray(imgs),
                                  jnp.asarray(masks))
        finally:
            FW.warp_joint_multipass = orig
        d = np.abs(np.asarray(oi) - np.asarray(ri))
        assert (d > 1.0).sum() == 0, f"{(d > 1.0).sum()} px clipped"


class TestBatch3Augmenters:
    """Round-3 surface batch (VERDICT r2 item 7): Rotate sugar, Resize,
    MotionBlur, MedianBlur, HistogramEqualization."""

    def test_rotate_is_affine_rotate_sugar(self):
        imgs, masks = _imgs(h=17, w=17), _masks(h=17, w=17)
        a, am = _run([("Rotate", [10, 10])], imgs, masks, seed=5)
        b, bm = _run([("Affine", {"rotate": [10, 10]})], imgs, masks, seed=5)
        np.testing.assert_allclose(a, b, atol=1e-4)
        np.testing.assert_array_equal(am, bm)
        # and it actually rotates
        assert np.abs(a - imgs.astype(np.float32)).mean() > 1.0

    def test_motionblur_angle0_blurs_vertically_only(self):
        # image varying only along y: vertical blur mixes rows -> changes;
        # image varying only along x: vertical blur is identity
        b, h, w = 2, 16, 16
        along_x = np.tile(np.linspace(0, 255, w,
                                      dtype=np.float32)[None, None, :, None],
                          (b, h, 1, 3)).astype(np.uint8)
        oi, _ = _run([("MotionBlur", {"k": 5, "angle": 0})],
                     along_x, _masks(b, h, w))
        inner = slice(3, -3)
        np.testing.assert_allclose(oi[:, inner, inner],
                                   along_x[:, inner, inner].astype(np.float32),
                                   atol=0.51)

    def test_motionblur_angle90_matches_horizontal_box(self):
        imgs = _imgs(b=1, h=16, w=16, c=1, seed=3)
        oi, _ = _run([("MotionBlur", {"k": 3, "angle": 90})],
                     imgs, _masks(1, 16, 16))
        f = imgs[0, :, :, 0].astype(np.float64)
        want = (np.pad(f, ((0, 0), (1, 1)), mode="reflect")[:, :-2]
                + f + np.pad(f, ((0, 0), (1, 1)), mode="reflect")[:, 2:]) / 3.0
        np.testing.assert_allclose(oi[0, :, :, 0], want, atol=0.6)

    def test_medianblur_matches_scipy(self):
        from scipy.ndimage import median_filter

        imgs = _imgs(b=2, h=12, w=12, seed=7)
        oi, om = _run([("MedianBlur", 3)], imgs, _masks(2, 12, 12))
        for bi in range(2):
            for c in range(3):
                want = median_filter(imgs[bi, :, :, c].astype(np.float32),
                                     size=3, mode="nearest")
                np.testing.assert_allclose(oi[bi, :, :, c], want, atol=1e-4)
        np.testing.assert_array_equal(om, _masks(2, 12, 12))

    def test_medianblur_rejects_range(self):
        with pytest.raises(ValueError, match="static ODD integer"):
            _run([("MedianBlur", [3, 5])], _imgs(), _masks())

    def test_histogram_equalization_matches_cv2(self):
        import cv2

        imgs = _imgs(b=2, h=16, w=16, seed=9)
        oi, _ = _run([("HistogramEqualization", None)],
                     imgs, _masks(2, 16, 16))
        for bi in range(2):
            for c in range(3):
                want = cv2.equalizeHist(imgs[bi, :, :, c]).astype(np.float32)
                np.testing.assert_allclose(oi[bi, :, :, c], want, atol=1.0)

    def test_resize_halves_then_restores_shape(self):
        imgs, masks = _imgs(b=2, h=16, w=16), _masks(2, 16, 16)
        oi, om = _run([("Resize", 0.5)], imgs, masks)
        assert oi.shape == imgs.shape and om.shape == masks.shape
        # detail is lost (low-pass) but the mean is preserved
        assert abs(oi.mean() - imgs.astype(np.float32).mean()) < 4.0
        assert set(np.unique(om)) <= {0.0, 1.0}  # mask stays binary

    def test_resize_rejects_range(self):
        with pytest.raises(ValueError, match="static scalar"):
            _run([("Resize", [0.5, 1.0])], _imgs(), _masks())


class TestBatch4Augmenters:
    """Round-3 surface batch 4 (VERDICT r2 'missing' 6 leftovers): CLAHE,
    JpegCompression, Posterize, ChannelShuffle."""

    def test_clahe_matches_cv2_exactly(self):
        import cv2

        r = np.random.RandomState(0)
        yy, xx = np.mgrid[0:64, 0:64]
        img = np.clip(r.randint(0, 255, (64, 64)) * 0.5 + yy + xx,
                      0, 255).astype(np.uint8)
        for cl, grid in [(2.0, 2), (4.0, 8), (40.0, 8)]:
            want = cv2.createCLAHE(clipLimit=cl,
                                   tileGridSize=(grid, grid)).apply(img)
            oi, _ = _run([("CLAHE", {"clip_limit": [cl, cl],
                                     "tile_grid_size": grid})],
                         np.tile(img[None, :, :, None], (1, 1, 1, 3)),
                         _masks(1, 64, 64))
            for c in range(3):
                np.testing.assert_allclose(oi[0, :, :, c],
                                           want.astype(np.float32), atol=0.0)

    def test_clahe_nondivisible_shape_pads_like_cv2(self):
        import cv2

        img = np.random.RandomState(3).randint(0, 255, (50, 46), np.uint8)
        want = cv2.createCLAHE(clipLimit=3.0,
                               tileGridSize=(8, 8)).apply(img)
        oi, _ = _run([("CLAHE", {"clip_limit": [3.0, 3.0]})],
                     img[None, :, :, None], _masks(1, 50, 46))
        d = np.abs(oi[0, :, :, 0] - want.astype(np.float32))
        assert d.mean() < 0.1 and d.max() <= 1.0  # cv2 partial-tile edge

    def test_clahe_mask_untouched(self):
        masks = _masks(2, 32, 32)
        _, om = _run([("CLAHE", None)], _imgs(2, 32, 32), masks)
        np.testing.assert_array_equal(om, masks)

    def test_jpeg_matches_cv2_roundtrip(self):
        import cv2

        r = np.random.RandomState(0)
        yy, xx = np.mgrid[0:64, 0:64]
        rgb = np.clip(r.randint(0, 255, (64, 64, 3)).astype(np.float32) * 0.3
                      + np.stack([yy * 2, xx * 2, yy + xx], -1),
                      0, 255).astype(np.uint8)
        for q in (30, 80):
            ok, enc = cv2.imencode(".jpg", rgb[:, :, ::-1],
                                   [cv2.IMWRITE_JPEG_QUALITY, q])
            assert ok
            want = cv2.imdecode(enc, cv2.IMREAD_COLOR)[:, :, ::-1]
            oi, _ = _run([("JpegCompression",
                           {"compression": [100 - q, 100 - q]})],
                         rgb[None], _masks(1, 64, 64))
            d = np.abs(oi[0] - want.astype(np.float32))
            d_codec = np.abs(rgb.astype(np.float32) - want)
            # the simulation tracks the real codec ~10x closer than the
            # codec distortion itself (measured ~1-2 vs ~16-18 gray levels)
            assert d.mean() < 3.0, f"q={q}: {d.mean()}"
            assert d.mean() < 0.25 * d_codec.mean()

    def test_jpeg_quality_orders_distortion(self):
        # structured content (iid noise saturates distortion even at q95)
        yy, xx = np.mgrid[0:32, 0:32]
        rgb = np.clip(np.stack([yy * 4, xx * 4, yy + xx], -1) +
                      np.random.RandomState(5).randint(0, 40, (32, 32, 3)),
                      0, 255).astype(np.uint8)[None]
        lo, _ = _run([("JpegCompression", {"compression": [90, 90]})],
                     rgb, _masks(1, 32, 32))
        hi, _ = _run([("JpegCompression", {"compression": [5, 5]})],
                     rgb, _masks(1, 32, 32))
        f = rgb.astype(np.float32)
        assert np.abs(lo - f).mean() > np.abs(hi - f).mean() * 1.5

    def test_posterize_matches_bitmask(self):
        imgs = _imgs(2, 16, 16)
        oi, _ = _run([("Posterize", {"nb_bits": [3, 3]})],
                     imgs, _masks(2, 16, 16))
        want = ((imgs >> 5) << 5).astype(np.float32)
        np.testing.assert_allclose(oi, want, atol=1e-4)

    def test_channel_shuffle_permutes(self):
        b, h, w = 4, 8, 8
        imgs = np.zeros((b, h, w, 3), np.uint8)
        imgs[..., 0], imgs[..., 1], imgs[..., 2] = 10, 20, 30
        oi, _ = _run([("ChannelShuffle", 1.0)], imgs, _masks(b, h, w),
                     seed=2)
        for bi in range(b):
            vals = sorted(oi[bi, 0, 0].tolist())
            assert vals == [10.0, 20.0, 30.0]
            # every pixel in an image uses the SAME permutation
            assert (oi[bi] == oi[bi, 0, 0][None, None, :]).all()

    def test_channel_shuffle_p0_identity(self):
        imgs = _imgs(2, 8, 8)
        oi, _ = _run([("ChannelShuffle", 0.0)], imgs, _masks(2, 8, 8))
        np.testing.assert_allclose(oi, imgs.astype(np.float32), atol=1e-4)


class TestBatch5Augmenters:
    """Round-3 surface batch 5: imgaug-0.4 Affine sugar (TranslateX/Y,
    ScaleX/Y, ShearX/Y), *Elementwise ops, Autocontrast."""

    @pytest.mark.parametrize("sugar,affine_args", [
        (("TranslateX", [0.2, 0.2]),
         {"translate_percent": {"x": [0.2, 0.2]}}),
        (("TranslateY", {"px": [3, 3]}), {"translate_px": {"y": [3, 3]}}),
        (("ScaleX", [1.3, 1.3]), {"scale": {"x": [1.3, 1.3]}}),
        (("ScaleY", [0.7, 0.7]), {"scale": {"y": [0.7, 0.7]}}),
        (("ShearX", [15, 15]), {"shear": {"x": [15, 15], "y": 0}}),
        (("ShearY", [15, 15]), {"shear": {"x": 0, "y": [15, 15]}}),
    ])
    def test_sugar_matches_affine(self, sugar, affine_args):
        imgs, masks = _imgs(h=17, w=17), _masks(h=17, w=17)
        a, am = _run([sugar], imgs, masks, seed=9)
        b, bm = _run([("Affine", affine_args)], imgs, masks, seed=9)
        np.testing.assert_allclose(a, b, atol=1e-4)
        np.testing.assert_array_equal(am, bm)
        # and it actually does something
        assert np.abs(a - imgs.astype(np.float32)).mean() > 0.5

    def test_add_elementwise_constant_and_range(self):
        imgs = np.full((1, 8, 8, 3), 100, np.uint8)
        oi, _ = _run([("AddElementwise", 50)], imgs, _masks(1, 8, 8))
        np.testing.assert_allclose(oi, 150.0, atol=1e-4)
        oi, _ = _run([("AddElementwise", [10, 30])], imgs, _masks(1, 8, 8))
        d = oi - 100.0
        assert d.min() >= 10.0 - 1e-4 and d.max() <= 30.0 + 1e-4
        assert d.std() > 1.0  # per-pixel, not per-image
        # all channels move together (imgaug per_channel=False default)
        np.testing.assert_allclose(d[..., 0], d[..., 1], atol=1e-5)

    def test_multiply_elementwise_per_channel(self):
        imgs = np.full((1, 8, 8, 3), 100, np.uint8)
        oi, _ = _run([("MultiplyElementwise",
                       {"mul": [0.5, 1.5], "per_channel": True})],
                     imgs, _masks(1, 8, 8))
        d = oi / 100.0
        assert d.min() >= 0.5 - 1e-4 and d.max() <= 1.5 + 1e-4
        # per-channel: channels differ
        assert np.abs(d[..., 0] - d[..., 1]).max() > 0.01

    def test_autocontrast_stretches_to_full_range(self):
        r = np.random.RandomState(0)
        imgs = r.randint(50, 101, (2, 16, 16, 3)).astype(np.uint8)
        oi, _ = _run([("Autocontrast", None)], imgs, _masks(2, 16, 16))
        f = imgs.astype(np.float64)
        for bi in range(2):
            for c in range(3):
                lo, hi = f[bi, :, :, c].min(), f[bi, :, :, c].max()
                want = np.clip((f[bi, :, :, c] - lo) * 255.0 / (hi - lo),
                               0, 255)
                np.testing.assert_allclose(oi[bi, :, :, c], want, atol=0.01)

    def test_autocontrast_flat_channel_passthrough(self):
        imgs = np.full((1, 8, 8, 3), 77, np.uint8)
        oi, _ = _run([("Autocontrast", None)], imgs, _masks(1, 8, 8))
        np.testing.assert_allclose(oi, 77.0, atol=1e-4)


class TestBatch6Augmenters:
    """Round-3 surface batch 6: weather layers (procedural
    approximations), color temperature, uniform quantization."""

    def test_clouds_brighten_image_not_mask(self):
        imgs = np.full((2, 32, 32, 3), 60, np.uint8)
        masks = _masks(2, 32, 32)
        oi, om = _run([("Clouds", {"coverage": [0.6, 0.6]})], imgs, masks)
        assert oi.mean() > 62.0          # white overlay raises the mean
        assert oi.max() > 100.0
        np.testing.assert_array_equal(om, masks)

    def test_fog_density_monotonic(self):
        imgs = np.full((1, 32, 32, 3), 60, np.uint8)
        lo, _ = _run([("Fog", {"density": [0.1, 0.1]})], imgs,
                     _masks(1, 32, 32))
        hi, _ = _run([("Fog", {"density": [0.6, 0.6]})], imgs,
                     _masks(1, 32, 32))
        assert hi.mean() > lo.mean() > 60.0

    def test_snowflakes_add_bright_specks(self):
        imgs = np.full((1, 64, 64, 3), 30, np.uint8)
        oi, _ = _run([("Snowflakes", {"density": [0.02, 0.02],
                                      "speed": [0.02, 0.02]})],
                     imgs, _masks(1, 64, 64))
        assert oi.max() > 200.0          # bright streaks appear
        assert (oi >= 30.0 - 1e-4).all()  # screen blend never darkens

    def test_rain_streaks_and_darkening(self):
        imgs = np.full((1, 64, 64, 3), 120, np.uint8)
        oi, _ = _run([("Rain", {"density": [0.03, 0.03],
                                "speed": [0.08, 0.08]})],
                     imgs, _masks(1, 64, 64))
        assert oi.max() > 180.0          # streaks
        assert oi.min() < 120.0          # background darkened

    def test_color_temperature_warm_vs_cool(self):
        imgs = np.full((1, 8, 8, 3), 128, np.uint8)
        warm, _ = _run([("ChangeColorTemperature",
                         {"kelvin": [2000, 2000]})], imgs, _masks(1, 8, 8))
        cool, _ = _run([("ChangeColorTemperature",
                         {"kelvin": [20000, 20000]})], imgs, _masks(1, 8, 8))
        # warm light keeps red, kills blue; cool light the reverse
        assert warm[0, 0, 0, 0] > warm[0, 0, 0, 2] + 30
        assert cool[0, 0, 0, 2] > cool[0, 0, 0, 0] + 10
        # 6600K is near-neutral
        neutral, _ = _run([("ChangeColorTemperature",
                            {"kelvin": [6600, 6600]})], imgs,
                          _masks(1, 8, 8))
        np.testing.assert_allclose(neutral, 128.0, atol=6.0)

    def test_uniform_quantization_levels(self):
        imgs = _imgs(1, 16, 16)
        oi, _ = _run([("UniformColorQuantization",
                       {"n_colors": [4, 4]})], imgs, _masks(1, 16, 16))
        levels = np.unique(oi)
        assert len(levels) <= 4
        np.testing.assert_allclose(
            sorted(set(levels) - {32.0, 96.0, 160.0, 224.0}), [])


def test_rotate_dict_kwarg_form():
    """r3 review: `Rotate: {rotate: [...]}` double-wrapped into
    {'rotate': {'rotate': ...}} and crashed at build time."""
    imgs, masks = _imgs(h=17, w=17), _masks(h=17, w=17)
    a, _ = _run([("Rotate", {"rotate": [10, 10]})], imgs, masks, seed=5)
    b, _ = _run([("Affine", {"rotate": [10, 10]})], imgs, masks, seed=5)
    np.testing.assert_allclose(a, b, atol=1e-4)


class TestReviewFixesR3b:
    def test_resize_int_is_absolute_pixels(self):
        # imgaug semantics: `Resize: 8` on 16² == resize to 8px == factor 0.5
        imgs, masks = _imgs(2, 16, 16), _masks(2, 16, 16)
        a, am = _run([("Resize", 8)], imgs, masks)
        b, bm = _run([("Resize", 0.5)], imgs, masks)
        np.testing.assert_allclose(a, b, atol=1e-4)
        np.testing.assert_array_equal(am, bm)

    def test_medianblur_even_k_rejected(self):
        with pytest.raises(ValueError, match="ODD"):
            _run([("MedianBlur", 4)], _imgs(), _masks())

    def test_medianblur_bare_defaults_to_3(self):
        a, _ = _run([("MedianBlur", None)], _imgs(2, 12, 12),
                    _masks(2, 12, 12))
        b, _ = _run([("MedianBlur", 3)], _imgs(2, 12, 12),
                    _masks(2, 12, 12))
        np.testing.assert_allclose(a, b, atol=1e-4)


@pytest.mark.parametrize("bad", [0, -5, True, 2.5])
def test_medianblur_invalid_k_rejected(bad):
    with pytest.raises(ValueError, match="ODD integer"):
        _run([("MedianBlur", bad)], _imgs(), _masks())


def test_resize_nonpositive_rejected():
    with pytest.raises(ValueError, match="> 0|absolute"):
        _run([("Resize", 0.0)], _imgs(), _masks())
    with pytest.raises(ValueError, match="absolute"):
        _run([("Resize", 0)], _imgs(), _masks())


class TestBreadthNoisePooling:
    """Round-4 breadth batch (VERDICT r3 item 9): Salt / Pepper /
    ImpulseNoise / Coarse* variants, AdditiveLaplaceNoise, EdgeDetect,
    keep-size pooling.  Oracles: closed-form numpy / scipy.ndimage."""

    def test_salt_p1_all_bright(self):
        imgs = np.full((2, 16, 16, 3), 100, np.uint8)
        oi, om = _run([("Salt", 1.0)], imgs, _masks(2, 16, 16))
        assert np.all(oi == 255.0)
        np.testing.assert_array_equal(om, _masks(2, 16, 16))

    def test_pepper_p1_all_dark(self):
        imgs = np.full((1, 16, 16, 3), 100, np.uint8)
        oi, _ = _run([("Pepper", 1.0)], imgs, _masks(1, 16, 16))
        assert np.all(oi == 0.0)

    def test_salt_p0_identity(self):
        imgs = _imgs(1, 16, 16)
        oi, _ = _run([("Salt", 0.0)], imgs, _masks(1, 16, 16))
        np.testing.assert_allclose(oi, imgs.astype(np.float32), atol=1e-4)

    def test_impulse_noise_is_per_channel(self):
        # ImpulseNoise == SaltAndPepper(per_channel=True): with p=1 every
        # CHANNEL flips to 0/255 independently -> colored speckles, i.e.
        # some pixels whose channels disagree.
        imgs = np.full((1, 32, 32, 3), 100, np.uint8)
        oi, _ = _run([("ImpulseNoise", 1.0)], imgs, _masks(1, 32, 32))
        assert set(np.unique(oi)) <= {0.0, 255.0}
        per_pixel_spread = oi.max(axis=-1) - oi.min(axis=-1)
        assert (per_pixel_spread > 0).any()

    def test_coarse_salt_blocks(self):
        # size_percent=0.25 on 16x16 -> 4x4 grid upsampled nearest: the
        # replaced region must be constant over each 4x4 block.
        imgs = np.full((1, 16, 16, 3), 100, np.uint8)
        oi, _ = _run([("CoarseSalt", {"p": 0.5, "size_percent": 0.25})],
                     imgs, _masks(1, 16, 16))
        assert set(np.unique(oi)) <= {100.0, 255.0}
        hit = (oi[0, :, :, 0] == 255.0).reshape(4, 4, 4, 4)
        per_block = hit.transpose(0, 2, 1, 3).reshape(16, 16)
        assert np.all(per_block.all(-1) | (~per_block.any(-1)))

    def test_coarse_pepper_and_both(self):
        imgs = np.full((1, 16, 16, 3), 100, np.uint8)
        oi, _ = _run([("CoarsePepper", 1.0)], imgs, _masks(1, 16, 16))
        assert np.all(oi == 0.0)
        oi, _ = _run([("CoarseSaltAndPepper",
                       {"p": 1.0, "size_percent": 0.25})],
                     imgs, _masks(1, 16, 16))
        assert set(np.unique(oi)) <= {0.0, 255.0}
        assert (oi == 0.0).any() and (oi == 255.0).any()

    def test_laplace_noise_scale0_identity_and_changes(self):
        imgs = _imgs(1, 16, 16)
        oi, _ = _run([("AdditiveLaplaceNoise", {"scale": 0.0})],
                     imgs, _masks(1, 16, 16))
        np.testing.assert_allclose(oi, imgs.astype(np.float32), atol=1e-4)
        oi, om = _run([("AdditiveLaplaceNoise", {"scale": 10.0})],
                      imgs, _masks(1, 16, 16))
        assert np.abs(oi - imgs.astype(np.float32)).mean() > 1.0
        np.testing.assert_array_equal(om, _masks(1, 16, 16))

    def test_edge_detect_alpha0_identity(self):
        imgs = _imgs(1, 16, 16)
        oi, _ = _run([("EdgeDetect", {"alpha": 0.0})], imgs,
                     _masks(1, 16, 16))
        np.testing.assert_allclose(oi, imgs.astype(np.float32), atol=1e-3)

    def test_edge_detect_alpha1_matches_scipy(self):
        from scipy.ndimage import correlate
        imgs = _imgs(1, 16, 16).astype(np.float32)
        oi, _ = _run([("EdgeDetect", {"alpha": 1.0})],
                     imgs.astype(np.uint8), _masks(1, 16, 16))
        kern = np.array([[0.0, 1.0, 0.0],
                         [1.0, -4.0, 1.0],
                         [0.0, 1.0, 0.0]], np.float32)
        # jnp.pad(mode="reflect") == scipy's "mirror" (no edge duplication)
        want = np.stack([correlate(imgs[0, :, :, c], kern, mode="mirror")
                         for c in range(3)], axis=-1)
        # pipeline clips to [0, 255] at segment end (documented deviation)
        np.testing.assert_allclose(oi[0], np.clip(want, 0, 255), atol=1e-2)

    @pytest.mark.parametrize("name,red", [
        ("AveragePooling", np.mean),
        ("MaxPooling", np.max),
        ("MinPooling", np.min),
    ])
    def test_pooling_matches_block_oracle(self, name, red):
        imgs = _imgs(1, 16, 16)
        oi, om = _run([(name, 4)], imgs, _masks(1, 16, 16))
        blocks = imgs[0].astype(np.float32).reshape(4, 4, 4, 4, 3)
        pooled = red(blocks, axis=(1, 3))           # (4, 4, 3)
        want = np.repeat(np.repeat(pooled, 4, 0), 4, 1)
        np.testing.assert_allclose(oi[0], want, atol=1e-3)
        np.testing.assert_array_equal(om, _masks(1, 16, 16))

    def test_pooling_k1_identity(self):
        imgs = _imgs(1, 16, 16)
        oi, _ = _run([("AveragePooling", 1)], imgs, _masks(1, 16, 16))
        np.testing.assert_allclose(oi, imgs.astype(np.float32), atol=1e-4)

    @pytest.mark.parametrize("bad", [[2, 8], 0, 2.5, True])
    def test_pooling_rejects_nonstatic_k(self, bad):
        with pytest.raises(ValueError, match="static integer"):
            _run([("MaxPooling", bad)], _imgs(), _masks())


class TestColorSugarsAndStructuredDropout:
    """AddToHue/Saturation, MultiplyHue/Saturation, RemoveSaturation must
    equal the joint op with the other axis at identity; Dropout2d /
    TotalDropout / Noop semantics."""

    def test_addtohue_equals_joint_with_zero_sat(self):
        imgs, masks = _imgs(2, 16, 16), _masks(2, 16, 16)
        a, _ = _run([("AddToHue", 40.0)], imgs, masks, seed=3)
        # the joint op splits its key for (hue, sat); the sugar must hit
        # the same values — compare against value_hue fixed, sat 0
        b2, _ = _run([("AddToHueAndSaturation",
                       {"value_hue": 40.0, "value_saturation": 0.0})],
                     imgs, masks, seed=3)
        np.testing.assert_allclose(a, b2, atol=2e-2)

    def test_multiplysaturation_zero_is_grayscale(self):
        imgs, masks = _imgs(1, 16, 16), _masks(1, 16, 16)
        a, _ = _run([("MultiplySaturation", 0.0)], imgs, masks)
        spread = a.max(axis=-1) - a.min(axis=-1)
        assert spread.max() < 1.0  # zero saturation -> channels equal

    def test_removesaturation_full_equals_multiplysat0(self):
        imgs, masks = _imgs(1, 16, 16), _masks(1, 16, 16)
        a, _ = _run([("RemoveSaturation", 1.0)], imgs, masks, seed=5)
        b2, _ = _run([("MultiplySaturation", 0.0)], imgs, masks, seed=5)
        np.testing.assert_allclose(a, b2, atol=1e-3)

    def test_multiplyhue_identity(self):
        imgs, masks = _imgs(1, 16, 16), _masks(1, 16, 16)
        a, _ = _run([("MultiplyHue", 1.0)], imgs, masks)
        np.testing.assert_allclose(a, imgs.astype(np.float32), atol=0.51)

    def test_dropout2d_zeroes_whole_channels(self):
        imgs = np.full((4, 16, 16, 3), 100, np.uint8)
        oi, om = _run([("Dropout2d", {"p": 0.8, "nb_keep_channels": 1})],
                      imgs, _masks(4, 16, 16), seed=2)
        per_chan = oi.reshape(4, -1, 3)
        for bi in range(4):
            for ci in range(3):
                vals = set(np.unique(per_chan[bi, :, ci]))
                assert vals == {0.0} or vals == {100.0}, vals
            # at least one channel survives (nb_keep_channels=1)
            assert per_chan[bi].max() == 100.0
        np.testing.assert_array_equal(om, _masks(4, 16, 16))

    def test_channeldropout_alias(self):
        imgs = _imgs(1, 8, 8)
        a, _ = _run([("ChannelDropout", 0.5)], imgs, _masks(1, 8, 8), seed=7)
        b2, _ = _run([("Dropout2d", 0.5)], imgs, _masks(1, 8, 8), seed=7)
        np.testing.assert_allclose(a, b2, atol=1e-5)

    def test_totaldropout_p1_zeroes_everything(self):
        imgs = _imgs(2, 8, 8)
        oi, om = _run([("TotalDropout", 1.0)], imgs, _masks(2, 8, 8))
        assert np.abs(oi).max() == 0.0
        np.testing.assert_array_equal(om, _masks(2, 8, 8))

    def test_totaldropout_p0_identity(self):
        imgs = _imgs(1, 8, 8)
        oi, _ = _run([("TotalDropout", 0.0)], imgs, _masks(1, 8, 8))
        np.testing.assert_allclose(oi, imgs.astype(np.float32), atol=1e-4)

    def test_noop_and_identity(self):
        imgs, masks = _imgs(1, 8, 8), _masks(1, 8, 8)
        for nm in ("Noop", "Identity"):
            oi, om = _run([(nm, None)], imgs, masks)
            np.testing.assert_allclose(oi, imgs.astype(np.float32),
                                       atol=1e-4)
            np.testing.assert_array_equal(om, masks)
