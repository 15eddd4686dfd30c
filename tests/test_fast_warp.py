"""Multi-pass (gather-free) affine warp vs the footprint-gather oracle.

Exactness contract: identity / flips / rot90s / integer translation /
pure scale are bit-comparable to warp.warp_joint; rotations and shears
agree to interpolation tolerance (multi-pass 1-D bilinear is marginally
smoother than single-pass 2-D bilinear — documented deviation), and the
mask rides the identical geometry (joint-transform guarantee).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segmentation_training_pipeline_tpu.ops.aug import warp as W
from segmentation_training_pipeline_tpu.ops.aug.fast_warp import (
    warp_joint_multipass,
)

B, H, Wd, C = 4, 64, 64, 3


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    base = rng.rand(B, H // 8, Wd // 8, C).astype(np.float32)
    img = jax.image.resize(jnp.asarray(base), (B, H, Wd, C), "cubic")
    mraw = rng.rand(B, H // 8, Wd // 8, 1).astype(np.float32)
    msk = (jax.image.resize(jnp.asarray(mraw), (B, H, Wd, 1), "cubic")
           > 0.5).astype(np.float32)
    return img, msk


def _agree(img, msk, mats, tol_img, tol_iou):
    oi, om = W.warp_joint(img, msk, mats)
    fi, fm = warp_joint_multipass(img, msk, mats)
    diff = float(jnp.abs(oi - fi).mean())
    inter = float(((om > 0.5) & (fm > 0.5)).sum())
    union = float(((om > 0.5) | (fm > 0.5)).sum()) + 1e-9
    iou = inter / union
    assert diff < tol_img, f"img diff {diff}"
    assert iou > tol_iou, f"mask IoU {iou}"


EXACT = 1e-4      # bit-comparable paths (modulo edge half-pixel column)
EDGE = 5e-3       # paths touching the outermost half-pixel strip
SMOOTH = 0.02     # multi-pass interpolation tolerance on smooth images


class TestExactPaths:
    def test_identity(self, data):
        _agree(*data, W.identity_mats(B), EXACT, 0.999)

    def test_integer_translation(self, data):
        m = W.translation(jnp.full((B,), 3.0), jnp.full((B,), -2.0))
        _agree(*data, m, EXACT, 0.999)

    def test_hflip_vflip(self, data):
        _agree(*data, W.hflip(Wd, jnp.ones((B,))), EDGE, 0.999)
        _agree(*data, W.vflip(H, jnp.ones((B,))), EDGE, 0.999)

    def test_rot90_all_k(self, data):
        k = jnp.asarray([0, 1, 2, 3], jnp.int32)
        _agree(*data, W.rot90s(H, Wd, k), EXACT, 0.999)

    def test_pure_scale(self, data):
        m = W.scale_about(31.5, 31.5, jnp.full((B,), 1.3),
                          jnp.full((B,), 0.8))
        _agree(*data, m, EXACT, 0.99)

    def test_fractional_translation(self, data):
        m = W.translation(jnp.full((B,), 2.5), jnp.full((B,), -1.25))
        _agree(*data, m, EDGE, 0.97)


class TestRotationShear:
    @pytest.mark.parametrize("deg", [5.0, 10.0, 30.0, 44.0])
    def test_rotation(self, data, deg):
        m = W.rotation_about(31.5, 31.5, jnp.full((B,), np.deg2rad(deg)))
        _agree(*data, m, SMOOTH, 0.90)

    @pytest.mark.parametrize("deg", [60.0, 110.0, 200.0, 290.0])
    def test_rotation_beyond_45(self, data, deg):
        # rot90 extraction keeps the residual within +-45 degrees
        m = W.rotation_about(31.5, 31.5, jnp.full((B,), np.deg2rad(deg)))
        _agree(*data, m, SMOOTH, 0.90)

    def test_shear(self, data):
        m = W.shear_about(31.5, 31.5, jnp.full((B,), 0.2),
                          jnp.full((B,), -0.1))
        _agree(*data, m, SMOOTH, 0.88)

    def test_composite(self, data):
        img, msk = data
        r = W.rotation_about(31.5, 31.5, jnp.full((B,), np.deg2rad(10.0)))
        s = W.scale_about(31.5, 31.5, jnp.full((B,), 1.15),
                          jnp.full((B,), 1.15))
        f = W.hflip(Wd, jnp.asarray([1.0, 0.0, 1.0, 0.0]))
        t = W.translation(jnp.full((B,), 4.0), jnp.full((B,), -3.0))
        m = W.compose(t, W.compose(r, W.compose(s, f)))
        _agree(img, msk, m, SMOOTH, 0.88)

    def test_per_image_heterogeneous(self, data):
        img, msk = data
        # each image gets a different rotation, incl. quadrant changes
        deg = jnp.asarray([0.0, 25.0, 100.0, 265.0])
        m = W.rotation_about(31.5, 31.5, jnp.deg2rad(deg))
        _agree(img, msk, m, SMOOTH, 0.90)


class TestJointConsistency:
    def test_mask_follows_image(self, data):
        """Warping the mask as an image channel must land where the
        nearest-warped mask lands (same geometry, different taps)."""
        img, msk = data
        m = W.rotation_about(31.5, 31.5, jnp.full((B,), np.deg2rad(15.0)))
        fi, fm = warp_joint_multipass(jnp.concatenate([img, msk], -1),
                                      msk, m)
        soft = fi[..., C:]  # mask bilinearly warped as an image channel
        hard = fm
        agree = float(((soft > 0.5) == (hard > 0.5)).mean())
        assert agree > 0.97  # bilinear-vs-nearest differ only on boundaries

    def test_nonsquare_affine(self, data):
        img, msk = data
        img = img[:, :48]     # 48 x 64
        msk = msk[:, :48]
        m = W.rotation_about(31.5, 23.5, jnp.full((B,), np.deg2rad(10.0)))
        oi, om = W.warp_joint(img, msk, m)
        fi, fm = warp_joint_multipass(img, msk, m)
        assert float(jnp.abs(oi - fi).mean()) < SMOOTH
