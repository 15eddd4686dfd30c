"""Fused x/y-pipeline warp kernels (pallas_warp.py) vs the unfused passes.

The fused path must be semantically IDENTICAL to the 3-pass XLA chain
(pad → x-shear → scale einsums → y-shear), which is itself oracle-tested
against warp.warp_joint in test_fast_warp.py.  Interpret mode on CPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from segmentation_training_pipeline_tpu.ops.aug import warp as W
from segmentation_training_pipeline_tpu.ops.aug.fast_warp import (
    warp_joint_multipass)


def _rand_batch(b=3, h=64, w=64, c=3, k=2, seed=0):
    r = np.random.RandomState(seed)
    imgs = jnp.asarray(r.rand(b, h, w, c).astype(np.float32) * 255.0)
    m = (r.rand(b, h, w, k) > 0.5).astype(np.float32)
    return imgs, jnp.asarray(m)


def _mats(b, h, w, seed=1, rot_deg=25.0, scale_rng=(0.8, 1.25),
          shear_deg=10.0, trans=8.0):
    r = np.random.RandomState(seed)
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    ang = jnp.asarray(r.uniform(-rot_deg, rot_deg, b) * np.pi / 180.0,
                      jnp.float32)
    sx = jnp.asarray(r.uniform(*scale_rng, b), jnp.float32)
    sy = jnp.asarray(r.uniform(*scale_rng, b), jnp.float32)
    sh = jnp.asarray(r.uniform(-shear_deg, shear_deg, b) * np.pi / 180.0,
                     jnp.float32)
    tx = jnp.asarray(r.uniform(-trans, trans, b), jnp.float32)
    ty = jnp.asarray(r.uniform(-trans, trans, b), jnp.float32)
    m = W.compose(W.rotation_about(cx, cy, ang),
                  W.scale_about(cx, cy, sx, sy))
    m = W.compose(W.shear_about(cx, cy, sh, jnp.zeros_like(sh)), m)
    m = W.compose(W.translation(tx, ty), m)
    return m


def _run_both(imgs, masks, mats, fill=0.0):
    ref_i, ref_m = warp_joint_multipass(imgs, masks, mats, fill=fill,
                                        fused=False)
    fus_i, fus_m = warp_joint_multipass(imgs, masks, mats, fill=fill,
                                        fused=True, interpret=True)
    return (np.asarray(ref_i), np.asarray(ref_m),
            np.asarray(fus_i), np.asarray(fus_m))


class TestFusedMatchesUnfused:
    @pytest.mark.parametrize("seed", [1, 2, 3])
    def test_general_affine(self, seed):
        imgs, masks = _rand_batch(seed=seed)
        mats = _mats(3, 64, 64, seed=seed + 10)
        ri, rm, fi, fm = _run_both(imgs, masks, mats)
        # images: identical taps; atol covers the fused path's 3-pass bf16
        # dot residual (~1e-3 at 255 scale, see pallas_warp._dot3)
        np.testing.assert_allclose(fi, ri, atol=5e-3, rtol=0)
        # masks: exact nearest taps — bit-identical selects
        mism = np.mean(fm != rm)
        assert mism < 2e-3, f"mask mismatch rate {mism}"

    def test_rot90_heavy_angles(self):
        """Angles near 90/180 force the rot90 extraction pre-pass."""
        imgs, masks = _rand_batch(seed=5)
        cx = cy = (64 - 1) / 2.0
        ang = jnp.asarray(np.asarray([85.0, 175.0, -95.0]) * np.pi / 180.0,
                          jnp.float32)
        mats = W.rotation_about(cx, cy, ang)
        ri, rm, fi, fm = _run_both(imgs, masks, mats)
        np.testing.assert_allclose(fi, ri, atol=5e-3, rtol=0)
        assert np.mean(fm != rm) < 2e-3

    def test_nonzero_fill(self):
        imgs, masks = _rand_batch(seed=7)
        mats = _mats(3, 64, 64, seed=8, trans=20.0)
        ri, rm, fi, fm = _run_both(imgs, masks, mats, fill=127.0)
        np.testing.assert_allclose(fi, ri, atol=5e-3, rtol=0)
        assert np.mean(fm != rm) < 2e-3

    def test_identity_is_exact(self):
        imgs, masks = _rand_batch(seed=9)
        mats = W.identity_mats(3)
        fi, fm = warp_joint_multipass(imgs, masks, mats, fused=True,
                                      interpret=True)
        np.testing.assert_allclose(np.asarray(fi), np.asarray(imgs),
                                   atol=5e-3)
        np.testing.assert_array_equal(np.asarray(fm), np.asarray(masks))

    def test_pure_translation_integer(self):
        """Integer translate: exact pixel moves, fill in the vacated band."""
        imgs, masks = _rand_batch(b=2, seed=11)
        t = jnp.asarray([5.0, -3.0], jnp.float32)
        mats = W.translation(-t, jnp.zeros_like(t))  # inverse: src = dst - t
        fi, fm = warp_joint_multipass(imgs, masks, mats, fused=True,
                                      interpret=True)
        ref = np.asarray(imgs)
        out = np.asarray(fi)
        np.testing.assert_allclose(out[0, :, 5:, :], ref[0, :, :-5, :],
                                   atol=5e-3)
        np.testing.assert_allclose(out[0, :, :5, :], 0.0, atol=1e-3)
        np.testing.assert_allclose(out[1, :, :-3, :], ref[1, :, 3:, :],
                                   atol=5e-3)

    def test_tight_pad_matches_default_pad(self):
        """Spec-derived canvas padding (lowering._pad_frac) must be
        result-identical to the lossless 0.5 default when the shear bound
        holds — rotate ±15° needs pad ≈ tan15/2, not 0.5."""
        imgs, masks = _rand_batch(seed=21)
        mats = _mats(3, 64, 64, seed=22, rot_deg=15.0, shear_deg=0.0,
                     trans=6.0)
        for fused in (False, True):
            kw = dict(fused=fused, interpret=fused)
            ri, rm = warp_joint_multipass(imgs, masks, mats, pad_frac=0.5,
                                          **kw)
            ti, tm = warp_joint_multipass(imgs, masks, mats,
                                          pad_frac=0.20, **kw)
            np.testing.assert_allclose(np.asarray(ti), np.asarray(ri),
                                       atol=5e-3, rtol=0)
            assert np.mean(np.asarray(tm) != np.asarray(rm)) < 1e-3

    def test_nonsquare_frames(self):
        imgs, masks = _rand_batch(b=2, h=48, w=80, seed=13)
        mats = _mats(2, 48, 80, seed=14, rot_deg=20.0)
        ri, rm, fi, fm = _run_both(imgs, masks, mats)
        np.testing.assert_allclose(fi, ri, atol=5e-3, rtol=0)
        assert np.mean(fm != rm) < 2e-3


class TestElasticFusedIntoY:
    """Kernel YE (elastic tail in the y-launch) vs the two-stage path
    (affine warp → separate pallas_elastic joint kernel)."""

    @pytest.mark.parametrize("seed,kb", [(31, 6), (32, 12)])
    def test_matches_two_stage(self, seed, kb):
        from segmentation_training_pipeline_tpu.ops.aug.pallas_elastic import (
            warp_elastic_joint)

        imgs, masks = _rand_batch(seed=seed)
        mats = _mats(3, 64, 64, seed=seed + 40, rot_deg=12.0, trans=5.0)
        r = np.random.RandomState(seed)
        dx = jnp.asarray(
            (r.rand(3, 64, 64).astype(np.float32) * 2 - 1) * (kb - 1))
        dy = jnp.asarray(
            (r.rand(3, 64, 64).astype(np.float32) * 2 - 1) * (kb - 1))

        # two-stage reference: fused affine, then the elastic kernel on
        # the sliced frame
        ai, am = warp_joint_multipass(imgs, masks, mats, fused=True,
                                      interpret=True)
        ri, rm = warp_elastic_joint(ai, am, dy, dx, kb, interpret=True)

        fi, fm = warp_joint_multipass(imgs, masks, mats, fused=True,
                                      interpret=True, disp=(dx, dy),
                                      disp_k=kb)
        np.testing.assert_allclose(np.asarray(fi), np.asarray(ri),
                                   atol=1e-2, rtol=0)
        assert np.mean(np.asarray(fm) != np.asarray(rm)) < 2e-3

    def test_unfused_disp_fallback(self):
        """disp on the XLA fallback path routes through the separate
        elastic kernel — same results as the fused YE."""
        imgs, masks = _rand_batch(b=2, seed=35)
        mats = _mats(2, 64, 64, seed=36, rot_deg=10.0)
        r = np.random.RandomState(4)
        dx = jnp.asarray((r.rand(2, 64, 64).astype(np.float32) * 2 - 1) * 5)
        dy = jnp.asarray((r.rand(2, 64, 64).astype(np.float32) * 2 - 1) * 5)
        fi, fm = warp_joint_multipass(imgs, masks, mats, fused=True,
                                      interpret=True, disp=(dx, dy),
                                      disp_k=6)
        ui, um = warp_joint_multipass(imgs, masks, mats, fused=False,
                                      interpret=True, disp=(dx, dy),
                                      disp_k=6)
        np.testing.assert_allclose(np.asarray(fi), np.asarray(ui),
                                   atol=1e-2, rtol=0)
        assert np.mean(np.asarray(fm) != np.asarray(um)) < 2e-3
