"""Pallas bounded-displacement elastic kernel vs the footprint-gather
oracle (interpret mode on the CPU mesh; compiled path runs on real TPUs
via lowering's backend dispatch)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from segmentation_training_pipeline_tpu.ops.aug import warp as W
from segmentation_training_pipeline_tpu.ops.aug import pallas_elastic as PE
from segmentation_training_pipeline_tpu.ops.aug import build_augmentation


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    B, H, Wd, C = 2, 64, 64, 3
    img = jax.image.resize(
        jnp.asarray(rng.rand(B, 8, 8, C).astype(np.float32)),
        (B, H, Wd, C), "cubic")
    msk = (img[..., :1] > 0.5).astype(np.float32)
    return img, msk


class TestSingleAxisExact:
    """With displacement along one axis only, the separable kernel is
    EXACT vs the 2-D footprint gather (incl. edge clamps and OOB fill)."""

    @pytest.mark.parametrize("axis", ["y", "x"])
    def test_random_single_axis(self, data, axis):
        img, msk = data
        B, H, Wd = img.shape[0], img.shape[1], img.shape[2]
        rng = np.random.RandomState(1)
        d = jnp.asarray(rng.uniform(-4, 4, (B, H, Wd)).astype(np.float32))
        z = jnp.zeros_like(d)
        dy, dx = (d, z) if axis == "y" else (z, d)
        oi, om = W.warp_joint(img, msk, W.identity_mats(B), (dx, dy))
        pi, pm = PE.warp_elastic_joint(img, msk, dy, dx, 6, interpret=True)
        assert float(jnp.abs(oi - pi).max()) < 1e-5
        assert float(jnp.abs(om - pm).max()) == 0.0

    @pytest.mark.parametrize("axis", ["y", "x"])
    def test_half_tie_rounds_like_oracle(self, data, axis):
        """Displacements with an EXACT .5 fractional part: the oracle's
        nearest convention (warp.py `f >= 0.5` → upper tap) must be
        matched; jnp.round's half-to-even took the lower tap on even
        floors — caught on-chip by tools/tpu_smoke.py round 4."""
        img, msk = data
        B, H, Wd = img.shape[0], img.shape[1], img.shape[2]
        rng = np.random.RandomState(2)
        # integer displacements in [-4, 3] plus exactly 0.5 everywhere:
        # every pixel is a rounding tie, both even and odd floors
        d = jnp.asarray(
            rng.randint(-4, 4, (B, H, Wd)).astype(np.float32) + 0.5)
        z = jnp.zeros_like(d)
        dy, dx = (d, z) if axis == "y" else (z, d)
        oi, om = W.warp_joint(img, msk, W.identity_mats(B), (dx, dy))
        pi, pm = PE.warp_elastic_joint(img, msk, dy, dx, 6, interpret=True)
        assert float(jnp.abs(oi - pi).max()) < 1e-5
        assert float(jnp.abs(om - pm).max()) == 0.0


class TestSmoothField:
    def test_realistic_elastic_close(self, data):
        """2-D smooth fields: the separable pass evaluates the second
        field at the shifted position (documented approximation) — for
        sigma-blurred fields the error is sub-pixel."""
        img, msk = data
        B, H, Wd = img.shape[0], img.shape[1], img.shape[2]
        k = jax.random.PRNGKey(1)
        dx, dy = W.elastic_field(k, B, H, Wd, jnp.full((B,), 20.0),
                                 jnp.full((B,), 5.0), radius=10)
        K = 8
        oi, om = W.warp_joint(img, msk, W.identity_mats(B), (dx, dy))
        pi, pm = PE.warp_elastic_joint(img, msk, dy, dx, K, interpret=True)
        assert float(jnp.abs(oi - pi).mean()) < 0.01
        inter = float(((om > 0.5) & (pm > 0.5)).sum())
        union = float(((om > 0.5) | (pm > 0.5)).sum()) + 1e-9
        assert inter / union > 0.97


class TestGatherXResample:
    """W ≥ 128 + K ≤ 30 dispatches the joint kernel's x resample to
    windowed tpu.dynamic_gather (128-lane windows, stride 64) — must be
    bit-equal to the 2K+1 roll sweep (force the sweep via K=31)."""

    @pytest.mark.parametrize("w,kb", [(128, 6), (192, 12), (256, 29)])
    def test_gather_equals_rolls(self, w, kb):
        rng = np.random.RandomState(7)
        B, H = 2, 64
        img = jnp.asarray(rng.rand(B, H, w, 3).astype(np.float32) * 255)
        msk = (img[..., :1] > 127).astype(np.float32)
        dy = jnp.asarray(
            rng.uniform(-(kb - 1), kb - 1, (B, H, w)).astype(np.float32))
        dx = jnp.asarray(
            rng.uniform(-(kb - 1), kb - 1, (B, H, w)).astype(np.float32))
        gi, gm = PE.warp_elastic_joint(img, msk, dy, dx, kb, interpret=True)
        # K=31 forces the roll-sweep branch; pad displacements stay ≤ kb
        ri, rm = PE.warp_elastic_joint(img, msk, dy, dx, 31, interpret=True)
        np.testing.assert_allclose(np.asarray(gi), np.asarray(ri),
                                   atol=1e-4)  # f32 blend-order noise
        np.testing.assert_array_equal(np.asarray(gm), np.asarray(rm))

    def test_gather_vs_footprint_oracle_single_axis(self):
        rng = np.random.RandomState(9)
        B, H, Wd = 2, 64, 128
        img = jnp.asarray(rng.rand(B, H, Wd, 3).astype(np.float32))
        msk = (img[..., :1] > 0.5).astype(np.float32)
        d = jnp.asarray(rng.uniform(-5, 5, (B, H, Wd)).astype(np.float32))
        z = jnp.zeros_like(d)
        oi, om = W.warp_joint(img, msk, W.identity_mats(B), (d, z))
        pi, pm = PE.warp_elastic_joint(img, msk, z, d, 7, interpret=True)
        assert float(jnp.abs(oi - pi).max()) < 1e-5
        assert float(jnp.abs(om - pm).max()) == 0.0


class TestLoweringDispatch:
    def test_affine_plus_elastic_pallas_path(self, data, monkeypatch):
        """Force the Pallas elastic path (interpret mode) through the full
        augmentation lowering and compare against the gather path."""
        img, msk = data
        imgs_u8 = (np.asarray(img) * 120 + 60).astype(np.uint8)
        specs = [
            {"name": "Affine", "args": {"rotate": [7.0, 7.0],
                                        "scale": [1.1, 1.1]}},
            {"name": "ElasticTransformation",
             "args": {"alpha": 20.0, "sigma": 5.0}},
        ]
        key = jax.random.PRNGKey(3)

        monkeypatch.setenv("STP_PALLAS_ELASTIC", "0")
        aug_g = build_augmentation([dict(s) for s in specs])
        gi, gm = aug_g(key, jnp.asarray(imgs_u8), msk)

        monkeypatch.setenv("STP_PALLAS_ELASTIC", "1")
        orig = PE.warp_elastic_joint
        monkeypatch.setattr(
            PE, "warp_elastic_joint",
            lambda *a, **kw: orig(*a, **{**kw, "interpret": True}))
        aug_p = build_augmentation([dict(s) for s in specs])
        pi, pm = aug_p(key, jnp.asarray(imgs_u8), msk)

        # same RNG stream -> same affine + same field; paths differ by
        # multipass-vs-single-pass interpolation and the kernel's
        # x-field-at-shifted-y approximation (sub-pixel, PERF.md)
        assert float(jnp.abs(gi - pi).mean()) < 5.0  # 0..255 scale
        agree = float(((gm > 0.5) == (pm > 0.5)).mean())
        assert agree > 0.95
