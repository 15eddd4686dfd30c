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
