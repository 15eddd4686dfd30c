"""Jigsaw (ops/aug/jigsaw.py): joint image+mask grid-cell shuffle — the
last (a)-bucket do-not-lower name.  Pure block moves, so the invariants
are exact: the multiset of cell contents is preserved, masks move with
images, and 0 steps is the identity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from segmentation_training_pipeline_tpu import config as C
from segmentation_training_pipeline_tpu.config import ConfigError
from segmentation_training_pipeline_tpu.ops.aug import build_augmentation


def _run(args, imgs, masks, seed=0):
    fn = build_augmentation([{"name": "Jigsaw", "args": args}])
    oi, om = jax.jit(fn)(jax.random.PRNGKey(seed), jnp.asarray(imgs),
                         jnp.asarray(masks))
    return np.asarray(oi), np.asarray(om)


def _cells(x, rows, cols):
    b, h, w, c = x.shape
    ch, cw = h // rows, w // cols
    return (x.reshape(b, rows, ch, cols, cw, c)
             .transpose(0, 1, 3, 2, 4, 5)
             .reshape(b, rows * cols, ch * cw * c))


class TestJigsaw:
    def test_zero_steps_identity(self):
        r = np.random.RandomState(0)
        imgs = r.randint(0, 256, (2, 16, 16, 3)).astype(np.uint8)
        masks = (r.rand(2, 16, 16, 1) > 0.5).astype(np.float32)
        oi, om = _run({"nb_rows": 4, "nb_cols": 4, "max_steps": 0},
                      imgs, masks)
        np.testing.assert_array_equal(oi, imgs.astype(np.float32))
        np.testing.assert_array_equal(om, masks)

    def test_cell_multiset_preserved(self):
        # block moves only: the sorted cell contents are unchanged
        r = np.random.RandomState(1)
        imgs = r.randint(0, 256, (2, 24, 24, 3)).astype(np.uint8)
        masks = np.zeros((2, 24, 24, 1), np.float32)
        oi, _ = _run({"nb_rows": 4, "nb_cols": 4, "max_steps": [2, 6]},
                     imgs, masks, seed=5)
        got = np.sort(_cells(oi, 4, 4), axis=1)
        exp = np.sort(_cells(imgs.astype(np.float32), 4, 4), axis=1)
        np.testing.assert_array_equal(got, exp)
        assert np.abs(oi - imgs).mean() > 0  # something actually moved

    def test_mask_moves_with_image(self):
        # encode the cell id in both image and mask; after the shuffle the
        # (image value, mask value) pairing must survive per pixel
        rows = cols = 3
        imgs = np.zeros((1, 18, 18, 3), np.float32)
        masks = np.zeros((1, 18, 18, 1), np.float32)
        for rr in range(rows):
            for cc in range(cols):
                cid = rr * cols + cc
                imgs[0, rr * 6:(rr + 1) * 6, cc * 6:(cc + 1) * 6] = cid * 20
                masks[0, rr * 6:(rr + 1) * 6, cc * 6:(cc + 1) * 6] = cid % 2
        oi, om = _run({"nb_rows": rows, "nb_cols": cols,
                       "max_steps": 4}, imgs, masks, seed=7)
        cid = np.round(oi[..., 0] / 20.0)
        np.testing.assert_array_equal(om[..., 0], cid % 2)

    def test_mask_binary_after_shuffle(self):
        r = np.random.RandomState(2)
        imgs = r.randint(0, 256, (1, 20, 20, 3)).astype(np.uint8)
        masks = (r.rand(1, 20, 20, 1) > 0.5).astype(np.float32)
        _, om = _run({"nb_rows": 5, "nb_cols": 5, "max_steps": [1, 5]},
                     imgs, masks, seed=3)
        assert set(np.unique(om)) <= {0.0, 1.0}

    def test_non_divisible_dims_keep_shape(self):
        r = np.random.RandomState(3)
        imgs = r.randint(0, 256, (1, 19, 23, 3)).astype(np.uint8)
        masks = (r.rand(1, 19, 23, 1) > 0.5).astype(np.float32)
        oi, om = _run({"nb_rows": 4, "nb_cols": 4, "max_steps": 3},
                      imgs, masks)
        assert oi.shape == (1, 19, 23, 3) and om.shape == (1, 19, 23, 1)
        assert np.isfinite(oi).all()
        assert set(np.unique(om)) <= {0.0, 1.0}

    def test_sampled_grid_rejected_at_parse(self):
        with pytest.raises(ConfigError, match="static integer"):
            C.parse_dict({"augmentation":
                          {"Jigsaw": {"nb_rows": [3, 10]}}})

    def test_allow_pad_rejected_with_pointer(self):
        with pytest.raises(ConfigError, match="cell multiple"):
            C.parse_dict({"augmentation":
                          {"Jigsaw": {"allow_pad": False}}})

    def test_parses_with_imgaug_args(self):
        cfg = C.parse_dict({"augmentation": {
            "Jigsaw": {"nb_rows": 5, "nb_cols": 5, "max_steps": [1, 5]}}})
        assert cfg.augmentation[0]["name"] == "Jigsaw"
