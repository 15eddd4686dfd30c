import numpy as np
import jax.numpy as jnp

from segmentation_training_pipeline_tpu.ops import metrics as M


def test_binary_accuracy_exact():
    y = jnp.asarray([[[[1.0]], [[0.0]], [[1.0]], [[0.0]]]])  # (1,4,1,1)
    p = jnp.asarray([[[[0.9]], [[0.2]], [[0.4]], [[0.1]]]])
    assert np.isclose(float(M.binary_accuracy(y, p)), 0.75)


def test_iou_known_value():
    y = np.zeros((1, 4, 4, 1), np.float32)
    y[0, :2] = 1  # 8 positives
    p = np.zeros((1, 4, 4, 1), np.float32)
    p[0, 1:3] = 1  # 8 predicted, overlap 4
    got = float(M.iou_score(jnp.asarray(y), jnp.asarray(p)))
    assert np.isclose(got, 4.0 / 12.0, atol=1e-4)


def test_dice_known_value():
    y = np.zeros((1, 4, 4, 1), np.float32)
    y[0, :2] = 1
    p = np.zeros((1, 4, 4, 1), np.float32)
    p[0, 1:3] = 1
    got = float(M.dice_score(jnp.asarray(y), jnp.asarray(p)))
    assert np.isclose(got, 2 * 4.0 / 16.0, atol=1e-4)


def test_softmax_accuracy():
    y = jnp.asarray(np.eye(3, dtype=np.float32)[[0, 1, 2, 1]]).reshape(1, 4, 1, 3)
    p = jnp.asarray(np.eye(3, dtype=np.float32)[[0, 1, 0, 1]]).reshape(1, 4, 1, 3) * 0.9
    assert np.isclose(float(M.accuracy(y, p, "softmax")), 0.75)


def test_precision_recall():
    y = np.zeros((1, 4, 4, 1), np.float32); y[0, :2] = 1
    p = np.zeros((1, 4, 4, 1), np.float32); p[0, 1:3] = 1
    assert np.isclose(float(M.precision(jnp.asarray(y), jnp.asarray(p))), 0.5, atol=1e-4)
    assert np.isclose(float(M.recall(jnp.asarray(y), jnp.asarray(p))), 0.5, atol=1e-4)


def test_get_strips_val_prefix():
    assert M.get("val_dice") is M.dice_score
    assert M.get("iou_score") is M.iou_score
