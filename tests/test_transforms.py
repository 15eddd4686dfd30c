"""`transforms:` must apply to train AND validation AND prediction
(deterministic preprocessing — round-1 applied it train-only, so eval saw
differently-processed data than training)."""

import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import segmentation_training_pipeline_tpu as stp
from segmentation_training_pipeline_tpu.data.datasets import LambdaDataSet
from segmentation_training_pipeline_tpu.ops.aug.lowering import (
    build_transform_fn,
)


def test_transform_fn_is_deterministic():
    a_fn, t_fn = build_transform_fn(
        [{"name": "Multiply", "args": [0.5, 1.5]}], [])
    imgs = jnp.asarray(np.random.RandomState(0).randint(
        0, 255, (2, 8, 8, 3)).astype(np.uint8))
    masks = jnp.zeros((2, 8, 8, 1), jnp.float32)
    o1, _ = t_fn(imgs, masks)
    o2, _ = t_fn(imgs, masks)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    # the train-side fn ignores the rng for the transform part too
    r1, _ = a_fn(jax.random.PRNGKey(1), imgs, masks)
    r2, _ = a_fn(jax.random.PRNGKey(2), imgs, masks)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))


def test_transforms_run_before_augmentation():
    # transforms Multiply 0 zeroes everything; augmentation Add 100 then
    # lands on the zeroed canvas -> constant 100 output regardless of input
    a_fn, _ = build_transform_fn(
        [{"name": "Multiply", "args": 0.0}],
        [{"name": "Add", "args": 100.0}])
    imgs = jnp.asarray(np.random.RandomState(0).randint(
        0, 255, (2, 8, 8, 3)).astype(np.uint8))
    masks = jnp.zeros((2, 8, 8, 1), jnp.float32)
    out, _ = a_fn(jax.random.PRNGKey(0), imgs, masks)
    np.testing.assert_allclose(np.asarray(out), 100.0, atol=1e-4)


def test_eval_step_applies_transform():
    from segmentation_training_pipeline_tpu.train.step import build_eval_step

    from segmentation_training_pipeline_tpu.train.step import TrainState

    model = types.SimpleNamespace(
        dtype=jnp.float32,
        apply=lambda variables, x, train: x[..., :1])
    loss_fn = lambda y, lg: jnp.mean(jnp.abs(lg))  # noqa: E731
    state = TrainState(params={}, batch_stats={}, opt_state={},
                       step=jnp.zeros((), jnp.int32))
    batch = {
        "image": jnp.full((2, 4, 4, 3), 255, jnp.uint8),
        "mask": jnp.zeros((2, 4, 4, 1), jnp.float32),
        "weight": jnp.ones((2,), jnp.float32),
    }
    _, t_fn = build_transform_fn([{"name": "Multiply", "args": 0.0}], [])
    with_t = build_eval_step(model, loss_fn, {}, "sigmoid", "scale",
                             transform_fn=t_fn)(state, batch)
    without = build_eval_step(model, loss_fn, {}, "sigmoid", "scale")(
        state, batch)
    assert float(jnp.max(with_t["loss"])) == 0.0      # zeroed input
    assert float(jnp.min(without["loss"])) > 0.0


@pytest.mark.slow
def test_transforms_apply_at_prediction(tmp_path):
    r = np.random.RandomState(0)
    xs = [r.randint(0, 255, (32, 32, 3)).astype(np.uint8) for _ in range(8)]
    ys = [(r.rand(32, 32) > 0.5).astype(np.uint8) for _ in range(8)]
    cfg = stp.parse_dict(dict(
        architecture="Unet", backbone="resnet18", shape=[32, 32, 3],
        classes=1, activation="sigmoid", loss="binary_crossentropy",
        batch=4, folds_count=2, dtype="float32",
        transforms={"Multiply": 0.0},
        stages=[{"epochs": 1}]), directory=str(tmp_path))
    cfg.fit(LambdaDataSet(xs, ys), foldsToExecute=[0], verbose=0)
    bundle = cfg.load(0, 0)
    # transform zeroes every input -> identical predictions for any inputs
    p1 = bundle.predict_probs(np.zeros((4, 32, 32, 3), np.uint8))
    p2 = bundle.predict_probs(
        r.randint(0, 255, (4, 32, 32, 3)).astype(np.uint8))
    np.testing.assert_allclose(p1, p2, atol=1e-5)
