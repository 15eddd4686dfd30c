"""Multi-device tests on the virtual 8-CPU mesh (SURVEY §4 'distributed
without a cluster').  The key property: a GSPMD-sharded train step computes
EXACTLY the same math as single-device (grad psum + global-batch BN fall
out of sharding annotations, not hand-written collectives).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from segmentation_training_pipeline_tpu.config import parse_dict
from segmentation_training_pipeline_tpu.models.factory import (
    create_model,
    init_model,
)
from segmentation_training_pipeline_tpu.ops.losses import build_loss
from segmentation_training_pipeline_tpu.parallel.mesh import (
    MeshSpec,
    batch_sharding,
    build_mesh,
    replicated,
)
from segmentation_training_pipeline_tpu.train.optimizers import build_optimizer
from segmentation_training_pipeline_tpu.train.step import (
    build_train_step,
    create_train_state,
)


def _setup(dtype="float32", optimizer="Adam"):
    cfg = parse_dict(dict(
        architecture="Unet", backbone="resnet18", shape=[32, 32, 3],
        classes=1, activation="sigmoid", loss="binary_crossentropy",
        optimizer=optimizer, lr=1e-3, dtype=dtype))
    model = create_model("Unet", "resnet18", classes=1, dtype=dtype)
    variables = init_model(model, (32, 32, 3), seed=0)
    tx = build_optimizer(cfg)
    step = build_train_step(model, tx, build_loss(cfg.loss, "sigmoid"), {},
                            "sigmoid", "tf", aug_fn=None, donate=False)
    state = create_train_state(model, variables, tx)
    r = np.random.RandomState(0)
    batch = {
        "image": r.randint(0, 255, (8, 32, 32, 3), dtype=np.uint8),
        "mask": (r.rand(8, 32, 32, 1) > 0.5).astype(np.float32),
    }
    return model, state, step, batch


def _put(state, batch, mesh):
    sh = batch_sharding(mesh)
    rep = replicated(mesh)
    return (jax.device_put(state, rep),
            {k: jax.device_put(v, sh) for k, v in batch.items()})


@pytest.mark.parametrize("data,space", [(8, 1), (4, 2), (2, 4)])
def test_mesh_shapes_run(data, space):
    model, state, step, batch = _setup()
    mesh = build_mesh(MeshSpec(data=data, space=space))
    dstate, dbatch = _put(state, batch, mesh)
    new_state, logs = step(dstate, dbatch, jnp.asarray(1e-3), jax.random.PRNGKey(0))
    assert np.isfinite(float(logs["loss"]))


def test_sharded_step_matches_single_device():
    """DP+SP sharded step == single-device step up to reduction-order noise.

    SGD (not Adam): Adam's first-step update is ±lr·sign(m/√v), which
    amplifies 1e-8 cross-device reduction-order differences on near-zero
    grads into visible ±2lr param flips — noise, not a sharding bug.
    """
    model, state, step, batch = _setup(optimizer="SGD")
    lr = jnp.asarray(1e-3, jnp.float32)
    key = jax.random.PRNGKey(1)

    # single device
    s1 = jax.device_put(state, jax.devices()[0])
    b1 = {k: jax.device_put(v, jax.devices()[0]) for k, v in batch.items()}
    out1, logs1 = step(s1, b1, lr, key)

    # 4x2 mesh
    mesh = build_mesh(MeshSpec(data=4, space=2))
    s8, b8 = _put(state, batch, mesh)
    out8, logs8 = step(s8, b8, lr, key)

    assert np.allclose(float(logs1["loss"]), float(logs8["loss"]), atol=1e-5)
    p1 = jax.device_get(out1.params)
    p8 = jax.device_get(out8.params)
    # f32 accumulation-order noise scales with grad magnitude; a real
    # sharding bug (missed psum, wrong halo) produces O(1) divergence.
    diffs = [np.max(np.abs(a - b)) for a, b in
             zip(jax.tree.leaves(p1), jax.tree.leaves(p8))]
    assert max(diffs) < 5e-4, f"param divergence {max(diffs)}"
    # BatchNorm running stats must also agree (global-batch sync BN)
    bs1 = jax.tree.leaves(jax.device_get(out1.batch_stats))
    bs8 = jax.tree.leaves(jax.device_get(out8.batch_stats))
    assert max(np.max(np.abs(a - b)) for a, b in zip(bs1, bs8)) < 1e-4


def test_fit_pipeline_on_mesh(tmp_path, toy_ds):
    """End-to-end fit with the batch auto-sharded over all 8 devices."""
    import segmentation_training_pipeline_tpu as stp

    cfg = stp.parse_dict(dict(
        architecture="Unet", backbone="resnet18", shape=[32, 32, 3],
        classes=1, activation="sigmoid", loss="binary_crossentropy",
        batch=8, folds_count=2, dtype="float32", metrics=["iou"],
        primary_metric="val_iou", stages=[{"epochs": 1}]),
        directory=str(tmp_path))
    res = cfg.fit(toy_ds, foldsToExecute=[0], verbose=0)
    assert "fold0.stage0" in res


def test_explicit_mesh_config(tmp_path, toy_ds):
    import segmentation_training_pipeline_tpu as stp

    cfg = stp.parse_dict(dict(
        architecture="Unet", backbone="resnet18", shape=[32, 32, 3],
        classes=1, batch=8, folds_count=2, dtype="float32",
        mesh={"data": 4, "space": 2}, stages=[{"epochs": 1}]),
        directory=str(tmp_path))
    res = cfg.fit(toy_ds, foldsToExecute=[0], verbose=0)
    assert "fold0.stage0" in res


@pytest.mark.slow
def test_flagship_shape_space2_matches_single_device():
    """512² Unet-resnet34 with space=2 spatial partitioning on the virtual
    mesh: the sharded step's loss and gradients-applied params must match
    single-device math (halo exchange through the decoder's resizes —
    round-1 only asserted this at 32-64²)."""
    cfg = parse_dict(dict(
        architecture="Unet", backbone="resnet34", shape=[512, 512, 3],
        classes=1, activation="sigmoid", loss="binary_crossentropy",
        optimizer="SGD", lr=1e-2, dtype="float32"))
    model = create_model("Unet", "resnet34", classes=1, dtype="float32")
    variables = init_model(model, (512, 512, 3), seed=0)
    tx = build_optimizer(cfg)
    step = build_train_step(model, tx, build_loss(cfg.loss, "sigmoid"), {},
                            "sigmoid", "tf", aug_fn=None, donate=False)
    state = create_train_state(model, variables, tx)
    r = np.random.RandomState(0)
    batch = {
        "image": r.randint(0, 255, (4, 512, 512, 3), dtype=np.uint8),
        "mask": (r.rand(4, 512, 512, 1) > 0.5).astype(np.float32),
    }
    lr = jnp.asarray(1e-2, jnp.float32)
    key = jax.random.PRNGKey(0)

    sstate, slogs = step(state, batch, lr, key)
    sloss = float(jax.device_get(slogs["loss"]))

    mesh = build_mesh(MeshSpec(data=2, space=2),
                      devices=jax.devices()[:4])
    dstate, dbatch = _put(state, batch, mesh)
    mstate, mlogs = step(dstate, dbatch, lr, key)
    mloss = float(jax.device_get(mlogs["loss"]))
    assert np.isfinite(mloss)
    np.testing.assert_allclose(mloss, sloss, rtol=2e-5, atol=2e-6)
    # spot-check a stem kernel and a decoder kernel after the update
    sp = jax.device_get(sstate.params)
    mp = jax.device_get(mstate.params)
    np.testing.assert_allclose(
        mp["encoder"]["stem_conv"]["kernel"],
        sp["encoder"]["stem_conv"]["kernel"], rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        mp["decoder"]["up5"]["conv2"]["conv"]["kernel"],
        sp["decoder"]["up5"]["conv2"]["conv"]["kernel"], rtol=1e-4, atol=1e-6)
