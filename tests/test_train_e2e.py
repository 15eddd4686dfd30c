"""Integration tests: BASELINE config-1-style end-to-end training on CPU.

SURVEY §4: overfit a tiny dataset → metric improves; checkpoint naming /
CSV layout / resume / multi-stage / freeze semantics.
"""

import os

import numpy as np
import pytest

import segmentation_training_pipeline_tpu as stp


def _mk_cfg(tmp_path, **over):
    d = dict(
        architecture="Unet", backbone="resnet18", shape=[32, 32, 3],
        classes=1, activation="sigmoid", loss="binary_crossentropy",
        optimizer="Adam", lr=1e-3, batch=4, metrics=["dice", "iou"],
        primary_metric="val_dice", folds_count=2, random_state=33,
        dtype="float32", stages=[{"epochs": 2}],
    )
    d.update(over)
    return stp.parse_dict(d, directory=str(tmp_path))


class _CircleDS(stp.DataSet):
    """Learnable toy task: bright square on dark noise."""

    def __init__(self, n=16, size=32, all_positive=False):
        self.n, self.size, self.all_positive = n, size, all_positive

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        r = np.random.RandomState(i)
        s = self.size
        y = np.zeros((s, s), np.uint8)
        if self.all_positive or i % 4:
            y[s // 4: 3 * s // 4, s // 4: 3 * s // 4] = 1
        x = (np.repeat(y[:, :, None], 3, -1) * 180
             + r.randint(0, 60, (s, s, 3))).astype(np.uint8)
        return stp.PredictionItem(f"img{i}", x, y)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """One fold trained for 3 epochs; reused by checkpoint/predict tests."""
    tmp = tmp_path_factory.mktemp("e2e")
    cfg = _mk_cfg(tmp, stages=[{"epochs": 3}])
    ds = _CircleDS()
    res = cfg.fit(ds, foldsToExecute=[0], verbose=0)
    return cfg, ds, res, tmp


class TestFit:
    def test_artifacts_and_contract(self, trained):
        cfg, ds, res, tmp = trained
        assert os.path.exists(cfg.weights_path(0, 0))
        assert os.path.exists(cfg.weights_path(0, 0) + ".json")
        csv = open(cfg.metrics_path(0, 0)).read().strip().split("\n")
        assert csv[0].startswith("epoch,lr,")
        assert "val_dice" in csv[0]
        assert len(csv) == 4  # header + 3 epochs
        assert res["fold0.stage0"]["best"] > 0.3  # learned something

    def test_learning_progress(self, trained):
        cfg, ds, res, tmp = trained
        rows = open(cfg.metrics_path(0, 0)).read().strip().split("\n")[1:]
        losses = [float(r.split(",")[2 + 2]) for r in []] or None
        header = open(cfg.metrics_path(0, 0)).read().split("\n")[0].split(",")
        li = header.index("loss")
        losses = [float(r.split(",")[li]) for r in rows]
        assert losses[-1] < losses[0]

    def test_refit_skips_done_stage(self, trained, capsys):
        cfg, ds, res, tmp = trained
        res2 = cfg.fit(ds, foldsToExecute=[0], verbose=0)
        assert res2["fold0.stage0"].get("skipped") is True


class TestMultiStage:
    def test_freeze_then_unfreeze(self, tmp_path):
        cfg = _mk_cfg(
            tmp_path, folds_count=2,
            freeze_encoder=True,
            stages=[{"epochs": 1}, {"epochs": 1, "unfreeze_encoder": True,
                                    "lr": 1e-4}],
        )
        res = cfg.fit(_CircleDS(), foldsToExecute=[0], verbose=0)
        assert os.path.exists(cfg.weights_path(0, 0))
        assert os.path.exists(cfg.weights_path(0, 1))
        assert os.path.exists(cfg.metrics_path(0, 1))

    def test_frozen_encoder_params_unchanged(self, tmp_path):
        import jax
        from segmentation_training_pipeline_tpu.models.factory import (
            init_model, model_from_config)
        from segmentation_training_pipeline_tpu.train.checkpoint import (
            load_checkpoint)

        cfg = _mk_cfg(tmp_path, freeze_encoder=True, random_state=7,
                      stages=[{"epochs": 1}])
        cfg2 = _mk_cfg(tmp_path, random_state=7)  # same init seed
        model = model_from_config(cfg)
        init_vars = jax.device_get(init_model(model, cfg.shape, seed=7))
        cfg.fit(_CircleDS(), foldsToExecute=[0], verbose=0)
        saved = load_checkpoint(cfg.weights_path(0, 0), init_vars)
        enc0 = jax.tree.leaves(init_vars["params"]["encoder"])
        enc1 = jax.tree.leaves(saved["params"]["encoder"])
        assert all(np.allclose(a, b) for a, b in zip(enc0, enc1))
        dec0 = jax.tree.leaves(init_vars["params"]["decoder"])
        dec1 = jax.tree.leaves(saved["params"]["decoder"])
        assert any(not np.allclose(a, b) for a, b in zip(dec0, dec1))


class TestSampling:
    def test_negatives_none_in_fit(self, tmp_path):
        cfg = _mk_cfg(tmp_path, negatives="none", stages=[{"epochs": 1}])
        res = cfg.fit(_CircleDS(), foldsToExecute=[0], verbose=0)
        assert os.path.exists(cfg.weights_path(0, 0))


class TestCallbacksIntegration:
    def test_early_stopping_stops(self, tmp_path):
        cfg = _mk_cfg(
            tmp_path,
            callbacks={"EarlyStopping": {"monitor": "val_loss", "patience": 0,
                                         "min_delta": 10.0}},
            stages=[{"epochs": 6}],
        )
        cfg.fit(_CircleDS(), foldsToExecute=[0], verbose=0)
        rows = open(cfg.metrics_path(0, 0)).read().strip().split("\n")
        assert len(rows) - 1 <= 3  # stopped well before 6 epochs


def test_debug_checkify_catches_nonfinite(tmp_path):
    """debug: true instruments the train program with checkify float
    checks: a NaN planted in the params raises host-side with the failing
    primitive instead of silently corrupting training (SURVEY §5).
    Uses a tiny conv model — checkify of a full resnet is minutes of
    compile on a 1-core host, and the wiring is model-agnostic."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from flax import linen as nn

    from segmentation_training_pipeline_tpu.train.step import (
        build_train_step, create_train_state)

    class Tiny(nn.Module):
        dtype = jnp.float32

        @nn.compact
        def __call__(self, x, train=False):
            return nn.Conv(1, (3, 3), padding="SAME", name="head",
                           dtype=jnp.float32)(x)

    model = Tiny()
    variables = {"params": model.init(jax.random.PRNGKey(0),
                                      jnp.zeros((1, 8, 8, 3)))["params"]}
    variables["params"]["head"]["kernel"] = (
        variables["params"]["head"]["kernel"].at[0, 0, 0, 0].set(jnp.nan))
    loss_fn = lambda y, lg: jnp.mean((y - lg) ** 2)  # noqa: E731
    tx = optax.sgd(1.0)
    step = build_train_step(model, tx, loss_fn, {}, "sigmoid", "tf",
                            donate=False, debug_checks=True)
    state = create_train_state(model, variables, tx)
    r = np.random.RandomState(0)
    batch = {"image": r.randint(0, 255, (2, 8, 8, 3), dtype=np.uint8),
             "mask": (r.rand(2, 8, 8, 1) > 0.5).astype(np.uint8)}
    with pytest.raises(Exception, match="nan|inf|NaN|Inf"):
        step(state, batch, jnp.asarray(1e-3, jnp.float32),
             jax.random.PRNGKey(0))
