"""Stratified folds, class-weighted losses, profiling hook."""

import numpy as np
import pytest

import jax.numpy as jnp

import segmentation_training_pipeline_tpu as stp
from segmentation_training_pipeline_tpu.data.datasets import (
    KFoldedDataSet,
    stratified_kfold_indices,
)
from segmentation_training_pipeline_tpu.ops import losses as L


class TestStratified:
    def test_each_fold_keeps_ratio(self):
        labels = np.array([0] * 20 + [1] * 4)
        folds = stratified_kfold_indices(labels, 4, random_state=1)
        for tr, te in folds:
            assert labels[te].sum() == 1  # 4 positives over 4 folds
            assert len(te) == 6

    def test_partition(self):
        labels = np.array([0, 1] * 10)
        folds = stratified_kfold_indices(labels, 5, random_state=0)
        allv = np.concatenate([te for _, te in folds])
        assert sorted(allv.tolist()) == list(range(20))

    def test_kfolded_dataset_stratified(self, toy_ds):
        kf = KFoldedDataSet(toy_ds, folds_count=4, random_state=33,
                            stratified=True)
        neg = kf._negativity()
        # toy_ds has 4 negatives; stratified → exactly 1 per fold
        for f in kf.folds:
            assert neg[f.val].sum() == 1


class TestClassWeights:
    def test_config_validates_length(self):
        with pytest.raises(Exception, match="class_weights"):
            stp.parse_dict({"classes": 3, "class_weights": [1.0, 2.0]})
        cfg = stp.parse_dict({"classes": 3, "activation": "softmax",
                              "class_weights": [1.0, 2.0, 0.5]})
        assert cfg.class_weights == [1.0, 2.0, 0.5]

    def test_weighted_cce_upweights_class(self):
        # unbalanced: 3 pixels of class 0, 1 pixel of class 1
        y = jnp.asarray(np.eye(2, dtype=np.float32)[[0, 0, 0, 1]]
                        ).reshape(1, 4, 1, 2)
        logits = jnp.zeros((1, 4, 1, 2))
        base = L.categorical_crossentropy(y, logits)
        eq = L.categorical_crossentropy(y, logits, class_weights=[1.0, 1.0])
        assert np.allclose(base, eq, atol=1e-6)
        # upweighting the rare class with uniform logits shrinks the mean
        # (3 of 4 pixels now carry weight 0.1)
        skew = L.categorical_crossentropy(y, logits, class_weights=[0.1, 1.9])
        assert not np.allclose(base, skew, atol=1e-4)

    def test_weighted_dice_prefers_weighted_class(self):
        y = np.zeros((1, 4, 4, 2), np.float32)
        y[..., 0] = 1  # class 0 everywhere
        logits = np.zeros((1, 4, 4, 2), np.float32)
        logits[..., 0] = 5.0   # good on class 0
        logits[..., 1] = 5.0   # bad on class 1 (predicts everywhere)
        l_c0 = float(L.dice_loss(jnp.asarray(y), jnp.asarray(logits),
                                 class_weights=[1.0, 0.0]))
        l_c1 = float(L.dice_loss(jnp.asarray(y), jnp.asarray(logits),
                                 class_weights=[0.0, 1.0]))
        assert l_c0 < l_c1  # weighting toward the bad class raises the loss

    def test_build_loss_threads_weights(self):
        f = L.build_loss("dice_loss + categorical_crossentropy", "softmax",
                         class_weights=[1.0, 3.0])
        y = jnp.asarray(np.eye(2, dtype=np.float32)[[0, 1]]).reshape(1, 2, 1, 2)
        x = jnp.asarray(np.random.RandomState(0).randn(1, 2, 1, 2)
                        .astype(np.float32))
        v = float(f(y, x))
        assert np.isfinite(v)

    def test_weighted_fit_runs(self, toy_ds, tmp_path):
        cfg = stp.parse_dict(dict(
            architecture="Unet", backbone="resnet18", shape=[32, 32, 3],
            classes=2, activation="softmax",
            loss="categorical_crossentropy + 0.5*dice_loss",
            class_weights=[0.3, 1.7], batch=4, folds_count=2,
            dtype="float32", stages=[{"epochs": 1}]),
            directory=str(tmp_path))
        res = cfg.fit(toy_ds, foldsToExecute=[0], verbose=0)
        assert "fold0.stage0" in res


def test_csv_has_time_column(toy_ds, tmp_path):
    cfg = stp.parse_dict(dict(
        architecture="Unet", backbone="resnet18", shape=[32, 32, 3],
        classes=1, batch=4, folds_count=2, dtype="float32",
        stages=[{"epochs": 1}]), directory=str(tmp_path))
    cfg.fit(toy_ds, foldsToExecute=[0], verbose=0)
    header = open(cfg.metrics_path(0, 0)).read().split("\n")[0]
    assert "time" in header.split(",")
