import numpy as np
import pytest

from segmentation_training_pipeline_tpu.data.datasets import (
    KFoldedDataSet,
    LambdaDataSet,
    kfold_indices,
)


@pytest.mark.parametrize("n,k,seed", [(16, 4, 33), (17, 5, 33), (103, 5, 7), (10, 3, 0)])
def test_kfold_matches_sklearn(n, k, seed):
    from sklearn.model_selection import KFold

    ours = kfold_indices(n, k, random_state=seed)
    sk = KFold(n_splits=k, shuffle=True, random_state=seed)
    for (tr, te), (str_, ste) in zip(ours, sk.split(np.zeros(n))):
        np.testing.assert_array_equal(tr, np.sort(str_))
        np.testing.assert_array_equal(te, np.sort(ste))


def test_folds_partition(toy_ds):
    kf = KFoldedDataSet(toy_ds, folds_count=4, random_state=33)
    all_val = np.concatenate([f.val for f in kf.folds])
    assert sorted(all_val.tolist()) == list(range(16))
    for f in kf.folds:
        assert set(f.train) & set(f.val) == set()


def test_test_split_held_out(toy_ds):
    kf = KFoldedDataSet(toy_ds, folds_count=3, random_state=33, test_split=0.25)
    assert len(kf.test_indices) == 4
    for f in kf.folds:
        assert set(f.train) & set(kf.test_indices) == set()
        assert set(f.val) & set(kf.test_indices) == set()


def test_negatives_none_drops_empty(toy_ds):
    kf = KFoldedDataSet(toy_ds, folds_count=4, random_state=33)
    idx = kf.epoch_indices(0, 0, negatives="none", shuffle=False)
    flags = kf._negativity()
    assert not flags[idx].any()


def test_negatives_real_keeps_all(toy_ds):
    kf = KFoldedDataSet(toy_ds, folds_count=4, random_state=33)
    idx = kf.epoch_indices(0, 0, negatives="real", shuffle=False)
    np.testing.assert_array_equal(np.sort(idx), np.sort(kf.folds[0].train))


def test_negatives_ratio_samples(toy_ds):
    kf = KFoldedDataSet(toy_ds, folds_count=2, random_state=33)
    flags = kf._negativity()
    tr = kf.folds[0].train
    n_pos = int((~flags[tr]).sum())
    idx = kf.epoch_indices(0, 0, negatives=0.5, shuffle=False)
    n_neg = int(flags[idx].sum())
    assert n_neg == min(int(round(0.5 * n_pos)), int(flags[tr].sum()))


def test_epoch_plans_deterministic(toy_ds):
    kf = KFoldedDataSet(toy_ds, folds_count=4, random_state=33)
    a = kf.epoch_indices(1, 5, negatives=1)
    b = kf.epoch_indices(1, 5, negatives=1)
    np.testing.assert_array_equal(a, b)
    c = kf.epoch_indices(1, 6, negatives=1)
    assert not np.array_equal(a, c)


def test_composite_and_sub(toy_ds):
    from segmentation_training_pipeline_tpu.data.datasets import (
        CompositeDataSet, SubDataSet)

    comp = CompositeDataSet(toy_ds, toy_ds)
    assert len(comp) == 32
    assert comp[16].id == toy_ds[0].id
    sub = SubDataSet(comp, [0, 31])
    assert len(sub) == 2
    assert np.array_equal(sub[1].x, toy_ds[15].x)
