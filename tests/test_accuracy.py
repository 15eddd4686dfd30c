"""Accuracy evidence (SURVEY §6 / BASELINE ±0.2 pt IoU north star).

Round-1 had zero accuracy data beyond 8-16 image overfits.  This trains
BASELINE config 1 (Unet-resnet34, BCE+dice) on the non-trivial synthetic
shapes dataset (160 images, textured backgrounds, occluders —
data/synthetic.py) and asserts a val-IoU floor.  Calibration run on the
8-virtual-CPU mesh scored val_iou 0.869 (12 epochs); the floor leaves
margin for RNG drift.  The full-scale evidence runs live in PERF.md
("Accuracy evidence"), produced by examples/accuracy_evidence.py on TPU.
"""

import numpy as np
import pytest

import segmentation_training_pipeline_tpu as stp
from segmentation_training_pipeline_tpu.data.synthetic import (
    generate_shapes_dataset,
)


@pytest.mark.slow
def test_unet_resnet34_val_iou_floor(tmp_path):
    ds = generate_shapes_dataset(160, size=96, seed=7)
    cfg = stp.parse_dict(dict(
        architecture="Unet", backbone="resnet34", shape=[96, 96, 3],
        classes=1, activation="sigmoid",
        loss="binary_crossentropy + 0.25*dice_loss",
        optimizer="Adam", lr=1e-3, batch=16, dtype="float32",
        metrics=["iou"], primary_metric="val_iou", folds_count=5,
        stages=[{"epochs": 12}]), directory=str(tmp_path))
    res = cfg.fit(ds, foldsToExecute=[0], verbose=0)
    best = res["fold0.stage0"]["best"]
    assert best is not None and best > 0.75, (
        f"val_iou {best} under the 0.75 floor — accuracy regression "
        "(calibrated 0.869 on this exact config)")


def test_synthetic_dataset_is_nontrivial():
    """Guard the evidence's difficulty: a global-threshold oracle must NOT
    solve the dataset (otherwise the IoU floor proves nothing)."""
    ds = generate_shapes_dataset(32, size=96, seed=7)
    best = 0.0
    for thr in range(60, 220, 20):
        inter = union = 0.0
        for i in range(len(ds)):
            it = ds[i]
            pred = it.x.mean(axis=-1) > thr
            truth = it.y > 127
            inter += float((pred & truth).sum())
            union += float((pred | truth).sum())
        best = max(best, inter / max(union, 1.0))
    assert best < 0.65, f"threshold oracle scores {best:.2f} — too easy"


def test_synthetic_dataset_deterministic():
    a = generate_shapes_dataset(4, size=64, seed=3)
    b = generate_shapes_dataset(4, size=64, seed=3)
    for i in range(4):
        np.testing.assert_array_equal(a[i].x, b[i].x)
        np.testing.assert_array_equal(a[i].y, b[i].y)
    c = generate_shapes_dataset(4, size=64, seed=4)
    assert any(not np.array_equal(a[i].x, c[i].x) for i in range(4))
