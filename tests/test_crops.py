"""Train-side `crops: N` tiling (reference crop-split wrapper, SURVEY §2a).

Round-1 gap: `crops:` only affected prediction; a crops config silently
trained on downsized full images.  These tests pin the training-side
contract: tiles in the batch stream, parent-level fold isolation, and
stitched prediction through the same grid.
"""

import os

import numpy as np
import pytest

import segmentation_training_pipeline_tpu as stp
from segmentation_training_pipeline_tpu.data.batcher import make_batches
from segmentation_training_pipeline_tpu.data.datasets import (
    CropAndSplitDataSet,
    LambdaDataSet,
    expand_tile_indices,
)


def _quadrant_ds(n_items=6, size=64):
    """Images whose four 32x32 quadrants are constant 10/70/130/190 —
    tiles are exactly identifiable by their mean value."""
    xs, ys = [], []
    for i in range(n_items):
        x = np.zeros((size, size, 3), np.uint8)
        h = size // 2
        x[:h, :h] = 10
        x[:h, h:] = 70
        x[h:, :h] = 130
        x[h:, h:] = 190
        y = np.zeros((size, size), np.uint8)
        y[:h, :h] = 1  # mask lives in the top-left quadrant only
        xs.append(x)
        ys.append(y)
    return LambdaDataSet(xs, ys, ids=[f"img{i}" for i in range(n_items)])


class TestCropAndSplitDataSet:
    def test_len_and_tile_content(self):
        ds = _quadrant_ds(3)
        tiled = CropAndSplitDataSet(ds, 2)
        assert len(tiled) == 12
        means = sorted(round(float(tiled[t].x.mean())) for t in range(4))
        assert means == [10, 70, 130, 190]
        # tile ids encode parent + grid position
        assert tiled[0].id == "img0#t0_0"
        assert tiled[5].id == "img1#t0_1"

    def test_mask_rides_the_same_grid(self):
        tiled = CropAndSplitDataSet(_quadrant_ds(1), 2)
        assert tiled[0].y.all()          # top-left tile: all mask
        assert not tiled[1].y.any()      # others empty
        assert not tiled[3].y.any()

    def test_uneven_grid_covers_everything(self):
        # 65x65 into 2x2: linspace grid gives 33/32 splits, no pixel lost
        xs = [np.arange(65 * 65 * 3, dtype=np.int64).reshape(65, 65, 3) % 255]
        tiled = CropAndSplitDataSet(LambdaDataSet(
            [xs[0].astype(np.uint8)], [np.zeros((65, 65), np.uint8)]), 2)
        total = sum(tiled[t].x.size for t in range(4))
        assert total == 65 * 65 * 3
        # linspace(0, 65, 3).astype(int) = [0, 32, 65]: first split at 32
        assert tiled[0].x.shape == (32, 32, 3)
        assert tiled[3].x.shape == (33, 33, 3)


def test_expand_tile_indices_parent_isolation():
    plan = expand_tile_indices(np.array([2, 5]), 2)
    assert sorted(plan) == [8, 9, 10, 11, 20, 21, 22, 23]
    shuffled = expand_tile_indices(np.array([2, 5]), 2, shuffle_seed=7)
    assert sorted(shuffled) == sorted(plan)
    # deterministic per seed
    np.testing.assert_array_equal(
        shuffled, expand_tile_indices(np.array([2, 5]), 2, shuffle_seed=7))


def test_batch_stream_contains_exact_tiles():
    ds = _quadrant_ds(2)
    tiled = CropAndSplitDataSet(ds, 2)
    plan = expand_tile_indices(np.array([0, 1]), 2)
    batches = list(make_batches(tiled, plan, (32, 32, 3), 1, "sigmoid", 4))
    assert len(batches) == 2
    b0 = batches[0]
    assert b0["image"].shape == (4, 32, 32, 3)
    # quadrants arrive unresized (tile 32x32 == model 32x32): exact values
    np.testing.assert_array_equal(
        np.unique(b0["image"].reshape(4, -1).mean(axis=1)),
        np.array([10.0, 70.0, 130.0, 190.0]))
    # mask only on the top-left tile
    assert b0["mask"][0].all() and not b0["mask"][1:].any()


def _disk_ds(n_items=10, size=64, seed=3):
    """Noise background + bright disk; mask = disk.  Spatially learnable
    per-pixel (brightness -> mask), so tiles train a real model."""
    r = np.random.RandomState(seed)
    xs, ys, yy_xx = [], [], np.mgrid[0:size, 0:size]
    for i in range(n_items):
        x = r.randint(0, 90, size=(size, size, 3)).astype(np.uint8)
        cy, cx = r.randint(12, size - 12, size=2)
        disk = ((yy_xx[0] - cy) ** 2 + (yy_xx[1] - cx) ** 2) < 121
        x[disk] = 220
        ys.append(disk.astype(np.uint8))
        xs.append(x)
    return LambdaDataSet(xs, ys, ids=[f"img{i}" for i in range(n_items)])


@pytest.mark.slow
def test_crops_training_e2e(tmp_path):
    """crops: 2 config on 64² images with a 32² model: train on tiles,
    checkpoint, and stitched directory prediction recovers the full-frame
    mask (the model itself never saw a 64² input)."""
    ds = _disk_ds(16)
    cfg = stp.parse_dict(dict(
        architecture="Unet", backbone="resnet18", shape=[32, 32, 3],
        classes=1, activation="sigmoid", loss="binary_crossentropy",
        batch=8, lr=2e-3, folds_count=2, dtype="float32", crops=2,
        metrics=["iou"], primary_metric="val_iou",
        stages=[{"epochs": 15}]), directory=str(tmp_path))
    res = cfg.fit(ds, foldsToExecute=[0], verbose=0)
    assert res["fold0.stage0"]["epochs"] == 15
    assert os.path.exists(cfg.weights_path(0, 0))

    dst = str(tmp_path / "preds")
    n = cfg.predict_all_to_dir(
        LambdaDataSet([ds[0].x], ids=["probe"]), dst, folds=[0])
    assert n == 1
    import cv2

    mask = cv2.imread(os.path.join(dst, "probe.png"), cv2.IMREAD_GRAYSCALE)
    assert mask.shape == (64, 64)
    truth = ds[0].y.astype(bool)
    pred = mask > 127
    inter = (pred & truth).sum()
    union = (pred | truth).sum()
    assert inter / max(union, 1) > 0.5, f"stitched IoU too low: {inter/max(union,1):.3f}"


def test_make_batches_ram_cache():
    """cache: true — second epoch serves identical pixels without touching
    the dataset again (host decode is the pipeline bound, PERF.md)."""
    calls = {"n": 0}

    class Counting(LambdaDataSet):
        def __getitem__(self, idx):
            calls["n"] += 1
            return super().__getitem__(idx)

    r = np.random.RandomState(0)
    ds = Counting([r.randint(0, 255, (16, 16, 3)).astype(np.uint8)
                   for _ in range(6)],
                  [(r.rand(16, 16) > 0.5).astype(np.uint8) for _ in range(6)])
    cache = {}
    idx = np.arange(6)
    first = list(make_batches(ds, idx, (16, 16, 3), 1, "sigmoid", 3,
                              cache=cache))
    n_after_first = calls["n"]
    assert n_after_first == 6 and len(cache) == 6
    second = list(make_batches(ds, idx, (16, 16, 3), 1, "sigmoid", 3,
                               cache=cache))
    assert calls["n"] == n_after_first  # no re-decode
    for a, b in zip(first, second):
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_array_equal(a["mask"], b["mask"])
