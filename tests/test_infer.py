import os

import numpy as np
import pytest

import segmentation_training_pipeline_tpu as stp


class _SquareDS(stp.DataSet):
    def __init__(self, n=12, size=32):
        self.n, self.size = n, size

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        r = np.random.RandomState(100 + i)
        s = self.size
        y = np.zeros((s, s), np.uint8)
        y[s // 4: 3 * s // 4, s // 4: 3 * s // 4] = 1
        x = (np.repeat(y[:, :, None], 3, -1) * 180
             + r.randint(0, 60, (s, s, 3))).astype(np.uint8)
        return stp.PredictionItem(f"sq{i}", x, y)


@pytest.fixture(scope="module")
def trained2(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("infer")
    cfg = stp.parse_dict(
        dict(architecture="Unet", backbone="resnet18", shape=[32, 32, 3],
             classes=1, activation="sigmoid", loss="binary_crossentropy",
             lr=2e-3, batch=4, metrics=["iou"], primary_metric="val_iou",
             folds_count=2, dtype="float32", stages=[{"epochs": 4}]),
        directory=str(tmp))
    ds = _SquareDS()
    cfg.fit(ds, verbose=0)  # both folds
    return cfg, ds, tmp


class TestPredict:
    def test_predict_on_dataset_fills_predictions(self, trained2):
        cfg, ds, tmp = trained2
        items = list(cfg.predict_on_dataset(ds))
        assert len(items) == len(ds)
        p = items[0].prediction
        assert p.shape == (32, 32, 1)
        assert 0.0 <= p.min() and p.max() <= 1.0

    def test_fold_ensemble_uses_all_trained_folds(self, trained2):
        cfg, ds, tmp = trained2
        from segmentation_training_pipeline_tpu.infer import _resolve_folds

        assert _resolve_folds(cfg, None, -1) == [0, 1]

    def test_predict_all_to_dir_writes_masks(self, trained2):
        cfg, ds, tmp = trained2
        import cv2

        dst = str(tmp / "preds")
        n = cfg.predict_all_to_dir(ds, dst)
        assert n == len(ds)
        m = cv2.imread(os.path.join(dst, "sq0.png"), cv2.IMREAD_GRAYSCALE)
        assert m.shape == (32, 32)
        assert set(np.unique(m)) <= {0, 255}
        # the trained model should mostly recover the center square
        inner = m[12:20, 12:20]
        assert (inner == 255).mean() > 0.5

    def test_flip_tta_runs_and_close_to_plain(self, trained2):
        cfg, ds, tmp = trained2
        from segmentation_training_pipeline_tpu.infer import InferenceBundle
        from segmentation_training_pipeline_tpu.data.batcher import prepare_image

        imgs = np.stack([prepare_image(ds[i].x, cfg.shape) for i in range(4)])
        plain = InferenceBundle(cfg, [0], 0, tta=None).predict_probs(imgs)
        tta = InferenceBundle(cfg, [0], 0, tta="flip").predict_probs(imgs)
        assert tta.shape == plain.shape
        assert np.abs(tta - plain).mean() < 0.2  # same model, averaged views

    def test_predict_is_data_sharded_on_multidevice_host(self, trained2):
        """Single-process multi-device host: the bundle must build a
        data-parallel mesh, shard predict over it, pad a non-divisible
        batch internally, and match the unsharded program exactly (same
        weights, same math — GSPMD only splits N)."""
        cfg, ds, tmp = trained2
        import jax

        from segmentation_training_pipeline_tpu.data.batcher import (
            prepare_image)
        from segmentation_training_pipeline_tpu.infer import InferenceBundle

        nd = len(jax.devices())
        assert nd == 8, "conftest should expose the 8-device CPU mesh"
        bundle = InferenceBundle(cfg, [0], 0, tta=None)
        assert bundle.mesh is not None
        assert bundle.mesh.devices.size == nd
        # weights were replicated at build time, not shipped per call
        leaf = jax.tree.leaves(bundle.fold_vars[0])[0]
        assert len(leaf.sharding.device_set) == nd

        # n=6 is NOT divisible by 8 — exercises the internal padding
        imgs = np.stack([prepare_image(ds[i].x, cfg.shape) for i in range(6)])
        sharded = bundle.predict_probs(imgs)
        assert sharded.shape == (6, 32, 32, 1)

        # oracle: the same variables through an unsharded apply
        from segmentation_training_pipeline_tpu.models.factory import (
            apply_activation)
        from segmentation_training_pipeline_tpu.ops.preprocess import (
            preprocess)

        x = preprocess(jax.device_put(imgs, jax.devices()[0]),
                       cfg.preprocessing or "tf", bundle.model.dtype)
        ref = apply_activation(
            bundle.model.apply(jax.device_get(bundle.fold_vars[0]), x,
                               train=False), cfg.activation)
        np.testing.assert_allclose(sharded, np.asarray(ref), atol=1e-5)

    def test_missing_checkpoint_raises(self, trained2):
        cfg, ds, tmp = trained2
        from segmentation_training_pipeline_tpu.infer import InferenceBundle

        with pytest.raises(FileNotFoundError, match="fold 5"):
            InferenceBundle(cfg, [5], 0)

    def test_evaluate_returns_metrics(self, trained2):
        cfg, ds, tmp = trained2
        res = cfg.evaluate(ds)
        assert "iou" in res
        assert 0.1 < res["iou"] <= 1.0  # toy 4-epoch model: weak but real signal

    def test_load_model_api(self, trained2):
        cfg, ds, tmp = trained2
        bundle = cfg.load(fold=0, stage=0)
        assert bundle.folds == [0]

    def test_evaluate_agrees_with_epoch_val_metrics(self, trained2):
        """VERDICT r2 item 5: evaluate() must run the SAME jitted metric
        path as training-time validation — check agreement to 1e-6 against
        build_eval_step on identical items (fold 0, no TTA, images at
        config shape so the predict pipeline is resize-free)."""
        from collections import namedtuple

        from segmentation_training_pipeline_tpu.data.batcher import (
            prepare_image,
            prepare_mask,
        )
        from segmentation_training_pipeline_tpu.models.factory import (
            model_from_config,
            template_variables,
        )
        from segmentation_training_pipeline_tpu.ops import metrics as M
        from segmentation_training_pipeline_tpu.ops.losses import build_loss
        from segmentation_training_pipeline_tpu.train.checkpoint import (
            load_checkpoint,
        )
        from segmentation_training_pipeline_tpu.train.step import (
            build_eval_step,
        )

        cfg, ds, tmp = trained2
        model = model_from_config(cfg)
        variables = load_checkpoint(
            cfg.weights_path(0, 0), template_variables(model, cfg.shape))
        state = namedtuple("S", "params batch_stats")(
            variables["params"], variables.get("batch_stats", {}))
        eval_step = build_eval_step(
            model, build_loss(cfg.loss, cfg.activation),
            {"iou": M.get("iou"), "soft_iou": M.get("soft_iou")},
            cfg.activation, cfg.preprocessing)

        vals = {"iou": [], "soft_iou": []}
        bs = cfg.batch
        for start in range(0, len(ds), bs):
            items = [ds[i] for i in range(start, min(start + bs, len(ds)))]
            batch = {
                "image": np.stack([prepare_image(it.x, cfg.shape)
                                   for it in items]),
                "mask": np.stack([prepare_mask(it.y, cfg.shape, cfg.classes,
                                               cfg.activation)
                                  for it in items]),
                "weight": np.ones(len(items), np.float32),
            }
            logs = eval_step(state, batch)
            for nm in vals:
                vals[nm].extend(np.asarray(logs[nm]).tolist())

        # soft_iou was a KeyError in the old host-numpy evaluate
        want_cfg_metrics = cfg.metrics
        try:
            cfg.metrics = ["iou", "soft_iou"]
            got = cfg.evaluate(ds, folds=[0])
        finally:
            cfg.metrics = want_cfg_metrics
        for nm in vals:
            assert abs(got[nm] - float(np.mean(vals[nm]))) < 1e-6, nm


class TestPredictCSV:
    def test_rle_submission(self, trained2, tmp_path):
        cfg, ds, tmp = trained2
        from segmentation_training_pipeline_tpu.utils.rle import rle_decode

        path = str(tmp_path / "sub.csv")
        n = cfg.predict_to_csv(ds, path)
        assert n == len(ds)
        rows = open(path).read().strip().split("\n")
        assert rows[0] == "id,rle_mask"
        assert len(rows) == len(ds) + 1
        # decoded RLE must reproduce the thresholded prediction
        rid, rle = rows[1].split(",", 1)
        item = next(iter(cfg.predict_on_dataset(ds)))
        want = item.prediction[:, :, 0] >= cfg.threshold
        got = rle_decode(rle.strip('"'), want.shape)
        assert (got == want).mean() > 0.99


class TestCrops:
    def test_crop_split_prediction_shape(self, trained2):
        cfg, ds, tmp = trained2
        import dataclasses

        cfg2 = dataclasses.replace(cfg, crops=2)
        big = np.zeros((64, 64, 3), np.uint8)
        big[16:48, 16:48] = 180
        one = stp.data.datasets.LambdaDataSet([big], [None], ids=["big"])
        from segmentation_training_pipeline_tpu.infer import predict_on_dataset

        items = list(predict_on_dataset(cfg2, one, folds=[0], stage=0))
        assert items[0].prediction.shape == (64, 64, 1)


class TestD4TTA:
    def test_d4_runs_and_is_dihedral_invariant(self, trained2):
        """D4-averaged probabilities must be (numerically) invariant under
        any dihedral transform of the input — the defining property of
        full-group TTA, and one partial modes don't have."""
        cfg, ds, tmp = trained2
        from segmentation_training_pipeline_tpu.data.batcher import (
            prepare_image)
        from segmentation_training_pipeline_tpu.infer import InferenceBundle

        imgs = np.stack([prepare_image(ds[i].x, cfg.shape)
                         for i in range(2)])
        bundle = InferenceBundle(cfg, [0], 0, tta="d4")
        p = bundle.predict_probs(imgs)
        assert p.shape[:3] == imgs.shape[:3]
        # rotate the INPUT by 90 deg: the d4-averaged field must rotate
        # with it (group closure)
        rot = np.rot90(imgs, 1, axes=(1, 2)).copy()
        p_rot = bundle.predict_probs(rot)
        np.testing.assert_allclose(np.rot90(p, 1, axes=(1, 2)), p_rot,
                                   atol=1e-4)
        # and flipping too
        p_flip = bundle.predict_probs(imgs[:, :, ::-1].copy())
        np.testing.assert_allclose(p[:, :, ::-1], p_flip, atol=1e-4)

    def test_d4_rejects_nonsquare(self, trained2):
        cfg, ds, tmp = trained2
        from segmentation_training_pipeline_tpu.infer import InferenceBundle

        orig = cfg.shape
        object.__setattr__(cfg, "shape", (32, 64, 3))
        try:
            with pytest.raises(ValueError, match="square"):
                InferenceBundle(cfg, [0], 0, tta="d4")
        finally:
            object.__setattr__(cfg, "shape", orig)
