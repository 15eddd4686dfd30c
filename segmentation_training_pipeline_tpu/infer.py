"""Inference: flip-TTA, per-fold ensembling, directory batch prediction.

Reference call stack SURVEY.md §3.3 (``predict_*_to_dir`` family): per fold
load ``weights/best-{fold}.{stage}.weights`` → batch images → predict →
optional flip-TTA average → mean over folds → threshold → resize back →
PNG per input id.  This module keeps that exact surface; the compute is one
jitted program per fold that fuses preprocessing + forward + activation
(+ the flipped pass when TTA is on) on device — TTA costs one extra
forward inside the same XLA program, not a second host round-trip.
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from .config import PipelineConfig
from .data.batcher import prepare_image, prepare_mask
from .data.datasets import DataSet, DirectoryDataSet, PredictionItem
from .models.factory import (
    apply_activation,
    model_from_config,
    template_variables,
)
from .ops.preprocess import preprocess
from .train.checkpoint import load_checkpoint


class InferenceBundle:
    """A model + one variables pytree per requested fold + a jitted
    (optionally TTA-fused) predict function."""

    def __init__(self, cfg: PipelineConfig, folds: Sequence[int], stage: int,
                 tta: Optional[str] = None):
        self.cfg = cfg
        self.tta = tta if tta is not None else (
            "flip" if cfg.flipPred else cfg.testTimeAugmentation)
        if self.tta in ("d4", "full") and cfg.shape[0] != cfg.shape[1]:
            raise ValueError(
                "testTimeAugmentation: d4 needs a square shape (rot90 "
                f"members change H/W), got {cfg.shape[:2]} — use 'flips'")
        self.stage = stage if stage >= 0 else len(cfg.stages) - 1
        self.folds = list(folds)
        # cheap existence check BEFORE the (expensive) model init
        for f in self.folds:
            path = cfg.weights_path(f, self.stage)
            if not os.path.exists(path):
                raise FileNotFoundError(
                    f"no checkpoint for fold {f} stage {self.stage}: {path}")
        # the sidecar records the graph the weights were trained with;
        # prefer it over re-deriving from weight-file resolution (the .h5
        # may have moved since fit — VERDICT r3 item 3)
        from .models.factory import variant_from_checkpoint

        variant = variant_from_checkpoint(
            cfg, [cfg.weights_path(f, self.stage) for f in self.folds])
        self.model = model_from_config(cfg, variant)
        template = template_variables(self.model, cfg.shape)
        self.fold_vars = [
            load_checkpoint(cfg.weights_path(f, self.stage), template)
            for f in self.folds
        ]
        # Data-sharded serving: a single-process host with >1 local device
        # (a v5e-8 serving host, or the 8-device virtual CPU mesh in tests)
        # runs ONE predict program with the batch sharded over a
        # data-parallel mesh — params replicated, N split over ICI, zero
        # change to the program body (GSPMD inserts nothing for an
        # embarrassingly-parallel forward).  Degenerates to plain jit on a
        # 1-device host; multi-process fits keep per-process single-device
        # predict (CLI prediction is primary-only).
        self.mesh = None
        if jax.process_count() == 1 and len(jax.devices()) > 1:
            from .parallel.mesh import MeshSpec, build_mesh, replicated

            self.mesh = build_mesh(MeshSpec(data=len(jax.devices()),
                                            space=1))
            rep = replicated(self.mesh)
            # weights ride to every device ONCE here, not per predict call
            self.fold_vars = [jax.device_put(v, rep)
                              for v in self.fold_vars]
        self._predict = self._build()

    def _build(self):
        model, cfg, tta = self.model, self.cfg, self.tta
        # deterministic `transforms:` preprocessing applies at prediction
        # too (same processing the model trained on); masks don't exist
        # here, so a dummy rides the joint transform and is discarded
        transform_fn = None
        if cfg.transforms:
            from .ops.aug.lowering import build_transform_fn

            _, transform_fn = build_transform_fn(cfg.transforms, [])

        def fwd(variables, x):
            logits = model.apply(variables, x, train=False)
            return apply_activation(logits, cfg.activation)

        def _step(variables, images):
            if transform_fn is not None:
                dummy = jnp.zeros((*images.shape[:3], 1), jnp.float32)
                images, _ = transform_fn(images, dummy)
            x = preprocess(images, cfg.preprocessing or "tf", model.dtype)
            p = fwd(variables, x)
            if tta in ("flip", "hflip", True):
                p = (p + fwd(variables, x[:, :, ::-1, :])[:, :, ::-1, :]) / 2.0
            elif tta in ("flips", "d4_subset", "hvflip"):
                acc = p
                acc = acc + fwd(variables, x[:, :, ::-1, :])[:, :, ::-1, :]
                acc = acc + fwd(variables, x[:, ::-1, :, :])[:, ::-1, :, :]
                acc = acc + fwd(variables, x[:, ::-1, ::-1, :])[:, ::-1, ::-1, :]
                p = acc / 4.0
            elif tta in ("d4", "full"):
                # all 8 dihedral symmetries (I, H, V, R180=HV, R90, R270,
                # transpose, anti-transpose), fused into ONE jit like the
                # other modes; square frames only (rot90 changes H/W)
                def anti(z):  # anti-diagonal reflection, an involution
                    return jnp.swapaxes(z, 1, 2)[:, ::-1, ::-1, :]

                acc = p
                acc = acc + fwd(variables, x[:, :, ::-1, :])[:, :, ::-1, :]
                acc = acc + fwd(variables, x[:, ::-1, :, :])[:, ::-1, :, :]
                acc = acc + fwd(variables, x[:, ::-1, ::-1, :])[:, ::-1, ::-1, :]
                for k in (1, 3):
                    xr = jnp.rot90(x, k, axes=(1, 2))
                    acc = acc + jnp.rot90(fwd(variables, xr), -k, axes=(1, 2))
                xt = jnp.swapaxes(x, 1, 2)  # main-diagonal reflection
                acc = acc + jnp.swapaxes(fwd(variables, xt), 1, 2)
                acc = acc + anti(fwd(variables, anti(x)))
                p = acc / 8.0
            return p

        if self.mesh is not None:
            from .parallel.mesh import batch_sharding, replicated

            return jax.jit(
                _step,
                in_shardings=(replicated(self.mesh),
                              batch_sharding(self.mesh)),
                out_shardings=batch_sharding(self.mesh))
        return jax.jit(_step)

    def predict_probs(self, images_u8: np.ndarray) -> np.ndarray:
        """(B, H, W, C) uint8 at config shape → fold-ensembled probs (f32).

        Under the data-sharded mesh the batch is zero-padded up to a
        multiple of the device count (padded rows sliced off the result) —
        callers chunk at a fixed batch size, so at most one extra program
        shape compiles."""
        n = int(images_u8.shape[0])
        nd = int(self.mesh.devices.size) if self.mesh is not None else 1
        if n % nd:
            images_u8 = np.concatenate([
                np.asarray(images_u8),
                np.zeros((nd - n % nd, *images_u8.shape[1:]),
                         np.asarray(images_u8).dtype)])
        acc = None
        for variables in self.fold_vars:
            p = self._predict(variables, images_u8)
            acc = p if acc is None else acc + p
        return np.asarray(acc / len(self.fold_vars), dtype=np.float32)[:n]


def _resolve_folds(cfg: PipelineConfig, folds, stage: int) -> List[int]:
    if folds is not None:
        return list(folds) if not isinstance(folds, int) else [folds]
    st = stage if stage >= 0 else len(cfg.stages) - 1
    found = [f for f in range(cfg.folds_count)
             if os.path.exists(cfg.weights_path(f, st))]
    if not found:
        raise FileNotFoundError(
            f"no trained fold checkpoints for stage {st} under {cfg.weights_dir}")
    return found


def load_model(cfg: PipelineConfig, fold: Union[int, Sequence[int]] = 0,
               stage: int = -1) -> InferenceBundle:
    folds = [fold] if isinstance(fold, int) else list(fold)
    return InferenceBundle(cfg, folds, stage)


# ---------------------------------------------------------------------------
# crops: N×N tile split + stitch (reference `crops:` config — SURVEY §5)
# ---------------------------------------------------------------------------

def _predict_full_image(bundle: InferenceBundle, batch_items: List[np.ndarray],
                        batch_size: int) -> List[np.ndarray]:
    """Predict a list of HWC uint8 images (any sizes) → per-image prob maps
    at ORIGINAL sizes, honoring cfg.crops tiling."""
    import cv2

    cfg = bundle.cfg
    h, w, _ = cfg.shape
    crops = cfg.crops or 1

    # build the (image_idx, tile_row, tile_col, tile_box) work list
    work = []
    for i, img in enumerate(batch_items):
        H, W = img.shape[:2]
        if crops == 1:
            work.append((i, 0, 0, (0, 0, H, W)))
        else:
            hs = np.linspace(0, H, crops + 1).astype(int)
            ws = np.linspace(0, W, crops + 1).astype(int)
            for r in range(crops):
                for c in range(crops):
                    work.append((i, r, c, (hs[r], ws[c], hs[r + 1], ws[c + 1])))

    outs: List[Optional[np.ndarray]] = [None] * len(batch_items)
    for i, img in enumerate(batch_items):
        outs[i] = np.zeros((*img.shape[:2], cfg.classes), np.float32)

    for start in range(0, len(work), batch_size):
        chunk = work[start : start + batch_size]
        tiles = []
        for (i, r, c, (y0, x0, y1, x1)) in chunk:
            tiles.append(prepare_image(batch_items[i][y0:y1, x0:x1], cfg.shape))
        arr = np.stack(tiles)
        if len(chunk) < batch_size:  # pad to the jitted static batch
            arr = np.concatenate(
                [arr, np.zeros((batch_size - len(chunk), *arr.shape[1:]),
                               arr.dtype)])
        probs = bundle.predict_probs(arr)
        for k, (i, r, c, (y0, x0, y1, x1)) in enumerate(chunk):
            tile_p = cv2.resize(probs[k], (x1 - x0, y1 - y0),
                                interpolation=cv2.INTER_LINEAR)
            if tile_p.ndim == 2:
                tile_p = tile_p[:, :, None]
            outs[i][y0:y1, x0:x1] = tile_p
    return outs  # type: ignore[return-value]


# ---------------------------------------------------------------------------
# public prediction surface
# ---------------------------------------------------------------------------

def predict_on_dataset(cfg: PipelineConfig, dataset: DataSet,
                       folds=None, stage: int = -1, batch_size: Optional[int] = None,
                       ttflips=None) -> Iterator[PredictionItem]:
    """Yield PredictionItems with ``.prediction`` filled (probs at original
    image size, fold-ensembled, TTA per config)."""
    folds = _resolve_folds(cfg, folds, stage)
    bundle = InferenceBundle(cfg, folds, stage,
                             tta=ttflips if ttflips is not None else None)
    bs = batch_size or cfg.batch
    buf_items: List[PredictionItem] = []

    def flush():
        probs = _predict_full_image(bundle, [it.x for it in buf_items], bs)
        for it, p in zip(buf_items, probs):
            it.prediction = p
            yield it
        buf_items.clear()

    for i in range(len(dataset)):
        buf_items.append(dataset[i])
        if len(buf_items) >= bs:
            yield from flush()
    if buf_items:
        yield from flush()


def predict_all_to_dir(cfg: PipelineConfig, src, dst: str, folds=None,
                       stage: int = -1, threshold: Optional[float] = None,
                       batch_size: Optional[int] = None, ttflips=None) -> int:
    """Directory (or DataSet) → PNG masks in ``dst``.  Returns file count.

    Binary/sigmoid: 0/255 mask PNG per class-0 channel.  Softmax: argmax
    class-index PNG.  Matches the reference's threshold+PNG contract
    (SURVEY §3.3).
    """
    import cv2

    ds = DirectoryDataSet(src) if isinstance(src, str) else src
    os.makedirs(dst, exist_ok=True)
    thr = cfg.threshold if threshold is None else threshold
    n = 0
    for item in predict_on_dataset(cfg, ds, folds=folds, stage=stage,
                                   batch_size=batch_size, ttflips=ttflips):
        p = item.prediction
        if cfg.activation == "softmax" and cfg.classes > 1:
            mask = np.argmax(p, axis=-1).astype(np.uint8)
        else:
            mask = ((p[:, :, 0] >= thr) * 255).astype(np.uint8)
        cv2.imwrite(os.path.join(dst, f"{item.id}.png"), mask)
        n += 1
    return n


def _metric_batch_fn(names: Sequence[str], activation: str):
    """One jitted program computing per-example values of every requested
    registry metric over a stacked batch — the SAME functions the epoch
    ``val_*`` path runs (ops/metrics.py), so ``evaluate()`` cannot diverge
    from training-time validation (VERDICT r2 item 5: the old host-numpy
    duplicate supported 5 metric families and marked softmax TIES as
    all-ones, inflating intersections; the registry's argmax one-hot does
    not)."""
    from .ops import metrics as _metrics

    fns = {nm: _metrics.get(nm) for nm in names}

    def per_example(y, p):
        return {nm: fn(y[None], p[None], activation)
                for nm, fn in fns.items()}

    return jax.jit(jax.vmap(per_example))


def predict_to_csv(cfg: PipelineConfig, src, csv_path: str, folds=None,
                   stage: int = -1, threshold: Optional[float] = None,
                   batch_size: Optional[int] = None,
                   id_column: str = "id", rle_column: str = "rle_mask") -> int:
    """Kaggle-style RLE submission: one row per input id (reference-era
    TGS-salt workflow; SURVEY §2a 'RLE / competition utils')."""
    import csv as _csv

    from .utils.rle import rle_encode

    ds = DirectoryDataSet(src) if isinstance(src, str) else src
    thr = cfg.threshold if threshold is None else threshold
    n = 0
    os.makedirs(os.path.dirname(os.path.abspath(csv_path)), exist_ok=True)
    with open(csv_path, "w", newline="") as f:
        w = _csv.writer(f)
        w.writerow([id_column, rle_column])
        for item in predict_on_dataset(cfg, ds, folds=folds, stage=stage,
                                       batch_size=batch_size):
            if cfg.activation == "softmax" and cfg.classes > 1:
                # channel 0 is background: foreground = argmax != 0
                # (mirrors predict_all_to_dir's softmax handling)
                mask = item.prediction.argmax(axis=-1) > 0
            else:
                mask = (item.prediction[:, :, 0] >= thr)
            w.writerow([item.id, rle_encode(mask)])
            n += 1
    return n


def evaluate(cfg: PipelineConfig, dataset: DataSet, folds=None,
             stage: int = -1, batch_size: Optional[int] = None,
             threshold: Optional[float] = None) -> Dict[str, float]:
    """Dataset-level metrics with the full inference pipeline (TTA +
    ensembling) at original image sizes.  Reference ``cfg.evaluate…``
    family.

    Metric math is the jitted registry path validation uses — items are
    bucketed by (mask, prediction) shape, stacked to ``batch_size``, and a
    single per-example metric program runs per bucket flush (one compile
    per distinct image size, no per-item device round-trips).  A
    non-default ``threshold`` pre-binarizes sigmoid probabilities (the
    registry metrics themselves binarize at 0.5, idempotent on 0/1 input);
    softmax metrics use argmax regardless of threshold."""
    names = list(cfg.metrics) or ["iou", "dice"]
    thr = cfg.threshold if threshold is None else threshold
    batch_fn = _metric_batch_fn(names, cfg.activation)
    bs = batch_size or cfg.batch
    sums = {nm: 0.0 for nm in names}
    count = 0
    buckets: Dict[tuple, list] = {}

    def flush(key):
        ys, ps = zip(*buckets.pop(key))
        n = len(ys)
        ys_, ps_ = np.stack(ys), np.stack(ps)
        if n < bs:  # pad to the static batch; padded rows are dropped below
            pad = bs - n
            ys_ = np.concatenate(
                [ys_, np.zeros((pad, *ys_.shape[1:]), ys_.dtype)])
            ps_ = np.concatenate(
                [ps_, np.zeros((pad, *ps_.shape[1:]), ps_.dtype)])
        out = jax.device_get(batch_fn(ys_, ps_))
        for nm in names:
            sums[nm] += float(np.asarray(out[nm])[:n].sum())

    for item in predict_on_dataset(cfg, dataset, folds=folds, stage=stage,
                                   batch_size=batch_size):
        if item.y is None:
            continue
        y = prepare_mask(item.y, (*item.prediction.shape[:2], 3),
                         cfg.classes, cfg.activation).astype(np.float32)
        p = np.asarray(item.prediction, np.float32)
        if thr != 0.5 and cfg.activation != "softmax":
            p = (p >= thr).astype(np.float32)
        key = (y.shape, p.shape)
        buckets.setdefault(key, []).append((y, p))
        count += 1
        if len(buckets[key]) >= bs:
            flush(key)
    for key in list(buckets):
        flush(key)
    if count == 0:
        return {}
    return {nm: s / count for nm, s in sums.items()}
