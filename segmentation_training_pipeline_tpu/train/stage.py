"""K-fold × multi-stage training orchestrator.

The product's main loop — reference call stack SURVEY.md §3.2
(``cfg.fit(ds)`` → per-fold model build → per-stage compile/fit with
negatives handling, best-checkpointing, CSV metrics, best-weights carry
into the next stage).  TPU-native re-design:

  * one jitted train/eval program per stage (loss/freeze changes retrace at
    stage boundaries only; lr changes are runtime scalars);
  * the mesh is chosen once per fit: all devices on the ``data`` axis when
    the global batch divides, with spatial partitioning opt-in via
    ``mesh: {space: N}`` in YAML;
  * ``fit`` is idempotent per (fold, stage): completed pairs (checkpoint +
    ``done`` marker in the sidecar) are skipped on re-run — the reference's
    crash-resume story (`start_from_stage` + best-weights reload) without
    manual bookkeeping (SURVEY §5 'Failure detection').
"""

from __future__ import annotations

import math
import os
import time
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import METRICS, PipelineConfig
from ..data.batcher import Prefetcher, make_batches
from ..data.datasets import (CropAndSplitDataSet, KFoldedDataSet,
                             expand_tile_indices)
from ..models.factory import init_model, model_from_config, template_variables
from ..ops.losses import build_loss
from ..parallel import distributed as dist
from ..parallel.mesh import MeshSpec, build_mesh, replicated
from . import callbacks as cb
from .checkpoint import checkpoint_meta, load_checkpoint, save_checkpoint
from .optimizers import build_optimizer
from .step import TrainState, build_eval_step, build_train_step, create_train_state


def _gcd_mesh(cfg: PipelineConfig):
    """Pick the data-parallel width: explicit from YAML, else the largest
    device count that divides the global batch (1 → plain jit)."""
    n_dev = len(jax.devices())
    if cfg.mesh:
        return build_mesh(MeshSpec.from_config(cfg.mesh))
    if jax.process_count() > 1:
        # multi-process: every process's devices must participate (a mesh
        # over a device subset would deadlock the others), so the global
        # batch has to cover the full fleet
        if cfg.batch % n_dev:
            raise ValueError(
                f"multi-host run: global batch {cfg.batch} must be divisible "
                f"by the global device count {n_dev} (or set mesh: in YAML)")
        return build_mesh(MeshSpec(data=n_dev, space=1))
    n_data = math.gcd(cfg.batch, n_dev)
    return build_mesh(MeshSpec(data=n_data, space=1),
                      devices=jax.devices()[:n_data])


def _metric_fns(cfg: PipelineConfig):
    from ..config import _populate_registries

    _populate_registries()
    return {name: METRICS.get(name) for name in cfg.metrics}


def _weighted_epoch_mean(batches: List[Dict[str, np.ndarray]]) -> Dict[str, float]:
    """Per-batch weighted-sum eval logs → padding-corrected epoch means.

    Each entry holds scalar ``sum(v * w)`` values plus the scalar weight
    sum — reduced ON DEVICE (``_reduce_per_example``) so the arrays that
    reach the host are fully replicated: per-example sharded outputs are
    not addressable from one process in a multi-host run.
    """
    if not batches:
        return {}
    wsum = max(sum(float(b["weight"]) for b in batches), 1.0)
    return {k: sum(float(b[k]) for b in batches) / wsum
            for k in batches[0] if k != "weight"}


@jax.jit
def _reduce_per_example(logs):
    """Per-example eval logs {k: (B,), 'weight': (B,)} → replicated scalar
    weighted sums (the only cross-host-safe thing to device_get)."""
    w = logs["weight"]
    out = {k: (v * w).sum() for k, v in logs.items() if k != "weight"}
    out["weight"] = w.sum()
    return out


def _build_aug_fn(cfg: PipelineConfig):
    """→ (train_aug_fn, transform_fn).

    ``transforms:`` is deterministic preprocessing applied to train AND
    val/predict (fixed RNG key — reference applies transforms to every
    split; round-1 applied them train-only, so eval saw differently-
    processed data).  ``augmentation:`` is stochastic and train-only,
    applied AFTER the transforms.
    """
    from ..ops.aug.lowering import build_transform_fn

    return build_transform_fn(cfg.transforms, cfg.augmentation)


class _BestTracker:
    def __init__(self, monitor: str, mode: str):
        self.monitor = monitor
        self.mode = mode
        self.best = math.inf if mode == "min" else -math.inf

    def update(self, logs: Dict[str, float]) -> bool:
        cur = logs.get(self.monitor)
        if cur is None or not math.isfinite(cur):
            return False
        better = cur < self.best if self.mode == "min" else cur > self.best
        if better:
            self.best = cur
        return better


def fit_pipeline(cfg: PipelineConfig, dataset,
                 foldsToExecute: Optional[Sequence[int]] = None,
                 start_from_stage: int = 0,
                 drop_incomplete: bool = False,
                 verbose: Optional[int] = None) -> Dict[str, Dict]:
    """Train all requested folds through all stages.  Returns per-(fold,
    stage) summary dicts (best metric, epochs run, checkpoint path)."""
    if not cfg.debug:
        return _fit_pipeline(cfg, dataset, foldsToExecute, start_from_stage,
                             drop_incomplete, verbose)
    # SURVEY §5 'race detection / sanitizers' analog: fail fast on the
    # first non-finite value in any jitted program — scoped to this fit
    # so other configs in the process don't inherit the global flag
    prev = bool(jax.config.jax_debug_nans)
    jax.config.update("jax_debug_nans", True)
    try:
        return _fit_pipeline(cfg, dataset, foldsToExecute, start_from_stage,
                             drop_incomplete, verbose)
    finally:
        jax.config.update("jax_debug_nans", prev)


def _fit_pipeline(cfg: PipelineConfig, dataset,
                  foldsToExecute: Optional[Sequence[int]] = None,
                  start_from_stage: int = 0,
                  drop_incomplete: bool = False,
                  verbose: Optional[int] = None) -> Dict[str, Dict]:
    verbose = cfg.verbose if verbose is None else verbose
    mesh = _gcd_mesh(cfg)
    # resume must rebuild the SAME graph the checkpoints were trained
    # with, even if the original encoder_weights .h5 has since moved —
    # prefer any existing sidecar's recorded variant (VERDICT r3 item 3)
    from ..models.factory import variant_from_checkpoint

    existing = [cfg.weights_path(f, s) for f in range(cfg.folds_count)
                for s in range(len(cfg.stages))]
    model = model_from_config(cfg, variant_from_checkpoint(cfg, existing))
    metric_fns = _metric_fns(cfg)
    aug_fn, transform_fn = _build_aug_fn(cfg)
    kfold = (dataset if isinstance(dataset, KFoldedDataSet)
             else cfg.kfold(dataset))
    # crops: N — train on N×N tiles of the original images (reference
    # crop-split wrapper).  Folds/negatives stay parent-level (no tile
    # leakage across train/val); the index plans expand to tiles below.
    train_ds = kfold.dataset
    if cfg.crops:
        train_ds = CropAndSplitDataSet(kfold.dataset, cfg.crops)
    # cache: true — decoded-item RAM cache shared across folds/stages/epochs
    # (host image decode is the pipeline bound at 512², PERF.md)
    item_cache = {} if cfg.cache else None

    folds = list(foldsToExecute) if foldsToExecute is not None \
        else list(range(cfg.folds_count))
    monitor = cfg.primary_metric
    mode = cfg.primary_mode()

    results: Dict[str, Dict] = {}
    for fold in folds:
        variables = None  # lazy: skipped stages never touch the device

        def ensure_variables(v, fold=fold):
            if v is None:
                v = init_model(model, cfg.shape, seed=cfg.random_state + fold)
                if cfg.encoder_weights:
                    from ..models.pretrained import load_encoder_weights

                    loaded = load_encoder_weights(
                        cfg.backbone, cfg.encoder_weights, jax.device_get(v))
                    if loaded is not None:
                        v = loaded
            return jax.device_put(jax.device_get(v), replicated(mesh))

        frozen = cfg.freeze_encoder
        for si, stage in enumerate(cfg.stages):
            key = f"fold{fold}.stage{si}"
            ckpt_path = cfg.weights_path(fold, si)
            meta = checkpoint_meta(ckpt_path)
            if si < start_from_stage or (meta and meta.get("done")):
                # skip completed stage; pick up its best weights if present
                if os.path.exists(ckpt_path):
                    variables = load_checkpoint(
                        ckpt_path, template_variables(model, cfg.shape))
                    results[key] = {"skipped": True, "checkpoint": ckpt_path,
                                    **({k: meta[k] for k in ("best",)
                                        if meta and k in meta})}
                continue
            variables = ensure_variables(variables)

            # --- stage setup --------------------------------------------
            if stage.unfreeze_encoder:
                frozen = False
            if stage.freeze_encoder is not None:
                frozen = stage.freeze_encoder
            if stage.initial_weights:
                p = stage.initial_weights
                if not os.path.isabs(p):
                    p = os.path.join(cfg.directory, p)
                variables = load_checkpoint(p, jax.device_get(variables))
                variables = jax.device_put(variables, replicated(mesh))

            batch = stage.batch or cfg.batch
            # per-stage batch overrides must stay shardable on the mesh's
            # data axis; rebuild a narrower mesh if not (explicit YAML
            # meshes are a hard contract -> clear error instead)
            stage_mesh = mesh
            n_data = mesh.devices.shape[0]
            if batch % n_data != 0:
                if cfg.mesh:
                    raise ValueError(
                        f"stage {si} batch {batch} is not divisible by the "
                        f"configured mesh data axis ({n_data})")
                if jax.process_count() > 1:
                    # same rule as _gcd_mesh: a narrower mesh would leave
                    # other processes' devices out of the collectives and
                    # deadlock the fleet — hard error, not a quiet rebuild
                    raise ValueError(
                        f"multi-host run: stage {si} batch {batch} must be "
                        f"divisible by the global device count "
                        f"{len(jax.devices())} (or set mesh: in YAML)")
                nd = math.gcd(batch, len(jax.devices()))
                stage_mesh = build_mesh(MeshSpec(data=nd, space=1),
                                        devices=jax.devices()[:nd])
            loss_expr = stage.loss or cfg.loss
            loss_fn = build_loss(loss_expr, cfg.activation, cfg.class_weights)
            tx = build_optimizer(cfg, freeze_encoder=frozen)
            train_step = build_train_step(
                model, tx, loss_fn, metric_fns, cfg.activation,
                cfg.preprocessing, aug_fn=aug_fn,
                donate=cfg.donate and not cfg.debug,
                # debug: true -> cheap jax_debug_nans (fit_pipeline scope);
                # debug: checks -> full checkify float/index instrumentation
                # (expensive compile, deepest sanitizer level)
                debug_checks=(cfg.debug == "checks"))
            eval_step = build_eval_step(
                model, loss_fn, metric_fns, cfg.activation, cfg.preprocessing,
                transform_fn=transform_fn)
            state = create_train_state(model, variables, tx)
            state = jax.device_put(state, replicated(stage_mesh))

            base_lr = stage.lr if stage.lr is not None else cfg.lr
            control = cb.TrainingControl(base_lr=base_lr)
            cbs = [c for c in
                   (cb.instantiate(s, cfg.directory)
                    for s in (cfg.callbacks + stage.callbacks))
                   if c is not None]
            # a checkpoint without a done-marker means this stage crashed
            # mid-run — append to its metrics history instead of truncating
            resuming = meta is not None and not meta.get("done")
            if dist.is_primary():  # multi-host: one writer per shared FS
                csv = cb.CSVLogger(cfg.metrics_path(fold, si),
                                   append=resuming)
                cbs.append(csv)
            for c in cbs:
                c.on_train_begin(control)
            tracker = _BestTracker(monitor, mode)
            negatives = stage.negatives if stage.negatives is not None \
                else cfg.negatives
            val_negatives = (stage.validation_negatives
                             if stage.validation_negatives is not None
                             else cfg.validation_negatives)
            val_idx = kfold.val_indices(fold, val_negatives)
            if cfg.crops:
                val_idx = expand_tile_indices(val_idx, cfg.crops)
            rng = jax.random.PRNGKey(cfg.random_state * 1000 + fold * 10 + si)

            if verbose:
                n_dev = int(np.prod(stage_mesh.devices.shape))
                print(f"[fold {fold} stage {si}] epochs={stage.epochs} "
                      f"lr={base_lr} loss={loss_expr} frozen={frozen} "
                      f"batch={batch} mesh={n_dev}dev")

            # SURVEY §5 tracing: optional jax.profiler capture of the first
            # trained epoch (post-compile steps) → Perfetto-compatible trace
            profile_dir = None
            if cfg.profile:
                profile_dir = (cfg.profile if isinstance(cfg.profile, str)
                               else os.path.join(cfg.directory, "profile"))
                profile_dir = os.path.join(profile_dir, f"fold{fold}.stage{si}")

            epochs_run = 0
            for epoch in range(stage.epochs):
                t0 = time.time()
                # trace epoch 1 (epoch 0 is compile noise) — unless the
                # stage only has one epoch, then trace what exists
                tracing = profile_dir is not None and (
                    epoch == 1 or (stage.epochs == 1 and epoch == 0))
                if tracing:
                    jax.profiler.start_trace(profile_dir)
                plan = kfold.epoch_indices(fold, epoch, negatives)
                if cfg.crops:
                    plan = expand_tile_indices(
                        plan, cfg.crops,
                        shuffle_seed=cfg.random_state * 31 + fold * 7 + epoch)
                if stage.steps_per_epoch:
                    plan = plan[: stage.steps_per_epoch * batch]
                gen = lambda: make_batches(  # noqa: E731
                    train_ds, plan, cfg.shape, cfg.classes,
                    cfg.activation, batch, cache=item_cache)
                train_logs = []
                for b in Prefetcher(gen, mesh=stage_mesh, depth=cfg.prefetch):
                    for c in cbs:
                        c.on_batch_begin(control)
                    lr_now = jnp.asarray(control.effective_lr, jnp.float32)
                    state, logs = train_step(state, b, lr_now, rng)
                    train_logs.append(logs)
                    control.global_step += 1

                vgen = lambda: make_batches(  # noqa: E731
                    train_ds, val_idx, cfg.shape, cfg.classes,
                    cfg.activation, batch, cache=item_cache)
                val_logs = []
                for b in Prefetcher(vgen, mesh=stage_mesh, depth=cfg.prefetch):
                    val_logs.append(jax.device_get(
                        _reduce_per_example(eval_step(state, b))))

                tl = jax.device_get(train_logs)
                if tracing:
                    jax.profiler.stop_trace()
                    if verbose:
                        print(f"  profiler trace written to {profile_dir}")
                # weight per-batch means by their real-example counts so the
                # final wrap-padded batch doesn't bias small-dataset epochs
                if tl:
                    ws = np.asarray([float(d.get("_wsum", 1.0)) for d in tl])
                    epoch_logs: Dict[str, float] = {
                        k: float(np.sum([float(d[k]) * wt
                                         for d, wt in zip(tl, ws)]) / ws.sum())
                        for k in tl[0] if k != "_wsum"}
                else:
                    epoch_logs = {}
                for k, v in _weighted_epoch_mean(val_logs).items():
                    epoch_logs[f"val_{k}"] = v
                epoch_logs["time"] = time.time() - t0
                epochs_run = epoch + 1

                if tracker.update(epoch_logs):
                    variables = {"params": state.params,
                                 "batch_stats": state.batch_stats}
                    # multi-host: replicated state is identical everywhere;
                    # only the primary touches the (shared) filesystem
                    if dist.is_primary():
                        save_checkpoint(ckpt_path, variables,
                                        meta={"fold": fold, "stage": si,
                                              "monitor": monitor,
                                              "best": tracker.best,
                                              "epoch": epoch,
                                              "architecture": cfg.architecture,
                                              "backbone": cfg.backbone,
                                              "encoder_variant":
                                                  model.encoder_variant,
                                              "done": False})
                for c in cbs:
                    c.on_epoch_end(epoch, epoch_logs, control)
                if verbose:
                    msg = " ".join(f"{k}={v:.4f}" for k, v in epoch_logs.items())
                    print(f"  epoch {epoch}: {msg} ({time.time()-t0:.1f}s)")
                if control.stop_training:
                    break

            for c in cbs:
                c.on_train_end(control)

            # restore best weights for the next stage (reference behavior);
            # multi-host: wait for the primary's writes before anyone reads
            if jax.process_count() > 1:
                from jax.experimental import multihost_utils

                multihost_utils.sync_global_devices(f"stage-save-{key}")
            if os.path.exists(ckpt_path):
                variables = load_checkpoint(ckpt_path,
                                            jax.device_get(
                                                {"params": state.params,
                                                 "batch_stats": state.batch_stats}))
                m = checkpoint_meta(ckpt_path) or {}
                m["done"] = True
                m["epochs_run"] = epochs_run
                if dist.is_primary():
                    save_checkpoint(ckpt_path, variables, meta=m)
            else:
                # no improvement ever recorded — persist the final weights
                variables = {"params": state.params,
                             "batch_stats": state.batch_stats}
                if dist.is_primary():
                    save_checkpoint(ckpt_path, variables,
                                    meta={"fold": fold, "stage": si,
                                          "monitor": monitor, "best": None,
                                          "architecture": cfg.architecture,
                                          "backbone": cfg.backbone,
                                          "encoder_variant":
                                              model.encoder_variant,
                                          "done": True,
                                          "epochs_run": epochs_run})
            # second barrier: the done-marker write above must be globally
            # visible before any process moves on (otherwise a faster
            # non-primary could re-enter this stage on resume while the
            # primary skips it — mismatched collectives = deadlock)
            if jax.process_count() > 1:
                from jax.experimental import multihost_utils

                multihost_utils.sync_global_devices(f"stage-done-{key}")
            variables = jax.device_put(jax.device_get(variables),
                                       replicated(mesh))
            results[key] = {"best": tracker.best, "epochs": epochs_run,
                            "checkpoint": ckpt_path}
    return results
