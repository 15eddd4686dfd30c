"""YAML experiment schema → typed `PipelineConfig`.

Drop-in compatible with the reference's config surface (upstream
``segmentation_pipeline/segmentation.py::PipelineConfig`` +
``impl/configloader.py``, unverified — reference mount empty, SURVEY.md §0):
one YAML file = one experiment; ``architecture``/``backbone``/``shape``/
``classes``/``activation``/``loss``/``stages``/``augmentation``/``callbacks``
keys; per-stage overrides for ``epochs``/``lr``/``loss``/``negatives``/
``initial_weights``; unknown keys error out with a suggestion.

TPU-native differences live *below* this layer: the parsed config compiles to
Flax models, optax optimizers, on-device Pallas/XLA augmentation, and
jit/shard_map training — the YAML surface itself is unchanged.
"""

from __future__ import annotations

import dataclasses
import math
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence, Tuple

import yaml

from .utils.registry import Registry

# ---------------------------------------------------------------------------
# Registries (populated lazily by the modules that own the implementations).
# ---------------------------------------------------------------------------

ARCHITECTURES = Registry("architecture")
BACKBONES = Registry("backbone")
OPTIMIZERS = Registry("optimizer")
CALLBACKS = Registry("callback")
AUGMENTERS = Registry("augmenter")
LOSSES = Registry("loss")
METRICS = Registry("metric")


_TOP_LEVEL_KEYS = {
    # model
    "architecture", "backbone", "encoder_weights", "shape", "classes",
    "activation", "dropout",
    # optimization
    "optimizer", "lr", "loss", "batch", "metrics", "primary_metric",
    "primary_metric_mode", "clipnorm", "clipvalue", "weight_decay",
    "momentum", "class_weights",
    # folds / splits
    "folds_count", "testSplit", "random_state", "stratified",
    # sampling
    "negatives", "validation_negatives",
    # augmentation & transforms
    "augmentation", "transforms", "preprocessing",
    # big-image tiling
    "crops",
    # inference
    "flipPred", "testTimeAugmentation", "threshold",
    # training loop
    "stages", "callbacks", "freeze_encoder",
    # bookkeeping
    "directory", "experiment_name", "verbose",
    # TPU-native extensions (not in the reference schema)
    "dtype", "mesh", "prefetch", "remat", "donate", "profile", "debug",
    "cache",
}

_STAGE_KEYS = {
    "epochs", "lr", "loss", "negatives", "validation_negatives",
    "initial_weights", "callbacks", "freeze_encoder", "unfreeze_encoder",
    "steps_per_epoch", "batch",
}


class ConfigError(ValueError):
    pass


def _check_keys(d: Dict[str, Any], allowed: set, where: str):
    for k in d:
        if k not in allowed:
            close = None
            import difflib

            m = difflib.get_close_matches(k, list(allowed), n=1)
            if m:
                close = m[0]
            hint = f" Did you mean {close!r}?" if close else ""
            raise ConfigError(f"unknown key {k!r} in {where}.{hint}")


@dataclass
class Stage:
    """One training stage: (fold, stage) is the checkpoint/metrics unit.

    Mirrors upstream ``Stage``/``SegmentationStage`` (unverified): per-stage
    ``epochs``/``lr``/``loss``/``negatives``/``initial_weights`` overrides,
    with the best weights of stage *i* feeding stage *i+1*.
    """

    index: int = 0
    epochs: int = 1
    lr: Optional[float] = None
    loss: Optional[str] = None
    negatives: Optional[Any] = None             # none | real | int ratio
    validation_negatives: Optional[Any] = None
    initial_weights: Optional[str] = None
    callbacks: List[Dict[str, Any]] = field(default_factory=list)
    freeze_encoder: Optional[bool] = None
    unfreeze_encoder: bool = False
    steps_per_epoch: Optional[int] = None
    batch: Optional[int] = None

    @staticmethod
    def from_dict(d: Dict[str, Any], index: int) -> "Stage":
        _check_keys(d, _STAGE_KEYS, f"stages[{index}]")
        cbs = _normalize_callbacks(d.get("callbacks"))
        return Stage(
            index=index,
            epochs=int(d.get("epochs", 1)),
            lr=_opt_float(d.get("lr")),
            loss=d.get("loss"),
            negatives=d.get("negatives"),
            validation_negatives=d.get("validation_negatives"),
            initial_weights=d.get("initial_weights"),
            callbacks=cbs,
            freeze_encoder=d.get("freeze_encoder"),
            unfreeze_encoder=bool(d.get("unfreeze_encoder", False)),
            steps_per_epoch=d.get("steps_per_epoch"),
            batch=d.get("batch"),
        )


_TTA_VALUES = {"flip", "hflip", "flips", "d4_subset", "hvflip", "d4",
               "full"}


def _check_tta(v, shape=None):
    """Unknown TTA names would otherwise silently run zero TTA passes."""
    if v is None or v is False:
        return None
    if v is True:
        return "flip"
    s = str(v).lower()
    if s not in _TTA_VALUES:
        raise ConfigError(
            f"testTimeAugmentation must be one of {sorted(_TTA_VALUES)}, "
            f"got {v!r}")
    if s in ("d4", "full") and shape is not None and shape[0] != shape[1]:
        # catch at parse time — discovering this at the first predict
        # after a multi-hour fit is the wrong moment
        raise ConfigError(
            f"testTimeAugmentation: d4 needs a square shape (rot90 "
            f"members change H/W), got {tuple(shape[:2])} — use 'flips'")
    return s


def _opt_float(v):
    return None if v is None else float(v)


def _normalize_callbacks(spec) -> List[Dict[str, Any]]:
    """Accept both mapping and list-of-mapping callback syntax.

    The reference accepts ``callbacks: {EarlyStopping: {...}}`` and
    ``callbacks: [{EarlyStopping: {...}}]`` (README examples use the mapping
    form; unverified).  Normalize to ``[{"name": ..., "args": {...}}]`` and
    validate names against the callback registry at *parse* time.
    """
    if spec is None:
        return []
    out: List[Dict[str, Any]] = []
    items: List[Tuple[str, Any]] = []
    if isinstance(spec, dict):
        items = list(spec.items())
    elif isinstance(spec, list):
        for entry in spec:
            if isinstance(entry, str):
                items.append((entry, {}))
            elif isinstance(entry, dict) and len(entry) == 1:
                items.append(next(iter(entry.items())))
            else:
                raise ConfigError(f"bad callback entry: {entry!r}")
    else:
        raise ConfigError(f"bad callbacks block: {spec!r}")
    for name, args in items:
        if name not in CALLBACKS:
            hint = CALLBACKS.suggest(name)
            extra = f" Did you mean {hint!r}?" if hint else ""
            raise ConfigError(f"unknown callback {name!r}.{extra}")
        out.append({"name": name, "args": dict(args or {})})
    return out


# Real imgaug names we deliberately do NOT lower (docs/schema.md lists
# each with the reason + nearest equivalent).  A migrating config hitting
# one of these gets a pointed answer instead of a bare unknown-key error
# (VERDICT r3 item 9).
_KNOWN_UNSUPPORTED_AUGMENTERS = frozenset({
    "Voronoi",  # takes an arbitrary points_sampler OBJECT; the concrete
    # samplers ARE lowered: UniformVoronoi / RegularGridVoronoi /
    # RelativeRegularGridVoronoi
    "AveragePool", "ElasticTransformationApprox",
    "Lambda", "AssertShape", "AssertLambda",
    # blend mask generators that need inputs this pipeline does not carry
    # (arbitrary user mask objects / bounding-box targets); SomeColors and
    # SegMapClassIds ARE lowered (hue-bin table / the pipeline's own mask)
    "BlendAlphaMask", "BlendAlphaBoundingBoxes",
})
_UNSUPPORTED_AUG_PREFIXES = ("pillike", "imgcorruptlike")

# lowercase names of the lowered BlendAlpha family (incl. imgaug pre-0.4
# aliases) — their child blocks get recursive parse-time validation
_BLEND_AUG_NAMES = frozenset({
    "blendalpha", "alpha", "blendalphaelementwise", "alphaelementwise",
    "blendalphaverticallineargradient", "blendalphahorizontallineargradient",
    "blendalpharegulargrid", "blendalphacheckerboard",
    "blendalphasimplexnoise", "simplexnoisealpha",
    "blendalphafrequencynoise", "frequencynoisealpha",
    "blendalphasomecolors", "blendalphasegmapclassids",
})


def _normalize_augmentation(spec) -> List[Dict[str, Any]]:
    """Validate & normalize the imgaug-style ``augmentation:`` block.

    ``{Fliplr: 0.5, Affine: {rotate: [-10, 10]}}`` →
    ``[{"name": "Fliplr", "args": 0.5}, {"name": "Affine", "args": {...}}]``.
    Semantics (parameter ranges, joint image+mask transforms) are implemented
    in :mod:`..ops.aug.lowering`, which lowers this list to a single fused
    on-device inverse warp.
    """
    if spec is None:
        return []
    items: List[Tuple[str, Any]] = []
    if isinstance(spec, dict):
        items = list(spec.items())
    elif isinstance(spec, list):
        for entry in spec:
            if isinstance(entry, dict) and len(entry) == 1:
                items.append(next(iter(entry.items())))
            elif isinstance(entry, str):
                items.append((entry, {}))
            else:
                raise ConfigError(f"bad augmentation entry: {entry!r}")
    else:
        raise ConfigError(f"bad augmentation block: {spec!r}")
    out = []
    for name, args in items:
        if name not in AUGMENTERS:
            if name in _KNOWN_UNSUPPORTED_AUGMENTERS or any(
                    name.startswith(p)
                    for p in _UNSUPPORTED_AUG_PREFIXES):
                raise ConfigError(
                    f"augmenter {name!r} is a real imgaug name this "
                    "pipeline intentionally does not lower (see the "
                    "'imgaug names we do not lower' list in "
                    "docs/schema.md for why and for the nearest "
                    "supported equivalent)")
            hint = AUGMENTERS.suggest(name)
            extra = f" Did you mean {hint!r}?" if hint else ""
            raise ConfigError(f"unknown augmenter {name!r}.{extra}")
        # argument-KEY validation: the reference's reflection registry
        # instantiates real imgaug classes, which raise on unknown kwargs
        # (SURVEY §2a); without this a typo'd key lowers to a silent no-op
        from .ops.aug.arg_schema import validate_args

        try:
            validate_args(name, args)
        except ValueError as e:
            raise ConfigError(str(e)) from None
        # meta-augmenters carry child aug blocks — validate them recursively
        # so a typo'd child name errors at parse time, not at trace time
        low = name.lower()
        if low == "sometimes":
            if not isinstance(args, dict):
                raise ConfigError(
                    f"Sometimes expects {{p: ..., then: {{...}}}}, got {args!r}")
            args = dict(args)
            child = (args.pop("then", None) or args.pop("then_list", None)
                     or args.pop("children", None))
            args["then"] = _normalize_augmentation(child)
            els = (args.pop("else", None) or args.pop("else_list", None)
                   or args.pop("otherwise", None))
            if els is not None:
                args["else"] = _normalize_augmentation(els)
            if not args["then"] and els is None:
                raise ConfigError(
                    "Sometimes has neither a then: nor an else: child "
                    "block — it would lower to a no-op")
        elif low == "oneof":
            if not isinstance(args, list) or not args:
                raise ConfigError(
                    f"OneOf expects a non-empty list of augmenters, got {args!r}")
            args = [_normalize_augmentation(e if isinstance(e, (dict, list))
                                            else [e]) for e in args]
        elif low == "someof":
            if not isinstance(args, dict) or "children" not in args:
                raise ConfigError(
                    f"SomeOf expects {{n: ..., children: [...]}}, got {args!r}")
            args = dict(args)
            args["children"] = [
                _normalize_augmentation(e if isinstance(e, (dict, list))
                                        else [e])
                for e in args["children"]]
        elif low == "withchannels":
            if not isinstance(args, dict) or "channels" not in args:
                raise ConfigError(
                    f"WithChannels expects {{channels: [...], children: "
                    f"{{...}}}}, got {args!r}")
            args = dict(args)
            child = args.pop("children", None) or args.pop("then", None)
            args["children"] = _normalize_augmentation(child)
        elif low in ("withhueandsaturation", "withbrightnesschannels",
                     "withcolorspace"):
            if not isinstance(args, dict):
                raise ConfigError(
                    f"{name} expects {{children: {{...}}}}, got {args!r}")
            args = dict(args)
            if low == "withcolorspace":
                cs = str(args.get("to_colorspace", "")).upper()
                if cs != "HSV":
                    raise ConfigError(
                        "WithColorspace lowers only {to_colorspace: HSV} "
                        f"here (got {args.get('to_colorspace')!r}) — see "
                        "docs/schema.md")
            child = args.pop("children", None) or args.pop("then", None)
            if not child:
                raise ConfigError(f"{name} needs a children: block")
            args["children"] = _normalize_augmentation(child)
        elif low in _BLEND_AUG_NAMES:
            if not isinstance(args, dict):
                raise ConfigError(
                    f"{name} expects {{foreground: {{...}}, ...}}, got "
                    f"{args!r}")
            args = dict(args)
            fg = args.pop("foreground", None) or args.pop("first", None)
            bg = args.pop("background", None) or args.pop("second", None)
            if fg is None and bg is None:
                raise ConfigError(
                    f"{name} needs a foreground (or background) child "
                    "augmenter block")
            if fg is not None:
                args["foreground"] = _normalize_augmentation(fg)
            if bg is not None:
                args["background"] = _normalize_augmentation(bg)
        out.append({"name": name, "args": args})
    return out


@dataclass
class PipelineConfig:
    """Parsed experiment.  The single user-facing object of the framework.

    Construction validates everything cheaply (no JAX imports on this path);
    heavyweight pieces (model, optimizer, aug pipeline) are built lazily by
    the training/inference modules.
    """

    # model
    architecture: str = "Unet"
    backbone: str = "resnet34"
    encoder_weights: Optional[str] = None
    shape: Tuple[int, int, int] = (128, 128, 3)
    classes: int = 1
    activation: str = "sigmoid"
    dropout: float = 0.0

    # optimization
    optimizer: str = "Adam"
    lr: float = 1e-3
    loss: str = "binary_crossentropy"
    batch: int = 16
    metrics: List[str] = field(default_factory=list)
    primary_metric: str = "val_loss"
    primary_metric_mode: str = "auto"
    clipnorm: Optional[float] = None
    clipvalue: Optional[float] = None
    # None = unset (AdamW then defaults to 1e-4); an explicit 0.0 disables
    # decay even for AdamW — truthiness must not conflate the two
    weight_decay: Optional[float] = None
    momentum: float = 0.0  # SGD momentum (Keras SGD default is 0)
    class_weights: Optional[List[float]] = None

    # folds / splits
    folds_count: int = 5
    testSplit: float = 0.0
    random_state: int = 33
    stratified: bool = False

    # sampling
    negatives: Optional[Any] = None
    validation_negatives: Optional[Any] = None

    # augmentation
    augmentation: List[Dict[str, Any]] = field(default_factory=list)
    transforms: List[Dict[str, Any]] = field(default_factory=list)
    preprocessing: Optional[str] = None

    # big-image tiling
    crops: Optional[int] = None

    # inference
    flipPred: bool = False
    testTimeAugmentation: Optional[str] = None
    threshold: float = 0.5

    # training loop
    stages: List[Stage] = field(default_factory=lambda: [Stage()])
    callbacks: List[Dict[str, Any]] = field(default_factory=list)
    freeze_encoder: bool = False

    # bookkeeping
    directory: str = "."
    experiment_name: str = "experiment"
    verbose: int = 1

    # TPU-native extensions
    dtype: str = "bfloat16"
    mesh: Dict[str, int] = field(default_factory=dict)
    prefetch: int = 2
    remat: bool = False
    donate: bool = True
    profile: Any = False  # False | True | trace-dir path
    # False | True (jax_debug_nans) | "checks" (+checkify float/index)
    debug: Any = False
    cache: bool = False  # RAM-cache decoded items (epochs >1 skip decode)

    # ------------------------------------------------------------------
    # construction
    # ------------------------------------------------------------------
    @staticmethod
    def from_dict(d: Dict[str, Any], directory: str = ".") -> "PipelineConfig":
        # ensure registries are populated before validating names
        _populate_registries()
        _check_keys(d, _TOP_LEVEL_KEYS, "config")

        shape = tuple(d.get("shape", (128, 128, 3)))
        if len(shape) == 2:
            shape = (*shape, 3)
        if len(shape) != 3:
            raise ConfigError(f"shape must be [H, W, C], got {shape!r}")

        arch = str(d.get("architecture", "Unet"))
        if arch not in ARCHITECTURES:
            hint = ARCHITECTURES.suggest(arch)
            extra = f" Did you mean {hint!r}?" if hint else ""
            raise ConfigError(f"unknown architecture {arch!r}.{extra}")

        backbone = str(d.get("backbone", "resnet34"))
        if backbone not in BACKBONES:
            hint = BACKBONES.suggest(backbone)
            extra = f" Did you mean {hint!r}?" if hint else ""
            raise ConfigError(f"unknown backbone {backbone!r}.{extra}")
        # canonicalize aliases (e.g. xception65 → xception_aligned) so the
        # encoder zoo / weight converters see one name per graph
        backbone = BACKBONES.get(backbone)

        opt = str(d.get("optimizer", "Adam"))
        if opt not in OPTIMIZERS:
            hint = OPTIMIZERS.suggest(opt)
            extra = f" Did you mean {hint!r}?" if hint else ""
            raise ConfigError(f"unknown optimizer {opt!r}.{extra}")

        activation = str(d.get("activation", "sigmoid"))
        if activation not in ("sigmoid", "softmax", "linear", "none"):
            raise ConfigError(f"unknown activation {activation!r}")

        metrics_list = list(d.get("metrics", []) or [])
        for m in metrics_list:
            if m not in METRICS:
                hint = METRICS.suggest(m)
                extra = f" Did you mean {hint!r}?" if hint else ""
                raise ConfigError(f"unknown metric {m!r}.{extra}")

        # primary_metric must actually appear in the epoch logs, else best-
        # checkpointing silently never fires (every stage would save only
        # final weights) — validate at parse time against loss + metrics
        primary = str(d.get("primary_metric", "val_loss"))
        stripped = primary[4:] if primary.startswith("val_") else primary
        if stripped != "loss" and stripped not in metrics_list:
            candidates = (["loss", "val_loss"]
                          + metrics_list + [f"val_{m}" for m in metrics_list])
            import difflib

            m = difflib.get_close_matches(primary, candidates, n=1)
            extra = f" Did you mean {m[0]!r}?" if m else ""
            raise ConfigError(
                f"primary_metric {primary!r} is not tracked: it must be "
                f"'loss'/'val_loss' or one of metrics={metrics_list} "
                f"(optionally 'val_'-prefixed).{extra}")

        # loss expressions are validated by the composite parser
        from .ops.losses import validate_loss_expr

        loss = str(d.get("loss", "binary_crossentropy"))
        validate_loss_expr(loss)

        stages_spec = d.get("stages") or [{}]
        stages = [Stage.from_dict(s or {}, i) for i, s in enumerate(stages_spec)]
        for s in stages:
            if s.loss is not None:
                validate_loss_expr(s.loss)

        mode = str(d.get("primary_metric_mode", "auto"))
        if mode not in ("auto", "min", "max"):
            raise ConfigError(f"primary_metric_mode must be auto|min|max, got {mode!r}")

        dtype = str(d.get("dtype", "bfloat16"))
        if dtype not in ("bfloat16", "float32", "float16"):
            raise ConfigError(f"dtype must be bfloat16|float32|float16, got {dtype!r}")

        class_weights = d.get("class_weights")
        if class_weights is not None:
            class_weights = [float(v) for v in class_weights]
            if len(class_weights) != int(d.get("classes", 1)):
                raise ConfigError(
                    f"class_weights has {len(class_weights)} entries but "
                    f"classes={d.get('classes', 1)}")

        crops = d.get("crops")
        if crops is not None:
            crops = int(crops)
            if crops < 2:
                raise ConfigError("crops must be >= 2 (N×N tiling)")

        cfg = PipelineConfig(
            architecture=arch,
            backbone=backbone,
            encoder_weights=d.get("encoder_weights"),
            shape=shape,  # type: ignore[arg-type]
            classes=int(d.get("classes", 1)),
            activation=activation,
            dropout=float(d.get("dropout", 0.0)),
            optimizer=opt,
            lr=float(d.get("lr", 1e-3)),
            loss=loss,
            batch=int(d.get("batch", 16)),
            metrics=metrics_list,
            primary_metric=str(d.get("primary_metric", "val_loss")),
            primary_metric_mode=mode,
            class_weights=class_weights,
            clipnorm=_opt_float(d.get("clipnorm")),
            clipvalue=_opt_float(d.get("clipvalue")),
            weight_decay=_opt_float(d.get("weight_decay")),
            momentum=float(d.get("momentum", 0.0)),
            folds_count=int(d.get("folds_count", 5)),
            testSplit=float(d.get("testSplit", 0.0)),
            random_state=int(d.get("random_state", 33)),
            stratified=bool(d.get("stratified", False)),
            negatives=d.get("negatives"),
            validation_negatives=d.get("validation_negatives"),
            augmentation=_normalize_augmentation(d.get("augmentation")),
            transforms=_normalize_augmentation(d.get("transforms")),
            preprocessing=d.get("preprocessing"),
            crops=crops,
            flipPred=bool(d.get("flipPred", False)),
            testTimeAugmentation=_check_tta(d.get("testTimeAugmentation"),
                                            shape=shape),
            threshold=float(d.get("threshold", 0.5)),
            stages=stages,
            callbacks=_normalize_callbacks(d.get("callbacks")),
            freeze_encoder=bool(d.get("freeze_encoder", False)),
            directory=str(d.get("directory", directory)),
            experiment_name=str(d.get("experiment_name", "experiment")),
            verbose=int(d.get("verbose", 1)),
            dtype=dtype,
            mesh=dict(d.get("mesh", {}) or {}),
            prefetch=int(d.get("prefetch", 2)),
            remat=bool(d.get("remat", False)),
            donate=bool(d.get("donate", True)),
            profile=d.get("profile", False),
            debug=("checks" if str(d.get("debug", "")).lower() == "checks"
                   else bool(d.get("debug", False))),
            cache=bool(d.get("cache", False)),
        )
        return cfg

    # ------------------------------------------------------------------
    # derived properties
    # ------------------------------------------------------------------
    @property
    def weights_dir(self) -> str:
        return os.path.join(self.directory, "weights")

    @property
    def metrics_dir(self) -> str:
        return os.path.join(self.directory, "metrics")

    def weights_path(self, fold: int, stage: int) -> str:
        # reference contract: weights/best-{fold}.{stage}.weights
        return os.path.join(self.weights_dir, f"best-{fold}.{stage}.weights")

    def metrics_path(self, fold: int, stage: int) -> str:
        # reference contract: metrics/metrics-{fold}.{stage}.csv
        return os.path.join(self.metrics_dir, f"metrics-{fold}.{stage}.csv")

    def primary_mode(self) -> str:
        """Resolve ``auto`` mode from the metric name, Keras-style."""
        if self.primary_metric_mode != "auto":
            return self.primary_metric_mode
        name = self.primary_metric.replace("val_", "")
        return "min" if ("loss" in name or "error" in name) else "max"

    # ------------------------------------------------------------------
    # heavyweight entry points (lazy imports to keep parse cheap)
    # ------------------------------------------------------------------
    def fit(self, dataset, foldsToExecute: Optional[Sequence[int]] = None,
            start_from_stage: int = 0, **kw):
        """Train all requested folds through all stages.  See train.stage."""
        from .train.stage import fit_pipeline

        return fit_pipeline(self, dataset, foldsToExecute=foldsToExecute,
                            start_from_stage=start_from_stage, **kw)

    def load(self, fold: int = 0, stage: int = -1):
        """Load trained weights for (fold, stage) → an inference model bundle."""
        from .infer import load_model

        return load_model(self, fold, stage)

    def predict_all_to_dir(self, src, dst, **kw):
        from .infer import predict_all_to_dir

        return predict_all_to_dir(self, src, dst, **kw)

    def predict_in_directory(self, src, dst, **kw):  # reference alias
        return self.predict_all_to_dir(src, dst, **kw)

    def predict_to_directory(self, src, dst, **kw):  # reference alias
        return self.predict_all_to_dir(src, dst, **kw)

    def predict_on_dataset(self, dataset, **kw):
        from .infer import predict_on_dataset

        return predict_on_dataset(self, dataset, **kw)

    def predict_to_csv(self, src, csv_path, **kw):
        from .infer import predict_to_csv

        return predict_to_csv(self, src, csv_path, **kw)

    def evaluate(self, dataset, **kw):
        from .infer import evaluate

        return evaluate(self, dataset, **kw)

    def evaluateAll(self, dataset, **kw):  # reference alias
        return self.evaluate(dataset, **kw)

    def kfold(self, dataset):
        from .data.datasets import KFoldedDataSet

        return KFoldedDataSet(
            dataset,
            folds_count=self.folds_count,
            random_state=self.random_state,
            test_split=self.testSplit,
            stratified=self.stratified,
        )

    def to_dict(self) -> Dict[str, Any]:
        d = dataclasses.asdict(self)
        return d


# ---------------------------------------------------------------------------
# module-level entry points (reference: segmentation.parse(path))
# ---------------------------------------------------------------------------

def parse(path: str) -> PipelineConfig:
    """Parse a YAML experiment file → PipelineConfig.

    The experiment directory (for ``weights/`` and ``metrics/``) is the
    directory containing the YAML file, matching the reference's layout.
    """
    with open(path, "r") as f:
        raw = yaml.safe_load(f) or {}
    if not isinstance(raw, dict):
        raise ConfigError(f"config root must be a mapping, got {type(raw).__name__}")
    directory = os.path.dirname(os.path.abspath(path))
    return PipelineConfig.from_dict(raw, directory=directory)


def parse_dict(d: Dict[str, Any], directory: str = ".") -> PipelineConfig:
    return PipelineConfig.from_dict(dict(d), directory=directory)


# ---------------------------------------------------------------------------
# registry population
# ---------------------------------------------------------------------------

_POPULATED = False


def _populate_registries():
    """Import the implementation modules so they self-register names.

    Kept lazy so that `import segmentation_training_pipeline_tpu` does not pull
    in JAX before the user's own device/mesh setup runs.
    """
    global _POPULATED
    if _POPULATED:
        return
    _POPULATED = True
    from . import _registry_defs  # noqa: F401
