"""segmentation_training_pipeline_tpu — a TPU-native rebuild of
musket-ml/segmentation_training_pipeline.

The public surface mirrors the reference's (upstream
``segmentation_pipeline/segmentation.py``, unverified — the reference mount
was empty at build time; see SURVEY.md §0):

    import segmentation_training_pipeline_tpu as segmentation
    cfg = segmentation.parse("config.yaml")
    cfg.fit(dataset)                     # K-fold, multi-stage training
    cfg.predict_all_to_dir(src, dst)     # flip-TTA + fold-ensemble inference

Internally everything is JAX/Flax/Pallas: models are Flax encoder–decoders,
the YAML ``augmentation:`` block lowers to a single fused on-device inverse
warp, training steps are jit/shard_map programs over a `jax.sharding.Mesh`,
and checkpoints/metrics keep the reference's ``weights/best-{fold}.{stage}``
/ ``metrics/metrics-{fold}.{stage}.csv`` directory contract.
"""

from .config import PipelineConfig, Stage, parse, parse_dict
from .data.datasets import (
    PredictionItem,
    DataSet,
    CompositeDataSet,
    CSVRLEDataSet,
    SubDataSet,
    KFoldedDataSet,
    DirectoryDataSet,
)
from .ops import losses, metrics
from .version import __version__

__all__ = [
    "PipelineConfig",
    "Stage",
    "parse",
    "parse_dict",
    "PredictionItem",
    "DataSet",
    "CompositeDataSet",
    "CSVRLEDataSet",
    "SubDataSet",
    "KFoldedDataSet",
    "DirectoryDataSet",
    "losses",
    "metrics",
    "__version__",
]
