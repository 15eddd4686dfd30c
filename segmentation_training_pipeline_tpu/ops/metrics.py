"""Evaluation metrics (IoU / dice / accuracy family).

Reference parity: the YAML ``metrics:`` list and ``primary_metric`` plumbing
(upstream re-exported Keras metrics + segmentation_models ``iou_score``/
``f1-score``; unverified — SURVEY.md §2a).  Metrics take **probabilities**
(post-activation) and ground truth, return scalar float32 means; the trainer
prefixes ``val_`` for validation-split values.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

Array = jax.Array
MetricFn = Callable[[Array, Array, str], Array]

_EPS = 1e-7


def _flatten_spatial(x: Array) -> Array:
    b, c = x.shape[0], x.shape[-1]
    return x.reshape(b, -1, c)


def _binarize(p: Array, activation: str, threshold: float = 0.5) -> Array:
    p = p.astype(jnp.float32)
    if activation == "softmax":
        hard = jax.nn.one_hot(jnp.argmax(p, axis=-1), p.shape[-1], dtype=jnp.float32)
        return hard
    return (p >= threshold).astype(jnp.float32)


def binary_accuracy(y_true: Array, probs: Array, activation: str = "sigmoid") -> Array:
    pred = _binarize(probs, activation)
    return (pred == jnp.round(y_true.astype(jnp.float32))).astype(jnp.float32).mean()


def accuracy(y_true: Array, probs: Array, activation: str = "sigmoid") -> Array:
    if activation == "softmax":
        pred = jnp.argmax(probs, axis=-1)
        true = jnp.argmax(y_true, axis=-1)
        return (pred == true).astype(jnp.float32).mean()
    return binary_accuracy(y_true, probs, activation)


def iou_score(y_true: Array, probs: Array, activation: str = "sigmoid") -> Array:
    """Thresholded intersection-over-union, averaged over batch and classes."""
    p = _flatten_spatial(_binarize(probs, activation))
    t = _flatten_spatial(jnp.round(y_true.astype(jnp.float32)))
    inter = (p * t).sum(axis=1)
    union = p.sum(axis=1) + t.sum(axis=1) - inter
    return ((inter + _EPS) / (union + _EPS)).mean()


def dice_score(y_true: Array, probs: Array, activation: str = "sigmoid") -> Array:
    p = _flatten_spatial(_binarize(probs, activation))
    t = _flatten_spatial(jnp.round(y_true.astype(jnp.float32)))
    inter = (p * t).sum(axis=1)
    denom = p.sum(axis=1) + t.sum(axis=1)
    return ((2.0 * inter + _EPS) / (denom + _EPS)).mean()


def precision(y_true: Array, probs: Array, activation: str = "sigmoid") -> Array:
    p = _flatten_spatial(_binarize(probs, activation))
    t = _flatten_spatial(jnp.round(y_true.astype(jnp.float32)))
    tp = (p * t).sum(axis=1)
    return ((tp + _EPS) / (p.sum(axis=1) + _EPS)).mean()


def recall(y_true: Array, probs: Array, activation: str = "sigmoid") -> Array:
    p = _flatten_spatial(_binarize(probs, activation))
    t = _flatten_spatial(jnp.round(y_true.astype(jnp.float32)))
    tp = (p * t).sum(axis=1)
    return ((tp + _EPS) / (t.sum(axis=1) + _EPS)).mean()


def soft_iou(y_true: Array, probs: Array, activation: str = "sigmoid") -> Array:
    """Un-thresholded IoU on probabilities (smoother training signal)."""
    p = _flatten_spatial(probs.astype(jnp.float32))
    t = _flatten_spatial(y_true.astype(jnp.float32))
    inter = (p * t).sum(axis=1)
    union = p.sum(axis=1) + t.sum(axis=1) - inter
    return ((inter + _EPS) / (union + _EPS)).mean()


def registry_entries():
    return [
        ("binary_accuracy", binary_accuracy, ()),
        ("accuracy", accuracy, ("acc", "categorical_accuracy")),
        ("iou", iou_score, ("iou_score", "jaccard_score")),
        ("dice", dice_score, ("dice_score", "f1_score", "f1-score")),
        ("precision", precision, ()),
        ("recall", recall, ()),
        ("soft_iou", soft_iou, ()),
    ]


_NAMES = {}
for _n, _f, _al in registry_entries():
    _NAMES[_n.lower()] = _f
    for _a in _al:
        _NAMES[_a.lower()] = _f


def get(name: str) -> MetricFn:
    key = name.lower().replace("val_", "")
    if key not in _NAMES:
        raise KeyError(f"unknown metric {name!r}; known: {sorted(_NAMES)}")
    return _NAMES[key]
