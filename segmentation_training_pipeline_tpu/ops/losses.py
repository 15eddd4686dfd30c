"""Segmentation losses + composite-expression parser.

Reference parity (upstream ``segmentation_pipeline/impl/losses.py`` and
re-exports from ``segmentation_models.losses``, unverified — SURVEY.md §2a):
dice/jaccard/focal/lovasz losses and the composite YAML loss syntax
``"binary_crossentropy + 0.25*dice_loss"`` parsed into a weighted sum.

TPU-native design notes:
  * Every loss takes **logits** (pre-activation model output) and applies its
    own stable activation internally (`sigmoid_binary_cross_entropy`,
    `log_softmax`) — no separate activation pass, one fused XLA graph.
  * All reductions are over static axes; everything jits and differentiates.
  * Losses return a scalar (mean over batch) in float32 regardless of the
    compute dtype, so optimizer statistics stay stable under bf16 training.
"""

from __future__ import annotations

import re
from typing import Callable, List, Sequence, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array
# loss signature: (y_true, logits, activation) -> scalar
LossFn = Callable[[Array, Array, str], Array]

_SMOOTH = 1.0  # classic dice/jaccard smoothing used by segmentation_models-era code


def _probs(logits: Array, activation: str) -> Array:
    logits = logits.astype(jnp.float32)
    if activation == "softmax":
        return jax.nn.softmax(logits, axis=-1)
    if activation in ("sigmoid",):
        return jax.nn.sigmoid(logits)
    return logits  # linear / none


def _flatten_spatial(x: Array) -> Array:
    """(B, ..., C) -> (B, N, C) with N = prod(spatial dims)."""
    b, c = x.shape[0], x.shape[-1]
    return x.reshape(b, -1, c)


# ---------------------------------------------------------------------------
# cross-entropies
# ---------------------------------------------------------------------------

def binary_crossentropy(y_true: Array, logits: Array, activation: str = "sigmoid",
                        class_weights=None) -> Array:
    y = y_true.astype(jnp.float32)
    x = logits.astype(jnp.float32)
    # stable BCE-with-logits: max(x,0) - x*y + log1p(exp(-|x|))
    per = jnp.maximum(x, 0.0) - x * y + jnp.log1p(jnp.exp(-jnp.abs(x)))
    if class_weights is not None:
        w = jnp.asarray(class_weights, jnp.float32)
        return ((per * w).sum(-1) / w.sum()).mean()
    return per.mean()


def categorical_crossentropy(y_true: Array, logits: Array, activation: str = "softmax",
                             class_weights=None) -> Array:
    y = y_true.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    if class_weights is not None:
        w = jnp.asarray(class_weights, jnp.float32)
        return -(w * y * logp).sum(axis=-1).mean() * (w.shape[0] / w.sum())
    return -(y * logp).sum(axis=-1).mean()


def crossentropy(y_true: Array, logits: Array, activation: str = "sigmoid",
                 class_weights=None) -> Array:
    if activation == "softmax":
        return categorical_crossentropy(y_true, logits, activation, class_weights)
    return binary_crossentropy(y_true, logits, activation, class_weights)


# ---------------------------------------------------------------------------
# region losses
# ---------------------------------------------------------------------------

def dice_loss(y_true: Array, logits: Array, activation: str = "sigmoid",
              class_weights=None) -> Array:
    p = _flatten_spatial(_probs(logits, activation))
    t = _flatten_spatial(y_true.astype(jnp.float32))
    inter = (p * t).sum(axis=1)                      # (B, C)
    denom = p.sum(axis=1) + t.sum(axis=1)
    dice = (2.0 * inter + _SMOOTH) / (denom + _SMOOTH)
    if class_weights is not None:
        w = jnp.asarray(class_weights, jnp.float32)
        return 1.0 - ((dice * w).sum(-1) / w.sum()).mean()
    return 1.0 - dice.mean()


def jaccard_loss(y_true: Array, logits: Array, activation: str = "sigmoid",
              class_weights=None) -> Array:
    p = _flatten_spatial(_probs(logits, activation))
    t = _flatten_spatial(y_true.astype(jnp.float32))
    inter = (p * t).sum(axis=1)
    union = p.sum(axis=1) + t.sum(axis=1) - inter
    iou = (inter + _SMOOTH) / (union + _SMOOTH)
    if class_weights is not None:
        w = jnp.asarray(class_weights, jnp.float32)
        return 1.0 - ((iou * w).sum(-1) / w.sum()).mean()
    return 1.0 - iou.mean()


def tversky_loss(y_true: Array, logits: Array, activation: str = "sigmoid",
                 alpha: float = 0.5, beta: float = 0.5,
                 class_weights=None) -> Array:
    p = _flatten_spatial(_probs(logits, activation))
    t = _flatten_spatial(y_true.astype(jnp.float32))
    tp = (p * t).sum(axis=1)
    fp = (p * (1 - t)).sum(axis=1)
    fn = ((1 - p) * t).sum(axis=1)
    tv = (tp + _SMOOTH) / (tp + alpha * fp + beta * fn + _SMOOTH)
    if class_weights is not None:
        w = jnp.asarray(class_weights, jnp.float32)
        return 1.0 - ((tv * w).sum(-1) / w.sum()).mean()
    return 1.0 - tv.mean()


# ---------------------------------------------------------------------------
# focal losses (Lin et al. 2017; reference exposes binary & categorical)
# ---------------------------------------------------------------------------

def binary_focal_loss(y_true: Array, logits: Array, activation: str = "sigmoid",
                      gamma: float = 2.0, alpha: float = 0.25,
                      class_weights=None) -> Array:
    y = y_true.astype(jnp.float32)
    x = logits.astype(jnp.float32)
    p = jax.nn.sigmoid(x)
    # stable log-probs
    log_p = jax.nn.log_sigmoid(x)
    log_not_p = jax.nn.log_sigmoid(-x)
    pos = -alpha * jnp.power(1.0 - p, gamma) * log_p
    neg = -(1.0 - alpha) * jnp.power(p, gamma) * log_not_p
    per = y * pos + (1.0 - y) * neg
    if class_weights is not None:
        w = jnp.asarray(class_weights, jnp.float32)
        return ((per * w).sum(-1) / w.sum()).mean()
    return per.mean()


def categorical_focal_loss(y_true: Array, logits: Array, activation: str = "softmax",
                           gamma: float = 2.0, alpha: float = 0.25,
                           class_weights=None) -> Array:
    y = y_true.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    p = jnp.exp(logp)
    per = -alpha * y * jnp.power(1.0 - p, gamma) * logp
    if class_weights is not None:
        w = jnp.asarray(class_weights, jnp.float32)
        return (per * w).sum(axis=-1).mean() * (w.shape[0] / w.sum())
    return per.sum(axis=-1).mean()


def focal_loss(y_true: Array, logits: Array, activation: str = "sigmoid",
               class_weights=None) -> Array:
    if activation == "softmax":
        return categorical_focal_loss(y_true, logits, activation,
                                      class_weights=class_weights)
    return binary_focal_loss(y_true, logits, activation,
                             class_weights=class_weights)


# ---------------------------------------------------------------------------
# Lovasz losses (Berman et al. 2018) — sort-based, jit/grad friendly
# ---------------------------------------------------------------------------

def _lovasz_grad(gt_sorted: Array) -> Array:
    """Gradient of the Lovasz extension w.r.t. sorted errors.  gt: (N,)."""
    gts = gt_sorted.sum()
    intersection = gts - jnp.cumsum(gt_sorted)
    union = gts + jnp.cumsum(1.0 - gt_sorted)
    jaccard = 1.0 - intersection / jnp.maximum(union, 1.0)
    # difference trick: grad[0] = jaccard[0]; grad[i] = jaccard[i]-jaccard[i-1]
    return jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])


def _lovasz_hinge_flat(labels: Array, logits: Array) -> Array:
    """labels in {0,1}, logits real.  Both (N,)."""
    signs = 2.0 * labels - 1.0
    errors = 1.0 - logits * signs
    errors_sorted, perm = jax.lax.top_k(errors, errors.shape[0])
    gt_sorted = labels[perm]
    grad = _lovasz_grad(gt_sorted)
    return (jax.nn.relu(errors_sorted) * grad).sum()


def lovasz_hinge(y_true: Array, logits: Array, activation: str = "sigmoid") -> Array:
    """Per-image Lovasz hinge, averaged over batch and channels."""
    y = _flatten_spatial(y_true.astype(jnp.float32))   # (B, N, C)
    x = _flatten_spatial(logits.astype(jnp.float32))
    y = jnp.moveaxis(y, -1, 1).reshape(-1, y.shape[1])  # (B*C, N)
    x = jnp.moveaxis(x, -1, 1).reshape(-1, x.shape[1])
    return jax.vmap(_lovasz_hinge_flat)(y, x).mean()


def _lovasz_softmax_flat(probas: Array, labels_1h: Array) -> Array:
    """probas (N, C) softmax probs, labels_1h (N, C) one-hot."""
    C = probas.shape[1]

    def per_class(c):
        fg = labels_1h[:, c]
        errors = jnp.abs(fg - probas[:, c])
        errors_sorted, perm = jax.lax.top_k(errors, errors.shape[0])
        fg_sorted = fg[perm]
        return (errors_sorted * _lovasz_grad(fg_sorted)).sum()

    return jnp.stack([per_class(c) for c in range(C)]).mean()


def lovasz_softmax(y_true: Array, logits: Array, activation: str = "softmax") -> Array:
    p = _flatten_spatial(jax.nn.softmax(logits.astype(jnp.float32), axis=-1))
    t = _flatten_spatial(y_true.astype(jnp.float32))
    return jax.vmap(_lovasz_softmax_flat)(p, t).mean()


def lovasz_loss(y_true: Array, logits: Array, activation: str = "sigmoid") -> Array:
    if activation == "softmax":
        return lovasz_softmax(y_true, logits, activation)
    return lovasz_hinge(y_true, logits, activation)


# ---------------------------------------------------------------------------
# regression-style
# ---------------------------------------------------------------------------

def mean_squared_error(y_true: Array, logits: Array, activation: str = "sigmoid") -> Array:
    p = _probs(logits, activation)
    return jnp.square(p - y_true.astype(jnp.float32)).mean()


def mean_absolute_error(y_true: Array, logits: Array, activation: str = "sigmoid") -> Array:
    p = _probs(logits, activation)
    return jnp.abs(p - y_true.astype(jnp.float32)).mean()


# ---------------------------------------------------------------------------
# registry + composite-expression parser
# ---------------------------------------------------------------------------

def registry_entries():
    return [
        ("binary_crossentropy", binary_crossentropy, ("bce",)),
        ("categorical_crossentropy", categorical_crossentropy, ("cce",)),
        ("crossentropy", crossentropy, ()),
        ("dice_loss", dice_loss, ("dice",)),
        ("jaccard_loss", jaccard_loss, ("jaccard", "iou_loss")),
        ("tversky_loss", tversky_loss, ()),
        ("focal_loss", focal_loss, ("focal",)),
        ("binary_focal_loss", binary_focal_loss, ()),
        ("categorical_focal_loss", categorical_focal_loss, ()),
        ("lovasz_loss", lovasz_loss, ("lovasz",)),
        ("lovasz_hinge", lovasz_hinge, ()),
        ("lovasz_softmax", lovasz_softmax, ()),
        ("mean_squared_error", mean_squared_error, ("mse",)),
        ("mean_absolute_error", mean_absolute_error, ("mae",)),
    ]


_NAMES = {}
for _n, _f, _al in registry_entries():
    _NAMES[_n.lower()] = _f
    for _a in _al:
        _NAMES[_a.lower()] = _f

_TERM_RE = re.compile(
    r"^\s*(?:(?P<w>\d+(?:\.\d*)?|\.\d+)\s*\*\s*)?(?P<name>[A-Za-z_][A-Za-z0-9_]*)\s*$"
)


class LossExprError(ValueError):
    pass


def parse_loss_expr(expr: str) -> List[Tuple[float, str, LossFn]]:
    """``"binary_crossentropy + 0.25*dice_loss"`` → [(1.0, name, fn), (0.25, ...)].

    Grammar: ``expr := term (('+'|'-') term)*``, ``term := [float '*'] name``.
    Matches the reference's composite loss YAML syntax (upstream parses the
    same ``a + w*b`` form; unverified).
    """
    if not isinstance(expr, str) or not expr.strip():
        raise LossExprError(f"empty loss expression: {expr!r}")
    # strict alternation: term (('+'|'-') term)*
    tokens = [t for t in re.split(r"([+-])", expr)]
    parts: List[Tuple[float, str]] = []
    expect_term = True
    sign = 1.0
    for tok in tokens:
        if tok in ("+", "-"):
            if expect_term:
                if not parts and sign == 1.0:  # unary sign at expression start
                    sign = 1.0 if tok == "+" else -1.0
                    continue
                raise LossExprError(f"misplaced {tok!r} in loss expression {expr!r}")
            sign = 1.0 if tok == "+" else -1.0
            expect_term = True
        else:
            if not tok.strip():
                continue
            if not expect_term:
                raise LossExprError(f"missing operator before {tok.strip()!r} in {expr!r}")
            parts.append((sign, tok))
            expect_term = False
    if expect_term or not parts:
        raise LossExprError(f"cannot parse loss expression: {expr!r}")

    out: List[Tuple[float, str, LossFn]] = []
    for sgn, term in parts:
        m = _TERM_RE.match(term)
        if not m:
            raise LossExprError(f"bad loss term {term.strip()!r} in {expr!r}")
        w = float(m.group("w")) if m.group("w") else 1.0
        name = m.group("name")
        fn = _NAMES.get(name.lower())
        if fn is None:
            import difflib

            hint = difflib.get_close_matches(name.lower(), list(_NAMES), n=1)
            extra = f" Did you mean {hint[0]!r}?" if hint else ""
            raise LossExprError(f"unknown loss {name!r} in {expr!r}.{extra}")
        out.append((sgn * w, name, fn))
    return out


def validate_loss_expr(expr: str) -> None:
    parse_loss_expr(expr)


def build_loss(expr: str, activation: str,
               class_weights=None) -> Callable[[Array, Array], Array]:
    """Compile a composite loss expression to a single (y_true, logits) ->
    scalar.  ``class_weights`` (YAML key, BASELINE config 3's class
    balancing) reaches every term whose implementation supports it."""
    import inspect

    terms = parse_loss_expr(expr)
    bound = []
    for w, name, fn in terms:
        if (class_weights is not None
                and "class_weights" in inspect.signature(fn).parameters):
            import functools

            fn = functools.partial(fn, class_weights=class_weights)
        bound.append((w, name, fn))

    def loss_fn(y_true: Array, logits: Array) -> Array:
        total = 0.0
        for w, _name, fn in bound:
            total = total + w * fn(y_true, logits, activation)
        return total

    return loss_fn
