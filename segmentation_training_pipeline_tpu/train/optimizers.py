"""Keras optimizer names → optax gradient transforms.

Design: the returned transform produces **unit-learning-rate** updates
(``scale_by_adam`` etc. without the final ``scale(-lr)``); the train step
multiplies by ``-lr`` where ``lr`` is a runtime scalar argument.  This
gives the host-side schedule callbacks (ReduceLROnPlateau / CyclicLR /
LearningRateScheduler — reference behavior via Keras callbacks) full
per-step control of the learning rate without retracing or optimizer-state
surgery.

Freeze/unfreeze (`freeze_encoder` / per-stage `unfreeze_encoder`, reference
toggles Keras ``layer.trainable``) is ``optax.multi_transform`` routing the
``encoder`` subtree to ``set_to_zero``.
"""

from __future__ import annotations

from typing import Optional

import jax
import optax


def _algo(name: str, momentum: float = 0.0):
    key = name.lower()
    if key == "adam":
        return optax.scale_by_adam()
    if key == "adamw":
        return optax.scale_by_adam()  # decay added separately
    if key == "nadam":
        return optax.scale_by_adam(nesterov=True)
    if key == "sgd":
        # Keras SGD defaults to momentum=0; the YAML `momentum:` key opts in
        return optax.trace(decay=momentum) if momentum else optax.identity()
    if key == "rmsprop":
        return optax.scale_by_rms()
    if key == "adagrad":
        return optax.scale_by_rss()
    if key == "adadelta":
        return optax.scale_by_adadelta()
    if key == "adamax":
        return optax.scale_by_adamax()
    if key == "lion":
        return optax.scale_by_lion()
    if key == "lamb":
        return optax.chain(optax.scale_by_adam(), optax.scale_by_trust_ratio())
    raise KeyError(f"unknown optimizer {name!r}")


def build_optimizer(cfg, freeze_encoder: bool = False) -> optax.GradientTransformation:
    """Unit-lr transform per config (+ clipping, weight decay, freezing)."""
    parts = []
    if cfg.clipnorm:
        parts.append(optax.clip_by_global_norm(cfg.clipnorm))
    if cfg.clipvalue:
        parts.append(optax.clip(cfg.clipvalue))
    parts.append(_algo(cfg.optimizer, momentum=getattr(cfg, "momentum", 0.0)))
    # explicit `weight_decay: 0.0` must disable decay even for AdamW;
    # only an UNSET value falls back to AdamW's conventional 1e-4
    if cfg.weight_decay is None:
        wd = 1e-4 if cfg.optimizer.lower() == "adamw" else 0.0
    else:
        wd = float(cfg.weight_decay)
    if wd:
        parts.append(optax.add_decayed_weights(wd))
    tx = optax.chain(*parts)

    if freeze_encoder:
        def label_fn(params):
            return {k: ("frozen" if k == "encoder" else "trainable")
                    for k in params.keys()}

        tx = optax.multi_transform(
            {"trainable": tx, "frozen": optax.set_to_zero()}, label_fn
        )
    return tx
