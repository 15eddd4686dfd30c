"""architecture + backbone → SegmentationModel (Flax).

The TPU-native equivalent of the reference's model construction
(`segmentation_models.Unet("resnet34", encoder_weights=..., input_shape=...,
classes=..., activation=...)` — SURVEY.md §3.4).  Models return **logits**
in float32; losses/metrics apply the configured activation internally
(numerically stable under bf16 compute).

Param-tree layout contract (used by freeze/unfreeze and weight converters):
``params["encoder"]`` / ``params["decoder"]`` / ``params["logits_conv"]``.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from .decoders import (
    AlignedDeepLabDecoder,
    DeepLabV3PlusDecoder,
    FPNDecoder,
    LinknetDecoder,
    PSPDecoder,
    UnetDecoder,
)
from .encoders import encoder_spec

Dtype = Any

_DECODERS = {
    "unet": UnetDecoder,
    "fpn": FPNDecoder,
    "linknet": LinknetDecoder,
    "pspnet": PSPDecoder,
    "psp": PSPDecoder,
    "deeplabv3": DeepLabV3PlusDecoder,
    "deeplabv3+": DeepLabV3PlusDecoder,
    "deeplabv3plus": DeepLabV3PlusDecoder,
    "deeplab": DeepLabV3PlusDecoder,
}


class SegmentationModel(nn.Module):
    """encoder → decoder → dropout → 1x1 conv head (logits, float32).

    ``encoder_variant="keras-preact"`` swaps resnet18/34 for the
    pre-activation classification_models graph — the architecture every
    reference-era Keras ``.h5`` checkpoint was trained with (the factory
    sets this automatically when the resolved ``encoder_weights`` file is
    an ``.h5``; see models/keras_h5.py)."""

    architecture: str = "Unet"
    backbone: str = "resnet34"
    classes: int = 1
    dropout: float = 0.0
    dtype: Dtype = jnp.bfloat16
    remat: bool = False
    encoder_variant: str = ""

    @nn.compact
    def __call__(self, x, train: bool = False):
        arch = self.architecture.lower()
        if arch not in _DECODERS:
            raise KeyError(
                f"unknown architecture {self.architecture!r}; known: "
                f"{sorted(set(_DECODERS))}"
            )
        enc_cls, enc_kw = encoder_spec(self.backbone)
        dec_cls = _DECODERS[arch]
        if self.backbone.lower() == "xception_aligned":
            # the bonlime DeepLab pairing: encoder keeps stride 16 (exit
            # flow dilates instead of striding) and the decoder is the
            # pascal_voc-weight-compatible aligned graph.  With any other
            # decoder the encoder runs the generic stride-32 layout —
            # identical weight shapes either way.
            if dec_cls is DeepLabV3PlusDecoder:
                dec_cls = AlignedDeepLabDecoder
                enc_kw["output_stride"] = 16
            else:
                enc_kw["output_stride"] = 32
        if self.encoder_variant == "keras-preact":
            from .encoders.resnet import PreactResNetEncoder

            if self.backbone.lower() not in _PREACT_BACKBONES:
                raise KeyError(
                    "encoder_variant='keras-preact' only applies to "
                    f"{sorted(_PREACT_BACKBONES)}, got {self.backbone!r}")
            enc_cls = PreactResNetEncoder
            enc_kw = dict(stage_sizes=enc_kw["stage_sizes"],
                          bottleneck=enc_kw.get("bottleneck", False),
                          se=self.backbone.lower().startswith("seresnet"))
        elif self.encoder_variant:
            raise KeyError(
                f"unknown encoder_variant {self.encoder_variant!r}")
        dec_kw = {}
        if self.remat:
            # rematerialize BOTH halves in backward (HBM for FLOPs).  The
            # decoder matters more than the encoder at 512²: its
            # full/half-res stages are the HBM hog (PERF.md round-1 — B192
            # OOM'd at 26G with encoder-only remat).  Unet checkpoints
            # PER-STAGE (whole-block remat still leaves the high-res stages
            # live together); other decoders use block remat.
            enc_cls = nn.remat(enc_cls, static_argnums=(2,))
            if arch == "unet":
                dec_kw["remat"] = True
            else:
                dec_cls = nn.remat(dec_cls, static_argnums=(2,))

        x = x.astype(self.dtype)
        feats = enc_cls(**enc_kw, dtype=self.dtype, name="encoder")(x, train)
        y = dec_cls(dtype=self.dtype, name="decoder", **dec_kw)(feats, train)
        if self.dropout > 0:
            y = nn.Dropout(self.dropout, deterministic=not train)(y)
        logits = nn.Conv(self.classes, (1, 1), dtype=jnp.float32,
                         name="logits_conv")(y.astype(jnp.float32))
        if logits.shape[1:3] != x.shape[1:3]:
            # sub-resolution decoder output (PSPNet, stride 8): resize the
            # LOGITS — exactly commutes with the 1x1 head, avoids the
            # full-res conv_channels-wide tensor, and matches the
            # reference's classes-conv-then-upsample order (activation
            # applies after resize in both)
            from .layers import resize_to

            logits = resize_to(logits, x.shape[1], x.shape[2],
                               method="bilinear")
        return logits


def create_model(architecture: str, backbone: str, classes: int = 1,
                 dropout: float = 0.0, dtype: str = "bfloat16",
                 remat: bool = False,
                 encoder_variant: str = "") -> SegmentationModel:
    jdtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
              "float16": jnp.float16}[dtype]
    return SegmentationModel(
        architecture=architecture,
        backbone=backbone,
        classes=classes,
        dropout=dropout,
        dtype=jdtype,
        remat=remat,
        encoder_variant=encoder_variant,
    )


# classification_models builds these from the PRE-ACTIVATION graph, so
# their reference-era .h5 checkpoints only ingest into that variant
_PREACT_BACKBONES = frozenset({
    "resnet18", "resnet34", "resnet50", "resnet101", "resnet152",
    "seresnet18", "seresnet34",
})


def _variant_for_config(cfg) -> str:
    """Keras ``.h5`` weights for a classification_models-era resnet imply
    the preact graph — decide at model-build time so the weights ingest
    1:1.  The checkpoint sidecar pins the decision afterwards
    (``variant_from_checkpoint``)."""
    spec = getattr(cfg, "encoder_weights", None)
    if spec and cfg.backbone.lower() in _PREACT_BACKBONES:
        from .pretrained import resolve_pretrained_path

        path = resolve_pretrained_path(cfg.backbone, spec, quiet=True)
        if path and path.endswith((".h5", ".hdf5")):
            return "keras-preact"
    return ""


def model_from_config(cfg, encoder_variant: str = None) -> SegmentationModel:
    """``encoder_variant=None`` derives the variant from the config's
    weight-file resolution; pass a string (possibly "") to pin it — the
    checkpoint sidecar's recorded variant takes precedence at load time
    (see ``variant_from_checkpoint``), so moving/deleting the original
    ``.h5`` between fit and load cannot change the architecture."""
    return create_model(
        architecture=cfg.architecture,
        backbone=cfg.backbone,
        classes=cfg.classes,
        dropout=cfg.dropout,
        dtype=cfg.dtype,
        remat=cfg.remat,
        encoder_variant=(_variant_for_config(cfg) if encoder_variant is None
                         else encoder_variant),
    )


def variant_from_checkpoint(cfg, ckpt_paths) -> str:
    """Resolve the encoder variant for restoring ``cfg`` from checkpoints.

    The first sidecar (in order) that records ``encoder_variant`` wins —
    the graph the weights were actually trained with.  Checkpoints
    predating the sidecar field fall back to config-time derivation
    (the pre-fix behavior)."""
    from ..train.checkpoint import checkpoint_meta

    if isinstance(ckpt_paths, str):
        ckpt_paths = [ckpt_paths]
    for p in ckpt_paths:
        meta = checkpoint_meta(p)
        if meta is not None and "encoder_variant" in meta:
            return str(meta["encoder_variant"])
    return _variant_for_config(cfg)


def init_model(model: SegmentationModel, shape, seed: int = 0):
    """Initialize variables for input (1, H, W, C) — one jitted program
    (eager init dispatches hundreds of tiny ops; on remote-compile TPU
    setups that costs minutes)."""
    rng = jax.random.PRNGKey(seed)
    x = jnp.zeros((1, *shape), jnp.float32)
    init = jax.jit(lambda r, xx: model.init({"params": r, "dropout": r},
                                            xx, train=False))
    return init(rng, x)


def template_variables(model: SegmentationModel, shape):
    """Zero-compute variables pytree (host numpy zeros) for checkpoint
    restore — structure/shape/dtype only, via eval_shape."""
    import numpy as np

    rng = jax.random.PRNGKey(0)
    x = jax.ShapeDtypeStruct((1, *shape), jnp.float32)
    shapes = jax.eval_shape(
        lambda r, xx: model.init({"params": r, "dropout": r}, xx, train=False),
        rng, x)
    return jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)


def apply_activation(logits, activation: str):
    if activation == "softmax":
        return jax.nn.softmax(logits, axis=-1)
    if activation == "sigmoid":
        return jax.nn.sigmoid(logits)
    return logits
