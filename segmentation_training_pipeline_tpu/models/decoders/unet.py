"""U-Net decoder (Ronneberger et al. 2015).

Mirrors the reference's `segmentation_models.Unet` decoder shape
(SURVEY.md §3.4): for each of 5 steps, upsample 2x → concat the encoder
skip → two 3x3 conv-BN-ReLU blocks; widths 256/128/64/32/16.  Upsampling is
nearest-resize + conv (TPU-friendly; no transposed convs).

``remat=True`` checkpoints each up-stage separately: the backward pass then
rematerializes ONE stage's activations at a time instead of the whole
decoder (whole-block remat leaves the full/half-res stages live together —
B192 512² still OOM'd at 22G with block remat, PERF.md round 2).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..layers import ConvBN, upsample2x

Dtype = Any


class UnetStage(nn.Module):
    """One decode step: upsample 2x → concat skip → ConvBN ×2."""

    width: int
    dtype: Dtype

    @nn.compact
    def __call__(self, y, skip, train: bool = False):
        y = upsample2x(y)
        if skip is not None:
            if skip.shape[1] != y.shape[1]:  # odd-size guard
                y = y[:, : skip.shape[1], : skip.shape[2], :]
            y = jnp.concatenate([y, skip.astype(y.dtype)], axis=-1)
        y = ConvBN(self.width, dtype=self.dtype, name="conv1")(y, train)
        y = ConvBN(self.width, dtype=self.dtype, name="conv2")(y, train)
        return y


class UnetDecoder(nn.Module):
    widths: Sequence[int] = (256, 128, 64, 32, 16)
    dtype: Dtype = jnp.bfloat16
    remat: bool = False

    @nn.compact
    def __call__(self, feats, train: bool = False):
        # feats: [C1..C5] strides 2..32; decode from C5 up
        skips = list(feats[:-1])[::-1]  # C4, C3, C2, C1
        y = feats[-1]
        stage_cls = (nn.remat(UnetStage, static_argnums=(3,))
                     if self.remat else UnetStage)
        for i, w in enumerate(self.widths):
            skip = skips[i] if i < len(skips) else None
            # param names keep the round-1 layout (up{i}_conv{j}) via the
            # stage module name + inner conv1/conv2
            y = stage_cls(w, self.dtype, name=f"up{i+1}")(y, skip, train)
        return y  # full input resolution
