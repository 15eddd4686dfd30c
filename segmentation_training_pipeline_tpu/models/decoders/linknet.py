"""Linknet decoder (Chaurasia & Culurciello 2017).

Each decoder block: 1x1 conv to C/4 → 2x upsample + 3x3 conv → 1x1 conv to
the skip's channel count, then *add* (not concat) the encoder skip —
Linknet's memory-lean signature, matching `segmentation_models.Linknet`
behavior (SURVEY.md §2b).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..layers import ConvBN, upsample2x

Dtype = Any


class LinknetDecoderBlock(nn.Module):
    out_features: int
    dtype: Dtype

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = max(x.shape[-1] // 4, 16)
        y = ConvBN(c, kernel=(1, 1), dtype=self.dtype, name="squeeze")(x, train)
        y = upsample2x(y)
        y = ConvBN(c, dtype=self.dtype, name="conv")(y, train)
        y = ConvBN(self.out_features, kernel=(1, 1), dtype=self.dtype,
                   name="expand")(y, train)
        return y


class LinknetDecoder(nn.Module):
    final_width: int = 32
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, train: bool = False):
        skips = list(feats[:-1])[::-1]  # C4, C3, C2, C1
        y = feats[-1]
        for i, skip in enumerate(skips):
            y = LinknetDecoderBlock(skip.shape[-1], self.dtype,
                                    name=f"dec{i+1}")(y, train)
            y = y + skip.astype(y.dtype)
        # last step: stride 2 → 1
        y = LinknetDecoderBlock(self.final_width, self.dtype, name="dec5")(y, train)
        y = ConvBN(self.final_width, dtype=self.dtype, name="final_conv")(y, train)
        return y
