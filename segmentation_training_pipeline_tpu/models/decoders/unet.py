"""U-Net decoder (Ronneberger et al. 2015).

Mirrors the reference's `segmentation_models.Unet` decoder shape
(SURVEY.md §3.4): for each of 5 steps, upsample 2x → concat the encoder
skip → two 3x3 conv-BN-ReLU blocks; widths 256/128/64/32/16.  Upsampling is
nearest-resize + conv (TPU-friendly; no transposed convs).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..layers import ConvBN, upsample2x

Dtype = Any


class UnetDecoder(nn.Module):
    widths: Sequence[int] = (256, 128, 64, 32, 16)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, train: bool = False):
        # feats: [C1..C5] strides 2..32; decode from C5 up
        skips = list(feats[:-1])[::-1]  # C4, C3, C2, C1
        y = feats[-1]
        for i, w in enumerate(self.widths):
            y = upsample2x(y)
            if i < len(skips):
                skip = skips[i]
                if skip.shape[1] != y.shape[1]:  # odd-size guard
                    y = y[:, : skip.shape[1], : skip.shape[2], :]
                y = jnp.concatenate([y, skip.astype(y.dtype)], axis=-1)
            y = ConvBN(w, dtype=self.dtype, name=f"up{i+1}_conv1")(y, train)
            y = ConvBN(w, dtype=self.dtype, name=f"up{i+1}_conv2")(y, train)
        return y  # full input resolution
