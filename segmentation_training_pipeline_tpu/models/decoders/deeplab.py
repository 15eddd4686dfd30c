"""DeepLabV3+ decoder (Chen et al. 2018).

Reference bundles a Keras DeepLabV3+ with xception / mobilenetv2 encoders
(upstream ``segmentation_pipeline/impl/deeplab.py``, vendored from
bonlime/keras-deeplab-v3-plus; unverified — SURVEY.md §2a).  This is the
TPU-native equivalent: ASPP (1x1 + three dilated 3x3 + image pooling) on C4
(stride 16), 4x bilinear upsample, concat a projected C2 (stride 4)
low-level feature, two 3x3 refinement convs, then 4x upsample to full res.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..layers import ConvBN, resize_to

Dtype = Any


class ASPP(nn.Module):
    channels: int = 256
    rates: Sequence[int] = (6, 12, 18)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        h, w = x.shape[1], x.shape[2]
        branches = [
            ConvBN(self.channels, kernel=(1, 1), dtype=self.dtype,
                   name="b0_conv")(x, train)
        ]
        for r in self.rates:
            y = nn.Conv(self.channels, (3, 3), padding="SAME",
                        kernel_dilation=(r, r), use_bias=False,
                        dtype=self.dtype, name=f"rate{r}_conv")(x)
            y = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                             epsilon=1e-3, dtype=self.dtype, name=f"rate{r}_bn")(y)
            branches.append(nn.relu(y))
        # image-level pooling branch
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = ConvBN(self.channels, kernel=(1, 1), dtype=self.dtype,
                   name="pool_conv")(g, train)
        branches.append(resize_to(g, h, w, method="nearest"))
        y = jnp.concatenate(branches, axis=-1)
        return ConvBN(self.channels, kernel=(1, 1), dtype=self.dtype,
                      name="project")(y, train)


class DeepLabV3PlusDecoder(nn.Module):
    channels: int = 256
    low_level_channels: int = 48
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, train: bool = False):
        c2, c4 = feats[1], feats[3]  # strides 4, 16
        y = ASPP(self.channels, dtype=self.dtype, name="aspp")(c4, train)
        y = resize_to(y, c2.shape[1], c2.shape[2], method="bilinear")
        low = ConvBN(self.low_level_channels, kernel=(1, 1), dtype=self.dtype,
                     name="low_project")(c2, train)
        y = jnp.concatenate([y, low.astype(y.dtype)], axis=-1)
        y = ConvBN(self.channels, dtype=self.dtype, name="refine1")(y, train)
        y = ConvBN(self.channels, dtype=self.dtype, name="refine2")(y, train)
        y = resize_to(y, c2.shape[1] * 4, c2.shape[2] * 4, method="bilinear")
        return y
