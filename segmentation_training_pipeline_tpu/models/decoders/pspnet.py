"""PSPNet decoder (Zhao et al. 2017).

Pyramid pooling over C3 (stride 8): average-pool to 1/2/3/6 bins, 1x1 conv
each, bilinear-resize back, concat with the input map, fuse with a 3x3 conv,
then upsample 8x to full resolution.  Bin pooling requires static spatial
dims — per-config shape specialization (SURVEY §7 hard part 6) comes free
from jit's static shapes.

Matches `segmentation_models.PSPNet`'s use of the stride-8 feature level
(downsample factor 8) rather than C5.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ..layers import ConvBN, resize_to

Dtype = Any


class PSPDecoder(nn.Module):
    bins: Sequence[int] = (1, 2, 3, 6)
    conv_channels: int = 512
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, train: bool = False):
        y = feats[2]  # C3, stride 8
        h, w = y.shape[1], y.shape[2]
        pooled = [y]
        for b in self.bins:
            # adaptive average pool to (b, b)
            wh, ww = h // b, w // b
            p = nn.avg_pool(y, (wh, ww), strides=(wh, ww))
            p = ConvBN(self.conv_channels // len(self.bins), kernel=(1, 1),
                       dtype=self.dtype, name=f"bin{b}_conv")(p, train)
            pooled.append(resize_to(p, h, w, method="bilinear"))
        y = jnp.concatenate([p.astype(y.dtype) for p in pooled], axis=-1)
        y = ConvBN(self.conv_channels, dtype=self.dtype, name="fuse_conv")(y, train)
        y = resize_to(y, h * 8, w * 8, method="bilinear")
        return y
