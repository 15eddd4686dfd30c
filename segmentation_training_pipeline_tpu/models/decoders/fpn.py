"""FPN decoder (Lin et al. 2017, as adapted for segmentation by
`segmentation_models.FPN` — SURVEY.md §2b).

Lateral 1x1 convs onto P5..P2 (256ch), top-down nearest upsampling with
addition, a 3x3 segmentation head per level (128ch), upsample all levels to
stride-4, sum-aggregate, then a final conv before 4x upsampling to full
resolution.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..layers import ConvBN, resize_to, upsample2x

Dtype = Any


class FPNDecoder(nn.Module):
    pyramid_channels: int = 256
    segmentation_channels: int = 128
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, train: bool = False):
        c2, c3, c4, c5 = feats[1], feats[2], feats[3], feats[4]
        p5 = nn.Conv(self.pyramid_channels, (1, 1), dtype=self.dtype, name="lat5")(c5)
        p4 = nn.Conv(self.pyramid_channels, (1, 1), dtype=self.dtype, name="lat4")(c4)
        p3 = nn.Conv(self.pyramid_channels, (1, 1), dtype=self.dtype, name="lat3")(c3)
        p2 = nn.Conv(self.pyramid_channels, (1, 1), dtype=self.dtype, name="lat2")(c2)
        p4 = p4 + upsample2x(p5)
        p3 = p3 + upsample2x(p4)
        p2 = p2 + upsample2x(p3)

        outs = []
        for i, p in enumerate([p5, p4, p3, p2]):
            s = ConvBN(self.segmentation_channels, dtype=self.dtype,
                       name=f"seg{5-i}_conv1")(p, train)
            s = ConvBN(self.segmentation_channels, dtype=self.dtype,
                       name=f"seg{5-i}_conv2")(s, train)
            outs.append(resize_to(s, p2.shape[1], p2.shape[2]))
        y = outs[0] + outs[1] + outs[2] + outs[3]
        y = ConvBN(self.segmentation_channels, dtype=self.dtype,
                   name="merge_conv")(y, train)
        # stride 4: the model head resizes LOGITS ×4 (1x1 conv and
        # bilinear resize commute; upsampling 128 channels first costs
        # 128/classes× the resize memory — and the reference's own FPN
        # applies its classes conv before UpSampling too)
        return y
