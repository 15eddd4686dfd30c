"""MobileNetV2 encoder (Sandler et al. 2018).

Inverted residual bottlenecks with depthwise 3x3.  Taps C1..C5 at the last
block of each stride level, matching the stride-{2,4,8,16,32} encoder
contract used by the decoders.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# (expansion t, out channels c, repeats n, stride s) — Table 2 of the paper
_MBV2_CFG = [
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
]


class InvertedResidual(nn.Module):
    expansion: int
    features: int
    strides: int
    dtype: Dtype

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.999, epsilon=1e-3,
            dtype=self.dtype, name=name)
        inp = x.shape[-1]
        hidden = inp * self.expansion
        y = x
        if self.expansion != 1:
            y = nn.Conv(hidden, (1, 1), use_bias=False, dtype=self.dtype,
                        name="expand")(y)
            y = nn.relu6(norm("expand_bn")(y))
        y = nn.Conv(hidden, (3, 3), (self.strides, self.strides), padding="SAME",
                    feature_group_count=hidden, use_bias=False, dtype=self.dtype,
                    name="depthwise")(y)
        y = nn.relu6(norm("dw_bn")(y))
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project")(y)
        y = norm("project_bn")(y)
        if self.strides == 1 and inp == self.features:
            y = y + x
        return y


class MobileNetV2Encoder(nn.Module):
    alpha: float = 1.0
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        def c(ch):
            return max(8, int(ch * self.alpha + 4) // 8 * 8)

        y = nn.Conv(c(32), (3, 3), (2, 2), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="stem_conv")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.999,
                         epsilon=1e-3, dtype=self.dtype, name="stem_bn")(y)
        y = nn.relu6(y)

        feats = []
        stride_now = 2
        block_id = 0
        for t, ch, n, s in _MBV2_CFG:
            for i in range(n):
                stride = s if i == 0 else 1
                if stride == 2:
                    feats.append(y)  # tap the last map at the previous stride
                    stride_now *= 2
                y = InvertedResidual(t, c(ch), stride, self.dtype,
                                     name=f"block{block_id}")(y, train)
                block_id += 1
        # final 1x1 expansion at stride 32
        y = nn.Conv(c(1280) if self.alpha > 1.0 else 1280, (1, 1), use_bias=False,
                    dtype=self.dtype, name="head_conv")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.999,
                         epsilon=1e-3, dtype=self.dtype, name="head_bn")(y)
        y = nn.relu6(y)
        feats.append(y)  # C5 stride 32
        return feats
