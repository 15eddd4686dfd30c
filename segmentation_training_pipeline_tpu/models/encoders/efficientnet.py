"""EfficientNet B0–B7 encoders (Tan & Le 2019).

MBConv blocks with squeeze-excitation and stochastic depth; width/depth
scaled per variant.  Taps C1..C5 at the last feature map of each stride
level (2/4/8/16/32), the contract the decoders expect.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..layers import DropPath, SEBlock, round_filters, round_repeats

Dtype = Any

# (expansion, channels, repeats, stride, kernel) — B0 baseline
_EFF_CFG = [
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
]


class MBConv(nn.Module):
    expansion: int
    features: int
    strides: int
    kernel: int
    drop_rate: float
    dtype: Dtype

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.99, epsilon=1e-3,
            dtype=self.dtype, name=name)
        inp = x.shape[-1]
        hidden = inp * self.expansion
        y = x
        if self.expansion != 1:
            y = nn.Conv(hidden, (1, 1), use_bias=False, dtype=self.dtype,
                        name="expand")(y)
            y = nn.swish(norm("expand_bn")(y))
        y = nn.Conv(hidden, (self.kernel, self.kernel),
                    (self.strides, self.strides), padding="SAME",
                    feature_group_count=hidden, use_bias=False,
                    dtype=self.dtype, name="depthwise")(y)
        y = nn.swish(norm("dw_bn")(y))
        y = SEBlock(max(1, inp // 4), dtype=self.dtype, name="se")(y)
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="project")(y)
        y = norm("project_bn")(y)
        if self.strides == 1 and inp == self.features:
            y = DropPath(self.drop_rate, name="drop_path")(y, deterministic=not train)
            y = y + x
        return y


class EfficientNetEncoder(nn.Module):
    width_mult: float = 1.0
    depth_mult: float = 1.0
    drop_connect: float = 0.2
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.99, epsilon=1e-3,
            dtype=self.dtype, name=name)
        y = nn.Conv(round_filters(32, self.width_mult), (3, 3), (2, 2),
                    padding="SAME", use_bias=False, dtype=self.dtype,
                    name="stem_conv")(x)
        y = nn.swish(norm("stem_bn")(y))

        total_blocks = sum(round_repeats(r, self.depth_mult) for _, _, r, _, _ in _EFF_CFG)
        feats = []
        block_idx = 0
        for si, (t, ch, n, s, k) in enumerate(_EFF_CFG):
            reps = round_repeats(n, self.depth_mult)
            out = round_filters(ch, self.width_mult)
            for i in range(reps):
                stride = s if i == 0 else 1
                if stride == 2:
                    feats.append(y)
                dr = self.drop_connect * block_idx / total_blocks
                y = MBConv(t, out, stride, k, dr, self.dtype,
                           name=f"stage{si}_block{i}")(y, train)
                block_idx += 1
        # head conv at stride 32
        y = nn.Conv(round_filters(1280, self.width_mult), (1, 1), use_bias=False,
                    dtype=self.dtype, name="head_conv")(y)
        y = nn.swish(norm("head_bn")(y))
        feats.append(y)
        return feats
