"""Aligned Xception encoder (Chollet 2017; Chen et al. 2018 DeepLabV3+ variant).

Entry/middle/exit flows built from separable convs; the DeepLabV3+ bundled
model in the reference uses this as its primary encoder (upstream
``segmentation_pipeline/impl/deeplab.py``, vendored from
bonlime/keras-deeplab-v3-plus; unverified).  Taps C1..C5 at strides
2/4/8/16/32 so it also works with the generic decoders.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class SepConvBN(nn.Module):
    features: int
    strides: int = 1
    dilation: int = 1
    dtype: Dtype = jnp.bfloat16
    act_first: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.99, epsilon=1e-3,
            dtype=self.dtype, name=name)
        y = x
        if self.act_first:
            y = nn.relu(y)
        y = nn.Conv(y.shape[-1], (3, 3), (self.strides, self.strides),
                    padding="SAME", kernel_dilation=(self.dilation, self.dilation),
                    feature_group_count=y.shape[-1], use_bias=False,
                    dtype=self.dtype, name="depthwise")(y)
        y = nn.relu(norm("dw_bn")(y))
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="pointwise")(y)
        y = norm("pw_bn")(y)
        if not self.act_first:
            y = nn.relu(y)
        return y


class XceptionBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        skip = x
        y = x
        for i in range(3):
            s = self.strides if i == 2 else 1
            y = SepConvBN(self.features, strides=s, dtype=self.dtype,
                          act_first=True, name=f"sep{i+1}")(y, train)
        if self.strides != 1 or skip.shape[-1] != self.features:
            skip = nn.Conv(self.features, (1, 1), (self.strides, self.strides),
                           use_bias=False, dtype=self.dtype, name="shortcut")(skip)
            skip = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                                epsilon=1e-3, dtype=self.dtype, name="shortcut_bn")(skip)
        return y + skip


class XceptionEncoder(nn.Module):
    middle_blocks: int = 8
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.99, epsilon=1e-3,
            dtype=self.dtype, name=name)
        feats = []
        # entry flow stem (stride 2)
        y = nn.Conv(32, (3, 3), (2, 2), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="stem_conv1")(x)
        y = nn.relu(norm("stem_bn1")(y))
        y = nn.Conv(64, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="stem_conv2")(y)
        y = nn.relu(norm("stem_bn2")(y))
        feats.append(y)  # C1 stride 2
        y = XceptionBlock(128, 2, self.dtype, name="entry1")(y, train)
        feats.append(y)  # C2 stride 4
        y = XceptionBlock(256, 2, self.dtype, name="entry2")(y, train)
        feats.append(y)  # C3 stride 8
        y = XceptionBlock(728, 2, self.dtype, name="entry3")(y, train)
        # middle flow (stride 16)
        for i in range(self.middle_blocks):
            y = XceptionBlock(728, 1, self.dtype, name=f"middle{i+1}")(y, train)
        feats.append(y)  # C4 stride 16
        # exit flow
        y = XceptionBlock(1024, 2, self.dtype, name="exit1")(y, train)
        y = SepConvBN(1536, dtype=self.dtype, name="exit_sep1")(y, train)
        y = SepConvBN(2048, dtype=self.dtype, name="exit_sep2")(y, train)
        feats.append(y)  # C5 stride 32
        return feats
