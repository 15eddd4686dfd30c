"""Xception encoder (Chollet 2017) — classic layout.

Parity target: the reference era's ``xception`` backbone is
``keras.applications.Xception`` (SURVEY.md §2b; the bundled DeepLabV3+ uses
a *modified aligned* variant — see models/decoders/deeplab.py docstring for
that deviation).  This module implements the CLASSIC graph, because that is
the architecture every public ``xception`` checkpoint (Keras applications,
Cadene/pretrainedmodels, timm ``legacy_xception``) was trained with — so
``encoder_weights: imagenet`` can ingest real weights 1:1
(models/pretrained.py:convert_torch_xception).

Classic-graph facts encoded here (vs the aligned/DeepLab variant):

* separable conv = depthwise 3x3 → pointwise 1x1 with **no BN between**
  and no bias; one BN after the pointwise;
* entry/exit blocks have 2 separable convs + a stride-2 **max-pool** (not a
  strided conv), with a 1x1 strided conv shortcut;
* middle flow: 8 identity-residual blocks of 3 separable convs at stride 16;
* pre-activation ReLU before each separable conv (the very first block
  starts without one), and **no ReLU after the residual add**.

Padding deviation (documented, as for the other encoders): canonical stem
convs are VALID; here every conv/pool is SAME so the taps land exactly at
strides 2/4/8/16/32 on any 32-divisible input.  Weight shapes are
unaffected.

Taps: C1 64ch (stride 2, post-stem), C2 128 (block1), C3 256 (block2),
C4 728 (block11), C5 2048 (post conv4/bn4).
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class SeparableConv(nn.Module):
    """Cadene ``SeparableConv2d``: depthwise 3x3 then pointwise 1x1, both
    bias-free, no intermediate BN/activation."""

    features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(x.shape[-1], (3, 3), padding="SAME",
                    feature_group_count=x.shape[-1], use_bias=False,
                    dtype=self.dtype, name="depthwise")(x)
        return nn.Conv(self.features, (1, 1), use_bias=False,
                       dtype=self.dtype, name="pointwise")(x)


class XceptionBlock(nn.Module):
    """Residual block: ``reps`` × (ReLU → SepConv → BN), optional trailing
    stride-2 max-pool, conv shortcut when shape changes.

    ``grow_first=False`` reproduces the exit block (block12): the channel
    growth happens on the LAST separable conv instead of the first.
    """

    features: int
    reps: int = 2
    stride: int = 1
    start_with_relu: bool = True
    grow_first: bool = True
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        def norm(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=self.dtype, name=name)

        skip = x
        if self.stride != 1 or x.shape[-1] != self.features:
            skip = nn.Conv(self.features, (1, 1), (self.stride, self.stride),
                           use_bias=False, dtype=self.dtype,
                           name="shortcut")(skip)
            skip = norm("shortcut_bn")(skip)

        y = x
        for i in range(self.reps):
            grow = (i == 0) if self.grow_first else (i == self.reps - 1)
            feats = self.features if grow or (self.grow_first and i > 0) \
                else x.shape[-1]
            if i > 0 or self.start_with_relu:
                y = nn.relu(y)
            y = SeparableConv(feats, dtype=self.dtype, name=f"sep{i + 1}")(y)
            y = norm(f"bn{i + 1}")(y)
        if self.stride != 1:
            y = nn.max_pool(y, (3, 3), strides=(self.stride, self.stride),
                            padding="SAME")
        return y + skip


class XceptionEncoder(nn.Module):
    middle_blocks: int = 8
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype

        def norm(name):
            return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                epsilon=1e-5, dtype=d, name=name)

        feats = []
        x = x.astype(d)
        y = nn.Conv(32, (3, 3), (2, 2), padding="SAME", use_bias=False,
                    dtype=d, name="stem_conv1")(x)
        y = nn.relu(norm("stem_bn1")(y))
        y = nn.Conv(64, (3, 3), padding="SAME", use_bias=False,
                    dtype=d, name="stem_conv2")(y)
        y = nn.relu(norm("stem_bn2")(y))
        feats.append(y)                          # C1 stride 2, 64ch
        y = XceptionBlock(128, stride=2, start_with_relu=False, dtype=d,
                          name="block1")(y, train)
        feats.append(y)                          # C2 stride 4, 128ch
        y = XceptionBlock(256, stride=2, dtype=d, name="block2")(y, train)
        feats.append(y)                          # C3 stride 8, 256ch
        y = XceptionBlock(728, stride=2, dtype=d, name="block3")(y, train)
        for i in range(self.middle_blocks):      # middle flow, stride 16
            y = XceptionBlock(728, reps=3, dtype=d,
                              name=f"block{4 + i}")(y, train)
        feats.append(y)                          # C4 stride 16, 728ch
        y = XceptionBlock(1024, stride=2, grow_first=False, dtype=d,
                          name=f"block{4 + self.middle_blocks}")(y, train)
        y = nn.relu(norm("exit_bn1")(
            SeparableConv(1536, dtype=d, name="exit_sep1")(y)))
        y = nn.relu(norm("exit_bn2")(
            SeparableConv(2048, dtype=d, name="exit_sep2")(y)))
        feats.append(y)                          # C5 stride 32, 2048ch
        return feats
