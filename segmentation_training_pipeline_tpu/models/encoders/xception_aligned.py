"""Modified *aligned* Xception — the DeepLabV3+ backbone variant.

The reference bundles a Keras DeepLabV3+ vendored from
bonlime/keras-deeplab-v3-plus whose ``pascal_voc`` checkpoints were trained
with THIS graph, not the classic Chollet Xception (upstream
``segmentation_pipeline/impl/deeplab.py`` — SURVEY.md §2a "Bundled
DeepLabV3+"; mount empty, layer naming reconstructed [MED]).  Differences
from the classic graph (models/encoders/xception.py):

* separable conv = depthwise 3x3 → **BN** → pointwise 1x1 → **BN** (one BN
  after EACH half; the classic graph has a single BN after the pointwise);
  with ``depth_activation`` (exit block 2 + decoder) ReLUs run between and
  after the halves instead of before the depthwise;
* every downsampling is a strided separable conv — there are **no
  max-pools**;
* entry flow blocks are 3 separable convs each (classic: 2 + pool);
  middle flow has **16** units (classic: 8);
* exit flow is two 3-conv blocks ([728, 1024, 1024] with conv shortcut,
  then [1536, 1536, 2048] with no shortcut) — 65 convs total
  ("Xception-65").

Flax submodule names mirror the bonlime Keras layer names 1:1 and FLAT
(``entry_flow_block1_separable_conv1_depthwise`` …) so ``pascal_voc``
``.h5`` weights walk straight into the tree (models/keras_h5.py).

``output_stride=16`` reproduces the DeepLab layout: the exit flow keeps
stride 16 and dilates its last block (rate 2) instead of striding — weight
shapes are IDENTICAL to the generic ``output_stride=32`` mode, so the same
checkpoint loads into either.  Generic decoders (Unet/FPN/…) use 32;
the factory selects 16 for the DeepLab architecture.

Taps: C1 64ch (stride 2, post-stem), C2 256 (stride 4 — bonlime's decoder
skip: entry block 2 AFTER its second separable conv, pre-ReLU), C3 256
(stride 8, block 2 out), C4 728 (stride 16, middle flow out), C5 2048
(stride 32, or stride 16 + dilation at ``output_stride=16``).
"""

from __future__ import annotations

from typing import Any, List, Sequence

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def sep_conv_bn(y, feats: int, prefix: str, *, norm, dtype,
                stride: int = 1, rate: int = 1,
                depth_activation: bool = False):
    """bonlime ``SepConv_BN``: depthwise 3x3 → BN → pointwise 1x1 → BN.
    ``depth_activation=False`` puts one ReLU BEFORE the depthwise;
    ``True`` puts ReLUs after each BN instead.  Layer names are
    ``{prefix}_depthwise[_BN]`` / ``{prefix}_pointwise[_BN]``."""
    if not depth_activation:
        y = nn.relu(y)
    y = nn.Conv(y.shape[-1], (3, 3), (stride, stride), padding="SAME",
                kernel_dilation=(rate, rate),
                feature_group_count=y.shape[-1], use_bias=False,
                dtype=dtype, name=prefix + "_depthwise")(y)
    y = norm(prefix + "_depthwise_BN")(y)
    if depth_activation:
        y = nn.relu(y)
    y = nn.Conv(feats, (1, 1), use_bias=False, dtype=dtype,
                name=prefix + "_pointwise")(y)
    y = norm(prefix + "_pointwise_BN")(y)
    if depth_activation:
        y = nn.relu(y)
    return y


class AlignedXceptionEncoder(nn.Module):
    output_stride: int = 32
    middle_units: int = 16
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False) -> List:
        d = self.dtype

        def norm(name):
            # Keras BatchNormalization defaults (bonlime encoder BNs):
            # momentum 0.99, epsilon 1e-3
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.99, epsilon=1e-3, dtype=d,
                                name=name)

        def conv(feats, name, stride=1, kernel=(3, 3)):
            return nn.Conv(feats, kernel, (stride, stride), padding="SAME",
                           use_bias=False, dtype=d, name=name)

        def block(y, depths: Sequence[int], prefix: str, skip_type: str,
                  stride: int, rate: int = 1, depth_activation: bool = False,
                  return_skip: bool = False):
            """bonlime ``_xception_block``: 3 separable convs (stride on
            the LAST), plus a 1x1-conv or identity shortcut."""
            residual, skip = y, None
            for i in range(3):
                residual = sep_conv_bn(
                    residual, depths[i], f"{prefix}_separable_conv{i + 1}",
                    norm=norm, dtype=d, stride=stride if i == 2 else 1,
                    rate=rate, depth_activation=depth_activation)
                if i == 1 and return_skip:
                    skip = residual
            if skip_type == "conv":
                sc = conv(depths[-1], prefix + "_shortcut", stride=stride,
                          kernel=(1, 1))(y)
                residual = residual + norm(prefix + "_shortcut_BN")(sc)
            elif skip_type == "sum":
                residual = residual + y
            return (residual, skip) if return_skip else residual

        os16 = self.output_stride == 16
        exit1_stride = 1 if os16 else 2
        exit2_rate = 2 if os16 else 1

        feats: List = []
        x = x.astype(d)
        y = conv(32, "entry_flow_conv1_1", stride=2)(x)
        y = nn.relu(norm("entry_flow_conv1_1_BN")(y))
        y = conv(64, "entry_flow_conv1_2")(y)
        y = nn.relu(norm("entry_flow_conv1_2_BN")(y))
        feats.append(y)                          # C1 stride 2, 64ch
        y = block(y, [128] * 3, "entry_flow_block1", "conv", 2)
        y, skip = block(y, [256] * 3, "entry_flow_block2", "conv", 2,
                        return_skip=True)
        feats.append(skip)                       # C2 stride 4, 256ch
        feats.append(y)                          # C3 stride 8, 256ch
        y = block(y, [728] * 3, "entry_flow_block3", "conv", 2)
        for i in range(self.middle_units):
            y = block(y, [728] * 3, f"middle_flow_unit_{i + 1}", "sum", 1)
        feats.append(y)                          # C4 stride 16, 728ch
        y = block(y, [728, 1024, 1024], "exit_flow_block1", "conv",
                  exit1_stride)
        y = block(y, [1536, 1536, 2048], "exit_flow_block2", "none", 1,
                  rate=exit2_rate, depth_activation=True)
        feats.append(y)                          # C5 (s32 / s16-dilated)
        return feats
