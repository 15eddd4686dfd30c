"""DeepLabV3+ decoders (Chen et al. 2018).

Reference bundles a Keras DeepLabV3+ with xception / mobilenetv2 encoders
(upstream ``segmentation_pipeline/impl/deeplab.py``, vendored from
bonlime/keras-deeplab-v3-plus; unverified — SURVEY.md §2a).  Two graphs:

* :class:`DeepLabV3PlusDecoder` — the generic TPU-native head usable with
  EVERY backbone in the zoo: ASPP (1x1 + three dilated 3x3 + image
  pooling) on C4 (stride 16), 4x bilinear upsample, concat a projected C2
  (stride 4) low-level feature, two 3x3 refinement convs, 4x upsample.
* :class:`AlignedDeepLabDecoder` — bonlime's exact graph (separable ASPP
  branches + refines, ASPP on the dilated stride-16 C5), selected by the
  factory for the ``xception_aligned`` backbone so ``pascal_voc`` ``.h5``
  checkpoints load 1:1 (encoder + decoder + logits;
  models/keras_h5.py:maybe_load_aligned_deeplab_head).
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


class AlignedDeepLabDecoder(nn.Module):
    """bonlime keras-deeplab-v3-plus decoder graph, FLAT layer naming so
    ``pascal_voc`` h5 weights map 1:1 (models/keras_h5.py; used with the
    ``xception_aligned`` backbone whose C5 stays at stride 16).

    vs the generic :class:`DeepLabV3PlusDecoder`: ASPP consumes the full
    encoder OUTPUT (2048ch C5, not 728ch C4); the three dilated branches
    and both refinement convs are separable (``SepConv_BN`` with
    depth_activation); the low-level skip is bonlime's 256ch stride-4
    mid-block tap (C2 of the aligned encoder); branch concat order is
    [pool, 1x1, rate6, rate12, rate18]; decoder BNs use eps 1e-5
    (encoder BNs 1e-3 — bonlime's split).  Upsampling deviation: bilinear
    with half-pixel centers (bonlime used tf resize align_corners=True).
    Output is the STRIDE-4 feature map; SegmentationModel applies the 1x1
    logits conv there and bilinear-resizes the logits ×4 — exactly
    bonlime's conv-then-upsample arithmetic (pointwise-linear and
    bilinear resize commute)."""

    channels: int = 256
    rates: Sequence[int] = (6, 12, 18)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, train: bool = False):
        from ..encoders.xception_aligned import sep_conv_bn

        d = self.dtype

        def norm(name):
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.99, epsilon=1e-5, dtype=d,
                                name=name)

        def conv(feats_, name):
            return nn.Conv(feats_, (1, 1), use_bias=False, dtype=d,
                           name=name)

        x, skip = feats[4], feats[1]
        h, w = x.shape[1], x.shape[2]
        # image-level pooling branch
        b4 = jnp.mean(x, axis=(1, 2), keepdims=True)
        b4 = nn.relu(norm("image_pooling_BN")(
            conv(self.channels, "image_pooling")(b4)))
        b4 = resize_to(b4, h, w, method="bilinear")
        b0 = nn.relu(norm("aspp0_BN")(conv(self.channels, "aspp0")(x)))
        branches = [b4, b0]
        for i, r in enumerate(self.rates):
            branches.append(sep_conv_bn(
                x, self.channels, f"aspp{i + 1}", norm=norm, dtype=d,
                rate=r, depth_activation=True))
        y = jnp.concatenate(branches, axis=-1)
        y = nn.relu(norm("concat_projection_BN")(
            conv(self.channels, "concat_projection")(y)))
        y = nn.Dropout(0.1, deterministic=not train)(y)

        y = resize_to(y, skip.shape[1], skip.shape[2], method="bilinear")
        low = nn.relu(norm("feature_projection0_BN")(
            conv(48, "feature_projection0")(skip)))
        y = jnp.concatenate([y, low.astype(y.dtype)], axis=-1)
        y = sep_conv_bn(y, self.channels, "decoder_conv0", norm=norm,
                        dtype=d, depth_activation=True)
        y = sep_conv_bn(y, self.channels, "decoder_conv1", norm=norm,
                        dtype=d, depth_activation=True)
        # stride 4: the model head resizes LOGITS (commutes with the 1x1
        # conv; upsampling 256 channels first costs 256/classes× the
        # resize memory — the PSPNet-crash tensor class, PERF.md r3).
        # bonlime also convs-then-upsamples.
        return y


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
        # stride 4: the model head resizes the logits (see the aligned
        # decoder's note — avoids the full-res 256-channel temp)
        return y
