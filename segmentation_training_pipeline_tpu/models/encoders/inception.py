"""InceptionV3 (Szegedy et al. 2016) and Inception-ResNet-V2 (Szegedy et
al. 2017) encoders.

Parity target: the reference's `segmentation_models` backbone list includes
``inceptionv3`` / ``inceptionresnetv2`` (SURVEY.md §2b, upstream,
unverified).  Canonical Inception uses VALID padding and 299² inputs; here
every conv/pool is SAME-padded so the spatial dims halve exactly at each
reduction and the encoder emits the standard stride-{2,4,8,16,32} feature
taps on any 32-divisible input (the skip-tap contract of SURVEY §3.4).
Channel counts follow the canonical graphs.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class _CBR(nn.Module):
    """conv → BN → ReLU, the Inception building unit."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, self.kernel, self.strides, padding="SAME",
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-3, dtype=self.dtype, name="bn")(x)
        return nn.relu(x)


def _avgpool3(x):
    # divides by the full window incl. padded zeros — torchvision
    # inception_v3 semantics (count_include_pad=True)
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME")


def _avgpool3_excl(x):
    # timm inception_resnet_v2 pools with count_include_pad=False
    return nn.avg_pool(x, (3, 3), strides=(1, 1), padding="SAME",
                       count_include_pad=False)


def _maxpool3s2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")


class InceptionA(nn.Module):
    pool_features: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        b1 = _CBR(64, (1, 1), dtype=d, name="b1x1")(x, train)
        b5 = _CBR(48, (1, 1), dtype=d, name="b5_1")(x, train)
        b5 = _CBR(64, (5, 5), dtype=d, name="b5_2")(b5, train)
        b3 = _CBR(64, (1, 1), dtype=d, name="b3_1")(x, train)
        b3 = _CBR(96, (3, 3), dtype=d, name="b3_2")(b3, train)
        b3 = _CBR(96, (3, 3), dtype=d, name="b3_3")(b3, train)
        bp = _CBR(self.pool_features, (1, 1), dtype=d, name="bp")(
            _avgpool3(x), train)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class ReductionA(nn.Module):
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        b3 = _CBR(384, (3, 3), (2, 2), dtype=d, name="b3")(x, train)
        bd = _CBR(64, (1, 1), dtype=d, name="bd_1")(x, train)
        bd = _CBR(96, (3, 3), dtype=d, name="bd_2")(bd, train)
        bd = _CBR(96, (3, 3), (2, 2), dtype=d, name="bd_3")(bd, train)
        return jnp.concatenate([b3, bd, _maxpool3s2(x)], axis=-1)


class InceptionB(nn.Module):
    c7: int  # 128 / 160 / 192 per canonical mixed4..7
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        d, c7 = self.dtype, self.c7
        b1 = _CBR(192, (1, 1), dtype=d, name="b1x1")(x, train)
        b7 = _CBR(c7, (1, 1), dtype=d, name="b7_1")(x, train)
        b7 = _CBR(c7, (1, 7), dtype=d, name="b7_2")(b7, train)
        b7 = _CBR(192, (7, 1), dtype=d, name="b7_3")(b7, train)
        bd = _CBR(c7, (1, 1), dtype=d, name="bd_1")(x, train)
        bd = _CBR(c7, (7, 1), dtype=d, name="bd_2")(bd, train)
        bd = _CBR(c7, (1, 7), dtype=d, name="bd_3")(bd, train)
        bd = _CBR(c7, (7, 1), dtype=d, name="bd_4")(bd, train)
        bd = _CBR(192, (1, 7), dtype=d, name="bd_5")(bd, train)
        bp = _CBR(192, (1, 1), dtype=d, name="bp")(_avgpool3(x), train)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class ReductionB(nn.Module):
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        b3 = _CBR(192, (1, 1), dtype=d, name="b3_1")(x, train)
        b3 = _CBR(320, (3, 3), (2, 2), dtype=d, name="b3_2")(b3, train)
        b7 = _CBR(192, (1, 1), dtype=d, name="b7_1")(x, train)
        b7 = _CBR(192, (1, 7), dtype=d, name="b7_2")(b7, train)
        b7 = _CBR(192, (7, 1), dtype=d, name="b7_3")(b7, train)
        b7 = _CBR(192, (3, 3), (2, 2), dtype=d, name="b7_4")(b7, train)
        return jnp.concatenate([b3, b7, _maxpool3s2(x)], axis=-1)


class InceptionC(nn.Module):
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        b1 = _CBR(320, (1, 1), dtype=d, name="b1x1")(x, train)
        b3 = _CBR(384, (1, 1), dtype=d, name="b3_1")(x, train)
        b3a = _CBR(384, (1, 3), dtype=d, name="b3_2a")(b3, train)
        b3b = _CBR(384, (3, 1), dtype=d, name="b3_2b")(b3, train)
        bd = _CBR(448, (1, 1), dtype=d, name="bd_1")(x, train)
        bd = _CBR(384, (3, 3), dtype=d, name="bd_2")(bd, train)
        bda = _CBR(384, (1, 3), dtype=d, name="bd_3a")(bd, train)
        bdb = _CBR(384, (3, 1), dtype=d, name="bd_3b")(bd, train)
        bp = _CBR(192, (1, 1), dtype=d, name="bp")(_avgpool3(x), train)
        return jnp.concatenate([b1, b3a, b3b, bda, bdb, bp], axis=-1)


class InceptionV3Encoder(nn.Module):
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        feats = []
        x = x.astype(d)
        y = _CBR(32, (3, 3), (2, 2), dtype=d, name="stem1")(x, train)
        y = _CBR(32, (3, 3), dtype=d, name="stem2")(y, train)
        y = _CBR(64, (3, 3), dtype=d, name="stem3")(y, train)
        feats.append(y)                       # C1 stride 2, 64ch
        y = _maxpool3s2(y)
        y = _CBR(80, (1, 1), dtype=d, name="stem4")(y, train)
        y = _CBR(192, (3, 3), dtype=d, name="stem5")(y, train)
        feats.append(y)                       # C2 stride 4, 192ch
        y = _maxpool3s2(y)
        for i, pf in enumerate((32, 64, 64)):  # mixed0..2 (35x35 grid)
            y = InceptionA(pf, dtype=d, name=f"mixed{i}")(y, train)
        feats.append(y)                       # C3 stride 8, 288ch
        y = ReductionA(dtype=d, name="mixed3")(y, train)
        for i, c7 in enumerate((128, 160, 160, 192)):  # mixed4..7
            y = InceptionB(c7, dtype=d, name=f"mixed{4 + i}")(y, train)
        feats.append(y)                       # C4 stride 16, 768ch
        y = ReductionB(dtype=d, name="mixed8")(y, train)
        for i in range(2):                    # mixed9..10
            y = InceptionC(dtype=d, name=f"mixed{9 + i}")(y, train)
        feats.append(y)                       # C5 stride 32, 2048ch
        return feats


# ---------------------------------------------------------------------------
# Inception-ResNet-V2
# ---------------------------------------------------------------------------

class _IRBlock(nn.Module):
    """Residual Inception block (block35/block17/block8) with scaling.

    ``relu=False`` is the canonical final block8 (scale 1.0, no activation)
    that precedes conv_7b — timm's ``block8 = Block8(no_relu=True)``."""

    kind: str  # "35" | "17" | "8"
    scale: float
    dtype: Dtype = jnp.bfloat16
    relu: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        if self.kind == "35":
            b0 = _CBR(32, (1, 1), dtype=d, name="b0")(x, train)
            b1 = _CBR(32, (1, 1), dtype=d, name="b1_1")(x, train)
            b1 = _CBR(32, (3, 3), dtype=d, name="b1_2")(b1, train)
            b2 = _CBR(32, (1, 1), dtype=d, name="b2_1")(x, train)
            b2 = _CBR(48, (3, 3), dtype=d, name="b2_2")(b2, train)
            b2 = _CBR(64, (3, 3), dtype=d, name="b2_3")(b2, train)
            mixed = jnp.concatenate([b0, b1, b2], axis=-1)
        elif self.kind == "17":
            b0 = _CBR(192, (1, 1), dtype=d, name="b0")(x, train)
            b1 = _CBR(128, (1, 1), dtype=d, name="b1_1")(x, train)
            b1 = _CBR(160, (1, 7), dtype=d, name="b1_2")(b1, train)
            b1 = _CBR(192, (7, 1), dtype=d, name="b1_3")(b1, train)
            mixed = jnp.concatenate([b0, b1], axis=-1)
        else:  # "8"
            b0 = _CBR(192, (1, 1), dtype=d, name="b0")(x, train)
            b1 = _CBR(192, (1, 1), dtype=d, name="b1_1")(x, train)
            b1 = _CBR(224, (1, 3), dtype=d, name="b1_2")(b1, train)
            b1 = _CBR(256, (3, 1), dtype=d, name="b1_3")(b1, train)
            mixed = jnp.concatenate([b0, b1], axis=-1)
        up = nn.Conv(x.shape[-1], (1, 1), use_bias=True, dtype=d,
                     name="up")(mixed)
        y = x + self.scale * up
        return nn.relu(y) if self.relu else y


class InceptionResNetV2Encoder(nn.Module):
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        d = self.dtype
        feats = []
        x = x.astype(d)
        y = _CBR(32, (3, 3), (2, 2), dtype=d, name="stem1")(x, train)
        y = _CBR(32, (3, 3), dtype=d, name="stem2")(y, train)
        y = _CBR(64, (3, 3), dtype=d, name="stem3")(y, train)
        feats.append(y)                       # C1 stride 2
        y = _maxpool3s2(y)
        y = _CBR(80, (1, 1), dtype=d, name="stem4")(y, train)
        y = _CBR(192, (3, 3), dtype=d, name="stem5")(y, train)
        feats.append(y)                       # C2 stride 4
        y = _maxpool3s2(y)
        # mixed_5b (stride 8, 320ch)
        b0 = _CBR(96, (1, 1), dtype=d, name="m5b_b0")(y, train)
        b1 = _CBR(48, (1, 1), dtype=d, name="m5b_b1_1")(y, train)
        b1 = _CBR(64, (5, 5), dtype=d, name="m5b_b1_2")(b1, train)
        b2 = _CBR(64, (1, 1), dtype=d, name="m5b_b2_1")(y, train)
        b2 = _CBR(96, (3, 3), dtype=d, name="m5b_b2_2")(b2, train)
        b2 = _CBR(96, (3, 3), dtype=d, name="m5b_b2_3")(b2, train)
        bp = _CBR(64, (1, 1), dtype=d, name="m5b_bp")(_avgpool3_excl(y), train)
        y = jnp.concatenate([b0, b1, b2, bp], axis=-1)
        for i in range(10):
            y = _IRBlock("35", 0.17, dtype=d, name=f"block35_{i + 1}")(y, train)
        feats.append(y)                       # C3 stride 8, 320ch
        # reduction A → stride 16, 1088ch
        b0 = _CBR(384, (3, 3), (2, 2), dtype=d, name="m6a_b0")(y, train)
        b1 = _CBR(256, (1, 1), dtype=d, name="m6a_b1_1")(y, train)
        b1 = _CBR(256, (3, 3), dtype=d, name="m6a_b1_2")(b1, train)
        b1 = _CBR(384, (3, 3), (2, 2), dtype=d, name="m6a_b1_3")(b1, train)
        y = jnp.concatenate([b0, b1, _maxpool3s2(y)], axis=-1)
        for i in range(20):
            y = _IRBlock("17", 0.10, dtype=d, name=f"block17_{i + 1}")(y, train)
        feats.append(y)                       # C4 stride 16, 1088ch
        # reduction B → stride 32
        b0 = _CBR(256, (1, 1), dtype=d, name="m7a_b0_1")(y, train)
        b0 = _CBR(384, (3, 3), (2, 2), dtype=d, name="m7a_b0_2")(b0, train)
        b1 = _CBR(256, (1, 1), dtype=d, name="m7a_b1_1")(y, train)
        b1 = _CBR(288, (3, 3), (2, 2), dtype=d, name="m7a_b1_2")(b1, train)
        b2 = _CBR(256, (1, 1), dtype=d, name="m7a_b2_1")(y, train)
        b2 = _CBR(288, (3, 3), dtype=d, name="m7a_b2_2")(b2, train)
        b2 = _CBR(320, (3, 3), (2, 2), dtype=d, name="m7a_b2_3")(b2, train)
        y = jnp.concatenate([b0, b1, b2, _maxpool3s2(y)], axis=-1)
        for i in range(9):
            y = _IRBlock("8", 0.20, dtype=d, name=f"block8_{i + 1}")(y, train)
        # canonical final block8: scale 1.0, no activation (timm no_relu)
        y = _IRBlock("8", 1.0, dtype=d, relu=False, name="block8_10")(y, train)
        y = _CBR(1536, (1, 1), dtype=d, name="conv7b")(y, train)
        feats.append(y)                       # C5 stride 32, 1536ch
        return feats
