"""MobileNet (v1) encoder (Howard et al. 2017).

The last backbone family in the reference zoo (SURVEY.md §2b row 1 —
qubvel's list ships "mobilenet" AND "mobilenetv2"; VERDICT r3 item 7).
Graph follows keras.applications.MobileNet at alpha=1.0: a 3x3/2 stem
conv then 13 depthwise-separable blocks (dw 3x3 + pw 1x1, BN+ReLU6 after
each), strides at blocks 2/4/6/12.

Flax submodule names mirror the Keras layer names (``conv1``/``conv1_bn``,
``conv_dw_{i}``/``conv_dw_{i}_bn``, ``conv_pw_{i}``/``conv_pw_{i}_bn``)
so the ``.h5`` converter in models/keras_h5.py walks 1:1.

Taps mirror segmentation_models' feature layers (``conv_pw_{1,3,5,11,13}_relu``):
C1..C5 = 64/128/256/512/1024 channels at strides 2/4/8/16/32.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any

# pointwise output channels per block (alpha = 1.0)
_PW_CHANNELS = (64, 128, 128, 256, 256, 512, 512, 512, 512, 512, 512,
                1024, 1024)
_STRIDE_BLOCKS = frozenset({2, 4, 6, 12})
_TAP_BLOCKS = frozenset({1, 3, 5, 11, 13})


def _relu6(x):
    return jnp.minimum(nn.relu(x), 6.0)


class MobileNetV1Encoder(nn.Module):
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        def norm(name):
            # keras BatchNormalization defaults (momentum .99, eps 1e-3)
            return nn.BatchNorm(use_running_average=not train,
                                momentum=0.99, epsilon=1e-3,
                                dtype=self.dtype, name=name)

        feats = []
        y = nn.Conv(32, (3, 3), (2, 2), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv1")(x.astype(self.dtype))
        y = _relu6(norm("conv1_bn")(y))
        for i, pw_ch in enumerate(_PW_CHANNELS, start=1):
            s = (2, 2) if i in _STRIDE_BLOCKS else (1, 1)
            c = y.shape[-1]
            y = nn.Conv(c, (3, 3), s, padding="SAME",
                        feature_group_count=c, use_bias=False,
                        dtype=self.dtype, name=f"conv_dw_{i}")(y)
            y = _relu6(norm(f"conv_dw_{i}_bn")(y))
            y = nn.Conv(pw_ch, (1, 1), use_bias=False, dtype=self.dtype,
                        name=f"conv_pw_{i}")(y)
            y = _relu6(norm(f"conv_pw_{i}_bn")(y))
            if i in _TAP_BLOCKS:
                feats.append(y)
        return feats
