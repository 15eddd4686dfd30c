"""VGG16/19 encoders (Simonyan & Zisserman 2015).

Feature taps: the reference's `segmentation_models` takes VGG skips at the
last conv of each stage *before* pooling, so C1..C5 are at strides
1/2/4/8/16 for VGG — unlike ResNet's 2/4/8/16/32.  We follow the common
encoder contract instead (strides 2..32) by tapping *after* each pool, and
add a BatchNorm variant (the reference's VGG is norm-free; BN makes
from-scratch training viable, which is our primary regime without
downloaded ImageNet weights — documented deviation).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class VGGEncoder(nn.Module):
    stage_convs: Sequence[int] = (2, 2, 3, 3, 3)
    widths: Sequence[int] = (64, 128, 256, 512, 512)
    dtype: Dtype = jnp.bfloat16
    use_bn: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        feats = []
        y = x
        for stage, (n, w) in enumerate(zip(self.stage_convs, self.widths)):
            for c in range(n):
                y = nn.Conv(w, (3, 3), padding="SAME", use_bias=not self.use_bn,
                            dtype=self.dtype, name=f"stage{stage+1}_conv{c+1}")(y)
                if self.use_bn:
                    y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                     epsilon=1e-5, dtype=self.dtype,
                                     name=f"stage{stage+1}_bn{c+1}")(y)
                y = nn.relu(y)
            y = nn.max_pool(y, (2, 2), strides=(2, 2))
            feats.append(y)  # C1..C5 at strides 2/4/8/16/32
        return feats
