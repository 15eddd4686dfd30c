"""DenseNet-121/169/201 encoders (Huang et al. 2017).

Dense blocks with growth rate 32, transition layers with 0.5 compression.
Taps: C1 = post-stem ReLU (stride 2), C2..C4 = dense blocks 1..3 before
their transitions (strides 4/8/16), C5 = final dense block (stride 32).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


class DenseLayer(nn.Module):
    growth: int
    dtype: Dtype

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)
        y = nn.relu(norm("bn1")(x))
        y = nn.Conv(4 * self.growth, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(y)
        y = nn.relu(norm("bn2")(y))
        y = nn.Conv(self.growth, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        return jnp.concatenate([x, y], axis=-1)


class DenseNetEncoder(nn.Module):
    block_sizes: Sequence[int] = (6, 12, 24, 16)
    growth: int = 32
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)
        feats = []
        y = nn.Conv(64, (7, 7), (2, 2), padding="SAME", use_bias=False,
                    dtype=self.dtype, name="stem_conv")(x)
        y = nn.relu(norm("stem_bn")(y))
        feats.append(y)  # C1 stride 2
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding="SAME")
        for bi, n in enumerate(self.block_sizes):
            for li in range(n):
                y = DenseLayer(self.growth, self.dtype,
                               name=f"block{bi+1}_layer{li+1}")(y, train)
            if bi < len(self.block_sizes) - 1:
                feats.append(y)  # C2..C4 before transition downsample
                y = nn.relu(norm(f"trans{bi+1}_bn")(y))
                y = nn.Conv(y.shape[-1] // 2, (1, 1), use_bias=False,
                            dtype=self.dtype, name=f"trans{bi+1}_conv")(y)
                y = nn.avg_pool(y, (2, 2), strides=(2, 2))
        y = nn.relu(norm("final_bn")(y))
        feats.append(y)  # C5 stride 32
        return feats
