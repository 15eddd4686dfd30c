"""PSPNet decoder (Zhao et al. 2017).

Pyramid pooling over C3 (stride 8): average-pool to 1/2/3/6 bins, 1x1 conv
each, bilinear-resize back, concat with the input map, fuse with a 3x3 conv,
then upsample 8x to full resolution.  Bin pooling requires static spatial
dims — per-config shape specialization (SURVEY §7 hard part 6) comes free
from jit's static shapes.

Matches `segmentation_models.PSPNet`'s use of the stride-8 feature level
(downsample factor 8) rather than C5.
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np

import jax.numpy as jnp
from flax import linen as nn

from ..layers import ConvBN, resize_to

Dtype = Any


def _adaptive_pool_matrix(n: int, bins: int) -> np.ndarray:
    """(bins, n) row-stochastic matrix: exact adaptive average pooling
    (torch AdaptiveAvgPool semantics — segment i covers
    [floor(i·n/b), ceil((i+1)·n/b))), applied as an MXU matmul."""
    m = np.zeros((bins, n), np.float32)
    for i in range(bins):
        s = (i * n) // bins
        e = -(-((i + 1) * n) // bins)  # ceil
        m[i, s:e] = 1.0 / (e - s)
    return m


def adaptive_avg_pool(y, b: int):
    """NHWC → (N, b, b, C) exact adaptive pooling via two matmuls (the
    naive h//b window pool yields the wrong bin grid whenever h % b != 0)."""
    h, w = y.shape[1], y.shape[2]
    mh = jnp.asarray(_adaptive_pool_matrix(h, b), y.dtype)
    mw = jnp.asarray(_adaptive_pool_matrix(w, b), y.dtype)
    p = jnp.einsum("bh,nhwc->nbwc", mh, y)
    return jnp.einsum("bw,nhwc->nhbc", mw, p)


class PSPDecoder(nn.Module):
    bins: Sequence[int] = (1, 2, 3, 6)
    conv_channels: int = 512
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, feats, train: bool = False):
        y = feats[2]  # C3, stride 8
        h, w = y.shape[1], y.shape[2]
        pooled = [y]
        for b in self.bins:
            p = adaptive_avg_pool(y, b)
            p = ConvBN(self.conv_channels // len(self.bins), kernel=(1, 1),
                       dtype=self.dtype, name=f"bin{b}_conv")(p, train)
            pooled.append(resize_to(p, h, w, method="bilinear"))
        y = jnp.concatenate([p.astype(y.dtype) for p in pooled], axis=-1)
        y = ConvBN(self.conv_channels, dtype=self.dtype, name="fuse_conv")(y, train)
        # Return at stride 8: the model head resizes LOGITS to full res
        # (1x1 conv and bilinear resize commute exactly), matching
        # qubvel's classes-conv-then-UpSampling order.  Upsampling the
        # 512-channel map first materializes a B×H×W×512 tensor — 8.6 GB
        # at B32 512² bf16, which crashed the TPU compiler (PERF.md r3).
        return y
