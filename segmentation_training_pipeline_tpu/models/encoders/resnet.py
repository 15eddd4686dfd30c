"""ResNet / SE-ResNet encoders (He et al. 2016; Hu et al. 2018).

Feature-tap parity with the reference's `classification_models` ResNets
(SURVEY.md §3.4, unverified): C1 = post-stem ReLU (stride 2), C2..C5 = the
four residual stages (strides 4/8/16/32).
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..layers import SEBlock

Dtype = Any


class BasicBlock(nn.Module):
    features: int
    strides: Tuple[int, int]
    dtype: Dtype
    use_se: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)
        residual = x
        y = nn.Conv(self.features, (3, 3), self.strides, padding="SAME",
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.relu(norm("bn1")(y))
        y = nn.Conv(self.features, (3, 3), padding="SAME",
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = norm("bn2")(y)
        if self.use_se:
            # canonical SENet reduction r=16 with ReLU hidden activation —
            # exact sizing so se_resnet checkpoint SE convs ingest 1:1
            y = SEBlock(max(self.features // 16, 1), dtype=self.dtype,
                        act_fn="relu", name="se")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1), self.strides,
                               use_bias=False, dtype=self.dtype, name="downsample")(residual)
            residual = norm("bn_down")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int  # inner width; output is 4x
    strides: Tuple[int, int]
    dtype: Dtype
    use_se: bool = False
    groups: int = 1        # >1 → ResNeXt-style grouped 3x3 (Xie et al. 2017)
    width_factor: int = 1  # ResNeXt widens the inner 3x3 (e.g. 32x4d → 2x)
    # torchvision ("v1.5") strides the 3x3; the Caffe/Cadene lineage — the
    # origin of every se_resnet50/se_resnext checkpoint in the wild, and of
    # the Keras ports the reference's zoo used — strides the first 1x1.
    # Weight SHAPES are identical either way, so converters can't catch a
    # placement mismatch; it must be encoded in the architecture spec.
    stride_on_conv1: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)
        residual = x
        inner = self.features * self.width_factor
        s1 = self.strides if self.stride_on_conv1 else (1, 1)
        s2 = (1, 1) if self.stride_on_conv1 else self.strides
        y = nn.Conv(inner, (1, 1), s1, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.relu(norm("bn1")(y))
        y = nn.Conv(inner, (3, 3), s2, padding="SAME",
                    feature_group_count=self.groups,
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = nn.relu(norm("bn2")(y))
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv3")(y)
        y = norm("bn3")(y)
        if self.use_se:
            y = SEBlock(max(self.features * 4 // 16, 1), dtype=self.dtype,
                        act_fn="relu", name="se")(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features * 4, (1, 1), self.strides,
                               use_bias=False, dtype=self.dtype, name="downsample")(residual)
            residual = norm("bn_down")(residual)
        return nn.relu(y + residual)


class ResNetEncoder(nn.Module):
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    bottleneck: bool = False
    width: int = 64
    dtype: Dtype = jnp.bfloat16
    use_se: bool = False
    groups: int = 1        # ResNeXt cardinality (32 for resnext50_32x4d)
    width_factor: int = 1  # ResNeXt inner-width multiplier (2 for 32x4d)
    stride_on_conv1: bool = False  # Caffe/Cadene bottleneck stride placement

    @nn.compact
    def __call__(self, x, train: bool = False):
        Block = Bottleneck if self.bottleneck else BasicBlock
        feats = []
        # stem: 7x7/2 conv
        y = nn.Conv(self.width, (7, 7), (2, 2), padding="SAME",
                    use_bias=False, dtype=self.dtype, name="stem_conv")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="stem_bn")(y)
        y = nn.relu(y)
        feats.append(y)  # C1 stride 2
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding="SAME")
        for stage, n_blocks in enumerate(self.stage_sizes):
            features = self.width * (2 ** stage)
            for b in range(n_blocks):
                strides = (2, 2) if (b == 0 and stage > 0) else (1, 1)
                kw = {}
                if self.bottleneck:
                    kw = dict(groups=self.groups,
                              width_factor=self.width_factor,
                              stride_on_conv1=self.stride_on_conv1)
                y = Block(features, strides, self.dtype, use_se=self.use_se,
                          name=f"stage{stage+1}_block{b+1}", **kw)(y, train)
            feats.append(y)  # C2..C5 at strides 4/8/16/32
        return feats


class SEResNetEncoder(ResNetEncoder):
    use_se: bool = True


class PreactResNetEncoder(nn.Module):
    """The reference-era Keras ResNet18/34 graph — qubvel
    ``classification_models`` builds PRE-activation basic blocks (BN→ReLU
    before each conv, conv shortcut taken from the pre-activated tensor on
    every stage's first unit) with an input ``bn_data`` BatchNorm
    (scale-free) — a DIFFERENT architecture from torchvision's post-act
    resnets, so ``.h5`` encoder weights can only ingest into this variant
    (models/keras_h5.py).  Flax submodule names mirror the Keras layer
    names 1:1 to keep that converter mechanical.

    Taps follow segmentation_models' default_feature_layers for
    resnet18/34: C1 = ``relu0``, C2..C4 = ``stage{2,3,4}_unit1_relu1``
    (the pre-activation of the NEXT stage normalizes the previous stage's
    output at its stride), C5 = the final ``bn1``+``relu1``.  Channel
    counts (64/64/128/256/512 basic, 64/256/512/1024/2048 bottleneck)
    equal the post-act encoder's, so every decoder works unchanged.

    ``bottleneck=True`` builds classification_models' preact BOTTLENECK
    units (resnet50/101/152 ``.h5`` files: conv1 1x1 → conv2 3x3 stride →
    conv3 1x1·4w, same ``stage/unit`` naming).  ``se=True`` appends the
    zoo's ChannelSE attention (two biased 1x1 convs, r=16) to each unit's
    branch before the residual add — the seresnet18/34 graph.  Both are
    [MED]-confidence reconstructions of the upstream Keras code (the
    reference mount is empty — SURVEY.md §0); shape validation in
    models/keras_h5.py makes a wrong guess fail loudly at load.
    """

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    width: int = 64
    bottleneck: bool = False
    se: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        def norm(name, use_scale=True):
            # keras BatchNormalization defaults (momentum .99, eps 1e-3)
            return nn.BatchNorm(use_running_average=not train, momentum=0.99,
                                epsilon=1e-3, use_scale=use_scale,
                                dtype=self.dtype, name=name)

        feats = []
        y = norm("bn_data", use_scale=False)(x.astype(self.dtype))
        y = nn.Conv(self.width, (7, 7), (2, 2), padding="SAME",
                    use_bias=False, dtype=self.dtype, name="conv0")(y)
        y = nn.relu(norm("bn0")(y))
        feats.append(y)                       # C1 = relu0, stride 2
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding="SAME")
        for stage, n_blocks in enumerate(self.stage_sizes):
            features = self.width * (2 ** stage)
            out_ch = features * 4 if self.bottleneck else features
            for b in range(n_blocks):
                u = f"stage{stage + 1}_unit{b + 1}"
                s = (2, 2) if (b == 0 and stage > 0) else (1, 1)
                h = nn.relu(norm(f"{u}_bn1")(y))
                if b == 0 and stage > 0:
                    feats.append(h)           # C2..C4 = stageN_unit1_relu1
                if b == 0:
                    # 'post' cut: shortcut conv reads the PRE-ACTIVATED h
                    sc = nn.Conv(out_ch, (1, 1), s, use_bias=False,
                                 dtype=self.dtype, name=f"{u}_sc")(h)
                else:
                    sc = y
                if self.bottleneck:
                    h = nn.Conv(features, (1, 1), use_bias=False,
                                dtype=self.dtype, name=f"{u}_conv1")(h)
                    h = nn.relu(norm(f"{u}_bn2")(h))
                    h = nn.Conv(features, (3, 3), s, padding="SAME",
                                use_bias=False, dtype=self.dtype,
                                name=f"{u}_conv2")(h)
                    h = nn.relu(norm(f"{u}_bn3")(h))
                    h = nn.Conv(out_ch, (1, 1), use_bias=False,
                                dtype=self.dtype, name=f"{u}_conv3")(h)
                else:
                    h = nn.Conv(features, (3, 3), s, padding="SAME",
                                use_bias=False, dtype=self.dtype,
                                name=f"{u}_conv1")(h)
                    h = nn.relu(norm(f"{u}_bn2")(h))
                    h = nn.Conv(features, (3, 3), padding="SAME",
                                use_bias=False, dtype=self.dtype,
                                name=f"{u}_conv2")(h)
                if self.se:
                    # classification_models ChannelSE: biased 1x1 convs,
                    # r=16, applied to the branch before the residual add
                    h = SEBlock(max(out_ch // 16, 1), dtype=self.dtype,
                                act_fn="relu", name=f"{u}_se")(h)
                y = h + sc
        y = nn.relu(norm("bn1")(y))
        feats.append(y)                       # C5, stride 32
        return feats


class SENet154Bottleneck(nn.Module):
    """Cadene ``SEBottleneck`` (the senet154 block — pretrainedmodels
    ``senet.py``): 1x1 → 2p, grouped-64 3x3 (stride) → 4p, 1x1 4p → 4p,
    SE(r=16), with a KERNEL-3 downsample conv on the strided stages
    (Cadene ``downsample_kernel_size=3``; stage 1 keeps kernel 1)."""

    features: int                 # p; block output is 4p
    strides: Tuple[int, int]
    dtype: Dtype
    groups: int = 64
    down_kernel: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)
        residual = x
        y = nn.Conv(self.features * 2, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.relu(norm("bn1")(y))
        y = nn.Conv(self.features * 4, (3, 3), self.strides, padding="SAME",
                    feature_group_count=self.groups, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.relu(norm("bn2")(y))
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv3")(y)
        y = norm("bn3")(y)
        y = SEBlock(max(self.features * 4 // 16, 1), dtype=self.dtype,
                    act_fn="relu", name="se")(y)
        if residual.shape != y.shape:
            k = self.down_kernel
            residual = nn.Conv(self.features * 4, (k, k), self.strides,
                               padding="SAME", use_bias=False,
                               dtype=self.dtype, name="downsample")(residual)
            residual = norm("bn_down")(residual)
        return nn.relu(y + residual)


class SENet154Encoder(nn.Module):
    """Cadene senet154: deep 3-conv stem (64-64-128) + SEBottleneck stages
    (3, 8, 36, 3) at cardinality 64.  Taps: C1 128ch (post-stem, stride
    2), C2..C5 256/512/1024/2048 at strides 4/8/16/32."""

    stage_sizes: Sequence[int] = (3, 8, 36, 3)
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = lambda name: nn.BatchNorm(  # noqa: E731
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)
        feats = []
        y = x.astype(self.dtype)
        for i, (width, stride) in enumerate([(64, 2), (64, 1), (128, 1)]):
            y = nn.Conv(width, (3, 3), (stride, stride), padding="SAME",
                        use_bias=False, dtype=self.dtype,
                        name=f"stem_conv{i + 1}")(y)
            y = nn.relu(norm(f"stem_bn{i + 1}")(y))
        feats.append(y)                          # C1 stride 2, 128ch
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding="SAME")
        for stage, n_blocks in enumerate(self.stage_sizes):
            features = 64 * (2 ** stage)
            for b in range(n_blocks):
                strides = (2, 2) if (b == 0 and stage > 0) else (1, 1)
                y = SENet154Bottleneck(
                    features, strides, self.dtype,
                    down_kernel=1 if stage == 0 else 3,
                    name=f"stage{stage + 1}_block{b + 1}")(y, train)
            feats.append(y)                      # C2..C5
        return feats
