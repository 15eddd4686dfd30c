"""Encoder (backbone) zoo.

Each encoder is a Flax module whose ``__call__(x, train)`` returns the list
of feature maps ``[C1, C2, C3, C4, C5]`` at strides 2/4/8/16/32 — the same
skip-tap contract the reference gets from `segmentation_models`' backbone
factory (SURVEY.md §3.4), which the decoders rely on for IoU parity.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple, Type

from .resnet import ResNetEncoder, SENet154Encoder, SEResNetEncoder
from .vgg import VGGEncoder
from .mobilenet import MobileNetV1Encoder
from .mobilenetv2 import MobileNetV2Encoder
from .efficientnet import EfficientNetEncoder
from .densenet import DenseNetEncoder
from .xception import XceptionEncoder
from .xception_aligned import AlignedXceptionEncoder
from .inception import InceptionV3Encoder, InceptionResNetV2Encoder

# name → (module class, constructor kwargs)
_SPECS: Dict[str, Tuple[Type, Dict[str, Any]]] = {
    "resnet18": (ResNetEncoder, dict(stage_sizes=(2, 2, 2, 2), bottleneck=False)),
    "resnet34": (ResNetEncoder, dict(stage_sizes=(3, 4, 6, 3), bottleneck=False)),
    "resnet50": (ResNetEncoder, dict(stage_sizes=(3, 4, 6, 3), bottleneck=True)),
    "resnet101": (ResNetEncoder, dict(stage_sizes=(3, 4, 23, 3), bottleneck=True)),
    "resnet152": (ResNetEncoder, dict(stage_sizes=(3, 8, 36, 3), bottleneck=True)),
    "seresnet18": (SEResNetEncoder, dict(stage_sizes=(2, 2, 2, 2), bottleneck=False)),
    "seresnet34": (SEResNetEncoder, dict(stage_sizes=(3, 4, 6, 3), bottleneck=False)),
    # seresnet50 strides the first 1x1 — the Caffe/Cadene SEResNetBottleneck
    # quirk every se_resnet50 checkpoint in the wild (incl. the Keras ports
    # behind the reference zoo) was trained with.  seresnext and plain
    # resnet/resnext stride the 3x3 (torchvision "v1.5" == Cadene
    # SEResNeXtBottleneck).  Weight shapes are identical either way, so the
    # placement must live in the spec, not the converter.
    "seresnet50": (SEResNetEncoder, dict(stage_sizes=(3, 4, 6, 3), bottleneck=True,
                                         stride_on_conv1=True)),
    "seresnet101": (SEResNetEncoder, dict(stage_sizes=(3, 4, 23, 3), bottleneck=True,
                                          stride_on_conv1=True)),
    "seresnet152": (SEResNetEncoder, dict(stage_sizes=(3, 8, 36, 3), bottleneck=True,
                                          stride_on_conv1=True)),
    # ResNeXt 32x4d (Xie et al. 2017): cardinality-32 grouped 3x3, 2x inner width
    "resnext50": (ResNetEncoder, dict(stage_sizes=(3, 4, 6, 3), bottleneck=True,
                                      groups=32, width_factor=2)),
    "resnext101": (ResNetEncoder, dict(stage_sizes=(3, 4, 23, 3), bottleneck=True,
                                       groups=32, width_factor=2)),
    "seresnext50": (SEResNetEncoder, dict(stage_sizes=(3, 4, 6, 3), bottleneck=True,
                                          groups=32, width_factor=2)),
    "seresnext101": (SEResNetEncoder, dict(stage_sizes=(3, 4, 23, 3), bottleneck=True,
                                           groups=32, width_factor=2)),
    # Cadene senet154: its own block (2p/4p widths, cardinality 64, deep
    # stem, kernel-3 downsamples) — NOT expressible as an SEResNet spec
    "senet154": (SENet154Encoder, {}),
    "vgg16": (VGGEncoder, dict(stage_convs=(2, 2, 3, 3, 3))),
    "vgg19": (VGGEncoder, dict(stage_convs=(2, 2, 4, 4, 4))),
    "mobilenet": (MobileNetV1Encoder, {}),
    "mobilenetv1": (MobileNetV1Encoder, {}),  # alias
    "mobilenetv2": (MobileNetV2Encoder, {}),
    "densenet121": (DenseNetEncoder, dict(block_sizes=(6, 12, 24, 16))),
    "densenet169": (DenseNetEncoder, dict(block_sizes=(6, 12, 32, 32))),
    "densenet201": (DenseNetEncoder, dict(block_sizes=(6, 12, 48, 32))),
    "xception": (XceptionEncoder, {}),
    # the DeepLabV3+ pascal_voc graph (bonlime); the factory sets
    # output_stride=16 when paired with the DeepLab architecture
    "xception_aligned": (AlignedXceptionEncoder, {}),
    "inceptionv3": (InceptionV3Encoder, {}),
    "inceptionresnetv2": (InceptionResNetV2Encoder, {}),
}

# EfficientNet B0-B7: (width_mult, depth_mult)
for _i, (_w, _d) in enumerate([
    (1.0, 1.0), (1.0, 1.1), (1.1, 1.2), (1.2, 1.4),
    (1.4, 1.8), (1.6, 2.2), (1.8, 2.6), (2.0, 3.1),
]):
    _SPECS[f"efficientnetb{_i}"] = (
        EfficientNetEncoder, dict(width_mult=_w, depth_mult=_d))


def encoder_spec(name: str) -> Tuple[Type, Dict[str, Any]]:
    key = name.lower()
    if key not in _SPECS:
        raise KeyError(f"unknown backbone {name!r}; known: {sorted(_SPECS)}")
    cls, kw = _SPECS[key]
    return cls, dict(kw)


def build_encoder(name: str, **kw):
    cls, base_kw = encoder_spec(name)
    return cls(**base_kw, **kw)


def known_backbones():
    return sorted(_SPECS)
