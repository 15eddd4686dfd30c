import os

import pytest
import yaml

import segmentation_training_pipeline_tpu as stp
from segmentation_training_pipeline_tpu.config import ConfigError, parse_dict


FULL_YAML = """
architecture: Unet
backbone: resnet34
shape: [128, 128, 3]
classes: 1
activation: sigmoid
encoder_weights: null
optimizer: Adam
batch: 8
lr: 0.001
loss: binary_crossentropy + 0.25*dice_loss
metrics: [dice, iou]
primary_metric: val_dice
primary_metric_mode: auto
folds_count: 5
testSplit: 0.1
random_state: 33
negatives: real
augmentation:
  Fliplr: 0.5
  Flipud: 0.2
  Affine:
    rotate: [-10, 10]
    scale: [0.9, 1.1]
callbacks:
  EarlyStopping:
    patience: 10
    monitor: val_dice
stages:
  - epochs: 2
    freeze_encoder: true
  - epochs: 5
    lr: 0.0001
    unfreeze_encoder: true
    negatives: 2
    callbacks:
      ReduceLROnPlateau:
        patience: 3
        factor: 0.5
"""


def test_parse_full(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text(FULL_YAML)
    cfg = stp.parse(str(p))
    assert cfg.architecture == "Unet"
    assert cfg.backbone == "resnet34"
    assert cfg.shape == (128, 128, 3)
    assert cfg.batch == 8
    assert len(cfg.stages) == 2
    assert cfg.stages[0].freeze_encoder is True
    assert cfg.stages[1].lr == pytest.approx(1e-4)
    assert cfg.stages[1].negatives == 2
    assert cfg.stages[1].callbacks[0]["name"] == "ReduceLROnPlateau"
    assert cfg.augmentation[0]["name"] == "Fliplr"
    assert cfg.directory == str(tmp_path)
    assert cfg.weights_path(0, 1).endswith(os.path.join("weights", "best-0.1.weights"))
    assert cfg.metrics_path(2, 0).endswith(os.path.join("metrics", "metrics-2.0.csv"))


def test_unknown_top_key():
    with pytest.raises(ConfigError, match="unknown key"):
        parse_dict({"architedture": "Unet"})


def test_unknown_architecture_suggests():
    with pytest.raises(ConfigError, match="Did you mean 'Unet'"):
        parse_dict({"architecture": "Unte"})


def test_unknown_backbone():
    with pytest.raises(ConfigError, match="backbone"):
        parse_dict({"backbone": "resnet35"})


def test_unknown_callback():
    with pytest.raises(ConfigError, match="callback"):
        parse_dict({"callbacks": {"EarlyStoping": {}}})


def test_unknown_augmenter():
    with pytest.raises(ConfigError, match="augmenter"):
        parse_dict({"augmentation": {"Flipllr": 0.5}})


def test_bad_loss_expr():
    with pytest.raises(Exception, match="loss"):
        parse_dict({"loss": "dice_loss + + bce"})


def test_unknown_stage_key():
    with pytest.raises(ConfigError, match=r"stages\[0\]"):
        parse_dict({"stages": [{"epochz": 3}]})


def test_case_insensitive_arch_and_aliases():
    cfg = parse_dict({"architecture": "unet", "backbone": "resnet18"})
    assert cfg.architecture == "unet"
    cfg = parse_dict({"architecture": "DeepLabV3+", "backbone": "mobilenetv2"})
    assert cfg.architecture == "DeepLabV3+"


def test_primary_mode_auto():
    cfg = parse_dict({"primary_metric": "val_dice", "metrics": ["dice"]})
    assert cfg.primary_mode() == "max"
    cfg = parse_dict({"primary_metric": "val_loss"})
    assert cfg.primary_mode() == "min"
    cfg = parse_dict({"primary_metric": "val_dice", "metrics": ["dice"],
                      "primary_metric_mode": "min"})
    assert cfg.primary_mode() == "min"


def test_primary_metric_must_be_tracked():
    # an untracked monitor would silently disable best-checkpointing
    with pytest.raises(ConfigError, match="primary_metric"):
        parse_dict({"primary_metric": "val_iou"})
    with pytest.raises(ConfigError, match="primary_metric"):
        parse_dict({"primary_metric": "val_iou", "metrics": ["dice"]})
    # loss is always tracked; metrics members are, val_-prefixed or not
    parse_dict({"primary_metric": "loss"})
    parse_dict({"primary_metric": "iou", "metrics": ["iou"]})
    parse_dict({"primary_metric": "val_iou", "metrics": ["iou"]})


def test_backbone_registry_matches_encoder_zoo():
    """Every implemented encoder must be reachable from YAML and vice versa
    (round-1 regression: 6 encoders existed but were rejected by parse)."""
    from segmentation_training_pipeline_tpu.config import (
        BACKBONES, _populate_registries)
    from segmentation_training_pipeline_tpu.models.encoders import (
        known_backbones)

    _populate_registries()
    assert sorted(BACKBONES.names()) == sorted(known_backbones())
    for name in known_backbones():
        cfg = parse_dict({"backbone": name})
        assert cfg.backbone == name


def test_explicit_zero_weight_decay_and_momentum():
    cfg = parse_dict({"optimizer": "AdamW", "weight_decay": 0.0})
    assert cfg.weight_decay == 0.0
    cfg = parse_dict({"optimizer": "AdamW"})
    assert cfg.weight_decay is None
    cfg = parse_dict({"optimizer": "SGD", "momentum": 0.9})
    assert cfg.momentum == 0.9


def test_shape_2d_gets_channels():
    cfg = parse_dict({"shape": [96, 96]})
    assert cfg.shape == (96, 96, 3)


def test_callbacks_list_form():
    cfg = parse_dict({"callbacks": [{"EarlyStopping": {"patience": 3}}, "TerminateOnNaN"]})
    assert [c["name"] for c in cfg.callbacks] == ["EarlyStopping", "TerminateOnNaN"]


def test_crops_validation():
    with pytest.raises(ConfigError):
        parse_dict({"crops": 1})
    assert parse_dict({"crops": 3}).crops == 3


def test_backbone_aliases_canonicalize():
    from segmentation_training_pipeline_tpu.config import parse_dict

    for alias in ("xception65", "xception_deeplab", "xception_aligned"):
        cfg = parse_dict({"architecture": "DeepLabV3", "backbone": alias})
        assert cfg.backbone == "xception_aligned"


def test_d4_tta_nonsquare_rejected_at_parse():
    from segmentation_training_pipeline_tpu.config import (ConfigError,
                                                           parse_dict)

    with pytest.raises(ConfigError, match="square"):
        parse_dict({"shape": [256, 512, 3], "testTimeAugmentation": "d4"})
    # square parses fine
    assert parse_dict({"shape": [256, 256, 3],
                       "testTimeAugmentation": "d4"}
                      ).testTimeAugmentation == "d4"


def test_known_unsupported_imgaug_names_get_pointed_error():
    """VERDICT r3 item 9: a migrating config carrying a REAL imgaug name
    we deliberately do not lower must fail with a pointer to the
    schema.md list, not a bare unknown-key error."""
    from segmentation_training_pipeline_tpu.config import (ConfigError,
                                                           parse_dict)

    # (BlendAlphaSomeColors, Canny and Cartoon moved OFF this list in
    # late r5 — they lower now; see tests/test_aug_breadth4.py)
    for name in ("Voronoi", "BlendAlphaBoundingBoxes", "BlendAlphaMask",
                 "Lambda", "pillike.Autocontrast"):
        with pytest.raises(ConfigError, match="schema.md"):
            parse_dict({"architecture": "Unet", "backbone": "resnet18",
                        "augmentation": {name: 0.5}})
    # a genuinely unknown (typo'd) name still gets the suggestion path
    with pytest.raises(ConfigError, match="Did you mean"):
        parse_dict({"architecture": "Unet", "backbone": "resnet18",
                    "augmentation": {"Flipllr": 0.5}})


def test_new_breadth_augmenters_parse():
    from segmentation_training_pipeline_tpu.config import parse_dict

    cfg = parse_dict({
        "architecture": "Unet", "backbone": "resnet18",
        "augmentation": {
            "Salt": 0.02, "Pepper": 0.02, "ImpulseNoise": 0.03,
            "CoarseSaltAndPepper": {"p": 0.05, "size_percent": 0.1},
            "AdditiveLaplaceNoise": {"scale": [0, 10]},
            "EdgeDetect": {"alpha": [0, 0.5]},
            "AveragePooling": 2, "MaxPooling": 2, "MinPooling": 2,
        }})
    assert len(cfg.augmentation) == 9
