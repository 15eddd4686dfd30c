"""Every YAML under examples/ must parse — the examples double as the
schema documentation (SURVEY §2a 'Examples/quickstart')."""

import glob
import os

import pytest

import segmentation_training_pipeline_tpu as stp

EXAMPLES = sorted(glob.glob(os.path.join(
    os.path.dirname(__file__), "..", "examples", "*.yaml")))


@pytest.mark.parametrize("path", EXAMPLES, ids=[os.path.basename(p)
                                                for p in EXAMPLES])
def test_example_parses(path):
    cfg = stp.parse(path)
    assert cfg.architecture and cfg.backbone
    assert cfg.stages


def test_examples_exist():
    assert len(EXAMPLES) >= 7
