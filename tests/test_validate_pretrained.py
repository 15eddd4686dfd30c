"""tools/validate_pretrained.py — the first-contact checkpoint harness
(VERDICT r3 item 4) exercised against synthetic torch + Keras-h5 exports."""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("h5py")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from torch_oracles import TorchPreactResNet, TorchResNet, randomize_  # noqa: E402
from test_keras_h5 import _export_preact_h5  # noqa: E402

import validate_pretrained  # noqa: E402


@pytest.fixture()
def ckpt_dir(tmp_path):
    # torch resnet18 (torchvision naming)
    oracle = TorchResNet(stage_sizes=(2, 2, 2, 2)).eval()
    randomize_(oracle, seed=3)
    torch.save(oracle.state_dict(), str(tmp_path / "resnet18.pt"))
    # Keras preact resnet34 h5
    pre = TorchPreactResNet(stage_sizes=(3, 4, 6, 3)).eval()
    randomize_(pre, seed=5)
    with torch.no_grad():
        pre.bn_data.weight.fill_(1.0)
    _export_preact_h5(pre, str(tmp_path / "resnet34.h5"))
    return tmp_path


def test_validate_passes_good_checkpoints(ckpt_dir, capsys):
    rc = validate_pretrained.main([str(ckpt_dir)])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "PASS resnet18" in out
    assert "PASS resnet34" in out
    assert "C5:" in out  # activation stats printed


def test_validate_fails_wrong_family(ckpt_dir, capsys):
    """A resnet18 state dict renamed to resnet50 must FAIL (depth), not
    silently convert."""
    os.rename(ckpt_dir / "resnet18.pt", ckpt_dir / "resnet50.pt")
    rc = validate_pretrained.main([str(ckpt_dir), "--only", "resnet50"])
    out = capsys.readouterr().out
    assert rc == 1
    assert "FAIL resnet50" in out


def test_validate_fails_garbage_file(ckpt_dir, capsys):
    torch.save({"not": torch.zeros(1)}, str(ckpt_dir / "vgg16.pt"))
    rc = validate_pretrained.main([str(ckpt_dir), "--only", "vgg16"])
    out = capsys.readouterr().out
    assert rc == 1
    assert "FAIL vgg16" in out


def test_validate_reports_empty_dir(tmp_path, capsys):
    assert validate_pretrained.main([str(tmp_path)]) == 1
    assert "no checkpoint files" in capsys.readouterr().out
