"""Pretrained-weights converter: torch-naming → Flax ResNet tree, npz
round-trip, and the imagenet-miss warning path."""

import os

import numpy as np
import pytest

import jax

from segmentation_training_pipeline_tpu.models.factory import (
    create_model,
    init_model,
)
from segmentation_training_pipeline_tpu.models.pretrained import (
    PretrainedWeightsError,
    convert_torch_resnet,
    export_encoder_npz,
    load_encoder_weights,
)


@pytest.fixture(scope="module")
def r18_vars():
    m = create_model("Unet", "resnet18", classes=1, dtype="float32")
    return jax.device_get(init_model(m, (32, 32, 3), seed=0))


def _synthetic_torch_state(params_enc, stats_enc, seed=0):
    """Build a torchvision-style resnet state dict whose values are random
    but whose SHAPES are derived from our encoder tree (inverse mapping)."""
    r = np.random.RandomState(seed)
    state = {}

    def conv_t(kern):  # flax HWIO -> torch OIHW
        return np.transpose(r.randn(*kern.shape).astype(np.float32),
                            (3, 2, 0, 1))

    def add_bn(prefix, scale):
        n = scale.shape[0]
        state[f"{prefix}.weight"] = r.randn(n).astype(np.float32)
        state[f"{prefix}.bias"] = r.randn(n).astype(np.float32)
        state[f"{prefix}.running_mean"] = r.randn(n).astype(np.float32)
        state[f"{prefix}.running_var"] = np.abs(r.randn(n)).astype(np.float32)

    state["conv1.weight"] = conv_t(params_enc["stem_conv"]["kernel"])
    add_bn("bn1", params_enc["stem_bn"]["scale"])
    for stage in range(1, 5):
        b = 0
        while f"stage{stage}_block{b+1}" in params_enc:
            blk = params_enc[f"stage{stage}_block{b+1}"]
            n_convs = 3 if "conv3" in blk else 2
            for ci in range(1, n_convs + 1):
                state[f"layer{stage}.{b}.conv{ci}.weight"] = conv_t(
                    blk[f"conv{ci}"]["kernel"])
                add_bn(f"layer{stage}.{b}.bn{ci}", blk[f"bn{ci}"]["scale"])
            if "downsample" in blk:
                state[f"layer{stage}.{b}.downsample.0.weight"] = conv_t(
                    blk["downsample"]["kernel"])
                add_bn(f"layer{stage}.{b}.downsample.1",
                       blk["bn_down"]["scale"])
            b += 1
    return state


class TestTorchConvert:
    def test_values_land_transposed(self, r18_vars):
        p = r18_vars["params"]["encoder"]
        s = r18_vars["batch_stats"]["encoder"]
        state = _synthetic_torch_state(p, s)
        new_p, new_s = convert_torch_resnet(state, p, s)
        want = np.transpose(state["conv1.weight"], (2, 3, 1, 0))
        np.testing.assert_array_equal(new_p["stem_conv"]["kernel"], want)
        np.testing.assert_array_equal(new_s["stem_bn"]["mean"],
                                      state["bn1.running_mean"])
        w2 = np.transpose(state["layer2.0.downsample.0.weight"], (2, 3, 1, 0))
        np.testing.assert_array_equal(
            new_p["stage2_block1"]["downsample"]["kernel"], w2)

    def test_wrong_depth_raises(self, r18_vars):
        p = r18_vars["params"]["encoder"]
        s = r18_vars["batch_stats"]["encoder"]
        state = _synthetic_torch_state(p, s)
        # add a block that resnet18 doesn't have
        state["layer1.2.conv1.weight"] = state["layer1.0.conv1.weight"]
        with pytest.raises(PretrainedWeightsError, match="depth mismatch"):
            convert_torch_resnet(state, p, s)

    def test_shape_mismatch_raises(self, r18_vars):
        p = r18_vars["params"]["encoder"]
        s = r18_vars["batch_stats"]["encoder"]
        state = _synthetic_torch_state(p, s)
        state["conv1.weight"] = np.zeros((64, 3, 3, 3), np.float32)  # wrong k
        with pytest.raises(PretrainedWeightsError, match="conv1"):
            convert_torch_resnet(state, p, s)


class TestNpzRoundtrip:
    def test_export_and_load(self, r18_vars, tmp_path):
        path = str(tmp_path / "enc.npz")
        export_encoder_npz(path, r18_vars)
        # zero out the encoder, reload, and expect original values back
        import copy

        vars2 = copy.deepcopy(r18_vars)
        vars2["params"]["encoder"] = jax.tree.map(
            np.zeros_like, vars2["params"]["encoder"])
        out = load_encoder_weights("resnet18", path, vars2)
        a = jax.tree.leaves(out["params"]["encoder"])
        b = jax.tree.leaves(r18_vars["params"]["encoder"])
        assert all(np.array_equal(x, y) for x, y in zip(a, b))
        # decoder untouched
        assert out["params"]["decoder"] is vars2["params"]["decoder"]


def test_imagenet_missing_warns_not_errors(r18_vars, tmp_path, monkeypatch):
    monkeypatch.setenv("STP_PRETRAINED_DIR", str(tmp_path / "nothing"))
    with pytest.warns(UserWarning, match="training .*from scratch|from "
                                         "scratch"):
        out = load_encoder_weights("resnet18", "imagenet", r18_vars)
    assert out is None


def test_imagenet_missing_strict_mode_raises(r18_vars, tmp_path, monkeypatch):
    monkeypatch.setenv("STP_PRETRAINED_DIR", str(tmp_path / "nothing"))
    monkeypatch.setenv("STP_REQUIRE_PRETRAINED", "1")
    with pytest.raises(PretrainedWeightsError, match="STP_REQUIRE_PRETRAINED"):
        load_encoder_weights("resnet18", "imagenet", r18_vars)


def test_every_backbone_has_a_torch_converter():
    """VERDICT r2 item 2: the no-converter branch must be unreachable for
    every registered backbone."""
    from segmentation_training_pipeline_tpu.models.encoders import (
        known_backbones,
    )
    from segmentation_training_pipeline_tpu.models.pretrained import (
        torch_converter_for,
    )

    for name in known_backbones():
        if name == "xception_aligned":
            # h5-native graph (bonlime pascal_voc release): the torch
            # branch must raise a POINTED error, not the generic one
            with pytest.raises(PretrainedWeightsError, match="pascal_voc"):
                torch_converter_for(name)
            continue
        assert callable(torch_converter_for(name)), name


def test_missing_explicit_path_raises(r18_vars):
    with pytest.raises(PretrainedWeightsError, match="not found"):
        load_encoder_weights("resnet18", "/no/such/file.pt", r18_vars)


def test_torch_pt_file_roundtrip(r18_vars, tmp_path):
    torch = pytest.importorskip("torch")
    p = r18_vars["params"]["encoder"]
    s = r18_vars["batch_stats"]["encoder"]
    state = {k: torch.from_numpy(np.asarray(v))
             for k, v in _synthetic_torch_state(p, s).items()}
    path = str(tmp_path / "resnet18.pt")
    torch.save(state, path)
    out = load_encoder_weights("resnet18", path, r18_vars)
    want = np.transpose(state["conv1.weight"].numpy(), (2, 3, 1, 0))
    np.testing.assert_array_equal(out["params"]["encoder"]["stem_conv"]["kernel"],
                                  want)


# ---------------------------------------------------------------------------
# efficientnet / mobilenetv2 torch-format converters (round-2)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def effb0_vars():
    m = create_model("Unet", "efficientnetb0", classes=1, dtype="float32")
    return jax.device_get(init_model(m, (32, 32, 3), seed=0))


@pytest.fixture(scope="module")
def mbv2_vars():
    m = create_model("Unet", "mobilenetv2", classes=1, dtype="float32")
    return jax.device_get(init_model(m, (32, 32, 3), seed=0))


def _conv_t(r, kern):  # inverse of the converter's HWIO <- OIHW transpose
    return np.transpose(r.randn(*kern.shape).astype(np.float32), (3, 2, 0, 1))


def _add_bn(state, r, prefix, scale):
    n = scale.shape[0]
    state[f"{prefix}.weight"] = r.randn(n).astype(np.float32)
    state[f"{prefix}.bias"] = r.randn(n).astype(np.float32)
    state[f"{prefix}.running_mean"] = r.randn(n).astype(np.float32)
    state[f"{prefix}.running_var"] = np.abs(r.randn(n)).astype(np.float32)


def _synthetic_torch_effnet(params_enc, seed=0):
    """torchvision efficientnet_b0-style state dict with shapes derived
    from our encoder tree (inverse mapping of convert_torch_efficientnet)."""
    r = np.random.RandomState(seed)
    state = {}
    state["features.0.0.weight"] = _conv_t(r, params_enc["stem_conv"]["kernel"])
    _add_bn(state, r, "features.0.1", params_enc["stem_bn"]["scale"])
    for si in range(7):
        i = 0
        while f"stage{si}_block{i}" in params_enc:
            blk = params_enc[f"stage{si}_block{i}"]
            p = f"features.{si + 1}.{i}.block"
            off = 0
            if "expand" in blk:
                state[f"{p}.0.0.weight"] = _conv_t(r, blk["expand"]["kernel"])
                _add_bn(state, r, f"{p}.0.1", blk["expand_bn"]["scale"])
                off = 1
            state[f"{p}.{off}.0.weight"] = _conv_t(r, blk["depthwise"]["kernel"])
            _add_bn(state, r, f"{p}.{off}.1", blk["dw_bn"]["scale"])
            se = blk["se"]
            state[f"{p}.{off+1}.fc1.weight"] = _conv_t(r, se["reduce"]["kernel"])
            state[f"{p}.{off+1}.fc1.bias"] = r.randn(
                *se["reduce"]["bias"].shape).astype(np.float32)
            state[f"{p}.{off+1}.fc2.weight"] = _conv_t(r, se["expand"]["kernel"])
            state[f"{p}.{off+1}.fc2.bias"] = r.randn(
                *se["expand"]["bias"].shape).astype(np.float32)
            state[f"{p}.{off+2}.0.weight"] = _conv_t(r, blk["project"]["kernel"])
            _add_bn(state, r, f"{p}.{off+2}.1", blk["project_bn"]["scale"])
            i += 1
    state["features.8.0.weight"] = _conv_t(r, params_enc["head_conv"]["kernel"])
    _add_bn(state, r, "features.8.1", params_enc["head_bn"]["scale"])
    return state


def _synthetic_torch_mbv2(params_enc, seed=0):
    r = np.random.RandomState(seed)
    state = {}
    state["features.0.0.weight"] = _conv_t(r, params_enc["stem_conv"]["kernel"])
    _add_bn(state, r, "features.0.1", params_enc["stem_bn"]["scale"])
    bi = 0
    while f"block{bi}" in params_enc:
        blk = params_enc[f"block{bi}"]
        p = f"features.{bi + 1}.conv"
        if "expand" in blk:
            state[f"{p}.0.0.weight"] = _conv_t(r, blk["expand"]["kernel"])
            _add_bn(state, r, f"{p}.0.1", blk["expand_bn"]["scale"])
            state[f"{p}.1.0.weight"] = _conv_t(r, blk["depthwise"]["kernel"])
            _add_bn(state, r, f"{p}.1.1", blk["dw_bn"]["scale"])
            state[f"{p}.2.weight"] = _conv_t(r, blk["project"]["kernel"])
            _add_bn(state, r, f"{p}.3", blk["project_bn"]["scale"])
        else:
            state[f"{p}.0.0.weight"] = _conv_t(r, blk["depthwise"]["kernel"])
            _add_bn(state, r, f"{p}.0.1", blk["dw_bn"]["scale"])
            state[f"{p}.1.weight"] = _conv_t(r, blk["project"]["kernel"])
            _add_bn(state, r, f"{p}.2", blk["project_bn"]["scale"])
        bi += 1
    state["features.18.0.weight"] = _conv_t(r, params_enc["head_conv"]["kernel"])
    _add_bn(state, r, "features.18.1", params_enc["head_bn"]["scale"])
    return state


class TestEfficientNetConvert:
    def test_values_land_transposed(self, effb0_vars):
        from segmentation_training_pipeline_tpu.models.pretrained import (
            convert_torch_efficientnet)

        p = effb0_vars["params"]["encoder"]
        s = effb0_vars["batch_stats"]["encoder"]
        state = _synthetic_torch_effnet(p)
        new_p, new_s = convert_torch_efficientnet(state, p, s)
        want = np.transpose(state["features.0.0.weight"], (2, 3, 1, 0))
        np.testing.assert_array_equal(new_p["stem_conv"]["kernel"], want)
        # SE biases ride along (stage 0 block 0 has no expand -> se at .1)
        np.testing.assert_array_equal(
            new_p["stage0_block0"]["se"]["reduce"]["bias"],
            state["features.1.0.block.1.fc1.bias"])
        np.testing.assert_array_equal(
            new_s["head_bn"]["var"], state["features.8.1.running_var"])

    def test_wrong_variant_raises(self, effb0_vars):
        from segmentation_training_pipeline_tpu.models.pretrained import (
            convert_torch_efficientnet)

        p = effb0_vars["params"]["encoder"]
        s = effb0_vars["batch_stats"]["encoder"]
        state = _synthetic_torch_effnet(p)
        del state["features.2.1.block.0.0.weight"]  # drop a block (b0->"b-1")
        with pytest.raises(PretrainedWeightsError):
            convert_torch_efficientnet(state, p, s)

    def test_imagenet_resolution_via_pt(self, effb0_vars, tmp_path,
                                        monkeypatch):
        torch = pytest.importorskip("torch")
        p = effb0_vars["params"]["encoder"]
        state = {k: torch.from_numpy(np.asarray(v))
                 for k, v in _synthetic_torch_effnet(p).items()}
        root = tmp_path / "pre"
        root.mkdir()
        torch.save(state, str(root / "efficientnetb0.pt"))
        monkeypatch.setenv("STP_PRETRAINED_DIR", str(root))
        out = load_encoder_weights("efficientnetb0", "imagenet", effb0_vars)
        assert out is not None
        want = np.transpose(state["features.0.0.weight"].numpy(), (2, 3, 1, 0))
        np.testing.assert_array_equal(
            out["params"]["encoder"]["stem_conv"]["kernel"], want)


class TestMobileNetV2Convert:
    def test_values_land_transposed(self, mbv2_vars):
        from segmentation_training_pipeline_tpu.models.pretrained import (
            convert_torch_mobilenetv2)

        p = mbv2_vars["params"]["encoder"]
        s = mbv2_vars["batch_stats"]["encoder"]
        state = _synthetic_torch_mbv2(p)
        new_p, new_s = convert_torch_mobilenetv2(state, p, s)
        want = np.transpose(state["features.0.0.weight"], (2, 3, 1, 0))
        np.testing.assert_array_equal(new_p["stem_conv"]["kernel"], want)
        # block0 is the expansion-1 block
        w = np.transpose(state["features.1.conv.1.weight"], (2, 3, 1, 0))
        np.testing.assert_array_equal(new_p["block0"]["project"]["kernel"], w)
        np.testing.assert_array_equal(
            new_s["head_bn"]["mean"], state["features.18.1.running_mean"])

    def test_shape_mismatch_raises(self, mbv2_vars):
        from segmentation_training_pipeline_tpu.models.pretrained import (
            convert_torch_mobilenetv2)

        p = mbv2_vars["params"]["encoder"]
        s = mbv2_vars["batch_stats"]["encoder"]
        state = _synthetic_torch_mbv2(p)
        state["features.0.0.weight"] = np.zeros((31, 3, 3, 3), np.float32)
        with pytest.raises(PretrainedWeightsError, match="features.0.0"):
            convert_torch_mobilenetv2(state, p, s)


class TestVGGConvert:
    @pytest.fixture(scope="class")
    def vgg16_vars(self):
        m = create_model("Unet", "vgg16", classes=1, dtype="float32")
        return jax.device_get(init_model(m, (32, 32, 3), seed=0))

    @staticmethod
    def _synthetic_torch_vgg(params_enc, with_bn=True, seed=3):
        """torchvision-style flat features.N Sequential with the encoder's
        shapes (conv, [bn], relu per conv; maxpool gaps between stages)."""
        r = np.random.RandomState(seed)
        state = {}
        i = 0
        stage = 1
        while f"stage{stage}_conv1" in params_enc:
            c = 1
            while f"stage{stage}_conv{c}" in params_enc:
                kern = params_enc[f"stage{stage}_conv{c}"]["kernel"]
                state[f"features.{i}.weight"] = np.transpose(
                    r.randn(*kern.shape).astype(np.float32), (3, 2, 0, 1))
                # torchvision vgg convs carry biases in BOTH variants
                state[f"features.{i}.bias"] = r.randn(
                    kern.shape[-1]).astype(np.float32)
                i += 1
                if with_bn:
                    n = kern.shape[-1]
                    state[f"features.{i}.weight"] = r.rand(n).astype(
                        np.float32) + 0.5
                    state[f"features.{i}.bias"] = r.randn(n).astype(
                        np.float32)
                    state[f"features.{i}.running_mean"] = r.randn(n).astype(
                        np.float32)
                    state[f"features.{i}.running_var"] = r.rand(n).astype(
                        np.float32) + 0.5
                    i += 1
                i += 1  # relu
                c += 1
            i += 1  # maxpool
            stage += 1
        return state

    def test_bn_variant_values_land(self, vgg16_vars):
        from segmentation_training_pipeline_tpu.models.pretrained import (
            convert_torch_vgg)

        p = vgg16_vars["params"]["encoder"]
        s = vgg16_vars["batch_stats"]["encoder"]
        state = self._synthetic_torch_vgg(p, with_bn=True)
        new_p, new_s = convert_torch_vgg(state, p, s)
        want = np.transpose(state["features.0.weight"], (2, 3, 1, 0))
        np.testing.assert_array_equal(new_p["stage1_conv1"]["kernel"], want)
        # conv bias folds into the converted running mean (BN saw Wx+b)
        np.testing.assert_allclose(
            new_s["stage1_bn1"]["mean"],
            state["features.1.running_mean"] - state["features.0.bias"],
            rtol=1e-6)
        # last conv of stage 5 also landed
        assert not np.array_equal(
            new_p["stage5_conv3"]["kernel"],
            np.asarray(p["stage5_conv3"]["kernel"]))

    def test_plain_vgg_fills_convs_only(self, vgg16_vars):
        from segmentation_training_pipeline_tpu.models.pretrained import (
            convert_torch_vgg)

        p = vgg16_vars["params"]["encoder"]
        s = vgg16_vars["batch_stats"]["encoder"]
        state = self._synthetic_torch_vgg(p, with_bn=False)
        new_p, new_s = convert_torch_vgg(state, p, s)
        want = np.transpose(state["features.0.weight"], (2, 3, 1, 0))
        np.testing.assert_array_equal(new_p["stage1_conv1"]["kernel"], want)
        # BN untouched (identity init preserved)
        np.testing.assert_array_equal(new_p["stage1_bn1"]["scale"],
                                      np.asarray(p["stage1_bn1"]["scale"]))

    def test_depth_mismatch_raises(self, vgg16_vars):
        from segmentation_training_pipeline_tpu.models.pretrained import (
            convert_torch_vgg)

        p = vgg16_vars["params"]["encoder"]
        s = vgg16_vars["batch_stats"]["encoder"]
        state = self._synthetic_torch_vgg(p, with_bn=True)
        # drop the last conv -> vgg16 state no longer matches
        last = max(int(k.split(".")[1]) for k in state
                   if k.endswith(".weight")
                   and np.asarray(state[k]).ndim == 4)
        del state[f"features.{last}.weight"]
        with pytest.raises(PretrainedWeightsError):
            convert_torch_vgg(state, p, s)

    def test_imagenet_resolution_via_pt(self, vgg16_vars, tmp_path,
                                        monkeypatch):
        torch = pytest.importorskip("torch")
        p = vgg16_vars["params"]["encoder"]
        state = {k: torch.from_numpy(np.asarray(v))
                 for k, v in self._synthetic_torch_vgg(p).items()}
        root = tmp_path / "pre"
        root.mkdir()
        torch.save(state, str(root / "vgg16.pt"))
        monkeypatch.setenv("STP_PRETRAINED_DIR", str(root))
        out = load_encoder_weights("vgg16", "imagenet", vgg16_vars)
        assert out is not None
        want = np.transpose(state["features.0.weight"].numpy(), (2, 3, 1, 0))
        np.testing.assert_array_equal(
            out["params"]["encoder"]["stage1_conv1"]["kernel"], want)


class TestDenseNetConvert:
    @pytest.fixture(scope="class")
    def d121_vars(self):
        m = create_model("Unet", "densenet121", classes=1, dtype="float32")
        return jax.device_get(init_model(m, (32, 32, 3), seed=0))

    @staticmethod
    def _synthetic_torch_densenet(params_enc, seed=5):
        r = np.random.RandomState(seed)
        state = {}

        def conv(key, kern):
            state[key] = np.transpose(
                r.randn(*np.asarray(kern).shape).astype(np.float32),
                (3, 2, 0, 1))

        def bn(prefix, n):
            state[prefix + ".weight"] = r.rand(n).astype(np.float32) + 0.5
            state[prefix + ".bias"] = r.randn(n).astype(np.float32)
            state[prefix + ".running_mean"] = r.randn(n).astype(np.float32)
            state[prefix + ".running_var"] = r.rand(n).astype(np.float32) + 0.5

        conv("features.conv0.weight", params_enc["stem_conv"]["kernel"])
        bn("features.norm0", params_enc["stem_conv"]["kernel"].shape[-1])
        for b in range(1, 5):
            li = 1
            while f"block{b}_layer{li}" in params_enc:
                blk = params_enc[f"block{b}_layer{li}"]
                src = f"features.denseblock{b}.denselayer{li}"
                bn(src + ".norm1", blk["conv1"]["kernel"].shape[-2])
                conv(src + ".conv1.weight", blk["conv1"]["kernel"])
                bn(src + ".norm2", blk["conv2"]["kernel"].shape[-2])
                conv(src + ".conv2.weight", blk["conv2"]["kernel"])
                li += 1
            if b < 4:
                t = params_enc[f"trans{b}_conv"]["kernel"]
                bn(f"features.transition{b}.norm", np.asarray(t).shape[-2])
                conv(f"features.transition{b}.conv.weight", t)
        # final_bn width = C5 channels
        nf = np.asarray(
            params_enc["final_bn"]["scale"]).shape[0]
        bn("features.norm5", nf)
        return state

    def test_values_land(self, d121_vars):
        from segmentation_training_pipeline_tpu.models.pretrained import (
            convert_torch_densenet)

        p = d121_vars["params"]["encoder"]
        s = d121_vars["batch_stats"]["encoder"]
        state = self._synthetic_torch_densenet(p)
        new_p, new_s = convert_torch_densenet(state, p, s)
        want = np.transpose(state["features.conv0.weight"], (2, 3, 1, 0))
        np.testing.assert_array_equal(new_p["stem_conv"]["kernel"], want)
        np.testing.assert_array_equal(
            new_s["block2_layer3"]["bn1"]["mean"],
            state["features.denseblock2.denselayer3.norm1.running_mean"])
        np.testing.assert_array_equal(
            new_s["final_bn"]["var"], state["features.norm5.running_var"])

    def test_depth_mismatch_raises(self, d121_vars):
        from segmentation_training_pipeline_tpu.models.pretrained import (
            convert_torch_densenet)

        p = d121_vars["params"]["encoder"]
        s = d121_vars["batch_stats"]["encoder"]
        state = self._synthetic_torch_densenet(p)
        # an extra layer -> looks like a deeper densenet
        state["features.denseblock4.denselayer17.conv1.weight"] = \
            state["features.denseblock4.denselayer16.conv1.weight"]
        with pytest.raises(PretrainedWeightsError):
            convert_torch_densenet(state, p, s)


    def test_legacy_dotted_keys_accepted(self, d121_vars):
        """The canonical downloadable torchvision .pth files use legacy
        dotted names (denselayer1.norm.1.weight) — both spellings load."""
        from segmentation_training_pipeline_tpu.models.pretrained import (
            convert_torch_densenet)
        import re as _re

        p = d121_vars["params"]["encoder"]
        s = d121_vars["batch_stats"]["encoder"]
        state = self._synthetic_torch_densenet(p)
        legacy = {}
        for k, v in state.items():
            m = _re.match(r"^(.*denselayer\d+\.(?:norm|conv))([12])\.(.*)$", k)
            legacy[f"{m.group(1)}.{m.group(2)}.{m.group(3)}" if m else k] = v
        assert any(".norm.1." in k for k in legacy)  # really legacy now
        new_p, new_s = convert_torch_densenet(legacy, p, s)
        np.testing.assert_array_equal(
            new_s["block2_layer3"]["bn1"]["mean"],
            state["features.denseblock2.denselayer3.norm1.running_mean"])
