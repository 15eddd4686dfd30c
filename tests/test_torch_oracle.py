"""Golden-logit converter tests: torch reference forward == Flax forward.

VERDICT r2 item 2/3: shape-correct round-trips can't catch transposition,
stride-placement, or BN-eps bugs — these tests run a canonical torch model
(tests/torch_oracles.py) and the Flax encoder on the SAME weights and input
and demand near-bitwise agreement on all five feature taps.

65x65 input → every stride-2 op sees an odd extent, where XLA SAME padding
is exactly torch's symmetric padding (see torch_oracles docstring).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from segmentation_training_pipeline_tpu.models.encoders import (  # noqa: E402
    build_encoder,
)
from segmentation_training_pipeline_tpu.models.pretrained import (  # noqa: E402
    PretrainedWeightsError,
    convert_torch_inceptionresnetv2,
    convert_torch_inceptionv3,
    convert_torch_resnet,
    convert_torch_xception,
)

from torch_oracles import (  # noqa: E402
    TorchInceptionResNetV2,
    TorchInceptionV3,
    TorchResNet,
    TorchXception,
    randomize_,
)

# backbone name → oracle constructor kwargs
_CASES = {
    "resnet18": dict(stage_sizes=(2, 2, 2, 2)),
    "resnet50": dict(stage_sizes=(3, 4, 6, 3), bottleneck=True),
    "seresnet50": dict(stage_sizes=(3, 4, 6, 3), bottleneck=True, se=True,
                       stride_on_conv1=True),
    "resnext50": dict(stage_sizes=(3, 4, 6, 3), bottleneck=True,
                      groups=32, width_factor=2),
    "seresnext50": dict(stage_sizes=(3, 4, 6, 3), bottleneck=True, se=True,
                        groups=32, width_factor=2),
}


def _state_np(model):
    return {k: v.numpy() for k, v in model.state_dict().items()}


def _flax_taps(backbone, state, x_nhwc):
    enc = build_encoder(backbone, dtype=jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), x_nhwc, train=False)
    new_p, new_s = convert_torch_resnet(
        state, variables["params"], variables["batch_stats"])
    return enc.apply({"params": new_p, "batch_stats": new_s},
                     x_nhwc, train=False)


@pytest.mark.parametrize("backbone", sorted(_CASES))
def test_resnet_family_matches_torch(backbone):
    oracle = TorchResNet(**_CASES[backbone]).eval()
    randomize_(oracle, seed=7)

    rng = np.random.RandomState(1)
    x = rng.rand(2, 65, 65, 3).astype(np.float32)
    with torch.no_grad():
        want = [t.numpy() for t in
                oracle(torch.from_numpy(x.transpose(0, 3, 1, 2)))]

    state = _state_np(oracle)
    if backbone == "seresnet50":
        # Cadene senet state dicts keep the stem under layer0.*
        state = {(f"layer0.{k}" if k.startswith(("conv1.", "bn1."))
                  else k): v for k, v in state.items()}
    got = _flax_taps(backbone, state, x)

    assert len(got) == len(want) == 5
    for i, (g, w) in enumerate(zip(got, want)):
        g = np.transpose(np.asarray(g), (0, 3, 1, 2))
        assert g.shape == w.shape, f"tap C{i+1}: {g.shape} vs {w.shape}"
        np.testing.assert_allclose(
            g, w, rtol=1e-3, atol=2e-3,
            err_msg=f"{backbone} tap C{i+1} diverged from the torch oracle")


# (backbone, oracle ctor, converter) for the non-resnet families
_FAMILY_CASES = {
    "inceptionv3": (TorchInceptionV3, convert_torch_inceptionv3),
    "inceptionresnetv2": (TorchInceptionResNetV2,
                          convert_torch_inceptionresnetv2),
    "xception": (TorchXception, convert_torch_xception),
}


@pytest.mark.parametrize("backbone", sorted(_FAMILY_CASES))
def test_inception_xception_match_torch(backbone):
    ctor, convert = _FAMILY_CASES[backbone]
    oracle = ctor().eval()
    randomize_(oracle, seed=11)

    rng = np.random.RandomState(2)
    x = rng.rand(1, 65, 65, 3).astype(np.float32)
    with torch.no_grad():
        want = [t.numpy() for t in
                oracle(torch.from_numpy(x.transpose(0, 3, 1, 2)))]

    enc = build_encoder(backbone, dtype=jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    new_p, new_s = convert(_state_np(oracle), variables["params"],
                           variables["batch_stats"])
    got = enc.apply({"params": new_p, "batch_stats": new_s},
                    jnp.asarray(x), train=False)

    assert len(got) == len(want) == 5
    for i, (g, w) in enumerate(zip(got, want)):
        g = np.transpose(np.asarray(g), (0, 3, 1, 2))
        assert g.shape == w.shape, f"tap C{i+1}: {g.shape} vs {w.shape}"
        np.testing.assert_allclose(
            g, w, rtol=1e-3, atol=5e-3,
            err_msg=f"{backbone} tap C{i+1} diverged from the torch oracle")


def test_mobilenetv1_matches_torch():
    """timm-style mobilenet v1 state dict → MobileNetV1Encoder: all five
    taps agree (stride placement 2/4/6/12 + dw transpose + ReLU6)."""
    from segmentation_training_pipeline_tpu.models.pretrained import (
        convert_torch_mobilenetv1,
    )

    from torch_oracles import TorchMobileNetV1

    oracle = TorchMobileNetV1().eval()
    randomize_(oracle, seed=11)
    rng = np.random.RandomState(2)
    x = rng.rand(2, 65, 65, 3).astype(np.float32)
    with torch.no_grad():
        want = [t.numpy() for t in
                oracle(torch.from_numpy(x.transpose(0, 3, 1, 2)))]

    enc = build_encoder("mobilenet", dtype=jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    new_p, new_s = convert_torch_mobilenetv1(
        _state_np(oracle), variables["params"], variables["batch_stats"])
    got = enc.apply({"params": new_p, "batch_stats": new_s},
                    jnp.asarray(x), train=False)

    assert len(got) == len(want) == 5
    for i, (g, w) in enumerate(zip(got, want)):
        g = np.transpose(np.asarray(g), (0, 3, 1, 2))
        assert g.shape == w.shape, f"tap C{i+1}: {g.shape} vs {w.shape}"
        np.testing.assert_allclose(
            g, w, rtol=1e-3, atol=2e-3,
            err_msg=f"mobilenet v1 tap C{i+1} diverged from the oracle")


def test_plain_weights_into_se_encoder_raises():
    oracle = TorchResNet(stage_sizes=(2, 2, 2, 2)).eval()
    with pytest.raises(PretrainedWeightsError, match="SE"):
        _flax_taps("seresnet18",
                   _state_np(oracle),
                   np.zeros((1, 65, 65, 3), np.float32))


def test_se_weights_into_plain_encoder_raises():
    oracle = TorchResNet(stage_sizes=(2, 2, 2, 2), se=True).eval()
    with pytest.raises(PretrainedWeightsError, match="SE"):
        _flax_taps("resnet18",
                   _state_np(oracle),
                   np.zeros((1, 65, 65, 3), np.float32))


def test_senet154_matches_torch():
    """senet154 golden: deep stem, 2p/4p SEBottleneck widths, cardinality
    64, kernel-3 downsamples — all through convert_torch_resnet's Cadene
    path.  Shrunk stages (1,1,1,1) keep the CPU cost low; widths and all
    block wiring stay the real ones."""
    from torch_oracles import TorchSENet154

    oracle = TorchSENet154(stage_sizes=(1, 1, 1, 1)).eval()
    randomize_(oracle, seed=17)

    rng = np.random.RandomState(3)
    x = rng.rand(1, 65, 65, 3).astype(np.float32)
    with torch.no_grad():
        want = [t.numpy() for t in
                oracle(torch.from_numpy(x.transpose(0, 3, 1, 2)))]

    enc = build_encoder("senet154", stage_sizes=(1, 1, 1, 1),
                        dtype=jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    new_p, new_s = convert_torch_resnet(
        {k: v.numpy() for k, v in oracle.state_dict().items()},
        variables["params"], variables["batch_stats"])
    got = enc.apply({"params": new_p, "batch_stats": new_s},
                    jnp.asarray(x), train=False)

    assert len(got) == len(want) == 5
    for i, (g, w) in enumerate(zip(got, want)):
        g = np.transpose(np.asarray(g), (0, 3, 1, 2))
        assert g.shape == w.shape, f"tap C{i+1}: {g.shape} vs {w.shape}"
        np.testing.assert_allclose(
            g, w, rtol=1e-3, atol=5e-3,
            err_msg=f"senet154 tap C{i+1} diverged from the torch oracle")
