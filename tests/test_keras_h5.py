"""Keras .h5 encoder ingestion (VERDICT r2 item 3): golden-logit tests.

A reference-era ``.h5`` dropped into STP_PRETRAINED_DIR must load.  The
oracles (tests/torch_oracles.py) reimplement the Keras graphs in torch;
their weights are exported into REAL Keras-HDF5 files (layer_names /
weight_names attrs, HWIO kernels) and ingested through the public
``load_encoder_weights`` path, then all five feature taps must agree.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
h5py = pytest.importorskip("h5py")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from segmentation_training_pipeline_tpu.models.encoders import (  # noqa: E402
    build_encoder,
)
from segmentation_training_pipeline_tpu.models.encoders.resnet import (  # noqa: E402
    PreactResNetEncoder,
)
from segmentation_training_pipeline_tpu.models.keras_h5 import (  # noqa: E402
    load_h5_into,
    read_h5_weights,
)
from segmentation_training_pipeline_tpu.models.pretrained import (  # noqa: E402
    PretrainedWeightsError,
)

from torch_oracles import (  # noqa: E402
    TorchKerasVGG,
    TorchPreactResNet,
    randomize_,
)


def write_keras_h5(path, layers):
    """layers: [(layer_name, [(weight_name, array), ...]), ...] — emits the
    exact attr layout Keras writes."""
    with h5py.File(path, "w") as f:
        f.attrs["layer_names"] = np.array(
            [ln.encode() for ln, _ in layers])
        for lname, ws in layers:
            g = f.create_group(lname)
            g.attrs["weight_names"] = np.array(
                [wn.encode() for wn, _ in ws])
            for wn, arr in ws:
                g.create_dataset(wn, data=np.asarray(arr, np.float32))


def _t(w):  # torch OIHW conv kernel → keras HWIO
    return np.transpose(w.detach().numpy(), (2, 3, 1, 0))


def _bn_ws(mod, name, scale=True):
    ws = []
    if scale:
        ws.append((f"{name}/gamma:0", mod.weight.detach().numpy()))
    ws += [(f"{name}/beta:0", mod.bias.detach().numpy()),
           (f"{name}/moving_mean:0", mod.running_mean.numpy()),
           (f"{name}/moving_variance:0", mod.running_var.numpy())]
    return ws


def _bn_layer(name, mod):
    return (name, _bn_ws(mod, name))


def _export_preact_h5(oracle, path):
    layers = []
    for name, mod in oracle.named_children():
        if isinstance(mod, torch.nn.Conv2d):
            layers.append((name, [(f"{name}/kernel:0", _t(mod.weight))]))
        elif isinstance(mod, torch.nn.BatchNorm2d):
            layers.append((name, _bn_ws(mod, name, scale=(name != "bn_data"))))
    # the zoo's ChannelSE convs are UNNAMED in the real Keras graphs —
    # Keras auto-names them conv2d, conv2d_1, … in creation order
    for i, mod in enumerate(getattr(oracle, "se_convs", [])):
        name = "conv2d" if i == 0 else f"conv2d_{i}"
        layers.append((name, [
            (f"{name}/kernel:0", _t(mod.weight)),
            (f"{name}/bias:0", mod.bias.detach().numpy()),
        ]))
    write_keras_h5(path, layers)


def test_preact_resnet34_matches_keras_h5_oracle(tmp_path):
    oracle = TorchPreactResNet(stage_sizes=(3, 4, 6, 3)).eval()
    randomize_(oracle, seed=13)
    with torch.no_grad():  # bn_data is scale-free in the Keras graph
        oracle.bn_data.weight.fill_(1.0)

    rng = np.random.RandomState(4)
    x = rng.rand(1, 65, 65, 3).astype(np.float32)
    with torch.no_grad():
        want = [t.numpy() for t in
                oracle(torch.from_numpy(x.transpose(0, 3, 1, 2)))]

    path = str(tmp_path / "resnet34.h5")
    _export_preact_h5(oracle, path)

    enc = PreactResNetEncoder(stage_sizes=(3, 4, 6, 3), dtype=jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    new_p, new_s = load_h5_into(path, "resnet34", variables["params"],
                                variables["batch_stats"])
    got = enc.apply({"params": new_p, "batch_stats": new_s},
                    jnp.asarray(x), train=False)

    assert len(got) == len(want) == 5
    for i, (g, w) in enumerate(zip(got, want)):
        g = np.transpose(np.asarray(g), (0, 3, 1, 2))
        assert g.shape == w.shape, f"tap C{i+1}: {g.shape} vs {w.shape}"
        np.testing.assert_allclose(
            g, w, rtol=1e-3, atol=2e-3,
            err_msg=f"preact tap C{i+1} diverged from the Keras-h5 oracle")


@pytest.mark.parametrize("variant,stage_sizes,kw", [
    ("resnet50", (3, 4, 6, 3), dict(bottleneck=True)),
    ("seresnet34", (3, 4, 6, 3), dict(se=True)),
])
def test_preact_variants_match_keras_h5_oracle(tmp_path, variant,
                                               stage_sizes, kw):
    """Bottleneck (resnet50/101/152) and ChannelSE (seresnet18/34) preact
    h5 files ingest through the same stage/unit-named converter; the SE
    convs ride the auto-named conv2d_N assignment."""
    oracle = TorchPreactResNet(stage_sizes=stage_sizes, **kw).eval()
    randomize_(oracle, seed=31)
    with torch.no_grad():
        oracle.bn_data.weight.fill_(1.0)

    rng = np.random.RandomState(6)
    x = rng.rand(1, 65, 65, 3).astype(np.float32)
    with torch.no_grad():
        want = [t.numpy() for t in
                oracle(torch.from_numpy(x.transpose(0, 3, 1, 2)))]

    path = str(tmp_path / f"{variant}.h5")
    _export_preact_h5(oracle, path)

    enc = PreactResNetEncoder(stage_sizes=stage_sizes, dtype=jnp.float32,
                              **kw)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    new_p, new_s = load_h5_into(path, variant, variables["params"],
                                variables["batch_stats"])
    got = enc.apply({"params": new_p, "batch_stats": new_s},
                    jnp.asarray(x), train=False)

    assert len(got) == len(want) == 5
    for i, (g, w) in enumerate(zip(got, want)):
        g = np.transpose(np.asarray(g), (0, 3, 1, 2))
        assert g.shape == w.shape, f"tap C{i+1}: {g.shape} vs {w.shape}"
        np.testing.assert_allclose(
            g, w, rtol=1e-3, atol=2e-3,
            err_msg=f"{variant} preact tap C{i+1} diverged from the oracle")


def test_preact_basic_vs_bottleneck_mismatch_raises(tmp_path):
    oracle = TorchPreactResNet(stage_sizes=(3, 4, 6, 3)).eval()  # basic 34
    path = str(tmp_path / "resnet34.h5")
    _export_preact_h5(oracle, path)
    enc = PreactResNetEncoder(stage_sizes=(3, 4, 6, 3), bottleneck=True,
                              dtype=jnp.float32)
    x = np.zeros((1, 65, 65, 3), np.float32)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    with pytest.raises(PretrainedWeightsError):
        load_h5_into(path, "resnet50", variables["params"],
                     variables["batch_stats"])


def test_preact_se_mismatch_raises(tmp_path):
    """Plain-resnet h5 into an SE encoder (and vice versa) must error, not
    leave SE weights at random init / silently drop them."""
    oracle = TorchPreactResNet(stage_sizes=(2, 2, 2, 2), se=True).eval()
    path = str(tmp_path / "seresnet18.h5")
    _export_preact_h5(oracle, path)
    enc = PreactResNetEncoder(stage_sizes=(2, 2, 2, 2), dtype=jnp.float32)
    x = np.zeros((1, 65, 65, 3), np.float32)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    with pytest.raises(PretrainedWeightsError):
        load_h5_into(path, "resnet18", variables["params"],
                     variables["batch_stats"])


def test_preact_depth_mismatch_raises(tmp_path):
    oracle = TorchPreactResNet(stage_sizes=(2, 2, 2, 2)).eval()  # resnet18
    path = str(tmp_path / "resnet18.h5")
    _export_preact_h5(oracle, path)
    enc = PreactResNetEncoder(stage_sizes=(3, 4, 6, 3), dtype=jnp.float32)
    x = np.zeros((1, 65, 65, 3), np.float32)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    with pytest.raises(PretrainedWeightsError):
        load_h5_into(path, "resnet34", variables["params"],
                     variables["batch_stats"])


def test_vgg16_h5_bias_fold_exact(tmp_path):
    oracle = TorchKerasVGG().eval()
    randomize_(oracle, seed=17)

    layers = []
    for name, mod in oracle.named_children():
        layers.append((name, [(f"{name}/kernel:0", _t(mod.weight)),
                              (f"{name}/bias:0",
                               mod.bias.detach().numpy())]))
    path = str(tmp_path / "vgg16.h5")
    write_keras_h5(path, layers)

    rng = np.random.RandomState(5)
    x = rng.rand(1, 64, 64, 3).astype(np.float32)  # 2x2 pools: any even size
    with torch.no_grad():
        want = [t.numpy() for t in
                oracle(torch.from_numpy(x.transpose(0, 3, 1, 2)))]

    enc = build_encoder("vgg16", dtype=jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    new_p, new_s = load_h5_into(path, "vgg16", variables["params"],
                                variables["batch_stats"])
    got = enc.apply({"params": new_p, "batch_stats": new_s},
                    jnp.asarray(x), train=False)
    for i, (g, w) in enumerate(zip(got, want)):
        g = np.transpose(np.asarray(g), (0, 3, 1, 2))
        # the fold itself is arithmetically exact; the tolerance covers
        # XLA-vs-torch fp32 accumulation order through 13 convs
        np.testing.assert_allclose(
            g, w, rtol=1e-3, atol=1e-2,
            err_msg=f"vgg tap C{i+1}: BN bias-fold diverged")


def test_vgg_depth_mismatch_raises(tmp_path):
    oracle = TorchKerasVGG().eval()  # vgg16 (13 convs)
    layers = [(n, [(f"{n}/kernel:0", _t(m.weight)),
                   (f"{n}/bias:0", m.bias.detach().numpy())])
              for n, m in oracle.named_children()]
    path = str(tmp_path / "vgg16.h5")
    write_keras_h5(path, layers)
    enc = build_encoder("vgg19", dtype=jnp.float32)
    x = np.zeros((1, 32, 32, 3), np.float32)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    with pytest.raises(PretrainedWeightsError, match="depth|missing"):
        load_h5_into(path, "vgg19", variables["params"],
                     variables["batch_stats"])


def test_mobilenetv2_h5_roundtrip(tmp_path):
    """Build the Keras h5 FROM the encoder's own (randomized) tree with
    keras.applications naming, ingest it, and require exact equality —
    catches name-mapping and depthwise-transpose bugs."""
    enc = build_encoder("mobilenetv2", dtype=jnp.float32)
    x = np.zeros((1, 64, 64, 3), np.float32)
    variables = enc.init(jax.random.PRNGKey(3), jnp.asarray(x), train=False)
    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])
    r = np.random.RandomState(0)
    params = jax.tree.map(lambda a: r.randn(*a.shape).astype(np.float32),
                          params)
    stats = jax.tree.map(
        lambda a: np.abs(r.randn(*a.shape)).astype(np.float32) + 0.1, stats)

    def bn_ws(name, p, s):
        return (name, [(f"{name}/gamma:0", p["scale"]),
                       (f"{name}/beta:0", p["bias"]),
                       (f"{name}/moving_mean:0", s["mean"]),
                       (f"{name}/moving_variance:0", s["var"])])

    layers = [("Conv1", [("Conv1/kernel:0", params["stem_conv"]["kernel"])]),
              bn_ws("bn_Conv1", params["stem_bn"], stats["stem_bn"])]
    bi = 0
    while f"block{bi}" in params:
        bp, bs = params[f"block{bi}"], stats[f"block{bi}"]
        prefix = "expanded_conv" if bi == 0 else f"block_{bi}"
        if "expand" in bp:
            layers.append((f"{prefix}_expand",
                           [(f"{prefix}_expand/kernel:0",
                             bp["expand"]["kernel"])]))
            layers.append(bn_ws(f"{prefix}_expand_BN", bp["expand_bn"],
                                bs["expand_bn"]))
        layers.append((f"{prefix}_depthwise",
                       [(f"{prefix}_depthwise/depthwise_kernel:0",
                         np.transpose(bp["depthwise"]["kernel"],
                                      (0, 1, 3, 2)))]))
        layers.append(bn_ws(f"{prefix}_depthwise_BN", bp["dw_bn"],
                            bs["dw_bn"]))
        layers.append((f"{prefix}_project",
                       [(f"{prefix}_project/kernel:0",
                         bp["project"]["kernel"])]))
        layers.append(bn_ws(f"{prefix}_project_BN", bp["project_bn"],
                            bs["project_bn"]))
        bi += 1
    layers.append(("Conv_1", [("Conv_1/kernel:0",
                               params["head_conv"]["kernel"])]))
    layers.append(bn_ws("Conv_1_bn", params["head_bn"], stats["head_bn"]))

    path = str(tmp_path / "mobilenetv2.h5")
    write_keras_h5(path, layers)
    new_p, new_s = load_h5_into(path, "mobilenetv2", variables["params"],
                                variables["batch_stats"])
    for got, want in zip(jax.tree.leaves(new_p), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(got), want)
    for got, want in zip(jax.tree.leaves(new_s), jax.tree.leaves(stats)):
        np.testing.assert_array_equal(np.asarray(got), want)


def test_mobilenetv1_h5_golden(tmp_path):
    """keras.applications MobileNet h5 → MobileNetV1Encoder: export the
    torch oracle's weights under the keras names, ingest, compare taps."""
    from torch_oracles import TorchMobileNetV1

    oracle = TorchMobileNetV1().eval()
    randomize_(oracle, seed=17)
    rng = np.random.RandomState(8)
    x = rng.rand(1, 65, 65, 3).astype(np.float32)
    with torch.no_grad():
        want = [t.numpy() for t in
                oracle(torch.from_numpy(x.transpose(0, 3, 1, 2)))]

    layers = [("conv1", [("conv1/kernel:0", _t(oracle.conv_stem.weight))]),
              _bn_layer("conv1_bn", oracle.bn1)]
    i = 0
    for stage in oracle.blocks:
        for blk in stage:
            i += 1
            dw = blk.conv_dw.weight.detach().numpy()  # (C,1,3,3)
            layers.append((f"conv_dw_{i}", [
                (f"conv_dw_{i}/depthwise_kernel:0",
                 np.transpose(dw, (2, 3, 0, 1)))]))   # → (3,3,C,1)
            layers.append(_bn_layer(f"conv_dw_{i}_bn", blk.bn1))
            layers.append((f"conv_pw_{i}",
                           [(f"conv_pw_{i}/kernel:0", _t(blk.conv_pw.weight))]))
            layers.append(_bn_layer(f"conv_pw_{i}_bn", blk.bn2))
    path = str(tmp_path / "mobilenet.h5")
    write_keras_h5(path, layers)

    enc = build_encoder("mobilenet", dtype=jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    new_p, new_s = load_h5_into(path, "mobilenet", variables["params"],
                                variables["batch_stats"])
    got = enc.apply({"params": new_p, "batch_stats": new_s},
                    jnp.asarray(x), train=False)
    assert len(got) == len(want) == 5
    for i, (g, w) in enumerate(zip(got, want)):
        g = np.transpose(np.asarray(g), (0, 3, 1, 2))
        assert g.shape == w.shape, f"tap C{i+1}: {g.shape} vs {w.shape}"
        np.testing.assert_allclose(
            g, w, rtol=1e-3, atol=2e-3,
            err_msg=f"mobilenet v1 h5 tap C{i+1} diverged")


def _sep_ws(name, mod):
    """torch SeparableConv2d → keras SeparableConv2D weight list."""
    dw = mod.conv1.weight.detach().numpy()          # (C,1,3,3)
    pw = mod.pointwise.weight.detach().numpy()      # (F,C,1,1)
    return (name, [
        (f"{name}/depthwise_kernel:0", np.transpose(dw, (2, 3, 0, 1))),
        (f"{name}/pointwise_kernel:0", np.transpose(pw, (2, 3, 1, 0))),
    ])


def test_xception_h5_golden(tmp_path):
    """keras.applications Xception h5 (named sepconvs + auto-named
    shortcut convs) → XceptionEncoder: taps match the torch oracle."""
    from torch_oracles import TorchXception

    oracle = TorchXception().eval()
    randomize_(oracle, seed=29)
    rng = np.random.RandomState(9)
    x = rng.rand(1, 65, 65, 3).astype(np.float32)
    with torch.no_grad():
        want = [t.numpy() for t in
                oracle(torch.from_numpy(x.transpose(0, 3, 1, 2)))]

    layers = [
        ("block1_conv1", [("block1_conv1/kernel:0", _t(oracle.conv1.weight))]),
        _bn_layer("block1_conv1_bn", oracle.bn1),
        ("block1_conv2", [("block1_conv2/kernel:0", _t(oracle.conv2.weight))]),
        _bn_layer("block1_conv2_bn", oracle.bn2),
    ]
    n_auto = 0
    for i in range(1, 13):                      # torch block1..12
        blk = getattr(oracle, f"block{i}")
        kb = i + 1                              # keras block number
        if hasattr(blk, "skip"):                # shortcut = unnamed layers
            cname = "conv2d" if n_auto == 0 else f"conv2d_{n_auto}"
            bname = ("batch_normalization" if n_auto == 0
                     else f"batch_normalization_{n_auto}")
            layers.append((cname, [(f"{cname}/kernel:0",
                                    _t(blk.skip.weight))]))
            layers.append(_bn_layer(bname, blk.skipbn))
            n_auto += 1
        si = 0
        for mod in blk.rep:
            if isinstance(mod, torch.nn.BatchNorm2d):
                layers.append(_bn_layer(f"block{kb}_sepconv{si}_bn", mod))
            elif mod.__class__.__name__ == "SeparableConv2d":
                si += 1
                layers.append(_sep_ws(f"block{kb}_sepconv{si}", mod))
    layers.append(_sep_ws("block14_sepconv1", oracle.conv3))
    layers.append(_bn_layer("block14_sepconv1_bn", oracle.bn3))
    layers.append(_sep_ws("block14_sepconv2", oracle.conv4))
    layers.append(_bn_layer("block14_sepconv2_bn", oracle.bn4))

    path = str(tmp_path / "xception.h5")
    write_keras_h5(path, layers)
    enc = build_encoder("xception", dtype=jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    new_p, new_s = load_h5_into(path, "xception", variables["params"],
                                variables["batch_stats"])
    got = enc.apply({"params": new_p, "batch_stats": new_s},
                    jnp.asarray(x), train=False)
    assert len(got) == len(want) == 5
    for i, (g, w) in enumerate(zip(got, want)):
        g = np.transpose(np.asarray(g), (0, 3, 1, 2))
        assert g.shape == w.shape, f"tap C{i+1}: {g.shape} vs {w.shape}"
        np.testing.assert_allclose(
            g, w, rtol=1e-3, atol=2e-3,
            err_msg=f"xception h5 tap C{i+1} diverged")


def _randomized_tree(enc, x, seed):
    variables = enc.init(jax.random.PRNGKey(3), jnp.asarray(x), train=False)
    r = np.random.RandomState(seed)
    params = jax.tree.map(
        lambda a: r.randn(*a.shape).astype(np.float32),
        jax.tree.map(np.asarray, variables["params"]))
    stats = jax.tree.map(
        lambda a: np.abs(r.randn(*a.shape)).astype(np.float32) + 0.1,
        jax.tree.map(np.asarray, variables["batch_stats"]))
    return variables, params, stats


def _bn_tree_ws(name, p, s):
    return (name, [(f"{name}/gamma:0", p["scale"]),
                   (f"{name}/beta:0", p["bias"]),
                   (f"{name}/moving_mean:0", s["mean"]),
                   (f"{name}/moving_variance:0", s["var"])])


def _conv_ws(name, sub, depthwise=False, bias=False):
    k = sub["kernel"]
    key = "depthwise_kernel" if depthwise else "kernel"
    if depthwise:
        k = np.transpose(k, (0, 1, 3, 2))
    ws = [(f"{name}/{key}:0", k)]
    if bias:
        ws.append((f"{name}/bias:0", sub["bias"]))
    return (name, ws)


def test_efficientnetb0_h5_roundtrip(tmp_path):
    """qubvel/keras efficientnet h5 naming → EfficientNetEncoder: build
    the h5 FROM the encoder's randomized tree, ingest, require exact
    equality (catches name-mapping/letter-index/dw-transpose bugs)."""
    import re
    import string

    enc = build_encoder("efficientnetb0", dtype=jnp.float32)
    x = np.zeros((1, 64, 64, 3), np.float32)
    variables, params, stats = _randomized_tree(enc, x, seed=5)

    layers = [_conv_ws("stem_conv", params["stem_conv"]),
              _bn_tree_ws("stem_bn", params["stem_bn"], stats["stem_bn"])]
    for name in sorted(params):
        m = re.fullmatch(r"stage(\d+)_block(\d+)", name)
        if not m:
            continue
        prefix = (f"block{int(m.group(1)) + 1}"
                  f"{string.ascii_lowercase[int(m.group(2))]}")
        bp, bs = params[name], stats[name]
        if "expand" in bp:
            layers.append(_conv_ws(f"{prefix}_expand_conv", bp["expand"]))
            layers.append(_bn_tree_ws(f"{prefix}_expand_bn",
                                      bp["expand_bn"], bs["expand_bn"]))
        layers.append(_conv_ws(f"{prefix}_dwconv", bp["depthwise"],
                               depthwise=True))
        layers.append(_bn_tree_ws(f"{prefix}_bn", bp["dw_bn"], bs["dw_bn"]))
        layers.append(_conv_ws(f"{prefix}_se_reduce", bp["se"]["reduce"],
                               bias=True))
        layers.append(_conv_ws(f"{prefix}_se_expand", bp["se"]["expand"],
                               bias=True))
        layers.append(_conv_ws(f"{prefix}_project_conv", bp["project"]))
        layers.append(_bn_tree_ws(f"{prefix}_project_bn", bp["project_bn"],
                                  bs["project_bn"]))
    layers.append(_conv_ws("top_conv", params["head_conv"]))
    layers.append(_bn_tree_ws("top_bn", params["head_bn"], stats["head_bn"]))

    path = str(tmp_path / "efficientnetb0.h5")
    write_keras_h5(path, layers)
    new_p, new_s = load_h5_into(path, "efficientnetb0", variables["params"],
                                variables["batch_stats"])
    for got, want in zip(jax.tree.leaves(new_p), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(got), want)
    for got, want in zip(jax.tree.leaves(new_s), jax.tree.leaves(stats)):
        np.testing.assert_array_equal(np.asarray(got), want)


def test_densenet121_h5_roundtrip(tmp_path):
    """keras.applications densenet h5 naming (slashed conv1/conv stem,
    conv{b}_block{l}_* dense layers, pool{b}_* transitions) →
    DenseNetEncoder, exact."""
    import re

    enc = build_encoder("densenet121", dtype=jnp.float32)
    x = np.zeros((1, 64, 64, 3), np.float32)
    variables, params, stats = _randomized_tree(enc, x, seed=6)

    layers = [_conv_ws("conv1/conv", params["stem_conv"]),
              _bn_tree_ws("conv1/bn", params["stem_bn"], stats["stem_bn"])]
    for name in sorted(params):
        m = re.fullmatch(r"block(\d+)_layer(\d+)", name)
        if m:
            b, l = int(m.group(1)) + 1, int(m.group(2))
            bp, bs = params[name], stats[name]
            layers.append(_bn_tree_ws(f"conv{b}_block{l}_0_bn",
                                      bp["bn1"], bs["bn1"]))
            layers.append(_conv_ws(f"conv{b}_block{l}_1_conv", bp["conv1"]))
            layers.append(_bn_tree_ws(f"conv{b}_block{l}_1_bn",
                                      bp["bn2"], bs["bn2"]))
            layers.append(_conv_ws(f"conv{b}_block{l}_2_conv", bp["conv2"]))
            continue
        m = re.fullmatch(r"trans(\d+)_conv", name)
        if m:
            b = int(m.group(1)) + 1
            layers.append(_bn_tree_ws(f"pool{b}_bn",
                                      params[f"trans{m.group(1)}_bn"],
                                      stats[f"trans{m.group(1)}_bn"]))
            layers.append(_conv_ws(f"pool{b}_conv", params[name]))
    layers.append(_bn_tree_ws("bn", params["final_bn"], stats["final_bn"]))

    path = str(tmp_path / "densenet121.h5")
    write_keras_h5(path, layers)
    new_p, new_s = load_h5_into(path, "densenet121", variables["params"],
                                variables["batch_stats"])
    for got, want in zip(jax.tree.leaves(new_p), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(got), want)
    for got, want in zip(jax.tree.leaves(new_s), jax.tree.leaves(stats)):
        np.testing.assert_array_equal(np.asarray(got), want)


def _auto_pair_layers(state, seq, start_layers=None, start_idx=1):
    """torch state dict + torch-prefix sequence → keras unnamed conv/BN
    layer list (conv2d_N / batch_normalization_N, scale-free BN)."""
    layers = list(start_layers or [])
    for i, tprefix in enumerate(seq, start=start_idx):
        cname, bname = f"conv2d_{i}", f"batch_normalization_{i}"
        layers.append((cname, [
            (f"{cname}/kernel:0",
             np.transpose(state[f"{tprefix}.conv.weight"], (2, 3, 1, 0)))]))
        layers.append((bname, [
            (f"{bname}/beta:0", state[f"{tprefix}.bn.bias"]),
            (f"{bname}/moving_mean:0", state[f"{tprefix}.bn.running_mean"]),
            (f"{bname}/moving_variance:0",
             state[f"{tprefix}.bn.running_var"])]))
    return layers


def _scale_free_bns_(oracle):
    with torch.no_grad():
        for mod in oracle.modules():
            if isinstance(mod, torch.nn.BatchNorm2d):
                mod.weight.fill_(1.0)


def _taps_close(got, want, what):
    assert len(got) == len(want) == 5
    for i, (g, w) in enumerate(zip(got, want)):
        g = np.transpose(np.asarray(g), (0, 3, 1, 2))
        assert g.shape == w.shape, f"tap C{i+1}: {g.shape} vs {w.shape}"
        np.testing.assert_allclose(
            g, w, rtol=1e-3, atol=5e-3,
            err_msg=f"{what} tap C{i+1} diverged")


def test_inceptionv3_h5_golden(tmp_path):
    """keras.applications InceptionV3 h5 (94 unnamed conv/BN pairs in
    creation order, scale-free BNs) → InceptionV3Encoder."""
    from torch_oracles import TorchInceptionV3

    from segmentation_training_pipeline_tpu.models.keras_h5 import (
        _inc3_torch_sequence,
    )

    oracle = TorchInceptionV3().eval()
    randomize_(oracle, seed=37)
    _scale_free_bns_(oracle)
    rng = np.random.RandomState(10)
    x = rng.rand(1, 65, 65, 3).astype(np.float32)
    with torch.no_grad():
        want = [t.numpy() for t in
                oracle(torch.from_numpy(x.transpose(0, 3, 1, 2)))]

    state = {k: v.numpy() for k, v in oracle.state_dict().items()}
    layers = _auto_pair_layers(state, _inc3_torch_sequence())
    path = str(tmp_path / "inceptionv3.h5")
    write_keras_h5(path, layers)

    enc = build_encoder("inceptionv3", dtype=jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    new_p, new_s = load_h5_into(path, "inceptionv3", variables["params"],
                                variables["batch_stats"])
    got = enc.apply({"params": new_p, "batch_stats": new_s},
                    jnp.asarray(x), train=False)
    _taps_close(got, want, "inceptionv3 h5")


def test_inceptionresnetv2_h5_golden(tmp_path):
    """keras.applications InceptionResNetV2 h5 (unnamed conv/BN pairs +
    NAMED biased block*_conv scale convs + conv_7b) →
    InceptionResNetV2Encoder."""
    from torch_oracles import TorchInceptionResNetV2

    from segmentation_training_pipeline_tpu.models.keras_h5 import (
        _irv2_torch_sequence,
    )

    oracle = TorchInceptionResNetV2().eval()
    randomize_(oracle, seed=41)
    _scale_free_bns_(oracle)
    rng = np.random.RandomState(12)
    x = rng.rand(1, 65, 65, 3).astype(np.float32)
    with torch.no_grad():
        want = [t.numpy() for t in
                oracle(torch.from_numpy(x.transpose(0, 3, 1, 2)))]

    state = {k: v.numpy() for k, v in oracle.state_dict().items()}
    layers = _auto_pair_layers(state, _irv2_torch_sequence())

    def named_conv(lname, tprefix):
        layers.append((lname, [
            (f"{lname}/kernel:0",
             np.transpose(state[f"{tprefix}.conv2d.weight"], (2, 3, 1, 0))),
            (f"{lname}/bias:0", state[f"{tprefix}.conv2d.bias"])]))

    for i in range(10):
        named_conv(f"block35_{i + 1}_conv", f"repeat.{i}")
    for i in range(20):
        named_conv(f"block17_{i + 1}_conv", f"repeat_1.{i}")
    for i in range(9):
        named_conv(f"block8_{i + 1}_conv", f"repeat_2.{i}")
    named_conv("block8_10_conv", "block8")
    layers.append(("conv_7b", [
        ("conv_7b/kernel:0",
         np.transpose(state["conv2d_7b.conv.weight"], (2, 3, 1, 0)))]))
    layers.append(("conv_7b_bn", [
        ("conv_7b_bn/beta:0", state["conv2d_7b.bn.bias"]),
        ("conv_7b_bn/moving_mean:0", state["conv2d_7b.bn.running_mean"]),
        ("conv_7b_bn/moving_variance:0",
         state["conv2d_7b.bn.running_var"])]))
    path = str(tmp_path / "inceptionresnetv2.h5")
    write_keras_h5(path, layers)

    enc = build_encoder("inceptionresnetv2", dtype=jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    new_p, new_s = load_h5_into(path, "inceptionresnetv2",
                                variables["params"],
                                variables["batch_stats"])
    got = enc.apply({"params": new_p, "batch_stats": new_s},
                    jnp.asarray(x), train=False)
    _taps_close(got, want, "inceptionresnetv2 h5")


def _export_cadene_h5(state, path):
    """torch Cadene-style state dict → fully auto-named Keras h5 in the
    creation order convert_h5_cadene_senet assumes (branch convs → SE →
    downsample per block)."""
    layers = []
    counters = {"conv2d": 0, "batch_normalization": 0}

    def auto(base):
        n = counters[base]
        counters[base] += 1
        return base if n == 0 else f"{base}_{n}"

    def conv(key, bias_key=None):
        name = auto("conv2d")
        ws = [(f"{name}/kernel:0", np.transpose(state[key], (2, 3, 1, 0)))]
        if bias_key:
            ws.append((f"{name}/bias:0", state[bias_key]))
        layers.append((name, ws))

    def bn(prefix):
        name = auto("batch_normalization")
        layers.append((name, [
            (f"{name}/gamma:0", state[f"{prefix}.weight"]),
            (f"{name}/beta:0", state[f"{prefix}.bias"]),
            (f"{name}/moving_mean:0", state[f"{prefix}.running_mean"]),
            (f"{name}/moving_variance:0", state[f"{prefix}.running_var"])]))

    stem = "layer0." if "layer0.conv1.weight" in state else ""
    i = 1
    while f"{stem}conv{i}.weight" in state:
        conv(f"{stem}conv{i}.weight")
        bn(f"{stem}bn{i}")
        i += 1
    for s in range(1, 5):
        b = 0
        while f"layer{s}.{b}.conv1.weight" in state:
            p = f"layer{s}.{b}"
            ci = 1
            while f"{p}.conv{ci}.weight" in state:
                conv(f"{p}.conv{ci}.weight")
                bn(f"{p}.bn{ci}")
                ci += 1
            if f"{p}.se_module.fc1.weight" in state:
                conv(f"{p}.se_module.fc1.weight", f"{p}.se_module.fc1.bias")
                conv(f"{p}.se_module.fc2.weight", f"{p}.se_module.fc2.bias")
            if f"{p}.downsample.0.weight" in state:
                conv(f"{p}.downsample.0.weight")
                bn(f"{p}.downsample.1")
            b += 1
    write_keras_h5(path, layers)


@pytest.mark.parametrize("backbone,ctor_kw", [
    ("seresnet50", dict(stage_sizes=(3, 4, 6, 3), bottleneck=True, se=True,
                        stride_on_conv1=True)),
    ("resnext50", dict(stage_sizes=(3, 4, 6, 3), bottleneck=True,
                       groups=32, width_factor=2)),
])
def test_cadene_structural_h5_golden(tmp_path, backbone, ctor_kw):
    """classification_models senet/resnext h5 (fully auto-named layers) →
    postact encoders via the creation-order structural converter; taps
    match the Cadene torch oracle."""
    from torch_oracles import TorchResNet

    oracle = TorchResNet(**ctor_kw).eval()
    randomize_(oracle, seed=43)
    rng = np.random.RandomState(14)
    x = rng.rand(1, 65, 65, 3).astype(np.float32)
    with torch.no_grad():
        want = [t.numpy() for t in
                oracle(torch.from_numpy(x.transpose(0, 3, 1, 2)))]
    state = {k: v.numpy() for k, v in oracle.state_dict().items()}
    # SE fc convs in the oracle are conv-parameterized (4-D) already
    path = str(tmp_path / f"{backbone}.h5")
    _export_cadene_h5(state, path)

    enc = build_encoder(backbone, dtype=jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    new_p, new_s = load_h5_into(path, backbone, variables["params"],
                                variables["batch_stats"])
    got = enc.apply({"params": new_p, "batch_stats": new_s},
                    jnp.asarray(x), train=False)
    _taps_close(got, want, f"{backbone} structural h5")


def test_senet154_structural_h5_golden(tmp_path):
    """senet154 (deep 3-conv stem, kernel-3 downsamples) through the same
    structural h5 path; shrunk stages keep CPU cost low."""
    from torch_oracles import TorchSENet154

    from segmentation_training_pipeline_tpu.models.encoders.resnet import (
        SENet154Encoder,
    )

    oracle = TorchSENet154(stage_sizes=(1, 1, 1, 1)).eval()
    randomize_(oracle, seed=47)
    rng = np.random.RandomState(15)
    x = rng.rand(1, 65, 65, 3).astype(np.float32)
    with torch.no_grad():
        want = [t.numpy() for t in
                oracle(torch.from_numpy(x.transpose(0, 3, 1, 2)))]
    state = {k: v.numpy() for k, v in oracle.state_dict().items()}
    path = str(tmp_path / "senet154.h5")
    _export_cadene_h5(state, path)

    enc = SENet154Encoder(stage_sizes=(1, 1, 1, 1), dtype=jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    new_p, new_s = load_h5_into(path, "senet154", variables["params"],
                                variables["batch_stats"])
    got = enc.apply({"params": new_p, "batch_stats": new_s},
                    jnp.asarray(x), train=False)
    _taps_close(got, want, "senet154 structural h5")


def test_cadene_structural_wrong_depth_raises(tmp_path):
    from torch_oracles import TorchResNet

    oracle = TorchResNet(stage_sizes=(2, 2, 2, 2), bottleneck=True,
                         se=True, stride_on_conv1=True).eval()
    state = {k: v.numpy() for k, v in oracle.state_dict().items()}
    path = str(tmp_path / "seresnet18ish.h5")
    _export_cadene_h5(state, path)
    enc = build_encoder("seresnet50", dtype=jnp.float32)
    x = np.zeros((1, 65, 65, 3), np.float32)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    with pytest.raises(PretrainedWeightsError):
        load_h5_into(path, "seresnet50", variables["params"],
                     variables["batch_stats"])


def test_every_backbone_has_a_keras_converter():
    """VERDICT r3 item 2: a reference user's .h5 must resolve a converter
    for EVERY registered backbone — the no-converter branch is
    unreachable."""
    from segmentation_training_pipeline_tpu.models.encoders import (
        known_backbones,
    )
    from segmentation_training_pipeline_tpu.models.keras_h5 import (
        keras_converter_for,
    )

    for name in known_backbones():
        assert callable(keras_converter_for(name)), name


def test_read_h5_rejects_non_keras(tmp_path):
    path = str(tmp_path / "junk.h5")
    with h5py.File(path, "w") as f:
        f.create_dataset("data", data=np.zeros(3))
    with pytest.raises(PretrainedWeightsError, match="layer_names"):
        read_h5_weights(path)


def test_factory_selects_preact_for_h5(tmp_path):
    """encoder_weights → .h5 file ⇒ resnet34 builds the preact variant and
    the full public load path ingests it."""
    import segmentation_training_pipeline_tpu as stp
    from segmentation_training_pipeline_tpu.models.factory import (
        model_from_config,
        template_variables,
    )

    oracle = TorchPreactResNet(stage_sizes=(3, 4, 6, 3)).eval()
    randomize_(oracle, seed=19)
    with torch.no_grad():
        oracle.bn_data.weight.fill_(1.0)
    path = str(tmp_path / "resnet34.h5")
    _export_preact_h5(oracle, path)

    cfg = stp.parse_dict(
        dict(architecture="Unet", backbone="resnet34", shape=[64, 64, 3],
             classes=1, activation="sigmoid", loss="binary_crossentropy",
             encoder_weights=path, dtype="float32",
             stages=[{"epochs": 1}]),
        directory=str(tmp_path))
    model = model_from_config(cfg)
    assert model.encoder_variant == "keras-preact"
    variables = template_variables(model, cfg.shape)
    assert "bn_data" in variables["params"]["encoder"]

    from segmentation_training_pipeline_tpu.models.pretrained import (
        load_encoder_weights,
    )
    out = load_encoder_weights("resnet34", path, variables)
    got = np.asarray(out["params"]["encoder"]["conv0"]["kernel"])
    want = np.transpose(oracle.conv0.weight.detach().numpy(), (2, 3, 1, 0))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_checkpoint_sidecar_pins_encoder_variant(tmp_path):
    """Fit with .h5 encoder weights (preact graph), DELETE the .h5, then
    load + predict must reproduce the fitted model — the sidecar's
    recorded encoder_variant wins over weight-file re-resolution
    (VERDICT r3 item 3)."""
    import os

    import segmentation_training_pipeline_tpu as stp
    from segmentation_training_pipeline_tpu.train.checkpoint import (
        checkpoint_meta,
    )

    oracle = TorchPreactResNet(stage_sizes=(2, 2, 2, 2)).eval()  # resnet18
    randomize_(oracle, seed=23)
    with torch.no_grad():
        oracle.bn_data.weight.fill_(1.0)
    h5_path = str(tmp_path / "resnet18.h5")
    _export_preact_h5(oracle, h5_path)

    def make_cfg():
        return stp.parse_dict(
            dict(architecture="Unet", backbone="resnet18", shape=[64, 64, 3],
                 classes=1, activation="sigmoid", loss="binary_crossentropy",
                 encoder_weights=h5_path, dtype="float32", batch=4,
                 folds_count=2, testSplit=0.25,
                 stages=[{"epochs": 1, "lr": 1e-3}]),
            directory=str(tmp_path))

    r = np.random.RandomState(3)
    from segmentation_training_pipeline_tpu.data.datasets import LambdaDataSet
    xs = [r.randint(0, 255, (64, 64, 3), np.uint8) for _ in range(8)]
    ys = [(r.rand(64, 64) > 0.7).astype(np.uint8) for _ in range(8)]
    ds = LambdaDataSet(xs, ys)

    cfg = make_cfg()
    cfg.fit(ds, foldsToExecute=[0])
    meta = checkpoint_meta(cfg.weights_path(0, 0))
    assert meta["encoder_variant"] == "keras-preact"

    probe = np.stack(xs[:4])
    before = [p.prediction.copy() for p in cfg.predict_on_dataset(
        LambdaDataSet(list(probe), ys[:4]), folds=[0], stage=0)]

    os.remove(h5_path)  # the footgun: weights file gone between fit & load

    cfg2 = make_cfg()  # fresh parse — no cached model
    after = [p.prediction.copy() for p in cfg2.predict_on_dataset(
        LambdaDataSet(list(probe), ys[:4]), folds=[0], stage=0)]
    for b, a in zip(before, after):
        np.testing.assert_allclose(a, b, atol=1e-6)

    # resume with the .h5 gone must also rebuild the same graph (skip path)
    cfg3 = make_cfg()
    res = cfg3.fit(ds, foldsToExecute=[0])
    assert res["fold0.stage0"]["skipped"]


# ---------------------------------------------------------------------------
# bonlime DeepLabV3+ pascal_voc (aligned Xception-65)
# ---------------------------------------------------------------------------

def _export_aligned_h5(named_modules, path):
    """[(bonlime_layer_name, torch module), ...] → Keras h5.  SepConvBN
    modules expand into their four bonlime layers."""
    from torch_oracles import TorchSepConvBN

    layers = []
    for name, mod in named_modules:
        if isinstance(mod, TorchSepConvBN):
            dw = mod.depthwise.weight.detach().numpy().transpose(2, 3, 0, 1)
            layers.append((f"{name}_depthwise",
                           [(f"{name}_depthwise/depthwise_kernel:0", dw)]))
            layers.append((f"{name}_depthwise_BN",
                           _bn_ws(mod.depthwise_BN, f"{name}_depthwise_BN")))
            layers.append((f"{name}_pointwise",
                           [(f"{name}_pointwise/kernel:0",
                             _t(mod.pointwise.weight))]))
            layers.append((f"{name}_pointwise_BN",
                           _bn_ws(mod.pointwise_BN, f"{name}_pointwise_BN")))
        elif isinstance(mod, torch.nn.Conv2d):
            ws = [(f"{name}/kernel:0", _t(mod.weight))]
            if mod.bias is not None:
                ws.append((f"{name}/bias:0", mod.bias.detach().numpy()))
            layers.append((name, ws))
        elif isinstance(mod, torch.nn.BatchNorm2d):
            layers.append((name, _bn_ws(mod, name)))
        else:  # pragma: no cover
            raise TypeError(f"unexpected oracle module {name}: {type(mod)}")
    write_keras_h5(path, layers)


def test_aligned_xception_encoder_matches_h5_oracle(tmp_path):
    from torch_oracles import TorchAlignedXception

    oracle = TorchAlignedXception(output_stride=32).eval()
    randomize_(oracle, seed=21)
    x = np.random.RandomState(6).rand(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        want = [t.numpy() for t in
                oracle(torch.from_numpy(x.transpose(0, 3, 1, 2)))]

    path = str(tmp_path / "xception_aligned.h5")
    _export_aligned_h5(list(oracle.layers.items()), path)

    enc = build_encoder("xception_aligned", dtype=jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    new_p, new_s = load_h5_into(path, "xception_aligned",
                                variables["params"],
                                variables["batch_stats"])
    got = enc.apply({"params": new_p, "batch_stats": new_s},
                    jnp.asarray(x), train=False)

    assert len(got) == len(want) == 5
    for i, (g, w) in enumerate(zip(got, want)):
        g = np.transpose(np.asarray(g), (0, 3, 1, 2))
        assert g.shape == w.shape, f"tap C{i+1}: {g.shape} vs {w.shape}"
        np.testing.assert_allclose(
            g, w, rtol=1e-3, atol=5e-3,
            err_msg=f"aligned-xception tap C{i+1} diverged")


def _full_oracle_layers(oracle):
    return (list(oracle.backbone.layers.items())
            + list(oracle.dec.items())
            + [("logits_semantic", oracle.logits_semantic)])


def test_aligned_deeplab_full_pascal_h5(tmp_path):
    """The reference's Deeplabv3(weights='pascal_voc') loads the WHOLE
    model; here a full-model bonlime h5 must reproduce the oracle's output
    logits through the public encoder_weights path."""
    from torch_oracles import TorchAlignedDeepLab
    from segmentation_training_pipeline_tpu.models.factory import (
        create_model, init_model)
    from segmentation_training_pipeline_tpu.models.pretrained import (
        load_encoder_weights)

    oracle = TorchAlignedDeepLab(classes=5).eval()
    randomize_(oracle, seed=22)
    x = np.random.RandomState(7).rand(1, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()

    path = str(tmp_path / "xception_aligned.h5")
    _export_aligned_h5(_full_oracle_layers(oracle), path)

    model = create_model("DeepLabV3", "xception_aligned", classes=5,
                         dtype="float32")
    variables = jax.device_get(init_model(model, (64, 64, 3)))
    loaded = load_encoder_weights("xception_aligned", path, variables)
    got = model.apply(loaded, jnp.asarray(x), train=False)

    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-3)


def test_aligned_deeplab_head_class_mismatch_warns(tmp_path):
    from torch_oracles import TorchAlignedDeepLab
    from segmentation_training_pipeline_tpu.models.factory import (
        create_model, init_model)
    from segmentation_training_pipeline_tpu.models.pretrained import (
        load_encoder_weights)

    oracle = TorchAlignedDeepLab(classes=5).eval()
    randomize_(oracle, seed=23)
    path = str(tmp_path / "xception_aligned.h5")
    _export_aligned_h5(_full_oracle_layers(oracle), path)

    model = create_model("DeepLabV3", "xception_aligned", classes=3,
                         dtype="float32")
    variables = jax.device_get(init_model(model, (64, 64, 3)))
    with pytest.warns(UserWarning, match="classes"):
        loaded = load_encoder_weights("xception_aligned", path, variables)
    # decoder DID load, head kept its fresh init
    np.testing.assert_allclose(
        np.asarray(loaded["params"]["decoder"]["concat_projection"]["kernel"]),
        _t(oracle.dec["concat_projection"].weight), rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(loaded["params"]["logits_conv"]["kernel"]),
        np.asarray(variables["params"]["logits_conv"]["kernel"]))


def test_aligned_rejects_non_bonlime_h5(tmp_path):
    path = str(tmp_path / "bad.h5")
    write_keras_h5(path, [("conv1", [("conv1/kernel:0",
                                      np.zeros((3, 3, 3, 32)))])])
    with pytest.raises(PretrainedWeightsError, match="entry_flow_conv1_1"):
        load_h5_into(path, "xception_aligned", {}, {})
