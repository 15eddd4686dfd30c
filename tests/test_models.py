import jax
import jax.numpy as jnp
import numpy as np
import pytest

from segmentation_training_pipeline_tpu.models.factory import (
    apply_activation,
    create_model,
    init_model,
)
from segmentation_training_pipeline_tpu.models.encoders import (
    build_encoder,
    known_backbones,
)

RNGS = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
X64 = jax.ShapeDtypeStruct((2, 64, 64, 3), jnp.float32)


def _out_shape(model, x=X64):
    return jax.eval_shape(
        lambda xx: model.init_with_output(RNGS, xx, train=False)[0], x
    )


class TestShapeMatrix:
    @pytest.mark.parametrize("backbone", known_backbones())
    def test_unet_all_backbones(self, backbone):
        m = create_model("Unet", backbone, classes=3)
        out = _out_shape(m)
        assert out.shape == (2, 64, 64, 3)
        assert out.dtype == jnp.float32  # logits always f32

    @pytest.mark.parametrize("arch", ["FPN", "Linknet", "PSPNet", "DeepLabV3"])
    @pytest.mark.parametrize("backbone", ["resnet34", "efficientnetb0", "mobilenetv2"])
    def test_other_archs(self, arch, backbone):
        m = create_model(arch, backbone, classes=2)
        assert _out_shape(m).shape == (2, 64, 64, 2)

    def test_encoder_stride_pyramid(self):
        enc = build_encoder("resnet34", dtype=jnp.float32)
        feats = jax.eval_shape(
            lambda x: enc.init_with_output(RNGS, x, train=False)[0],
            jax.ShapeDtypeStruct((1, 128, 128, 3), jnp.float32),
        )
        assert [f.shape[1] for f in feats] == [64, 32, 16, 8, 4]  # strides 2..32

    def test_unknown_architecture(self):
        m = create_model("Unetx", "resnet34")
        with pytest.raises(KeyError, match="architecture"):
            _out_shape(m)

    def test_unknown_backbone(self):
        m = create_model("Unet", "resnet33")
        with pytest.raises(KeyError, match="backbone"):
            _out_shape(m)


class TestRealForward:
    def test_unet_resnet18_forward_and_param_layout(self):
        m = create_model("Unet", "resnet18", classes=1, dtype="float32")
        v = init_model(m, (32, 32, 3))
        assert set(v["params"].keys()) == {"encoder", "decoder", "logits_conv"}
        assert "batch_stats" in v
        out = jax.jit(lambda vv, x: m.apply(vv, x, train=False))(
            v, jnp.ones((1, 32, 32, 3))
        )
        assert out.shape == (1, 32, 32, 1)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_train_mode_updates_batch_stats(self):
        m = create_model("Unet", "resnet18", classes=1, dtype="float32")
        v = init_model(m, (32, 32, 3))
        x = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
        out, updates = m.apply(
            v, x, train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(3)},
        )
        old = jax.tree.leaves(v["batch_stats"])
        new = jax.tree.leaves(updates["batch_stats"])
        assert any(not np.allclose(a, b) for a, b in zip(old, new))

    def test_bf16_compute_f32_logits(self):
        m = create_model("Unet", "resnet18", classes=1, dtype="bfloat16")
        out = _out_shape(m, jax.ShapeDtypeStruct((1, 32, 32, 3), jnp.float32))
        assert out.dtype == jnp.float32

    def test_remat_variant_same_shapes(self):
        m = create_model("Unet", "resnet18", classes=1, remat=True)
        assert _out_shape(m).shape == (2, 64, 64, 1)


def test_apply_activation():
    x = jnp.asarray([[0.0, 1.0]])
    s = apply_activation(x, "sigmoid")
    assert np.allclose(s, jax.nn.sigmoid(x))
    sm = apply_activation(x, "softmax")
    assert np.allclose(np.asarray(sm).sum(-1), 1.0)
    assert np.allclose(apply_activation(x, "linear"), x)


class TestAlignedXception:
    def test_deeplab_pairing_uses_bonlime_graph(self):
        # DeepLabV3 + xception_aligned → aligned decoder (flat bonlime
        # names) over the stride-16 dilated C5
        m = create_model("DeepLabV3", "xception_aligned", classes=2,
                         dtype="float32")
        shapes = jax.eval_shape(lambda x: m.init(RNGS, x, train=False), X64)
        dec = shapes["params"]["decoder"]
        assert "concat_projection" in dec
        assert "decoder_conv0_depthwise" in dec
        assert "aspp1_depthwise" in dec
        assert _out_shape(m).shape == (2, 64, 64, 2)

    def test_generic_pairing_keeps_stride_pyramid(self):
        # any other decoder gets the stride-32 layout (exit flow strided)
        enc = build_encoder("xception_aligned", dtype=jnp.float32)
        feats = jax.eval_shape(
            lambda x: enc.init_with_output(RNGS, x, train=False)[0],
            jax.ShapeDtypeStruct((1, 128, 128, 3), jnp.float32),
        )
        assert [f.shape[1] for f in feats] == [64, 32, 16, 8, 4]
        assert [f.shape[-1] for f in feats] == [64, 256, 256, 728, 2048]

    def test_os16_keeps_c5_at_stride16(self):
        enc = build_encoder("xception_aligned", output_stride=16,
                            dtype=jnp.float32)
        feats = jax.eval_shape(
            lambda x: enc.init_with_output(RNGS, x, train=False)[0],
            jax.ShapeDtypeStruct((1, 128, 128, 3), jnp.float32),
        )
        assert feats[4].shape[1] == 8  # dilated, not strided


def test_pspnet_decoder_stays_stride8():
    """r3 regression: upsampling the 512-channel fused map to full res
    (instead of resizing the logits in the head) materialized a B×H×W×512
    temp that crashed the TPU compiler at B32 512² — the decoder must
    return the stride-8 map (PERF.md round 3)."""
    from segmentation_training_pipeline_tpu.models.decoders.pspnet import (
        PSPDecoder)

    dec = PSPDecoder(dtype=jnp.float32)
    feats = [jax.ShapeDtypeStruct((1, 128 // s, 128 // s, c), jnp.float32)
             for s, c in ((2, 64), (4, 64), (8, 128), (16, 256), (32, 512))]
    out = jax.eval_shape(
        lambda f: dec.init_with_output(RNGS, f, train=False)[0], feats)
    assert out.shape == (1, 16, 16, 512)  # stride 8, channels intact
    # and the model head restores full resolution
    m = create_model("PSPNet", "resnet34", classes=3)
    assert _out_shape(m).shape == (2, 64, 64, 3)


def test_deeplab_decoders_stay_stride4():
    """r3 review: both DeepLab decoders must return the stride-4 map (the
    head resizes logits) — upsampling 256 channels first is the PSPNet
    compiler-crash tensor class."""
    from segmentation_training_pipeline_tpu.models.decoders import (
        AlignedDeepLabDecoder, DeepLabV3PlusDecoder)

    feats = [jax.ShapeDtypeStruct((1, 128 // s, 128 // s, c), jnp.float32)
             for s, c in ((2, 64), (4, 64), (8, 128), (16, 256), (32, 512))]
    out = jax.eval_shape(
        lambda f: DeepLabV3PlusDecoder(dtype=jnp.float32).init_with_output(
            RNGS, f, train=False)[0], feats)
    assert out.shape == (1, 32, 32, 256)
    # aligned variant consumes the OS16 layout (C5 at stride 16)
    feats16 = [jax.ShapeDtypeStruct((1, 128 // s, 128 // s, c), jnp.float32)
               for s, c in ((2, 64), (4, 256), (8, 256), (16, 728),
                            (16, 2048))]
    out = jax.eval_shape(
        lambda f: AlignedDeepLabDecoder(dtype=jnp.float32).init_with_output(
            RNGS, f, train=False)[0], feats16)
    assert out.shape == (1, 32, 32, 256)
    for arch, backbone in (("DeepLabV3", "resnet34"),
                           ("DeepLabV3", "xception_aligned")):
        m = create_model(arch, backbone, classes=2)
        assert _out_shape(m).shape == (2, 64, 64, 2)
