"""One-command Pallas kernel + augmenter-surface certification.

Kernel mode (default; VERDICT r3 item 5): compiles and runs EVERY Pallas
kernel's spot check against its XLA oracle — one PASS/FAIL + timing line
per kernel — so the kernel surface can be re-certified after a JAX/libtpu
bump without archaeology through scattered /tmp drives.

Aug mode (``--aug``; VERDICT r4 item 2): certifies the ENTIRE augmenter
registry on the current backend — every registered name AND alias is
lowered to a one-augmenter pipeline with representative args, jitted on
the default device, and checked against the same pipeline on the host CPU
backend (identical threefry randomness): finite outputs, image range
[0, 255], mask binarity, and a per-family tolerance on the image
difference (Pallas-vs-footprint geo paths and threshold-amplified ops get
looser tolerances — see _AUG_TOL).  One command re-certifies the whole
registered surface (the live registry — names + aliases — is enumerated
at run time, so the count tracks the code) after any JAX/libtpu bump.

Run both each round beside bench.py and paste the tables into PERF.md.

Usage:
    python tools/tpu_smoke.py [B] [H] [--interpret]          # kernels
    python tools/tpu_smoke.py --aug [B] [H] [--only a,b,c]   # aug surface

Default B=16 H=W=256 (kernels) / B=4 H=W=128 (aug) on the real chip
(persistent compile cache wired in).  ``--interpret`` forces the CPU
backend (kernels run in Pallas interpret mode; aug compares CPU vs CPU —
used by tests/test_tools.py to exercise the logic without a TPU).

Kernels covered (ops/aug/):
  shear-pass       pallas_shear.shear_pass_tpu      vs fast_warp._shear_pass
  warp-fused-xy    pallas_warp via warp_joint_multipass(fused=True)
                                                    vs the unfused 3-pass XLA chain
  elastic-1axis    pallas_elastic.warp_elastic_joint vs warp.warp_joint (exact)
  elastic-smooth   same kernel, realistic 2-D field  (documented separable approx)
  fused-elastic    the YE flag path (disp folded into the y pipeline)
                                                    vs two-stage affine->elastic

Exit code: 0 iff every check PASSes.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _util import enable_compile_cache  # noqa: E402

INTERPRET = "--interpret" in sys.argv
AUG_MODE = "--aug" in sys.argv
ONLY = None
_raw = sys.argv[1:]
if "--only" in _raw:
    i = _raw.index("--only")
    ONLY = set(_raw[i + 1].lower().split(","))
    _raw = _raw[:i] + _raw[i + 2:]
argv = [a for a in _raw if not a.startswith("--")]
_default_b = (2 if INTERPRET else (4 if AUG_MODE else 16))
_default_h = (128 if INTERPRET or AUG_MODE else 256)
B = int(argv[0]) if len(argv) > 0 else _default_b
H = W = int(argv[1]) if len(argv) > 1 else _default_h

if INTERPRET:
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    enable_compile_cache()
    import jax

import jax.numpy as jnp  # noqa: E402


def _time(fn, *args, n=3):
    """Per-call ms with a device_get value fetch (block_until_ready lies
    on the axon backend — PERF.md 'What we learned')."""
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0][:1, :1])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0][:1, :1])
    return (time.perf_counter() - t0) / n * 1000, out


_FAILED = []


def _report(name, ok, detail, ms_pallas, ms_oracle):
    status = "PASS" if ok else "FAIL"
    if not ok:
        _FAILED.append(name)
    print(f"{status} {name:16s} {detail:34s} "
          f"pallas={ms_pallas:8.2f}ms  oracle={ms_oracle:8.2f}ms",
          flush=True)


def _data(seed=0, k=1):
    r = np.random.RandomState(seed)
    img = jnp.asarray(r.rand(B, H, W, 3).astype(np.float32) * 255.0)
    msk = jnp.asarray((r.rand(B, H, W, k) > 0.5).astype(np.float32))
    return img, msk


def _mats(seed=1):
    from segmentation_training_pipeline_tpu.ops.aug import warp as WW

    r = np.random.RandomState(seed)
    cx, cy = (W - 1) / 2.0, (H - 1) / 2.0
    ang = jnp.asarray(r.uniform(-25, 25, B) * np.pi / 180.0, jnp.float32)
    sx = jnp.asarray(r.uniform(0.85, 1.2, B), jnp.float32)
    sy = jnp.asarray(r.uniform(0.85, 1.2, B), jnp.float32)
    sh = jnp.asarray(r.uniform(-10, 10, B) * np.pi / 180.0, jnp.float32)
    m = WW.compose(WW.rotation_about(cx, cy, ang),
                   WW.scale_about(cx, cy, sx, sy))
    return WW.compose(WW.shear_about(cx, cy, sh, jnp.zeros_like(sh)), m)


def check_shear_pass():
    from segmentation_training_pipeline_tpu.ops.aug.fast_warp import (
        _shear_pass)
    from segmentation_training_pipeline_tpu.ops.aug.pallas_shear import (
        shear_pass_tpu)

    img, msk = _data(seed=2)
    r = np.random.RandomState(3)
    offs = jnp.asarray(r.uniform(-H / 8, H / 8, (B, H)).astype(np.float32))
    joint = jnp.concatenate([img, msk], -1).transpose(0, 3, 1, 2)
    kinds = jnp.asarray([0, 0, 0, 1], jnp.int32)

    pallas = jax.jit(lambda j, o: shear_pass_tpu(
        j, o, kinds, norig=W, src_shift=0, fill=0.0, interpret=INTERPRET))
    oracle = jax.jit(lambda i, m, o: _shear_pass(i, m, o, axis=2, fill=0.0))

    ms_p, out = _time(pallas, joint, offs)
    ms_o, (oi, om) = _time(oracle, img, msk, offs)
    out = out.transpose(0, 2, 3, 1)
    err = float(jnp.abs(out[..., :3] - oi).max())
    merr = float(jnp.abs(out[..., 3:] - om).max())
    _report("shear-pass", err < 1e-4 and merr == 0.0,
            f"max_err={err:.2e} mask_err={merr:g}", ms_p, ms_o)


def check_warp_fused():
    from segmentation_training_pipeline_tpu.ops.aug.fast_warp import (
        warp_joint_multipass)

    img, msk = _data(seed=4)
    mats = _mats(seed=5)
    fused = jax.jit(lambda i, m, a: warp_joint_multipass(
        i, m, a, fused=True, interpret=INTERPRET))
    unfused = jax.jit(lambda i, m, a: warp_joint_multipass(
        i, m, a, fused=False))
    ms_p, (fi, fm) = _time(fused, img, msk, mats)
    ms_o, (ri, rm) = _time(unfused, img, msk, mats)
    err = float(jnp.abs(fi - ri).max())
    mism = float(jnp.mean(fm != rm))
    # 5e-3 interpret-mode residual + headroom for the compiled bf16 dot
    _report("warp-fused-xy", err < 0.05 and mism < 2e-3,
            f"max_err={err:.2e} mask_mism={mism:.1e}", ms_p, ms_o)


def check_elastic_single_axis():
    from segmentation_training_pipeline_tpu.ops.aug import warp as WW
    from segmentation_training_pipeline_tpu.ops.aug import (
        pallas_elastic as PE)

    img, msk = _data(seed=6)
    r = np.random.RandomState(7)
    d = jnp.asarray(r.uniform(-5, 5, (B, H, W)).astype(np.float32))
    z = jnp.zeros_like(d)
    pallas = jax.jit(lambda i, m, dd: PE.warp_elastic_joint(
        i, m, z, dd, 7, interpret=INTERPRET))
    oracle = jax.jit(lambda i, m, dd: WW.warp_joint(
        i, m, WW.identity_mats(B), (dd, z)))
    ms_p, (pi, pm) = _time(pallas, img, msk, d)
    ms_o, (oi, om) = _time(oracle, img, msk, d)
    err = float(jnp.abs(pi - oi).max())
    merr = float(jnp.abs(pm - om).max())
    _report("elastic-1axis", err < 1e-2 and merr == 0.0,
            f"max_err={err:.2e} mask_err={merr:g}", ms_p, ms_o)


def check_elastic_smooth():
    from segmentation_training_pipeline_tpu.ops.aug import warp as WW
    from segmentation_training_pipeline_tpu.ops.aug import (
        pallas_elastic as PE)

    # smooth content (low-res upsampled), matching the approximation's
    # contract — the separable 2-pass evaluates the second field at the
    # shifted position, sub-pixel-exact only for smooth fields/images
    # (tests/test_pallas_elastic.py::TestSmoothField)
    r = np.random.RandomState(8)
    img = jax.image.resize(
        jnp.asarray(r.rand(B, 8, 8, 3).astype(np.float32) * 255.0),
        (B, H, W, 3), "cubic")
    msk = (img[..., :1] > 127.0).astype(jnp.float32)
    k = jax.random.PRNGKey(1)
    dx, dy = WW.elastic_field(k, B, H, W, jnp.full((B,), 20.0),
                              jnp.full((B,), 5.0), radius=10)
    pallas = jax.jit(lambda i, m, a, b2: PE.warp_elastic_joint(
        i, m, b2, a, 8, interpret=INTERPRET))
    oracle = jax.jit(lambda i, m, a, b2: WW.warp_joint(
        i, m, WW.identity_mats(B), (a, b2)))
    ms_p, (pi, pm) = _time(pallas, img, msk, dx, dy)
    ms_o, (oi, om) = _time(oracle, img, msk, dx, dy)
    mean_err = float(jnp.abs(pi - oi).mean())  # 255-scale
    inter = float(((pm > 0.5) & (om > 0.5)).sum())
    union = float(((pm > 0.5) | (om > 0.5)).sum()) + 1e-9
    iou = inter / union
    _report("elastic-smooth", mean_err < 2.6 and iou > 0.97,
            f"mean_err={mean_err:.3f}/255 mask_iou={iou:.4f}", ms_p, ms_o)


def check_fused_elastic_flag_path():
    from segmentation_training_pipeline_tpu.ops.aug.fast_warp import (
        warp_joint_multipass)
    from segmentation_training_pipeline_tpu.ops.aug.pallas_elastic import (
        warp_elastic_joint)

    img, msk = _data(seed=10)
    mats = _mats(seed=11)
    r = np.random.RandomState(12)
    kb = 7
    dx = jnp.asarray(
        (r.rand(B, H, W).astype(np.float32) * 2 - 1) * (kb - 1))
    dy = jnp.asarray(
        (r.rand(B, H, W).astype(np.float32) * 2 - 1) * (kb - 1))

    fused = jax.jit(lambda i, m, a, x, y: warp_joint_multipass(
        i, m, a, fused=True, interpret=INTERPRET, disp=(x, y), disp_k=kb))

    def two_stage(i, m, a, x, y):
        ai, am = warp_joint_multipass(i, m, a, fused=True,
                                      interpret=INTERPRET)
        return warp_elastic_joint(ai, am, y, x, kb, interpret=INTERPRET)

    ms_p, (fi, fm) = _time(fused, img, msk, mats, dx, dy)
    ms_o, (ri, rm) = _time(jax.jit(two_stage), img, msk, mats, dx, dy)
    err = float(jnp.abs(fi - ri).max())
    mism = float(jnp.mean(fm != rm))
    _report("fused-elastic", err < 0.1 and mism < 2e-3,
            f"max_err={err:.2e} mask_mism={mism:.1e}", ms_p, ms_o)


# ---------------------------------------------------------------------------
# --aug mode: certify the whole augmenter registry on this backend
# ---------------------------------------------------------------------------

# representative args per CANONICAL augmenter name (None = bare default);
# chosen so each op visibly transforms a random 128² batch
_AUG_ARGS = {
    "Fliplr": 1.0, "Flipud": 1.0, "Rot90": [1, 1],
    "Affine": {"rotate": [-15, 15], "scale": [0.9, 1.1],
               "translate_percent": {"x": [-0.1, 0.1]}, "shear": [-5, 5],
               "cval": 64},
    "ElasticTransformation": {"alpha": [15, 25], "sigma": 5},
    "Crop": {"percent": [0, 0.1]}, "CropAndPad": {"percent": [-0.1, 0.1]},
    "Pad": {"percent": [0, 0.15], "pad_cval": 32},
    "CropToFixedSize": {"width": 96, "height": 96},
    "PadToFixedSize": {"width": 160, "height": 160},
    "CenterCropToFixedSize": {"width": 96, "height": 96},
    "PiecewiseAffine": {"scale": [0.01, 0.03]},
    "PerspectiveTransform": {"scale": [0.02, 0.06]},
    "Rotate": [-25, 25], "TranslateX": [-0.2, 0.2],
    "TranslateY": {"px": [-10, 10]},
    "ScaleX": [0.8, 1.2], "ScaleY": [0.8, 1.2],
    "ShearX": [-15, 15], "ShearY": [-15, 15],
    "Multiply": [0.8, 1.2], "Add": [-25, 25],
    "LinearContrast": [0.7, 1.3], "GammaContrast": [0.7, 1.4],
    "SigmoidContrast": {"gain": [5, 12], "cutoff": [0.3, 0.6]},
    "LogContrast": [0.6, 1.4],
    "AdditiveGaussianNoise": {"scale": [5, 12]},
    "AdditivePoissonNoise": {"lam": [2, 8]},
    "AdditiveLaplaceNoise": {"scale": [2, 10]},
    "GaussianBlur": {"sigma": [0.5, 2]}, "AverageBlur": {"k": [3, 7]},
    "MotionBlur": {"k": [3, 7], "angle": [0, 360]}, "MedianBlur": 3,
    "MedianPooling": 2,
    "BilateralBlur": {"d": [3, 9], "sigma_color": [20, 150],
                      "sigma_space": [20, 150]},
    "FastSnowyLandscape": {"lightness_threshold": [100, 255],
                           "lightness_multiplier": [1.5, 3.0]},
    "CoarseDropout": {"p": 0.1, "size_percent": 0.1},
    "Cutout": {"nb_iterations": 2, "size": 0.2},
    "Dropout": 0.05, "Dropout2d": {"p": 0.5}, "TotalDropout": 0.5,
    "SaltAndPepper": 0.05, "Salt": 0.05, "Pepper": 0.05,
    "ImpulseNoise": 0.05,
    "CoarseSaltAndPepper": {"p": 0.1, "size_percent": 0.1},
    "CoarseSalt": {"p": 0.1, "size_percent": 0.1},
    "CoarsePepper": {"p": 0.1, "size_percent": 0.1},
    "ReplaceElementwise": {"mask": 0.05, "replacement": [0, 255]},
    "AddElementwise": [-20, 20], "MultiplyElementwise": [0.8, 1.2],
    "Grayscale": [0.5, 1.0], "Invert": 1.0,
    "Solarize": {"p": 1.0, "threshold": [64, 192]},
    "Sharpen": {"alpha": [0.3, 0.7]}, "Emboss": {"alpha": [0.3, 0.7]},
    "EdgeDetect": {"alpha": [0.3, 0.7]},
    "AveragePooling": 2, "MaxPooling": 2, "MinPooling": 2,
    "AddToHue": [-40, 40], "AddToSaturation": [-60, 60],
    "MultiplyHue": [0.6, 1.4], "MultiplySaturation": [0.3, 2.0],
    "RemoveSaturation": 1.0,
    "AddToHueAndSaturation": {"value": [-30, 30]},
    "MultiplyHueAndSaturation": {"mul": [0.8, 1.2]},
    "HistogramEqualization": None,
    "CLAHE": {"clip_limit": [2, 6], "tile_grid_size": 8},
    "JpegCompression": {"compression": [50, 90]},
    "Posterize": {"nb_bits": [3, 6]}, "ChannelShuffle": 1.0,
    "Autocontrast": 2, "Noop": None, "Resize": 0.5,
    "Clouds": {"coverage": [0.3, 0.5]}, "Fog": {"density": [0.2, 0.4]},
    "Snowflakes": None, "Rain": None,
    "ChangeColorTemperature": {"kelvin": [2000, 10000]},
    "UniformColorQuantization": {"n_colors": [4, 8]},
    "Superpixels": {"p_replace": 0.7, "n_segments": [40, 80],
                    "max_size": 64},
    "UniformVoronoi": {"n_points": [50, 120], "p_replace": [0.5, 1.0],
                       "max_size": 64},
    "RegularGridVoronoi": {"n_rows": [8, 16], "n_cols": [8, 16],
                           "p_drop_points": 0.3, "p_replace": 0.9,
                           "max_size": 64},
    "RelativeRegularGridVoronoi": {"n_rows_frac": [0.05, 0.15],
                                   "n_cols_frac": [0.05, 0.15],
                                   "p_replace": 0.9, "max_size": 64},
    "KMeansColorQuantization": {"n_colors": [3, 8], "max_size": 64},
    "Jigsaw": {"nb_rows": 4, "nb_cols": 4, "max_steps": [1, 4]},
    "Sometimes": {"p": 0.5, "then": {"Add": [20, 40]},
                  "else": {"Multiply": [0.5, 0.8]}},
    "OneOf": [{"Fliplr": 1.0}, {"Flipud": 1.0}],
    "SomeOf": {"n": [0, 2], "children": [{"Add": [-20, 20]},
                                         {"Multiply": [0.8, 1.2]}]},
    "WithChannels": {"channels": [0], "children": {"Add": [20, 40]}},
    "WithHueAndSaturation": {"children": {"Add": [10, 30]}},
    "WithBrightnessChannels": {"children": {"Multiply": [0.6, 0.9]}},
    "WithColorspace": {"to_colorspace": "HSV",
                       "children": {"Add": [5, 20]}},
    "BlendAlpha": {"factor": [0.2, 0.8], "foreground": {"Add": 40}},
    "BlendAlphaElementwise": {"factor": [0, 1], "foreground": {"Add": 40}},
    "BlendAlphaVerticalLinearGradient": {"foreground": {"Add": 40}},
    "BlendAlphaHorizontalLinearGradient": {"foreground": {"Add": 40}},
    "BlendAlphaRegularGrid": {"nb_rows": [2, 4], "nb_cols": [2, 4],
                              "foreground": {"Multiply": 0.5}},
    "BlendAlphaCheckerboard": {"nb_rows": 4, "nb_cols": 4,
                               "foreground": {"Invert": 1.0}},
    "BlendAlphaSimplexNoise": {"foreground": {"Add": 40}},
    "BlendAlphaFrequencyNoise": {"exponent": [-3, 3],
                                 "foreground": {"Add": 40}},
    "BlendAlphaSomeColors": {"nb_bins": [5, 15], "smoothness": [0.1, 0.3],
                             "rotation_deg": [0, 360],
                             "foreground": {"Grayscale": 1.0}},
    "BlendAlphaSegMapClassIds": {"class_ids": [1],
                                 "foreground": {"Add": 60}},
    "DirectedEdgeDetect": {"alpha": [0.3, 0.7], "direction": [0.0, 1.0]},
    "Canny": {"alpha": [0.5, 1.0], "sobel_kernel_size": 3},
    "ChangeColorspace": {"to_colorspace": "HSV", "alpha": [0.5, 1.0]},
    "MeanShiftBlur": {"spatial_radius": [3, 5], "color_radius": [20, 60]},
    "Cartoon": {"blur_ksize": 3, "segmentation_size": [0.8, 1.2],
                "saturation": [1.5, 2.5], "edge_prevalence": [0.9, 1.1]},
}

# mean |TPU - CPU| tolerance on the 0..255 scale.  Default covers
# elementwise/noise ops (identical threefry bits; f32 rounding only).
# Looser classes: conv/histogram ops (algorithm/fusion differences),
# warp-path geo (Pallas shear/bf16 dots vs CPU f32 footprint gather),
# displacement fields + threshold-amplified maps (a 1-ulp diff can flip
# a sigmoid/mask cell, so a few pixels differ by full range).
_AUG_TOL_DEFAULT = 0.75
_AUG_TOL = {}
for _n in ("gaussianblur", "averageblur", "motionblur", "medianblur",
           "medianpooling", "bilateralblur", "fastsnowylandscape",
           "sharpen", "emboss", "edgedetect", "averagepooling",
           "histogramequalization", "allchannelshistogramequalization",
           "clahe", "allchannelsclahe", "autocontrast",
           "posterize", "uniformcolorquantization",
           "changecolortemperature", "jpegcompression"):
    _AUG_TOL[_n] = 2.0
for _n in ("fliplr", "horizontalflip", "flipud", "verticalflip", "rot90",
           "affine", "crop", "cropandpad", "pad", "croptofixedsize",
           "randomcrop", "padtofixedsize", "centercroptofixedsize",
           "rotate", "translatex", "translatey", "scalex", "scaley",
           "shearx", "sheary", "resize", "scale", "oneof"):
    _AUG_TOL[_n] = 3.0
for _n in ("elastictransformation", "elastictransform", "elastic",
           "piecewiseaffine", "perspectivetransform",
           "blendalphasimplexnoise", "simplexnoisealpha",
           "blendalphafrequencynoise", "frequencynoisealpha",
           "blendalpharegulargrid", "blendalphacheckerboard",
           "blendalphaelementwise", "alphaelementwise",
           "clouds", "fog", "snowflakes", "rain",
           "sometimes", "someof", "blendalpha", "alpha",
           "blendalphaverticallineargradient",
           "blendalphahorizontallineargradient", "withchannels",
           "withhueandsaturation", "withbrightnesschannels",
           "withcolorspace"):
    _AUG_TOL[_n] = 6.0


def check_aug_surface():
    """Every registered augmenter name + alias: jit on the default
    backend, compare against the CPU backend with identical randomness."""
    from segmentation_training_pipeline_tpu import config as C
    from segmentation_training_pipeline_tpu.config import AUGMENTERS
    from segmentation_training_pipeline_tpu.ops.aug.lowering import (
        build_augmentation)

    C._populate_registries()
    names = sorted(AUGMENTERS._canonical)  # lowercase, incl. aliases
    if ONLY is not None:
        names = [n for n in names if n in ONLY]
    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]
    r = np.random.RandomState(0)
    # SMOOTH content (low-res upsample, like the elastic-smooth kernel
    # check): photometric comparisons are bit-driven either way, while the
    # geo paths differ by backend (Pallas shear / separable elastic on TPU
    # vs XLA footprint gather on CPU) and are only sub-pixel-comparable on
    # smooth images; the mask follows the image so warp mask flips stay
    # boundary-only
    img_h = np.asarray(jax.device_get(jax.device_put(jax.image.resize(
        jnp.asarray(r.rand(B, 16, 16, 3).astype(np.float32) * 255.0),
        (B, H, W, 3), "cubic"), cpu))).clip(0, 255).astype(np.uint8)
    msk_h = (img_h[..., :1] > 127).astype(np.float32)
    key_h = np.asarray(jax.random.PRNGKey(42))

    n_pass = 0
    for name in names:
        canon = AUGMENTERS._canonical[name]
        args = _AUG_ARGS.get(canon)
        try:
            outs = {}
            for tag, d in (("dev", dev), ("cpu", cpu)):
                # the Pallas dispatch (use_pallas) consults the env at
                # TRACE time — force the XLA fallback for the CPU
                # reference or the traced kernel can't execute there
                saved = {k: os.environ.get(k) for k in
                         ("STP_PALLAS_SHEAR", "STP_PALLAS_ELASTIC",
                          "STP_PALLAS_WARP")}
                if tag == "cpu":
                    for k in saved:
                        os.environ[k] = "0"
                try:
                    fn = jax.jit(build_augmentation(
                        [{"name": name, "args": args}]))
                    ik = jax.device_put(jnp.asarray(key_h), d)
                    ii = jax.device_put(jnp.asarray(img_h), d)
                    im = jax.device_put(jnp.asarray(msk_h), d)
                    t0 = time.perf_counter()
                    oi, om = fn(ik, ii, im)
                    oi = np.asarray(jax.device_get(oi))
                    om = np.asarray(jax.device_get(om))
                    outs[tag] = (oi, om, time.perf_counter() - t0)
                finally:
                    for k, v in saved.items():
                        if v is None:
                            os.environ.pop(k, None)
                        else:
                            os.environ[k] = v
            oi_d, om_d, dt_d = outs["dev"]
            oi_c, om_c, _ = outs["cpu"]
            finite = np.isfinite(oi_d).all()
            in_range = oi_d.min() >= -1e-3 and oi_d.max() <= 255.0 + 1e-3
            binary = set(np.unique(om_d)) <= {0.0, 1.0}
            mean_err = float(np.abs(oi_d - oi_c).mean())
            max_err = float(np.abs(oi_d - oi_c).max())
            mask_mism = float((om_d != om_c).mean())
            # effect check: dev-vs-cpu equality alone is VACUOUS if the
            # augmenter no-ops on both backends (the r5 bare-args bug
            # class) — the representative args must visibly do something
            effect = max(float(np.abs(oi_d
                                      - img_h.astype(np.float32)).max()),
                         float((om_d != msk_h).mean()))
            has_effect = effect > 1e-3 or name in ("noop", "identity")
            tol = _AUG_TOL.get(name, _AUG_TOL_DEFAULT)
            # warp-path masks may flip boundary pixels (multipass nearest
            # shifts ±1px vs the footprint gather — documented deviation)
            mask_tol = 0.02 if tol < 3 else 0.06
            ok = (finite and in_range and binary and mean_err <= tol
                  and mask_mism <= mask_tol and has_effect)
            detail = (f"mean_err={mean_err:7.3f} (tol {tol:g}) "
                      f"max={max_err:6.1f} mask_mism={mask_mism:.4f}")
            if not (finite and in_range and binary and has_effect):
                detail += (f" finite={finite} range={in_range} "
                           f"binary={binary} effect={effect:.3f}")
        except Exception as e:
            ok = False
            detail = f"EXC {type(e).__name__}: {str(e)[:60]}"
            dt_d = 0.0
        status = "PASS" if ok else "FAIL"
        if not ok:
            _FAILED.append(name)
        else:
            n_pass += 1
        print(f"{status} {name:40s} {detail}  dev={dt_d*1e3:7.1f}ms",
              flush=True)
    total = len(names)
    print(f"AUG SURFACE {'OK' if not _FAILED else 'FAILED'} "
          f"({n_pass}/{total})"
          + (f" failed: {_FAILED}" if _FAILED else ""), flush=True)


def main():
    mode = "interpret/CPU" if INTERPRET else str(jax.devices()[0])
    print(f"tpu_smoke: B={B} H=W={H} backend={mode}"
          + (" mode=aug" if AUG_MODE else ""), flush=True)
    if AUG_MODE:
        check_aug_surface()
        sys.exit(1 if _FAILED else 0)
    check_shear_pass()
    check_warp_fused()
    check_elastic_single_axis()
    check_elastic_smooth()
    check_fused_elastic_flag_path()
    n_ok = 5 - len(_FAILED)
    print(f"SMOKE {'OK' if not _FAILED else 'FAILED'} ({n_ok}/5)"
          + (f" failed: {_FAILED}" if _FAILED else ""), flush=True)
    sys.exit(1 if _FAILED else 0)


if __name__ == "__main__":
    main()
