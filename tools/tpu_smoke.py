"""One-command Pallas kernel certification (VERDICT r3 item 5).

Compiles and runs EVERY Pallas kernel's spot check against its XLA
oracle — one PASS/FAIL + timing line per kernel — so the kernel surface
can be re-certified after a JAX/libtpu bump without archaeology through
scattered /tmp drives.  Run it each round beside bench.py and paste the
table into PERF.md.

Usage:
    python tools/tpu_smoke.py [B] [H] [--interpret]

Default B=16 H=W=256 on the real chip (persistent compile cache wired
in).  ``--interpret`` forces the CPU backend and runs the kernels in
Pallas interpret mode (used by tests/test_tools.py to exercise this
tool's logic without a TPU).

Kernels covered (ops/aug/):
  shear-pass       pallas_shear.shear_pass_tpu      vs fast_warp._shear_pass
  warp-fused-xy    pallas_warp via warp_joint_multipass(fused=True)
                                                    vs the unfused 3-pass XLA chain
  elastic-1axis    pallas_elastic.warp_elastic_joint vs warp.warp_joint (exact)
  elastic-smooth   same kernel, realistic 2-D field  (documented separable approx)
  fused-elastic    the YE flag path (disp folded into the y pipeline)
                                                    vs two-stage affine->elastic

Exit code: 0 iff every kernel PASSes.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from _util import enable_compile_cache  # noqa: E402

INTERPRET = "--interpret" in sys.argv
argv = [a for a in sys.argv[1:] if not a.startswith("--")]
B = int(argv[0]) if len(argv) > 0 else (2 if INTERPRET else 16)
H = W = int(argv[1]) if len(argv) > 1 else (128 if INTERPRET else 256)

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


def main():
    mode = "interpret/CPU" if INTERPRET else str(jax.devices()[0])
    print(f"tpu_smoke: B={B} H=W={H} backend={mode}", flush=True)
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
