"""Component timing for the FULL-aug path at bench shapes.

Times each piece of the geometric pipeline separately on the real chip so
kernel-fusion work targets the actual hot spot.  Results feed PERF.md.
Usage:  python tools/aug_prof.py [B] [H]
"""

import sys

import numpy as np

from _util import enable_compile_cache, timeit

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
H = W = int(sys.argv[2]) if len(sys.argv) > 2 else 512


def main():
    from segmentation_training_pipeline_tpu.ops.aug import lowering as L
    from segmentation_training_pipeline_tpu.ops.aug import fast_warp as FW
    from segmentation_training_pipeline_tpu.ops.aug import pallas_elastic as PE
    from segmentation_training_pipeline_tpu.ops.aug import warp as WW

    r = np.random.RandomState(0)
    imgs = jax.device_put(r.rand(B, H, W, 3).astype(np.float32) * 255.0)
    msks = jax.device_put((r.rand(B, H, W, 1) > 0.5).astype(np.float32))
    key = jax.random.PRNGKey(0)

    # representative affine: rotate [-15, 15], scale [0.9, 1.1]
    ang = jax.random.uniform(key, (B,), minval=-0.26, maxval=0.26)
    cx = cy = (H - 1) / 2.0
    mats = WW.compose(
        WW.rotation_about(cx, cy, ang),
        WW.scale_about(cx, cy, jnp.full((B,), 1.05), jnp.full((B,), 1.05)))

    kb = 26
    dy = jax.device_put(
        (r.rand(B, H, W).astype(np.float32) * 2 - 1) * (kb - 2))
    dx = jax.device_put(
        (r.rand(B, H, W).astype(np.float32) * 2 - 1) * (kb - 2))

    multipass = jax.jit(lambda i, m, a: FW.warp_joint_multipass(i, m, a))
    elastic = jax.jit(lambda i, m, y, x: PE.warp_elastic_joint(
        i, m, y, x, kb))

    full_aug = L.build_augmentation([
        {"name": "Fliplr", "args": 0.5},
        {"name": "Affine", "args": {"rotate": [-15, 15],
                                    "scale": [0.9, 1.1]}},
        {"name": "ElasticTransformation",
         "args": {"alpha": [0, 40], "sigma": [4, 8]}},
    ])
    full_jit = jax.jit(lambda k, i, m: full_aug(k, i, m))
    imgs_u8 = jax.device_put(
        r.randint(0, 255, (B, H, W, 3), dtype=np.uint8))

    # layout ops the pipeline pays around the kernels
    tr = jax.jit(lambda x: x.transpose(0, 3, 1, 2).transpose(0, 2, 3, 1) * 1.0)
    pad = jax.jit(lambda x: jnp.pad(
        x, ((0, 0), (0, 0), (W // 2, W // 2), (0, 0))))

    timeit("transpose there+back (BHWC<->BCHW)", tr, imgs)
    timeit("x-pad (pad_frac 0.5)", pad, imgs)
    timeit("affine multipass (shear+scale+shear)", multipass, imgs, msks, mats)
    timeit("elastic joint kernel (K=26)", elastic, imgs, msks, dy, dx)
    timeit("FULL aug block (flip+affine+elastic)", full_jit, key, imgs_u8,
           msks)

    # scale pass alone (the two einsums)
    e = jnp.full((B,), 1.0)
    t0v = jnp.zeros((B,))
    scale = jax.jit(lambda i, m: FW._scale_pass(
        i, m, e, t0v, e, t0v, 0.0, orig_hw=(H, W)))
    timeit("scale pass alone (2 einsums)", scale, imgs, msks)


if __name__ == "__main__":
    main()
