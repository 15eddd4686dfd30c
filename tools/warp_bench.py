"""A/B: unfused 3-pass warp vs fused x/y-pipeline kernels on the real chip.

Usage: python tools/warp_bench.py [B] [H] [mode]
  mode: both | fused | unfused   (default both)
"""

import sys

import numpy as np

from _util import enable_compile_cache, timeit

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
H = W = int(sys.argv[2]) if len(sys.argv) > 2 else 512
MODE = sys.argv[3] if len(sys.argv) > 3 else "both"


def main():
    from segmentation_training_pipeline_tpu.ops.aug import fast_warp as FW
    from segmentation_training_pipeline_tpu.ops.aug import warp as WW

    r = np.random.RandomState(0)
    imgs = jax.device_put(r.rand(B, H, W, 3).astype(np.float32) * 255.0)
    msks = jax.device_put((r.rand(B, H, W, 1) > 0.5).astype(np.float32))
    key = jax.random.PRNGKey(0)
    ang = jax.random.uniform(key, (B,), minval=-0.26, maxval=0.26)
    cx = cy = (H - 1) / 2.0
    mats = WW.compose(
        WW.rotation_about(cx, cy, ang),
        WW.scale_about(cx, cy, jnp.full((B,), 1.05), jnp.full((B,), 1.05)))

    if MODE in ("both", "unfused"):
        unfused = jax.jit(lambda i, m, a: FW.warp_joint_multipass(
            i, m, a, fused=False))
        timeit("warp unfused (3-pass + transposes)", unfused, imgs, msks,
               mats, width=40)
    if MODE in ("both", "fused"):
        fused = jax.jit(lambda i, m, a: FW.warp_joint_multipass(
            i, m, a, fused=True))
        timeit("warp FUSED (2 kernels, no transposes)", fused, imgs, msks,
               mats, width=40)


if __name__ == "__main__":
    main()
