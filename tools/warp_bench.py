"""A/B: unfused 3-pass warp vs fused x/y-pipeline kernels on the real chip.

Usage: python tools/warp_bench.py [B] [H] [mode]
  mode: both | fused | unfused   (default both)
"""

import os
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/stp_xla_cache"))

import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/stp_xla_cache"))
except Exception:
    pass

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
H = W = int(sys.argv[2]) if len(sys.argv) > 2 else 512
MODE = sys.argv[3] if len(sys.argv) > 3 else "both"


def timeit(name, fn, *args, n=5):
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0][:1, :1, :1])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0][:1, :1, :1])
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"{name:40s} {dt:8.2f} ms", flush=True)
    return dt


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
               mats)
    if MODE in ("both", "fused"):
        fused = jax.jit(lambda i, m, a: FW.warp_joint_multipass(
            i, m, a, fused=True))
        timeit("warp FUSED (2 kernels, no transposes)", fused, imgs, msks,
               mats)


if __name__ == "__main__":
    main()
