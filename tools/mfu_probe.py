"""Round-3 MFU falsification probes (VERDICT r2 item 4).

The 292 img/s headline runs at ~13% of bf16 peak, attributed to the
decoder's 16-32ch convs at 512²/256² underfilling the 128-lane MXU
(PERF.md "Model-step decomposition").  Three leads get one more
falsification round; results land in PERF.md whether they win or lose.

Modes (arg 1):
  conv   — lead (a): batch-group→channel lane packing.  A conv over
           (B, H, W, C) with C ≤ 32 is algebraically equal to a grouped
           conv over (B/G, H, W, G·C) with feature_group_count=G and the
           kernel block-tiled G times (same FLOPs, G× the lane
           occupancy); measures both + the repack reshapes.
  serve  — lead (b): serving program with BN folded into conv kernels
           vs the stock predict program (flip-TTA, B64 512², bf16).
  step   — headline train step timing (for the XLA flag sweep — run
           under different XLA_FLAGS; flags change the executable so the
           persistent cache misses: expect minutes of tunnel compile).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/mfu_probe.py conv
"""

from __future__ import annotations

import sys

import numpy as np

from _util import enable_compile_cache, timeit

enable_compile_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def conv_probe():
    """(a) lane packing for skinny decoder convs."""
    # NOTE: B128 at 512²c16 OOMs the COMPILE-TIME estimate — isolated, XLA
    # lays channels on lanes and pads 16→128 (8×, 16 GB for two buffers);
    # inside the model it picks batch-on-lanes instead.  B32 keeps the
    # isolated probe allocatable; the packed variant's occupancy gain is
    # batch-size independent.
    B = 32
    cases = [
        # (H, C, G) decoder-stage shapes at the 512² headline; G·C = 128
        (512, 16, 8),
        (256, 32, 4),
        (128, 64, 2),
    ]
    rng = np.random.RandomState(0)
    for h, c, g in cases:
        x = jax.device_put(
            rng.rand(B, h, h, c).astype(np.float32).astype(jnp.bfloat16))
        k = jax.device_put(
            (rng.rand(3, 3, c, c) * 0.1).astype(np.float32)
            .astype(jnp.bfloat16))

        @jax.jit
        def plain(x, k):
            return jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        @jax.jit
        def packed(x, k, g=g, c=c):
            b, hh, ww, _ = x.shape
            xp = x.reshape(b // g, g, hh, ww, c).transpose(0, 2, 3, 1, 4)
            xp = xp.reshape(b // g, hh, ww, g * c)
            kp = jnp.tile(k, (1, 1, 1, g))  # HWIO, I=c per group, O=g*c
            y = jax.lax.conv_general_dilated(
                xp, kp, (1, 1), "SAME", feature_group_count=g,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = y.reshape(b // g, hh, ww, g, c).transpose(0, 3, 1, 2, 4)
            return y.reshape(b, hh, ww, c)

        @jax.jit
        def packed_noreshape(x, k, g=g, c=c):
            # steady-state cost if the whole decoder stayed packed
            b, hh, ww, _ = x.shape
            xp = x.reshape(b // g, hh, ww, g * c)  # layout-only pack
            kp = jnp.tile(k, (1, 1, 1, g))
            return jax.lax.conv_general_dilated(
                xp, kp, (1, 1), "SAME", feature_group_count=g,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))

        t0 = timeit(f"conv {h}x{h} c{c} B{B} plain", plain, x, k)
        t1 = timeit(f"conv {h}x{h} c{c} B{B} packed(g={g})+reshape",
                    packed, x, k)
        t2 = timeit(f"conv {h}x{h} c{c} B{B} packed(g={g}) no-reshape",
                    packed_noreshape, x, k)
        print(f"  -> packing speedup {t0 / t2:.2f}x steady-state, "
              f"{t0 / t1:.2f}x with repack", flush=True)


def serve_probe():
    """(b) BN-fold upper bound.  Folding BN into conv kernels can only
    remove the inference-mode per-channel affine EPILOGUE (scale+shift) —
    XLA fuses that into the conv output anyway, so this measures
    conv+relu vs conv+affine+relu at representative encoder/decoder
    shapes.  The delta IS the fold's ceiling."""
    B = 32
    cases = [(512, 16), (256, 32), (128, 64), (64, 256), (32, 512)]
    rng = np.random.RandomState(0)
    for h, c in cases:
        x = jax.device_put(
            rng.rand(B, h, h, c).astype(np.float32).astype(jnp.bfloat16))
        k = jax.device_put(
            (rng.rand(3, 3, c, c) * 0.1).astype(np.float32)
            .astype(jnp.bfloat16))
        s = jax.device_put(rng.rand(c).astype(np.float32)
                           .astype(jnp.bfloat16))
        b = jax.device_put(rng.rand(c).astype(np.float32)
                           .astype(jnp.bfloat16))

        @jax.jit
        def conv_relu(x, k):
            return jax.nn.relu(jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC")))

        @jax.jit
        def conv_bn_relu(x, k, s, b):
            y = jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            return jax.nn.relu(y * s + b)

        t0 = timeit(f"conv+relu {h}x{h} c{c}", conv_relu, x, k)
        t1 = timeit(f"conv+bn-affine+relu {h}x{h} c{c}", conv_bn_relu,
                    x, k, s, b)
        print(f"  -> BN epilogue cost {t1 - t0:+.2f} ms "
              f"({(t1 / t0 - 1) * 100:+.1f}%)", flush=True)


def step_probe():
    """(c) headline train step under the ambient XLA_FLAGS."""
    import os
    os.environ.setdefault("BENCH_STEPS", "10")
    sys.argv = [sys.argv[0]]
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    exec(open(os.path.join(root, "bench.py")).read(), {"__name__": "__main__"})


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "conv"
    {"conv": conv_probe, "serve": serve_probe, "step": step_probe}[mode]()
