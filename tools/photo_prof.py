"""Per-op timing for the photometric augmenters on the real chip.

Doubles as the compiled-on-TPU spot check for the round-3 additions
(CLAHE's bincount/gather pattern, JpegCompression's block einsums,
MedianBlur's k²-sort) — their oracle tests run on CPU, and Mosaic/XLA:TPU
lowering of scatter/gather patterns is exactly where CPU-green code
breaks.  Results feed PERF.md.  Usage: python tools/photo_prof.py [B] [H]
"""

import sys

import numpy as np

from _util import enable_compile_cache, timeit

enable_compile_cache()

import jax  # noqa: E402

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
H = W = int(sys.argv[2]) if len(sys.argv) > 2 else 512

# one entry per op: YAML-shaped spec (the lowering path users hit)
SPECS = [
    ("Multiply", [0.9, 1.1]),
    ("GaussianBlur", {"sigma": [0, 2]}),
    ("MotionBlur", {"k": [3, 7], "angle": [0, 360]}),
    ("MedianBlur", 3),
    ("HistogramEqualization", None),
    ("CLAHE", {"clip_limit": [1, 6], "tile_grid_size": 8}),
    ("JpegCompression", {"compression": [40, 90]}),
    ("Posterize", {"nb_bits": [3, 6]}),
    ("ChannelShuffle", 0.5),
    ("AddElementwise", [-15, 15]),
    ("Autocontrast", 2),
    ("AddToHueAndSaturation", {"value": [-20, 20]}),
    ("Clouds", {"coverage": [0.2, 0.5]}),
    ("Fog", {"density": [0.1, 0.4]}),
    ("Snowflakes", {"density": [0.005, 0.05], "speed": [0.007, 0.03]}),
    ("Rain", {"density": [0.01, 0.06], "speed": [0.04, 0.1]}),
    ("ChangeColorTemperature", {"kelvin": [1000, 11000]}),
    ("UniformColorQuantization", {"n_colors": [2, 16]}),
]


def main():
    from segmentation_training_pipeline_tpu.ops.aug import lowering as L

    r = np.random.RandomState(0)
    imgs = jax.device_put(r.randint(0, 255, (B, H, W, 3), dtype=np.uint8))
    msks = jax.device_put((r.rand(B, H, W, 1) > 0.5).astype(np.float32))
    key = jax.random.PRNGKey(0)

    for name, args in SPECS:
        fn = L.build_augmentation([{"name": name, "args": args}])
        jfn = jax.jit(lambda k, i, m, fn=fn: fn(k, i, m))
        timeit(f"{name} B{B} {H}²", jfn, key, imgs, msks, n=3)


if __name__ == "__main__":
    main()
