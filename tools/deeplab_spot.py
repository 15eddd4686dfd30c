"""Compiled-on-TPU spot check for DeepLabV3+/xception_aligned.

Thin shortcut over tools/arch_bench.py (same step builder — no duplicated
harness): full bf16 train step of the round-3 aligned Xception-65 graph.
Usage: python tools/deeplab_spot.py [B] [H]
"""

import sys

from arch_bench import bench_archs

if __name__ == "__main__":
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    bench_archs(["DeepLabV3"], "xception_aligned", batch, size)
