"""Native-loader decode throughput vs thread count (VERDICT r2 item 8).

PERF.md's end-to-end pipeline claim ("8 host cores cover decode for the
292 img/s device rate") is a MODEL extrapolated from this host's single
core.  This harness lets any host validate it in one command:

    python tools/decode_scale.py [--threads 1,2,4,8] [--n 256] [--size 512]

It writes a deck of PNGs once, then times `NativeLoader.load_batch`
(decode + resize to the training shape) at each thread count and prints a
JSON line per row:

    {"threads": 4, "images_per_sec": ..., "speedup_vs_1": ...}

Interpretation: the training pipeline needs `decode_rate >= device_rate`
(292 img/s/chip headline).  On this 1-core dev host the measured single
-thread rate is the base of the 8-core projection — see PERF.md
"End-to-end input pipeline".
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np


def make_deck(root: str, n: int, size: int) -> list:
    import cv2

    rng = np.random.RandomState(0)
    paths = []
    base = (rng.rand(size, size, 3) * 255).astype(np.uint8)
    for i in range(n):
        # vary content so PNG decode cost is realistic, cheaply
        img = np.roll(base, i * 7, axis=0)
        p = os.path.join(root, f"{i}.png")
        cv2.imwrite(p, img)
        paths.append(p)
    return paths


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--threads", default="1,2,4,8")
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from segmentation_training_pipeline_tpu.native.loader import NativeLoader

    with tempfile.TemporaryDirectory() as td:
        paths = make_deck(td, args.n, args.size)
        base_rate = None
        for t in [int(x) for x in args.threads.split(",")]:
            loader = NativeLoader(n_threads=t)
            # warm the page cache / pool
            loader.load_batch(paths[:8], None, args.size, args.size)
            best = 0.0
            for _ in range(args.repeats):
                t0 = time.perf_counter()
                _, _, fails = loader.load_batch(paths, None,
                                                args.size, args.size)
                dt = time.perf_counter() - t0
                assert fails == 0, f"{fails} decode failures"
                best = max(best, args.n / dt)
            loader.close()
            if base_rate is None:
                base_rate = best
            print(json.dumps({
                "threads": t,
                "images_per_sec": round(best, 1),
                "speedup_vs_1": round(best / base_rate, 2),
            }), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
