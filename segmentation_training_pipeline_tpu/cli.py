"""Command-line entry points: ``fit`` / ``predict`` / ``evaluate``.

Reference exposes its pipeline programmatically (README quickstart:
``segmentation.parse(...).fit(ds)``); the CLI wraps the same surface for
directory-based datasets:

    python -m segmentation_training_pipeline_tpu fit cfg.yaml \
        --images data/images --masks data/masks [--folds 0 1] [--start-stage 0]
    python -m segmentation_training_pipeline_tpu predict cfg.yaml src_dir dst_dir
    python -m segmentation_training_pipeline_tpu evaluate cfg.yaml \
        --images data/images --masks data/masks
"""

from __future__ import annotations

import argparse
import json
import sys


def _build_parser():
    p = argparse.ArgumentParser(prog="segmentation_training_pipeline_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    f = sub.add_parser("fit", help="train all folds/stages per the YAML config")
    f.add_argument("config")
    f.add_argument("--images", required=True, help="images directory")
    f.add_argument("--masks", default=None, help="masks directory")
    f.add_argument("--rle-csv", default=None,
                   help="Kaggle-style CSV with id + RLE mask columns "
                        "(alternative to --masks)")
    f.add_argument("--folds", type=int, nargs="*", default=None)
    f.add_argument("--start-stage", type=int, default=0)

    pr = sub.add_parser("predict", help="predict masks for a directory")
    pr.add_argument("config")
    pr.add_argument("src")
    pr.add_argument("dst")
    pr.add_argument("--folds", type=int, nargs="*", default=None)
    pr.add_argument("--stage", type=int, default=-1)
    pr.add_argument("--threshold", type=float, default=None)

    ev = sub.add_parser("evaluate", help="metrics over a labeled directory")
    ev.add_argument("config")
    ev.add_argument("--images", required=True)
    ev.add_argument("--masks", default=None)
    ev.add_argument("--rle-csv", default=None)
    ev.add_argument("--folds", type=int, nargs="*", default=None)
    ev.add_argument("--stage", type=int, default=-1)
    return p


def _enable_compilation_cache():
    """Persistent XLA compilation cache: recompiling the same (model, shape)
    program across CLI invocations is pure waste — on remote-compile TPU
    setups a cold compile can cost minutes."""
    import os

    import jax

    cache_dir = os.environ.get(
        "STP_COMPILATION_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "stp_xla_cache"),
    )
    if cache_dir and cache_dir != "0":
        try:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass  # older jax without the knob — not fatal


def main(argv=None) -> int:
    args = _build_parser().parse_args(argv)
    _enable_compilation_cache()
    # multi-host launch (STP_DISTRIBUTED=1 / JAX_COORDINATOR_ADDRESS set):
    # must run before any jax device use so jax.devices() is global
    from .parallel.distributed import maybe_initialize

    maybe_initialize()
    from . import parse
    from .data.datasets import CSVRLEDataSet, DirectoryDataSet

    def _dataset(a):
        if getattr(a, "rle_csv", None):
            if a.masks:
                raise SystemExit(
                    "--masks and --rle-csv are mutually exclusive label "
                    "sources — pass one")
            return CSVRLEDataSet(a.images, a.rle_csv)
        if not a.masks:
            raise SystemExit("need --masks or --rle-csv")
        return DirectoryDataSet(a.images, a.masks)

    cfg = parse(args.config)
    if args.cmd == "fit":
        ds = _dataset(args)
        res = cfg.fit(ds, foldsToExecute=args.folds,
                      start_from_stage=args.start_stage)
        print(json.dumps(res, indent=2, default=str))
    elif args.cmd == "predict":
        n = cfg.predict_all_to_dir(args.src, args.dst, folds=args.folds,
                                   stage=args.stage, threshold=args.threshold)
        print(f"wrote {n} masks to {args.dst}")
    elif args.cmd == "evaluate":
        ds = _dataset(args)
        res = cfg.evaluate(ds, folds=args.folds, stage=args.stage)
        print(json.dumps(res, indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
