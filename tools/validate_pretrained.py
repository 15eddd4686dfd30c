"""First-contact validation harness for REAL pretrained checkpoints.

VERDICT r3 item 4 / SURVEY §7 hard part 1: every converter in this repo
was golden-tested against reimplemented oracles, never against a genuine
checkpoint (no egress here).  The day real ``.pt``/``.h5``/``.npz`` files
appear, this tool turns first contact from a debugging week into a
checklist:

    python tools/validate_pretrained.py /path/to/checkpoints [--size 65]

It maps ``<backbone>.<ext>`` filenames to registered backbones, runs each
file through the public ``load_encoder_weights`` path (the exact code a
``encoder_weights:`` config key runs), forwards a fixed deterministic
image, and prints one PASS/FAIL line per file with activation statistics.

FAIL conditions beyond converter exceptions:
  * any non-finite tap value (garbage-in silently-converted weights blow
    up within a few layers);
  * a tap with ~zero variance (dead graph — weights never reached it);
  * unconverted leaves: the loaded tree must differ from random init in
    (almost) every leaf.

Exit code = number of failures, so CI can gate on a checkpoint directory.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

_EXTS = (".pt", ".pth", ".h5", ".hdf5", ".npz")


def _force_cpu():
    os.environ.setdefault("XLA_FLAGS", "")
    import jax

    jax.config.update("jax_platforms", "cpu")


def _fixed_image(size: int) -> np.ndarray:
    """Deterministic, structured probe input (gradients + a disc) — a
    constant image would hide channel-mixing bugs."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    r = ((yy - 0.5) ** 2 + (xx - 0.5) ** 2) < 0.1
    img = np.stack([yy, xx, r.astype(np.float32)], axis=-1)
    return img[None] * 255.0


def validate_file(path: str, backbone: str, size: int = 65,
                  min_changed: float = 0.95):
    """Returns (ok: bool, detail: str) — pure function for tests."""
    import jax
    import jax.numpy as jnp

    from segmentation_training_pipeline_tpu.models.encoders import (
        build_encoder, known_backbones)
    from segmentation_training_pipeline_tpu.models.pretrained import (
        load_encoder_weights)

    if backbone not in known_backbones():
        return False, f"unknown backbone {backbone!r}"

    enc_kw = {}
    if backbone in ("resnet18", "resnet34", "resnet50", "resnet101",
                    "resnet152", "seresnet18", "seresnet34") and \
            path.endswith((".h5", ".hdf5")):
        # reference-era .h5 ⇒ the preact graph (what the factory builds)
        from segmentation_training_pipeline_tpu.models.encoders import (
            encoder_spec)
        from segmentation_training_pipeline_tpu.models.encoders.resnet import (
            PreactResNetEncoder)

        _, kw = encoder_spec(backbone)
        enc = PreactResNetEncoder(
            stage_sizes=kw["stage_sizes"],
            bottleneck=kw.get("bottleneck", False),
            se=backbone.startswith("seresnet"), dtype=jnp.float32)
    else:
        enc = build_encoder(backbone, dtype=jnp.float32, **enc_kw)

    x = jnp.asarray(_fixed_image(size) / 127.5 - 1.0, jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), x, train=False)
    wrapped = {"params": {"encoder": variables["params"]},
               "batch_stats": {"encoder": variables.get("batch_stats", {})}}
    out = load_encoder_weights(backbone, path, wrapped)
    if out is None:
        return False, "loader returned None (path did not resolve)"

    # leaf-change audit: converted tree must differ from init
    before = jax.tree.leaves(variables["params"])
    after = jax.tree.leaves(out["params"]["encoder"])
    changed = sum(not np.array_equal(np.asarray(a), np.asarray(b))
                  for a, b in zip(before, after))
    frac = changed / max(1, len(before))
    if frac < min_changed:
        return False, (f"only {changed}/{len(before)} param leaves changed "
                       "— converter silently skipped most of the tree")

    taps = enc.apply({"params": out["params"]["encoder"],
                      "batch_stats": out["batch_stats"]["encoder"]},
                     x, train=False)
    stats = []
    for i, t in enumerate(taps):
        t = np.asarray(t)
        if not np.all(np.isfinite(t)):
            return False, f"tap C{i + 1} has non-finite values"
        std = float(t.std())
        if std < 1e-6:
            return False, f"tap C{i + 1} is constant (std={std:.2e})"
        if abs(float(t.mean())) > 1e3 or std > 1e4:
            return False, (f"tap C{i + 1} exploded "
                           f"(mean={t.mean():.3g}, std={std:.3g})")
        stats.append(f"C{i + 1}:μ={t.mean():+.2f},σ={std:.2f}")
    return True, f"leaves={changed}/{len(before)} " + " ".join(stats)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("directory", help="directory of <backbone>.<ext> files")
    ap.add_argument("--size", type=int, default=65,
                    help="probe image side (odd keeps SAME==symmetric)")
    ap.add_argument("--only", default=None,
                    help="comma-separated backbone filter")
    ap.add_argument("--tpu", action="store_true",
                    help="run on the default (TPU) backend instead of CPU")
    args = ap.parse_args(argv)
    if not args.tpu:
        _force_cpu()

    only = set(args.only.split(",")) if args.only else None
    files = sorted(
        f for f in os.listdir(args.directory)
        if f.endswith(_EXTS) and not f.startswith("."))
    if not files:
        print(f"no checkpoint files (*{'|'.join(_EXTS)}) in "
              f"{args.directory}")
        return 1
    fails = 0
    for fname in files:
        backbone = fname.rsplit(".", 1)[0]
        if only and backbone not in only:
            continue
        path = os.path.join(args.directory, fname)
        try:
            ok, detail = validate_file(path, backbone, size=args.size)
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            ok, detail = False, f"{type(e).__name__}: {e}"
        print(f"{'PASS' if ok else 'FAIL'} {backbone:<20} {detail}")
        fails += 0 if ok else 1
    return fails


if __name__ == "__main__":
    sys.exit(main())
