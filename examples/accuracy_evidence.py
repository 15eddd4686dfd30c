"""Accuracy evidence for the ±0.2 pt val-IoU north star (BASELINE.md).

Trains BASELINE acceptance configs 1 and 2 (scaled epochs) on the
deterministic synthetic shapes dataset (hundreds of images, occlusions,
texture — data/synthetic.py) and prints the per-epoch val-IoU curve plus
the final held-out evaluation.  Run on the TPU chip:

    python examples/accuracy_evidence.py --out /tmp/acc_run

Results are recorded in PERF.md ("Accuracy evidence" section).
"""

from __future__ import annotations

import argparse
import json
import os


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/stp_accuracy")
    p.add_argument("--n", type=int, default=400)
    p.add_argument("--epochs", type=int, default=25)
    p.add_argument("--config", choices=["1", "2", "both"], default="both")
    args = p.parse_args()

    import segmentation_training_pipeline_tpu as stp
    from segmentation_training_pipeline_tpu.data.synthetic import (
        generate_shapes_dataset)

    results = {}

    if args.config in ("1", "both"):
        # BASELINE config 1: Unet-resnet34 128², BCE(+dice), single fold
        d = os.path.join(args.out, "config1")
        os.makedirs(d, exist_ok=True)
        ds = generate_shapes_dataset(args.n, size=128, seed=7)
        cfg = stp.parse_dict(dict(
            architecture="Unet", backbone="resnet34", shape=[128, 128, 3],
            classes=1, activation="sigmoid",
            loss="binary_crossentropy + 0.25*dice_loss",
            optimizer="Adam", lr=1e-3, batch=16,
            metrics=["iou", "dice"], primary_metric="val_iou",
            folds_count=5, random_state=33,
            stages=[{"epochs": args.epochs}],
            callbacks={"ReduceLROnPlateau": {
                "monitor": "val_iou", "factor": 0.5, "patience": 4}},
        ), directory=d)
        cfg.fit(ds, foldsToExecute=[0], verbose=1)
        ev = cfg.evaluate(ds)  # full-pipeline eval (TTA off, original sizes)
        results["config1_unet_resnet34_128"] = ev
        print("config1 evaluate:", ev)

    if args.config in ("2", "both"):
        # BASELINE config 2: FPN-efficientnetb0 with the YAML aug block
        # (Fliplr / Affine rotate / elastic) on-device; 256² keeps the run
        # minutes-scale while exercising the 512-style aug path
        d = os.path.join(args.out, "config2")
        os.makedirs(d, exist_ok=True)
        ds = generate_shapes_dataset(args.n, size=256, seed=11)
        cfg = stp.parse_dict(dict(
            architecture="FPN", backbone="efficientnetb0",
            shape=[256, 256, 3], classes=1, activation="sigmoid",
            loss="binary_crossentropy + 0.25*dice_loss",
            optimizer="Adam", lr=1e-3, batch=16,
            metrics=["iou", "dice"], primary_metric="val_iou",
            folds_count=5, random_state=33,
            augmentation={
                "Fliplr": 0.5,
                "Affine": {"rotate": [-15, 15], "scale": [0.9, 1.1]},
                "ElasticTransformation": {"alpha": [0, 25], "sigma": 5},
            },
            stages=[{"epochs": args.epochs}],
            callbacks={"ReduceLROnPlateau": {
                "monitor": "val_iou", "factor": 0.5, "patience": 4}},
        ), directory=d)
        cfg.fit(ds, foldsToExecute=[0], verbose=1)
        ev = cfg.evaluate(ds)
        results["config2_fpn_efficientnetb0_256"] = ev
        print("config2 evaluate:", ev)

    out_json = os.path.join(args.out, "accuracy.json")
    with open(out_json, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))
    print(f"written to {out_json}")


if __name__ == "__main__":
    main()
