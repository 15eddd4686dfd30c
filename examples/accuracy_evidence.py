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
    p.add_argument("--config", choices=["1", "2", "3", "4", "both", "all"],
                   default="both")
    args = p.parse_args()

    import segmentation_training_pipeline_tpu as stp
    from segmentation_training_pipeline_tpu.data.synthetic import (
        generate_multiclass_shapes_dataset, generate_shapes_dataset)

    results = {}

    def _want(c: str) -> bool:
        if args.config == "all":
            return True
        if args.config == "both":
            return c in ("1", "2")
        return args.config == c

    if _want("1"):
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

    if _want("2"):
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

    if _want("3"):
        # BASELINE config 3: PSPNet multiclass (softmax, 3 classes) with a
        # composite dice+focal loss and class balancing
        d = os.path.join(args.out, "config3")
        os.makedirs(d, exist_ok=True)
        ds = generate_multiclass_shapes_dataset(args.n, size=128, seed=13)
        cfg = stp.parse_dict(dict(
            architecture="PSPNet", backbone="resnet34",
            shape=[128, 128, 3], classes=3, activation="softmax",
            loss="categorical_crossentropy + 0.5*categorical_focal_loss",
            class_weights=[0.3, 1.0, 1.0],
            optimizer="Adam", lr=1e-3, batch=16,
            metrics=["iou", "dice"], primary_metric="val_iou",
            folds_count=5, random_state=33,
            stages=[{"epochs": args.epochs}],
            callbacks={"ReduceLROnPlateau": {
                "monitor": "val_iou", "factor": 0.5, "patience": 4}},
        ), directory=d)
        cfg.fit(ds, foldsToExecute=[0], verbose=1)
        ev = cfg.evaluate(ds)
        results["config3_pspnet_resnet34_multiclass_128"] = ev
        print("config3 evaluate:", ev)

    if _want("4"):
        # BASELINE config 4: 5-fold, multi-stage freeze -> unfreeze with an
        # LR drop and negatives=real sampling (25% empty-mask items)
        d = os.path.join(args.out, "config4")
        os.makedirs(d, exist_ok=True)
        ds = generate_shapes_dataset(args.n, size=128, seed=17,
                                     p_empty=0.25)
        e1 = max(2, args.epochs // 4)
        e2 = max(4, args.epochs - e1)
        cfg = stp.parse_dict(dict(
            architecture="Unet", backbone="resnet34",
            shape=[128, 128, 3], classes=1, activation="sigmoid",
            loss="binary_crossentropy + 0.25*dice_loss",
            optimizer="Adam", lr=1e-3, batch=16,
            metrics=["iou", "dice"], primary_metric="val_iou",
            folds_count=5, random_state=33,
            negatives="real", validation_negatives="real",
            stages=[{"epochs": e1, "freeze_encoder": True},
                    {"epochs": e2, "unfreeze_encoder": True,
                     "lr": 3e-4}],
        ), directory=d)
        cfg.fit(ds, foldsToExecute=[0, 1], verbose=1)
        ev = cfg.evaluate(ds, folds=[0, 1])
        results["config4_unet_resnet34_5fold_stages_negatives"] = ev
        print("config4 evaluate:", ev)

    out_json = os.path.join(args.out, "accuracy.json")
    with open(out_json, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))
    print(f"written to {out_json}")


if __name__ == "__main__":
    main()
