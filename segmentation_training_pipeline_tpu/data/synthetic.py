"""Deterministic synthetic segmentation datasets for accuracy evidence.

The reference's quickstarts train on Kaggle data (TGS salt) that cannot be
fetched here (no egress).  This generator produces a non-trivial stand-in:
textured backgrounds, multiple overlapping foreground shapes with their own
texture, brightness drift, and dark occluders that cross shapes WITHOUT
being part of the mask — hard enough that a model must learn local
texture/edge evidence (a constant-threshold oracle scores ~0.5 IoU; a
trained Unet should exceed 0.8), easy enough to converge in minutes.

Used by: tests/test_accuracy.py (val-IoU floor), examples/accuracy_*.yaml
(via ``python -m segmentation_training_pipeline_tpu.data.synthetic``),
and the PERF.md accuracy-evidence runs.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

from .datasets import LambdaDataSet


def _rot_grid(size: int, cy: float, cx: float, theta: float):
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    y, x = yy - cy, xx - cx
    c, s = np.cos(theta), np.sin(theta)
    return c * y + s * x, -s * y + c * x


def _textured_background(r: np.random.RandomState, size: int) -> np.ndarray:
    """Base brightness + low-frequency gradient + fine noise + channel cast."""
    base = r.uniform(40, 110)
    gy, gx = r.uniform(-30, 30, size=2)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    img = base + gy * yy + gx * xx + r.randn(size, size).astype(np.float32) * 8
    img = np.repeat(img[:, :, None], 3, axis=2)
    img += r.randn(1, 1, 3).astype(np.float32) * 6
    return img


def _maybe_occluder_bar(r: np.random.RandomState, size: int,
                        img: np.ndarray) -> np.ndarray:
    """With p=0.6, darken a bar crossing the frame; returns its bool mask
    (all-False when no bar) so callers can clear it from their labels."""
    if r.rand() < 0.6:
        cy, cx = r.uniform(0, size, size=2)
        theta = r.uniform(0, np.pi)
        ry, _ = _rot_grid(size, cy, cx, theta)
        bar = np.abs(ry) < r.uniform(0.015 * size, 0.05 * size)
        img[bar] *= r.uniform(0.25, 0.5)
        return bar
    return np.zeros((size, size), bool)


def _one_item(r: np.random.RandomState, size: int) -> Tuple[np.ndarray, np.ndarray]:
    img = _textured_background(r, size)
    mask = np.zeros((size, size), bool)
    for _ in range(r.randint(1, 4)):
        cy, cx = r.uniform(0.15 * size, 0.85 * size, size=2)
        a = r.uniform(0.08 * size, 0.28 * size)
        b = r.uniform(0.08 * size, 0.28 * size)
        theta = r.uniform(0, np.pi)
        ry, rx = _rot_grid(size, cy, cx, theta)
        if r.rand() < 0.5:
            inside = (ry / a) ** 2 + (rx / b) ** 2 < 1.0       # ellipse
        else:
            inside = (np.abs(ry) < a) & (np.abs(rx) < b)       # rectangle
        offset = r.uniform(45, 110) * (1 if r.rand() < 0.7 else -1)
        texture = r.randn(size, size).astype(np.float32) * r.uniform(4, 12)
        img[inside] += offset + texture[inside, None]
        mask |= inside

    # dark occluder bar crossing the frame — NOT in the mask
    mask &= ~_maybe_occluder_bar(r, size, img)

    img = np.clip(img, 0, 255).astype(np.uint8)
    return img, mask.astype(np.uint8)


def generate_shapes_dataset(n: int, size: int = 128, seed: int = 7,
                            p_empty: float = 0.0) -> LambdaDataSet:
    """→ in-memory LambdaDataSet of ``n`` (image, mask) pairs.

    ``p_empty``: probability of a background-only item (empty mask) — the
    negatives:/validation_negatives: sampling paths need real negatives to
    be meaningful (BASELINE config 4 evidence)."""
    r = np.random.RandomState(seed)
    xs, ys = [], []
    for _ in range(n):
        if p_empty > 0.0 and r.rand() < p_empty:
            x, y = _background_only(r, size)
        else:
            x, y = _one_item(r, size)
        xs.append(x)
        ys.append(y * 255)
    return LambdaDataSet(xs, ys, ids=[f"shape{i:04d}" for i in range(n)])


def _background_only(r: np.random.RandomState,
                     size: int) -> Tuple[np.ndarray, np.ndarray]:
    """A negative item: textured background (+ optional occluder bar), no
    foreground shapes, empty mask."""
    img = _textured_background(r, size)
    _maybe_occluder_bar(r, size, img)
    img = np.clip(img, 0, 255).astype(np.uint8)
    return img, np.zeros((size, size), np.uint8)


def _one_item_multiclass(r: np.random.RandomState,
                         size: int) -> Tuple[np.ndarray, np.ndarray]:
    """Class-index masks: 0 background, 1 ellipses, 2 rectangles (later
    shapes overwrite earlier — matching 'last drawn wins' semantics)."""
    img = _textured_background(r, size)
    mask = np.zeros((size, size), np.uint8)
    for _ in range(r.randint(2, 5)):
        cy, cx = r.uniform(0.15 * size, 0.85 * size, size=2)
        a = r.uniform(0.08 * size, 0.25 * size)
        b = r.uniform(0.08 * size, 0.25 * size)
        theta = r.uniform(0, np.pi)
        ry, rx = _rot_grid(size, cy, cx, theta)
        is_ellipse = r.rand() < 0.5
        if is_ellipse:
            inside = (ry / a) ** 2 + (rx / b) ** 2 < 1.0
        else:
            inside = (np.abs(ry) < a) & (np.abs(rx) < b)
        offset = r.uniform(45, 110) * (1 if r.rand() < 0.7 else -1)
        texture = r.randn(size, size).astype(np.float32) * r.uniform(4, 12)
        img[inside] += offset + texture[inside, None]
        mask[inside] = 1 if is_ellipse else 2

    mask[_maybe_occluder_bar(r, size, img)] = 0
    return np.clip(img, 0, 255).astype(np.uint8), mask


def generate_multiclass_shapes_dataset(n: int, size: int = 128,
                                       seed: int = 7) -> LambdaDataSet:
    """3-class (background/ellipse/rectangle) class-index dataset for the
    softmax + composite-loss + class-balancing path (BASELINE config 3)."""
    r = np.random.RandomState(seed)
    xs, ys = [], []
    for _ in range(n):
        x, y = _one_item_multiclass(r, size)
        xs.append(x)
        ys.append(y)
    return LambdaDataSet(xs, ys, ids=[f"mshape{i:04d}" for i in range(n)])


def write_shapes_dataset(out_dir: str, n: int, size: int = 128,
                         seed: int = 7) -> Tuple[str, str]:
    """Write PNGs to ``out_dir/images`` + ``out_dir/masks`` (exercises the
    file-backed path incl. the native C++ loader).  Returns the two dirs."""
    import cv2

    images_dir = os.path.join(out_dir, "images")
    masks_dir = os.path.join(out_dir, "masks")
    os.makedirs(images_dir, exist_ok=True)
    os.makedirs(masks_dir, exist_ok=True)
    r = np.random.RandomState(seed)
    for i in range(n):
        x, y = _one_item(r, size)
        cv2.imwrite(os.path.join(images_dir, f"shape{i:04d}.png"),
                    cv2.cvtColor(x, cv2.COLOR_RGB2BGR))
        cv2.imwrite(os.path.join(masks_dir, f"shape{i:04d}.png"), y * 255)
    return images_dir, masks_dir


def main(argv: Optional[list] = None) -> None:
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("out_dir")
    p.add_argument("--n", type=int, default=400)
    p.add_argument("--size", type=int, default=128)
    p.add_argument("--seed", type=int, default=7)
    a = p.parse_args(argv)
    images_dir, masks_dir = write_shapes_dataset(a.out_dir, a.n, a.size, a.seed)
    print(f"wrote {a.n} images to {images_dir} and masks to {masks_dir}")


if __name__ == "__main__":
    main()
