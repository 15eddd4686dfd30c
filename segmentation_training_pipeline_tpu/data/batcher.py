"""Host-side batch assembly + device prefetch.

The reference's generator hot loop (SURVEY.md §3.5: imread → cv2.resize →
imgaug in worker processes → float cast) is the classic input bottleneck.
TPU-native split of responsibilities:

  host   : decode + resize to the static config shape + stack **uint8**
           (4x smaller on the PCIe/ICI wire than float32)
  device : augmentation + normalize + one-hot — fused XLA/Pallas ops inside
           the jitted step (see ops/aug/)

Batches are produced by a background thread into a bounded queue and
``jax.device_put`` with the mesh sharding — double-buffered so the host
stays ahead of the device (reference's `fit_generator` workers, re-done
without pickling processes).
"""

from __future__ import annotations

import queue
import threading
import time
from typing import Dict, Iterator, Optional, Sequence

import numpy as np

from .datasets import DataSet


def prepare_image(x: np.ndarray, shape) -> np.ndarray:
    """HWC uint8 at the config shape (resize on host via cv2)."""
    import cv2

    h, w, c = shape
    if x.ndim == 2:
        x = x[:, :, None]
    if x.shape[-1] == 1 and c == 3:
        x = np.repeat(x, 3, axis=-1)
    elif x.shape[-1] == 3 and c == 1:
        x = x.mean(axis=-1, keepdims=True)
    if x.shape[:2] != (h, w):
        x = cv2.resize(x, (w, h), interpolation=cv2.INTER_LINEAR)
        if x.ndim == 2:
            x = x[:, :, None]
    if x.dtype != np.uint8:
        x = np.clip(x, 0, 255).astype(np.uint8) if x.max() > 1.5 else (
            np.clip(x, 0, 1) * 255
        ).astype(np.uint8)
    return x


def prepare_mask(y: Optional[np.ndarray], shape, classes: int,
                 activation: str) -> np.ndarray:
    """HW[C] mask → (H, W, classes) float32 in {0, 1}.

    Accepts binary {0,1}/{0,255} masks, per-class channel stacks, or
    integer class-index maps (softmax mode).  Nearest-neighbor resize keeps
    labels crisp (imgaug's segmentation-map convention).
    """
    import cv2

    h, w, _ = shape
    if y is None:
        return np.zeros((h, w, classes), np.float32)
    y = np.asarray(y)
    if y.ndim == 3 and y.shape[-1] == 1:
        y = y[:, :, 0]
    if y.ndim == 2:
        if y.shape != (h, w):
            y = cv2.resize(y, (w, h), interpolation=cv2.INTER_NEAREST)
        if activation == "softmax" and classes > 1:
            idx = y.astype(np.int64)
            if idx.max() > classes - 1 and idx.max() > 1:  # {0,255} binary
                idx = (idx > 127).astype(np.int64)
            out = np.zeros((h, w, classes), np.float32)
            np.put_along_axis(out, idx[:, :, None], 1.0, axis=-1)
            return out
        m = (y > 127) if y.max() > 1.5 else (y > 0.5)
        return np.repeat(m[:, :, None].astype(np.float32), classes, axis=-1) \
            if classes > 1 else m[:, :, None].astype(np.float32)
    # channel-stacked per-class masks
    if y.shape[:2] != (h, w):
        y = cv2.resize(y.astype(np.float32), (w, h),
                       interpolation=cv2.INTER_NEAREST)
        if y.ndim == 2:
            y = y[:, :, None]
    if y.shape[-1] != classes:
        raise ValueError(f"mask has {y.shape[-1]} channels, config classes={classes}")
    return (y > (127 if y.max() > 1.5 else 0.5)).astype(np.float32)


def _masks_u8_to_onehot(masks_u8: np.ndarray, classes: int,
                        activation: str) -> np.ndarray:
    """(B, H, W) u8 decoded masks → (B, H, W, classes) uint8 {0,1}, matching
    prepare_mask's binary/{0,255}/class-index semantics (vectorized,
    PER-ITEM thresholds — a batch may mix {0,1} and {0,255} masks).

    uint8 on purpose: one-hot masks are {0,1}-valued, and the training step
    casts to float ON DEVICE — shipping f32 masks quadruples the host→device
    wire for nothing (PERF.md round 2)."""
    per_max = masks_u8.reshape(masks_u8.shape[0], -1).max(axis=1)
    if activation == "softmax" and classes > 1:
        idx = masks_u8.astype(np.int64)
        is_255 = (per_max > classes - 1) & (per_max > 1)
        idx = np.where(is_255[:, None, None],
                       (masks_u8 > 127).astype(np.int64), idx)
        out = np.zeros((*masks_u8.shape, classes), np.uint8)
        np.put_along_axis(out, idx[..., None], 1, axis=-1)
        return out
    m = np.where((per_max > 1.5)[:, None, None],
                 masks_u8 > 127, masks_u8 > 0)
    m = m[..., None].astype(np.uint8)
    return np.repeat(m, classes, axis=-1) if classes > 1 else m


def _paths_available(dataset, probe_idx: int) -> bool:
    """True iff the dataset really serves file paths (wrappers like
    SubDataSet define image_path unconditionally but their parent may
    not — probe instead of trusting hasattr)."""
    if not (hasattr(dataset, "image_path") and hasattr(dataset, "mask_path")):
        return False
    try:
        return dataset.image_path(probe_idx) is not None
    except Exception:
        return False


_NATIVE_LOADER = None


def _native_loader():
    global _NATIVE_LOADER
    if _NATIVE_LOADER is None:
        try:
            from ..native import NativeLoader

            _NATIVE_LOADER = NativeLoader()
        except Exception:
            _NATIVE_LOADER = False
    return _NATIVE_LOADER or None


def make_batches(dataset: DataSet, indices: Sequence[int], shape, classes: int,
                 activation: str, batch_size: int,
                 wrap_pad: bool = True,
                 cache: Optional[dict] = None,
                 stats: Optional[dict] = None) -> Iterator[Dict[str, np.ndarray]]:
    """Yield batches of stacked uint8 images + uint8 one-hot masks
    (the training/eval steps cast masks to float32 ON DEVICE; shipping f32
    quadruples the host->device wire).

    File-backed datasets (exposing ``image_path``/``mask_path``) decode
    through the native C++ thread-pool loader; anything else goes through
    the per-item Python path.  The final partial batch wraps around to the
    plan's start (deterministic) and reports weights so eval can discount
    the padding.

    ``stats`` (optional): a dict accumulating host-side timing —
    ``decode_s`` (wall seconds spent assembling batches, incl. decode +
    resize + stack), ``batches``, and ``native`` (whether the C++ loader
    served this plan).  Used by ``BENCH_MODE=pipeline`` to emit a
    diagnosable breakdown instead of a bare img/s number.

    ``cache`` (``cache: true`` in YAML): per-index dict of decoded
    ``(img_u8, mask_u8)`` items.  Image decode is the host bottleneck at
    512² (PNG inflate ~60 img/s vs ~290 img/s device step, PERF.md) — the
    cache makes every epoch after the first run at RAM speed.  ~1 MB/item
    at 512² binary; only enable when the dataset fits host memory.
    """
    idx = np.asarray(indices, dtype=np.int64)
    n = len(idx)
    if n == 0:
        return
    h, w, c = shape
    use_native = (c in (1, 3)  # the C++ decoder emits gray or BGR only
                  and _native_loader() is not None
                  and _paths_available(dataset, int(idx[0])))
    if stats is not None:
        stats["native"] = bool(use_native)
        stats.setdefault("decode_s", 0.0)
        stats.setdefault("batches", 0)
    for start in range(0, n, batch_size):
        _t0 = time.perf_counter() if stats is not None else 0.0
        sel = idx[start : start + batch_size]
        n_real = len(sel)
        if n_real < batch_size and wrap_pad:
            extra = idx[np.arange(batch_size - n_real) % n]
            sel = np.concatenate([sel, extra])
        if cache is not None and all(int(i) in cache for i in sel):
            imgs_arr = np.stack([cache[int(i)][0] for i in sel])
            masks_arr = np.stack([cache[int(i)][1] for i in sel])
        elif use_native:
            loader = _native_loader()
            ipaths = [dataset.image_path(int(i)) for i in sel]  # type: ignore[attr-defined]
            mpaths = [dataset.mask_path(int(i)) for i in sel]  # type: ignore[attr-defined]
            imgs_arr, masks_u8, fails = loader.load_batch(ipaths, mpaths, h, w, c)
            if fails:
                raise IOError(
                    f"native loader failed on {fails} of {len(sel)} files "
                    f"(first: {ipaths[0]})")
            masks_arr = _masks_u8_to_onehot(masks_u8, classes, activation)
        else:
            imgs, masks = [], []
            for i in sel:
                item = dataset[int(i)]
                imgs.append(prepare_image(item.x, shape))
                masks.append(prepare_mask(item.y, shape, classes,
                                          activation).astype(np.uint8))
            imgs_arr = np.stack(imgs)
            masks_arr = np.stack(masks)
        if cache is not None:
            for j in range(len(sel)):
                ii = int(sel[j])
                if ii not in cache:
                    cache[ii] = (imgs_arr[j], masks_arr[j])
        if stats is not None:
            stats["decode_s"] += time.perf_counter() - _t0
            stats["batches"] += 1
        yield {
            "image": imgs_arr,
            "mask": masks_arr,
            "weight": (np.arange(len(sel)) < n_real).astype(np.float32),
        }


class Prefetcher:
    """Background-thread batch producer + device transfer overlap."""

    def __init__(self, gen_fn, mesh=None, depth: int = 2):
        self.gen_fn = gen_fn
        self.mesh = mesh
        self.depth = max(1, depth)

    def __iter__(self):
        q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        _SENTINEL = object()
        err = []

        def worker():
            try:
                for batch in self.gen_fn():
                    if self.mesh is not None:
                        from ..parallel.mesh import shard_batch

                        batch = shard_batch(batch, self.mesh)
                    q.put(batch)
            except BaseException as e:  # surface worker errors to consumer
                err.append(e)
            finally:
                q.put(_SENTINEL)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _SENTINEL:
                if err:
                    raise err[0]
                return
            yield item
