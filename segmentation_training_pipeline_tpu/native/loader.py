"""ctypes wrapper over the C++ thread-pool loader."""

from __future__ import annotations

import ctypes
from typing import List, Optional, Sequence

import numpy as np

from .build import load_native_library


class NativeLoader:
    """Parallel decode+resize of image/mask file batches into numpy
    buffers.  One persistent thread pool per instance."""

    def __init__(self, n_threads: int = 0):
        lib = load_native_library()
        if lib is None:
            raise RuntimeError(
                "native loader unavailable (g++/OpenCV missing?); "
                "use the Python path")
        self._lib = lib
        self._handle = lib.stp_loader_create(int(n_threads))

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.stp_loader_destroy(self._handle)
            self._handle = None

    def __del__(self):  # pragma: no cover - GC timing
        try:
            self.close()
        except Exception:
            pass

    def load_batch(self, img_paths: Sequence[str],
                   mask_paths: Optional[Sequence[Optional[str]]],
                   h: int, w: int, c: int = 3):
        """→ (images (N,H,W,C) u8, masks (N,H,W) u8 or None, n_failures)."""
        n = len(img_paths)
        imgs = np.empty((n, h, w, c), np.uint8)
        masks = np.empty((n, h, w), np.uint8) if mask_paths is not None else None

        ImgArr = ctypes.c_char_p * n
        img_arr = ImgArr(*[p.encode() for p in img_paths])
        if mask_paths is not None:
            mask_arr = ImgArr(*[
                (p.encode() if p else None) for p in mask_paths])
        else:
            mask_arr = None

        fails = self._lib.stp_load_batch(
            self._handle, img_arr, mask_arr, n, h, w, c,
            imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
            masks.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))
            if masks is not None else None,
        )
        return imgs, masks, int(fails)
