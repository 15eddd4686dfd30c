"""Compile + load the native loader shared library.

One-shot g++ build into the package directory (cached by mtime); no build
system needed for a single translation unit.  Thread-safe and idempotent.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "loader.cc")
_SO = os.path.join(os.path.dirname(__file__), "libstploader.so")

_OPENCV_INC = "/usr/include/opencv4"
_LINK = ["-lopencv_core", "-lopencv_imgcodecs", "-lopencv_imgproc"]


def _build() -> bool:
    if (os.path.exists(_SO)
            and os.path.getmtime(_SO) >= os.path.getmtime(_SRC)):
        return True
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
           f"-I{_OPENCV_INC}", _SRC, "-o", _SO + ".tmp", *_LINK, "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(_SO + ".tmp", _SO)
        return True
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired,
            FileNotFoundError, OSError):
        return False


def load_native_library() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.stp_loader_create.restype = ctypes.c_void_p
        lib.stp_loader_create.argtypes = [ctypes.c_int]
        lib.stp_loader_destroy.argtypes = [ctypes.c_void_p]
        lib.stp_load_batch.restype = ctypes.c_int
        lib.stp_load_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_ubyte), ctypes.POINTER(ctypes.c_ubyte),
        ]
        _LIB = lib
        return _LIB


def native_available() -> bool:
    return load_native_library() is not None
