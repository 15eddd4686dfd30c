"""Native (C++) host runtime: parallel decode+resize loader.

Built on demand with g++ against the system OpenCV; consumed via ctypes
(this image has no pybind11).  Falls back cleanly to the Python cv2 path
when the toolchain or OpenCV dev libraries are absent.
"""

from .build import load_native_library, native_available
from .loader import NativeLoader
