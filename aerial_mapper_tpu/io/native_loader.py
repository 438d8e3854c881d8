"""ctypes binding for the native prefetching image loader.

``native/image_loader.cc`` decodes a whole image sequence with a pthread
pool (JPEG via libjpeg, PNG via libpng, binary PNM) ahead of consumption —
the runtime counterpart of the reference's synchronous per-image
``cv::imread`` loop (aerial-mapper-io.cc:207-249). PNG/PNM gray decodes are
bit-identical to the PIL fallback (same integer BT.601 luma); JPEG may
differ by ~1 gray level between decoders (tests/test_io.py pins both).

Auto-builds ``native/libamloader.so`` on first use; callers fall back to
PIL when no compiler/library is available (``native_loader_available()``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libamloader.so")

_lib = None
_lib_failed = False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            _lib_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        _lib_failed = True
        return None
    lib.am_loader_create.restype = ctypes.c_void_p
    lib.am_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_long, ctypes.c_int,
        ctypes.c_int,
    ]
    lib.am_loader_wait.restype = ctypes.c_int
    lib.am_loader_wait.argtypes = [
        ctypes.c_void_p, ctypes.c_long,
        ctypes.POINTER(ctypes.c_long), ctypes.POINTER(ctypes.c_long),
    ]
    lib.am_loader_copy.restype = ctypes.c_int
    lib.am_loader_copy.argtypes = [
        ctypes.c_void_p, ctypes.c_long, ctypes.POINTER(ctypes.c_float),
    ]
    lib.am_loader_release.argtypes = [ctypes.c_void_p, ctypes.c_long]
    lib.am_loader_destroy.argtypes = [ctypes.c_void_p]
    _lib = lib
    return _lib


def native_loader_available() -> bool:
    return _load_lib() is not None


_ERRORS = {-1: "cannot open", -2: "corrupt image", -3: "unsupported format",
           -4: "index out of range", -5: "not decoded"}


class NativeImageLoader:
    """Prefetching sequence loader; decode threads run ahead of `get`.

    Usage::

        with NativeImageLoader(paths, color=False) as ld:
            for i in range(len(paths)):
                img = ld.get(i)          # blocks only if not yet decoded
    """

    def __init__(self, paths: Sequence[str], color: bool = False,
                 num_threads: int = 0):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native image loader unavailable")
        self._lib = lib
        self._paths = [os.fspath(p) for p in paths]
        self._color = bool(color)
        arr = (ctypes.c_char_p * len(self._paths))(
            *[p.encode() for p in self._paths]
        )
        self._handle = lib.am_loader_create(
            arr, len(self._paths), int(self._color), int(num_threads or 0)
        )
        if not self._handle:
            raise RuntimeError("am_loader_create failed")

    def __len__(self) -> int:
        return len(self._paths)

    def get(self, i: int, release: bool = False) -> np.ndarray:
        """Decoded image i as float32 [H, W] or [H, W, 3] in [0, 255]."""
        h = ctypes.c_long()
        w = ctypes.c_long()
        rc = self._lib.am_loader_wait(self._handle, i,
                                      ctypes.byref(h), ctypes.byref(w))
        if rc != 0:
            raise IOError(
                f"{_ERRORS.get(rc, rc)}: {self._paths[i]}"
            )
        shape = (h.value, w.value, 3) if self._color else (h.value, w.value)
        out = np.empty(shape, np.float32)
        rc = self._lib.am_loader_copy(
            self._handle, i, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
        )
        if rc != 0:
            raise IOError(f"{_ERRORS.get(rc, rc)}: {self._paths[i]}")
        if release:
            self._lib.am_loader_release(self._handle, i)
        return out

    def close(self) -> None:
        if getattr(self, "_handle", None):
            self._lib.am_loader_destroy(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def load_images_native(paths: Sequence[str], color: bool = False,
                       num_threads: int = 0) -> List[np.ndarray]:
    """Decode all ``paths`` with the thread pool; list of float32 arrays."""
    with NativeImageLoader(paths, color=color, num_threads=num_threads) as ld:
        return [ld.get(i, release=True) for i in range(len(paths))]
