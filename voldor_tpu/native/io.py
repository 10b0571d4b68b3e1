"""ctypes bindings for the native flow loader (flow_loader.cpp).

Builds libvoldor_io.so with g++ on first use; falls back transparently to
the pure-Python .flo reader when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libvoldor_io.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _load_lib():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_SO):
            try:
                subprocess.run(
                    ["make", "-C", _DIR, "-s"], check=True, capture_output=True
                )
            except (subprocess.CalledProcessError, FileNotFoundError) as e:
                print(f"voldor_tpu.native: build failed ({e}); using Python IO")
                _build_failed = True
                return None
        lib = ctypes.CDLL(_SO)
        lib.vio_open.restype = ctypes.c_void_p
        lib.vio_open.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.vio_count.argtypes = [ctypes.c_void_p]
        lib.vio_dims.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.vio_get.argtypes = [
            ctypes.c_void_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_long,
        ]
        lib.vio_name.restype = ctypes.c_char_p
        lib.vio_name.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.vio_close.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


class NativeFlowDir:
    """Threaded read-ahead iterator over a directory of .flo files."""

    def __init__(self, path: str, n_prefetch: int = 16, n_threads: int = 2,
                 range=(0, 0)):
        self._lib = _load_lib()
        self._h = None
        self.path = path
        self.range = range
        if self._lib is not None:
            self._h = self._lib.vio_open(
                path.encode(), n_prefetch, n_threads, range[0], range[1]
            )
        if self._h:
            w = ctypes.c_int()
            hgt = ctypes.c_int()
            self._lib.vio_dims(self._h, ctypes.byref(w), ctypes.byref(hgt))
            self.w, self.h = w.value, hgt.value
            self.n = self._lib.vio_count(self._h)
            self.native = True
        else:
            # Python fallback
            from voldor_tpu.utils.flow_io import load_flow

            files = sorted(
                f for f in os.listdir(path) if f.endswith(".flo")
            )
            if range != (0, 0):
                files = files[range[0] : range[1]]
            self._files = [os.path.join(path, f) for f in files]
            self._load_flow = load_flow
            first = load_flow(self._files[0])
            self.h, self.w = first.shape[:2]
            self.n = len(self._files)
            self.native = False

    def __len__(self):
        return self.n

    def get(self, idx: int) -> np.ndarray:
        """(h, w, 2) float32 flow for frame idx (blocking)."""
        if self._h:
            out = np.empty((self.h, self.w, 2), np.float32)
            ok = self._lib.vio_get(
                self._h, idx,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out.size,
            )
            if not ok:
                raise IOError(f"native flow read failed for index {idx}")
            return out
        return self._load_flow(self._files[idx])

    def close(self):
        if self._h:
            self._lib.vio_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
