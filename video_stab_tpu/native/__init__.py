"""ctypes bindings for the native host-IO library (libvstab_host.so).

Provides FrameRing (lock-free SPSC frame transport), PacingClock, and a C++
TcpReceiver — the performance-critical host plumbing the reference gets from
GStreamer/pthreads (see frame_ring.cpp header for the file:line map).

The library is built on first use (``make`` in this directory); every
consumer has a pure-Python fallback, so a missing toolchain degrades
gracefully (``available()`` -> False).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libvstab_host.so")
_lib = None
_load_failed = False     # cache a failed build: without it every
                         # available() probe on a toolchain-less host would
                         # re-spawn `make` with its 120 s timeout
_lock = threading.Lock()


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _DIR, "-s"], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load():
    global _lib, _load_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _load_failed:
            return None
        if not os.path.exists(_LIB_PATH) and not _build():
            _load_failed = True
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        lib.vstab_ring_create.restype = ctypes.c_void_p
        lib.vstab_ring_create.argtypes = [ctypes.c_size_t, ctypes.c_size_t]
        lib.vstab_ring_destroy.argtypes = [ctypes.c_void_p]
        lib.vstab_ring_push.restype = ctypes.c_int
        lib.vstab_ring_push.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                        ctypes.c_int64]
        lib.vstab_ring_pop.restype = ctypes.c_int
        lib.vstab_ring_pop.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                       ctypes.POINTER(ctypes.c_int64),
                                       ctypes.c_int]
        lib.vstab_ring_size.restype = ctypes.c_size_t
        lib.vstab_ring_size.argtypes = [ctypes.c_void_p]
        lib.vstab_ring_pushed.restype = ctypes.c_uint64
        lib.vstab_ring_pushed.argtypes = [ctypes.c_void_p]
        lib.vstab_ring_dropped.restype = ctypes.c_uint64
        lib.vstab_ring_dropped.argtypes = [ctypes.c_void_p]
        lib.vstab_pace_create.restype = ctypes.c_void_p
        lib.vstab_pace_create.argtypes = [ctypes.c_double]
        lib.vstab_pace_destroy.argtypes = [ctypes.c_void_p]
        lib.vstab_pace_wait.restype = ctypes.c_int64
        lib.vstab_pace_wait.argtypes = [ctypes.c_void_p]
        lib.vstab_tcp_create.restype = ctypes.c_void_p
        lib.vstab_tcp_create.argtypes = [ctypes.c_int]
        lib.vstab_tcp_destroy.argtypes = [ctypes.c_void_p]
        lib.vstab_tcp_try_get_latest.restype = ctypes.c_int
        lib.vstab_tcp_try_get_latest.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int)]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


class FrameRing:
    """Lock-free SPSC frame transport over one preallocated native slab."""

    def __init__(self, frame_shape: Tuple[int, ...], capacity: int = 8,
                 dtype=np.uint8):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self.frame_shape = tuple(frame_shape)
        self.dtype = np.dtype(dtype)
        self.frame_bytes = int(np.prod(frame_shape)) * self.dtype.itemsize
        self._h = lib.vstab_ring_create(self.frame_bytes, capacity)

    def push(self, frame: np.ndarray, stamp: int = 0) -> bool:
        """Returns False when an old frame was dropped to make room."""
        buf = np.ascontiguousarray(frame, dtype=self.dtype)
        assert buf.nbytes == self.frame_bytes, (buf.shape, self.frame_shape)
        r = self._lib.vstab_ring_push(
            self._h, buf.ctypes.data_as(ctypes.c_char_p), stamp)
        return r == 1

    def pop(self, timeout_ms: int = 100
            ) -> Optional[Tuple[np.ndarray, int]]:
        out = np.empty(self.frame_shape, self.dtype)
        stamp = ctypes.c_int64(0)
        r = self._lib.vstab_ring_pop(
            self._h, out.ctypes.data_as(ctypes.c_char_p),
            ctypes.byref(stamp), timeout_ms)
        if r == 0:
            return None
        return out, int(stamp.value)

    def __len__(self) -> int:
        return int(self._lib.vstab_ring_size(self._h))

    @property
    def stats(self) -> dict:
        return {"pushed": int(self._lib.vstab_ring_pushed(self._h)),
                "dropped": int(self._lib.vstab_ring_dropped(self._h))}

    def close(self):
        if self._h:
            self._lib.vstab_ring_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class PacingClock:
    """Frame-rate pacing: wait() sleeps to the next frame deadline."""

    def __init__(self, fps: float):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._h = lib.vstab_pace_create(fps)

    def wait(self) -> int:
        """Returns lateness in microseconds (<=0 means on schedule)."""
        return int(self._lib.vstab_pace_wait(self._h))

    def close(self):
        if self._h:
            self._lib.vstab_pace_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeTcpReceiver:
    """C++ TcpReceiver (TcpReciever.cpp counterpart)."""

    def __init__(self, port: int):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library unavailable")
        self._lib = lib
        self._h = lib.vstab_tcp_create(port)
        if not self._h:
            raise OSError(f"cannot bind port {port}")

    def try_get_latest(self) -> Optional[Tuple[int, int]]:
        x = ctypes.c_int(0)
        y = ctypes.c_int(0)
        if self._lib.vstab_tcp_try_get_latest(self._h, ctypes.byref(x),
                                              ctypes.byref(y)):
            return int(x.value), int(y.value)
        return None

    def stop(self):
        if self._h:
            self._lib.vstab_tcp_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.stop()
        except Exception:
            pass


__all__ = ["available", "FrameRing", "PacingClock", "NativeTcpReceiver"]
