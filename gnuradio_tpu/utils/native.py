"""ctypes binding to the native host runtime (cpp/grtpu_host.cc).

Auto-builds libgrtpu_host.so with `make` on first use (cached). The native
pieces are the host-side runtime around the XLA compute path — double-mapped
ring buffers and the threaded IQ file reader (see cpp/grtpu_host.cc header
comment for the reference-parity map). Everything degrades gracefully to
NumPy fallbacks if no C++ toolchain is available (`native_available()`).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import time

import numpy as np

_CPP_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "cpp")
_LIB_PATH = os.path.join(_CPP_DIR, "libgrtpu_host.so")

IQ_CI8, IQ_CI16, IQ_CF32 = 0, 1, 2

_lib = None
_tried = False


def _build() -> bool:
    try:
        r = subprocess.run(["make", "-C", _CPP_DIR, "-s"],
                           capture_output=True, timeout=120)
        return r.returncode == 0
    except Exception:
        return False


def load():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        src = os.path.join(_CPP_DIR, "grtpu_host.cc")
        if not os.path.exists(src) or not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.vmrb_create.restype = ctypes.c_void_p
    lib.vmrb_create.argtypes = [ctypes.c_size_t]
    lib.vmrb_destroy.argtypes = [ctypes.c_void_p]
    lib.vmrb_size.restype = ctypes.c_size_t
    lib.vmrb_size.argtypes = [ctypes.c_void_p]
    lib.vmrb_space_available.restype = ctypes.c_size_t
    lib.vmrb_space_available.argtypes = [ctypes.c_void_p]
    lib.vmrb_items_available.restype = ctypes.c_size_t
    lib.vmrb_items_available.argtypes = [ctypes.c_void_p]
    lib.vmrb_write_ptr.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.vmrb_write_ptr.argtypes = [ctypes.c_void_p]
    lib.vmrb_read_ptr.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.vmrb_read_ptr.argtypes = [ctypes.c_void_p]
    lib.vmrb_produce.argtypes = [ctypes.c_void_p, ctypes.c_size_t]
    lib.vmrb_consume.argtypes = [ctypes.c_void_p, ctypes.c_size_t]
    lib.vmrb_selftest.restype = ctypes.c_int
    lib.iqr_open.restype = ctypes.c_void_p
    lib.iqr_open.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_size_t,
                             ctypes.c_float, ctypes.c_size_t]
    lib.iqr_next.restype = ctypes.POINTER(ctypes.c_float)
    lib.iqr_next.argtypes = [ctypes.c_void_p]
    lib.iqr_release.argtypes = [ctypes.c_void_p]
    lib.iqr_finished.restype = ctypes.c_int
    lib.iqr_finished.argtypes = [ctypes.c_void_p]
    lib.iqr_close.argtypes = [ctypes.c_void_p]
    lib.udprx_start.restype = ctypes.c_void_p
    lib.udprx_start.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                ctypes.c_size_t]
    lib.udprx_available.restype = ctypes.c_size_t
    lib.udprx_available.argtypes = [ctypes.c_void_p]
    lib.udprx_read.restype = ctypes.c_size_t
    lib.udprx_read.argtypes = [ctypes.c_void_p,
                               ctypes.POINTER(ctypes.c_uint8),
                               ctypes.c_size_t]
    lib.udprx_dropped.restype = ctypes.c_uint64
    lib.udprx_dropped.argtypes = [ctypes.c_void_p]
    lib.udprx_stop.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return load() is not None


def selftest() -> int:
    lib = load()
    if lib is None:
        return -99
    return lib.vmrb_selftest()


class RingBuffer:
    """Python view of a native double-mapped ring buffer."""

    def __init__(self, min_size: int):
        self._lib = load()
        if self._lib is None:
            raise RuntimeError("native library unavailable")
        self._h = self._lib.vmrb_create(min_size)
        if not self._h:
            raise RuntimeError("vmrb_create failed")
        self.size = self._lib.vmrb_size(self._h)

    def write(self, data: bytes) -> int:
        n = min(len(data), self._lib.vmrb_space_available(self._h))
        if n:
            ptr = self._lib.vmrb_write_ptr(self._h)
            ctypes.memmove(ptr, data[:n], n)
            self._lib.vmrb_produce(self._h, n)
        return n

    def read(self, n: int) -> bytes:
        n = min(n, self._lib.vmrb_items_available(self._h))
        if not n:
            return b""
        ptr = self._lib.vmrb_read_ptr(self._h)
        out = ctypes.string_at(ptr, n)
        self._lib.vmrb_consume(self._h, n)
        return out

    def available(self) -> int:
        return self._lib.vmrb_items_available(self._h)

    def close(self):
        if self._h:
            self._lib.vmrb_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class IQFileReader:
    """Background-threaded IQ file reader yielding float32 plane chunks
    shaped [2, chunk_items] (re, im) — the runtime's host-encode layout."""

    def __init__(self, path: str, fmt: int = IQ_CF32, chunk_items: int = 1 << 18,
                 scale: float = 1.0, ring_chunks: int = 4):
        self._lib = load()
        if self._lib is None:
            raise RuntimeError("native library unavailable")
        self.chunk_items = chunk_items
        self._h = self._lib.iqr_open(path.encode(), fmt, chunk_items,
                                     scale, ring_chunks)
        if not self._h:
            raise RuntimeError(f"cannot open {path}")

    def __iter__(self):
        n = self.chunk_items
        while True:
            ptr = self._lib.iqr_next(self._h)
            addr = ctypes.cast(ptr, ctypes.c_void_p).value
            if addr is None or addr == 0:
                return
            if addr == ctypes.c_void_p(-1).value:
                time.sleep(0.0005)
                continue
            arr = np.ctypeslib.as_array(ptr, shape=(2, n)).copy()
            self._lib.iqr_release(self._h)
            yield arr

    def close(self):
        if self._h:
            self._lib.iqr_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class UdpReceiver:
    """Native threaded UDP receiver: datagrams drain into a double-mapped
    ring off the GIL (gr-network udp_source native analog); read() slices
    fixed chunks for the host runner / device_put."""

    def __init__(self, port: int, bind_addr: str = "127.0.0.1",
                 ring_bytes: int = 1 << 22):
        self._lib = load()
        if self._lib is None:
            raise RuntimeError("native library unavailable")
        self._h = self._lib.udprx_start(bind_addr.encode(), int(port),
                                        int(ring_bytes))
        if not self._h:
            raise RuntimeError(f"udprx_start failed on {bind_addr}:{port}")

    def available(self) -> int:
        return self._lib.udprx_available(self._h)

    def read(self, n: int) -> bytes:
        buf = (ctypes.c_uint8 * n)()
        got = self._lib.udprx_read(self._h, buf, n)
        return bytes(buf[:got])

    def dropped(self) -> int:
        return int(self._lib.udprx_dropped(self._h))

    def close(self):
        if self._h:
            self._lib.udprx_stop(self._h)
            self._h = None
