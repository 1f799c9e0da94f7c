"""ctypes loader for the native realtime FIFO (rtfifo.cpp).

Same build pattern as the codec: compiled on first use with g++, cached
next to the source; ``available()`` is False when no compiler exists and
the Python FIFO bridge (io/callback.py) takes over.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import time

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "rtfifo.cpp")
_SO = os.path.join(_DIR, f"_rtfifo_{sys.platform}.so")

_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            subprocess.run(
                ["g++", "-O3", "-fPIC", "-shared", "-std=c++17",
                 "-o", _SO + ".tmp", _SRC],
                check=True, capture_output=True)
            os.replace(_SO + ".tmp", _SO)
        lib = ctypes.CDLL(_SO)
    except (OSError, subprocess.CalledProcessError):
        return None
    c = ctypes
    lib.bf_ring_create.restype = c.c_void_p
    lib.bf_ring_create.argtypes = [c.c_size_t]
    lib.bf_ring_destroy.argtypes = [c.c_void_p]
    lib.bf_ring_used.restype = c.c_uint64
    lib.bf_ring_used.argtypes = [c.c_void_p]
    lib.bf_ring_write.restype = c.c_uint64
    lib.bf_ring_write.argtypes = [c.c_void_p, c.c_void_p, c.c_uint64]
    lib.bf_ring_read.restype = c.c_uint64
    lib.bf_ring_read.argtypes = [c.c_void_p, c.c_void_p, c.c_uint64]
    lib.bf_jack_ctx_create.restype = c.c_void_p
    lib.bf_jack_ctx_create.argtypes = [c.c_void_p, c.c_int, c.c_int,
                                       c.POINTER(c.c_void_p), c.c_void_p]
    lib.bf_jack_ctx_destroy.argtypes = [c.c_void_p]
    lib.bf_jack_ctx_stop.argtypes = [c.c_void_p]
    lib.bf_jack_ctx_xruns.restype = c.c_uint64
    lib.bf_jack_ctx_xruns.argtypes = [c.c_void_p]
    # bf_jack_process stays untyped: its address is handed to JACK
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def lib():
    return _load()


class NativeRing:
    """Engine-side (non-realtime) view of one SPSC ring.

    The realtime end runs in C (bf_jack_process); this end polls with
    short sleeps — the engine threads are allowed to block.
    """

    def __init__(self, capacity: int):
        l = _load()
        self._lib = l
        self._ring = l.bf_ring_create(capacity)
        if not self._ring:
            raise MemoryError("rtfifo ring allocation failed")
        self.capacity = capacity
        self._closed = False

    @property
    def handle(self) -> int:
        return self._ring

    def used(self) -> int:
        return int(self._lib.bf_ring_used(self._ring))

    def close(self) -> None:
        self._closed = True

    def destroy(self) -> None:
        """Free the C ring. Only safe when no other thread can still be
        inside read_blocking/write_blocking or the C callback — device
        close() paths therefore only ``close()`` and leave the free to
        the GC finalizer (refcount 0 implies no such thread exists)."""
        self._closed = True
        ring, self._ring = self._ring, None
        if ring:
            self._lib.bf_ring_destroy(ring)

    def __del__(self):  # pragma: no cover - GC timing
        try:
            self.destroy()
        except Exception:
            pass

    def read_blocking(self, nbytes: int, poll_s: float = 0.0005) -> bytes:
        """Block until nbytes are available (or closed -> short read)."""
        out = bytearray(nbytes)
        view = (ctypes.c_char * nbytes).from_buffer(out)
        got = 0
        while got < nbytes:
            ring = self._ring
            if ring is None:
                return bytes(out[:got])
            n = int(self._lib.bf_ring_read(
                ring, ctypes.byref(view, got), nbytes - got))
            got += n
            if got < nbytes:
                if self._closed:
                    return bytes(out[:got])
                time.sleep(poll_s)
        return bytes(out)

    def write_blocking(self, data: bytes, poll_s: float = 0.0005) -> int:
        data = bytes(data)
        buf = (ctypes.c_char * len(data)).from_buffer_copy(data)
        sent = 0
        while sent < len(data):
            ring = self._ring
            if ring is None:
                return sent
            n = int(self._lib.bf_ring_write(
                ring, ctypes.byref(buf, sent), len(data) - sent))
            sent += n
            if sent < len(data):
                if self._closed:
                    return sent
                time.sleep(poll_s)
        return sent
