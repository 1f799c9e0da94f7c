"""Native realtime FIFO + pure-C JACK process callback (rtfifo.cpp)."""

import ctypes
import threading

import numpy as np
import pytest

from brutefir_tpu.core.native import rtfifo

pytestmark = pytest.mark.skipif(not rtfifo.available(),
                                reason="no native toolchain")


def test_ring_wraparound_and_partials():
    r = rtfifo.NativeRing(16)
    lib = rtfifo.lib()
    assert r.used() == 0
    n = lib.bf_ring_write(ctypes.c_void_p(r.handle), b"abcdefghij", 10)
    assert n == 10 and r.used() == 10
    buf = ctypes.create_string_buffer(6)
    n = lib.bf_ring_read(ctypes.c_void_p(r.handle), buf, 6)
    assert n == 6 and buf.raw == b"abcdef"
    # wrap across the end of the 16-byte buffer
    n = lib.bf_ring_write(ctypes.c_void_p(r.handle), b"0123456789XY", 12)
    assert n == 12 and r.used() == 16
    # full: further writes take nothing
    assert lib.bf_ring_write(ctypes.c_void_p(r.handle), b"zz", 2) == 0
    buf = ctypes.create_string_buffer(16)
    n = lib.bf_ring_read(ctypes.c_void_p(r.handle), buf, 16)
    assert n == 16 and buf.raw == b"ghij0123456789XY"
    r.destroy()


GET_BUF = ctypes.CFUNCTYPE(ctypes.c_void_p, ctypes.c_void_p,
                           ctypes.c_uint32)


class FakeJack:
    """Stands in for the JACK server: owns planar port buffers and calls
    bf_jack_process exactly like the realtime thread would."""

    def __init__(self, n_ports, nframes):
        self.bufs = [np.zeros(nframes, np.float32) for _ in range(n_ports)]
        self.nframes = nframes

        def get_buffer(port, _n):
            return self.bufs[int(port) - 1].ctypes.data

        self._cb = GET_BUF(get_buffer)
        self.ports = (ctypes.c_void_p * n_ports)(
            *[ctypes.c_void_p(i + 1) for i in range(n_ports)])

    def ctx(self, io, ring):
        lib = rtfifo.lib()
        return lib.bf_jack_ctx_create(
            ctypes.cast(self._cb, ctypes.c_void_p), io, len(self.ports),
            self.ports, ctypes.c_void_p(ring.handle))

    def process(self, ctx):
        rtfifo.lib().bf_jack_process(ctypes.c_uint32(self.nframes),
                                     ctypes.c_void_p(ctx))


def test_capture_interleaves_and_counts_overruns():
    P, n = 2, 64
    fj = FakeJack(P, n)
    ring = rtfifo.NativeRing(2 * n * P * 4)   # two periods
    ctx = fj.ctx(0, ring)
    fj.bufs[0][:] = np.arange(n, dtype=np.float32)
    fj.bufs[1][:] = -np.arange(n, dtype=np.float32)
    fj.process(ctx)
    got = np.frombuffer(ring.read_blocking(n * P * 4), np.float32)
    frames = got.reshape(n, P)
    np.testing.assert_array_equal(frames[:, 0], fj.bufs[0])
    np.testing.assert_array_equal(frames[:, 1], fj.bufs[1])
    lib = rtfifo.lib()
    assert lib.bf_jack_ctx_xruns(ctypes.c_void_p(ctx)) == 0
    # fill the ring; the third period overflows -> one xrun, frames stay
    # whole (used is a multiple of the frame size)
    fj.process(ctx)
    fj.process(ctx)
    fj.process(ctx)
    assert lib.bf_jack_ctx_xruns(ctypes.c_void_p(ctx)) >= 1
    assert ring.used() % (P * 4) == 0
    lib.bf_jack_ctx_destroy(ctypes.c_void_p(ctx))
    ring.destroy()


def test_playback_deinterleaves_and_zero_fills():
    P, n = 3, 32
    fj = FakeJack(P, n)
    ring = rtfifo.NativeRing(4 * n * P * 4)
    ctx = fj.ctx(1, ring)
    frames = np.arange(n * P, dtype=np.float32).reshape(n, P)
    ring.write_blocking(frames.tobytes())
    fj.process(ctx)
    for c in range(P):
        np.testing.assert_array_equal(fj.bufs[c], frames[:, c])
    # empty ring: silence + one underrun
    fj.process(ctx)
    lib = rtfifo.lib()
    assert lib.bf_jack_ctx_xruns(ctypes.c_void_p(ctx)) == 1
    for c in range(P):
        np.testing.assert_array_equal(fj.bufs[c], 0.0)
    lib.bf_jack_ctx_destroy(ctypes.c_void_p(ctx))
    ring.destroy()


def test_ring_threaded_stream_integrity():
    """A producer thread streams a deterministic byte pattern through a
    small ring while the consumer drains it; nothing lost or reordered."""
    total = 1 << 20
    ring = rtfifo.NativeRing(4096)
    src = np.random.RandomState(0).bytes(total)

    def produce():
        ring.write_blocking(src)

    t = threading.Thread(target=produce)
    t.start()
    out = ring.read_blocking(total)
    t.join()
    assert out == src
    ring.destroy()
