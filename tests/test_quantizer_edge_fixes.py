"""Edge-case fixes in the dithered/no-dither quantizers and the JACK
realtime callback: S32 full-scale clip definition (the reference's cast
there is UB), NaN saturation in the fallback paths, stopped-stream
silence."""

import ctypes

import numpy as np
import pytest

from brutefir_tpu.core.codecs import Overflow, quantize_no_dither
from brutefir_tpu.core.dither import DitherTable, DitherState
from brutefir_tpu.core.sampleformat import parse_sample_format


def _state():
    tab = DitherTable(1, 44100, 0, 4096)
    return tab.new_state(0)


def _fmt32():
    return parse_sample_format("S32_NE")


def test_native_dither_s32_full_scale_clips():
    """d == 2^31 exactly (f32 grid point) must clip to imax and count,
    not fall into an out-of-range cast."""
    from brutefir_tpu.core import native
    if not native.available():
        pytest.skip("native codec unavailable")
    fmt = _fmt32()
    x = np.array([2.0 ** 31, 2.0 ** 31 - 128, -(2.0 ** 31)], np.float32)
    dith = np.zeros(3, np.float32)
    sf = np.zeros(2, np.float32)
    ovf = Overflow(max=fmt.imax)
    q = native.dither_quantize(x, dith, sf, fmt, ovf)
    assert q[0] == fmt.imax
    assert q[1] == 2 ** 31 - 128          # in range, cast is defined
    assert q[2] == fmt.imin               # d <= rmin clips (reference <=)
    assert ovf.n_overflows == 2           # the +2^31 and the -2^31 sample
    # feedback for the clipped sample is real - imax, not ~ +2^32
    assert abs(float(sf[0])) <= 256.0


def test_python_dither_s32_full_scale_clips():
    fmt = _fmt32()
    st = _state()
    x = np.array([2.0 ** 31], np.float32)
    d = np.zeros(1, np.float32)
    ovf = Overflow(max=fmt.imax)
    q = st._quantize_py(x, d, fmt, ovf)
    assert q[0] == fmt.imax and ovf.n_overflows == 1


def test_python_dither_nan_saturates_and_counts():
    fmt = parse_sample_format("S16_NE")
    st = _state()
    x = np.array([0.25, np.nan, 0.25], np.float32)
    d = np.zeros(3, np.float32)
    ovf = Overflow(max=fmt.imax)
    q = st._quantize_py(x, d, fmt, ovf)
    assert q[1] == fmt.imin and ovf.n_overflows == 1
    # feedback reset: the samples after the NaN stay sane
    assert q[2] in (0, 1)


def test_numpy_nd_nan_saturates_and_counts():
    """The float64 numpy path (no native fast path) must mirror the
    native NaN semantics: imin + count, not a silent 0."""
    fmt = parse_sample_format("S16_NE")
    ovf = Overflow(max=fmt.imax)
    x = np.array([100.0, np.nan, -100.0], np.float64)
    with np.errstate(invalid="raise"):   # an invalid cast would raise
        q = quantize_no_dither(x, fmt, ovf)
    assert q[1] == fmt.imin
    assert ovf.n_overflows == 1
    assert not np.isnan(ovf.largest)


def test_jack_stopped_playback_outputs_silence():
    """After ctx_stop the process callback must zero playback port
    buffers -- JACK reuses them without clearing, so returning early
    loops the last period."""
    from brutefir_tpu.core.native import rtfifo
    if not rtfifo.available():
        pytest.skip("native rtfifo unavailable")
    from tests.test_native_rtfifo import FakeJack
    lib = rtfifo.lib()
    P, n = 2, 64
    fj = FakeJack(P, n)
    ring = rtfifo.NativeRing(4 * n * P * 4)
    ctx = fj.ctx(1, ring)   # playback
    # one period of audio through the ring
    frames = np.tile(np.arange(n, dtype=np.float32)[:, None], (1, P))
    ring.write_blocking(np.ascontiguousarray(frames).tobytes())
    fj.process(ctx)
    assert fj.bufs[0][5] == 5.0
    lib.bf_jack_ctx_stop(ctypes.c_void_p(ctx))
    fj.process(ctx)
    for b in fj.bufs:
        assert not np.any(b), "stopped stream must emit silence"
    lib.bf_jack_ctx_destroy(ctypes.c_void_p(ctx))
