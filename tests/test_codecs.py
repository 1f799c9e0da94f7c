"""Raw<->float codec tests: round trips, reference scale conventions."""

import numpy as np
import pytest

from brutefir_tpu.core.sampleformat import parse_sample_format
from brutefir_tpu.core.codecs import (
    Overflow, raw_to_float, float_to_raw, quantize_no_dither)

INT_FORMATS = ["S8", "S16_LE", "S16_BE", "S24_LE", "S24_BE",
               "S24_4LE", "S24_4BE", "S32_LE", "S32_BE"]
FLOAT_FORMATS = ["FLOAT_LE", "FLOAT_BE", "FLOAT64_LE", "FLOAT64_BE"]


@pytest.mark.parametrize("name", INT_FORMATS + FLOAT_FORMATS)
def test_roundtrip_interleaved(name, rng):
    fmt = parse_sample_format(name)
    n_frames, open_ch = 64, 3
    sel = [0, 2]
    if fmt.is_float:
        x = rng.uniform(-1, 1, size=(len(sel), n_frames)).astype(np.float32)
    else:
        lim = min(fmt.imax, 1 << 20)
        x = rng.integers(-lim, lim, size=(len(sel), n_frames)).astype(np.float32)
    raw = np.zeros(n_frames * open_ch * fmt.bytes, dtype=np.uint8)
    ovf = [Overflow(max=1.0 if fmt.is_float else fmt.imax) for _ in sel]
    float_to_raw(x, fmt, open_ch, sel, raw, ovf)
    back = raw_to_float(raw, fmt, n_frames, open_ch, sel)
    np.testing.assert_allclose(back, x, rtol=0, atol=0)
    assert all(o.n_overflows == 0 for o in ovf)


def test_s24_4le_sign_and_scale():
    fmt = parse_sample_format("S24_4LE")
    assert fmt.sbytes == 3 and fmt.bytes == 4
    assert fmt.scale == 1.0 / (1 << 23)
    # stored sign-extended as a full int32 (raw2real.h:143-153 reads int32
    # directly; the 24-bit range is enforced by the output quantizer)
    raw = np.array([0xFF, 0xFF, 0xFF, 0xFF], dtype=np.uint8)  # -1
    out = raw_to_float(raw, fmt, 1, 1, [0])
    assert out[0, 0] == -1.0
    assert fmt.imax == (1 << 23) - 1 and fmt.imin == -(1 << 23)


def test_s24_3byte_sign_extension():
    fmt = parse_sample_format("S24_LE")
    raw = np.array([0x00, 0x00, 0x80], dtype=np.uint8)  # most negative
    out = raw_to_float(raw, fmt, 1, 1, [0])
    assert out[0, 0] == -(1 << 23)
    raw = np.array([0xFF, 0xFF, 0x7F], dtype=np.uint8)  # most positive
    out = raw_to_float(raw, fmt, 1, 1, [0])
    assert out[0, 0] == (1 << 23) - 1


def test_quantize_midtread_reference_semantics():
    """Matches dither_funs.h:70-114: trunc(x+0.5), minus 1 when x+0.5 < 0."""
    fmt = parse_sample_format("S16_LE")
    ovf = Overflow(max=fmt.imax)
    x = np.array([3.8, 3.4, -3.2, -3.5, -3.6, 0.4, -0.4, -0.6, 3.5],
                 dtype=np.float32)
    q = quantize_no_dither(x, fmt, ovf)
    #                 4.3  3.9  -2.7  -3.0  -3.1  0.9  0.1  -0.1  4.0
    # trunc:          4    3    -2    -3    -3    0    0     0    4
    # neg branch -1:             -3    -4    -4              -1
    np.testing.assert_array_equal(q, [4, 3, -3, -4, -4, 0, 0, -1, 4])
    assert ovf.n_overflows == 0
    assert ovf.intlargest == 4


def test_quantize_clipping_and_overflow_count():
    fmt = parse_sample_format("S8")
    ovf = Overflow(max=fmt.imax)
    x = np.array([200.0, -300.0, 100.0], dtype=np.float32)
    q = quantize_no_dither(x, fmt, ovf)
    np.testing.assert_array_equal(q, [127, -128, 100])
    assert ovf.n_overflows == 2
    assert ovf.largest == pytest.approx(299.5)  # |x + 0.5| of the deepest clip


def test_float_format_overflow_accounting(rng):
    fmt = parse_sample_format("FLOAT_LE")
    x = np.array([[0.5, -1.5, 2.0]], dtype=np.float32)
    raw = np.zeros(3 * 4, dtype=np.uint8)
    ovf = [Overflow(max=1.0)]
    float_to_raw(x, fmt, 1, [0], raw, ovf)
    assert ovf[0].n_overflows == 2
    assert ovf[0].largest == 2.0
    back = raw_to_float(raw, fmt, 3, 1, [0])
    np.testing.assert_array_equal(back, x)


def test_spacing_multichannel_layout(rng):
    """Channels interleave; unselected channels untouched on write."""
    fmt = parse_sample_format("S16_LE")
    n_frames, open_ch = 4, 4
    raw = np.full(n_frames * open_ch * 2, 0xAB, dtype=np.uint8)
    x = np.array([[1, 2, 3, 4], [5, 6, 7, 8]], dtype=np.float32)
    float_to_raw(x, fmt, open_ch, [1, 3], raw,
                 [Overflow(max=fmt.imax), Overflow(max=fmt.imax)])
    view = raw.view("<i2").reshape(n_frames, open_ch)
    np.testing.assert_array_equal(view[:, 1], [1, 2, 3, 4])
    np.testing.assert_array_equal(view[:, 3], [5, 6, 7, 8])
    assert np.all(raw.reshape(n_frames, open_ch, 2)[:, 0] == 0xAB)


def test_s24_wire_pack_unpack_edges():
    """The 3-byte S24_4LE wire unpack (runtime/device_io.py) must
    reconstruct every in-range int32 exactly, including sign edges."""
    import jax.numpy as jnp
    vals = np.array([-(2**23), 2**23 - 1, -1, 0, 1, -2, 3957070,
                     -4242424], np.int32)
    packed = np.frombuffer(vals.astype("<i4").tobytes(),
                           np.uint8).reshape(-1, 1, 4)[:, :, :3]
    w = jnp.asarray(packed).astype(jnp.int32)
    w = w[..., 0] | (w[..., 1] << 8) | (w[..., 2] << 16)
    w = w - ((w & 0x800000) << 1)
    np.testing.assert_array_equal(np.asarray(w)[:, 0], vals)
