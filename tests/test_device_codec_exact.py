"""Device no-dither quantizer: bit-equality with the host/reference
double-precision path over adversarial values (the f32 `y + 0.5` loses
the half above 2^23, and f32(imax) rounds up for 32-bit formats)."""

import numpy as np
import jax
import pytest

from brutefir_tpu.core.codecs import Overflow, quantize_no_dither
from brutefir_tpu.core.sampleformat import parse_sample_format
from brutefir_tpu.ops.device_codec import quantize_nd_exact


@pytest.mark.parametrize("name", ["S8", "S16_NE", "S24_4NE", "S32_NE"])
def test_device_quantizer_bit_matches_host(name, rng):
    fmt = parse_sample_format(name)
    edges = []
    # power-of-two magnitudes with half-step offsets: the f32 rounding
    # trap lives at |y| >= 2^23 where +0.5 is inexact
    for k in range(0, 32):
        for base in (2.0 ** k, -(2.0 ** k)):
            for d in (-1.0, -0.5, -0.25, 0.0, 0.25, 0.5, 1.0):
                edges.append(np.float32(base + d))
    # the clip thresholds themselves, plus their f32 neighbors
    for b in (np.float64(np.float32(fmt.imin)), np.float64(np.float32(fmt.imax))):
        for off in (-1.0, -0.5, 0.0, 0.5, 1.0):
            v = np.float32(b + off)
            edges += [v, np.nextafter(v, np.float32(-np.inf)),
                      np.nextafter(v, np.float32(np.inf))]
    x = np.array(edges, np.float32)
    x = np.concatenate([
        x,
        (rng.standard_normal(4096) * abs(float(fmt.imax))).astype(np.float32),
        (rng.standard_normal(4096) * 2.0 ** 20).astype(np.float32),
        np.round(rng.standard_normal(1024) * 2.0 ** 24).astype(np.float32),
    ])
    ovf = Overflow(max=fmt.imax)
    q_host = quantize_no_dither(x.copy(), fmt, ovf)
    qd, under, over = jax.jit(quantize_nd_exact, static_argnums=(1, 2))(
        x, fmt.imin, fmt.imax)
    np.testing.assert_array_equal(np.asarray(qd), q_host)
    # clip accounting agrees too (the full-scale S32 sample must count)
    assert int(np.asarray(under | over).sum()) == ovf.n_overflows


def test_s32_full_scale_regressions():
    """The two verified divergences of the old f32 quantizer."""
    fmt = parse_sample_format("S32_NE")
    x = np.array([-(2.0 ** 24), 2.0 ** 31 - 128, 2.0 ** 31], np.float32)
    ovf = Overflow(max=fmt.imax)
    q_host = quantize_no_dither(x.copy(), fmt, ovf)
    qd, under, over = jax.jit(quantize_nd_exact, static_argnums=(1, 2))(
        x, fmt.imin, fmt.imax)
    np.testing.assert_array_equal(np.asarray(qd), q_host)
    assert np.asarray(qd)[0] == -(2 ** 24)          # not -2^24 - 1
    assert np.asarray(over)[2] and ovf.n_overflows == 1   # full scale clips
