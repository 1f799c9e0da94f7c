"""MXU-permutation FFT glue parity (ops/partconv.py).

The MXU variants replace the shuffle-heavy real<->complex glue around
the half-size complex transforms with permutation matmuls (bit-exact
per element at HIGHEST precision). They must match the packed-path
transforms to float32 roundoff at every eligible shape, including the
packed bin-0 convention (DC real slot / Nyquist imaginary slot,
mirroring the reference's halfcomplex handling at
/root/reference/fftw_convfuns.h:503-561).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from brutefir_tpu.ops import partconv as pc

SHAPES = [(3, 256), (2, 1024), (1, 8192), (5, 128)]


def _rand(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32)


@pytest.mark.parametrize("C,M", SHAPES)
def test_rfft_planes_mxu_matches_packed(rng, C, M):
    x = _rand(rng, C, 2 * M)
    ref = np.asarray(pc.c2p(pc.rfft_packed(jnp.asarray(x))))
    got = np.asarray(pc.rfft_planes_mxu(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-4 * np.abs(ref).max())


@pytest.mark.parametrize("C,M", SHAPES)
def test_irfft_planes_mxu_matches_packed(rng, C, M):
    p = jnp.asarray(_rand(rng, C, 2, M))
    ref = np.asarray(pc.irfft_packed(pc.p2c(p)))
    got = np.asarray(pc.irfft_planes_mxu(p))
    np.testing.assert_allclose(got, ref, rtol=0, atol=2e-4 * np.abs(ref).max())


@pytest.mark.parametrize("C,M", [s for s in SHAPES if s[1] >= 256])
def test_irfft_planes_valid_mxu_is_lower_half(rng, C, M):
    p = jnp.asarray(_rand(rng, C, 2, M))
    full = np.asarray(pc.irfft_planes_mxu(p))
    got = np.asarray(pc.irfft_planes_valid_mxu(p))
    np.testing.assert_allclose(got, full[..., :M], rtol=0, atol=1e-6)


def test_roundtrip_identity(rng):
    x = _rand(rng, 4, 512)
    p = pc.rfft_planes_mxu(jnp.asarray(x))
    back = np.asarray(pc.irfft_planes_mxu(p))
    np.testing.assert_allclose(back, x, rtol=0, atol=1e-4)


def test_mirror_planes_is_pure_permutation(rng):
    M = 256
    p = jnp.asarray(_rand(rng, 2, M))
    got = np.asarray(pc._mirror_planes(p))
    idx = (M - np.arange(M)) % M
    np.testing.assert_array_equal(got, np.asarray(p)[..., idx])


def test_dispatch_gating(monkeypatch):
    # default -> xla; forced mxu -> eligible shapes route through mxu
    monkeypatch.setenv("BRUTEFIR_TPU_FFT_GLUE", "mxu")
    try:
        assert pc._mxu_ok(256, jnp.float32)
        assert not pc._mxu_ok(192, jnp.float32)      # not lane multiple
        assert not pc._mxu_ok(128, jnp.float32)      # below 2*lanes
        assert not pc._mxu_ok(256, jnp.float64)      # no f64 on MXU
        # the public entry points agree with the packed path when routed
        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.standard_normal((2, 512)).astype(np.float32))
        a = np.asarray(pc.rfft_planes(x))
        b = np.asarray(pc.c2p(pc.rfft_packed(x)))
        np.testing.assert_allclose(a, b, rtol=0, atol=2e-4 * np.abs(b).max())
    finally:
        monkeypatch.delenv("BRUTEFIR_TPU_FFT_GLUE")
    assert pc._glue_mode() == "xla"
    assert not pc._mxu_ok(256, jnp.float32)
