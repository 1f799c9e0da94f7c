"""Fused matmul-FFT parity (ops/pallas_fft.py).

The fused 4-step kernels are a measured-and-rejected attack on the FFT
region (docs/PERFORMANCE.md): they must stay bit-plausible so the A/B
(`tools/fused_fft_probe.py`) stays meaningful on future
hardware/compiler generations. Parity is against the production packed
transforms, with the digit permutation applied via `bin_order`.
Off-TPU the kernels run interpreted.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from brutefir_tpu.ops import partconv as pc
from brutefir_tpu.ops import pallas_fft as pf

SHAPES = [(3, 256), (2, 1024), (1, 8192)]


def _rand(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32)


def test_bin_order_roundtrip():
    for M in (256, 1024, 8192):
        o = pf.bin_order(M)
        assert np.array_equal(np.sort(o), np.arange(M))
        assert np.array_equal(o[pf.bin_order_inv(M)], np.arange(M))
        # tile position p = k1*128 + k2 holds bin k2*R + k1
        R = M // 128
        assert o[1] == R                      # p=(0,1) -> bin 1*R+0
        assert o[128] == 1                    # p=(1,0) -> bin 0*R+1


@pytest.mark.parametrize("C,M", SHAPES)
def test_rfft_fused_matches_packed(rng, C, M):
    x = _rand(rng, C, 2 * M)
    ref = np.asarray(pc.c2p(pc.rfft_packed(jnp.asarray(x))))
    got = np.asarray(pf.rfft_planes_fused(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref[..., pf.bin_order(M)], rtol=0,
                               atol=2e-4 * np.abs(ref).max())


@pytest.mark.parametrize("C,M", SHAPES)
def test_irfft_fused_matches_packed(rng, C, M):
    p = jnp.asarray(_rand(rng, C, 2, M))
    ref = np.asarray(pc.irfft_packed(pc.p2c(p)))
    perm = jnp.asarray(np.asarray(p)[..., pf.bin_order(M)])
    got = np.asarray(pf.irfft_planes_fused(perm))
    np.testing.assert_allclose(got, ref, rtol=0,
                               atol=2e-4 * np.abs(ref).max())


@pytest.mark.parametrize("C,M", SHAPES)
def test_irfft_valid_fused_is_lower_half(rng, C, M):
    p = jnp.asarray(_rand(rng, C, 2, M))
    ref = np.asarray(pc.irfft_packed(pc.p2c(p)))[..., :M]
    perm = jnp.asarray(np.asarray(p)[..., pf.bin_order(M)])
    got = np.asarray(pf.irfft_planes_valid_fused(perm))
    np.testing.assert_allclose(got, ref, rtol=0,
                               atol=2e-4 * np.abs(ref).max())


def test_roundtrip_recovers_frame(rng):
    M = 1024
    x = _rand(rng, 2, 2 * M)
    spec = pf.rfft_planes_fused(jnp.asarray(x))
    back = np.asarray(pf.irfft_planes_fused(spec))
    np.testing.assert_allclose(back, x, rtol=0,
                               atol=2e-4 * np.abs(x).max())
