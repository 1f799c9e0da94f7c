"""Pallas MAC kernel (interpret mode) vs the dense jnp path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from brutefir_tpu.ops import partconv
from brutefir_tpu.ops.pallas_mac import pallas_spectral_mac


def test_pallas_matches_dense(rng):
    F, B, N, E = 3, 4, 256, 2
    ring = rng.standard_normal((F, B, 2, N)).astype(np.float32)
    bank = rng.standard_normal((E, B, 2, N)).astype(np.float32)
    idx = np.array([0, 1, 0], np.int32)
    mask = (rng.uniform(size=(F, B)) > 0.3).astype(np.float32)
    for t in (0, 3, 7):
        h = bank[idx] * mask[:, :, None, None]
        ref = partconv.spectral_mac(jnp.asarray(ring), jnp.asarray(h),
                                    jnp.int32(t))
        got = pallas_spectral_mac(jnp.asarray(ring), jnp.asarray(bank),
                                  jnp.asarray(idx), jnp.asarray(mask),
                                  jnp.int32(t), interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0, atol=1e-5)


@pytest.mark.parametrize("variant", ["row", "tile"])
def test_pallas_variants_match_dense(rng, variant, monkeypatch):
    monkeypatch.setenv("BRUTEFIR_TPU_PALLAS_VARIANT", variant)
    F, B, N, E = 5, 8, 384, 3
    ring = rng.standard_normal((F, B, 2, N)).astype(np.float32)
    bank = rng.standard_normal((E, B, 2, N)).astype(np.float32)
    idx = np.array([0, 1, 2, 1, 0], np.int32)
    mask = (rng.uniform(size=(F, B)) > 0.3).astype(np.float32)
    for t in (0, 5, 11):
        h = bank[idx] * mask[:, :, None, None]
        ref = partconv.spectral_mac(jnp.asarray(ring), jnp.asarray(h),
                                    jnp.int32(t))
        got = pallas_spectral_mac(jnp.asarray(ring), jnp.asarray(bank),
                                  jnp.asarray(idx), jnp.asarray(mask),
                                  jnp.int32(t), interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0, atol=1e-5)
