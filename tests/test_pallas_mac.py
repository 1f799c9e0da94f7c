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


def test_pallas_uniform_matches_dense(rng):
    """The uniform-coefficient kernel (shared bank row VMEM-resident
    across the filter grid) against the dense uniform path."""
    from brutefir_tpu.ops.pallas_mac import pallas_spectral_mac_uniform
    F, B, N, E = 4, 6, 256, 3
    ring = rng.standard_normal((F, B, 2, N)).astype(np.float32)
    bank = rng.standard_normal((E, B, 2, N)).astype(np.float32)
    idx = np.full(F, 2, np.int32)
    mask = np.tile((rng.uniform(size=B) > 0.3).astype(np.float32), (F, 1))
    for t in (0, 4, 9):
        ref = partconv.spectral_mac_uniform(
            jnp.asarray(ring), jnp.asarray(bank), jnp.asarray(idx),
            jnp.asarray(mask), jnp.int32(t))
        got = pallas_spectral_mac_uniform(
            jnp.asarray(ring), jnp.asarray(bank), jnp.asarray(idx),
            jnp.asarray(mask), jnp.int32(t), interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0, atol=1e-5)


def test_tiled_layout_matches_flat(rng):
    """Every MAC accepts the engine's lane-tiled [.., 2, N/128, 128]
    ring/bank layout and returns the same flat [F, 2, N] spectra."""
    from brutefir_tpu.ops.pallas_mac import (pallas_spectral_mac,
                                             pallas_spectral_mac_uniform)
    F, B, N, E = 3, 4, 384, 2
    R = N // 128
    ring = rng.standard_normal((F, B, 2, N)).astype(np.float32)
    bank = rng.standard_normal((E, B, 2, N)).astype(np.float32)
    ring5 = jnp.asarray(ring.reshape(F, B, 2, R, 128))
    bank5 = jnp.asarray(bank.reshape(E, B, 2, R, 128))
    mask = (rng.uniform(size=(F, B)) > 0.3).astype(np.float32)
    t = jnp.int32(5)

    idx = np.array([0, 1, 0], np.int32)
    for fn in (partconv.spectral_mac_rollh,
               lambda *a: pallas_spectral_mac(*a, interpret=True)):
        flat = fn(jnp.asarray(ring), jnp.asarray(bank),
                  jnp.asarray(idx), jnp.asarray(mask), t)
        tiled = fn(ring5, bank5, jnp.asarray(idx), jnp.asarray(mask), t)
        assert tiled.shape == (F, 2, N)
        np.testing.assert_allclose(np.asarray(tiled), np.asarray(flat),
                                   rtol=0, atol=1e-5)
        # mixed ranks: tiled ring with an untiled bank (test callers)
        mixed = fn(ring5, jnp.asarray(bank), jnp.asarray(idx),
                   jnp.asarray(mask), t)
        np.testing.assert_allclose(np.asarray(mixed), np.asarray(flat),
                                   rtol=0, atol=1e-5)

    uidx = np.ones(F, np.int32)
    umask = np.tile(mask[:1], (F, 1))
    for fn in (partconv.spectral_mac_uniform,
               lambda *a: pallas_spectral_mac_uniform(*a, interpret=True)):
        flat = fn(jnp.asarray(ring), jnp.asarray(bank),
                  jnp.asarray(uidx), jnp.asarray(umask), t)
        tiled = fn(ring5, bank5, jnp.asarray(uidx), jnp.asarray(umask), t)
        np.testing.assert_allclose(np.asarray(tiled), np.asarray(flat),
                                   rtol=0, atol=1e-5)
