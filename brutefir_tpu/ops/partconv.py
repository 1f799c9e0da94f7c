"""Partitioned overlap-save convolution primitives.

TPU-native formulation of the reference convolver (`fftw_convolver.c`,
`fftw_convfuns.h`). The reference's conventions, restated in rfft terms:

* An input block is the 2N-point frame ``[previous N samples, new N samples]``
  (`convolver_raw2cbuf` fftw_convolver.c:170-194 + bfrun.c double buffering).
* A coefficient partition places its N taps in the *upper* half of a zeroed
  2N buffer before the forward transform (`convolver_coeffs2cbuf`
  fftw_convolver.c:526-573). Equivalently ``H[k] = (-1)^k * rfft(taps, 2N)``.
  The reference folds a 1/n_fft factor into H and uses unnormalized FFTs;
  we use numpy/XLA-normalized irfft instead, so the factor disappears:
  ``time = irfft(X * H_ours)`` with ``H_ours = rfft(shifted taps)``.
* Because of the upper-half placement, the *valid* (non-time-aliased) output
  region after the inverse transform is the **lower** half of the 2N frame.
* The per-block output spectrum is a multiply-accumulate across partitions
  against a ring of the last B input spectra:
  ``Y[t] = sum_i X[(t-i) mod B] * H[i]`` (`bfrun.c:1737-1754`).
* A "dirac pulse" coefficient is the spectrum ``(-1)^k`` (delta at offset N):
  the reference's dirac_convolve multiplies by alternating-sign 1/n_fft
  (`fftw_convfuns.h:592-619`); in our normalization that is just (-1)^k.

The dense jnp path below is the correctness baseline; the fused Pallas MAC
kernel lives in :mod:`brutefir_tpu.ops.pallas_mac`.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def preprocess_coeffs(
    taps: np.ndarray,
    block_length: int,
    n_blocks: int,
    scale: float = 1.0,
    dtype=np.float32,
) -> np.ndarray:
    """Host-side coefficient preprocessing.

    Splits ``taps`` (1-D) into ``n_blocks`` partitions of ``block_length``,
    zero-padding the tail, and returns the spectral coefficient bank
    ``H [n_blocks, block_length+1] complex`` in the engine's convention
    (upper-half placement absorbed as the (-1)^k factor). ``scale`` is the
    linear attenuation factor applied to the taps (`coeffs2cbuf` arg).
    Raises ValueError on NaN/Inf taps like the reference.
    """
    N = block_length
    taps = np.asarray(taps, dtype=dtype) * dtype(scale) if scale != 1.0 else np.asarray(taps, dtype=dtype)
    if not np.all(np.isfinite(taps)):
        raise ValueError("NaN or Inf value among coefficients")
    total = N * n_blocks
    padded = np.zeros(total, dtype=dtype)
    padded[: min(len(taps), total)] = taps[:total]
    parts = padded.reshape(n_blocks, N)
    # taps at offset N in a 2N buffer == (-1)^k * rfft(taps at offset 0)
    buf = np.zeros((n_blocks, 2 * N), dtype=dtype)
    buf[:, N:] = parts
    ctype = np.complex64 if dtype == np.float32 else np.complex128
    return np.fft.rfft(buf, axis=1).astype(ctype)


def dirac_bank_entry(block_length: int, n_blocks: int, dtype=np.complex64) -> np.ndarray:
    """Spectral bank entry for the pass-through ("dirac pulse") coefficient."""
    N = block_length
    H = np.zeros((n_blocks, N + 1), dtype=dtype)
    signs = np.where(np.arange(N + 1) % 2 == 0, 1.0, -1.0)
    H[0] = signs
    return H


def frame_and_fft(prev_tail: jnp.ndarray, new_block: jnp.ndarray) -> jnp.ndarray:
    """[C, N] x [C, N] -> rfft of the 2N overlap-save frame, [C, N+1]."""
    frame = jnp.concatenate([prev_tail, new_block], axis=-1)
    return jnp.fft.rfft(frame, axis=-1)


def spectral_mac(ring: jnp.ndarray, H: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Partitioned spectral multiply-accumulate.

    ring: [F, B, K] complex input-spectra ring per filter
    H:    [F, B, K] complex coefficient partitions (already gathered/masked)
    t:    scalar int32 block counter
    Returns Y [F, K] = sum_i ring[:, (t-i) % B] * H[:, i].
    """
    B = ring.shape[1]
    rpos = jnp.mod(t - jnp.arange(B, dtype=jnp.int32), B)
    rot = jnp.take(ring, rpos, axis=1)
    return jnp.sum(rot * H, axis=1)


def crossfade_spectra(y_old: jnp.ndarray, y_new: jnp.ndarray, n_fft2: int) -> jnp.ndarray:
    """Seamless coefficient-change crossfade (`convolver_crossfade_inplace`).

    Inverse-transform both spectra, linearly ramp old->new across the valid
    (lower) half, keep the new upper half, and re-transform. Matches
    fftw_convolver.c:330-368 in our normalization.
    """
    t_old = jnp.fft.irfft(y_old, axis=-1)
    t_new = jnp.fft.irfft(y_new, axis=-1)
    dt = t_new.dtype
    f = jnp.arange(n_fft2, dtype=dt) / (n_fft2 - 1)
    ramped = t_old[..., :n_fft2] * (1.0 - f) + t_new[..., :n_fft2] * f
    mixed = jnp.concatenate([ramped, t_new[..., n_fft2:]], axis=-1)
    return jnp.fft.rfft(mixed, axis=-1)


def convolve_eval(z: jnp.ndarray, eval_prev: jnp.ndarray, n_fft2: int):
    """Filter-cascade re-framing (`convolver_convolve_eval`, fftw 411-433).

    ``z`` is the mixed output spectrum of upstream filters [Fc, K]. Returns
    (E, new_eval_prev): the "input-like" spectrum obtained by taking the
    valid time-domain output, overlap-save framing it with the previous
    block's valid output, and re-transforming.
    """
    t = jnp.fft.irfft(z, axis=-1)
    valid = t[..., :n_fft2]
    frame = jnp.concatenate([eval_prev, valid], axis=-1)
    return jnp.fft.rfft(frame, axis=-1), valid


def complex_mix(mix: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Real mixing matrix applied to complex spectra: [A,B]@[B,K] -> [A,K].

    Two real matmuls (MXU) instead of a complex-promoted one.
    """
    return jax.lax.complex(mix @ x.real, mix @ x.imag)
