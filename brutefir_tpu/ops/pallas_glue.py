"""Pallas VPU kernels for the real<->complex FFT glue.

The transforms themselves are cheap on TPU (XLA's complex-fft core is
~12.5 us at the flagship shape) -- the cost of `rfft_planes` /
`irfft_planes_valid` is the *glue*: the hermitian untangle's mirror
permutation X[(M-k) % M] and the associated combines lower to
shuffle-heavy HLO (see ops/partconv.py, the rfft_packed docstring and
the measured-slower MXU-permutation variants). This module is the
remaining attack from docs/ROADMAP.md item 2: fuse the mirror and the
a/b hermitian combine into ONE Pallas pass per direction so the spectra
cross HBM exactly once, with the lane permutation done in-register on
the VPU (flip/roll) instead of as standalone XLA shuffle fusions.

Both directions share the same kernel shape ("mirror + complex linear
combine", the counterpart of the reference's halfcomplex reorder inside
mixnscale, fftw_convfuns.h:7-501 / brutefir.html:688-757):

* forward (`fft_untangle_fwd`): Z = fft(even + i*odd) of the 2M-point
  real frame -> packed spectra planes
  ``X = a Z + b conj(Z[(M-k)%M])`` with ``a=(1-iw)/2, b=(1+iw)/2,
  w=e^{-i pi k/M}``; packed bin 0 carries DC and Nyquist.
* inverse (`ifft_combine_inv`): packed planes -> the M-point complex
  sequence fed to ifft, ``V = a Xk + b Xr`` with the DC/Nyquist unpack
  folded into the bin-0 lanes (same math as
  partconv.irfft_planes_valid).

Opt-in via BRUTEFIR_TPU_FFT_GLUE=pallas (default stays the XLA glue
until this variant measures faster in situ -- see the A/B protocol in
tools/step_breakdown.py and the MXU variant's history).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _rev_axis(t, axis: int):
    """Reverse a power-of-two axis without lax.rev (unimplemented in the
    Mosaic TC lowering): index reversal is the XOR-complement of every
    index bit, and each bit is one butterfly stage -- select between a
    +b and a -b circular shift by the bit of the *output* index
    (y[l] = x[l ^ b] composes over bits to y[l] = x[size-1-l])."""
    axis = axis % t.ndim
    size = t.shape[axis]
    idx = jax.lax.broadcasted_iota(jnp.int32, t.shape, axis)
    b = size // 2
    while b:
        t = jnp.where((idx & b) != 0,
                      pltpu.roll(t, b, axis),
                      pltpu.roll(t, size - b, axis))
        b //= 2
    return t


def _mirror_tiled(t):
    """Tiled planes [2, R, 128] -> planes of X[(M - k) % M], in-register.

    Lane step: A[l] = t[(128 - l) % 128] (reverse then roll by one). Row
    step: rows reversed, and lane 0 additionally row-rolled by one
    because bin M - 128r - l crosses a chunk boundary between l = 0 and
    l >= 1 (same derivation as partconv._mirror_planes, which rides the
    MXU instead). Reversals run as butterfly roll/select stages
    (`_rev_axis`); rolls and selects are the only cross-lane primitives
    the TC lowering provides.
    """
    R = t.shape[-2]
    A = pltpu.roll(_rev_axis(t, -1), 1, t.ndim - 1)
    B1 = _rev_axis(A, -2)
    B2 = pltpu.roll(B1, 1, t.ndim - 2)
    lane0 = jax.lax.broadcasted_iota(jnp.int32, (R, _LANES), 1) == 0
    return jnp.where(lane0, B2, B1)


def _bin0_tile(R):
    """[R, 128] mask of the packed DC/Nyquist bin (row 0, lane 0)."""
    row = jax.lax.broadcasted_iota(jnp.int32, (R, _LANES), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, _LANES), 1)
    return (row == 0) & (lane == 0)


def _fwd_kernel(z_ref, ab_ref, x_ref):
    # one channel per grid step: Z planes (1, 2, R, 128) -> X planes
    zr = z_ref[0, 0]
    zi = z_ref[0, 1]
    zm = _mirror_tiled(z_ref[0])
    mr = zm[0]
    mi = -zm[1]
    ar, ai, br, bi = ab_ref[0], ab_ref[1], ab_ref[2], ab_ref[3]
    xr = ar * zr - ai * zi + br * mr - bi * mi
    xi = ar * zi + ai * zr + br * mi + bi * mr
    # packed bin 0: DC = Re Z0 + Im Z0 (the combine already yields it);
    # Nyquist = Re Z0 - Im Z0 rides the imaginary slot
    xi = jnp.where(_bin0_tile(zr.shape[0]), zr - zi, xi)
    x_ref[0, 0] = xr
    x_ref[0, 1] = xi


def _inv_kernel(p_ref, ab_ref, v_ref):
    # one channel per grid step: packed planes (1, 2, R, 128) -> ifft
    # input planes
    R = p_ref.shape[2]
    b0 = _bin0_tile(R)
    pr = p_ref[0, 0]
    pi = p_ref[0, 1]
    kr = pr
    ki = jnp.where(b0, 0.0, pi)
    pm = _mirror_tiled(p_ref[0])
    # mirror bin 0 is DC's own slot: the counterpart of bin 0 is
    # Nyquist, which rides p's imaginary lane 0
    rr = jnp.where(b0, pi, pm[0])
    ri = jnp.where(b0, 0.0, -pm[1])
    ar, ai, br, bi = ab_ref[0], ab_ref[1], ab_ref[2], ab_ref[3]
    v_ref[0, 0] = ar * kr - ai * ki + br * rr - bi * ri
    v_ref[0, 1] = ar * ki + ai * kr + br * ri + bi * rr


@functools.lru_cache()
def _ab_consts(M: int, forward: bool, npdt=np.float32) -> np.ndarray:
    """[4, M/128, 128] stacked (a.re, a.im, b.re, b.im) combine vectors."""
    k = np.arange(M)
    if forward:
        w = np.exp(-1j * np.pi * k / M)
        a = (1.0 - 1j * w) * 0.5
        b = (1.0 + 1j * w) * 0.5
    else:
        w = np.exp(1j * np.pi * k / M)
        a = (1.0 + 1j * w) * 0.5
        b = (1.0 - 1j * w) * 0.5
    out = np.stack([a.real, a.imag, b.real, b.imag]).astype(npdt)
    return out.reshape(4, M // _LANES, _LANES)


def _glue_call(kernel, planes, ab, interpret):
    """Shared pallas_call: grid over channels, whole [2, R, 128] block
    per step, the combine constants DMAd once (constant index map)."""
    lead = planes.shape[:-2]
    M = planes.shape[-1]
    R = M // _LANES
    C = int(np.prod(lead)) if lead else 1
    p4 = planes.reshape(C, 2, R, _LANES)
    out = pl.pallas_call(
        kernel,
        grid=(C,),
        in_specs=[
            pl.BlockSpec((1, 2, R, _LANES), lambda c: (c, 0, 0, 0)),
            pl.BlockSpec((4, R, _LANES), lambda c: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2, R, _LANES), lambda c: (c, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((C, 2, R, _LANES), planes.dtype),
        interpret=interpret,
    )(p4, ab)
    return out.reshape(planes.shape)


def glue_ok(M: int, dtype) -> bool:
    """Kernel wants lane-aligned f32 tiles (like the MAC) with a
    power-of-two row count: the butterfly reversal (`_rev_axis`) is an
    XOR-complement of the index bits, which is only a full reversal
    when the axis size is a power of two -- a non-pow2 row count would
    silently corrupt the mirror."""
    R = M // _LANES
    return (dtype == jnp.float32 and M % _LANES == 0 and M >= 2 * _LANES
            and (R & (R - 1)) == 0)


def _interp() -> bool:
    try:
        return jax.default_backend() != "tpu"
    except RuntimeError:
        return True


def rfft_planes_pallas(x: jnp.ndarray) -> jnp.ndarray:
    """rfft_planes via half-size complex FFT + Pallas untangle.

    x real [..., 2M] -> packed spectra planes [..., 2, M]. The even/odd
    deinterleave stays XLA (one reshape pass over the time data); the
    hermitian untangle -- the expensive mirror+combine -- runs fused.
    """
    M = x.shape[-1] // 2
    pairs = x.reshape(x.shape[:-1] + (M, 2))
    z = jnp.fft.fft(jax.lax.complex(pairs[..., 0], pairs[..., 1]), axis=-1)
    zp = jnp.stack([z.real, z.imag], axis=-2)           # [..., 2, M]
    ab = jnp.asarray(_ab_consts(M, forward=True))
    return _glue_call(_fwd_kernel, zp, ab, _interp())


def irfft_planes_valid_pallas(p: jnp.ndarray) -> jnp.ndarray:
    """Valid (lower) half inverse via Pallas combine + half-size ifft.

    packed planes [..., 2, M] -> real [..., M]. The combine (mirror +
    a/b + DC/Nyquist unpack) runs fused; the final re/im interleave of
    the first M/2 outputs stays XLA (one pass over the valid samples).
    """
    M = p.shape[-1]
    ab = jnp.asarray(_ab_consts(M, forward=False))
    v = _glue_call(_inv_kernel, p, ab, _interp())
    z = jnp.fft.ifft(jax.lax.complex(v[..., 0, :], v[..., 1, :]), axis=-1)
    h = M // 2
    zv = z[..., :h]
    return jnp.stack([zv.real, zv.imag], axis=-1).reshape(
        z.shape[:-1] + (M,))


def irfft_planes_pallas(p: jnp.ndarray) -> jnp.ndarray:
    """Full-length inverse: Pallas combine + half-size ifft + interleave."""
    M = p.shape[-1]
    ab = jnp.asarray(_ab_consts(M, forward=False))
    v = _glue_call(_inv_kernel, p, ab, _interp())
    z = jnp.fft.ifft(jax.lax.complex(v[..., 0, :], v[..., 1, :]), axis=-1)
    return jnp.stack([z.real, z.imag], axis=-1).reshape(
        z.shape[:-1] + (2 * M,))
