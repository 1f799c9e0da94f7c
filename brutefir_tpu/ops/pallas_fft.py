"""Fully-fused Pallas FFT: 4-step matmul transform + hermitian glue.

The FFT region is the last non-roofline cost in the device step (in-situ
ablation, docs/PERFORMANCE.md): XLA's transform core is fine but the
real<->complex glue lowers to shuffle-heavy multi-pass HLO, and both
glue-only replacements (MXU permutation matmuls, VPU butterfly mirrors)
measured slower in situ because they keep the pass structure. This
module replaces the WHOLE region with one Pallas kernel per direction:
one HBM read of the operand, one write of the result, all permutations
absorbed into matmul structure and constant tables.

Two ideas make the kernel permutation-free:

* **4-step Cooley-Tukey on the MXU.** With bins split k = k2*R + k1
  (R = M/128 rows, L = 128 lanes), the M-point transform is: DFT_R as a
  left-matmul over rows, twiddle multiply, DFT_128 as a right-matmul
  over lanes. The result lands digit-permuted -- bin k at tile position
  (k1, k2) -- and STAYS that way: every spectral-domain consumer (MAC,
  channel mixes, crossfade) is per-bin elementwise or a channel
  contraction, so the engine simply carries ring, bank and spectra in
  the permuted order (the coefficient bank is permuted once at build
  time -- `bin_order`). No un-permute pass ever runs. The reference has
  the same freedom and uses it the same way: FFTW's halfcomplex order
  is whatever the plan picks, and bfconf feeds coefficients through the
  same plan (SURVEY 2.2; fftw_convolver.c:230-389).

* **The hermitian mirror is a conjugate transform, not a shuffle.**
  conj(Z[(M-k) % M]) = DFT(conj z)[k], so the rfft untangle
  ``X = a*Z + b*conj(Z_mirror)`` needs no lane/sublane reversal: run
  the SAME 4-step on the conjugated input -- whose stage-1 matmul
  products are shared with the direct transform (4 products serve both)
  -- and combine elementwise. The inverse direction folds its mirror
  into host-precomputed constants (``b''(j) = conj(b'((M-j) mod M))``)
  the same way. Reversals cost 0 instructions in either direction.

Eligibility: f32, M % 128 == 0, M >= 256 (`fused_ok`). The valid-half
inverse computes only the lower R/2 output rows (half the stage-C
matmul work).

**Measured and REJECTED** (tools/fused_fft_probe.py, TPU v5e,
forced-completion in-scan slopes): flagship shape (26ch, M=8192) fwd
47 vs 29 us XLA / inv 39 vs 48; scale shape (256ch) fwd 331 vs 235 /
inv 334 vs 296. f32 matmuls on the bf16-native MXU cost ~6 passes at
HIGHEST precision, which inflates the 4-step's inherent ~15x FLOP
multiple over a log-N FFT past what the pass fusion saves; only the
flagship inverse wins, and adopting it would spend the margin on the
bank/ring digit permutation. Third and final FFT-region attack after
the MXU-permutation and VPU-butterfly glues -- XLA's fft + fused
shuffle glue stands as the practical floor for bit-parity f32 on this
hardware generation. NOT wired into the engine; kept with parity tests
so the A/B can be re-run on future hardware (a native-f32 or wider-MXU
part flips the arithmetic). NOTE: the CI parity tests run these kernels
in interpret mode on CPU hosts only -- the Mosaic lowering path is NOT
exercised there; a future re-A/B should start with a compiled-path
smoke test on the target hardware before trusting the numbers.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .pallas_glue import _bin0_tile as _bin0  # shared packed-bin-0 mask
from .pallas_glue import _interp  # shared backend probe (one fix point)

_LANES = 128


def fused_ok(M: int, dtype) -> bool:
    return dtype == jnp.float32 and M % _LANES == 0 and M >= 2 * _LANES


def bin_order(M: int) -> np.ndarray:
    """Gather indices turning a natural-order packed spectrum into the
    kernel's digit-permuted order: ``X_perm = X_nat[..., bin_order(M)]``.

    Tile position p = k1 * 128 + k2 holds natural bin k = k2 * R + k1.
    """
    R = M // _LANES
    p = np.arange(M)
    return (p % _LANES) * R + (p // _LANES)


def bin_order_inv(M: int) -> np.ndarray:
    """Inverse gather: ``X_nat = X_perm[..., bin_order_inv(M)]``."""
    return np.argsort(bin_order(M))


@functools.lru_cache()
def _consts_fwd(M: int):
    R = M // _LANES
    k1 = np.arange(R)
    n1 = np.arange(R)
    # W_R^{k1*n1}, W = e^{-2pi i / R}
    ang = 2 * np.pi * np.outer(k1, n1) / R
    C = np.stack([np.cos(ang), -np.sin(ang)])              # [2, R, R]
    n2 = np.arange(_LANES)
    k2 = np.arange(_LANES)
    angd = 2 * np.pi * np.outer(n2, k2) / _LANES
    D = np.stack([np.cos(angd), -np.sin(angd)])            # [2, L, L]
    angt = 2 * np.pi * np.outer(k1, n2) / M
    TW = np.stack([np.cos(angt), -np.sin(angt)])           # [2, R, L]
    # hermitian combine: X = a Z + b conj(Z_mirror), permuted layout
    k = np.arange(M)
    w = np.exp(-1j * np.pi * k / M)
    a = (1.0 - 1j * w) * 0.5
    b = (1.0 + 1j * w) * 0.5
    order = bin_order(M)                  # natural bin at tile position p
    ab = np.stack([a.real[order], a.imag[order],
                   b.real[order], b.imag[order]]).reshape(4, R, _LANES)
    f32 = np.float32
    return C.astype(f32), D.astype(f32), TW.astype(f32), ab.astype(f32)


@functools.lru_cache()
def _consts_inv(M: int, half: bool):
    R = M // _LANES
    k2 = np.arange(_LANES)
    n2 = np.arange(_LANES)
    ang = 2 * np.pi * np.outer(k2, n2) / _LANES            # E[k2, n2], e^{+}
    E = np.stack([np.cos(ang), np.sin(ang)])
    k1 = np.arange(R)
    angt = 2 * np.pi * np.outer(k1, np.arange(_LANES)) / M
    TW = np.stack([np.cos(angt), np.sin(angt)])            # e^{+2pi k1 n2/M}
    Rh = R // 2 if half else R
    n1 = np.arange(Rh)
    angf = 2 * np.pi * np.outer(n1, k1) / R                # F[n1, k1], e^{+}
    F = np.stack([np.cos(angf), np.sin(angf)])
    # v[k] = a'(k) X^[k] + b'(k) conj(Xf[M-k]); the mirror folds into
    # b''(j) = conj(b'((M-j) mod M)) applied to X with bin0 := nyquist
    k = np.arange(M)
    Wp = np.exp(1j * np.pi * k / M)
    ap = (1.0 + 1j * Wp) * 0.5 / M                         # ifft 1/M folded
    bp = (1.0 - 1j * Wp) * 0.5 / M
    bpp = np.conj(bp[(M - k) % M])
    order = bin_order(M)
    ab = np.stack([ap.real[order], ap.imag[order],
                   bpp.real[order], bpp.imag[order]]).reshape(4, R, _LANES)
    f32 = np.float32
    return E.astype(f32), TW.astype(f32), F.astype(f32), ab.astype(f32)


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


def _fwd_kernel(zr_ref, zi_ref, c_ref, d_ref, tw_ref, ab_ref, x_ref):
    zr = zr_ref[0]
    zi = zi_ref[0]
    cr, ci = c_ref[0], c_ref[1]
    # stage 1: DFT_R over rows; the 4 products serve BOTH the direct
    # and the conjugate-input transform (the mirror-free untangle)
    p1r = _dot(cr, zr)
    p1i = _dot(cr, zi)
    p2r = _dot(ci, zr)
    p2i = _dot(ci, zi)
    sr, si = p1r - p2i, p1i + p2r          # DFT(z)
    qr, qi = p1r + p2i, p2r - p1i          # DFT(conj z)
    twr, twi = tw_ref[0], tw_ref[1]
    tr, ti = sr * twr - si * twi, sr * twi + si * twr
    ur, ui = qr * twr - qi * twi, qr * twi + qi * twr
    dr, di = d_ref[0], d_ref[1]
    br = _dot(tr, dr) - _dot(ti, di)       # stage 3: DFT_L over lanes
    bi = _dot(tr, di) + _dot(ti, dr)
    er = _dot(ur, dr) - _dot(ui, di)
    ei = _dot(ur, di) + _dot(ui, dr)
    ar, ai, b_r, b_i = ab_ref[0], ab_ref[1], ab_ref[2], ab_ref[3]
    xr = ar * br - ai * bi + b_r * er - b_i * ei
    xi = ar * bi + ai * br + b_r * ei + b_i * er
    # packed bin 0 (tile [0,0] in the permuted order too): DC rides the
    # real slot (the combine already yields it), Nyquist the imaginary
    xi = jnp.where(_bin0(zr.shape[0]), br - bi, xi)
    x_ref[0, 0] = xr
    x_ref[0, 1] = xi


def _inv_kernel(p_ref, e_ref, tw_ref, f_ref, ab_ref, v_ref):
    xr = p_ref[0, 0]
    xi = p_ref[0, 1]
    R = xr.shape[0]
    b0 = _bin0(R)
    # split packed bin 0: DC feeds the direct term, Nyquist the mirror
    # term (its bin-0 slot is Xfull[M], see the derivation above)
    pr = xr
    pi = jnp.where(b0, 0.0, xi)
    qr = jnp.where(b0, xi, xr)
    qi = pi
    ar, ai, br, bi = ab_ref[0], ab_ref[1], ab_ref[2], ab_ref[3]
    pr, pi = ar * pr - ai * pi, ar * pi + ai * pr
    qr, qi = br * qr - bi * qi, br * qi + bi * qr
    er, ei = e_ref[0], e_ref[1]
    par = _dot(pr, er) - _dot(pi, ei)      # stage A: contract k2
    pai = _dot(pr, ei) + _dot(pi, er)
    qar = _dot(qr, er) - _dot(qi, ei)
    qai = _dot(qr, ei) + _dot(qi, er)
    twr, twi = tw_ref[0], tw_ref[1]
    ptr, pti = par * twr - pai * twi, par * twi + pai * twr
    qtr, qti = qar * twr - qai * twi, qar * twi + qai * twr
    fr, fi = f_ref[0], f_ref[1]
    zpr = _dot(fr, ptr) - _dot(fi, pti)    # stage C: contract k1
    zpi = _dot(fr, pti) + _dot(fi, ptr)
    zqr = _dot(fr, qtr) - _dot(fi, qti)
    zqi = _dot(fr, qti) + _dot(fi, qtr)
    v_ref[0, 0] = zpr + zqr                # z = P + conj(Q)
    v_ref[0, 1] = zpi - zqi


def rfft_planes_fused(x: jnp.ndarray) -> jnp.ndarray:
    """real ``[..., 2M]`` -> digit-permuted packed planes ``[..., 2, M]``.

    The even/odd deinterleave (one strided XLA pass) feeds the fused
    kernel: shared-product dual 4-step transform + hermitian combine.
    """
    M = x.shape[-1] // 2
    R = M // _LANES
    lead = x.shape[:-1]
    C = int(np.prod(lead)) if lead else 1
    pairs = x.reshape(C, M, 2)
    zr = pairs[..., 0].reshape(C, R, _LANES)
    zi = pairs[..., 1].reshape(C, R, _LANES)
    Cm, Dm, TW, ab = (jnp.asarray(a) for a in _consts_fwd(M))
    cs = [
        pl.BlockSpec((2, R, R), lambda c: (0, 0, 0)),
        pl.BlockSpec((2, _LANES, _LANES), lambda c: (0, 0, 0)),
        pl.BlockSpec((2, R, _LANES), lambda c: (0, 0, 0)),
        pl.BlockSpec((4, R, _LANES), lambda c: (0, 0, 0)),
    ]
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(C,),
        in_specs=[pl.BlockSpec((1, R, _LANES), lambda c: (c, 0, 0)),
                  pl.BlockSpec((1, R, _LANES), lambda c: (c, 0, 0))] + cs,
        out_specs=pl.BlockSpec((1, 2, R, _LANES), lambda c: (c, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((C, 2, R, _LANES), jnp.float32),
        interpret=_interp(),
    )(zr, zi, Cm, Dm, TW, ab)
    return out.reshape(lead + (2, M))


def _inv_call(p: jnp.ndarray, half: bool) -> jnp.ndarray:
    M = p.shape[-1]
    R = M // _LANES
    Rh = R // 2 if half else R
    lead = p.shape[:-2]
    C = int(np.prod(lead)) if lead else 1
    p4 = p.reshape(C, 2, R, _LANES)
    E, TW, F, ab = (jnp.asarray(a) for a in _consts_inv(M, half))
    cs = [
        pl.BlockSpec((2, _LANES, _LANES), lambda c: (0, 0, 0)),
        pl.BlockSpec((2, R, _LANES), lambda c: (0, 0, 0)),
        pl.BlockSpec((2, Rh, R), lambda c: (0, 0, 0)),
        pl.BlockSpec((4, R, _LANES), lambda c: (0, 0, 0)),
    ]
    out = pl.pallas_call(
        _inv_kernel,
        grid=(C,),
        in_specs=[pl.BlockSpec((1, 2, R, _LANES),
                               lambda c: (c, 0, 0, 0))] + cs,
        out_specs=pl.BlockSpec((1, 2, Rh, _LANES), lambda c: (c, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((C, 2, Rh, _LANES), jnp.float32),
        interpret=_interp(),
    )(p4, E, TW, F, ab)
    # interleave re/im -> time samples (one XLA pass)
    z = out.reshape(C, 2, Rh * _LANES)
    t = jnp.stack([z[:, 0], z[:, 1]], axis=-1).reshape(C, 2 * Rh * _LANES)
    return t.reshape(lead + (2 * Rh * _LANES,))


def irfft_planes_fused(p: jnp.ndarray) -> jnp.ndarray:
    """digit-permuted packed planes ``[..., 2, M]`` -> real ``[..., 2M]``."""
    return _inv_call(p, half=False)


def irfft_planes_valid_fused(p: jnp.ndarray) -> jnp.ndarray:
    """Valid (lower) half inverse: only the first R/2 output rows run
    through stage C -- half the matmul work and half the output
    traffic of the full inverse."""
    M = p.shape[-1]
    if (M // _LANES) % 2:
        return irfft_planes_fused(p)[..., :M]
    return _inv_call(p, half=True)
