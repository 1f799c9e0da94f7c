#!/usr/bin/env python
"""Probe: can TPU reach float64-equivalent precision via double-double?

The reference supports `float_bits: 64` (+30-50% CPU,
`/root/reference/brutefir.html:2284-2302`). XLA:TPU has no f64 FFT, so
the rebuild runs f64 configs on the CPU backend (docs/PARITY.md #12).
This tool measures the one plausible device-side alternative: double-
double (two-f32, Dekker/Knuth error-free transforms) arithmetic for the
convolution pipeline -- a DD radix-2 complex FFT plus a DD spectral
MAC -- against the CPU float64 oracle, and times it against the native
f32 path on the same shape.

DD arithmetic notes (all round-to-nearest f32, no FMA assumed):
* two_sum / split / two_prod are the textbook error-free transforms;
  `split` uses 2^12+1 (f32 has a 24-bit significand).
* the DD FFT runs the decimation-in-time radix-2 ladder with twiddles
  precomputed in f64 and stored as (hi, lo) f32 pairs, butterflies in
  DD complex arithmetic -- pure VPU elementwise work.
* the DD MAC accumulates the B partition products per bin in DD.

Expected outcome (and why this is a "formal burial" rather than a
feature): accuracy lands near f64 (~1e-14 relative), but the cost is
dozens of VPU flops per butterfly flop, with zero MXU participation --
orders of magnitude off the f32 path. The measured numbers go into
docs/PERFORMANCE.md / PARITY #12.

Usage: python tools/dd_precision_probe.py   (TPU host; CPU also works)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

N = int(os.environ.get("DD_N", "2048"))       # FFT length (2N of a 1024 blk)
B = int(os.environ.get("DD_B", "8"))          # partitions for the MAC
C = int(os.environ.get("DD_C", "4"))          # channels

import jax                                     # noqa: E402
import jax.numpy as jnp                        # noqa: E402

f32 = jnp.float32
_SPLITTER = np.float32(4097.0)                 # 2^12 + 1


# ---- error-free transforms (Dekker/Knuth), f32 ---------------------------
#
# Each EFT relies on exact IEEE rounding of specific intermediate
# expressions. Under jit, XLA's fp contraction (a*b+c -> fma; default
# xla_allow_excess_precision) rewrites them -- e.g. Dekker's split
# computes `c - (c - a)` as fma(SPLITTER, a, -a), destroying the hi/lo
# decomposition (measured: DD FFT error 5e-15 eager -> 1.6e-8 jitted).
# An optimization_barrier around the critical intermediate pins the
# evaluation order without materializing anything.

_ob = jax.lax.optimization_barrier


def two_sum(a, b):
    s = _ob(a + b)
    bb = _ob(s - a)
    err = (a - _ob(s - bb)) + (b - bb)
    return s, err


def quick_two_sum(a, b):
    # requires |a| >= |b|
    s = _ob(a + b)
    return s, b - _ob(s - a)


def split(a):
    c = _ob(_SPLITTER * a)
    hi = c - _ob(c - a)
    return hi, a - hi


def two_prod(a, b):
    p = _ob(a * b)
    ahi, alo = split(a)
    bhi, blo = split(b)
    err = ((_ob(ahi * bhi) - p) + _ob(ahi * blo) + _ob(alo * bhi)) \
        + alo * blo
    return p, err


# ---- double-double scalar ops (each value = (hi, lo) f32 pair) -----------

def dd_add(x, y):
    s, e = two_sum(x[0], y[0])
    e = e + x[1] + y[1]
    return quick_two_sum(s, e)


def dd_mul(x, y):
    p, e = two_prod(x[0], y[0])
    e = e + x[0] * y[1] + x[1] * y[0]
    return quick_two_sum(p, e)


def dd_neg(x):
    return (-x[0], -x[1])


# ---- DD complex ops (value = ((re_hi, re_lo), (im_hi, im_lo))) ------------

def ddc_add(x, y):
    return dd_add(x[0], y[0]), dd_add(x[1], y[1])


def ddc_sub(x, y):
    return dd_add(x[0], dd_neg(y[0])), dd_add(x[1], dd_neg(y[1]))


def ddc_mul(x, y):
    re = dd_add(dd_mul(x[0], y[0]), dd_neg(dd_mul(x[1], y[1])))
    im = dd_add(dd_mul(x[0], y[1]), dd_mul(x[1], y[0]))
    return re, im


def ddc_from_f64(z):
    """numpy complex128 -> DD complex pytree of f32 arrays."""
    def dd(v):
        hi = v.astype(np.float32)
        lo = (v - hi.astype(np.float64)).astype(np.float32)
        return jnp.asarray(hi), jnp.asarray(lo)
    return dd(z.real), dd(z.imag)


def ddc_to_f64(z):
    re = np.asarray(z[0][0], np.float64) + np.asarray(z[0][1], np.float64)
    im = np.asarray(z[1][0], np.float64) + np.asarray(z[1][1], np.float64)
    return re + 1j * im


# ---- DD radix-2 DIT FFT ---------------------------------------------------

def dd_fft(x, twiddles):
    """x: DD complex [..., N] (bit-reversed input order), N = 2^k.
    twiddles[s]: DD complex [N/2] broadcastable per stage."""
    n = x[0][0].shape[-1]
    stages = n.bit_length() - 1
    for s in range(stages):
        m = 2 << s              # butterfly span
        half = 1 << s
        sh = x[0][0].shape[:-1]
        resh = sh + (n // m, m)

        def view(a):
            return a.reshape(resh)

        xv = jax.tree.map(view, x, is_leaf=lambda t: hasattr(t, "reshape"))
        lo = jax.tree.map(lambda a: a[..., :half], xv,
                          is_leaf=lambda t: hasattr(t, "reshape"))
        hi = jax.tree.map(lambda a: a[..., half:], xv,
                          is_leaf=lambda t: hasattr(t, "reshape"))
        w = twiddles[s]
        t = ddc_mul(hi, w)
        top = ddc_add(lo, t)
        bot = ddc_sub(lo, t)
        x = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=-1).reshape(
                sh + (n,)),
            top, bot, is_leaf=lambda t: hasattr(t, "reshape"))
    return x


def make_twiddles(n):
    tw = []
    stages = n.bit_length() - 1
    for s in range(stages):
        half = 1 << s
        k = np.arange(half)
        w = np.exp(-2j * np.pi * k / (2 * half))      # f64
        tw.append(ddc_from_f64(w))
    return tw


def bitrev_perm(n):
    bits = n.bit_length() - 1
    idx = np.arange(n)
    rev = np.zeros(n, np.int64)
    for b in range(bits):
        rev |= ((idx >> b) & 1) << (bits - 1 - b)
    return rev


# ---- the probe ------------------------------------------------------------

def main():
    rng = np.random.default_rng(11)
    x64 = (rng.standard_normal((C, N)) * 0.5)            # real f64 signal
    h64 = (rng.standard_normal((B, N)) * 0.1)            # partition taps

    # oracle: f64 spectral pipeline (numpy)
    X64 = np.fft.fft(x64)                                # [C, N] c128
    H64 = np.fft.fft(h64)                                # [B, N]
    Y64 = (X64[:, None, :] * H64[None, :, :]).sum(1)     # MAC over B
    y64 = np.fft.ifft(Y64).real

    rev = bitrev_perm(N)
    tw = make_twiddles(N)

    # ---- DD path on device
    def run_dd(xr_hi, xr_lo):
        x = ((xr_hi[..., rev], xr_lo[..., rev]),
             (jnp.zeros_like(xr_hi), jnp.zeros_like(xr_lo)))
        X = dd_fft(x, tw)                                # [C, N]
        # DD MAC over B partitions
        acc = None
        for b in range(B):
            Hb = jax.tree.map(lambda a: a[b], Hdd,
                              is_leaf=lambda t: hasattr(t, "shape"))
            prod = ddc_mul(X, Hb)
            acc = prod if acc is None else ddc_add(acc, prod)
        return acc

    # DD split of the inputs (exactly representable split of the f64)
    xr_hi = x64.astype(np.float32)
    xr_lo = (x64 - xr_hi.astype(np.float64)).astype(np.float32)

    # H in DD, from the f64 FFT (coeff preprocessing runs offline in f64
    # on the host in both the reference and this rebuild, so the bank
    # itself can be DD-split exactly)
    Hdd = ddc_from_f64(H64)

    jrun = jax.jit(run_dd)
    Ydd = jrun(jnp.asarray(xr_hi), jnp.asarray(xr_lo))
    Ydd = jax.block_until_ready(Ydd)
    Y_dd = ddc_to_f64(Ydd)

    # ---- f32 reference path on device (H passed as f32 planes: complex
    # closure constants cannot materialize through the remote relay)
    def run_f32(xr, hr, hi):
        X = jnp.fft.fft(xr.astype(jnp.complex64))
        H = jax.lax.complex(hr, hi)
        Y = (X[:, None, :] * H[None, :, :]).sum(1)
        return jnp.stack([Y.real, Y.imag], axis=-1)

    hr32 = jnp.asarray(H64.real.astype(np.float32))
    hi32 = jnp.asarray(H64.imag.astype(np.float32))
    jrun32 = jax.jit(run_f32)
    y32p = np.asarray(jax.block_until_ready(jrun32(
        jnp.asarray(x64.astype(np.float32)), hr32, hi32)))
    Y32 = y32p[..., 0] + 1j * y32p[..., 1]

    def relerr(y):
        return float(np.linalg.norm(y - Y64) / np.linalg.norm(Y64))

    print(f"shape C={C} N={N} B={B}")
    print(f"rel L2 error vs f64 oracle: dd={relerr(Y_dd):.3e} "
          f"f32={relerr(Y32):.3e}")

    # ---- timing: in-scan slope with a carry-dependent input so XLA
    # cannot hoist the body, forced completion via scalar fetch
    # (docs/PERFORMANCE.md probe rules; per-dispatch relay cost would
    # otherwise swamp these sub-ms bodies)
    SCAN = 16

    def scan_time(fn, *args):
        @jax.jit
        def run(acc, *a):
            def step(c, _):
                a0 = a[0] + c * jnp.float32(1e-30)
                y = fn(a0, *a[1:])
                leaf = jax.tree.leaves(y)[0]
                return c + jnp.sum(leaf) * jnp.float32(1e-12), ()
            c, _ = jax.lax.scan(step, acc, None, length=SCAN)
            return c

        acc = run(jnp.float32(0), *args)
        float(np.asarray(acc))
        times = {}
        for nrep in (1, 3):
            t0 = time.perf_counter()
            for _ in range(nrep):
                acc = run(acc, *args)
            float(np.asarray(acc))
            times[nrep] = time.perf_counter() - t0
        return (times[3] - times[1]) / (2 * SCAN) * 1e3

    t_dd = scan_time(lambda xh: run_dd(xh, jnp.asarray(xr_lo)),
                     jnp.asarray(xr_hi))
    t_32 = scan_time(lambda xr: run_f32(xr, hr32, hi32),
                     jnp.asarray(x64.astype(np.float32)))
    print(f"time ms: dd={t_dd:.3f} f32={t_32:.3f} ratio={t_dd / t_32:.1f}x")
    print(f"RESULT dd_rel={relerr(Y_dd):.3e} f32_rel={relerr(Y32):.3e} "
          f"dd_ms={t_dd:.3f} f32_ms={t_32:.3f}")


if __name__ == "__main__":
    main()
