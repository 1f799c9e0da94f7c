"""Device-resident HP-TPDF dither with error feedback.

The reference's dithered quantizer (`dither_funs.h:7-68`) is a sequential
per-sample recurrence:

    real[i] = x[i] + e[i-1] - e[i-2]        # {1,-1} error feedback
    s[i]    = floor(real[i] + d[i])         # dither d folds the mid-tread
    e[i]    = real[i] - s[i]                #   +0.5 offset (dither.c randmap)

A literal ``lax.scan`` over 8192 such steps starves the VPU. The TPU
formulation here removes the sequential dependence exactly:

With t[i] = real[i] + d[i] and g[i] = t[i] mod 1, substitute
e[i] = g[i] - d[i] into the recurrence:

    t[i] = v[i] + g[i-1] - g[i-2],   v[i] = x[i] + d[i] - d[i-1] + d[i-2]
    g[i] = (v[i] + g[i-1] - g[i-2]) mod 1

Because adding integers never changes a value mod 1, ``g`` equals the
mod-1 reduction of the *linear* recurrence G[i] = v[i] + G[i-1] - G[i-2],
whose kernel h (h[k] = h[k-1] - h[k-2]) is periodic with period 6:
1, 1, 0, -1, -1, 0.  So

    G[i] = sum_j c[(i - j) mod 6] * v[j],   c = [1, 1, 0, -1, -1, 0]

which is six masked cumulative sums — fully parallel.  The mod-1
arithmetic runs in **wrapping int32 fixed point** (1 ulp = 2^-32), so the
prefix sums are exact mod 1 regardless of block length; only the initial
float->fixed conversion rounds (<= 2^-25 per element, accumulating to
< 1e-4 over an 8192 block — far below the f32 recurrence's own rounding,
which at 2^20 amplitudes works on a 1/16-LSB grid).

The quantization itself splits x into integer + fractional parts so the
floor() decision keeps full precision at any amplitude (the reference's
f32 ``real`` loses dither resolution above ~2^20).

Parity deviations (see docs/PARITY.md):
* outputs match the reference's f32 recurrence bit-for-bit at small
  amplitudes and within +-1..2 LSB (unbiased, identical noise shaping)
  at large amplitudes, where the difference is the *reference's* f32
  rounding;
* on a clipped sample the reference feeds the full clip error into the
  feedback filter; this path keeps the unclipped feedback (the next
  samples see the dither error, not the clip distortion).

The dither sequence itself is bit-exact: the same Tausworthe table and
randmap (core/dither.py) live on device, with the reference's pointer
wrap semantics (dither.h:28-38) carried as explicit state.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# period-6 kernel of G[i] = v[i] + G[i-1] - G[i-2]
_KERNEL = np.array([1, 1, 0, -1, -1, 0], np.int32)


def dither_window(tab: jax.Array, randmap: jax.Array, ptr: jax.Array,
                  last: jax.Array, n: int, size: int):
    """Per-channel dither floats for one block + advanced pointer state.

    tab: [size] int8 (device copy of the shared Tausworthe table)
    randmap: [512] f32   ptr: [C] i32   last: [C] i32 (previous byte —
    replaces the reference's ``tab[0] = tab[ptr-1]`` in-place wrap write)
    Returns (d [C, n] f32, new_ptr [C], new_last [C]).
    """
    # wrap BEFORE the window when it would run off the table
    # (dither.h:28-33); the table is sized so a block always fits
    wraps = ptr + n >= size
    p = jnp.where(wraps, 1, ptr)                      # [C]
    idx = p[:, None] + jnp.arange(n, dtype=jnp.int32)[None, :]
    cur = tab[idx].astype(jnp.int32)                  # [C, n]
    # prev is cur shifted by one sample; only column 0 needs its own
    # (tiny [C]) gather — and on a wrap it continues from the last
    # consumed byte (the reference writes it into tab[0])
    prev0 = jnp.where(wraps, last, tab[p - 1].astype(jnp.int32))
    prev = jnp.concatenate([prev0[:, None], cur[:, :-1]], axis=1)
    d = randmap[(cur - prev) + 256]                   # [C, n] f32
    return d, p + n, cur[:, -1]


def dither_quantize(x: jax.Array, d: jax.Array, sf: jax.Array,
                    imin: int, imax: int):
    """Parallel HP-TPDF dithered quantization of one block.

    x: [C, N] f32 (scaled to integer units)   d: [C, N] f32 dither
    sf: [C, 2] f32 error-feedback state (sf[:,0]=e[-1], sf[:,1]=e[-2])
    Returns (s [C, N] i32, new_sf [C, 2], meters [C, 3] f32:
    [overflow count, clipped |peak|, unclipped int peak]).
    """
    C, N = x.shape
    f32 = x.dtype.type
    xi = jnp.floor(x)                                  # exact in f32
    xf = x - xi                                        # [0, 1), exact
    # v[i] = x[i] + d[i] - d[i-1] + d[i-2] (+ feedback seed at i<2);
    # only the small parts enter the mod-1 path
    vf = xf + d
    vf = vf.at[:, 1:].add(-d[:, :-1])
    vf = vf.at[:, 2:].add(d[:, :-2])
    vf = vf.at[:, 0].add(sf[:, 0] - sf[:, 1])
    if N > 1:
        vf = vf.at[:, 1].add(-sf[:, 0])
    # fixed-point mod-1: 1 ulp = 2^-32 (<<8 after a 2^24 scale keeps the
    # f32->int conversion exact; int32 adds wrap, i.e. exact mod 1)
    V = (jnp.round(jnp.mod(vf, 1.0) * f32(2 ** 24)).astype(jnp.int32)
         << 8)                                         # [C, N]
    i_idx = jnp.arange(N, dtype=jnp.int32)
    kern = jnp.asarray(_KERNEL)
    G = jnp.zeros((C, N), jnp.int32)
    for r in range(6):
        mask = (i_idx % 6 == r)
        P = jnp.cumsum(jnp.where(mask[None, :], V, 0), axis=1)
        coef = kern[(i_idx - r) % 6]
        G = G + coef[None, :] * P
    g = (jax.lax.bitcast_convert_type(G, jnp.uint32).astype(f32)
         * f32(2.0 ** -32))                            # frac(G) in [0, 1)
    # t[i] = v[i] + g[i-1] - g[i-2]; the small part carries the floor
    tf = vf
    tf = tf.at[:, 1:].add(g[:, :-1])
    if N > 1:
        tf = tf.at[:, 2:].add(-g[:, :-2])
    t_val = xi + tf                                    # the dithered value
    s = xi + jnp.floor(tf)                             # full-precision floor
    # host clip/count semantics (dither_funs.h / _quantize_py): count on
    # the PRE-floor dithered value — ``dithered <= rmin`` or ``> rmax``
    # (e.g. t in (imax, imax+1) floors to imax but still counts).
    # f32(imax) rounds UP to 2^31 for 32-bit formats, so the upper test
    # uses the exact f32 threshold (over ⟺ t >= over_t) and the clamp
    # stays below the int32 cast limit, with clipped samples forced to
    # imax like the host (codec.cpp clip_hi rule).
    c = np.float32(imax)
    over_t = (c if np.float64(c) > imax
              else np.nextafter(c, np.float32(np.inf)))
    clamp_hi = np.nextafter(np.float32(over_t), np.float32(-np.inf))
    over = t_val >= f32(over_t)
    ovf = (t_val <= f32(imin)) | over
    sq = jnp.where(over, jnp.int32(imax),
                   jnp.clip(s, f32(imin), f32(clamp_hi)).astype(jnp.int32))
    # meters in encode_words' convention: [n_overflows, clip peak, int peak]
    mag = jnp.abs(t_val)
    meters = jnp.stack([
        jnp.sum(ovf.astype(f32), axis=1),
        jnp.max(jnp.where(ovf, mag, 0.0), axis=1),
        jnp.max(jnp.where(ovf, 0, jnp.abs(sq)), axis=1).astype(f32),
    ], axis=1)
    # e[i] = g[i] - d[i]; block boundary carries the last two
    sf0 = g[:, -1] - d[:, -1]
    sf1 = (g[:, -2] - d[:, -2]) if N > 1 else sf[:, 0]
    return sq, jnp.stack([sf0, sf1], axis=1), meters
