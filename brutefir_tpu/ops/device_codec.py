"""On-device sample codec: raw PCM words <-> engine float, inside the step.

The reference converts samples on the CPUs that also run the FFTs
(raw2real/real2raw in the filter processes, bfrun.c:1494-1560, 1876-2006).
The TPU-native equivalent is to fuse format conversion into the jitted
block program itself: the host hands the device the raw *words* it read
(int8/int16/int32/float32 views of the device buffer) and receives raw
words back, so per-block host work collapses to file I/O and the PCIe
transfer shrinks to the wire format's width (an S16 stream moves half the
bytes of decoded float32).

Eligibility (the engine falls back to the host codec otherwise):
  * word-addressable formats in native byte order (S8, S16_NE, S24_4NE,
    S32_NE, FLOAT_NE) plus 3-byte packed S24_LE on little-endian hosts
    (the file bytes are the wire format, sign-extended on device --
    runtime/device_io.py); byte-swapped formats stay host-side;
  * no dither on any output (the HP-TPDF error feedback is a sequential
    recurrence; it stays in the native host codec);
  * no integer/subsample delay lines (they hold host state). Mutes ARE
    handled here (a zero mask is exactly the reference's zeroed buffer).

Quantization replicates dither_funs.h:70-114 bit-for-bit: the reference
promotes its float path through the DOUBLE quantizer
(fftw_convolver.c:447-473), so v = (double)x + 0.5, truncate toward
zero, decrement negatives in the integer domain, clip to float-rounded
[imin, imax] bounds. quantize_nd_exact reproduces those f64 semantics
exactly with f32/int32 ops (no f64 on device). The per-channel meters
(clip count, integer peak, clipped-magnitude peak -- bfmod.h:99-104)
come back as a small side output.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_WORD_DTYPES = {
    ("S8", 1): np.int8,
    ("S16", 2): np.int16,
    ("S24_4", 4): np.int32,
    ("S32", 4): np.int32,
    ("FLOAT", 4): np.float32,
}


def device_format_word(fmt) -> np.dtype | None:
    """The numpy word dtype for a device-codec-eligible format, else None."""
    if fmt.bytes == 3:
        return None
    if fmt.bytes > 1 and fmt.little_endian != np.little_endian:
        # endianness is irrelevant for 1-byte formats (sampleformat.py
        # registers S8 with a nominal value) -- do not demote S8 to the
        # host codec on big-endian hosts
        return None
    if fmt.is_float:
        return np.dtype(np.float32) if fmt.bytes == 4 else None
    return np.dtype({1: np.int8, 2: np.int16, 4: np.int32}[fmt.bytes])


def _nd_clip_thresholds(imin: int, imax: int) -> tuple:
    """Exact float32 decision thresholds for the reference's double-
    precision clip tests.

    The reference's no-dither float path promotes through the DOUBLE
    quantizer with float-rounded bounds (real2rawf_no_dither ->
    ditherd_real2int_no_dither, fftw_convolver.c:447-473): with
    v = (double)y + 0.5, under ⟺ v <= (double)(float)imin and
    over ⟺ v > (double)(float)imax. For float32 y these are exactly
    y <= rmin_f - 0.5 and y > rmax_f - 0.5; returns the float32 grid
    points (under_t, over_t) such that under ⟺ y < under_t and
    over ⟺ y >= over_t as pure f32 comparisons.
    """
    def next_above(x64):
        # smallest float32 strictly greater than the real number x64
        c = np.float32(x64)
        if np.float64(c) > x64:
            return c
        return np.nextafter(c, np.float32(np.inf))

    under_t = next_above(np.float64(np.float32(imin)) - 0.5)
    over_t = next_above(np.float64(np.float32(imax)) - 0.5)
    return under_t, over_t


def quantize_nd_exact(y: jnp.ndarray, imin: int, imax: int):
    """Mid-tread no-dither quantizer, bit-equal to the host/reference
    double-precision path (dither_funs.h:70-114), in f32/int32 ops.

    A plain f32 ``y + 0.5`` loses the half above 2^23 (1 LSB divergence
    over the whole upper range) and f32(imax) rounds UP for 32-bit
    formats (missing full-scale clips). Instead: split y into exact
    integer + fraction, decide the half-step and the v<0 branch with
    exact comparisons, and clip against thresholds precomputed in f64.

    Returns (q int32, under bool, over bool).
    """
    rd = y.dtype
    under_t, over_t = _nd_clip_thresholds(imin, imax)
    under = y < rd.type(under_t)
    over = y >= rd.type(over_t)
    clip = under | over
    yc = jnp.where(clip, rd.type(0), y)       # keep trunc in int32 range
    t = yc.astype(jnp.int32)                  # trunc toward zero, exact
    f = yc - t.astype(rd)                     # exact: |f| < 1
    half = rd.type(0.5)
    # v = y + 0.5 computed in f64 equals t + (f + 0.5) exactly; all
    # branch decisions reduce to exact f32 comparisons on f
    s_pos = t + (f >= half).astype(jnp.int32)
    v_neg = (t < 0) | ((t == 0) & (f < -half))
    s_neg = jnp.where(v_neg, t - 1 + (f > -half).astype(jnp.int32), 0)
    q = jnp.where(yc >= 0, s_pos, s_neg)
    q = jnp.where(under, jnp.int32(imin), q)
    q = jnp.where(over, jnp.int32(imax), q)
    return q, under, over


def scatter_words(cols: jnp.ndarray, selection: np.ndarray,
                  open_channels: int, word_dtype) -> jnp.ndarray:
    """[P_used, N] per-channel samples -> [N, open_ch] wire words.

    The single definition of the used-channel -> open-column scatter;
    the dithered output path (runtime/device_io.py) shares it so wire
    packing can never drift between dithered and undithered devices.
    """
    words = jnp.zeros((cols.shape[1], open_channels), word_dtype)
    return words.at[:, selection].set(cols.astype(word_dtype).T)


def decode_words(words: jnp.ndarray, selection: np.ndarray,
                 virt_map: np.ndarray, rd) -> jnp.ndarray:
    """[N, open_ch] raw words -> [C_virtual, N] float at integer scale.

    ``selection`` picks used physical columns; ``virt_map`` maps virtual
    channels to used-channel rows (the config's ``mapping:``).
    """
    cols = words[:, selection]                # [N, used]
    x = cols.astype(rd).T                     # [used, N]
    return x[virt_map]                        # [C, N]


def encode_words(y: jnp.ndarray, fmt, selection: np.ndarray,
                 open_channels: int, word_dtype) -> tuple:
    """[P_used, N] float -> ([N, open_ch] raw words, [P_used, 3] meters).

    Integer formats quantize mid-tread with reference clip semantics;
    float formats pass through. Meters: [n_overflows, peak, int_peak].
    """
    P, N = y.shape
    if fmt.is_float:
        mag = jnp.abs(y)
        meters = jnp.stack([
            jnp.sum((mag > 1.0).astype(jnp.float32), axis=1),
            jnp.max(mag, axis=1),
            jnp.zeros(P, jnp.float32),
        ], axis=1)
        out_cols = y.astype(word_dtype)
    else:
        q, under, over = quantize_nd_exact(y, fmt.imin, fmt.imax)
        clip = under | over
        # meters only: the float-rounded |y + 0.5| is a reported peak,
        # not part of the sample bit contract
        mag = jnp.abs(y + y.dtype.type(0.5))
        meters = jnp.stack([
            jnp.sum(clip.astype(jnp.float32), axis=1),
            jnp.max(jnp.where(clip, mag, 0.0), axis=1),
            jnp.max(jnp.where(clip, 0, jnp.abs(q)), axis=1).astype(jnp.float32),
        ], axis=1)
        out_cols = q.astype(word_dtype)
    return scatter_words(out_cols, selection, open_channels, word_dtype), \
        meters
