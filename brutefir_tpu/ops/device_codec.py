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

Quantization replicates dither_funs.h:70-114 bit-for-bit in float32:
v = x + 0.5; truncate toward zero; decrement negatives in the integer
domain; clip to [imin, imax] with overflow statistics. The per-channel
meters (clip count, integer peak, clipped-magnitude peak -- bfmod.h:99-104)
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
        imax = fmt.imax
        imin = fmt.imin
        v = y + y.dtype.type(0.5)
        under = v <= y.dtype.type(imin)
        over = v > y.dtype.type(imax)
        clip = under | over
        q = jnp.trunc(jnp.where(clip, 0.0, v)).astype(jnp.int32)
        q = jnp.where(v < 0, q - 1, q)
        q = jnp.where(under, imin, q)
        q = jnp.where(over, imax, q)
        mag = jnp.abs(v)
        meters = jnp.stack([
            jnp.sum(clip.astype(jnp.float32), axis=1),
            jnp.max(jnp.where(clip, mag, 0.0), axis=1),
            jnp.max(jnp.where(clip, 0, jnp.abs(q)), axis=1).astype(jnp.float32),
        ], axis=1)
        out_cols = q.astype(word_dtype)
    words = jnp.zeros((N, open_channels), word_dtype)
    words = words.at[:, selection].set(out_cols.T)
    return words, meters
