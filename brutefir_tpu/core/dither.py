"""High-passed TPDF dither with error feedback.

Bit-faithful reimplementation of the reference dither subsystem
(`dither.c:37-139`, `dither_funs.h:7-68`, `dither.h:28-38`):

* a maximally equidistributed combined Tausworthe generator (GSL flavor)
  seeded with the fixed seed 0 (-> 1) fills a shared int8 random table sized
  ``n_channels * spacing + 1`` where spacing ~ 10 s of audio per channel;
* the TPDF dither value for sample n is ``randmap[tab[p+n] - tab[p+n-1]]``
  -- the difference of consecutive uniform bytes (triangular pdf) mapped
  through a table that also folds in the +0.5 mid-tread offset;
* quantization applies {1,-1} error feedback (first-order high pass) before
  adding dither, then truncates; feedback state persists across blocks.

The error-feedback recurrence is sequential per sample; the numpy path here
runs it as a Python loop (correct, slow). The native C++ codec module
(:mod:`brutefir_tpu.core.native`) provides the fast path with identical
semantics; ``DitherState.quantize`` automatically uses it when available.
"""

from __future__ import annotations

import numpy as np

from .codecs import Overflow
from .sampleformat import SampleFormat

RANDTAB_SPACING = 10  # seconds (dither.c:21)
MIN_RANDTAB_SPACING = 1


def tausrand_table(n: int, seed: int = 0) -> np.ndarray:
    """Generate n int8 values with the reference Tausworthe generator.

    Exact replication of `dither.c:37-71` (tausinit + tausrand), including
    the LCG seeding and six warm-up draws. Vectorization note: the generator
    is sequential, but it only runs once at startup; we run it in a tight
    numpy-scalar loop over uint32 to keep exact modular arithmetic.
    """
    M = 0xFFFFFFFF
    if seed == 0:
        seed = 1
    s0 = (69069 * seed) & M
    s1 = (69069 * s0) & M
    s2 = (69069 * s1) & M
    state = [s0, s1, s2]

    def step():
        # every intermediate wraps to uint32 like the C macro's arithmetic:
        # the left-shifts must be masked BEFORE the xor/right-shift, or the
        # sequence diverges (verified against reference-compiled golden
        # vectors, tests/test_golden_reference.py)
        s0, s1, s2 = state
        s0 = ((((s0 & 4294967294) << 12) & M)
              ^ ((((s0 << 13) & M) ^ s0) >> 19))
        s1 = ((((s1 & 4294967288) << 4) & M)
              ^ ((((s1 << 2) & M) ^ s1) >> 25))
        s2 = ((((s2 & 4294967280) << 17) & M)
              ^ ((((s2 << 3) & M) ^ s2) >> 11))
        state[0], state[1], state[2] = s0, s1, s2
        return (s0 ^ s1 ^ s2) & M

    for _ in range(6):
        step()
    out = np.empty(n, dtype=np.uint8)
    for i in range(n):
        out[i] = step() & 0xFF
    return out.view(np.int8)  # (int8_t) cast wraps (dither.c:108)


def build_randmap(dtype=np.float32) -> np.ndarray:
    """The dither-difference -> float map of `dither.c:112-131`.

    Indexed by (tab[n] - tab[n-1]) + 256, covering [-256, 254].
    """
    m = np.empty(512, dtype=dtype)
    m[0] = -0.5  # index -256
    n = np.arange(-255, 254, dtype=np.float64)
    m[1:510] = (0.5 + 1.0 / 255.0 + n / 255.0).astype(dtype)
    m[510] = 1.5  # index 254
    # Index 255 *is* reachable (tab diff of 127 - (-128)) but the reference
    # allocates only [-256, 254] and reads past the end there
    # (dither.c:115-131) -- an upstream out-of-bounds read. We define it by
    # continuing the line so the TPDF stays bounded.
    m[511] = dtype(1.5 + 1.0 / 255.0)
    return m


class DitherTable:
    """Shared random table + per-channel pointers (`dither_init`)."""

    def __init__(self, n_channels: int, sample_rate: int, max_size: int,
                 max_samples_per_loop: int, dtype=np.float32):
        spacing = RANDTAB_SPACING * sample_rate
        minspacing = max(MIN_RANDTAB_SPACING * sample_rate, max_samples_per_loop)
        if spacing < minspacing:
            spacing = minspacing
        if max_size > 0 and n_channels * spacing > max_size:
            spacing = max_size // n_channels
        if spacing < minspacing:
            # the floor is whichever of the two minspacing terms binds
            raise ValueError(
                f"maximum dither table size {max_size} bytes is too small, "
                f"must at least be {n_channels * minspacing} bytes")
        self.size = n_channels * spacing + 1
        self.spacing = spacing
        self.tab = tausrand_table(self.size)
        self.randmap = build_randmap(dtype)
        self.dtype = dtype

    def new_state(self, channel_index: int) -> "DitherState":
        return DitherState(self, channel_index * self.spacing + 1)


class DitherState:
    """Per-channel dither state (`struct dither_state`, dither.h:17-22)."""

    def __init__(self, table: DitherTable, randtab_ptr: int):
        self.table = table
        self.randtab_ptr = randtab_ptr
        self.sf = np.zeros(2, dtype=table.dtype)  # error feedback [sf0, sf1]

    def _next_window(self, n: int) -> np.ndarray:
        """Advance the table pointer; return the dither floats for n samples.

        Mirrors dither_preloop_real2int_hp_tpdf (dither.h:28-38): on wrap,
        tab[0] takes the previous last value so the n-1 difference chain
        stays continuous.
        """
        t = self.table
        if self.randtab_ptr + n >= t.size:
            t.tab[0] = t.tab[self.randtab_ptr - 1]
            self.randtab_ptr = 1
        p = self.randtab_ptr
        self.randtab_ptr += n
        cur = t.tab[p : p + n].astype(np.int32)
        prev = t.tab[p - 1 : p + n - 1].astype(np.int32)
        return t.randmap[(cur - prev) + 256]

    def quantize(self, x: np.ndarray, fmt: SampleFormat, overflow: Overflow) -> np.ndarray:
        """HP-TPDF dithered mid-tread quantization (`dither_funs.h:7-68`)."""
        n = x.shape[0]
        d = self._next_window(n)
        if x.dtype == np.float32 and self.table.dtype == np.float32:
            try:
                from . import native
                if native.available():
                    return native.dither_quantize(
                        np.ascontiguousarray(x, np.float32), d, self.sf,
                        fmt, overflow)
            except Exception:
                pass
        return self._quantize_py(x, d, fmt, overflow)

    def _quantize_py(self, x: np.ndarray, d: np.ndarray, fmt: SampleFormat,
                     overflow: Overflow) -> np.ndarray:
        rt = self.table.dtype
        imin, imax = fmt.imin, fmt.imax
        rmin, rmax = rt(imin), rt(imax)
        # bits==32 float32: rmax rounds UP to 2^31, so d == 2^31 would
        # pass `d > rmax` and overflow the int32 store (the reference's
        # cast there is UB -- same clip_hi rule as codec.cpp)
        clip_hi = (rmax if float(rmax) > imax
                   else np.nextafter(rmax, rt(np.inf)))
        sf0, sf1 = rt(self.sf[0]), rt(self.sf[1])
        out = np.empty(x.shape[0], dtype=np.int32)
        n_ovf = 0
        largest = overflow.largest
        intlargest = overflow.intlargest
        for i in range(x.shape[0]):
            # feedback difference first, then add -- the reference's
            # `real_sample += sf[0] - sf[1]` association; (x + sf0) - sf1
            # rounds differently in float32 (golden-vector verified)
            real = rt(x[i]) + (sf0 - sf1)
            sf1 = sf0
            dithered = real + rt(d[i])
            if dithered != dithered:
                # NaN: saturate + count + reset the feedback, like the
                # native path (codec.cpp) -- int(NaN) would raise
                out[i] = imin
                n_ovf += 1
                sf0 = rt(0.0)
                continue
            # clip peak compares `real` but stores `dithered` -- the
            # reference's exact accounting (dither_funs.h:38-39,52-53),
            # pinned by the golden-vector tests
            if dithered < 0:
                if dithered <= rmin:
                    s = imin
                    n_ovf += 1
                    if real < -largest:
                        largest = float(-dithered)
                else:
                    s = int(dithered) - 1
                    if -s > intlargest:
                        intlargest = -s
            else:
                if dithered >= clip_hi:
                    s = imax
                    n_ovf += 1
                    if real > largest:
                        largest = float(dithered)
                else:
                    s = int(dithered)
                    if s > intlargest:
                        intlargest = s
            sf0 = real - rt(s)
            out[i] = s
        self.sf[0], self.sf[1] = sf0, sf1
        overflow.n_overflows += n_ovf
        overflow.largest = largest
        overflow.intlargest = intlargest
        return out
