"""Per-op device timing: split the opaque 'device' bucket into stages.

The reference's benchmark table has 8 columns (raw2real / time2freq /
mixscale1 / convolve / mixscale2 / freq2time / real2raw / total, printed
from bfrun.c:2035-2078 with rdtsc stage timers). Here the whole device
step is one fused XLA program, so the split is *calibrated*: each op runs
alone inside a data-dependent ``lax.scan`` at the engine's exact shapes,
its per-iteration cost is the slope between two scan lengths (forced
complete by a scalar fetch -- remote relays ack ``block_until_ready``
early, see docs/PERFORMANCE.md), and the measured device bucket is then
apportioned by those slopes. Enabled by ``BRUTEFIR_TPU_STAGE_BREAKDOWN=1``
with ``benchmark: true;``.
"""

from __future__ import annotations

import time

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import partconv

STAGES = ("t2f", "mix1", "conv", "mix2", "f2t")


def _slope(step_fn, init, k_lo: int = 8, k_hi: int = 72, reps: int = 3):
    """Median per-iteration seconds of step_fn via two scan lengths."""

    def make(k):
        def run(c0):
            def body(c, _):
                return step_fn(c), None
            c, _ = jax.lax.scan(body, c0, None, length=k)
            return jax.tree.leaves(c)[0].ravel()[:4].sum()
        return jax.jit(run)

    lo, hi = make(k_lo), make(k_hi)
    float(np.asarray(lo(init)))          # compile + drain
    float(np.asarray(hi(init)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(lo(init)))
        t1 = time.perf_counter()
        float(np.asarray(hi(init)))
        t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / (k_hi - k_lo))
    return max(1e-9, sorted(ts)[len(ts) // 2])


def device_stage_slopes(spec, mac: str, bank: jax.Array) -> dict:
    """Per-stage seconds/block at this graph's shapes.

    The tiny ``* 1e-9`` feedback terms keep each scan iteration
    data-dependent on the measured op (otherwise XLA dead-code-eliminates
    it); their cost is one axpy, negligible against the measured ops.
    """
    C_in, C_out = spec.n_inputs, spec.n_outputs
    F, N, K = spec.n_filters, spec.block_length, spec.n_bins
    rd = spec.real_dtype

    frame0 = jnp.full((C_in, 2 * N), 0.01, rd)

    def t2f(c):
        X = partconv.rfft_planes(c)
        return c.at[:, :K].add(X[:, 0, :] * 1e-9)

    X0 = jnp.full((C_in, 2, K), 0.01, rd)
    in_mix = jnp.full((F, C_in), 1.0 / max(C_in, 1), rd)

    def mix1(c):
        m = partconv.complex_mix(in_mix, c)          # [F, 2, K]
        return c + m[0:1] * 1e-9

    tiled = mac.startswith("pallas") and spec.tileable
    ring0 = jnp.full(spec.ring_shape(tiled), 0.01, rd)
    idx = jnp.arange(F, dtype=jnp.int32) % bank.shape[0]
    mask = jnp.ones((F, spec.n_blocks), rd)

    def conv(c):
        if mac.startswith("pallas"):
            from ..ops.pallas_mac import pallas_spectral_mac
            y = pallas_spectral_mac(c, bank, idx, mask, jnp.int32(1),
                                    interpret=(mac == "pallas-interpret"))
        else:
            y = partconv.spectral_mac_rollh(c, bank, idx, mask, jnp.int32(1))
        return c.at[:, 0].add(y.reshape((F, 2) + c.shape[3:]) * 1e-9)

    Y0 = jnp.full((F, 2, K), 0.01, rd)
    out_mix = jnp.full((C_out, F), 1.0 / max(F, 1), rd)

    def mix2(c):
        m = partconv.complex_mix(out_mix, c)         # [C_out, 2, K]
        return c + m[0:1] * 1e-9

    Xo0 = jnp.full((C_out, 2, K), 0.01, rd)

    def f2t(c):
        y = partconv.irfft_planes(c)                 # [C_out, 2N]
        return c.at[:, 0, :].add(y[:, :K] * 1e-9)

    return {
        "t2f": _slope(t2f, frame0),
        "mix1": _slope(mix1, X0),
        "conv": _slope(conv, ring0),
        "mix2": _slope(mix2, Y0),
        "f2t": _slope(f2t, Xo0),
    }
