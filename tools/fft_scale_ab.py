#!/usr/bin/env python
"""A/B the forward/inverse FFT formulations at the 256-channel scale shape.

partconv's direction split (full-size rfft forward, half-size complex
ifft inverse) was measured at the flagship shape (26 rows). The scale
step spends 0.64 ms in transforms (tools/scale_step_ablate.py), so this
re-runs the same in-scan slope A/B at [256, 16384] / [256, 2, 8192] to
check whether the 10x row count moves the winners.

Timing per the repo's TPU probe rules (docs/PERFORMANCE.md): jitted
lax.scan bodies, weighted consume so XLA cannot cancel the glue
permutations, forced completion via a data-dependent scalar fetch.

Usage: python tools/fft_scale_ab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from brutefir_tpu.ops import partconv

C = int(os.environ.get("BENCH_C", "256"))
N = int(os.environ.get("BENCH_N", "8192"))
M = 40


def scan_time(body, x0, w):
    @jax.jit
    def run(x, w):
        def step(carry, _):
            y = body(carry)
            # weighted consume folds the result back into the carry with
            # a shape-preserving reduction so every element is live
            return (carry * 0.999 + (y * w).sum() * 1e-12), ()
        out, _ = jax.lax.scan(step, x, None, length=M)
        return out

    r = run(x0, w)
    float(np.asarray(jnp.sum(r).astype(jnp.float32)))   # compile+drain
    times = {}
    for n in (1, 3):
        t0 = time.perf_counter()
        for _ in range(n):
            r = run(r, w)
        float(np.asarray(jnp.sum(r).astype(jnp.float32)))
        times[n] = time.perf_counter() - t0
    return (times[3] - times[1]) / (2 * M) * 1e3


def main():
    rng = np.random.default_rng(5)
    xt = jnp.asarray(rng.standard_normal((C, 2 * N)).astype(np.float32))
    xs = jnp.asarray(rng.standard_normal((C, 2, N)).astype(np.float32))

    fwd = {
        "rfft_full+pack": lambda x: partconv.c2p(partconv.rfft_packed(x)),
        "rfft_halfsize": lambda x: partconv.c2p(
            partconv.rfft_packed_halfsize(x)),
    }
    inv = {
        "ifft_half+untangle": partconv.irfft_planes_valid,
        "irfft_full": lambda p: partconv.irfft_packed(
            partconv.p2c(p))[..., :p.shape[-1]],
    }

    wf = jnp.asarray(rng.standard_normal((C, 2, N)).astype(np.float32))
    wi = jnp.asarray(rng.standard_normal((C, N)).astype(np.float32))
    for name, fn in fwd.items():
        ms = scan_time(fn, xt, wf)
        print(f"fwd  {name:20s} {ms:8.4f} ms  [{C}x{2 * N}]", flush=True)
    for name, fn in inv.items():
        ms = scan_time(fn, xs, wi)
        print(f"inv  {name:20s} {ms:8.4f} ms  [{C}x2x{N}]", flush=True)


if __name__ == "__main__":
    main()
