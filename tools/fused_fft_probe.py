#!/usr/bin/env python
"""A/B the fused Pallas FFT pair against the production XLA path.

In-scan slope timing (weighted consume, data dependence through the
measured ops, two scan lengths) per docs/PERFORMANCE.md. Compares
frame->packed-planes (fwd) and packed->valid-time (inv) at the flagship
and scale channel counts.

Run: python tools/fused_fft_probe.py [C] [M]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from brutefir_tpu.ops import partconv as pc
from brutefir_tpu.ops import pallas_fft as pf

C = int(sys.argv[1]) if len(sys.argv) > 1 else 26
M = int(sys.argv[2]) if len(sys.argv) > 2 else 8192


def slope(make_body, shape, lo=75, hi=675, reps=5):
    w = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((8, 128)).astype(np.float32))

    def run(x, n):
        def step(carry, _):
            y = make_body(carry)
            # fold the result back into a same-shaped carry cheaply but
            # data-dependently so the op cannot be DCE'd or hoisted
            g = jnp.sum(y[..., :8, :128] * w) * 1e-12
            return carry * (1.0 + g), g
        _, gs = jax.lax.scan(step, x, None, length=n)
        return jnp.sum(gs)

    fns = {n: jax.jit(lambda x, n=n: run(x, n)) for n in (lo, hi)}
    x0 = jnp.asarray(np.random.default_rng(1)
                     .standard_normal(shape).astype(np.float32) * 0.1)
    for n in (lo, hi):
        float(np.asarray(fns[n](x0)))
    out = []
    for _ in range(reps):
        t = {}
        for n in (lo, hi):
            time.sleep(0.3)
            t0 = time.perf_counter()
            float(np.asarray(fns[n](x0)))
            t[n] = time.perf_counter() - t0
        out.append((t[hi] - t[lo]) / (hi - lo) * 1e3)
    out.sort()
    return out[len(out) // 2]


def main():
    print(f"C={C} M={M} (frame 2M={2*M})")

    def fwd_xla(fr):
        return pc.rfft_planes(fr)

    def fwd_fused(fr):
        return pf.rfft_planes_fused(fr)

    for name, fn in [("fwd xla  ", fwd_xla), ("fwd fused", fwd_fused)]:
        ms = slope(lambda fr, f=fn: f(fr).reshape(C, 2, M // 128, 128)
                   [:, 0], (C, 2 * M))
        print(f"{name}  {ms:8.4f} ms")

    def inv_xla(p):
        return pc.irfft_planes_valid(p)

    def inv_fused(p):
        return pf.irfft_planes_valid_fused(p)

    for name, fn in [("inv xla  ", inv_xla), ("inv fused", inv_fused)]:
        ms = slope(lambda p, f=fn: f(p).reshape(C, M // 128, 128),
                   (C, 2, M))
        print(f"{name}  {ms:8.4f} ms")


if __name__ == "__main__":
    main()
