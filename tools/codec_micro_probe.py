#!/usr/bin/env python
"""Micro-breakdown of the device codec's elementwise stages at scale.

scale_step_ablate puts decode at ~0.073 ms and the quantizer at
~0.079 ms in situ (256ch x 8192). This probe times the individual XLA
stages -- 24-bit sign-extend, the [N,C]->[C,N] transpose, the scale
multiply, the exact quantizer, the meters, the 3-byte wire pack -- to
find which passes dominate and thus what a fused kernel must absorb.

In-scan slope, weighted consume, forced completion (docs/PERFORMANCE.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from brutefir_tpu.ops.device_codec import quantize_nd_exact

C = int(os.environ.get("BENCH_C", "256"))
N = int(os.environ.get("BENCH_N", "8192"))
M = 40


def scan_time(body, x0, w):
    @jax.jit
    def run(x, w):
        def step(carry, _):
            y = body(carry)
            upd = (y * w).sum() if y.dtype == carry.dtype else (
                y.astype(jnp.float32) * w).sum().astype(carry.dtype)
            return (carry + upd * 1e-12).astype(carry.dtype), ()
        out, _ = jax.lax.scan(step, x, None, length=M)
        return out

    r = run(x0, w)
    jax.block_until_ready(r)
    float(np.asarray(jnp.sum(r).astype(jnp.float32)))
    times = {}
    for n in (1, 3):
        t0 = time.perf_counter()
        for _ in range(n):
            r = run(r, w)
        float(np.asarray(jnp.sum(r).astype(jnp.float32)))
        times[n] = time.perf_counter() - t0
    return (times[3] - times[1]) / (2 * M) * 1e3


def sext24(w):
    w = w.astype(jnp.int32)
    w = w[..., 0] | (w[..., 1] << 8) | (w[..., 2] << 16)
    return w - ((w & 0x800000) << 1)


def main():
    rng = np.random.default_rng(5)
    wire = jnp.asarray(rng.integers(0, 255, (N, C, 3)).astype(np.uint8))
    y = jnp.asarray((rng.standard_normal((C, N)) * 3e6).astype(np.float32))
    wf = jnp.asarray(rng.standard_normal((C, N)).astype(np.float32))
    wn = jnp.asarray(rng.standard_normal((N, C)).astype(np.float32))
    w3 = jnp.asarray(rng.standard_normal((N, C, 3)).astype(np.float32))

    wire_f = wire.astype(jnp.float32)   # dummy carry for u8 input

    cases = [
        ("decode: sext24 only [N,C]", wire_f, wn,
         lambda c: sext24(c.astype(jnp.uint8)).astype(jnp.float32)),
        ("decode: sext+T+scale [C,N]", wire_f, wf,
         lambda c: sext24(c.astype(jnp.uint8)).astype(jnp.float32).T
         * (1.0 / 8388608.0)),
        ("transpose f32 [N,C]->[C,N]", wn, wf, lambda c: c.T),
        ("quantize_nd_exact", y, wf,
         lambda c: quantize_nd_exact(c, -(2**23), 2**23 - 1)[0]
         .astype(jnp.float32)),
        ("quantize+meters", y, wf, lambda c: _qm(c)),
        ("pack3: i32[C,N]->u8[N,C,3]", y, w3,
         lambda c: _pack3(c.astype(jnp.int32)).astype(jnp.float32)),
        ("quantize+T+pack3 fused", y, w3,
         lambda c: _pack3(quantize_nd_exact(
             c, -(2**23), 2**23 - 1)[0]).astype(jnp.float32)),
    ]
    for name, x0, w, fn in cases:
        print(f"{name:32s} {scan_time(fn, x0, w):8.4f} ms", flush=True)


def _qm(c):
    q, under, over = quantize_nd_exact(c, -(2**23), 2**23 - 1)
    clip = under | over
    mag = jnp.abs(c + 0.5)
    m = jnp.stack([
        jnp.sum(clip.astype(jnp.float32), axis=1),
        jnp.max(jnp.where(clip, mag, 0.0), axis=1),
        jnp.max(jnp.where(clip, 0, jnp.abs(q)), axis=1).astype(jnp.float32),
    ], axis=1)
    return q.astype(jnp.float32) + m.sum() * 1e-12


def _pack3(q):
    w32 = q.T                                  # [N, C] words
    return jnp.stack([(w32 >> s) & 0xFF for s in (0, 8, 16)],
                     axis=-1).astype(jnp.uint8)


if __name__ == "__main__":
    main()
