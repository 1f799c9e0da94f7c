#!/usr/bin/env python
"""Does XLA:TPU alias a big lax.scan carry updated by DUS, or copy it?

The scale-shape ablation (tools/scale_step_ablate.py) leaves a 0.303
ms/block floor after FFT+mix+MAC are all knocked out -- one HBM pass
over the 268 MB spectra ring is 0.335 ms, so the prime suspect is a
per-iteration copy of the scan carry. This probes exactly that, in
isolation: carry = the scale-shape ring, body = one-slot DUS write +
tiny read, slope between two scan lengths. Variants separate the write
itself, a full-ring read, and a scatter-style write.

Run: python tools/carry_copy_probe.py [F] [B] [N]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

F = int(sys.argv[1]) if len(sys.argv) > 1 else 256
B = int(sys.argv[2]) if len(sys.argv) > 2 else 16
N = int(sys.argv[3]) if len(sys.argv) > 3 else 8192

RING = (F, B, 2, N)
GB = np.prod(RING) * 4 / 1e9


def slope(fn, ring0, lo=8, hi=64, reps=3):
    compiled = {}
    for m in (lo, hi):
        compiled[m] = jax.jit(lambda r, m=m: fn(r, m)).lower(ring0).compile()
        np.asarray(compiled[m](ring0)[1])            # warm
    out = []
    for _ in range(reps):
        t = {}
        for m in (lo, hi):
            t0 = time.perf_counter()
            acc = compiled[m](ring0)
            float(np.asarray(acc[1]))
            t[m] = time.perf_counter() - t0
        out.append((t[hi] - t[lo]) / (hi - lo) * 1e3)
    out.sort()
    return out[len(out) // 2]


def make(body):
    def run(ring, m):
        def step(carry, k):
            ring, acc = carry
            ring, consume = body(ring, k)
            return (ring, acc + consume), ()
        (ring, acc), _ = jax.lax.scan(
            step, (ring, jnp.float32(0.0)), jnp.arange(m))
        return ring, acc
    return run


def dus_write(ring, k):
    blk = jnp.full((F, 1, 2, N), 1.0 + k.astype(jnp.float32) * 1e-6,
                   ring.dtype)
    ring = jax.lax.dynamic_update_slice(ring, blk, (0, k % B, 0, 0))
    return ring, ring[0, 0, 0, 0].astype(jnp.float32)


def scatter_write(ring, k):
    blk = jnp.full((F, 2, N), 1.0 + k.astype(jnp.float32) * 1e-6, ring.dtype)
    wpos = jnp.mod(jnp.zeros((F,), jnp.int32) + k, B)
    ring = ring.at[jnp.arange(F), wpos].set(blk)
    return ring, ring[0, 0, 0, 0].astype(jnp.float32)


def dus_plus_read(ring, k):
    ring, _ = dus_write(ring, k)
    return ring, jnp.sum(ring[:, 0, 0, ::128]).astype(jnp.float32)


def no_write(ring, k):
    return ring, ring[0, 0, 0, 0].astype(jnp.float32) + k.astype(jnp.float32)


if __name__ == "__main__":
    ring0 = jnp.zeros(RING, jnp.float32)
    print(f"ring {RING} = {GB:.3f} GB; one HBM pass ~{GB / 0.8:.3f} ms")
    for name, body in [("carry only, no write", no_write),
                       ("one-slot DUS write", dus_write),
                       ("DUS + strided read", dus_plus_read),
                       ("per-filter scatter", scatter_write)]:
        ms = slope(make(body), ring0)
        print(f"{name:24s} {ms:8.4f} ms/iter")
