#!/usr/bin/env python
"""Accuracy + speed of MXU mix precisions (HIGHEST vs HIGH vs DEFAULT).

The channel mixes pin jax.lax.Precision.HIGHEST (6 bf16 passes) to keep
the full 24-bit audio mantissa. HIGH (3 passes) would halve the MXU
work; whether it is usable depends on its worst-case error at S24 full
scale, which this probe measures on device against a float64 oracle.
Also slope-times each precision at the scale-shape mix.

Usage: python tools/mix_precision_probe.py [A F N]
"""

import functools
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

A = int(sys.argv[1]) if len(sys.argv) > 1 else 256
F = int(sys.argv[2]) if len(sys.argv) > 2 else 256
N = int(sys.argv[3]) if len(sys.argv) > 3 else 8192

rng = np.random.default_rng(0)
# realistic magnitudes: mix gains ~1, spectra at S24 full scale
mix = (rng.standard_normal((A, F)) * 0.5).astype(np.float32)
x = (rng.standard_normal((F, 2, N)) * 2**23).astype(np.float32)
oracle = np.einsum("af,fpn->apn", mix.astype(np.float64),
                   x.astype(np.float64))


def fetch(v):
    return float(np.asarray(jnp.sum(v).astype(jnp.float32)))


def run(prec):
    @jax.jit
    def mm(m, xx):
        return jnp.einsum("af,fpn->apn", m, xx,
                          preferred_element_type=xx.dtype, precision=prec)
    y = np.asarray(mm(jnp.asarray(mix), jnp.asarray(x)))
    err = np.abs(y.astype(np.float64) - oracle)
    # express as LSB of a 24-bit signal at the output's own scale
    lsb = np.abs(oracle).max() / 2**23
    print(f"{prec!s:22s} max err {err.max():.6g} "
          f"(= {err.max() / lsb:.2f} LSB of S24 at output scale)")

    @functools.partial(jax.jit, static_argnums=0)
    def scan(m_, mx, xx):
        def body(c, i):
            y = jnp.einsum("af,fpn->apn", mx * (1 + 1e-9 * i), xx,
                           preferred_element_type=xx.dtype, precision=prec)
            return c + y[:, 0, :4], ()
        c, _ = jax.lax.scan(body, jnp.zeros((A, 4), jnp.float32),
                            jnp.arange(m_, dtype=jnp.float32))
        return c
    mj, xj = jnp.asarray(mix), jnp.asarray(x)
    fetch(scan(8, mj, xj)); fetch(scan(168, mj, xj))
    ts = []
    for _ in range(3):
        time.sleep(0.3)
        t0 = time.perf_counter(); fetch(scan(8, mj, xj))
        a = time.perf_counter() - t0
        time.sleep(0.3)
        t0 = time.perf_counter(); fetch(scan(168, mj, xj))
        b = time.perf_counter() - t0
        ts.append((b - a) / 160)
    ts.sort()
    print(f"{'':22s} mix slope {ts[1] * 1e3:.4f} ms")


if __name__ == "__main__":
    print(f"mix [A={A}, F={F}] x [F, 2, N={N}] f32, S24-scale operands")
    for prec in (jax.lax.Precision.HIGHEST, jax.lax.Precision.HIGH,
                 jax.lax.Precision.DEFAULT):
        run(prec)
