#!/usr/bin/env python
"""Prototype: uniform-coefficient Pallas MAC kernel (shared bank row).

Compares, at the flagship shape, the dense uniform path
(scatter + spectral_mac_uniform) against a Pallas kernel where the
shared [B, 2, N] coefficient row stays VMEM-resident across the filter
grid (index map constant in f -> single DMA) and the partition loop is
statically unrolled. Ring update stays outside (a 3 us DUS).
Slope-timed under lax.scan with forced completion.
"""

import sys
import time
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from brutefir_tpu.ops import partconv  # noqa: E402

F = int(sys.argv[1]) if len(sys.argv) > 1 else 26
N = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
B = int(sys.argv[3]) if len(sys.argv) > 3 else 16
R = N // 128
rd = jnp.float32
key = jax.random.PRNGKey(0)

ring0 = jax.random.normal(key, (F, B, 2, R, 128), rd)
X0 = jax.random.normal(jax.random.PRNGKey(1), (F, 2, R, 128), rd)
H0 = jax.random.normal(jax.random.PRNGKey(2), (B, 2, R, 128), rd)


def _mac_kernel(rpos_ref, mask_ref, ring_ref, bank_ref, out_ref, *, nB):
    accr = jnp.zeros_like(out_ref[0, 0])
    acci = jnp.zeros_like(out_ref[0, 1])
    for b in range(nB):  # static unroll
        rb = rpos_ref[b]
        m = mask_ref[b]
        rr = ring_ref[0, rb, 0]
        ri = ring_ref[0, rb, 1]
        hr = bank_ref[b, 0] * m
        hi = bank_ref[b, 1] * m
        accr += rr * hr - ri * hi
        acci += rr * hi + ri * hr
    out_ref[0, 0] = accr
    out_ref[0, 1] = acci


def mac_call(ring5, bank4, rpos, mask, interpret=False):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(F,),
        in_specs=[
            pl.BlockSpec((1, B, 2, R, 128),
                         lambda f, rp, mk: (f, 0, 0, 0, 0)),
            pl.BlockSpec((B, 2, R, 128), lambda f, rp, mk: (0, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2, R, 128), lambda f, rp, mk: (f, 0, 0, 0)),
    )
    return pl.pallas_call(
        partial(_mac_kernel, nB=B),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((F, 2, R, 128), ring5.dtype),
        interpret=interpret,
    )(rpos, mask, ring5, bank4)


def fetch(v):
    return float(np.asarray(jnp.sum(jax.tree.leaves(v)[0]).astype(jnp.float32)))


def slope(make, n_lo, n_hi, reps=3):
    flo, fhi = make(n_lo), make(n_hi)
    fetch(flo(ring0)); fetch(fhi(ring0))
    out = []
    for _ in range(reps):
        t0 = time.perf_counter(); fetch(flo(ring0)); tl = time.perf_counter()-t0
        t0 = time.perf_counter(); fetch(fhi(ring0)); th = time.perf_counter()-t0
        out.append((th-tl)/(n_hi-n_lo))
    out.sort(); return out[len(out)//2]


mask_row = jnp.ones((B,), rd)
idxa = np.arange(F)


def make_fused(m):
    @jax.jit
    def run(ring):
        def body(r, i):
            wpos = jnp.mod(i, B)
            x = (X0 * (1.0 + 1e-9 * i.astype(rd)))[:, None]
            r = jax.lax.dynamic_update_slice(r, x, (0, wpos, 0, 0, 0))
            rpos = jnp.mod(i - jnp.arange(B, dtype=jnp.int32), B)
            y = mac_call(r, H0, rpos, mask_row)
            return r, jnp.sum(y[:, :, 0, :1])
        r, s = jax.lax.scan(body, ring, jnp.arange(m, dtype=jnp.int32))
        return r[0, 0, 0, 0] + jnp.sum(s) * 1e-9
    return run


def make_dense(m):
    ci = jnp.zeros((F,), jnp.int32)
    mask = jnp.ones((F, B), rd)
    bank = H0.reshape(1, B, 2, N)

    @jax.jit
    def run(ring):
        def body(r, i):
            r3 = r.reshape(F, B, 2, N)
            wpos = jnp.mod(i + jnp.zeros((F,), jnp.int32), B)
            x = (X0 * (1.0 + 1e-9 * i.astype(rd))).reshape(F, 2, N)
            r3 = r3.at[idxa, wpos].set(x)
            y = partconv.spectral_mac_uniform(r3, bank, ci, mask, i)
            return r3.reshape(F, B, 2, R, 128), jnp.sum(y[:, :, :1])
        r, s = jax.lax.scan(body, ring, jnp.arange(m, dtype=jnp.int32))
        return r[0, 0, 0, 0] + jnp.sum(s) * 1e-9
    return run


# correctness (away from bin 0: kernel treats it as a complex lane)
y2 = jax.jit(lambda r: mac_call(
    r, H0, jnp.mod(7 - jnp.arange(B, dtype=jnp.int32), B), mask_row))(ring0)
yd = partconv.spectral_mac_uniform(ring0.reshape(F, B, 2, N),
                                   H0.reshape(1, B, 2, N),
                                   jnp.zeros((F,), jnp.int32),
                                   jnp.ones((F, B), rd), jnp.int32(7))
d = float(jnp.max(jnp.abs(y2.reshape(F, 2, N)[:, :, 1:] - yd[:, :, 1:])))
print(f"parity (bins 1..): {d:.3e}")

s = slope(make_dense, 100, 900)
print(f"dense scatter+uniformMAC  {s*1e3:.4f} ms")
s = slope(make_fused, 100, 900)
print(f"pallas uniform kernel     {s*1e3:.4f} ms")
