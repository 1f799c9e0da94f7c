#!/usr/bin/env python
"""Scale-shape MAC bandwidth probe (256 x 256 x 131k regime).

The big-filter MAC is purely streaming (1 flop/byte: every ring/bank
byte is read once per block), so its floor is HBM bandwidth. This tool
measures, at the scale shape [F=256, B=16, N=8192, E=256]:

* a pure-DMA "roofline" kernel -- identical grid/BlockSpecs to the
  chunked MAC but trivial adds in the body -- isolating the achievable
  streaming rate of the access pattern from the complex-MAC compute;
* the production variants (row / chunked) and a parameter sweep over
  the chunked kernel's block rows (Rc), register sub-chunks, and grid
  iteration order.

Methodology: in-scan slope between two scan lengths with the rotation
index t as the per-iteration dependence (the pallas call takes rpos(t),
so XLA cannot hoist it), a cheap [F, 2] consume of each y, and a
data-dependent scalar fetch closing every measurement (the relay acks
block_until_ready early -- docs/PERFORMANCE.md).

Usage: python tools/scale_mac_probe.py [F B N E]
"""

import functools
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from brutefir_tpu.ops import pallas_mac as pm  # noqa: E402

F = int(sys.argv[1]) if len(sys.argv) > 1 else 256
B = int(sys.argv[2]) if len(sys.argv) > 2 else 16
N = int(sys.argv[3]) if len(sys.argv) > 3 else 8192
E = int(sys.argv[4]) if len(sys.argv) > 4 else 256
R = N // 128

key = jax.random.PRNGKey(0)
ring5 = jax.random.normal(key, (F, B, 2, R, 128), jnp.float32)
bank5 = jax.random.normal(jax.random.fold_in(key, 1), (E, B, 2, R, 128),
                          jnp.float32)
coeff_idx = jnp.arange(F, dtype=jnp.int32) % E
maskf = jnp.ones((F, B), jnp.float32)
GB = (F * B * 2 * N * 4 + F * B * 2 * N * 4) / 1e9  # ring + gathered bank


def fetch(x):
    return float(np.asarray(jnp.sum(x).astype(jnp.float32)))


def slope(fn, n_lo=16, n_hi=176, reps=3):
    # separation sized to ~110 ms of device work (160 x ~0.7 ms), far
    # above the relay's round-trip jitter; smaller separations produced
    # above-SoL artifacts
    # ring/bank are explicit jit args: closed-over 268 MB constants get
    # inlined into the compile request (the relay rejects it with 413)
    y_lead = jax.eval_shape(
        fn, jax.ShapeDtypeStruct((), jnp.int32), ring5, bank5).shape[:2]

    @functools.partial(jax.jit, static_argnums=0)
    def run(m, rg, bk):
        def body(c, t):
            y5 = fn(t, rg, bk)
            return c + jnp.sum(y5, axis=tuple(range(2, y5.ndim))), ()
        c, _ = jax.lax.scan(body, jnp.zeros(y_lead, jnp.float32),
                            jnp.arange(m, dtype=jnp.int32))
        return c
    fetch(run(n_lo, ring5, bank5)); fetch(run(n_hi, ring5, bank5))
    out = []
    for _ in range(reps):
        time.sleep(0.3)
        t0 = time.perf_counter()
        fetch(run(n_lo, ring5, bank5))
        a = time.perf_counter() - t0
        time.sleep(0.3)
        t0 = time.perf_counter()
        fetch(run(n_hi, ring5, bank5))
        b = time.perf_counter() - t0
        out.append((b - a) / (n_hi - n_lo))
    out.sort()
    return out[len(out) // 2]


def report(name, fn):
    s = slope(fn)
    print(f"{name:36s} {s * 1e3:8.3f} ms  {GB / s:6.0f} GB/s")
    return s


def rpos_of(t):
    return jnp.mod(t - jnp.arange(B, dtype=jnp.int32), B).astype(jnp.int32)


# --- pure-DMA roofline: same blocks as chunked, trivial body ----------------

def _roof_kernel(idx_ref, rpos_ref, mask_ref, ring_ref, bank_ref, out_ref,
                 *, n_part, n_sub):
    f = pl.program_id(1)
    Rc = out_ref.shape[2]
    for s in range(0, Rc, n_sub):
        acc = None
        for b in range(n_part):
            v = (ring_ref[0, b, 0, pl.ds(s, n_sub)]
                 + bank_ref[0, b, 0, pl.ds(s, n_sub)]
                 + ring_ref[0, b, 1, pl.ds(s, n_sub)]
                 + bank_ref[0, b, 1, pl.ds(s, n_sub)])
            acc = v if acc is None else acc + v
        out_ref[0, 0, pl.ds(s, n_sub)] = acc
        out_ref[0, 1, pl.ds(s, n_sub)] = acc


def roofline(Rc, sub, order="rf"):
    grid = (R // Rc, F) if order == "rf" else (F, R // Rc)
    if order == "rf":
        rmap = lambda r, f, idx, rp, mk: (f, 0, 0, r, 0)
        bmap = lambda r, f, idx, rp, mk: (idx[f], 0, 0, r, 0)
        omap = lambda r, f, idx, rp, mk: (f, 0, r, 0)
        pid = 1
    else:
        rmap = lambda f, r, idx, rp, mk: (f, 0, 0, r, 0)
        bmap = lambda f, r, idx, rp, mk: (idx[f], 0, 0, r, 0)
        omap = lambda f, r, idx, rp, mk: (f, 0, r, 0)
        pid = 0

    def kern(idx_ref, rpos_ref, mask_ref, ring_ref, bank_ref, out_ref):
        f = pl.program_id(pid)
        Rcc = out_ref.shape[2]
        for s in range(0, Rcc, sub):
            acc = None
            for b in range(B):
                v = (ring_ref[0, b, 0, pl.ds(s, sub)]
                     + bank_ref[0, b, 0, pl.ds(s, sub)]
                     + ring_ref[0, b, 1, pl.ds(s, sub)]
                     + bank_ref[0, b, 1, pl.ds(s, sub)])
                acc = v if acc is None else acc + v
            out_ref[0, 0, pl.ds(s, sub)] = acc
            out_ref[0, 1, pl.ds(s, sub)] = acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=grid,
        in_specs=[pl.BlockSpec((1, B, 2, Rc, 128), rmap),
                  pl.BlockSpec((1, B, 2, Rc, 128), bmap)],
        out_specs=pl.BlockSpec((1, 2, Rc, 128), omap),
    )

    def fn(t, rg, bk):
        return pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((F, 2, R, 128), jnp.float32),
        )(coeff_idx, rpos_of(t), maskf, rg, bk)
    return fn


# --- production variants -----------------------------------------------------

def chunked(Rc, sub, order="rf"):
    if order == "rf":
        def fn(t, rg, bk):
            return pm._chunked_call(rg, bk, coeff_idx, rpos_of(t),
                                    maskf, False, chunk_rows=Rc, n_sub=sub)
        return fn

    def kern(idx_ref, rpos_ref, mask_ref, ring_ref, bank_ref, out_ref):
        f = pl.program_id(0)
        Rcc = out_ref.shape[2]
        for s in range(0, Rcc, sub):
            accr = None
            acci = None
            for b in range(B):
                m = mask_ref[f, b]
                rb = rpos_ref[b]
                rr = ring_ref[0, rb, 0, pl.ds(s, sub)]
                ri = ring_ref[0, rb, 1, pl.ds(s, sub)]
                hr = bank_ref[0, b, 0, pl.ds(s, sub)] * m
                hi = bank_ref[0, b, 1, pl.ds(s, sub)] * m
                tr = rr * hr - ri * hi
                ti = rr * hi + ri * hr
                accr = tr if accr is None else accr + tr
                acci = ti if acci is None else acci + ti
            out_ref[0, 0, pl.ds(s, sub)] = accr
            out_ref[0, 1, pl.ds(s, sub)] = acci

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(F, R // Rc),
        in_specs=[
            pl.BlockSpec((1, B, 2, Rc, 128),
                         lambda f, r, idx, rp, mk: (f, 0, 0, r, 0)),
            pl.BlockSpec((1, B, 2, Rc, 128),
                         lambda f, r, idx, rp, mk: (idx[f], 0, 0, r, 0)),
        ],
        out_specs=pl.BlockSpec((1, 2, Rc, 128),
                               lambda f, r, idx, rp, mk: (f, 0, r, 0)),
    )

    def fn(t, rg, bk):
        return pl.pallas_call(
            kern, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((F, 2, R, 128), jnp.float32),
        )(coeff_idx, rpos_of(t), maskf, rg, bk)
    return fn


def row(t, rg, bk):
    return pm._rowmajor_call(rg, bk, coeff_idx, rpos_of(t), maskf,
                             False)


def bf16_bank():
    """The opt-in bfloat16 bank/ring (BRUTEFIR_TPU_BANK_DTYPE /
    BRUTEFIR_TPU_RING_DTYPE): same production kernels, half the bytes
    on the quantized side(s)."""
    bank16 = bank5.astype(jnp.bfloat16)
    ring16 = ring5.astype(jnp.bfloat16)
    side = F * B * 2 * N
    gb_bank16 = (side * 4 + side * 2) / 1e9
    gb_ring16 = (side * 2 + side * 4) / 1e9
    gb_both16 = (side * 2 + side * 2) / 1e9

    def chunk_fn(t, rg, bk):
        return pm._chunked_call(rg, bk, coeff_idx, rpos_of(t), maskf,
                                False, chunk_rows=16, n_sub=16)

    def row16(t, rg, bk16):
        return pm._rowmajor_call(rg, bk16, coeff_idx, rpos_of(t), maskf,
                                 False)

    cases = (
        ("row bf16-bank", row16, ring5, bank16, gb_bank16),
        ("chunked bf16-bank", chunk_fn, ring5, bank16, gb_bank16),
        ("chunked bf16-ring", chunk_fn, ring16, bank5, gb_ring16),
        ("chunked bf16 ring+bank", chunk_fn, ring16, bank16, gb_both16),
    )
    for name, fn, rg_in, bk_in, gb16 in cases:
        @functools.partial(jax.jit, static_argnums=0)
        def run(m, rg, bk, _fn=fn):
            def body(c, t):
                y5 = _fn(t, rg, bk)
                return c + jnp.sum(y5, axis=(2, 3)), ()
            c, _ = jax.lax.scan(body, jnp.zeros((F, 2), jnp.float32),
                                jnp.arange(m, dtype=jnp.int32))
            return c
        n_lo, n_hi = 16, 176
        fetch(run(n_lo, rg_in, bk_in)); fetch(run(n_hi, rg_in, bk_in))
        out = []
        for _ in range(3):
            time.sleep(0.3)
            t0 = time.perf_counter()
            fetch(run(n_lo, rg_in, bk_in))
            a = time.perf_counter() - t0
            time.sleep(0.3)
            t0 = time.perf_counter()
            fetch(run(n_hi, rg_in, bk_in))
            b = time.perf_counter() - t0
            out.append((b - a) / (n_hi - n_lo))
        out.sort()
        s = out[len(out) // 2]
        print(f"{name:36s} {s * 1e3:8.3f} ms  {gb16 / s:6.0f} GB/s "
              f"({gb16:.2f} GB/block)")


def main():
    print(f"scale shape F={F} B={B} N={N} E={E}: "
          f"{GB:.2f} GB ring+bank per block "
          f"(SoL ~{GB / 800 * 1e3:.3f} ms at 800 GB/s)")
    if os.environ.get("SCALE_PROBE") == "bf16":
        # short mode: f32 production baseline + the bf16-bank variants
        report("chunked Rc=16 sub=16 (r,f) prod", chunked(16, 16, "rf"))
        bf16_bank()
        return
    report("roofline Rc=16 sub=16 (r,f)", roofline(16, 16, "rf"))
    report("roofline Rc=16 sub=16 (f,r)", roofline(16, 16, "fr"))
    report("roofline Rc=64 sub=16 (f,r)", roofline(64, 16, "fr"))
    report("row (production, full rows)", row)
    report("chunked Rc=16 sub=16 (r,f) prod", chunked(16, 16, "rf"))
    report("chunked Rc=16 sub=16 (f,r)", chunked(16, 16, "fr"))
    report("chunked Rc=8  sub=8  (r,f)", chunked(8, 8, "rf"))
    report("chunked Rc=32 sub=16 (r,f)", chunked(32, 16, "rf"))
    report("chunked Rc=32 sub=32 (f,r)", chunked(32, 32, "fr"))
    report("chunked Rc=64 sub=16 (f,r)", chunked(64, 16, "fr"))
    report("chunked Rc=64 sub=32 (f,r)", chunked(64, 32, "fr"))
    bf16_bank()


if __name__ == "__main__":
    main()
