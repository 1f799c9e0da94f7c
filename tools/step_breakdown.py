#!/usr/bin/env python
"""Per-op slope timing of the flagship device step's components.

Times each stage of the per-block program (decode, FFT, ring write, MAC,
mixes, encode) as its own scanned jit, using the forced-completion slope
method from bench.py: every measurement is the difference between two
on-device scan lengths (sized so the difference is tens of ms of device
work, far above transport jitter), and the timed quantity depends on the
result (a data-dependent scalar fetch) so queued work cannot leak past
the stopwatch.

Usage: python tools/step_breakdown.py [C N B [F]]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from brutefir_tpu.ops import partconv  # noqa: E402

C = int(sys.argv[1]) if len(sys.argv) > 1 else 26
N = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
B = int(sys.argv[3]) if len(sys.argv) > 3 else 16
F = int(sys.argv[4]) if len(sys.argv) > 4 else C
E = 2  # bank entries (coeff 0 + dirac), like the flagship config

rd = jnp.float32
key = jax.random.PRNGKey(0)


def fetch(x):
    return float(np.asarray(jnp.sum(jax.tree.leaves(x)[0]).astype(jnp.float32)))


def slope_time(make_scan, n_lo, n_hi, reps=3):
    """make_scan(m) -> (fn, args). Returns seconds per inner iteration."""
    fn_lo, args_lo = make_scan(n_lo)
    fn_hi, args_hi = make_scan(n_hi)
    fetch(fn_lo(*args_lo))
    fetch(fn_hi(*args_hi))
    slopes = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(fn_lo(*args_lo))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        fetch(fn_hi(*args_hi))
        t_hi = time.perf_counter() - t0
        slopes.append((t_hi - t_lo) / (n_hi - n_lo))
    slopes.sort()
    return slopes[len(slopes) // 2]


def scan_jit(body, carry):
    def make(m):
        @jax.jit
        def run(c):
            def f(c, i):
                return body(c, i), ()
            c, _ = jax.lax.scan(f, c, jnp.arange(m, dtype=jnp.int32))
            return c
        return run, (carry,)
    return make


# shared tensors
ring = jax.random.normal(key, (F, B, 2, N), rd)
bank = jax.random.normal(key, (E, B, 2, N), rd)
coeff_idx = jnp.zeros((F,), jnp.int32)
mask = jnp.ones((F, B), rd)
x = jax.random.normal(key, (C, N), rd)
prev = jax.random.normal(key, (C, N), rd)
mixm = jax.random.normal(key, (F, C), rd) * 0.1
outm = jax.random.normal(key, (C, F), rd) * 0.1
words = jax.random.randint(key, (N, C), -2**23, 2**23, jnp.int32)
sel = jnp.arange(C, dtype=jnp.int32)

results = {}


def timeit(name, body, carry, est_ms, target_ms=60.0):
    # size the scan-length difference so it is ~target_ms of device work
    diff = max(64, int(target_ms / max(est_ms, 1e-4)))
    n_lo = max(8, diff // 8)
    n_hi = n_lo + diff
    s = slope_time(scan_jit(body, carry), n_lo, n_hi)
    results[name] = s * 1e3
    print(f"{name:28s} {s * 1e3:8.4f} ms   (scan {n_lo}->{n_hi})")
    return s


# 1. rfft of the 2N frame (+ concat)
def b_fft(c, i):
    X = partconv.rfft_planes(jnp.concatenate([c, x + i.astype(rd)], -1))
    return X[:, 0, :N] + X[:, 1, :N] * 1e-6

timeit("rfft(frame 2N)", b_fft, prev, 0.02)


# 2. irfft of output spectra
Xs = jax.jit(lambda a, b: partconv.rfft_planes(
    jnp.concatenate([a, b], -1)))(prev, x)

def b_ifft(c, i):
    y = partconv.irfft_planes(Xs + c[:, None, :] * 1e-9)[:, :N]
    return y

timeit("irfft(out 2N)", b_ifft, x, 0.02)


# 3. ring scatter (per-filter wpos, like ctrl.delay path)
wdel = jnp.zeros((F,), jnp.int32)
idxa = jnp.arange(F)

def b_scatter(c, i):
    wpos = jnp.mod(i + wdel, B)
    return c.at[idxa, wpos].set(Xs[:F] * (1.0 + 1e-9 * i.astype(rd)))

timeit("ring scatter (per-f wpos)", b_scatter, ring, 0.02)


# 3b. ring write via dynamic_update_slice (uniform wpos)
def b_dus(c, i):
    wpos = jnp.mod(i, B)
    blk = (Xs[:F] * (1.0 + 1e-9 * i.astype(rd)))[:, None]
    return jax.lax.dynamic_update_slice(c, blk, (0, wpos, 0, 0))

timeit("ring write (uniform DUS)", b_dus, ring, 0.02)


# 4. the MAC (dense rollh, bank gather)
def b_mac(c, i):
    y = partconv.spectral_mac_rollh(c, bank, coeff_idx, mask, i)
    return c * (1.0 - 1e-12) + y[:, None] * 1e-9

timeit("MAC rollh (gather)", b_mac, ring, 0.10)


# 4b. MAC with a broadcast shared coefficient (uniform coeff_idx)
def b_mac_bc(c, i):
    hpos = jnp.mod(i - jnp.arange(B, dtype=jnp.int32), B)
    H = bank[coeff_idx[0], hpos] * mask[0, hpos][:, None, None]  # [B, 2, N]
    rr, ri = c[:, :, 0], c[:, :, 1]                 # [F, B, N]
    hr, hi = H[None, :, 0], H[None, :, 1]           # [1, B, N]
    yr = jnp.sum(rr * hr - ri * hi, axis=1)
    yi = jnp.sum(rr * hi + ri * hr, axis=1)
    yr0 = jnp.sum(rr[..., 0] * hr[..., 0], axis=-1)
    yi0 = jnp.sum(ri[..., 0] * hi[..., 0], axis=-1)
    yr = yr.at[..., 0].set(yr0)
    yi = yi.at[..., 0].set(yi0)
    y = jnp.stack([yr, yi], 1)
    return c * (1.0 - 1e-12) + y[:, None] * 1e-9

timeit("MAC broadcast (shared H)", b_mac_bc, ring, 0.08)


# 5. mixes: in_mix + out_mix + device matmul
def b_mix(c, i):
    m1 = partconv.complex_mix(mixm * (1 + 1e-9 * i.astype(rd)), Xs)
    m2 = partconv.complex_mix(outm, m1)
    m3 = jnp.matmul(outm @ mixm, c, precision=jax.lax.Precision.HIGHEST)
    return m2[:, 0] + m3 * 1e-9

timeit("mixes (2 spectral + 1 td)", b_mix, x, 0.02)


# 6. codec: decode int words -> float, encode float -> int + meters + p24
def b_codec(c, i):
    w = (words + i).astype(rd) * (1.0 / 2**23)
    xph = w.T[sel]
    y = xph * 8388607.0
    peak = jnp.max(jnp.abs(y), axis=1)
    q = jnp.clip(jnp.round(y), -8388608, 8388607).astype(jnp.int32)
    clip = jnp.sum((jnp.abs(y) > 8388607.0).astype(jnp.int32), axis=1)
    w3 = jnp.stack([(q >> s) & 0xFF for s in (0, 8, 16)], -1).astype(jnp.uint8)
    return c + peak + clip.astype(rd) + jnp.sum(w3[0, 0].astype(rd)) * 1e-9

timeit("codec (dec+enc+meters)", b_codec, jnp.zeros((C,), rd), 0.02)

print()
known = sum(results[k] for k in
            ("rfft(frame 2N)", "irfft(out 2N)", "ring scatter (per-f wpos)",
             "MAC rollh (gather)", "mixes (2 spectral + 1 td)",
             "codec (dec+enc+meters)"))
print(f"sum of parts               {known:8.4f} ms")

# full dio step for comparison
from brutefir_tpu.config import parse_config  # noqa: E402
from brutefir_tpu.runtime import Engine  # noqa: E402

CONFIG = f"""
sampling_rate: 44100;
filter_length: {N},{B};
benchmark: true;
coeff 0 {{ filename: "dirac pulse"; }};
input {",".join(str(i) for i in range(C))} {{
    device: "file" {{ path: "/dev/zero"; }}; sample: "S24_4LE"; channels: {C};
}};
output {",".join(str(i) for i in range(C))} {{
    device: "file" {{ path: "/dev/null"; }}; sample: "S24_4LE"; channels: {C};
    dither: false;
}};
""" + "\n".join(
    f"filter {i} {{ from_inputs: {i}; to_outputs: {i}; coeff: 0; }};"
    for i in range(C))

conf = parse_config(CONFIG)
eng = Engine(conf)
eng.setup()
with eng.control_mutex:
    c0 = eng.control.snapshot()
    g0, g1 = eng._mute_gains()


def make_full(m):
    mstep = eng.dio.multi_step(m)
    stacks = [jnp.zeros((m, N) + eng.dio.in_wire_shape[i],
                        eng.dio.in_wire_dtype[i])
              for i in range(len(conf.iodevs[0]))]

    def run(_):
        st, outs, meters, nan = mstep(eng.cg.init_state(), c0, g0, g1,
                                      eng.bank, stacks)
        return meters

    return run, (0,)


s = slope_time(make_full, 40, 360)
print(f"full dio step              {s * 1e3:8.4f} ms")
print(f"unaccounted                {(s * 1e3 - known):8.4f} ms")
eng.teardown()
