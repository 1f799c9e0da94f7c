#!/usr/bin/env python
"""Ablation timing of the real dio full_step: rebuild the same program with
individual stages disabled, slope-time each variant, and report the delta.

Mirrors device_io.full_step for the flagship bench shape (single input
device, single output device, identity channel wiring, S24_4LE p24 wire).
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from brutefir_tpu.config import parse_config  # noqa: E402
from brutefir_tpu.runtime import Engine  # noqa: E402
from brutefir_tpu.graph.compile import _step_impl  # noqa: E402
from brutefir_tpu.ops.device_codec import decode_words, encode_words  # noqa: E402
from brutefir_tpu.ops import partconv  # noqa: E402

C = int(sys.argv[1]) if len(sys.argv) > 1 else 26
N = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
B = int(sys.argv[3]) if len(sys.argv) > 3 else 16

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
spec = eng.spec
dio = eng.dio
with eng.control_mutex:
    c0 = eng.control.snapshot()
    g0, g1 = eng._mute_gains()

dev_in = conf.iodevs[0][0]
dev_out = conf.iodevs[1][0]
sel = jnp.asarray(dev_in.channel_selection, jnp.int32)
vmap = jnp.asarray(dev_in.virt2phys_local, jnp.int32)
osel = np.asarray(dev_out.channel_selection, np.int32)
mixm = jnp.eye(C, dtype=spec.real_dtype)
fmt_out = dev_out.sample_format


def make_step(no_decode=False, no_encode=False, no_fft=False, no_mac=False,
              mac_broadcast=False, no_scatter=False, no_mix=False,
              dus_write=False):
    def full_step(state, ctrl, in_gain, out_gain, bank, w):
        if no_decode:
            x = jnp.zeros((C, N), spec.real_dtype) + w[0, 0, 0].astype(
                spec.real_dtype) * 1e-9
        else:
            w32 = w.astype(jnp.int32)
            wv = w32[..., 0] | (w32[..., 1] << 8) | (w32[..., 2] << 16)
            wv = wv - ((wv & 0x800000) << 1)
            x = decode_words(wv, sel, vmap, spec.real_dtype)
        x = x * in_gain[:, None]

        # inline _step_impl with knobs
        frame = jnp.concatenate([state.prev_in, x], axis=-1)
        if no_fft:
            X = jnp.stack([frame[:, :N], frame[:, N:]], axis=1)
        else:
            X = partconv.rfft_planes(frame)
        ring = state.ring
        t = state.t
        if no_mix:
            mixed = X
        else:
            mixed = partconv.complex_mix(ctrl.in_mix, X)
        if dus_write:
            wpos = jnp.mod(t + ctrl.delay[0], B)
            ring = jax.lax.dynamic_update_slice(
                ring, mixed[:, None], (0, wpos, 0, 0))
        elif not no_scatter:
            wpos = jnp.mod(t + ctrl.delay, B)
            ring = ring.at[jnp.arange(spec.n_filters), wpos].set(mixed)
        if no_mac:
            y = ring[:, 0] * 0.9999
        elif mac_broadcast:
            hpos = jnp.mod(t - jnp.arange(B, dtype=jnp.int32), B)
            H = (bank[ctrl.coeff_idx[0], hpos]
                 * ctrl.mask[0, hpos][:, None, None])
            rr, ri = ring[:, :, 0], ring[:, :, 1]
            hr, hi = H[None, :, 0], H[None, :, 1]
            yr = jnp.sum(rr * hr - ri * hi, axis=1)
            yi = jnp.sum(rr * hi + ri * hr, axis=1)
            yr0 = jnp.sum(rr[..., 0] * hr[..., 0], axis=-1)
            yi0 = jnp.sum(ri[..., 0] * hi[..., 0], axis=-1)
            yr = yr.at[..., 0].set(yr0)
            yi = yi.at[..., 0].set(yi0)
            y = jnp.stack([yr, yi], 1)
        else:
            y = partconv.spectral_mac_rollh(ring, bank, ctrl.coeff_idx,
                                            ctrl.mask, t)
        if no_mix:
            out_spec = y
        else:
            out_spec = partconv.complex_mix(ctrl.out_mix, y)
        if no_fft:
            y_time = out_spec[:, 0]
        else:
            y_time = partconv.irfft_planes(out_spec)[:, :N]
        nan_ok = jnp.all(jnp.isfinite(y_time[:, 0]))
        y_time = y_time * out_gain[:, None]

        new_state = state._replace(prev_in=x, ring=ring, t=t + 1)
        if no_encode:
            return new_state, (jnp.zeros((N, C, 3), jnp.uint8),), \
                (jnp.zeros((C, 4), spec.real_dtype)
                 + jnp.sum(y_time) * 1e-9,), nan_ok
        phys = jnp.matmul(mixm, y_time, precision=jax.lax.Precision.HIGHEST)
        peak = jnp.max(jnp.abs(phys), axis=1)
        wordsq, m = encode_words(phys, fmt_out, jnp.asarray(osel), C,
                                 np.dtype(np.int32))
        q32 = wordsq.astype(jnp.int32)
        w3 = jnp.stack([(q32 >> s) & 0xFF for s in (0, 8, 16)],
                       axis=-1).astype(jnp.uint8)
        return new_state, (w3,), \
            (jnp.concatenate([m, peak[:, None]], axis=1),), nan_ok

    def multi(state, ctrl, ig, og, bank, stack):
        def body(st, wi):
            st, outs, meters, nan = full_step(st, ctrl, ig, og, bank, wi)
            return st, (meters, nan)
        state, (meters, nans) = jax.lax.scan(body, state, stack)
        return meters

    return jax.jit(multi)


def fetch(x):
    return float(np.asarray(jnp.sum(jax.tree.leaves(x)[0][:, 3])))


def slope(fn, n_lo=40, n_hi=360, reps=3):
    stacks = {m: jnp.zeros((m, N, C, 3), jnp.uint8) for m in (n_lo, n_hi)}
    st0 = eng.cg.init_state()
    for m in (n_lo, n_hi):
        fetch(fn(st0, c0, g0, g1, eng.bank, stacks[m]))
    out = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(fn(st0, c0, g0, g1, eng.bank, stacks[n_lo]))
        tl = time.perf_counter() - t0
        t0 = time.perf_counter()
        fetch(fn(st0, c0, g0, g1, eng.bank, stacks[n_hi]))
        th = time.perf_counter() - t0
        out.append((th - tl) / (n_hi - n_lo))
    out.sort()
    return out[len(out) // 2]


base = slope(make_step())
print(f"{'full (replica)':28s} {base * 1e3:8.4f} ms")
for name, kw in [
    ("no_decode", dict(no_decode=True)),
    ("no_encode", dict(no_encode=True)),
    ("no_fft", dict(no_fft=True)),
    ("no_mac", dict(no_mac=True)),
    ("mac_broadcast", dict(mac_broadcast=True)),
    ("no_scatter", dict(no_scatter=True)),
    ("no_mix", dict(no_mix=True)),
    ("bc+no_codec", dict(mac_broadcast=True, no_decode=True,
                         no_encode=True)),
    ("dus_write", dict(dus_write=True)),
    ("dus+bc", dict(dus_write=True, mac_broadcast=True)),
]:
    s = slope(make_step(**kw))
    print(f"{name:28s} {s * 1e3:8.4f} ms   (delta {(base - s) * 1e3:+8.4f})")

eng.teardown()
