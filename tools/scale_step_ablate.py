#!/usr/bin/env python
"""In-situ ablation of the composed scale-shape step (pallas MAC path).

The component slopes (tools/scale_mac_probe.py, step_breakdown.py) sum
to ~1.54 ms at the 256x256x131k alldistinct shape, but the composed
multi_step measures ~1.84 ms (tools/mac_step_compare.py) -- ~0.3 ms is
unattributed. Isolated probes can't see scheduling/overlap effects, so
this tool measures the REAL compiled step with individual stages
knocked out by monkeypatching the seams `_step_impl` actually calls
(partconv.rfft_planes / irfft_planes_valid / complex_mix and the
compile module's pallas_spectral_mac binding), keeping shapes, dtypes
and data dependences intact. `full - ablated` is each stage's true
in-situ cost including whatever scheduling it drags in.

Run on the TPU host, nothing else running:
    BENCH_C=256 BENCH_N=8192 BENCH_B=16 python tools/scale_step_ablate.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CHANNELS = int(os.environ.get("BENCH_C", "256"))
N = int(os.environ.get("BENCH_N", "8192"))
B = int(os.environ.get("BENCH_B", "16"))
M = int(os.environ.get("BENCH_M", "40"))

CONFIG = f"""
sampling_rate: 44100;
filter_length: {N},{B};
benchmark: true;
""" + "\n".join(
    f'coeff {i} {{ filename: "dirac pulse"; }};' for i in range(CHANNELS)
) + f"""
input {",".join(str(i) for i in range(CHANNELS))} {{
    device: "file" {{ path: "/dev/zero"; }};
    sample: "S24_4LE";
    channels: {CHANNELS};
}};
output {",".join(str(i) for i in range(CHANNELS))} {{
    device: "file" {{ path: "/dev/null"; }};
    sample: "S24_4LE";
    channels: {CHANNELS};
    dither: false;
}};
""" + "\n".join(
    f"filter {i} {{ from_inputs: {i}; to_outputs: {i}; coeff: {i}; }};"
    for i in range(CHANNELS))

os.environ.setdefault("BRUTEFIR_TPU_MAC", "pallas")

import jax                                            # noqa: E402
import jax.numpy as jnp                               # noqa: E402
from brutefir_tpu.ops import partconv                 # noqa: E402
from brutefir_tpu.graph import compile as gcompile    # noqa: E402
from brutefir_tpu.runtime import device_io as dio_mod  # noqa: E402

_ORIG = dict(
    rfft=partconv.rfft_planes,
    irfft=partconv.irfft_planes_valid,
    mix=partconv.complex_mix,
    mac=gcompile.pallas_spectral_mac,
    dec=dio_mod.decode_words,
    enc=dio_mod.encode_words,
)


def _patch(ablate):
    # stand-ins keep shapes/dtypes and a data dependence on every
    # operand so XLA cannot DCE the surrounding stages
    if "fft" in ablate:
        partconv.rfft_planes = lambda fr: jnp.stack(
            [fr[..., :fr.shape[-1] // 2], fr[..., fr.shape[-1] // 2:]],
            axis=-2)
        partconv.irfft_planes_valid = lambda p: p[..., 0, :] * 1.000001
    if "mix" in ablate:
        def cheap_mix(m, X):
            return X[: m.shape[0]] * (1.0 + jnp.sum(m) * 1e-12)
        partconv.complex_mix = cheap_mix
    if "mac" in ablate:
        def cheap_mac(ring_s, bank, ci, mk, t, **kw):
            F = ring_s.shape[0]
            one = ring_s[:, 0].reshape(F, 2, N)       # one slot, no stream
            dep = (bank.reshape(-1)[0] + mk.reshape(-1)[0]
                   + ci.astype(one.dtype).reshape(-1)[0] * 0
                   + t.astype(one.dtype) * 0)
            return one * 0.9999 + dep * 1e-12
        gcompile.pallas_spectral_mac = cheap_mac
    if "inmix" in ablate or "omix" in ablate:
        # complex_mix is called twice per trace at this single-stage
        # config: first the input mix, then the output mix -- a
        # trace-time counter lets each be ablated separately
        calls = {"n": 0}

        def counted_mix(m, X, _orig=_ORIG["mix"]):
            calls["n"] += 1
            is_in = calls["n"] % 2 == 1
            if ("inmix" in ablate and is_in) or \
                    ("omix" in ablate and not is_in):
                return X[: m.shape[0]] * (1.0 + jnp.sum(m) * 1e-12)
            return _orig(m, X)
        partconv.complex_mix = counted_mix
    if "dec" in ablate:
        def cheap_dec(words, selection, virt_map, rd):
            dep = words.reshape(-1)[0].astype(rd) * 1e-12
            return jnp.full((len(virt_map), words.shape[0]), 0.001,
                            rd) + dep
        dio_mod.decode_words = cheap_dec
    if "enc" in ablate:
        def cheap_enc(y, fmt, selection, open_channels, word_dtype):
            P, Nn = y.shape
            dep = (y.reshape(-1)[0] * 1e-12).astype(word_dtype)
            words = jnp.zeros((Nn, open_channels), word_dtype) + dep
            meters = jnp.zeros((P, 3), jnp.float32) \
                + y.reshape(-1)[1].astype(jnp.float32) * 1e-12
            return words, meters
        dio_mod.encode_words = cheap_enc


def _unpatch():
    partconv.rfft_planes = _ORIG["rfft"]
    partconv.irfft_planes_valid = _ORIG["irfft"]
    partconv.complex_mix = _ORIG["mix"]
    gcompile.pallas_spectral_mac = _ORIG["mac"]
    dio_mod.decode_words = _ORIG["dec"]
    dio_mod.encode_words = _ORIG["enc"]


def measure(ablate=()):
    from brutefir_tpu.config import parse_config
    from brutefir_tpu.runtime.engine import Engine
    _patch(ablate)
    try:
        conf = parse_config(CONFIG)
        eng = Engine(conf)
        eng.setup()
        with eng.control_mutex:
            c0 = eng.control.snapshot()
            g0 = eng._mute_gains()
            uni = eng.control.snapshot_uniform
            udl = eng.control.snapshot_uniform_delay
        mstep = eng.dio.multi_step(M, uniform=uni, udelay=udl)
        dstacks = [jnp.zeros((M, N) + eng.dio.in_wire_shape[0],
                             eng.dio.in_wire_dtype[0])]
        st, outs, meters, nan = mstep(eng.state, c0, g0[0], g0[1],
                                      eng.bank, dstacks)
        eng.state = st
        float(np.asarray(jnp.sum(
            jax.tree.leaves(meters)[0]).astype(jnp.float32)))
        slopes = []
        for rep in range(3):
            times = {}
            for n in (2, 8):
                t0 = time.perf_counter()
                for _ in range(n):
                    st, outs, meters, nan = mstep(eng.state, c0, g0[0],
                                                  g0[1], eng.bank, dstacks)
                    eng.state = st
                float(np.asarray(jnp.sum(
                    jax.tree.leaves(meters)[0]).astype(jnp.float32)))
                times[n] = time.perf_counter() - t0
            slopes.append((times[8] - times[2]) / ((8 - 2) * M) * 1e3)
        eng.teardown()
        del eng
        slopes.sort()
        return slopes[len(slopes) // 2]
    finally:
        _unpatch()


if __name__ == "__main__":
    base = measure(())
    print(f"{'full step':22s} {base:8.4f} ms/block")
    names = os.environ.get(
        "ABLATE", "fft,mix,mac,fft+mix+mac,dec,enc,dec+enc").split(",")
    for name in names:
        s = measure(tuple(name.split("+")))
        print(f"no {name:19s} {s:8.4f} ms/block   "
              f"(in-situ cost {base - s:+8.4f})", flush=True)
