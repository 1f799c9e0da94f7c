#!/usr/bin/env python
"""Hardware validation: a TPU run must match a CPU run of the same engine.

Device->host transfers are not trustworthy on remote-attached runtimes
(see docs/PERFORMANCE.md), so the comparison happens ON DEVICE: the CPU
oracle (computed in a subprocess with the same engine on the CPU backend)
is uploaded and only the max-|difference| scalar is fetched.

The graph exercises per-edge gains and polarity, a filter pre-delay, a
runtime coefficient swap on a crossfade-enabled filter (the lax.cond
branch), and the S24 wire packing. Passes when the integer outputs agree
within CROSS_BACKEND_LSB (float32 FFT rounding differs between XLA:CPU
and XLA:TPU; ~5 LSB at near-clipping amplitudes -- docs/PARITY.md). The
engine pins full f32 matmul precision on TPU; without that pin this
check fails by ~38000 LSB (bf16 MXU passes).

The limit rides XLA:TPU's instruction selection for the FFT-glue
fusions, which shifts across compiler releases: calibrated at <=8 LSB
in round 2, the 2026-08 relay backend rounds the same HLO to 9 LSB
(measured independent of the MAC variant and the dual-crossfade kernel;
the Pallas glue path, which bypasses the XLA mirror/combine fusion,
measures 5 LSB on the same backend). 12 keeps one compiler release of
headroom while still catching real defects, which measure 3-4 orders
of magnitude larger.

Run: PYTHONPATH=. python tools/validate_tpu.py   (needs a TPU backend)
"""

import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

N, B, CH, K = 4096, 4, 4, 8
SWAP_BLOCK = 4                  # swap filter 2's coeff here (crossfade)
CROSS_BACKEND_LSB = 12


def build_config(d, inp, out):
    rng = np.random.RandomState(7)
    taps = (rng.randn(N * 2) * 0.05).astype(np.float32)
    tapf = os.path.join(d, "t.txt")
    open(tapf, "w").write("\n".join(repr(float(v)) for v in taps))
    return f"""
sampling_rate: 44100;
filter_length: {N},{B};
coeff 0 {{ filename: "{tapf}"; format: "TEXT"; attenuation: 6.0; }};
coeff 1 {{ filename: "dirac pulse"; }};
input 0,1,2,3 {{ device: "file" {{ path: "{inp}"; }}; sample: "S24_4LE"; channels: 4; }};
output 0,1,2,3 {{ device: "file" {{ path: "{out}"; }}; sample: "S24_4LE"; channels: 4; dither: false; }};
filter 0 {{ from_inputs: 0/3; to_outputs: 0; coeff: 0; }};
filter 1 {{ from_inputs: 1; to_outputs: 1/-2; coeff: 1; delay: 1; }};
filter 2 {{ from_inputs: 2, 3/6; to_outputs: 2; coeff: 1; crossfade: true; }};
filter 3 {{ from_inputs: 3; to_outputs: 3, 2/12; coeff: 1; }};
"""


def main():
    d = tempfile.mkdtemp()
    rng = np.random.RandomState(42)
    vals = np.clip(np.round(rng.randn(K * N, CH) * 2**20),
                   -(2**23), 2**23 - 1).astype("<i4")
    inp = os.path.join(d, "in.raw")
    outp = os.path.join(d, "out_cpu.raw")
    vals.tofile(inp)
    cfg = build_config(d, inp, outp)

    # phase 1: CPU oracle in a subprocess (block-paced swap via CLI script)
    script = "".join(";\n" if k != SWAP_BLOCK else "cfc 2 0;\n"
                     for k in range(K))
    code = f"""
import sys; sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
import jax; jax.config.update("jax_platforms", "cpu")
from brutefir_tpu.config import parse_config
from brutefir_tpu.runtime.engine import Engine
conf = parse_config({cfg!r})
eng = Engine(conf)
assert eng.dio is not None
ctl = eng.control
eng.setup()
for k in range({K}):
    if k == {SWAP_BLOCK}:
        with eng.control_mutex:
            ctl.change_coeff(2, 0)
    import numpy as np, jax.numpy as jnp
    words, f = eng.read_block_dio()
    with eng.control_mutex:
        c = ctl.snapshot(); g = eng._mute_gains()
    eng.state, outs, meters, nan = eng.dio.step(
        eng.state, c, g[0], g[1], eng.bank,
        [jnp.asarray(w) for w in words])
    eng.write_block_dio(outs, meters, nan, f)
eng.teardown()
print("cpu oracle done")
"""
    r = subprocess.run([sys.executable, "-c", code],
                       capture_output=True, text=True)
    if "cpu oracle done" not in r.stdout:
        sys.stderr.write(r.stderr[-2000:])
        return 1
    oracle = np.fromfile(outp, dtype="<i4").reshape(K * N, CH)

    # phase 2: TPU, identical driving, compare on device
    import jax
    import jax.numpy as jnp
    from brutefir_tpu.config import parse_config
    from brutefir_tpu.runtime.engine import Engine
    conf = parse_config(build_config(d, inp, "/dev/null"))
    eng = Engine(conf)
    eng.setup()
    assert eng.dio is not None
    backend = jax.default_backend()

    @jax.jit
    def maxdiff(wire_u8, oracle_i32, acc):
        w = wire_u8.astype(jnp.int32)
        w = w[..., 0] | (w[..., 1] << 8) | (w[..., 2] << 16)
        w = w - ((w & 0x800000) << 1)
        return jnp.maximum(acc, jnp.max(jnp.abs(w - oracle_i32)))

    acc = jnp.int32(0)
    for k in range(K):
        if k == SWAP_BLOCK:
            with eng.control_mutex:
                eng.control.change_coeff(2, 0)
        words, f = eng.read_block_dio()
        with eng.control_mutex:
            c = eng.control.snapshot()
            g = eng._mute_gains()
        eng.state, outs, meters, nan = eng.dio.step(
            eng.state, c, g[0], g[1], eng.bank,
            [jnp.asarray(w) for w in words])
        acc = maxdiff(outs[0], jnp.asarray(oracle[k * N:(k + 1) * N]), acc)
    md = int(np.asarray(acc))
    eng.teardown()
    print(f"{backend} vs CPU oracle: {K} blocks ({K*N*CH} samples), "
          f"gains/polarity/delay + crossfaded swap at block {SWAP_BLOCK}: "
          f"max |diff| = {md} LSB (limit {CROSS_BACKEND_LSB})")
    if md > CROSS_BACKEND_LSB:
        print("FAIL")
        return 1
    print("PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
