#!/usr/bin/env python
"""The reference's latency/load curve, reproduced on this hardware.

BruteFIR's hallmark table (`/root/reference/brutefir.html:842-958`) sweeps
the xtc_config (4 filters, 8192 taps total) across partition shapes --
64x128, 128x64, 256x32, 512x16, 1024x8 -- trading I/O delay against CPU
load. This tool reruns that sweep through the real engine (realtime block
loop, file I/O, S24_4LE wire) and reports, per point:

* p50/p95 block period and the realtime index (period / block budget);
* step_floor_ms: the compiled device step re-dispatched on pre-uploaded
  words -- the engine-side floor with the host read/write stripped;
* transport_floor_ms: one tiny fresh upload + trivial execute per block
  (measured once; shape-independent) -- the remote attachment's share.

Run on the TPU host:  python tools/latency_curve.py
One JSON line per point + a closing summary line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RATE = 44100
SHAPES = ((64, 128), (128, 64), (256, 32), (512, 16), (1024, 8))
BLOCKS = int(os.environ.get("CURVE_BLOCKS", "500"))

CONFIG_TPL = """
sampling_rate: 44100;
filter_length: {n},{b};
benchmark: true;
coeff 0 {{ filename: "dirac pulse"; }};
coeff 1 {{ filename: "dirac pulse"; }};
input 0,1 {{ device: "file" {{ path: "/dev/zero"; }}; sample: "S24_4LE"; channels: 2; }};
output 0,1 {{ device: "file" {{ path: "/dev/null"; }}; sample: "S24_4LE"; channels: 2; dither: false; }};
filter 0 {{ from_inputs: 0; to_outputs: 0; coeff: 0; }};
filter 1 {{ from_inputs: 1; to_outputs: 0/0.0; coeff: 1; }};
filter 2 {{ from_inputs: 1; to_outputs: 1; coeff: 0; }};
filter 3 {{ from_inputs: 0; to_outputs: 1/0.0; coeff: 1; }};
"""


def make_probe(eng):
    """Forced-completion probe (see bench.py): a tiny data-dependent
    scalar fetch that actually drains the queued device work."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def _probe_fn(ring, salt):
        return jnp.sum(ring[0, 0, :, :4]) + salt

    def probe(k):
        return float(np.asarray(_probe_fn(eng.state.ring, jnp.float32(k))))

    probe(0)
    cal = []
    for k in range(1, 4):
        t0 = time.perf_counter()
        probe(1000 + k)
        cal.append(time.perf_counter() - t0)
    return probe, sorted(cal)[1]


def transport_floor(probe, probe_cost):
    import jax
    import jax.numpy as jnp
    tiny = np.zeros((64, 2, 3), np.uint8)

    @jax.jit
    def triv(acc, w):
        return acc + jnp.sum(w.astype(jnp.float32)) * 1e-9

    acc = triv(jnp.zeros((8,), jnp.float32), jnp.asarray(tiny))
    t0 = time.perf_counter()
    for i in range(200):
        acc = triv(acc, jnp.asarray(tiny + np.uint8(i % 3)))
    probe(3)
    return (time.perf_counter() - t0 - probe_cost) / 200


def measure_point(n, b, sink):
    import gc
    import jax.numpy as jnp
    from brutefir_tpu.config import parse_config
    from brutefir_tpu.runtime import Engine
    if os.environ.get("CURVE_GC", "1") == "0":
        # p95 diagnosis: CPython gen-2 collections pause the block loop
        # for milliseconds at 64-sample budgets; CURVE_GC=0 isolates
        # that share of the tail
        gc.disable()
    conf = parse_config(CONFIG_TPL.format(n=n, b=b))
    eng = Engine(conf)
    eng.setup()
    eng.run(max_blocks=30, setup=False, sink_output=sink)          # warm
    probe, probe_cost = make_probe(eng)
    t0 = time.perf_counter()
    stats = eng.run(max_blocks=30 + BLOCKS, setup=False, sink_output=sink)
    probe(1)
    forced_mean = (time.perf_counter() - t0 - probe_cost) / BLOCKS

    # engine-side floor: re-dispatch the compiled step on device-staged
    # words (execute RPC + device work; no host read/encode) -- the SAME
    # program variant the realtime loop above dispatched (uniform fast
    # path, host-selected no-crossfade), so the floor attributes the
    # program whose p50/p95 it sits beside
    words_np, _ = eng.read_block_dio()
    words = [jnp.asarray(w) for w in words_np]
    with eng.control_mutex:
        ctrl = eng.control.snapshot()
        g0, g1 = eng._mute_gains()
        uni = eng.control.snapshot_uniform
        xf = eng.control.snapshot_xfade
    for _ in range(2):
        eng.state, o, m, nk = eng.dio.step(eng.state, ctrl, g0, g1,
                                           eng.bank, words,
                                           uniform=uni, xfade=xf)
    t0 = time.perf_counter()
    for _ in range(200):
        eng.state, o, m, nk = eng.dio.step(eng.state, ctrl, g0, g1,
                                           eng.bank, words,
                                           uniform=uni, xfade=xf)
    probe(2)
    step_floor = (time.perf_counter() - t0 - probe_cost) / 200

    tf = transport_floor(probe, probe_cost)
    eng.teardown()

    budget_ms = n / RATE * 1e3
    io_delay_ms = 2 * n / RATE * 1e3          # fixed 2N pipeline delay
    return {
        "partition": f"{n}x{b}",
        "sink_mode": sink,
        "io_delay_ms": round(io_delay_ms, 2),
        "block_budget_ms": round(budget_ms, 3),
        "p50_block_ms": round(stats["p50_block_ms"], 3),
        "p95_block_ms": round(stats["p95_block_ms"], 3),
        "mean_block_ms_forced": round(forced_mean * 1e3, 3),
        "step_floor_ms": round(step_floor * 1e3, 3),
        "transport_floor_ms": round(tf * 1e3, 3),
        "rti_p50": round(stats["p50_block_ms"] / budget_ms, 3),
        "rti_p95": round(stats["p95_block_ms"] / budget_ms, 3),
        "step_floor_rti": round(step_floor * 1e3 / budget_ms, 3),
    }


def main():
    # sink decision mirrors bench.py: when the attachment's d2h path is
    # implausibly slow (remote relays stream device buffers at tens of
    # ms per fetch), the writer's per-block output fetch would turn the
    # curve into a network test -- run the full pipeline with the encode
    # on a host staging buffer instead, and say so in every row.
    env = os.environ.get("CURVE_SINK")
    if env is not None:
        sink = env == "1"
    else:
        import bench
        sink = not bench.transfers_work()
    sys.stderr.write(f"latency_curve: sink_mode={sink}\n")
    rows = []
    for n, b in SHAPES:
        row = measure_point(n, b, sink)
        rows.append(row)
        print("POINT " + json.dumps(row), flush=True)
    print("CURVE " + json.dumps(rows), flush=True)


if __name__ == "__main__":
    main()
