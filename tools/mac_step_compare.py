#!/usr/bin/env python
"""Compare the full device step (multi_step scan) under dense vs pallas MAC.

Builds the bench flagship engine twice (BRUTEFIR_TPU_MAC=jnp / pallas) and
slope-times the scan-batched device step exactly like bench.py's headline.
Run on the TPU host: `python tools/mac_step_compare.py [uniform|distinct]`.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CHANNELS = int(os.environ.get("BENCH_C", "26"))
N = int(os.environ.get("BENCH_N", "8192"))
B = int(os.environ.get("BENCH_B", "16"))
MODE = sys.argv[1] if len(sys.argv) > 1 else "uniform"
FMT = os.environ.get("BENCH_FMT", "S24_4LE")
# uniform: one shared coeff; distinct: 4 sets; alldistinct: one per filter
NCOEFF = {"uniform": 1, "distinct": 4, "alldistinct": CHANNELS}[MODE]

CONFIG = f"""
sampling_rate: 44100;
filter_length: {N},{B};
benchmark: true;
""" + "\n".join(
    f'coeff {i} {{ filename: "dirac pulse"; }};' for i in range(NCOEFF)
) + f"""
input {",".join(str(i) for i in range(CHANNELS))} {{
    device: "file" {{ path: "/dev/zero"; }};
    sample: "{FMT}";
    channels: {CHANNELS};
}};
output {",".join(str(i) for i in range(CHANNELS))} {{
    device: "file" {{ path: "/dev/null"; }};
    sample: "{FMT}";
    channels: {CHANNELS};
    dither: false;
}};
""" + "\n".join(
    f"filter {i} {{ from_inputs: {i}; to_outputs: {i}; "
    f"coeff: {i % NCOEFF}; }};"
    for i in range(CHANNELS))


def measure(mac: str) -> float:
    os.environ["BRUTEFIR_TPU_MAC"] = mac
    import jax
    import jax.numpy as jnp
    from brutefir_tpu.config import parse_config
    from brutefir_tpu.runtime.engine import Engine

    conf = parse_config(CONFIG)
    eng = Engine(conf)
    eng.setup()
    with eng.control_mutex:
        c0 = eng.control.snapshot()
        g0 = eng._mute_gains()
        uni = eng.control.snapshot_uniform
        udl = eng.control.snapshot_uniform_delay
        xf = eng.control.snapshot_xfade
    M = int(os.environ.get("BENCH_M", "80"))
    # xfade=False mirrors run_offline's dispatch (the host asserts no
    # crossfade for the batch), which also makes the batch eligible for
    # the two-blocks-per-iteration pair program (BRUTEFIR_TPU_PAIR=0
    # restores per-block scanning for A/Bs).
    mstep = eng.dio.multi_step(M, uniform=uni, udelay=udl, xfade=xf)
    # report the engaged group size (bench.py records it): replicate
    # multi_step's own dispatch condition so the print can't diverge
    # from what actually ran
    G = 1
    if xf is False:
        from brutefir_tpu.graph.compile import group_size
        mac_, _, mesh_, _, ps_spec = eng.dio._core_refs
        G = group_size(ps_spec, mac_, None, mesh_, M)
    print(f"dispatch grouped G={G}", flush=True)
    dstacks = [jnp.zeros((M, N) + eng.dio.in_wire_shape[i],
                         eng.dio.in_wire_dtype[i])
               for i in range(1)]
    st, outs, meters, nan = mstep(eng.state, c0, g0[0], g0[1],
                                  eng.bank, dstacks)
    eng.state = st
    float(np.asarray(jnp.sum(jax.tree.leaves(meters)[0]).astype(jnp.float32)))  # force
    slopes = []
    for rep in range(3):
        times = {}
        for n in (2, 12):
            t0 = time.perf_counter()
            for _ in range(n):
                st, outs, meters, nan = mstep(eng.state, c0, g0[0],
                                              g0[1], eng.bank, dstacks)
                eng.state = st
            float(np.asarray(jnp.sum(jax.tree.leaves(meters)[0]).astype(jnp.float32)))
            times[n] = time.perf_counter() - t0
        slopes.append((times[12] - times[2]) / ((12 - 2) * M) * 1e3)
    slopes.sort()
    return slopes[len(slopes) // 2]


if __name__ == "__main__":
    mac = sys.argv[2] if len(sys.argv) > 2 else "jnp"
    ms = measure(mac)
    print(f"{MODE:9s} mac={mac:8s} device step {ms:.4f} ms/block")
