#!/usr/bin/env python
"""A/B the crossfade dual-MAC fusion vs two kernel passes, on TPU.

bench5-style workload: every block crossfades (the CLI script in the
reference's bench5_config flips coeffs each block, bflogic_cli.c script
mode). Builds the flagship engine with `crossfade: true;` filters, forces
an always-crossfading control snapshot, and slope-times the scan-batched
device step with BRUTEFIR_TPU_DUAL_XFADE on/off in the same session
(interleaved rounds, forced-completion slopes -- see bench.py).

Usage: python tools/xfade_ab.py [uniform|alldistinct]
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
NCOEFF = {"uniform": 1, "alldistinct": CHANNELS}[MODE]

CONFIG = f"""
sampling_rate: 44100;
filter_length: {N},{B};
benchmark: true;
""" + "\n".join(
    f'coeff {i} {{ filename: "dirac pulse"; }};' for i in range(NCOEFF)
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
    f"filter {i} {{ from_inputs: {i}; to_outputs: {i}; "
    f"coeff: {i % NCOEFF}; crossfade: true; }};"
    for i in range(CHANNELS))


def main():
    import jax
    import jax.numpy as jnp
    from brutefir_tpu.config import parse_config
    from brutefir_tpu.runtime.engine import Engine
    from brutefir_tpu.runtime.device_io import DeviceIO

    # stage budget (bench.py exports the watchdog timeout it granted):
    # compiles dominate the cold path, so after compiling decide how
    # many measurement rounds fit instead of dying at the watchdog
    t_start = time.time()
    budget = float(os.environ.get("BENCH_STAGE_BUDGET_S", "0")) or None

    conf = parse_config(CONFIG)
    eng = Engine(conf)
    eng.setup()
    with eng.control_mutex:
        c0 = eng.control.snapshot()
        g0 = eng._mute_gains()
        uni = eng.control.snapshot_uniform
        udl = eng.control.snapshot_uniform_delay
    # force the crossfade controls every block (bench5: cfc flip per
    # block); c_off measures the non-swap blocks of a crossfade-enabled
    # config, dispatched on the host-selected xfade=False program --
    # which must cost exactly the plain step
    c_off = c0
    c0 = c0._replace(xfade=jnp.ones_like(c0.xfade),
                     any_xfade=jnp.asarray(True))
    M = int(os.environ.get("BENCH_M", "80"))
    dstacks = [jnp.zeros((M, N) + eng.dio.in_wire_shape[i],
                         eng.dio.in_wire_dtype[i])
               for i in range(1)]

    variants = {}
    for name, env in (("two-pass", "0"), ("dual", "1")):
        os.environ["BRUTEFIR_TPU_DUAL_XFADE"] = env
        dio = DeviceIO(eng)          # fresh trace under this env
        dio.dstate = eng.dio.dstate
        # host-selected programs, like the engine dispatches them:
        # xfade=True for the swap blocks, False for the noswap blocks
        variants[name] = (dio.multi_step(M, uniform=uni, udelay=udl,
                                         xfade=True),
                          dio.multi_step(M, uniform=uni, udelay=udl,
                                         xfade=False))

    for fns in variants.values():        # compile all
        for fn, ctrl in zip(fns, (c0, c_off)):
            st, outs, meters, nan = fn(eng.state, ctrl, g0[0], g0[1],
                                       eng.bank, dstacks)
            eng.state = st
            float(np.asarray(jnp.sum(jax.tree.leaves(meters)[0]
                                     ).astype(jnp.float32)))

    cases = [(name, fns[0 if tag == "" else 1], ctrl, tag)
             for name, fns in variants.items()
             for ctrl, tag in ((c0, ""), (c_off, " noswap"))]
    results = {name + tag: [] for name, _, _, tag in cases}
    rounds = 3
    if budget:
        # one measurement round ~ 4 cases x 14 dispatches x M blocks;
        # estimate from one timed dispatch and trim rounds to fit the
        # remaining budget with a 30 s safety margin
        t0 = time.perf_counter()
        st, outs, meters, nan = cases[0][1](eng.state, cases[0][2], g0[0],
                                            g0[1], eng.bank, dstacks)
        eng.state = st
        float(np.asarray(jnp.sum(jax.tree.leaves(meters)[0]
                                 ).astype(jnp.float32)))
        per_round = (time.perf_counter() - t0) * 14 * len(cases) * 1.3
        left = budget - (time.time() - t_start) - 30
        rounds = max(1, min(3, int(left / max(per_round, 1e-3))))
        if rounds < 3:
            sys.stderr.write(f"xfade_ab: trimmed to {rounds} round(s) "
                             f"({left:.0f} s left, ~{per_round:.0f} s "
                             "per round)\n")
    for round_i in range(rounds):
        for name, fn, ctrl, tag in cases:
            times = {}
            for n in (2, 12):
                t0 = time.perf_counter()
                for _ in range(n):
                    st, outs, meters, nan = fn(eng.state, ctrl, g0[0],
                                               g0[1], eng.bank, dstacks)
                    eng.state = st
                float(np.asarray(jnp.sum(jax.tree.leaves(meters)[0]
                                         ).astype(jnp.float32)))
                times[n] = time.perf_counter() - t0
            results[name + tag].append(
                (times[12] - times[2]) / ((12 - 2) * M) * 1e3)
    for k, v in results.items():
        v.sort()
        print(f"{MODE:11s} {k:16s}: slopes {['%.4f' % s for s in v]} "
              f"median {v[len(v) // 2]:.4f} ms/block")


if __name__ == "__main__":
    main()
