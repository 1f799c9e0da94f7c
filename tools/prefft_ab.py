"""A/B the hoisted pre-FFT batched multi_step vs the legacy scanned one.

Same session, same engine, interleaved measurement rounds so transport
congestion hits both variants equally. Forced-completion slope timing
(bench.py methodology): per-block device time = slope between n=2 and
n=12 back-to-back dispatches of an 80-block batch.

Usage: python tools/prefft_ab.py  (TPU; ~4 min)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench


def measure(eng, mstep, dstacks, c0, g0, probe, tag, rounds=3):
    import jax.numpy as jnp
    slopes = []
    for rep in range(rounds):
        times = {}
        for n in (2, 12):
            t0 = time.perf_counter()
            for _ in range(n):
                st, outs, meters, nan = mstep(eng.state, c0, g0[0], g0[1],
                                              eng.bank, dstacks)
                eng.state = st
            probe(500 + hash(tag) % 97 + 10 * rep + n)
            times[n] = time.perf_counter() - t0
        slopes.append((times[12] - times[2]) / ((12 - 2) * 80) * 1e3)
    slopes.sort()
    return slopes


def main():
    from brutefir_tpu.config import parse_config
    from brutefir_tpu.runtime import Engine
    import jax.numpy as jnp

    conf = parse_config(bench.CONFIG)
    eng = Engine(conf)
    eng.setup()
    with eng.control_mutex:
        c0 = eng.control.snapshot()
        g0 = eng._mute_gains()
        uni = eng.control.snapshot_uniform
    M = 80
    dstacks = [jnp.zeros((M, bench.N) + eng.dio.in_wire_shape[i],
                         eng.dio.in_wire_dtype[i])
               for i in range(len(conf.iodevs[0]))]

    # build both variants up front (distinct cache keys via env toggling)
    os.environ["BRUTEFIR_TPU_PREFFT"] = "0"
    old = eng.dio._multi_step_scanned(M, (M, uni, False))
    eng.dio._multi.clear()
    os.environ["BRUTEFIR_TPU_PREFFT"] = "1"
    new = eng.dio.multi_step(M, uniform=uni)

    # compile both
    st, *_ = old(eng.state, c0, g0[0], g0[1], eng.bank, dstacks)
    eng.state = st
    st, *_ = new(eng.state, c0, g0[0], g0[1], eng.bank, dstacks)
    eng.state = st
    probe, cost = bench.make_probe(eng)

    results = {"old": [], "new": []}
    for round_i in range(3):       # interleave rounds to share congestion
        results["old"] += measure(eng, old, dstacks, c0, g0, probe,
                                  "old", rounds=1)
        results["new"] += measure(eng, new, dstacks, c0, g0, probe,
                                  "new", rounds=1)
    for k in ("old", "new"):
        s = sorted(results[k])
        print(f"{k}: slopes {['%.4f' % v for v in s]} "
              f"median {s[len(s)//2]:.4f} ms/block")


if __name__ == "__main__":
    main()
