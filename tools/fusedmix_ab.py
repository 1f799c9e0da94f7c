"""A/B the fused MAC+mix kernel vs MAC + separate complex_mix, on TPU.

Same session, interleaved rounds (congestion hits both equally), forced-
completion slope timing over 80-block batched dispatches, flagship shape.

Usage: python tools/fusedmix_ab.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench


def main():
    from brutefir_tpu.config import parse_config
    from brutefir_tpu.runtime import Engine
    from brutefir_tpu.runtime.device_io import DeviceIO
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

    variants = {}
    for name, env in (("unfused", "0"), ("fused", "1")):
        os.environ["BRUTEFIR_TPU_FUSED_MIX"] = env
        dio = DeviceIO(eng)       # fresh trace under this env
        dio.dstate = eng.dio.dstate
        variants[name] = dio.multi_step(M, uniform=uni)

    for name, fn in variants.items():   # compile both
        st, *_ = fn(eng.state, c0, g0[0], g0[1], eng.bank, dstacks)
        eng.state = st
    probe, cost = bench.make_probe(eng)

    results = {k: [] for k in variants}
    for round_i in range(3):
        for name, fn in variants.items():
            times = {}
            for n in (2, 12):
                t0 = time.perf_counter()
                for _ in range(n):
                    st, *_ = fn(eng.state, c0, g0[0], g0[1], eng.bank,
                                dstacks)
                    eng.state = st
                probe(700 + round_i * 29 + n + len(name))
                times[n] = time.perf_counter() - t0
            results[name].append(
                (times[12] - times[2]) / ((12 - 2) * M) * 1e3)
    for k, v in results.items():
        v.sort()
        print(f"{k}: slopes {['%.4f' % s for s in v]} "
              f"median {v[len(v)//2]:.4f} ms/block")


if __name__ == "__main__":
    main()
