#!/usr/bin/env python
"""Does numpy->jit transfer cost depend on object identity?

U2a: same np objects every call (upload_probe.py's fast case).
U2b: fresh np copies every call (the engine's real situation).
U2c: one preallocated buffer mutated in place -- plus a correctness check
     that the device actually sees the new contents (identity-cache risk).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import XTC_CONFIG, make_probe  # noqa: E402

N_IT = 200


def main():
    import jax
    import jax.numpy as jnp
    from brutefir_tpu.config import parse_config
    from brutefir_tpu.runtime import Engine

    conf = parse_config(XTC_CONFIG)
    eng = Engine(conf)
    eng.setup()
    words_np, _ = eng.read_block_dio()
    with eng.control_mutex:
        ctrl = eng.control.snapshot()
        g0, g1 = eng._mute_gains()
    for _ in range(3):
        eng.state, o, m, nk = eng.dio.step(eng.state, ctrl, g0, g1,
                                           eng.bank, list(words_np))
    probe, probe_cost = make_probe(eng)
    print(f"probe RTT {probe_cost * 1e3:.3f} ms", file=sys.stderr)

    def timed(label, fn, n=N_IT):
        t0 = time.perf_counter()
        fn(n)
        probe(int(t0 * 7) % 9973)
        dt = (time.perf_counter() - t0 - probe_cost) / n * 1e3
        print(f"{label:32s} {dt:7.3f} ms/it")

    def u2a(n):
        w = list(words_np)
        for _ in range(n):
            eng.state, o, m, nk = eng.dio.step(eng.state, ctrl, g0, g1,
                                               eng.bank, w)

    def u2b(n):
        for _ in range(n):
            w = [x.copy() for x in words_np]
            eng.state, o, m, nk = eng.dio.step(eng.state, ctrl, g0, g1,
                                               eng.bank, w)

    staging = [np.array(x) for x in words_np]

    def u2c(n):
        for i in range(n):
            for s in staging:
                s.ravel()[0] = (i * 7) % 120
            eng.state, o, m, nk = eng.dio.step(eng.state, ctrl, g0, g1,
                                               eng.bank, list(staging))

    timed("U2a same np objects", u2a)
    timed("U2b fresh np copies", u2b)
    timed("U2c mutated staging buffer", u2c)

    # correctness: does the device see mutated contents of a reused buffer?
    staging[0][:] = 0
    staging[0].reshape(-1)[:3] = (42, 0, 0)  # S24 wire bytes: sample=42
    st, outs, m, nk = eng.dio.step(eng.state, ctrl, g0, g1, eng.bank,
                                   list(staging))
    a = np.asarray(jax.jit(lambda v: v.astype(jnp.float32).sum())(
        jnp.asarray(outs[0]).astype(jnp.int32)))
    staging[0].reshape(-1)[:3] = (84, 0, 0)  # mutate in place, same object
    st, outs, m, nk = eng.dio.step(st, ctrl, g0, g1, eng.bank,
                                   list(staging))
    b = np.asarray(jax.jit(lambda v: v.astype(jnp.float32).sum())(
        jnp.asarray(outs[0]).astype(jnp.int32)))
    print(f"mutation visible: {a != b} (sums {a} vs {b})")
    eng.teardown()


if __name__ == "__main__":
    main()
