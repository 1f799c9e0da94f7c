#!/usr/bin/env python
"""What does a per-block h2d upload really cost, and what avoids it?

U1: jnp.asarray loop (the producer thread's current op), forced.
U2: numpy passed straight into the jitted step (implicit transfer).
U3: two threads doing asarray concurrently (does h2d pipeline?).
U4: larger array upload (is it RTT- or bandwidth-bound?).
"""

import sys
import threading
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
    print("word shapes:", [w.shape for w in words_np], file=sys.stderr)
    with eng.control_mutex:
        ctrl = eng.control.snapshot()
        g0, g1 = eng._mute_gains()
    words = [jnp.asarray(w) for w in words_np]
    for _ in range(3):
        eng.state, o, m, nk = eng.dio.step(eng.state, ctrl, g0, g1,
                                           eng.bank, words)
    probe, probe_cost = make_probe(eng)
    print(f"probe RTT {probe_cost * 1e3:.3f} ms", file=sys.stderr)

    def timed(label, fn, n=N_IT):
        t0 = time.perf_counter()
        fn(n)
        probe(int(t0) % 9973)
        dt = (time.perf_counter() - t0 - probe_cost) / n * 1e3
        print(f"{label:28s} {dt:7.3f} ms/it")
        return dt

    def u1(n):
        for _ in range(n):
            v = jnp.asarray(words_np[0])
        v.block_until_ready()

    # numpy leaves straight into the jitted call
    def u2(n):
        for _ in range(n):
            eng.state, o, m, nk = eng.dio.step(eng.state, ctrl, g0, g1,
                                               eng.bank, list(words_np))

    def u3(n):
        halves = []
        def worker():
            for _ in range(n // 2):
                halves.append(jnp.asarray(words_np[0]))
        ts = [threading.Thread(target=worker) for _ in range(2)]
        t0 = time.perf_counter()
        for t in ts:
            t.start()
        for t in ts:
            t.join()

    big = np.zeros((256, 1024), np.float32)  # 1 MB

    def u4(n):
        for _ in range(n):
            v = jnp.asarray(big)
        v.block_until_ready()

    timed("U1 asarray 384B", u1)
    timed("U2 numpy->jit step", u2)
    timed("U3 asarray 2 threads", u3)
    timed("U4 asarray 1MB", u4, n=50)
    eng.teardown()


if __name__ == "__main__":
    main()
