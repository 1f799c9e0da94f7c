#!/usr/bin/env python
"""Low-latency dispatch diagnostics at the xtc shape (64x64).

Separates the per-block cost into layers, all forced-completion timed
(the relay acks block_until_ready early; only a data-dependent scalar
fetch drains the queue -- docs/PERFORMANCE.md):

  A. step-only dispatch floor: the compiled dio step re-dispatched in a
     tight loop on pre-uploaded words (no host IO, no threads).
  B. + per-block word upload (jnp.asarray of fresh numpy words).
  C. full Engine.run sink mode (threads, queues, meters) -- the bench path.

Run alone (nothing else on the host or chip).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import XTC_CONFIG, make_probe, RATE  # noqa: E402

BLOCKS = 500


def build():
    from brutefir_tpu.config import parse_config
    from brutefir_tpu.runtime import Engine
    conf = parse_config(XTC_CONFIG)
    eng = Engine(conf)
    eng.setup()
    return eng


def forced(fn, probe, probe_cost, n=BLOCKS):
    t0 = time.perf_counter()
    fn(n)
    probe(int(t0 * 1e3) % 100000)
    return (time.perf_counter() - t0 - probe_cost) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp

    eng = build()
    print("backend:", jax.default_backend(), "mac:", eng.cg.mac,
          file=sys.stderr)
    words_np, f = eng.read_block_dio()
    words = [jnp.asarray(w) for w in words_np]
    with eng.control_mutex:
        ctrl = eng.control.snapshot()
        g0, g1 = eng._mute_gains()

    # warm/compile
    for _ in range(3):
        eng.state, outs, meters, nan_ok = eng.dio.step(
            eng.state, ctrl, g0, g1, eng.bank, words)
    probe, probe_cost = make_probe(eng)
    print(f"probe RTT: {probe_cost * 1e3:.3f} ms", file=sys.stderr)

    def layer_a(n):
        for _ in range(n):
            eng.state, o, m, nk = eng.dio.step(
                eng.state, ctrl, g0, g1, eng.bank, words)

    def layer_b(n):
        for _ in range(n):
            w = [jnp.asarray(np.asarray(x)) for x in words_np]
            eng.state, o, m, nk = eng.dio.step(
                eng.state, ctrl, g0, g1, eng.bank, w)

    a = forced(layer_a, probe, probe_cost)
    b = forced(layer_b, probe, probe_cost)

    # D: transport floor -- one tiny fresh upload + one trivial execute
    # per block, nothing else. If C ~= D the engine rides the transport.
    import jax
    tiny = np.zeros((64, 2, 3), np.uint8)
    acc0 = jnp.zeros((8,), jnp.float32)

    @jax.jit
    def triv(acc, w):
        return acc + jnp.sum(w.astype(jnp.float32)) * 1e-9

    accs = [acc0]
    def layer_d(n):
        for i in range(n):
            w = jnp.asarray(tiny + np.uint8(i % 3))
            accs[0] = triv(accs[0], w)
    triv(acc0, jnp.asarray(tiny))  # compile
    d = forced(layer_d, probe, probe_cost)

    # layer C: the bench's own path
    eng.run(max_blocks=30, setup=False, sink_output=True)
    probe2, probe_cost2 = make_probe(eng)
    t0 = time.perf_counter()
    stats = eng.run(max_blocks=530 + 30, setup=False, sink_output=True)
    probe2(7)
    c = (time.perf_counter() - t0 - probe_cost2) / 530 * 1e3

    budget = 64 / RATE * 1e3
    print(f"budget        {budget:7.3f} ms")
    print(f"A step-only   {a:7.3f} ms/block")
    print(f"B +upload     {b:7.3f} ms/block")
    print(f"D transport floor (upload+trivial exec) {d:7.3f} ms/block")
    print(f"C engine run  {c:7.3f} ms/block  (p50 {stats['p50_block_ms']:.3f})")
    eng.teardown()


if __name__ == "__main__":
    main()
