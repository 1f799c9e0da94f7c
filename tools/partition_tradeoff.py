#!/usr/bin/env python
"""Partitioning tradeoff at constant total taps (BASELINE.md row 8).

The reference measured 16x8192 partitions ~2x faster than one 131072-tap
partition (brutefir.html:759-771) -- FFTW's long-FFT penalty motivated
partitioned convolution beyond latency. This sweeps the composed device
step over N x B shapes at constant N*B = 131072 taps (26 channels,
uniform coeffs -- the flagship workload family) to record the same curve
on TPU, where the tradeoff differs: the MAC's HBM traffic grows with B
(ring slots) while XLA's FFT cost grows sub-linearly with N.

Usage (TPU host): python tools/partition_tradeoff.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHAPES = ((131072, 1), (65536, 2), (32768, 4), (16384, 8),
          (8192, 16), (4096, 32))
C = int(os.environ.get("BENCH_C", "26"))


def main():
    import subprocess
    here = os.path.dirname(os.path.abspath(__file__))
    for n, b in SHAPES:
        env = {**os.environ, "BENCH_C": str(C), "BENCH_N": str(n),
               "BENCH_B": str(b), "BENCH_M": "40"}
        r = subprocess.run(
            [sys.executable, os.path.join(here, "mac_step_compare.py"),
             "uniform", "pallas"],
            env=env, capture_output=True, text=True, timeout=600)
        line = (r.stdout.strip().splitlines() or ["<no output>"])[-1]
        budget_ms = n / 44100 * 1e3
        import re
        m = re.search(r"device step ([0-9.]+) ms/block", line)
        xrt = f"  ({budget_ms / float(m.group(1)):8.1f}x rt)" if m else ""
        print(f"{n:6d} x {b:2d}: {line}{xrt}", flush=True)


if __name__ == "__main__":
    main()
