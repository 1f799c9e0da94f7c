"""Full-shape, real-coefficient parity for the shipped bench configs.

The dirac-identity runs in test_reference_configs.py exercise the engine
plumbing but a sign/indexing bug that cancels under diracs would slip
through them. These tests run bench1/2/3/5 at the EXACT shipped shapes
(`/root/reference/bench1_config`..`bench5_config`: 8192x8 and 65536x1,
26 channels, the 6-filter cascade, the crossfade-every-block script,
`bfrun.c:1745-1754`) with random real coefficients, file-to-file through
the real engine, against float64 scipy oracles.

Each run's integer output is also pinned by a committed sha256 golden
(tests/golden/fullshape_goldens.json): the bench configs set
`dither: false;` and the suite runs single-threaded XLA:CPU, so the
byte stream is run-to-run reproducible (SURVEY 4.5) and any numeric
drift -- a kernel change, an XLA upgrade reordering a reduction -- shows
up as a hash mismatch even when it stays inside the oracle tolerance.
Regenerate after an intentional numeric change with:

    BFTPU_UPDATE_GOLDENS=1 python -m pytest tests/test_fullshape_parity.py
"""

import hashlib
import json
import os
import re

import numpy as np
import pytest
import scipy.signal

from brutefir_tpu.config import parse_config
from brutefir_tpu.runtime import Engine

REF = "/root/reference"
GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden",
                           "fullshape_goldens.json")


def _load_goldens():
    if os.path.exists(GOLDEN_PATH):
        with open(GOLDEN_PATH) as fh:
            return json.load(fh)
    return {}


def check_golden(name: str, blob: bytes):
    """Assert the output byte stream matches the committed golden hash."""
    digest = hashlib.sha256(blob).hexdigest()
    goldens = _load_goldens()
    if os.environ.get("BFTPU_UPDATE_GOLDENS"):
        goldens[name] = {"sha256": digest, "bytes": len(blob)}
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        with open(GOLDEN_PATH, "w") as fh:
            json.dump(goldens, fh, indent=1, sort_keys=True)
        return
    assert name in goldens, (
        f"no committed golden for {name!r}; run with BFTPU_UPDATE_GOLDENS=1")
    assert goldens[name]["bytes"] == len(blob), (
        f"{name}: output length changed "
        f"({goldens[name]['bytes']} -> {len(blob)})")
    assert goldens[name]["sha256"] == digest, (
        f"{name}: output bytes drifted from the committed golden "
        f"(oracle may still pass -- regenerate only if the numeric "
        f"change is intentional)")


def write_s24_4le(path, rows):
    np.ascontiguousarray(rows.T.astype("<i4")).tofile(path)


def read_s24_4le(path, channels):
    a = np.fromfile(path, dtype="<i4")
    return a.reshape(-1, channels).T


def make_taps(rng, n, scale):
    return (rng.uniform(-1.0, 1.0, n) * scale).astype(np.float32)


def conv64(x, h):
    return scipy.signal.fftconvolve(
        np.asarray(x, np.float64), np.asarray(h, np.float64))[: len(x)]


def run_patched(tmp_path, name, text, x_int, channels):
    inp = tmp_path / "in.raw"
    outp = tmp_path / "out.raw"
    text = re.sub(r'device:\s*"file"\s*{\s*path:\s*"/dev/zero";\s*}',
                  f'device: "file" {{ path: "{inp}"; }}', text)
    text = re.sub(r'device:\s*"file"\s*{\s*path:\s*"/dev/null";\s*}',
                  f'device: "file" {{ path: "{outp}"; }}', text)
    text = text.replace('modules_path: ".";', '')
    text = text.replace('convolver_config: ".fftw3wisdom";', '')
    write_s24_4le(inp, x_int)
    conf = parse_config(text, name)
    eng = Engine(conf)
    eng.run()
    return outp


@pytest.fixture
def rng():
    return np.random.default_rng(0xF111)


def test_bench2_fullshape_random_taps(tmp_path, rng):
    """bench2 at the shipped 8192x8: 26 ch through one 65536-tap filter."""
    N, B, C = 8192, 8, 26
    n = N * 12
    taps = make_taps(rng, N * B, 0.003)
    x = rng.integers(-(1 << 20), 1 << 20, (C, n)).astype(np.int32)

    text = open(f"{REF}/bench2_config").read()
    tapf = tmp_path / "taps.raw"
    taps.tofile(tapf)
    text = text.replace('coeff 0 { filename: "dirac pulse"; };',
                        f'coeff 0 {{ filename: "{tapf}"; '
                        f'format: "FLOAT_LE"; }};')
    outp = run_patched(tmp_path, "bench2_full", text, x, C)

    y = read_s24_4le(outp, C)
    assert y.shape == (C, n)
    for c in range(C):
        ref = conv64(x[c], taps) * (1.0)
        tol = 8e-6 * np.abs(ref).max() + 4.0
        np.testing.assert_allclose(y[c], ref, rtol=0, atol=tol)
    check_golden("bench2_8192x8_random", open(outp, "rb").read())


def test_bench3_fullshape_random_taps(tmp_path, rng):
    """bench3 at the shipped 65536x1: plain (unpartitioned) overlap-save."""
    N, C = 65536, 26
    n = N * 3
    taps = make_taps(rng, N, 0.003)
    x = rng.integers(-(1 << 20), 1 << 20, (C, n)).astype(np.int32)

    text = open(f"{REF}/bench3_config").read()
    tapf = tmp_path / "taps.raw"
    taps.tofile(tapf)
    text = text.replace('coeff 0 { filename: "dirac pulse"; };',
                        f'coeff 0 {{ filename: "{tapf}"; '
                        f'format: "FLOAT_LE"; }};')
    outp = run_patched(tmp_path, "bench3_full", text, x, C)

    y = read_s24_4le(outp, C)
    assert y.shape == (C, n)
    for c in range(C):
        ref = conv64(x[c], taps)
        tol = 8e-6 * np.abs(ref).max() + 4.0
        np.testing.assert_allclose(y[c], ref, rtol=0, atol=tol)
    check_golden("bench3_65536x1_random", open(outp, "rb").read())


def test_bench1_fullshape_cascade_random_taps(tmp_path, rng):
    """bench1 at the shipped 8192x8: the 6-filter cascade with six
    DISTINCT random 65536-tap coefficient sets (convolve_eval path,
    fftw_convolver.c:411-433)."""
    N, B = 8192, 8
    n = N * 20
    taps = [make_taps(rng, N * B, 0.003) for _ in range(6)]
    x = rng.integers(-(1 << 20), 1 << 20, (2, n)).astype(np.int32)

    text = open(f"{REF}/bench1_config").read()
    for i in range(6):
        tapf = tmp_path / f"taps{i}.raw"
        taps[i].tofile(tapf)
        text = text.replace(
            f'coeff {i} {{ filename: "dirac pulse"; }};',
            f'coeff {i} {{ filename: "{tapf}"; format: "FLOAT_LE"; }};')
    outp = run_patched(tmp_path, "bench1_full", text, x, 2)

    y = read_s24_4le(outp, 2)
    assert y.shape == (2, n)
    # graph: f2: in0 -> f0; f5: in1 -> f0; f0 -> out0 (coeff 0)
    #        f3: in0 -> f1; f4: in1 -> f1; f1 -> out1 (coeff 1)
    x0 = x[0].astype(np.float64)
    x1 = x[1].astype(np.float64)
    e0 = conv64(conv64(x0, taps[2]) + conv64(x1, taps[5]), taps[0])
    e1 = conv64(conv64(x0, taps[3]) + conv64(x1, taps[4]), taps[1])
    for c, ref in ((0, e0), (1, e1)):
        tol = 2e-5 * np.abs(ref).max() + 4.0
        np.testing.assert_allclose(y[c], ref, rtol=0, atol=tol)
    check_golden("bench1_8192x8_cascade_random", open(outp, "rb").read())


def test_bench5_fullshape_crossfade_random_taps(tmp_path, rng):
    """bench5 at the shipped 8192x8 with TWO DISTINCT random coefficient
    sets flipped by the CLI script every block, against an explicit
    time-domain linear-ramp oracle (convolver_crossfade_inplace,
    fftw_convolver.c:330-368; script pacing bflogic_cli.c:872-986)."""
    N, B, C = 8192, 8, 26
    n = N * 12
    taps_a = make_taps(rng, N * B, 0.003)
    taps_b = make_taps(rng, N * B, 0.003)
    x = rng.integers(-(1 << 20), 1 << 20, (C, n)).astype(np.int32)

    text = open(f"{REF}/bench5_config").read()
    fa, fb = tmp_path / "a.raw", tmp_path / "b.raw"
    taps_a.tofile(fa)
    taps_b.tofile(fb)
    text = text.replace(
        'coeff 0 { filename: "dirac pulse"; };',
        f'coeff 0 {{ filename: "{fa}"; format: "FLOAT_LE"; }};\n'
        f'coeff 1 {{ filename: "{fb}"; format: "FLOAT_LE"; }};')
    # the shipped script flips coeff<->dirac(-1); flip between the two
    # real sets instead
    text = text.replace(" -1;", " 1;")
    outp = run_patched(tmp_path, "bench5_full", text, x, C)

    y = read_s24_4le(outp, C)
    assert y.shape == (C, n)
    n_blocks = n // N
    ramp = np.arange(N, dtype=np.float64) / (N - 1)
    for c in range(0, C, 5):   # 6 of 26 channels: full oracle cost control
        ya = conv64(x[c], taps_a)
        yb = conv64(x[c], taps_b)
        expect = np.empty(n, np.float64)
        # script line k executes at block_start of block k (one line per
        # block, wrapping): block 0 sets coeff 0 (already 0: no change),
        # odd blocks crossfade a->b, even blocks >0 crossfade b->a
        for k in range(n_blocks):
            seg = slice(k * N, (k + 1) * N)
            if k == 0:
                expect[seg] = ya[seg]
            elif k % 2 == 1:
                expect[seg] = ya[seg] * (1 - ramp) + yb[seg] * ramp
            else:
                expect[seg] = yb[seg] * (1 - ramp) + ya[seg] * ramp
        tol = 8e-6 * max(np.abs(ya).max(), np.abs(yb).max()) + 4.0
        np.testing.assert_allclose(y[c], expect, rtol=0, atol=tol)
    check_golden("bench5_8192x8_crossfade_random", open(outp, "rb").read())
