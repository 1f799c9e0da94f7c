"""Powersave dispatch skip (VERDICT r3 item 4, bfrun.c:722-772,1719-1722).

Once the device ring history has drained past the procblocks-analog margin,
a further silent input block skips the device dispatch entirely (no upload,
no execute, no download) and the host synthesizes the zero output block.
The byte stream must be identical to the always-dispatch run: write_block's
host-side encode (delays, meters, dither) keeps advancing across skips, and
resuming after a skipped stretch restores the overlap-save tail (prev_in)
to what always-dispatch would hold.
"""

import numpy as np
import pytest

from brutefir_tpu.config import parse_config
from brutefir_tpu.runtime import Engine


def _run(tmp_path, x, body, tag, monkeypatch, skip_on, extra="",
         out_fmt="FLOAT_LE", out_extra=""):
    N, B = 128, 2
    inp = tmp_path / f"in_{tag}.f32"
    outp = tmp_path / f"out_{tag}.raw"
    x.astype("<f4").tofile(inp)
    monkeypatch.setenv("BRUTEFIR_TPU_PS_SKIP", "1" if skip_on else "0")
    conf = parse_config(f"""
sampling_rate: 44100;
filter_length: {N},{B};
{extra}
input 0 {{ device: "file" {{ path: "{inp}"; }}; sample: "FLOAT_LE"; channels: 1; }};
output 0 {{ device: "file" {{ path: "{outp}"; }}; sample: "{out_fmt}"; channels: 1; {out_extra} }};
{body}
""")
    conf.quiet = True
    eng = Engine(conf)
    stats = eng.run()
    return outp.read_bytes(), stats


def _signal(rng, N=128, silent_blocks=16, noise=0.0):
    """loud -> long silent stretch (exact zero or sub-threshold noise)
    -> loud again, so the skip path AND the resume restore both fire."""
    loud1 = (rng.standard_normal(3 * N) * 0.5).astype(np.float32)
    quiet = (rng.standard_normal(silent_blocks * N) * noise
             ).astype(np.float32)
    loud2 = (rng.standard_normal(4 * N) * 0.5).astype(np.float32)
    return np.concatenate([loud1, quiet, loud2])


def _coeff_body(tmp_path, rng, N=128, B=2):
    taps = (rng.standard_normal(N * B) * 0.1).astype(np.float32)
    tf = tmp_path / "t.txt"
    tf.write_text("\n".join(repr(float(v)) for v in taps))
    return f"""
coeff 0 {{ filename: "{tf}"; format: "TEXT"; }};
filter 0 {{ from_inputs: 0; to_outputs: 0; coeff: 0; }};
"""


def test_digital_skip_bit_identical_dio(tmp_path, rng, monkeypatch):
    """powersave: true; exact-zero stretch on the device-IO path
    (FLOAT_LE file IO is dio-eligible): blocks are skipped -- no upload,
    no execute, no download -- and the output bytes match the
    always-dispatch run exactly."""
    body = _coeff_body(tmp_path, rng)
    x = _signal(rng, noise=0.0)
    y1, s1 = _run(tmp_path, x, body, "skip", monkeypatch, True,
                  extra="powersave: true;")
    y0, s0 = _run(tmp_path, x, body, "ref", monkeypatch, False,
                  extra="powersave: true;")
    assert s0["ps_skipped"] == 0
    assert s1["ps_skipped"] >= 8       # 16 silent blocks - drain margin
    assert y1 == y0


def test_digital_skip_bit_identical_dio_s16(tmp_path, rng, monkeypatch):
    """Same on a quantized (S16_LE, no dither) dio output: the synthesized
    zero words must match the device quantizer's zero exactly."""
    body = _coeff_body(tmp_path, rng)
    x = _signal(rng, noise=0.0)
    kw = dict(extra="powersave: true;", out_fmt="S16_LE")
    y1, s1 = _run(tmp_path, x, body, "qskip", monkeypatch, True, **kw)
    y0, s0 = _run(tmp_path, x, body, "qref", monkeypatch, False, **kw)
    assert s1["ps_skipped"] >= 8 and s0["ps_skipped"] == 0
    assert y1 == y0


def test_dio_dither_disables_skip(tmp_path, rng, monkeypatch):
    """Output dither keeps per-block stream state on the device (dstate
    ptr/last/sf) with no silent fixed point: a dithered dio output never
    skips dispatch."""
    body = _coeff_body(tmp_path, rng)
    x = _signal(rng, noise=0.0)
    y1, s1 = _run(tmp_path, x, body, "ddio", monkeypatch, True,
                  extra="powersave: true;", out_fmt="S16_LE",
                  out_extra="dither: true;")
    assert s1["ps_skipped"] == 0


def test_host_skip_with_dither_bit_identical(tmp_path, rng, monkeypatch):
    """Host path (S16_BE is dio-ineligible on a little-endian host):
    write_block's dither state must keep advancing across skipped blocks
    -- the seeded Tausworthe stream position depends on every block."""
    body = _coeff_body(tmp_path, rng)
    x = _signal(rng, noise=0.0)
    kw = dict(extra="powersave: true;", out_fmt="S16_BE",
              out_extra="dither: true;")
    y1, s1 = _run(tmp_path, x, body, "dskip", monkeypatch, True, **kw)
    y0, s0 = _run(tmp_path, x, body, "dref", monkeypatch, False, **kw)
    assert s1["ps_skipped"] >= 8 and s0["ps_skipped"] == 0
    assert y1 == y0


def test_analog_skip_restores_overlap_tail(tmp_path, rng, monkeypatch):
    """powersave: -40 with sub-threshold noise (~-80 dB) in the quiet
    stretch, host path (FLOAT_BE output is dio-ineligible):
    always-dispatch stores the pre-gate noise in prev_in, so the resume
    path must restore the last skipped block's samples for exact parity
    across the silent->loud boundary."""
    body = _coeff_body(tmp_path, rng)
    x = _signal(rng, noise=1e-4)
    kw = dict(extra="powersave: -40;", out_fmt="FLOAT_BE")
    y1, s1 = _run(tmp_path, x, body, "askip", monkeypatch, True, **kw)
    y0, s0 = _run(tmp_path, x, body, "aref", monkeypatch, False, **kw)
    assert s1["ps_skipped"] >= 8 and s0["ps_skipped"] == 0
    assert y1 == y0


def test_dio_skip_with_runtime_delay(tmp_path, rng, monkeypatch):
    """Configured integer delays grow the drain margin (the device delay
    windows must flush) but skipping still engages and stays
    bit-identical."""
    body = _coeff_body(tmp_path, rng)
    x = _signal(rng, silent_blocks=24, noise=0.0)
    kw = dict(extra="powersave: true;",
              out_extra="delay: 37;")
    y1, s1 = _run(tmp_path, x, body, "dly", monkeypatch, True, **kw)
    y0, s0 = _run(tmp_path, x, body, "dlyref", monkeypatch, False, **kw)
    assert s1["ps_skipped"] >= 8 and s0["ps_skipped"] == 0
    assert y1 == y0


def test_skip_near_zero_dispatches(tmp_path, rng, monkeypatch):
    """A silent stretch shorter than the drain margin never skips: the
    ring history may still hold live audio."""
    body = _coeff_body(tmp_path, rng)
    N = 128
    loud = (rng.standard_normal(3 * N) * 0.5).astype(np.float32)
    quiet = np.zeros(3 * N, np.float32)     # 3 < drain (B+stages+2 = 5)
    x = np.concatenate([loud, quiet, loud])
    y1, s1 = _run(tmp_path, x, body, "short", monkeypatch, True,
                  extra="powersave: true;")
    assert s1["ps_skipped"] == 0


def test_no_powersave_never_skips(tmp_path, rng, monkeypatch):
    body = _coeff_body(tmp_path, rng)
    x = _signal(rng, noise=0.0)
    y1, s1 = _run(tmp_path, x, body, "nops", monkeypatch, True)
    assert s1["ps_skipped"] == 0
