"""Run-to-run reproducibility and long-run state stability."""

import numpy as np
import scipy.signal

from brutefir_tpu.config import parse_config
from brutefir_tpu.runtime import Engine


def _conf(tmp_path, tag, N, B, tap_file, dither="true"):
    return f"""
sampling_rate: 44100;
filter_length: {N},{B};
coeff 0 {{ filename: "{tap_file}"; format: "TEXT"; }};
input 0 {{ device: "file" {{ path: "{tmp_path}/in_{tag}.s16"; }}; sample: "S16_LE"; channels: 1; }};
output 0 {{ device: "file" {{ path: "{tmp_path}/out_{tag}.s16"; }}; sample: "S16_LE"; channels: 1; dither: {dither}; }};
filter 0 {{ from_inputs: 0; to_outputs: 0; coeff: 0; }};
"""


def test_dithered_output_is_reproducible(tmp_path, rng):
    """Two identical runs produce byte-identical dithered integer output
    (fixed Tausworthe seed, like the reference's de-facto regression
    method, SURVEY 4.5)."""
    N, B = 128, 2
    taps = (rng.standard_normal(N) * 0.2).astype(np.float32)
    tap_file = tmp_path / "t.txt"
    tap_file.write_text("\n".join(repr(float(v)) for v in taps))
    x = (rng.standard_normal(N * 6) * 8000).astype(np.int16)
    outs = []
    for tag in ("a", "b"):
        x.astype("<i2").tofile(tmp_path / f"in_{tag}.s16")
        conf = parse_config(_conf(tmp_path, tag, N, B, tap_file))
        Engine(conf).run()
        outs.append((tmp_path / f"out_{tag}.s16").read_bytes())
    assert outs[0] == outs[1]


def test_long_run_ring_wraparound(tmp_path, rng):
    """400 blocks (50 ring wraps) stay correct -- no state drift."""
    N, B = 64, 8
    taps = (rng.standard_normal(N * B) * 0.1).astype(np.float32)
    tap_file = tmp_path / "t.txt"
    tap_file.write_text("\n".join(repr(float(v)) for v in taps))
    x = rng.standard_normal(N * 400).astype(np.float32)
    inp, outp = tmp_path / "in.f32", tmp_path / "out.f32"
    x.astype("<f4").tofile(inp)
    conf = parse_config(f"""
sampling_rate: 44100;
filter_length: {N},{B};
coeff 0 {{ filename: "{tap_file}"; format: "TEXT"; }};
input 0 {{ device: "file" {{ path: "{inp}"; }}; sample: "FLOAT_LE"; channels: 1; }};
output 0 {{ device: "file" {{ path: "{outp}"; }}; sample: "FLOAT_LE"; channels: 1; }};
filter 0 {{ from_inputs: 0; to_outputs: 0; coeff: 0; }};
""")
    Engine(conf).run()
    y = np.fromfile(outp, dtype="<f4")
    ref = scipy.signal.fftconvolve(x, taps)[: len(x)]
    # check several windows spread across the run, including late ones
    for start in (0, 100 * N, 250 * N, 399 * N):
        seg = slice(start, start + N)
        np.testing.assert_allclose(y[seg], ref[seg], rtol=0, atol=2e-3)


def test_debug_mode_smoke(tmp_path, rng, capsys):
    N = 64
    x = rng.standard_normal(N * 12).astype(np.float32)
    inp, outp = tmp_path / "in.f32", tmp_path / "out.f32"
    x.astype("<f4").tofile(inp)
    conf = parse_config(f"""
sampling_rate: 44100;
filter_length: {N};
debug: true;
coeff 0 {{ filename: "dirac pulse"; }};
input 0 {{ device: "file" {{ path: "{inp}"; }}; sample: "FLOAT_LE"; channels: 1; }};
output 0 {{ device: "file" {{ path: "{outp}"; }}; sample: "FLOAT_LE"; channels: 1; }};
filter 0 {{ from_inputs: 0; to_outputs: 0; coeff: 0; }};
""")
    Engine(conf).run()
    err = capsys.readouterr().err
    assert "debug timeline" in err
    assert "decode/ms" in err  # stage table under debug
