"""Subsample delay, runtime delay/mute changes, file-module modes, guards."""

import numpy as np
import pytest
import scipy.signal

from brutefir_tpu.config import parse_config
from brutefir_tpu.core.firwindow import sample_sinc
from brutefir_tpu.runtime import Engine, EngineError
from brutefir_tpu.runtime.engine import IN, OUT


def run_simple(tmp_path, rng, body, x=None, N=128, B=2, n_blocks=6,
               in_extra="", out_extra="", extra=""):
    if x is None:
        x = rng.standard_normal(N * n_blocks).astype(np.float32) * 0.5
    inp, outp = tmp_path / "in.f32", tmp_path / "out.f32"
    x.astype("<f4").tofile(inp)
    conf = parse_config(f"""
sampling_rate: 44100;
filter_length: {N},{B};
{extra}
coeff 0 {{ filename: "dirac pulse"; }};
input 0 {{ device: "file" {{ path: "{inp}"; }}; sample: "FLOAT_LE"; channels: 1; {in_extra} }};
output 0 {{ device: "file" {{ path: "{outp}"; }}; sample: "FLOAT_LE"; channels: 1; {out_extra} }};
{body}
""")
    eng = Engine(conf)
    return eng, x, outp


def test_subsample_delay_matches_sinc_oracle(tmp_path, rng):
    """subdelay: n applies the reference's windowed-sinc fractional delay."""
    N = 128
    sd = 37  # 37/100 of a sample
    eng, x, outp = run_simple(
        tmp_path, rng,
        "filter 0 { from_inputs: 0; to_outputs: 0; coeff: 0; };",
        N=N, B=1, extra="sdf_length: 15;", in_extra=f"subdelay: {sd};")
    eng.run()
    y = np.fromfile(outp, dtype="<f4")
    # oracle: 31-tap windowed sinc (beta 9, reference quirk) with offset
    # sd/100, latency sdf_length samples
    taps = sample_sinc(15, sd / 100.0, 9.0, np.float32)
    ref = scipy.signal.fftconvolve(x.astype(np.float64), taps)[: len(x)]
    np.testing.assert_allclose(y, ref, rtol=0, atol=3e-4)


def test_subdelay_undefined_gets_compensating_delay(tmp_path, rng):
    """On a side with subdelay active, channels left undefined get the
    compensating sdf_length integer delay (bfrun.c:1512-1516)."""
    N = 128
    n = N * 6
    x = rng.standard_normal((2, n)).astype(np.float32) * 0.5
    inp, outp = tmp_path / "in2.f32", tmp_path / "out2.f32"
    np.ascontiguousarray(x.T.astype("<f4")).tofile(inp)
    conf = parse_config(f"""
sampling_rate: 44100;
filter_length: {N};
sdf_length: 16;
coeff 0 {{ filename: "dirac pulse"; }};
input 0,1 {{ device: "file" {{ path: "{inp}"; }}; sample: "FLOAT_LE"; channels: 2;
          subdelay: 0, -100; }};
output 0,1 {{ device: "file" {{ path: "{outp}"; }}; sample: "FLOAT_LE"; channels: 2; }};
filter 0 {{ from_inputs: 0; to_outputs: 0; coeff: 0; }};
filter 1 {{ from_inputs: 1; to_outputs: 1; coeff: 0; }};
""")
    Engine(conf).run()
    y = np.fromfile(outp, dtype="<f4").reshape(-1, 2).T
    # both channels end up delayed by exactly sdf_length samples: channel 0
    # through the delta subdelay filter, channel 1 through the integer delay
    expect0 = np.concatenate([np.zeros(16, np.float32), x[0][:-16]])
    expect1 = np.concatenate([np.zeros(16, np.float32), x[1][:-16]])
    np.testing.assert_allclose(y[0], expect0, rtol=0, atol=1e-4)
    np.testing.assert_allclose(y[1], expect1, rtol=0, atol=1e-4)


def test_runtime_delay_change_lands_on_block_boundary(tmp_path, rng):
    N = 128
    eng, x, outp = run_simple(
        tmp_path, rng,
        "filter 0 { from_inputs: 0; to_outputs: 0; coeff: 0; };",
        N=N, n_blocks=6, out_extra="maxdelay: 64;")
    blocks_seen = []

    class Hook:
        def block_start(self, k):
            blocks_seen.append(k)
            if k == 3:
                assert eng.control.set_delay(OUT, 0, 10)

    eng.setup()
    eng.attach_logic()
    eng.logic.append(Hook())
    eng.run(setup=False)
    eng.teardown()
    y = np.fromfile(outp, dtype="<f4")
    # blocks 0..2 pass through; from block 3 the output is delayed 10
    np.testing.assert_allclose(y[: 3 * N], x[: 3 * N], atol=1e-4)
    np.testing.assert_allclose(y[3 * N + 10: 6 * N], x[3 * N: 6 * N - 10],
                               atol=1e-4)
    np.testing.assert_allclose(y[3 * N: 3 * N + 10], 0.0, atol=1e-4)


def test_runtime_mute_toggle(tmp_path, rng):
    N = 128
    eng, x, outp = run_simple(
        tmp_path, rng,
        "filter 0 { from_inputs: 0; to_outputs: 0; coeff: 0; };",
        N=N, n_blocks=4)

    class Hook:
        def block_start(self, k):
            if k == 2:
                eng.control.set_mute(OUT, 0, True)

    eng.setup()
    eng.attach_logic()
    eng.logic.append(Hook())
    eng.run(setup=False)
    eng.teardown()
    y = np.fromfile(outp, dtype="<f4")
    np.testing.assert_allclose(y[: 2 * N], x[: 2 * N], atol=1e-4)
    np.testing.assert_allclose(y[2 * N:], 0.0, atol=0)


def test_safety_limit_aborts(tmp_path, rng):
    N = 128
    x = np.full(N * 2, 1000.0, np.float32)
    eng, _, _ = run_simple(
        tmp_path, rng,
        "filter 0 { from_inputs: 0; to_outputs: 0; coeff: 0; };",
        x=x, N=N, extra="safety_limit: 20;")
    with pytest.raises(EngineError, match="safety limit"):
        eng.run()


def test_nan_input_aborts(tmp_path, rng):
    N = 128
    x = rng.standard_normal(N * 2).astype(np.float32)
    x[5] = np.nan
    eng, _, _ = run_simple(
        tmp_path, rng,
        "filter 0 { from_inputs: 0; to_outputs: 0; coeff: 0; };",
        x=x, N=N)
    with pytest.raises(EngineError, match="NaN or Inf"):
        eng.run()


def test_file_loop_mode(tmp_path, rng):
    """loop: true seeks back to the skip offset at EOF (bfio_file.c:429-450)."""
    N = 64
    seg = rng.standard_normal(N).astype(np.float32)
    inp, outp = tmp_path / "in.f32", tmp_path / "out.f32"
    seg.astype("<f4").tofile(inp)
    conf = parse_config(f"""
sampling_rate: 44100;
filter_length: {N};
coeff 0 {{ filename: "dirac pulse"; }};
input 0 {{ device: "file" {{ path: "{inp}"; loop: true; }}; sample: "FLOAT_LE"; channels: 1; }};
output 0 {{ device: "file" {{ path: "{outp}"; }}; sample: "FLOAT_LE"; channels: 1; }};
filter 0 {{ from_inputs: 0; to_outputs: 0; coeff: 0; }};
""")
    eng = Engine(conf)
    eng.run(max_blocks=5)
    y = np.fromfile(outp, dtype="<f4")
    assert len(y) == 5 * N
    for b in range(5):
        np.testing.assert_allclose(y[b * N: (b + 1) * N], seg, atol=1e-4)


def test_file_skip_and_append(tmp_path, rng):
    N = 64
    junk = np.arange(10, dtype="<f4")
    x = rng.standard_normal(N).astype(np.float32)
    inp, outp = tmp_path / "in.f32", tmp_path / "out.f32"
    with open(inp, "wb") as fh:
        fh.write(junk.tobytes())
        fh.write(x.astype("<f4").tobytes())
    outp.write_bytes(np.float32([7.0]).tobytes())
    conf = parse_config(f"""
sampling_rate: 44100;
filter_length: {N};
coeff 0 {{ filename: "dirac pulse"; }};
input 0 {{ device: "file" {{ path: "{inp}"; skip: 40; }}; sample: "FLOAT_LE"; channels: 1; }};
output 0 {{ device: "file" {{ path: "{outp}"; append: true; }}; sample: "FLOAT_LE"; channels: 1; }};
filter 0 {{ from_inputs: 0; to_outputs: 0; coeff: 0; }};
""")
    Engine(conf).run()
    y = np.fromfile(outp, dtype="<f4")
    assert y[0] == 7.0  # appended after preexisting content
    np.testing.assert_allclose(y[1:], x, atol=1e-4)


def test_analog_powersave_gates_quiet_channels(tmp_path, rng):
    """powersave: -40 (dB) zeroes blocks whose peak is below the threshold
    (test_silent, bfrun.c:722-772: scale * max|x| < analog)."""
    N = 128
    loud = rng.standard_normal(N).astype(np.float32) * 0.5
    quiet = rng.standard_normal(N).astype(np.float32) * 1e-4  # ~ -80 dB
    x = np.concatenate([loud, quiet, quiet, loud])
    eng, _, outp = run_simple(
        tmp_path, rng,
        "filter 0 { from_inputs: 0; to_outputs: 0; coeff: 0; };",
        x=x, N=N, B=1, extra="powersave: -40;")
    eng.run()
    y = np.fromfile(outp, dtype="<f4")
    np.testing.assert_allclose(y[:N], loud, atol=1e-4)
    # block 1's frame is [loud, quiet] -> not silent -> passes through
    np.testing.assert_allclose(y[N: 2 * N], quiet, atol=1e-5)
    # block 2's frame is [quiet, quiet] -> gated to exactly zero
    np.testing.assert_allclose(y[2 * N: 3 * N], 0.0, atol=0)
    np.testing.assert_allclose(y[3 * N:], loud, atol=1e-4)


def test_iodelay_fill_clocked_output(tmp_path, rng):
    """Clocked output devices receive 2 fragments of silence before the
    first computed block (iodelay_fill, dai.c:1451-1457, bfrun.c:870-899):
    output = 2N zeros then the signal."""
    from brutefir_tpu.io import IoDevice, register_io_module

    collected = []

    class ClockedOut(IoDevice):
        uses_sample_clock = True

        def __init__(self, params, io, sample_format, sample_rate,
                     open_channels):
            from brutefir_tpu.core.sampleformat import parse_sample_format
            super().__init__(params, io, parse_sample_format("FLOAT_NE"),
                             sample_rate, open_channels)

        def write(self, data):
            collected.append(bytes(data))
            return len(data)

    register_io_module("clockedout", ClockedOut)
    N = 64
    x = rng.standard_normal(N * 4).astype(np.float32) * 0.5
    inp = tmp_path / "in.f32"
    x.astype("<f4").tofile(inp)
    conf = parse_config(f"""
sampling_rate: 44100;
filter_length: {N};
coeff 0 {{ filename: "dirac pulse"; }};
input 0 {{ device: "file" {{ path: "{inp}"; }}; sample: "FLOAT_LE"; channels: 1; }};
output 0 {{ device: "clockedout" {{ }}; sample: "FLOAT_NE"; channels: 1; }};
filter 0 {{ from_inputs: 0; to_outputs: 0; coeff: 0; }};
""")
    Engine(conf).run()
    y = np.frombuffer(b"".join(collected), dtype=np.float32)
    assert len(y) == 2 * N + 4 * N  # latency cushion + the signal
    np.testing.assert_array_equal(y[: 2 * N], 0.0)
    np.testing.assert_allclose(y[2 * N:], x, atol=1e-5)
