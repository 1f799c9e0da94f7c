"""Device-resident integer delay lines (device_io) vs the host path."""

import numpy as np

from brutefir_tpu.config import parse_config
from brutefir_tpu.runtime import Engine


def _cfg(tmp_path, inp, outp, extra_in="", extra_out="", logic=""):
    return parse_config(f"""
sampling_rate: 44100;
filter_length: 128,2;
{logic}
coeff 0 {{ filename: "dirac pulse"; }};
input 0,1 {{ device: "file" {{ path: "{inp}"; }}; sample: "S32_LE";
             channels: 2; {extra_in} }};
output 0,1 {{ device: "file" {{ path: "{outp}"; }}; sample: "S32_LE";
              channels: 2; dither: false; {extra_out} }};
filter 0 {{ from_inputs: 0; to_outputs: 0; coeff: 0; }};
filter 1 {{ from_inputs: 1; to_outputs: 1; coeff: 0; }};
""")


def test_static_delays_dio_matches_host(tmp_path):
    """Fixed input+output delays keep device-IO eligibility and match the
    host DelayLine path exactly (S32 dirac: bit-exact)."""
    rng = np.random.default_rng(2)
    x = np.clip((rng.standard_normal((128 * 6, 2)) * 2 ** 20).round(),
                -(2 ** 23), 2 ** 23 - 1).astype("<i4")
    inp = tmp_path / "in.raw"
    x.tofile(inp)
    outs = {}
    for mode in ("dio", "host"):
        outp = tmp_path / f"o_{mode}.raw"
        conf = _cfg(tmp_path, inp, outp,
                    extra_in="delay: 7, 0;", extra_out="delay: 0, 190;")
        eng = Engine(conf)
        if mode == "dio":
            assert eng.dio is not None, "delays must not disqualify dio"
            assert eng.dio._dly[0] is not None
            assert eng.dio._dly[1] is not None
        else:
            eng.dio = None
        eng.run()
        outs[mode] = np.fromfile(outp, dtype="<i4").reshape(-1, 2)
    np.testing.assert_array_equal(outs["dio"], outs["host"])
    # and against first principles: ch0 delayed 7, ch1 delayed 190
    # (+-1 LSB: the f32 scale round trip of S32 samples)
    y = outs["dio"].astype(np.int64)
    assert np.abs(y[7:, 0] - x[: len(y) - 7, 0]).max() <= 1
    np.testing.assert_array_equal(y[:7, 0], 0)
    assert np.abs(y[190:, 1] - x[: len(y) - 190, 1]).max() <= 1


def test_runtime_delay_change_dio_matches_host(tmp_path):
    """A mid-run `cid` delay change (maxdelay headroom) behaves like the
    host DelayLine: silence is spliced on increase, oldest samples are
    dropped on decrease."""
    rng = np.random.default_rng(3)
    n_fr = 128 * 8
    x = np.clip((rng.standard_normal((n_fr, 2)) * 2 ** 20).round(),
                -(2 ** 23), 2 ** 23 - 1).astype("<i4")
    inp = tmp_path / "in.raw"
    x.tofile(inp)
    # block-deterministic script: raise ch0 input delay to 40 after
    # block 2, drop it to 5 after block 5
    script = "sleep b2; cid 0 40; sleep b5; cid 0 5; sleep b99; quit"
    outs = {}
    for mode in ("dio", "host"):
        outp = tmp_path / f"o_{mode}.raw"
        conf = _cfg(tmp_path, inp, outp,
                    extra_in="delay: 10, 0; maxdelay: 100;",
                    logic=f'logic: "cli" {{ script: "{script}"; }};')
        eng = Engine(conf)
        if mode == "dio":
            assert eng.dio is not None
        else:
            eng.dio = None
        eng.run()
        outs[mode] = np.fromfile(outp, dtype="<i4").reshape(-1, 2)
    assert outs["dio"].shape == outs["host"].shape
    np.testing.assert_array_equal(outs["dio"], outs["host"])
    # sanity: the change actually happened (output is not a pure
    # 10-sample delay throughout)
    y = outs["dio"]
    assert not np.array_equal(y[10:, 0], x[: len(y) - 10, 0])


def test_subdelay_dio_matches_host(tmp_path):
    """Fractional (subsample) delays now keep device-IO eligibility: the
    batched overlap-save filter matches the host path (same spectral
    bank; FFT rounding tolerance), including an initially-undefined
    channel (compensating +sdf_length latency) and a runtime change."""
    rng = np.random.default_rng(4)
    n_fr = 128 * 8
    x = np.clip((rng.standard_normal((n_fr, 2)) * 2 ** 20).round(),
                -(2 ** 23), 2 ** 23 - 1).astype("<i4")
    inp = tmp_path / "in.raw"
    x.tofile(inp)
    script = "sleep b3; cid 0 0/2; sleep b99; quit"
    outs = {}
    for mode in ("dio", "host"):
        outp = tmp_path / f"o_{mode}.raw"
        conf = parse_config(f"""
sampling_rate: 44100;
filter_length: 128,2;
sdf_length: 15;
logic: "cli" {{ script: "{script}"; }};
coeff 0 {{ filename: "dirac pulse"; }};
input 0,1 {{ device: "file" {{ path: "{inp}"; }}; sample: "S32_LE";
             channels: 2; subdelay: -3, -101; }};
output 0,1 {{ device: "file" {{ path: "{outp}"; }}; sample: "S32_LE";
              channels: 2; dither: false; }};
filter 0 {{ from_inputs: 0; to_outputs: 0; coeff: 0; }};
filter 1 {{ from_inputs: 1; to_outputs: 1; coeff: 0; }};
""")
        eng = Engine(conf)
        if mode == "dio":
            assert eng.dio is not None, "subdelay must not disqualify dio"
            assert eng.dio._sd[0] is not None
        else:
            eng.dio = None
        eng.run()
        outs[mode] = np.fromfile(outp, dtype="<i4").reshape(-1, 2)
    assert outs["dio"].shape == outs["host"].shape
    diff = outs["dio"].astype(np.int64) - outs["host"].astype(np.int64)
    # FFT round-trip + f32 scale differences only
    assert np.abs(diff).max() <= 2
    # undefined channel 1: the sd=0 filter row equals the host's
    # compensating integer delay of sdf_length samples
    y = outs["dio"].astype(np.int64)
    half = 15
    assert np.abs(y[half:, 1] - x[: len(y) - half, 1]).max() <= 2


def test_kitchensink_dio_matches_host_and_offline(tmp_path):
    """Dither + integer delays + subsample delays together: the device-IO
    per-block path, the device-IO batched offline path (multi_step scan
    carrying all three states), and the host codec path agree."""
    rng = np.random.default_rng(12)
    n_fr = 128 * 8
    x = np.clip((rng.standard_normal((n_fr, 2)) * 4000).round(),
                -32768, 32767).astype("<i2")
    inp = tmp_path / "in.raw"
    x.tofile(inp)

    def build(outp):
        return parse_config(f"""
sampling_rate: 44100;
filter_length: 128,2;
sdf_length: 15;
coeff 0 {{ filename: "dirac pulse"; }};
input 0,1 {{ device: "file" {{ path: "{inp}"; }}; sample: "S16_LE";
             channels: 2; delay: 5, 0; subdelay: 2, -101; }};
output 0,1 {{ device: "file" {{ path: "{outp}"; }}; sample: "S16_LE";
              channels: 2; dither: true; delay: 0, 9; }};
filter 0 {{ from_inputs: 0; to_outputs: 0; coeff: 0; }};
filter 1 {{ from_inputs: 1; to_outputs: 1; coeff: 0; }};
""")

    outs = {}
    for mode in ("dio", "host", "offline"):
        outp = tmp_path / f"o_{mode}.raw"
        conf = build(outp)
        eng = Engine(conf)
        if mode == "host":
            eng.dio = None
        else:
            assert eng.dio is not None
            assert eng.dio.dstate and eng.dio._sd[0] is not None
        if mode == "offline":
            eng.run_offline(batch_blocks=3)
        else:
            eng.run()
        outs[mode] = np.fromfile(outp, dtype="<i2").reshape(-1, 2)

    assert outs["dio"].shape == outs["host"].shape == outs["offline"].shape
    # dio per-block and dio offline share the exact same device program
    np.testing.assert_array_equal(outs["dio"], outs["offline"])
    # vs host: FFT rounding + the dither recurrence's f32-grid (<= 2 LSB)
    diff = outs["dio"].astype(np.int64) - outs["host"].astype(np.int64)
    assert np.abs(diff).max() <= 2
    assert np.mean(diff == 0) > 0.9
