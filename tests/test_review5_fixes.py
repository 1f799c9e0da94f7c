"""Regression tests for the round-3 fifth review pass.

Covers: the stock-defaults subdelay crash, device-IO input mute
ordering, JACK auto-connect skip semantics, and the text-input EOF
parse guard.
"""

import ctypes

import numpy as np
import pytest

from brutefir_tpu.config import parse_config
from brutefir_tpu.config.defaults import DEFAULT_CONFIG_TEXT
from brutefir_tpu.config.parser import ConfigParseError
from brutefir_tpu.io import IoModuleError
from brutefir_tpu.runtime import Engine


MAIN_MIN = """
sampling_rate: 44100;
filter_length: 64,2;
coeff 0 {{ filename: "dirac pulse"; }};
input 0 {{ device: "file" {{ path: "{inp}"; }}; sample: "FLOAT_LE"; channels: 1; }};
output 0 {{ device: "file" {{ path: "{outp}"; }}; sample: "FLOAT_LE"; channels: 1; }};
filter 0 {{ from_inputs: 0; to_outputs: 0; coeff: 0; }};
"""


def test_stock_defaults_do_not_enable_subdelay(tmp_path, rng):
    """The auto-generated defaults file carries `subdelay: 0,0;` with
    `sdf_length: -1;` -- like the reference (bfconf.c:2796-2798) that
    must leave the subdelay subsystem off, not abort engine init."""
    main = MAIN_MIN.format(inp="/dev/zero", outp="/dev/null")
    conf = parse_config(main, defaults_text=DEFAULT_CONFIG_TEXT)
    assert conf.use_subdelay == [False, False]
    eng = Engine(conf)
    assert eng.subdelay is None
    # and a defaults-layered run completes end to end
    x = (rng.standard_normal(64 * 3) * 0.1).astype("<f4")
    inp = tmp_path / "in.f32"
    outp = tmp_path / "out.f32"
    x.tofile(inp)
    conf = parse_config(MAIN_MIN.format(inp=inp, outp=outp),
                        defaults_text=DEFAULT_CONFIG_TEXT)
    Engine(conf).run()
    y = np.fromfile(outp, dtype="<f4")
    np.testing.assert_allclose(y, x, rtol=0, atol=1e-5)


def test_nonzero_subdelay_without_sdf_length_silently_disabled():
    """Even a real `subdelay:` request is *silently* dropped when
    sdf_length is unset -- reference behavior, not an error
    (bfconf.c:2796-2798 clears use_subdelay after parsing)."""
    conf = parse_config("""
sampling_rate: 44100;
filter_length: 64,2;
coeff 0 { filename: "dirac pulse"; };
input 0 { device: "file" { path: "/dev/zero"; }; sample: "FLOAT_LE";
          channels: 1; subdelay: 10; };
output 0 { device: "file" { path: "/dev/null"; }; sample: "FLOAT_LE";
           channels: 1; };
filter 0 { from_inputs: 0; to_outputs: 0; coeff: 0; };
""")
    assert conf.use_subdelay == [False, False]
    assert Engine(conf).subdelay is None


def test_sdf_length_too_large_for_filter_block_rejected():
    """2*sdf_length+1 > filter_length aborts config parsing
    (bfconf.c:2799-2804)."""
    main = MAIN_MIN.format(inp="/dev/zero", outp="/dev/null")
    with pytest.raises(ConfigParseError, match="filter_length must be"):
        parse_config("sdf_length: 40;\n" + main)


def test_input_mute_before_delay_dio_matches_host(tmp_path):
    """Input mute zeroes samples BEFORE the delay line on both paths:
    audio captured while muted must not replay after unmute."""
    rng = np.random.default_rng(11)
    n_fr = 128 * 10
    x = np.clip((rng.standard_normal((n_fr,)) * 2 ** 20).round(),
                -(2 ** 23), 2 ** 23 - 1).astype("<i4")
    inp = tmp_path / "in.raw"
    x.tofile(inp)
    # script lines run one per block; `sleep bN` is a relative block
    # sleep, so: blocks 0-2 unmuted, mute lands at block 3, unmute at
    # block 6 (block 4 runs the second sleep line)
    script = "sleep b2\ntmi 0\nsleep b1\ntmi 0\nsleep b99"
    outs = {}
    for mode in ("dio", "host"):
        outp = tmp_path / f"o_{mode}.raw"
        conf = parse_config(f"""
sampling_rate: 44100;
filter_length: 128,2;
logic: "cli" {{ script: "{script}"; }};
coeff 0 {{ filename: "dirac pulse"; }};
input 0 {{ device: "file" {{ path: "{inp}"; }}; sample: "S32_LE";
           channels: 1; delay: 70; }};
output 0 {{ device: "file" {{ path: "{outp}"; }}; sample: "S32_LE";
            channels: 1; dither: false; }};
filter 0 {{ from_inputs: 0; to_outputs: 0; coeff: 0; }};
""")
        eng = Engine(conf)
        if mode == "dio":
            assert eng.dio is not None
        else:
            eng.dio = None
        eng.run()
        outs[mode] = np.fromfile(outp, dtype="<i4")
    np.testing.assert_array_equal(outs["dio"], outs["host"])
    # first principles: blocks 3-5 are muted BEFORE the 70-sample delay,
    # so the zero span in the OUTPUT lands delay samples late and the
    # audio captured during the mute never appears -- on unmute the
    # output resumes with the live input, not a replay.
    y = outs["dio"].astype(np.int64)
    mute_out, resume = 3 * 128 + 70, 6 * 128 + 70
    np.testing.assert_array_equal(y[mute_out:resume], 0)
    assert np.abs(y[resume:resume + 256]
                  - x[6 * 128:6 * 128 + 256]).max() <= 1


class _FakeJackLib:
    """Records jack_connect calls; succeeds unless told to fail."""

    def __init__(self, fail_on=None):
        self.connects = []
        self.fail_on = fail_on or set()

    def jack_activate(self, client):
        return 0

    def jack_port_name(self, port):
        return b"bf:port"

    def jack_connect(self, client, a, b):
        self.connects.append((a, b))
        return 1 if (a in self.fail_on or b in self.fail_on) else 0


def _jack_dev_for_start(connect):
    from brutefir_tpu.io.sound_backends import JackDevice
    from brutefir_tpu.config.model import OUT
    dev = JackDevice.__new__(JackDevice)
    dev.io = OUT
    dev._client = 1
    dev._ports = [1] * len(connect)
    dev._connect = connect
    return dev


def test_jack_unconnected_port_skips_not_breaks(monkeypatch):
    """ports: "", "x" -- an empty dest leaves that port unconnected and
    the loop continues to later ports (bfio_jack.c:534-536)."""
    from brutefir_tpu.io import sound_backends as sb
    fake = _FakeJackLib()
    monkeypatch.setattr(sb.JackDevice, "_jack", classmethod(lambda cls: fake))
    dev = _jack_dev_for_start([None, "system:playback_1"])
    dev.start()
    assert fake.connects == [(b"bf:port", b"system:playback_1")]


def test_jack_failed_connect_is_fatal(monkeypatch):
    """A failed auto-connect aborts startup (bfio_jack.c:538-546)."""
    from brutefir_tpu.io import sound_backends as sb
    fake = _FakeJackLib(fail_on={b"nosuch:port"})
    monkeypatch.setattr(sb.JackDevice, "_jack", classmethod(lambda cls: fake))
    dev = _jack_dev_for_start(["nosuch:port"])
    with pytest.raises(IoModuleError, match="Could not connect"):
        dev.start()


def test_text_input_bad_final_token_clean_error(tmp_path):
    """A malformed trailing token with no whitespace after it is parsed
    by the EOF branch -- same typed error as mid-file, no raw
    ValueError."""
    inp = tmp_path / "in.txt"
    with open(inp, "wb") as fh:
        fh.write(b"0.125 " * 8 + b"xyz")  # no trailing whitespace
    conf = parse_config(f"""
sampling_rate: 44100;
filter_length: 64,2;
coeff 0 {{ filename: "dirac pulse"; }};
input 0 {{ device: "file" {{ path: "{inp}"; text: true; }}; sample: "FLOAT64_NE"; channels: 1; }};
output 0 {{ device: "file" {{ path: "{tmp_path}/o.f32"; }}; sample: "FLOAT_LE"; channels: 1; }};
filter 0 {{ from_inputs: 0; to_outputs: 0; coeff: 0; }};
""")
    eng = Engine(conf)
    with pytest.raises(IoModuleError, match="bad text format"):
        eng.run()
