"""Regression tests for the CLI protocol review pass: missing-value
diagnostics, negative coeff ids, byte-noise resilience, truncated
module params, OSS typed errors."""

import socket
import time

import numpy as np
import pytest

from brutefir_tpu.config import parse_config
from brutefir_tpu.runtime import Engine

from tests.test_cli import make_engine


def _run_cmd(eng, cmd):
    """Run one command against the attached CLI module, return output."""
    import io as _io
    from brutefir_tpu.control.cli import _SleepTask
    mod = eng.logic[0]
    out = _io.StringIO()
    mod.run_line(out, cmd, _SleepTask())
    return out.getvalue()


def _cli_engine(tmp_path, rng):
    eng, x, outp = make_engine(
        tmp_path, rng, 64 * 2,
        extra='logic: "cli" { script: "sleep b100;"; };')
    eng.setup()
    eng.attach_logic()
    return eng


def test_missing_attenuation_values_report(tmp_path, rng):
    """cfoa/cfia/cffa with no value print the reference's strtod error
    (bflogic_cli.c:541-603), not a silent no-op."""
    eng = _cli_engine(tmp_path, rng)
    try:
        assert "Invalid output attenuation." in _run_cmd(eng, "cfoa 0 0")
        assert "Invalid input attenuation." in _run_cmd(eng, "cfia 0 0")
        assert "Invalid output multiplier." in _run_cmd(eng, "cfoa 0 0 M")
    finally:
        eng.teardown()


def test_negative_coeff_id_means_no_coeff(tmp_path, rng):
    """cfc with any negative id sets -1 (bfrun.c:1585 treats all
    negatives as no-coeff; get_id has no lower bound for COEFF_ID)."""
    eng = _cli_engine(tmp_path, rng)
    try:
        _run_cmd(eng, "cfc 0 -5")
        assert eng.control.fctrl[0].coeff == -1
    finally:
        eng.teardown()


def test_truncated_port_param_is_clean_error():
    """logic: "cli" { port: }; must fail with the module's parse error,
    not IndexError."""
    conf = parse_config("""
sampling_rate: 44100;
filter_length: 64,2;
logic: "cli" { port: };
coeff 0 { filename: "dirac pulse"; };
input 0 { device: "file" { path: "/dev/zero"; }; sample: "FLOAT_LE"; channels: 1; };
output 0 { device: "file" { path: "/dev/null"; }; sample: "FLOAT_LE"; channels: 1; };
filter 0 { from_inputs: 0; to_outputs: 0; coeff: 0; };
""")
    eng = Engine(conf)
    try:
        eng.setup()
        with pytest.raises(RuntimeError, match="parse error"):
            eng.attach_logic()
    finally:
        eng.teardown()


def test_socket_session_survives_byte_noise(tmp_path, rng):
    """Arbitrary non-UTF-8 bytes answer 'Unknown command' instead of
    killing the session thread with UnicodeDecodeError."""
    sock_path = str(tmp_path / "cli.sock")
    eng, x, outp = make_engine(
        tmp_path, rng, 64 * 2,
        extra=f'logic: "cli" {{ port: "{sock_path}"; }};')
    eng.setup()
    eng.attach_logic()
    time.sleep(0.1)
    c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    c.connect(sock_path)
    c.settimeout(5.0)
    c.sendall(b"\xff\xfe garbage \xff\n")
    data = ""
    while "Unknown command" not in data:
        data += c.recv(65536).decode(errors="replace")
    # the session still works afterwards
    c.sendall(b"lc\n")
    while "Coefficient sets:" not in data:
        data += c.recv(65536).decode(errors="replace")
    c.sendall(b"quit\n")
    c.close()
    eng.run(setup=False)
    eng.teardown()


def test_oss_missing_device_is_typed_error(tmp_path):
    """A nonexistent OSS device fails with IoModuleError (clean message
    + exit-code contract), not FileNotFoundError."""
    from brutefir_tpu.io import IoModuleError
    conf = parse_config(f"""
sampling_rate: 44100;
filter_length: 64,2;
coeff 0 {{ filename: "dirac pulse"; }};
input 0, 1 {{ device: "oss" {{ device: "{tmp_path}/nodev"; }}; sample: "S16_LE"; channels: 2; }};
output 0, 1 {{ device: "file" {{ path: "/dev/null"; }}; sample: "S16_LE"; channels: 2; }};
filter 0 {{ from_inputs: 0, 1; to_outputs: 0, 1; coeff: 0; }};
""")
    eng = Engine(conf)
    with pytest.raises(IoModuleError, match="could not open"):
        eng.setup()
    eng.teardown()
