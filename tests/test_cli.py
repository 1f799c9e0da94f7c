"""CLI logic module tests: script pacing, command semantics, socket mode."""

import io
import socket
import time

import numpy as np
import pytest
import scipy.signal

from brutefir_tpu.config import parse_config
from brutefir_tpu.runtime import Engine


def make_engine(tmp_path, rng, n_samples, extra="", coeffs=None, N=64, B=2,
                crossfade=False):
    x = rng.standard_normal(n_samples).astype(np.float32)
    inp, outp = tmp_path / "in.f32", tmp_path / "out.f32"
    x.astype("<f4").tofile(inp)
    coeffs = coeffs or ['coeff 0 { filename: "dirac pulse"; };']
    xf = "crossfade: true;" if crossfade else ""
    conf = parse_config(f"""
sampling_rate: 44100;
filter_length: {N},{B};
{extra}
{chr(10).join(coeffs)}
input 0 {{ device: "file" {{ path: "{inp}"; }}; sample: "FLOAT_LE"; channels: 1; }};
output 0 {{ device: "file" {{ path: "{outp}"; }}; sample: "FLOAT_LE"; channels: 1; }};
filter 0 {{ from_inputs: 0; to_outputs: 0; coeff: 0; {xf} }};
""")
    return Engine(conf), x, outp


def test_script_coeff_flip_per_block(tmp_path, rng):
    """bench5 pattern: a 2-line script flips coeff every block, wrapping."""
    N, B = 64, 2
    eng, x, outp = make_engine(
        tmp_path, rng, N * 8,
        extra='logic: "cli" { echo: false; script: "cfc 0 0;\ncfc 0 -1;"; };',
        N=N, B=B)
    eng.run()
    y = np.fromfile(outp, dtype="<f4")
    # even blocks (0,2,..): coeff 0 = dirac; odd: -1 = dirac passthrough too.
    # both are passthrough so output == input; pacing itself is verified by
    # the prev_coeff bookkeeping not blowing up and output staying exact.
    np.testing.assert_allclose(y, x, rtol=0, atol=1e-4)


def test_script_attenuation_changes_on_block_boundary(tmp_path, rng):
    N, B = 64, 2
    eng, x, outp = make_engine(
        tmp_path, rng, N * 6,
        extra=('logic: "cli" { echo: false; '
               'script: "cfoa 0 0 M0.5; sleep b100;"; };'),
        N=N, B=B)
    eng.run()
    y = np.fromfile(outp, dtype="<f4")
    # the gain change lands on block 0 (before its snapshot) and persists
    np.testing.assert_allclose(y, 0.5 * x, rtol=0, atol=1e-4)


def test_script_crossfaded_coeff_swap_matches_ramp(tmp_path, rng):
    N, B = 64, 2
    taps = (rng.standard_normal(N) * 0.3).astype(np.float32)
    tap_file = tmp_path / "t.txt"
    tap_file.write_text("\n".join(str(float(v)) for v in taps))
    eng, x, outp = make_engine(
        tmp_path, rng, N * 6,
        extra=('logic: "cli" { echo: false; '
               'script: "sleep b2;\\ncfc 0 1;\\nsleep b100;"; };'),
        coeffs=['coeff 0 { filename: "dirac pulse"; };',
                f'coeff 1 {{ filename: "{tap_file}"; format: "TEXT"; }};'],
        N=N, B=B, crossfade=True)
    eng.run()
    y = np.fromfile(outp, dtype="<f4")
    ref_new = scipy.signal.fftconvolve(x, taps)[: len(x)]
    # block 0,1,2: script line 1 runs at block 0 then sleeps to block 3;
    # cfc lands at block 3's snapshot -> crossfade during block 3
    sw = 3
    np.testing.assert_allclose(y[: sw * N], x[: sw * N], rtol=0, atol=1e-3)
    f = np.arange(N) / (N - 1)
    seg = slice(sw * N, (sw + 1) * N)
    np.testing.assert_allclose(
        y[seg], x[seg] * (1 - f) + ref_new[seg] * f, rtol=0, atol=1e-3)
    np.testing.assert_allclose(y[(sw + 1) * N:], ref_new[(sw + 1) * N:],
                               rtol=0, atol=1e-3)


def test_command_interface_listings_and_meters(tmp_path, rng):
    eng, x, outp = make_engine(
        tmp_path, rng, 64 * 2,
        extra='logic: "cli" { echo: false; script: "sleep b1000;"; };')
    eng.setup()
    eng.attach_logic()
    cli = eng.logic[0]
    ok, msg = cli.command("lf")
    assert ok and 'Filters:' in msg and '"0"' in msg
    ok, msg = cli.command("lc")
    assert "Coefficient sets:" in msg
    ok, msg = cli.command("li; lo")
    assert "Input channels:" in msg and "Output channels:" in msg
    ok, msg = cli.command("rti")
    assert "Realtime index:" in msg
    ok, msg = cli.command("ppk")
    assert msg.startswith("peak:")
    ok, msg = cli.command("cfc 0 55")
    assert "out of range" in msg
    ok, msg = cli.command("nonsense")
    assert "Unknown command" in msg
    eng.run(setup=False)
    eng.teardown()


def test_socket_mode(tmp_path, rng):
    sock_path = str(tmp_path / "cli.sock")
    eng, x, outp = make_engine(
        tmp_path, rng, 64 * 2,
        extra=f'logic: "cli" {{ port: "{sock_path}"; }};')
    eng.setup()
    eng.attach_logic()
    time.sleep(0.1)
    c = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
    c.connect(sock_path)
    c.sendall(b"lc\n")
    c.settimeout(5.0)
    data = ""
    while "Coefficient sets:" not in data:
        data += c.recv(65536).decode()
    assert "Coefficient sets:" in data
    c.sendall(b"quit\n")
    c.close()
    eng.run(setup=False)
    eng.teardown()
    y = np.fromfile(outp, dtype="<f4")
    np.testing.assert_allclose(y, x, rtol=0, atol=1e-4)


def test_cli_serial_device_session(tmp_path):
    """logic: "cli" { port: "/dev/tty..." } serves one raw-tty session
    (bflogic_cli.c's serial mode), exercised over a pty pair."""
    import pty
    import os as _os
    import time as _time
    rng = np.random.default_rng(0)
    master, slave = pty.openpty()
    slave_path = _os.ttyname(slave)
    eng, x, outp = make_engine(
        tmp_path, rng, 64 * 2,
        extra=f'logic: "cli" {{ port: "{slave_path}"; line_speed: 9600; }};')
    eng.setup()
    eng.attach_logic()
    import select
    try:
        _time.sleep(0.2)                      # let the serial thread open
        _os.write(master, b"lc\n")
        deadline = _time.time() + 8.0
        buf = b""
        while b"Coefficient sets:" not in buf and _time.time() < deadline:
            r, _, _ = select.select([master], [], [], 0.2)
            if r:
                try:
                    buf += _os.read(master, 4096)
                except OSError:
                    break
        assert b"Coefficient sets:" in buf, buf
    finally:
        eng.teardown()
        _os.close(master)
