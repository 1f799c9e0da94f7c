"""PulseDevice state machine against a scripted fake libpulse-simple.

Companion of test_fake_alsa.py: real ctypes dispatch through the pa_simple
surface (bfio_pulse.c analog), connection-parameter verification,
connection-refused error path, and a full engine run with byte-exact
playback capture and drain-on-stop ordering.
"""

import ctypes
import os
import subprocess

import numpy as np
import pytest

from brutefir_tpu.config import parse_config
from brutefir_tpu.io import IoModuleError
from brutefir_tpu.io.sound_backends import PulseDevice
from brutefir_tpu.runtime import Engine


@pytest.fixture(scope="module")
def fake_lib_path(tmp_path_factory):
    src = os.path.join(os.path.dirname(__file__), "fake_pulse.c")
    out = tmp_path_factory.mktemp("fakepulse") / "libfakepulse.so"
    subprocess.run(["gcc", "-O2", "-shared", "-fPIC", src, "-o", str(out)],
                   check=True)
    return str(out)


@pytest.fixture
def fake_pulse(fake_lib_path, tmp_path, monkeypatch):
    log = tmp_path / "calls.log"
    dump = tmp_path / "dump.raw"
    monkeypatch.setenv("FAKE_PULSE_LOG", str(log))
    monkeypatch.setenv("FAKE_PULSE_DUMP", str(dump))
    monkeypatch.delenv("FAKE_PULSE_FAIL_NEW", raising=False)
    monkeypatch.setattr(PulseDevice, "_lib", None)
    monkeypatch.setattr(
        PulseDevice, "_pulse",
        classmethod(lambda cls: cls._lib or _load(cls, fake_lib_path)))
    monkeypatch.setattr(os, "sched_setscheduler",
                        lambda *a, **k: (_ for _ in ()).throw(
                            PermissionError()), raising=False)
    ctypes.CDLL(fake_lib_path).fake_pulse_reset()
    return log, dump


def _load(cls, path):
    lib = ctypes.CDLL(path)
    lib.pa_simple_new.restype = ctypes.c_void_p
    cls._lib = lib
    return lib


def _mk_device(io=0, fmt="S16_LE", channels=2, extra=""):
    from brutefir_tpu.config.lexer import tokenize, T
    from brutefir_tpu.core.sampleformat import parse_sample_format
    params = [t for t in tokenize(
        f'device: "mysink"; app_name: "bf-test"; {extra}')
        if t.kind != T.EOF]
    return PulseDevice(params, io, parse_sample_format(fmt), 44100, channels)


def test_connection_parameters(fake_pulse):
    """pa_simple_new carries direction, names, and the sample spec
    (bfio_pulse.c:161-213)."""
    log, _ = fake_pulse
    dev = _mk_device(io=0, fmt="S24_4LE", channels=3)
    dev.init(256)
    dev.close()
    lines = log.read_text().splitlines()
    assert ("new server=(default) name=bf-test dir=2 dev=mysink "
            "stream=brutefir format=11 rate=44100 channels=3") == lines[0]
    assert lines[1] == "free"


def test_connection_refused(fake_pulse, monkeypatch):
    monkeypatch.setenv("FAKE_PULSE_FAIL_NEW", "1")
    dev = _mk_device(io=0)
    with pytest.raises(IoModuleError) as ei:
        dev.init(256)
    assert "pa_simple_new failed (error 6)" in str(ei.value)


def test_capture_pattern(fake_pulse):
    dev = _mk_device(io=0, channels=2)
    dev.init(64)
    a = np.frombuffer(dev.read(64 * 4), "<i2").reshape(64, 2)
    assert a[0, 0] == 0 and a[7, 1] == 8
    b = np.frombuffer(dev.read(64 * 4), "<i2").reshape(64, 2)
    assert b[0, 0] == 64
    dev.close()


def test_engine_end_to_end_over_fake_pulse(fake_pulse):
    """Full Engine run over pulse in + pulse out: the capture pattern
    passes a dirac bit-cleanly after the iodelay fill, and teardown
    drains before freeing."""
    log, dump = fake_pulse
    N, nblocks = 128, 5
    conf = parse_config(f"""
sampling_rate: 44100;
filter_length: {N},2;
coeff 0 {{ filename: "dirac pulse"; }};
input 0, 1 {{ device: "pulse" {{ device: "mysource"; }}; sample: "S16_LE"; channels: 2; }};
output 0, 1 {{ device: "pulse" {{ device: "mysink"; }}; sample: "S16_LE"; channels: 2; dither: false; }};
filter 0 {{ from_inputs: 0; to_outputs: 0; coeff: 0; }};
filter 1 {{ from_inputs: 1; to_outputs: 1; coeff: 0; }};
""")
    conf.quiet = True
    eng = Engine(conf)
    eng.run(max_blocks=nblocks)
    out = np.frombuffer(dump.read_bytes(), "<i2").reshape(-1, 2)
    assert out.shape[0] == (2 + nblocks) * N     # iodelay fill + audio
    assert not out[: 2 * N].any()
    audio = out[2 * N:]
    expect0 = (np.arange(nblocks * N) & 0xFF).astype(np.int16)
    np.testing.assert_array_equal(audio[:, 0], expect0)
    txt = log.read_text().splitlines()
    # drain happens before free on the playback stream (stop -> close)
    assert txt.index("drain") < len(txt) - 1 - txt[::-1].index("free")
