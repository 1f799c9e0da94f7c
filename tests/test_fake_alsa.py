"""AlsaDevice state machine against a scripted fake libasound.

Live jackd/pulse/alsa servers are unavailable in CI, so the ALSA client
is exercised against tests/fake_asound.c (compiled here), the same
fake-driver approach that validates the native JACK rtfifo path: real
ctypes dispatch, real ALSA error semantics (-EBADFD before params,
sticky -EPIPE until prepare), byte-level capture of playback.
"""

import ctypes
import os
import subprocess

import numpy as np
import pytest

from brutefir_tpu.config import parse_config
from brutefir_tpu.errors import BF_EXIT_BUFFER_UNDERFLOW
from brutefir_tpu.io import IoModuleError
from brutefir_tpu.io.sound_backends import AlsaDevice
from brutefir_tpu.runtime import Engine


@pytest.fixture(scope="module")
def fake_lib_path(tmp_path_factory):
    src = os.path.join(os.path.dirname(__file__), "fake_asound.c")
    out = tmp_path_factory.mktemp("fakealsa") / "libfakeasound.so"
    subprocess.run(["gcc", "-O2", "-shared", "-fPIC", src, "-o", str(out)],
                   check=True)
    return str(out)


@pytest.fixture
def fake_alsa(fake_lib_path, tmp_path, monkeypatch):
    """Point AlsaDevice at the fake and return the log/dump paths."""
    log = tmp_path / "calls.log"
    dump = tmp_path / "dump.raw"
    monkeypatch.setenv("FAKE_ASOUND_LOG", str(log))
    monkeypatch.setenv("FAKE_ASOUND_DUMP", str(dump))
    monkeypatch.delenv("FAKE_ASOUND_XRUN", raising=False)
    monkeypatch.setattr(AlsaDevice, "_lib", None)
    monkeypatch.setattr(
        AlsaDevice, "_asound",
        classmethod(lambda cls: cls._lib or _load(cls, fake_lib_path)))
    # dlopen caches the library per process: reset via the test hook; the
    # env (incl. any FAKE_ASOUND_XRUN set later in the test) is re-read
    # lazily at the first API call after the reset
    ctypes.CDLL(fake_lib_path).fake_asound_reset()
    # process-global link state starts clean per test (a __init__ parse
    # error can leave it set with no open handle to reset it)
    monkeypatch.setattr(AlsaDevice, "_base", None)
    monkeypatch.setattr(AlsaDevice, "_link_setting", None)
    monkeypatch.setattr(AlsaDevice, "_n_open", 0)
    # keep the test process off SCHED_FIFO
    monkeypatch.setattr(os, "sched_setscheduler",
                        _raise_perm, raising=False)
    return log, dump


def _load(cls, path):
    cls._lib = ctypes.CDLL(path)
    return cls._lib


def _raise_perm(*a, **k):
    raise PermissionError


def _mk_device(fmt="S16_LE", io=0, channels=2, ignore_xrun=False,
               link=None):
    from brutefir_tpu.config.lexer import tokenize, T
    from brutefir_tpu.core.sampleformat import parse_sample_format
    text = f'device: "hw:0"; ignore_xrun: {str(ignore_xrun).lower()};'
    if link is not None:
        text += f" link: {str(link).lower()};"
    params = [t for t in tokenize(text) if t.kind != T.EOF]
    return AlsaDevice(params, io, parse_sample_format(fmt), 44100, channels)


def test_param_negotiation_sequence(fake_alsa):
    """The full hw/sw-params negotiation runs in the reference's order
    (bfio_alsa.c:141-283): any -> access -> rate_near -> format ->
    channels -> period_size_near -> commit -> sw params -> prepare."""
    log, _ = fake_alsa
    dev = _mk_device(fmt="S24_4LE", io=0, channels=3)
    dev.init(256)
    dev.synch_start()
    dev.close()
    lines = log.read_text().splitlines()
    assert lines[0].startswith("open name=hw:0 stream=1")   # capture
    assert lines[1] == "hw_params_any"
    assert lines[2] == "set_access access=3"                # interleaved
    assert lines[3] == "set_rate_near want=44100 got=44100"
    assert lines[4] == "set_format format=6"                # S24_4LE
    assert lines[5] == "set_channels channels=3"
    assert lines[6] == "set_period_size_near frames=256"
    assert lines[7].startswith(
        "hw_params access=3 format=6 channels=3 rate=44100 period=256")
    # explicit start, stop at buffer size, avail_min 1
    # (bfio_alsa.c:229-258)
    assert lines[8] == "sw_params start=4294967295 stop=1024 avail_min=1"
    assert lines[9] == "prepare"
    assert lines[10] == "start"
    assert lines[11] == "close"


def test_rate_near_tolerance(fake_alsa, monkeypatch):
    """set_rate_near variations: within 1% is accepted, beyond aborts
    (bfio_alsa.c:174-181)."""
    monkeypatch.setenv("FAKE_ASOUND_RATE", "44099")
    dev = _mk_device(io=0)
    dev.init(64)                            # 44099 ~ 44100: accepted
    dev.close()
    AlsaDevice._lib.fake_asound_reset()
    monkeypatch.setenv("FAKE_ASOUND_RATE", "48000")
    dev = _mk_device(io=0)
    with pytest.raises(IoModuleError, match="suggested 48000"):
        dev.init(64)


def test_noninterleaved_fallback_roundtrip(fake_alsa, monkeypatch):
    """A device refusing RW_INTERLEAVED falls back to noninterleaved
    access (bfio_alsa.c:149-166) and is driven with readn/writen over
    per-channel planes (bfio_alsa.c:541-553,606-618); the engine-facing
    wire bytes are identical to the interleaved mode."""
    log, dump = fake_alsa
    monkeypatch.setenv("FAKE_ASOUND_ACCESS", "noninterleaved")
    din = _mk_device(fmt="S24_LE", io=0, channels=3)   # 3-byte format
    din.init(64)
    raw = din.read(64 * 9)
    a = np.frombuffer(raw, np.uint8).reshape(64, 3, 3)
    # pattern byte in the low byte of each 3-byte frame/channel sample
    assert a[0, 0, 0] == 0 and a[0, 1, 0] == 1 and a[0, 2, 0] == 2
    assert a[5, 0, 0] == 5
    assert not a[:, :, 1:].any()
    dout = _mk_device(fmt="S24_LE", io=1, channels=3)
    dout.init(64)
    dout.write(raw)
    txt = log.read_text()
    assert "set_access access=3 -> -EINVAL" in txt      # tried interleaved
    assert "set_access access=4" in txt                 # fell back
    assert "readn frames=64" in txt and "writen frames=64" in txt
    # the dump is the interleaved wire record regardless of access mode
    assert dump.read_bytes() == raw
    din.close()
    dout.close()


def test_noninterleaved_write_xrun_restart(fake_alsa, monkeypatch):
    """writen xrun with ignore_xrun: prepare, then restart is armed
    after the next successful write (the reference's bfio_write restart
    hack, bfio_alsa.c:619-627) -- without it the explicit start
    threshold would leave the prepared stream stopped forever."""
    log, _ = fake_alsa
    monkeypatch.setenv("FAKE_ASOUND_ACCESS", "noninterleaved")
    monkeypatch.setenv("FAKE_ASOUND_XRUN", "w:2")
    dev = _mk_device(io=1, ignore_xrun=True)
    dev.init(64)
    dev.synch_start()
    dev.write(b"\0" * 64 * 4)               # call 1 ok
    dev.write(b"\0" * 64 * 4)               # call 2 xruns, recovers
    lines = log.read_text().splitlines()
    i = lines.index("writen frames=64 -> -EPIPE")
    assert lines[i + 1] == "prepare"
    assert lines[i + 2] == "writen frames=64"
    assert lines[i + 3] == "start"          # restarted after the write
    lib = AlsaDevice._lib
    assert lib.snd_pcm_state(dev.pcm) == 3  # RUNNING again
    dev.close()


def test_capture_pattern_roundtrip(fake_alsa):
    """readi returns the scripted pattern; frame counter advances."""
    _, _ = fake_alsa
    dev = _mk_device(fmt="S16_LE", io=0, channels=2)
    dev.init(64)
    raw = dev.read(64 * 4)
    a = np.frombuffer(raw, "<i2").reshape(64, 2)
    assert a[0, 0] == 0 and a[0, 1] == 1
    assert a[5, 0] == 5 and a[5, 1] == 6
    raw2 = dev.read(64 * 4)
    b = np.frombuffer(raw2, "<i2").reshape(64, 2)
    assert b[0, 0] == 64                  # counter continued
    dev.close()


def test_xrun_recovery_with_ignore(fake_alsa, monkeypatch):
    """EPIPE on read with ignore_xrun: prepare + retry, data continues
    (bfio_alsa.c:555-586)."""
    log, _ = fake_alsa
    monkeypatch.setenv("FAKE_ASOUND_XRUN", "r:2")
    dev = _mk_device(io=0, ignore_xrun=True)
    dev.init(64)
    dev.read(64 * 4)                      # call 1 ok
    raw = dev.read(64 * 4)                # call 2 xruns, recovers inline
    assert len(raw) == 64 * 4
    txt = log.read_text()
    assert "-EPIPE" in txt and "prepare" in txt
    dev.close()


def test_xrun_abort_without_ignore(fake_alsa, monkeypatch):
    """EPIPE without ignore_xrun aborts with the underflow exit code
    (dai.c:1292-1303)."""
    monkeypatch.setenv("FAKE_ASOUND_XRUN", "w:1")
    dev = _mk_device(io=1, ignore_xrun=False)
    dev.init(64)
    with pytest.raises(IoModuleError) as ei:
        dev.write(b"\0" * 64 * 4)
    assert ei.value.exit_code == BF_EXIT_BUFFER_UNDERFLOW
    dev.close()


def test_linked_synchronous_start(fake_alsa):
    """Default link (bfio_alsa.c:59 link_handles=true): the second
    handle is snd_pcm_link'd to the first, and synch_start starts ONLY
    the base -- the link group starts in sample sync like the real
    driver (bfio_alsa.c:419-428,469-486)."""
    log, _ = fake_alsa
    din = _mk_device(io=0)
    dout = _mk_device(io=1)
    din.init(64)
    dout.init(64)
    din.synch_start()
    dout.synch_start()
    lines = log.read_text().splitlines()
    assert sum(1 for ln in lines if ln.startswith("link ")) == 1
    assert sum(1 for ln in lines if ln == "start") == 1
    # both handles RUNNING (=3) after the single base start
    lib = AlsaDevice._lib
    assert lib.snd_pcm_state(din.pcm) == 3
    assert lib.snd_pcm_state(dout.pcm) == 3
    din.close()
    dout.close()


def test_link_false_starts_each_handle(fake_alsa):
    """link: false on both devices: no snd_pcm_link, each handle gets
    its own start (bfio_alsa.c:488-505)."""
    log, _ = fake_alsa
    din = _mk_device(io=0, link=False)
    dout = _mk_device(io=1, link=False)
    din.init(64)
    dout.init(64)
    din.synch_start()
    dout.synch_start()
    lines = log.read_text().splitlines()
    assert not any(ln.startswith("link ") for ln in lines)
    assert sum(1 for ln in lines if ln == "start") == 2
    din.close()
    dout.close()


def test_link_global_conflict_rejected(fake_alsa):
    """link is a global setting: conflicting values across devices are a
    config error (bfio_alsa.c:337-345)."""
    _mk_device(io=0, link=True)
    with pytest.raises(IoModuleError, match="global setting"):
        _mk_device(io=1, link=False)


def test_engine_end_to_end_over_fake_alsa(fake_alsa):
    """Full Engine run: alsa capture -> dirac filter -> alsa playback.
    Playback dump must equal the capture pattern after the iodelay fill
    (2 silent fragments, dai.c:1451-1457)."""
    log, dump = fake_alsa
    N = 128
    conf = parse_config(f"""
sampling_rate: 44100;
filter_length: {N},2;
coeff 0 {{ filename: "dirac pulse"; }};
input 0, 1 {{ device: "alsa" {{ device: "hw:0"; }}; sample: "S16_LE"; channels: 2; }};
output 0, 1 {{ device: "alsa" {{ device: "hw:0"; }}; sample: "S16_LE"; channels: 2; dither: false; }};
filter 0 {{ from_inputs: 0; to_outputs: 0; coeff: 0; }};
filter 1 {{ from_inputs: 1; to_outputs: 1; coeff: 0; }};
""")
    conf.quiet = True
    eng = Engine(conf)
    nblocks = 6
    eng.run(max_blocks=nblocks)
    out = np.frombuffer(dump.read_bytes(), "<i2").reshape(-1, 2)
    # iodelay fill: exactly 2 silent fragments precede the audio
    assert out.shape[0] == (2 + nblocks) * N
    assert not out[: 2 * N].any()
    audio = out[2 * N:]
    expect0 = (np.arange(nblocks * N) & 0xFF).astype(np.int16)
    expect1 = ((np.arange(nblocks * N) + 1) & 0xFF).astype(np.int16)
    np.testing.assert_array_equal(audio[:, 0], expect0)
    np.testing.assert_array_equal(audio[:, 1], expect1)
    txt = log.read_text()
    assert "start" in txt                 # synch_start reached the device
