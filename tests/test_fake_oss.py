"""OssDevice state machine against a scripted fake ioctl layer.

The OSS client (bfio_oss.c analog) does its setup through three ioctls
(SETFMT/CHANNELS/SPEED) and then plain read/write on the fd. A live
/dev/dsp is unavailable in CI; the fake here monkeypatches fcntl.ioctl
with a recording/scriptable stand-in and backs the device path with
regular files -- real fds, real EOF semantics.
"""

import os
import struct

import numpy as np
import pytest

from brutefir_tpu.config import parse_config
from brutefir_tpu.io import IoModuleError
from brutefir_tpu.io.sound_backends import OssDevice
from brutefir_tpu.runtime import Engine


class FakeIoctl:
    def __init__(self, refuse=None):
        self.calls = []            # (fd, request, value)
        self.refuse = refuse or {} # request -> forced reply value

    def __call__(self, fd, request, arg=0, mutate_flag=True):
        val = struct.unpack("i", arg)[0]
        self.calls.append((fd, request, val))
        reply = self.refuse.get(request, val)
        return struct.pack("i", reply)


def _mk_device(path, fmt="S16_LE", io=0, channels=2):
    from brutefir_tpu.config.lexer import tokenize, T
    from brutefir_tpu.core.sampleformat import parse_sample_format
    params = [t for t in tokenize(f'device: "{path}";') if t.kind != T.EOF]
    return OssDevice(params, io, parse_sample_format(fmt), 44100, channels)


def test_oss_ioctl_negotiation(tmp_path, monkeypatch):
    """init issues SETFMT/CHANNELS/SPEED with the configured values
    (bfio_oss.c:46-157)."""
    import fcntl
    fake = FakeIoctl()
    monkeypatch.setattr(fcntl, "ioctl", fake)
    dev_path = tmp_path / "dsp"
    dev_path.write_bytes(b"")
    dev = _mk_device(dev_path, fmt="S32_LE", io=0, channels=4)
    dev.init(128)
    reqs = [(r, v) for _, r, v in fake.calls]
    assert reqs == [
        (OssDevice.SNDCTL_DSP_SETFMT, OssDevice.AFMT["S32_LE"]),
        (OssDevice.SNDCTL_DSP_CHANNELS, 4),
        (OssDevice.SNDCTL_DSP_SPEED, 44100),
    ]
    dev.close()


def test_oss_refused_setting_aborts(tmp_path, monkeypatch):
    """A device that answers a different rate aborts with a clear error,
    like the reference's setup checks."""
    import fcntl
    fake = FakeIoctl(refuse={OssDevice.SNDCTL_DSP_SPEED: 48000})
    monkeypatch.setattr(fcntl, "ioctl", fake)
    dev_path = tmp_path / "dsp"
    dev_path.write_bytes(b"")
    dev = _mk_device(dev_path, io=0)
    with pytest.raises(IoModuleError) as ei:
        dev.init(128)
    assert "refused" in str(ei.value)
    dev.close()


def test_engine_end_to_end_over_fake_oss(tmp_path, monkeypatch):
    """Full Engine run over oss in + oss out backed by files: S16 pattern
    passes through a dirac bit-cleanly (no dither)."""
    import fcntl
    monkeypatch.setattr(fcntl, "ioctl", FakeIoctl())
    monkeypatch.setattr(os, "sched_setscheduler",
                        lambda *a, **k: (_ for _ in ()).throw(
                            PermissionError()), raising=False)
    N, C, nblocks = 128, 2, 5
    x = ((np.arange(N * nblocks * C) * 37) % 32749 - 16374).astype("<i2")
    inp = tmp_path / "dsp_in"
    outp = tmp_path / "dsp_out"
    x.tofile(inp)
    outp.write_bytes(b"")
    conf = parse_config(f"""
sampling_rate: 44100;
filter_length: {N},2;
coeff 0 {{ filename: "dirac pulse"; }};
input 0, 1 {{ device: "oss" {{ device: "{inp}"; }}; sample: "S16_LE"; channels: {C}; }};
output 0, 1 {{ device: "oss" {{ device: "{outp}"; }}; sample: "S16_LE"; channels: {C}; dither: false; }};
filter 0 {{ from_inputs: 0; to_outputs: 0; coeff: 0; }};
filter 1 {{ from_inputs: 1; to_outputs: 1; coeff: 0; }};
""")
    conf.quiet = True
    eng = Engine(conf)
    eng.run(max_blocks=nblocks + 2)      # file input EOFs after nblocks
    out = np.fromfile(outp, dtype="<i2")
    # oss is clocked: the 2-fragment iodelay fill precedes the audio
    silent = out[: 2 * N * C]
    assert not silent.any()
    audio = out[2 * N * C:]
    np.testing.assert_array_equal(audio, x[: len(audio)])
    assert len(audio) == len(x)
