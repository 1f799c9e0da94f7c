"""Realtime sound-server I/O modules: alsa, oss, jack, pulse.

Host-side backends mirroring the reference's dlopen'd modules
(`bfio_alsa.c`, `bfio_oss.c`, `bfio_jack.c`, `bfio_pulse.c`). The engine's
compute path is identical for all backends; these differ only in device
setup and the blocking read/write calls.

* ``alsa``: ctypes bindings to libasound (snd_pcm blocking API). Parameters
  ``device:``, ``ignore_xrun:``, ``link:`` (accepted; linked synchronous
  start is approximated by the engine's synch_start ordering). Recovers
  from xruns with prepare+restart when ``ignore_xrun`` is set, matching
  bfio_alsa.c:555-586.
* ``oss``: /dev/dsp ioctl setup (SNDCTL_DSP_*) with plain read/write.
* ``jack``/``pulse``: require client libraries with callback threading that
  this build gates off; constructing them raises a clear error. The file
  and alsa/oss paths cover the offline and blocking realtime cases.

All four register so configs referencing them parse and fail with a clear
message only when the host lacks the library.
"""

from __future__ import annotations

import ctypes
import ctypes.util
import os

from ..config.lexer import T
from . import IoDevice, IoModuleError, register_io_module, IN


def _parse_fields(params, spec):
    """Generic module-parameter parser: spec maps field -> token kind."""
    out = {}
    i = 0

    def need(kind):
        nonlocal i
        if i >= len(params) or params[i].kind != kind:
            raise IoModuleError("parse error in module parameters")
        t = params[i]
        i += 1
        return t

    while i < len(params):
        f = need(T.FIELD).value
        if f not in spec:
            raise IoModuleError(f"unknown field {f}")
        out[f] = need(spec[f]).value
        need(T.EOS)
    return out


class AlsaDevice(IoDevice):
    """Blocking ALSA PCM device through libasound (bfio_alsa.c analog)."""

    _lib = None

    @classmethod
    def _asound(cls):
        if cls._lib is None:
            name = ctypes.util.find_library("asound")
            if name is None:
                raise IoModuleError(
                    "ALSA I/O: libasound not found on this host")
            cls._lib = ctypes.CDLL(name)
        return cls._lib

    # snd_pcm_format_t values (asoundlib.h)
    _FMT = {"S8": 0, "S16_LE": 2, "S16_BE": 3, "S24_LE": 32, "S24_BE": 33,
            "S24_4LE": 6, "S24_4BE": 7, "S32_LE": 10, "S32_BE": 11,
            "FLOAT_LE": 14, "FLOAT_BE": 15, "FLOAT64_LE": 16, "FLOAT64_BE": 17}

    def __init__(self, params, io, sample_format, sample_rate, open_channels):
        super().__init__(params, io, sample_format, sample_rate, open_channels)
        opts = _parse_fields(params, {"device": T.STRING,
                                      "ignore_xrun": T.BOOLEAN,
                                      "link": T.BOOLEAN})
        self.device = opts.get("device", "default")
        self.ignore_xrun = opts.get("ignore_xrun", False)
        self.pcm = None
        self._frame_bytes = None
        if sample_format is None:
            raise IoModuleError(
                "ALSA I/O: AUTO sample format negotiation requires opening "
                "the device; set an explicit format")

    def init(self, period_size):
        lib = self._asound()
        pcm = ctypes.c_void_p()
        stream = 1 if self.io == IN else 0  # SND_PCM_STREAM_CAPTURE=1
        rc = lib.snd_pcm_open(ctypes.byref(pcm), self.device.encode(),
                              stream, 0)
        if rc < 0:
            raise IoModuleError(
                f'ALSA I/O: could not open "{self.device}" (error {rc})')
        self.pcm = pcm
        fmt = self._FMT.get(self.sample_format.name)
        if fmt is None:
            raise IoModuleError(
                f"ALSA I/O: unsupported format {self.sample_format.name}")
        rc = lib.snd_pcm_set_params(
            pcm, fmt, 3,  # SND_PCM_ACCESS_RW_INTERLEAVED
            self.open_channels, self.sample_rate,
            0,  # soft_resample off (rate must match, dai.c monitor analog)
            ctypes.c_uint(int(2 * period_size * 1_000_000 / self.sample_rate)))
        if rc < 0:
            raise IoModuleError(f"ALSA I/O: hw params failed (error {rc})")
        self._frame_bytes = self.sample_format.bytes * self.open_channels

    def read(self, nbytes):
        lib = self._asound()
        frames = nbytes // self._frame_bytes
        buf = ctypes.create_string_buffer(nbytes)
        got = 0
        while got < frames:
            rc = lib.snd_pcm_readi(
                self.pcm, ctypes.byref(buf, got * self._frame_bytes),
                frames - got)
            if rc < 0:
                if self.ignore_xrun and rc == -32:  # EPIPE: xrun
                    lib.snd_pcm_prepare(self.pcm)
                    continue
                raise IoModuleError(f"ALSA I/O: read failed (error {rc})")
            got += rc
        return buf.raw[: got * self._frame_bytes]

    def write(self, data):
        lib = self._asound()
        frames = len(data) // self._frame_bytes
        buf = bytes(data)
        done = 0
        while done < frames:
            rc = lib.snd_pcm_writei(
                self.pcm, buf[done * self._frame_bytes:], frames - done)
            if rc < 0:
                if self.ignore_xrun and rc == -32:
                    lib.snd_pcm_prepare(self.pcm)
                    continue
                raise IoModuleError(
                    f"ALSA I/O: write failed (error {rc}), buffer underflow")
            done += rc
        return len(data)

    def synch_start(self):
        if self.pcm is not None:
            self._asound().snd_pcm_start(self.pcm)

    def close(self):
        if self.pcm is not None:
            self._asound().snd_pcm_close(self.pcm)
            self.pcm = None


class OssDevice(IoDevice):
    """OSS /dev/dsp device (bfio_oss.c analog): ioctl setup, plain rw."""

    # soundcard.h ioctls (x86-64)
    SNDCTL_DSP_SETFMT = 0xC0045005
    SNDCTL_DSP_CHANNELS = 0xC0045006
    SNDCTL_DSP_SPEED = 0xC0045002
    AFMT = {"S8": 0x00000040, "S16_LE": 0x00000010, "S16_BE": 0x00000020,
            "S32_LE": 0x00001000, "S32_BE": 0x00002000}

    def __init__(self, params, io, sample_format, sample_rate, open_channels):
        super().__init__(params, io, sample_format, sample_rate, open_channels)
        opts = _parse_fields(params, {"device": T.STRING})
        self.device = opts.get("device", "/dev/dsp")
        self.fd = None
        if sample_format is None:
            raise IoModuleError("OSS I/O: no support for AUTO sample format")
        if sample_format.name not in self.AFMT:
            raise IoModuleError(
                f"OSS I/O: unsupported format {sample_format.name}")

    def init(self, period_size):
        import fcntl
        import struct
        flags = os.O_RDONLY if self.io == IN else os.O_WRONLY
        self.fd = os.open(self.device, flags)
        for req, val in ((self.SNDCTL_DSP_SETFMT,
                          self.AFMT[self.sample_format.name]),
                         (self.SNDCTL_DSP_CHANNELS, self.open_channels),
                         (self.SNDCTL_DSP_SPEED, self.sample_rate)):
            buf = struct.pack("i", val)
            res = fcntl.ioctl(self.fd, req, buf)
            got = struct.unpack("i", res)[0]
            if got != val:
                raise IoModuleError(
                    f"OSS I/O: device refused setting {req:#x} "
                    f"(wanted {val}, got {got})")

    def read(self, nbytes):
        out = bytearray()
        while len(out) < nbytes:
            chunk = os.read(self.fd, nbytes - len(out))
            if not chunk:
                break
            out += chunk
        return bytes(out)

    def write(self, data):
        return os.write(self.fd, bytes(data))

    def close(self):
        if self.fd is not None:
            os.close(self.fd)
            self.fd = None


class JackDevice(IoDevice):
    is_callback = True

    def __init__(self, params, io, sample_format, sample_rate, open_channels):
        raise IoModuleError(
            "JACK I/O: callback-threaded JACK client is not available in "
            "this build; use the file, alsa or oss modules")


class PulseDevice(IoDevice):
    def __init__(self, params, io, sample_format, sample_rate, open_channels):
        name = ctypes.util.find_library("pulse-simple")
        raise IoModuleError(
            "Pulse I/O: libpulse-simple is not available in this build; "
            "use the file, alsa or oss modules"
            if name is None else
            "Pulse I/O: module not enabled in this build")


register_io_module("alsa", AlsaDevice)
register_io_module("oss", OssDevice)
register_io_module("jack", JackDevice)
register_io_module("pulse", PulseDevice)
