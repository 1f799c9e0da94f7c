"""Callback-clocked I/O bridge (io/callback.py) through a full engine run.

The reference's callback path (bfio_jack, SURVEY 3.3) hands the clock to
the I/O module; the engine rides a FIFO bridge. A synthetic callback
device simulates the sound card's period thread.
"""

import threading
import time

import numpy as np

from brutefir_tpu.config import parse_config
from brutefir_tpu.io import register_io_module
from brutefir_tpu.io.callback import CallbackDevice, _ByteFifo
from brutefir_tpu.runtime.engine import Engine

N = 256
K = 8
VALUE = 0.25


class _TestCallbackIn(CallbackDevice):
    uses_sample_clock = False   # keep the test out of SCHED_FIFO attempts

    def __init__(self, params, io, sample_format, sample_rate, open_channels):
        from brutefir_tpu.core.sampleformat import parse_sample_format
        # deep FIFO: the test feeder is unpaced (a real card delivers one
        # period at a time), so give it room for the whole signal
        super().__init__(params, io, parse_sample_format("FLOAT_NE"),
                         sample_rate, open_channels, periods=K + 2)

    def start(self):
        def feeder():
            block = np.full((N, self.open_channels), VALUE, np.float32)
            for _ in range(K):
                self.deliver_input(block.tobytes())
            self.stop_stream()       # hardware stream ends -> engine EOF

        threading.Thread(target=feeder, daemon=True).start()


class _TestCallbackOut(CallbackDevice):
    uses_sample_clock = False
    collected = b""
    done = False

    def __init__(self, params, io, sample_format, sample_rate, open_channels):
        from brutefir_tpu.core.sampleformat import parse_sample_format
        super().__init__(params, io, parse_sample_format("FLOAT_NE"), sample_rate,
                         open_channels)
        _TestCallbackOut.collected = b""
        _TestCallbackOut.done = False

    def start(self):
        def puller():
            chunk = N * self.open_channels * 4
            while not _TestCallbackOut.done:
                _TestCallbackOut.collected += self.fetch_output(chunk)
                time.sleep(0.001)

        self._pth = threading.Thread(target=puller, daemon=True)
        self._pth.start()

    def stop(self):
        # drain whatever the engine wrote after the last pull
        time.sleep(0.05)
        _TestCallbackOut.done = True
        self._pth.join(timeout=5.0)
        _TestCallbackOut.collected += self.fetch_output(
            self._fifo.capacity)
        super().stop_stream()


def test_callback_bridge_engine_run():
    register_io_module("testcb_in", _TestCallbackIn)
    register_io_module("testcb_out", _TestCallbackOut)
    conf = parse_config(f"""
sampling_rate: 44100;
filter_length: {N},2;
coeff 0 {{ filename: "dirac pulse"; }};
input 0 {{ device: "testcb_in" {{ }}; sample: "FLOAT_NE"; channels: 1; }};
output 0 {{ device: "testcb_out" {{ }}; sample: "FLOAT_NE"; channels: 1; dither: false; }};
filter 0 {{ from_inputs: 0; to_outputs: 0; coeff: 0; }};
""")
    eng = Engine(conf)
    stats = eng.run()
    assert stats["frames"] == K * N
    out = np.frombuffer(_TestCallbackOut.collected, np.float32)
    # dirac passthrough: every engine-produced sample is VALUE; anything
    # else in the pulled stream is underrun silence from the bridge
    vals = out[out != 0.0]
    assert len(vals) == K * N
    np.testing.assert_allclose(vals, VALUE, rtol=0, atol=1e-6)


def test_byte_fifo_overrun_drop_and_eof():
    f = _ByteFifo(8)
    assert f.push(b"abcdef", drop_oldest=True) == 0
    assert f.push(b"ghij", drop_oldest=True) == 2      # oldest 2 dropped
    data, short = f.pop(8, pad_zeros=True)
    assert data == b"cdefghij" and short == 0
    data, short = f.pop(4, pad_zeros=True)
    assert data == b"\0\0\0\0" and short == 4          # underrun zeros
    f.push(b"xy", drop_oldest=True)
    f.close()
    data, _ = f.pop(5)                                  # EOF: short read
    assert data == b"xy"


def test_setup_fires_synch_start_after_start(tmp_path):
    """Engine.setup must fire synch_start on every device after start()
    and the iodelay fill (dai.c:720/1178 — e.g. ALSA's linked
    snd_pcm_start); teardown fires synch_stop."""
    from brutefir_tpu.config import parse_config
    from brutefir_tpu.runtime.engine import Engine
    from brutefir_tpu.io import IoDevice, register_io_module

    calls = []

    class Synthetic(IoDevice):
        def init(self, period_size):
            calls.append("init")

        def start(self):
            calls.append("start")

        def synch_start(self):
            calls.append("synch_start")

        def synch_stop(self):
            calls.append("synch_stop")

        def read(self, nbytes):
            return b""

        def write(self, data):
            return len(data)

    register_io_module("synthsync", Synthetic)
    conf = parse_config(f"""
sampling_rate: 44100;
filter_length: 128,2;
coeff 0 {{ filename: "dirac pulse"; }};
input 0 {{ device: "synthsync" {{}}; sample: "S16_LE"; channels: 1; }};
output 0 {{ device: "file" {{ path: "{tmp_path / 'o.raw'}"; }}; sample: "S16_LE"; channels: 1; dither: false; }};
filter 0 {{ from_inputs: 0; to_outputs: 0; coeff: 0; }};
""")
    eng = Engine(conf)
    eng.setup()
    assert calls.index("start") < calls.index("synch_start")
    eng.teardown()
    assert "synch_stop" in calls


def test_bridge_drain_underrun_stress():
    """Round-3 stress (VERDICT r2 item 8): a fast callback clock against a
    slow engine writer. The bridge must never deadlock, count every
    underrun, zero-fill exactly the shortfall, and conserve every byte
    the engine wrote, in order."""
    import threading
    import time
    from brutefir_tpu.io.callback import CallbackDevice

    dev = CallbackDevice([], 1, None, 44100, 1, periods=2)
    from brutefir_tpu.core.sampleformat import parse_sample_format
    dev.sample_format = parse_sample_format("S16_LE")
    dev.init(64)                        # FIFO capacity 2 * 64 * 2 bytes

    pulled = bytearray()
    stop = threading.Event()

    def clock():                        # the "hardware" callback thread
        while not stop.is_set():
            pulled.extend(dev.fetch_output(64 * 2))
            time.sleep(0.0005)

    th = threading.Thread(target=clock, daemon=True)
    th.start()
    payload = bytes(range(1, 256)) * 64          # nonzero marker bytes
    expected = bytearray()
    for i in range(40):                          # slow, bursty writer
        chunk = payload[(i * 37) % 200: (i * 37) % 200 + 130]
        dev.write(chunk)
        expected += chunk
        if i % 7 == 0:
            time.sleep(0.004)                    # force underruns
    time.sleep(0.03)                             # let the clock drain
    stop.set()
    th.join(timeout=5.0)
    pulled.extend(dev.fetch_output(dev._fifo.capacity))
    data = bytes(pulled)
    # every written byte came out, in order, with zeros only in between
    nonzero = bytes(b for b in data if b != 0)
    assert nonzero == bytes(expected)            # conservation + order
    assert dev.underruns > 0                     # the stress really bit
    dev.close()


def test_bridge_stop_stream_wakes_blocked_writer():
    """stop_stream during a full-FIFO write must wake the engine thread
    promptly (the drain path of a dying callback client, dai.c teardown)."""
    import threading
    import time
    from brutefir_tpu.io.callback import CallbackDevice
    from brutefir_tpu.core.sampleformat import parse_sample_format

    dev = CallbackDevice([], 1, None, 44100, 1, periods=1)
    dev.sample_format = parse_sample_format("S16_LE")
    dev.init(32)                        # tiny FIFO: 64 bytes
    dev.write(b"\1" * 64)               # fill it

    done = threading.Event()

    def writer():
        dev.write(b"\2" * 64)           # blocks: no room
        done.set()

    th = threading.Thread(target=writer, daemon=True)
    th.start()
    time.sleep(0.1)
    assert not done.is_set()            # genuinely blocked
    dev.stop_stream()
    assert done.wait(timeout=2.0)       # woken promptly
    th.join(timeout=2.0)
    # post-stop reads report EOF (short read), ending the engine's drain
    data = dev.read(128)
    assert len(data) <= 64
