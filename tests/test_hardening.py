"""Round-3 hardening contracts: typed exit codes, rti full-proc gating,
full debug-timeline dump."""

import numpy as np
import pytest

from brutefir_tpu.config import parse_config
from brutefir_tpu.errors import (BFError, BF_EXIT_OTHER, BF_EXIT_INVALID_INPUT,
                                 BF_EXIT_BUFFER_UNDERFLOW)
from brutefir_tpu.runtime import Engine
from brutefir_tpu.runtime.engine import EngineError
from brutefir_tpu.io import IoModuleError


def write_raw_float(path, x):
    np.asarray(x, dtype="<f4").T.tofile(path)


def _simple_conf(tmp_path, x, N=128, B=4, extra=""):
    inp, outp = tmp_path / "in.f32", tmp_path / "out.f32"
    write_raw_float(inp, x[None, :])
    return parse_config(f"""
sampling_rate: 44100;
filter_length: {N},{B};
{extra}
coeff 0 {{ filename: "dirac pulse"; }};
input 0 {{ device: "file" {{ path: "{inp}"; }}; sample: "FLOAT_LE"; channels: 1; }};
output 0 {{ device: "file" {{ path: "{outp}"; }}; sample: "FLOAT_LE"; channels: 1; }};
filter 0 {{ from_inputs: 0; to_outputs: 0; coeff: 0; }};
""")


def test_typed_exit_codes():
    """Exceptions carry BF_EXIT_* codes (bfmod.h:64-70) as attributes, not
    message substrings."""
    assert issubclass(EngineError, BFError)
    assert issubclass(IoModuleError, BFError)
    assert EngineError("x").exit_code == BF_EXIT_OTHER
    e = EngineError("NaN!", exit_code=BF_EXIT_INVALID_INPUT)
    assert e.exit_code == BF_EXIT_INVALID_INPUT
    e2 = IoModuleError("underflow", exit_code=BF_EXIT_BUFFER_UNDERFLOW)
    assert e2.exit_code == BF_EXIT_BUFFER_UNDERFLOW


def test_main_exit_code_uses_attribute(tmp_path, monkeypatch):
    """__main__ maps the typed attribute, with OTHER as the fallback."""
    from brutefir_tpu.__main__ import main
    import brutefir_tpu.runtime.engine as eng_mod

    x = np.zeros(256, np.float32)
    conf_text_path = tmp_path / "c.conf"
    inp, outp = tmp_path / "in.f32", tmp_path / "out.f32"
    write_raw_float(inp, x[None, :])
    conf_text_path.write_text(f"""
sampling_rate: 44100;
filter_length: 128;
coeff 0 {{ filename: "dirac pulse"; }};
input 0 {{ device: "file" {{ path: "{inp}"; }}; sample: "FLOAT_LE"; channels: 1; }};
output 0 {{ device: "file" {{ path: "{outp}"; }}; sample: "FLOAT_LE"; channels: 1; }};
filter 0 {{ from_inputs: 0; to_outputs: 0; coeff: 0; }};
""")

    def boom(self, *a, **k):
        raise EngineError("synthetic invalid signal",
                          exit_code=BF_EXIT_INVALID_INPUT)

    monkeypatch.setattr(eng_mod.Engine, "run", boom)
    monkeypatch.setattr(eng_mod.Engine, "run_offline", boom)
    rc = main(["-quiet", "-nodefault", str(conf_text_path)])
    assert rc == BF_EXIT_INVALID_INPUT


def test_rti_gated_on_ring_ramp(tmp_path):
    """rti is only counted once every filter has processed full length --
    after B+1 blocks of ramp (partial_proc, bfrun.c:1436-1445)."""
    N, B = 128, 4
    x = np.ones(N * 12, np.float32) * 0.1
    conf = _simple_conf(tmp_path, x, N, B)
    eng = Engine(conf)
    eng.setup()
    eng.attach_logic()
    eng.run(max_blocks=B, setup=False)        # within the ramp
    assert eng.realtime_index == 0.0
    assert eng._rti_max == 0.0
    eng.run(max_blocks=B + 3, setup=False)    # past the ramp
    assert eng.realtime_index > 0.0
    assert eng._rti_max > 0.0
    eng.teardown()


def test_rti_powersave_silence_resets_ramp(tmp_path):
    """Under powersave, silent input resets the full-proc ramp
    (bfrun.c:1721-1722): a silent stream never updates rti."""
    N, B = 128, 3
    x = np.zeros(N * 10, np.float32)
    conf = _simple_conf(tmp_path, x, N, B, extra="powersave: true;")
    eng = Engine(conf)
    eng.run()
    assert eng.realtime_index == 0.0
    assert eng._rti_max == 0.0


def test_debug_timeline_full_dump(tmp_path, capsys):
    """debug: true; dumps the whole event ring as per-stage sections with
    per-period call/ret lines (print_debug parity, bfrun.c:230-434)."""
    N, B = 128, 2
    nblocks = 6
    x = np.ones(N * nblocks, np.float32) * 0.1
    conf = _simple_conf(tmp_path, x, N, B, extra="debug: true;")
    eng = Engine(conf)
    eng.run()
    err = capsys.readouterr().err
    assert "input_process:" in err
    assert "filter_process:" in err
    assert "output_process:" in err
    # every period appears in the input section (full ring, not last-64)
    for blk in range(nblocks):
        assert f"period {blk}:" in err
    assert "call read" in err and "call dispatch" in err
    assert "call write" in err


def test_batch_safe_property(tmp_path):
    """FileDevice.batch_safe: regular files and null-likes are storage
    (batchable); FIFOs/pipes have a live peer and are not."""
    import os
    from brutefir_tpu.io.file_module import FileDevice
    from brutefir_tpu.io import IN, OUT
    from brutefir_tpu.core.sampleformat import parse_sample_format
    from brutefir_tpu.config.lexer import tokenize

    fmt = parse_sample_format("FLOAT_LE")

    def dev(path, io):
        toks = [t for t in tokenize(f'path: "{path}";') if t.kind.name != "EOF"]
        return FileDevice(toks, io, fmt, 44100, [0])

    reg = tmp_path / "a.f32"
    reg.write_bytes(b"\0" * 16)
    assert dev(reg, IN).batch_safe
    assert dev(tmp_path / "new-out.f32", OUT).batch_safe   # created by init
    assert not dev(tmp_path / "missing-in.f32", IN).batch_safe
    assert dev("/dev/null", OUT).batch_safe
    assert dev("/dev/zero", IN).batch_safe
    fifo = tmp_path / "pipe"
    os.mkfifo(fifo)
    assert not dev(fifo, IN).batch_safe
    assert not dev(fifo, OUT).batch_safe


def test_main_dispatch_keeps_per_block_for_fifo(tmp_path, monkeypatch):
    """The CLI routes clockless runs to run_offline only when every file
    endpoint is storage: a FIFO input keeps the per-block pipeline (no
    batch_blocks*N latency added to a live pipe)."""
    import os
    from brutefir_tpu.__main__ import main
    import brutefir_tpu.runtime.engine as eng_mod

    called = []

    def fake_run(self, *a, **k):
        called.append("run")
        return {"blocks": 0, "frames": 0, "xrt": 0.0}

    def fake_run_offline(self, *a, **k):
        called.append("run_offline")
        return {"blocks": 0, "frames": 0, "xrt": 0.0}

    monkeypatch.setattr(eng_mod.Engine, "run", fake_run)
    monkeypatch.setattr(eng_mod.Engine, "run_offline", fake_run_offline)

    def conf_for(in_path):
        p = tmp_path / "c.conf"
        p.write_text(f"""
sampling_rate: 44100;
filter_length: 128;
coeff 0 {{ filename: "dirac pulse"; }};
input 0 {{ device: "file" {{ path: "{in_path}"; }}; sample: "FLOAT_LE"; channels: 1; }};
output 0 {{ device: "file" {{ path: "{tmp_path / 'out.f32'}"; }}; sample: "FLOAT_LE"; channels: 1; }};
filter 0 {{ from_inputs: 0; to_outputs: 0; coeff: 0; }};
""")
        return p

    reg = tmp_path / "in.f32"
    write_raw_float(reg, np.zeros((1, 256), np.float32))
    assert main(["-quiet", "-nodefault", str(conf_for(reg))]) == 0
    assert called == ["run_offline"]

    called.clear()
    fifo = tmp_path / "in.fifo"
    os.mkfifo(fifo)
    # hold a writer open so the engine's blocking open("rb") returns
    wfd = os.open(fifo, os.O_RDWR)
    try:
        assert main(["-quiet", "-nodefault", str(conf_for(fifo))]) == 0
    finally:
        os.close(wfd)
    assert called == ["run"]


def test_input_silent_honors_virtscale(tmp_path):
    """The host-path analog-powersave gate matches the compiled gate
    (control.py: scale * max|x| < analog, i.e. ps_thresh = analog/scale):
    a channel whose format scale amplifies must NOT count as silent just
    because its raw peak is under the threshold."""
    N, B = 128, 2
    x = np.zeros(N * 4, np.float32)
    conf = _simple_conf(tmp_path, x, N, B,
                        extra="powersave: -20;")  # 10^(-20/20) = 0.1
    eng = Engine(conf)
    assert eng.conf.analog_powersave == pytest.approx(0.1)
    blk = np.full((1, N), 0.05, np.float32)
    assert eng._input_silent(blk)                # scale 1: 0.05 < 0.1
    eng.control.virtscale[0][0] = 4.0            # scaled peak 0.2 > 0.1
    assert not eng._input_silent(blk)
    eng.control.virtscale[0][0] = 1.0
    assert eng._input_silent(np.zeros((1, N), np.float32))
