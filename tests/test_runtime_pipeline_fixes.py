"""Regression tests for the run_offline/producer pipeline review fixes:
exact max_blocks read budget, error-path thread+device cleanup, explicit
mesh abort, offline rti reporting."""

import threading
import time

import numpy as np
import pytest

from brutefir_tpu.config import parse_config
from brutefir_tpu.runtime import Engine


def _conf(tmp_path, inp, outp, n=128, b=2):
    return parse_config(f"""
sampling_rate: 44100;
filter_length: {n},{b};
coeff 0 {{ filename: "dirac pulse"; }};
input 0 {{ device: "file" {{ path: "{inp}"; }}; sample: "FLOAT_LE"; channels: 1; }};
output 0 {{ device: "file" {{ path: "{outp}"; }}; sample: "FLOAT_LE"; channels: 1; }};
filter 0 {{ from_inputs: 0; to_outputs: 0; coeff: 0; }};
""")


def test_run_offline_max_blocks_exact_read_budget(tmp_path, rng):
    """The batch producer must not prefetch past max_blocks: the drain
    would discard already-read samples, so a continued run on the same
    engine would skip audio."""
    N = 128
    x = (rng.standard_normal(N * 16) * 0.1).astype("<f4")
    inp, outp = tmp_path / "in.f32", tmp_path / "out.f32"
    x.tofile(inp)
    eng = Engine(_conf(tmp_path, inp, outp))
    assert eng.dio is not None
    eng.setup()
    eng.run_offline(max_blocks=4, batch_blocks=4, setup=False)
    # exactly 4 blocks read -- nothing prefetched and thrown away
    assert eng.devices[0][0].fh.tell() == 4 * N * 4
    # a continued run picks up the very next sample
    eng.run_offline(max_blocks=8, batch_blocks=4, setup=False)
    eng.teardown()
    y = np.fromfile(outp, dtype="<f4")
    assert len(y) == 8 * N
    np.testing.assert_allclose(y, x[:8 * N], rtol=0, atol=1e-5)


def test_run_offline_error_joins_threads_and_tears_down(tmp_path, rng):
    """A mid-loop dispatch error must stop the writer+producer threads
    and release the devices (like run()'s error path)."""
    N = 128
    x = (rng.standard_normal(N * 16) * 0.1).astype("<f4")
    inp, outp = tmp_path / "in.f32", tmp_path / "out.f32"
    x.tofile(inp)
    eng = Engine(_conf(tmp_path, inp, outp))
    assert eng.dio is not None

    def broken_multi_step(M, uniform=None, udelay=None, xfade=None):
        def mstep(*a, **k):
            raise RuntimeError("boom")
        return mstep

    eng.dio.multi_step = broken_multi_step
    before = set(threading.enumerate())
    with pytest.raises(RuntimeError, match="boom"):
        eng.run_offline(batch_blocks=4)
    # devices released despite the error (close() drops the handle)
    fh = eng.devices[0][0].fh
    assert fh is None or fh.closed
    # and no leaked pipeline threads (they join inside run_offline; allow
    # a moment for daemon threads to unwind)
    deadline = time.monotonic() + 5.0
    while time.monotonic() < deadline:
        leaked = [t for t in threading.enumerate()
                  if t not in before and t.is_alive()]
        if not leaked:
            break
        time.sleep(0.05)
    assert not leaked, f"leaked threads: {leaked}"


def test_explicit_mesh_env_backend_failure_aborts(tmp_path, monkeypatch):
    """BRUTEFIR_TPU_MESH=FxS with a failing device query must abort, not
    silently run single-device; auto mode may degrade."""
    import brutefir_tpu.parallel.mesh as mesh_mod

    def failing_auto_mesh(*a, **k):
        raise RuntimeError("no backend")

    monkeypatch.setattr(mesh_mod, "auto_mesh", failing_auto_mesh)
    conf = _conf(tmp_path, "/dev/zero", "/dev/null")
    monkeypatch.setenv("BRUTEFIR_TPU_MESH", "2x4")
    with pytest.raises(RuntimeError, match="no backend"):
        Engine(conf)
    monkeypatch.setenv("BRUTEFIR_TPU_MESH", "auto")
    eng = Engine(conf)   # auto probing degrades silently
    assert eng.mesh is None


def test_run_offline_reports_rti(tmp_path, rng):
    """Offline stats carry a real rti for this run, not a stale value."""
    N = 128
    x = (rng.standard_normal(N * 16) * 0.1).astype("<f4")
    inp, outp = tmp_path / "in.f32", tmp_path / "out.f32"
    x.tofile(inp)
    eng = Engine(_conf(tmp_path, inp, outp))
    assert eng.dio is not None
    stats = eng.run_offline(batch_blocks=4)
    assert stats["rti_max"] > 0.0
    assert eng.realtime_index > 0.0
