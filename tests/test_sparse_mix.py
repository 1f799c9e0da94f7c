"""Gather-scale channel mixes (spec.in_src/out_src fast path).

The reference's mixnscale unrolls the n_bufs=1 special case
(fftw_convfuns.h:7-501); the rebuild's analog detects the structure
statically (every filter <=1 input channel / every output <=1 filter)
and replaces the mix matmuls with a gather + per-row scale. Numerically
identical: the matmul rows have a single nonzero.
"""

import numpy as np
import pytest

from brutefir_tpu.config import parse_config
from brutefir_tpu.runtime import Engine


def _run(tmp_path, cfg_body, x, C, monkeypatch, sparse):
    inp, outp = tmp_path / "in.f32", tmp_path / "out.f32"
    np.ascontiguousarray(x.T.astype("<f4")).tofile(inp)
    chans = ",".join(str(i) for i in range(C))
    cfg = f"""
sampling_rate: 44100;
filter_length: 128,4;
input {chans} {{ device: "file" {{ path: "{inp}"; }}; sample: "FLOAT_LE"; channels: {C}; }};
output {chans} {{ device: "file" {{ path: "{outp}"; }}; sample: "FLOAT_LE"; channels: {C}; }};
{cfg_body}
"""
    monkeypatch.setenv("BRUTEFIR_TPU_SPARSE_MIX", "1" if sparse else "0")
    conf = parse_config(cfg)
    conf.quiet = True
    eng = Engine(conf)
    eng.run()
    y = np.fromfile(outp, dtype="<f4").reshape(-1, C).T
    return eng, y


def test_single_source_structure_detected(tmp_path, rng, monkeypatch):
    """Diagonal graph (the scale/massive shape): in_src and out_src are
    recorded and the sparse path reproduces the dense-mix output."""
    C = 4
    body = 'coeff 0 { filename: "dirac pulse"; };\n' + "\n".join(
        f"filter {i} {{ from_inputs: {i}/{3 + i}; to_outputs: {i}/-2; "
        f"coeff: 0; }};" for i in range(C))
    x = (rng.standard_normal((C, 128 * 6)) * 0.3).astype(np.float32)
    eng_s, y_s = _run(tmp_path, body, x, C, monkeypatch, sparse=True)
    assert eng_s.spec.in_src == tuple(range(C))
    assert eng_s.spec.out_src == tuple(range(C))
    eng_d, y_d = _run(tmp_path, body, x, C, monkeypatch, sparse=False)
    np.testing.assert_allclose(y_s, y_d, rtol=0, atol=1e-6)
    # attenuation really applied (not a passthrough accident)
    g = 10 ** (-(3.0) / 20) * 10 ** (2.0 / 20)
    np.testing.assert_allclose(y_s[0], x[0] * g, atol=1e-4)


def test_multi_input_filter_falls_back(tmp_path, rng, monkeypatch):
    """A filter mixing two input channels: in_src is None (general
    structure), output still correct."""
    C = 2
    body = """
coeff 0 { filename: "dirac pulse"; };
filter 0 { from_inputs: 0, 1; to_outputs: 0; coeff: 0; };
filter 1 { from_inputs: 1; to_outputs: 1; coeff: 0; };
"""
    x = (rng.standard_normal((C, 128 * 5)) * 0.2).astype(np.float32)
    eng, y = _run(tmp_path, body, x, C, monkeypatch, sparse=True)
    assert eng.spec.in_src is None
    assert eng.spec.out_src == (0, 1)
    np.testing.assert_allclose(y[0], x[0] + x[1], atol=1e-4)
    np.testing.assert_allclose(y[1], x[1], atol=1e-4)


def test_shared_output_falls_back(tmp_path, rng, monkeypatch):
    """Two filters mixing into one output: out_src is None, dense out-mix
    keeps the psum-style contraction."""
    C = 2
    body = """
coeff 0 { filename: "dirac pulse"; };
filter 0 { from_inputs: 0; to_outputs: 0; coeff: 0; };
filter 1 { from_inputs: 1; to_outputs: 0, 1; coeff: 0; };
"""
    x = (rng.standard_normal((C, 128 * 5)) * 0.2).astype(np.float32)
    eng, y = _run(tmp_path, body, x, C, monkeypatch, sparse=True)
    assert eng.spec.in_src == (0, 1)
    assert eng.spec.out_src is None
    np.testing.assert_allclose(y[0], x[0] + x[1], atol=1e-4)
    np.testing.assert_allclose(y[1], x[1], atol=1e-4)


def test_cascade_only_filter_zero_row(tmp_path, rng, monkeypatch):
    """A filter fed only by another filter (no input channels): its
    in_src slot is structurally zero-gained, so the gather path yields
    the same audio as the dense mix."""
    C = 1
    body = """
coeff 0 { filename: "dirac pulse"; };
filter 0 { from_inputs: 0; to_filters: 1; coeff: 0; };
filter 1 { from_filters: 0/6; to_outputs: 0; coeff: 0; };
"""
    x = (rng.standard_normal((C, 128 * 6)) * 0.2).astype(np.float32)
    eng_s, y_s = _run(tmp_path, body, x, C, monkeypatch, sparse=True)
    assert eng_s.spec.in_src == (0, 0)   # filter 1 has no channel inputs
    eng_d, y_d = _run(tmp_path, body, x, C, monkeypatch, sparse=False)
    np.testing.assert_allclose(y_s, y_d, rtol=0, atol=1e-6)
    np.testing.assert_allclose(y_s[0], x[0] * 10 ** (-6 / 20), atol=1e-3)
