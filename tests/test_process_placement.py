"""Manual `filter { process: N; }` placement (VERDICT r3 item 5).

The reference pins filters to forked CPU processes (bfconf.c:1024-1036) and
validates that connected filters and mixed outputs stay within one process
(bfconf.c:2893-2931). The rebuild honors pins as grouped shard assignment on
the mesh's 'f' axis: the engine permutes the filter rows so each process
group occupies its own contiguous shard chunk (padding with inert rows when
group sizes differ), and the config-order control plane is translated
through the row map.
"""

import numpy as np
import pytest
import jax

from brutefir_tpu.config import parse_config
from brutefir_tpu.config.parser import ConfigParseError

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def _cfg(tmp_path, rng, filters, C=4, N=128, B=2, n_taps=None, seed_tag=""):
    """Config text with per-channel random coeffs and file IO."""
    n_taps = n_taps or N * B
    coeffs = []
    tapsets = []
    for i in range(C):
        taps = (rng.standard_normal(n_taps) * 0.1).astype(np.float32)
        tapsets.append(taps)
        tf = tmp_path / f"t{seed_tag}{i}.txt"
        tf.write_text("\n".join(repr(float(v)) for v in taps))
        coeffs.append(f'coeff {i} {{ filename: "{tf}"; format: "TEXT"; }};')
    x = rng.standard_normal((C, N * 6)).astype(np.float32) * 0.5
    inp = tmp_path / f"in{seed_tag}.f32"
    outp = tmp_path / f"out{seed_tag}.f32"
    np.ascontiguousarray(x.T.astype("<f4")).tofile(inp)
    chans = ",".join(str(i) for i in range(C))
    text = f"""
sampling_rate: 44100;
filter_length: {N},{B};
{chr(10).join(coeffs)}
input {chans} {{ device: "file" {{ path: "{inp}"; }}; sample: "FLOAT_LE"; channels: {C}; }};
output {chans} {{ device: "file" {{ path: "{outp}"; }}; sample: "FLOAT_LE"; channels: {C}; }};
{filters}
"""
    return text, x, tapsets, outp


def _filters(C, procs):
    return "\n".join(
        f"filter {i} {{ from_inputs: {i}; to_outputs: {i}; coeff: {i}; "
        f"process: {procs[i]}; }};"
        for i in range(C))


def test_parser_rejects_cross_process_connection(tmp_path, rng):
    """Connected filters must share a process (bfconf.c:2906-2914)."""
    text, _, _, _ = _cfg(tmp_path, rng, f"""
filter 0 {{ from_inputs: 0; to_filters: 1; coeff: 0; process: 0; }};
filter 1 {{ from_filters: 0; to_outputs: 1; coeff: 1; process: 1; }};
""", C=2)
    with pytest.raises(ConfigParseError, match="Connected filters"):
        parse_config(text)


def test_parser_rejects_cross_process_output_mix(tmp_path, rng):
    """Mixed outputs must share a process (bfconf.c:2915-2926)."""
    text, _, _, _ = _cfg(tmp_path, rng, f"""
filter 0 {{ from_inputs: 0; to_outputs: 0; coeff: 0; process: 0; }};
filter 1 {{ from_inputs: 1; to_outputs: 0/-6; coeff: 1; process: 1; }};
""", C=2)
    with pytest.raises(ConfigParseError, match="Mixed outputs"):
        parse_config(text)


def test_parser_rejects_mixed_manual_auto(tmp_path, rng):
    text, _, _, _ = _cfg(tmp_path, rng, f"""
filter 0 {{ from_inputs: 0; to_outputs: 0; coeff: 0; process: 0; }};
filter 1 {{ from_inputs: 1; to_outputs: 1; coeff: 1; }};
""", C=2)
    with pytest.raises(ConfigParseError, match="manual process"):
        parse_config(text)


def _run(text, mesh_env, monkeypatch):
    from brutefir_tpu.runtime import Engine
    monkeypatch.setenv("BRUTEFIR_TPU_MESH", mesh_env)
    conf = parse_config(text)
    conf.quiet = True
    eng = Engine(conf)
    eng.run()
    return eng


def test_pinned_filters_land_on_their_shards(tmp_path, rng, monkeypatch):
    """4 filters pinned 2+2: the 'f' axis becomes 2-way, each process
    group occupies one contiguous shard chunk, and the audio matches the
    single-device run exactly (identical program semantics)."""
    import scipy.signal
    C = 4
    procs = [0, 1, 0, 1]
    text, x, tapsets, outp = _cfg(tmp_path, rng, _filters(C, procs), C=C)

    eng = _run(text, "auto", monkeypatch)
    assert eng.mesh is not None and eng.mesh.shape["f"] == 2
    assert eng.spec_rows is not None
    # rows [0, gsize) hold process-0 filters, [gsize, 2*gsize) process-1
    f_n = eng.mesh.shape["f"]
    gsize = len(eng.spec_rows) // f_n
    for row, nf in enumerate(eng.spec_rows):
        if nf >= 0:
            assert procs[nf] % f_n == row // gsize
    # config -> row map is the inverse of spec_rows
    for nf, row in enumerate(eng.f2spec):
        assert eng.spec_rows[row] == nf
    y = np.fromfile(outp, dtype="<f4").reshape(-1, C).T

    for c in range(C):
        ref = scipy.signal.fftconvolve(x[c], tapsets[c])[: x.shape[1]]
        np.testing.assert_allclose(y[c], ref, rtol=0, atol=2e-3)

    # byte-identical to the unsharded engine (same program semantics)
    eng2 = _run(text, "off", monkeypatch)
    assert eng2.mesh is None and eng2.spec_rows is None
    y2 = np.fromfile(outp, dtype="<f4").reshape(-1, C).T
    np.testing.assert_allclose(y, y2, rtol=0, atol=1e-5)


def test_uneven_groups_pad_inert_rows(tmp_path, rng, monkeypatch):
    """3 filters on processes {0,0,1}: group sizes 2+1 pad to 2+2; the
    pad row is inert and the audio is right."""
    import scipy.signal
    C = 3
    procs = [0, 0, 1]
    text, x, tapsets, outp = _cfg(tmp_path, rng, _filters(C, procs), C=C)
    eng = _run(text, "auto", monkeypatch)
    assert eng.mesh is not None and eng.mesh.shape["f"] == 2
    assert len(eng.spec_rows) == 4 and eng.spec_rows.count(-1) == 1
    assert eng.spec.n_filters == 4
    y = np.fromfile(outp, dtype="<f4").reshape(-1, C).T
    for c in range(C):
        ref = scipy.signal.fftconvolve(x[c], tapsets[c])[: x.shape[1]]
        np.testing.assert_allclose(y[c], ref, rtol=0, atol=2e-3)


def test_cascade_within_process_under_placement(tmp_path, rng, monkeypatch):
    """from_filters cascade inside one process group: the fmix row/column
    translation through the row map keeps the cascade intact."""
    import scipy.signal
    N, B = 128, 2
    taps0 = (rng.standard_normal(N) * 0.1).astype(np.float32)
    taps1 = (rng.standard_normal(N) * 0.1).astype(np.float32)
    t0, t1 = tmp_path / "c0.txt", tmp_path / "c1.txt"
    t0.write_text("\n".join(repr(float(v)) for v in taps0))
    t1.write_text("\n".join(repr(float(v)) for v in taps1))
    x = rng.standard_normal((2, N * 6)).astype(np.float32) * 0.5
    inp, outp = tmp_path / "cin.f32", tmp_path / "cout.f32"
    np.ascontiguousarray(x.T.astype("<f4")).tofile(inp)
    text = f"""
sampling_rate: 44100;
filter_length: {N},{B};
coeff 0 {{ filename: "{t0}"; format: "TEXT"; }};
coeff 1 {{ filename: "{t1}"; format: "TEXT"; }};
input 0,1 {{ device: "file" {{ path: "{inp}"; }}; sample: "FLOAT_LE"; channels: 2; }};
output 0,1 {{ device: "file" {{ path: "{outp}"; }}; sample: "FLOAT_LE"; channels: 2; }};
filter 0 {{ from_inputs: 0; to_filters: 1; coeff: 0; process: 0; }};
filter 1 {{ from_filters: 0; to_outputs: 0; coeff: 1; process: 0; }};
filter 2 {{ from_inputs: 1; to_outputs: 1; coeff: 0; process: 1; }};
"""
    eng = _run(text, "auto", monkeypatch)
    assert eng.mesh is not None and eng.mesh.shape["f"] == 2
    y = np.fromfile(outp, dtype="<f4").reshape(-1, 2).T
    ref0 = scipy.signal.fftconvolve(
        scipy.signal.fftconvolve(x[0], taps0), taps1)[: x.shape[1]]
    ref1 = scipy.signal.fftconvolve(x[1], taps0)[: x.shape[1]]
    np.testing.assert_allclose(y[0], ref0, rtol=0, atol=2e-3)
    np.testing.assert_allclose(y[1], ref1, rtol=0, atol=2e-3)


def test_runtime_coeff_change_respects_row_map(tmp_path, rng, monkeypatch):
    """change_coeff speaks config filter indices; under placement the
    permuted row picks up the change (silence filter 0, keep others)."""
    from brutefir_tpu.runtime import Engine
    C = 3
    procs = [1, 0, 1]   # permuted order: rows != config order
    text, x, tapsets, outp = _cfg(tmp_path, rng, _filters(C, procs), C=C)
    monkeypatch.setenv("BRUTEFIR_TPU_MESH", "auto")
    conf = parse_config(text)
    conf.quiet = True
    eng = Engine(conf)
    assert eng.spec_rows is not None
    eng.control.change_coeff(0, -1)       # config filter 0 -> no coeff
    eng.run()
    import scipy.signal
    y = np.fromfile(outp, dtype="<f4").reshape(-1, C).T
    # filter 0 now passes through (dirac), others still convolve
    np.testing.assert_allclose(y[0], x[0], rtol=0, atol=2e-3)
    for c in (1, 2):
        ref = scipy.signal.fftconvolve(x[c], tapsets[c])[: x.shape[1]]
        np.testing.assert_allclose(y[c], ref, rtol=0, atol=2e-3)
