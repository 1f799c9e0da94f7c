"""Regression tests for the round-3 runtime review findings.

Each test pins a behavior that was wrong before the fix: the
run_offline max_blocks tail, input-mute delay-state semantics, the
subdelay compensating delay's headroom past maxdelay, and the freqd-tap
warmup gate.
"""

import numpy as np

from brutefir_tpu.config import parse_config
from brutefir_tpu.runtime import Engine


def _conf(tmp_path, rng, n_samples, extra_io="", pre="", N=64, B=2,
          in_ch=1):
    x = (rng.standard_normal((n_samples, in_ch)) * 0.1).astype("<f4")
    inp, outp = tmp_path / "in.f32", tmp_path / "out.f32"
    x.tofile(inp)
    chans = ",".join(str(i) for i in range(in_ch))
    conf = parse_config(f"""
sampling_rate: 44100;
filter_length: {N},{B};
{pre}
coeff 0 {{ filename: "dirac pulse"; }};
input {chans} {{ device: "file" {{ path: "{inp}"; }}; sample: "FLOAT_LE"; channels: {in_ch}; {extra_io} }};
output {chans} {{ device: "file" {{ path: "{outp}"; }}; sample: "FLOAT_LE"; channels: {in_ch}; }};
""" + "\n".join(
        f"filter {i} {{ from_inputs: {i}; to_outputs: {i}; coeff: 0; }};"
        for i in range(in_ch)))
    return conf, x, outp


def test_run_offline_max_blocks_smaller_than_batch(tmp_path, rng):
    """max_blocks < batch_blocks must process exactly max_blocks blocks,
    not zero (the old gate broke before dispatching anything)."""
    N = 64
    conf, x, outp = _conf(tmp_path, rng, N * 16)
    eng = Engine(conf)
    stats = eng.run_offline(max_blocks=3, batch_blocks=8)
    assert stats["blocks"] == 3
    y = np.fromfile(outp, dtype="<f4")
    assert y.size == 3 * N
    np.testing.assert_allclose(y, x[: 3 * N, 0], rtol=0, atol=1e-5)


def test_run_offline_max_blocks_partial_tail(tmp_path, rng):
    """max_blocks not a batch multiple: the tail past the last full
    batch is processed per-block, not dropped."""
    N = 64
    conf, x, outp = _conf(tmp_path, rng, N * 16)
    eng = Engine(conf)
    stats = eng.run_offline(max_blocks=7, batch_blocks=4)
    assert stats["blocks"] == 7
    y = np.fromfile(outp, dtype="<f4")
    assert y.size == 7 * N
    np.testing.assert_allclose(y, x[: 7 * N, 0], rtol=0, atol=1e-5)


def test_input_mute_advances_delay_state(tmp_path, rng):
    """A muted input feeds zeros THROUGH the delay line (dai.c:255-300
    semantics): unmuting yields `delay` samples of silence then live
    audio -- never a replay of stale pre-mute samples."""
    N, B, D = 64, 2, 48
    conf, x, outp = _conf(tmp_path, rng, N * 8,
                          extra_io=f"delay: {D}; maxdelay: {D};")
    eng = Engine(conf)
    eng.setup()
    outs = []
    for k in range(8):
        if k == 2:
            with eng.control_mutex:
                eng.control.set_mute(0, 0, True)
        if k == 5:
            with eng.control_mutex:
                eng.control.set_mute(0, 0, False)
        xb, f = eng.read_block()
        outs.append(xb[0].copy())
    eng.teardown()
    got = np.concatenate(outs)
    # expected: the wire signal with mute applied BEFORE a D-sample delay
    wire = x[: N * 8, 0].copy()
    wire[2 * N: 5 * N] = 0.0
    exp = np.concatenate([np.zeros(D, np.float32), wire])[: N * 8]
    np.testing.assert_allclose(got, exp, rtol=0, atol=1e-6)


def test_subdelay_extra_extends_past_maxdelay(tmp_path, rng):
    """The compensating subdelay integer delay extends the delay-line
    capacity past the user maxdelay (bfrun.c:1152-1162): a channel at
    delay == maxdelay stays time-aligned (delay + sdf/2 + ...)."""
    N, B = 64, 2
    D = 32
    conf, x, outp = _conf(
        tmp_path, rng, N * 8, in_ch=2,
        pre="sdf_length: 15;",
        extra_io=(f"delay: {D}, {D}; maxdelay: {D}; "
                  "subdelay: -100, 5;"))
    eng = Engine(conf)
    assert eng.subdelay is not None
    extra = eng.subdelay.extra_delay(0, 0)   # undefined-subdelay channel
    assert extra > 0
    dl = eng.dlines[0][0]
    # capacity must admit delay + extra (the old clamp cut it to D)
    assert dl.delay == D + extra
    dl.set_delay(D + extra)                  # runtime re-set must stick
    assert dl.delay == D + extra


def test_freqd_tap_warming_gate(tmp_path, rng):
    """During _warm_programs the freqd taps pass planes through without
    calling module hooks (hooks must not observe the warmup block)."""
    conf, x, outp = _conf(tmp_path, rng, 64 * 4)
    eng = Engine(conf)
    calls = []

    def hook(row, ch):
        calls.append(ch)

    tap = eng._make_freqd_tap([hook])
    planes = np.zeros((1, 2, 64), np.float32)
    eng._warming = True
    out = tap(planes, np.asarray([0]))
    assert calls == []
    np.testing.assert_array_equal(out, planes)
    eng._warming = False
    tap(planes, np.asarray([0]))
    assert calls == [0]
