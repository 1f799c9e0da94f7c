"""Device dither (ops/device_dither.py) vs the host reference path."""

import numpy as np
import jax
import jax.numpy as jnp

from brutefir_tpu.core.dither import DitherTable
from brutefir_tpu.core.codecs import Overflow
from brutefir_tpu.core.sampleformat import parse_sample_format
from brutefir_tpu.ops.device_dither import dither_window, dither_quantize


def _host_states(n_ch, rate=44100, maxsize=0, block=256):
    t = DitherTable(n_ch, rate, maxsize, block)
    return t, [t.new_state(c) for c in range(n_ch)]


def test_dither_window_matches_host_incl_wrap():
    """Device window extraction replicates the host pointer/wrap logic
    (dither.h:28-38) byte for byte, across many blocks and a table wrap."""
    n_ch, n = 3, 64
    rate = 8000
    t, states = _host_states(n_ch, rate=rate, block=n)
    tab = jnp.asarray(t.tab)
    rm = jnp.asarray(t.randmap)
    ptr = jnp.asarray([s.randtab_ptr for s in states], jnp.int32)
    last = jnp.asarray([int(t.tab[s.randtab_ptr - 1]) for s in states],
                       jnp.int32)
    n_blocks = (t.spacing // n) + 4       # crosses the per-channel region
    for b in range(n_blocks):
        host = np.stack([s._next_window(n) for s in states])
        dev, ptr, last = dither_window(tab, rm, ptr, last, n, t.size)
        np.testing.assert_array_equal(np.asarray(dev), host,
                                      err_msg=f"block {b}")


def test_dither_quantize_small_amplitude_bitexact():
    """At small amplitudes the parallel mod-1 form matches the host f32
    recurrence exactly (no f32 rounding in the host's 'real')."""
    rng = np.random.default_rng(5)
    n_ch, n = 2, 512
    fmt = parse_sample_format("S16_LE")
    t, states = _host_states(n_ch, block=n)
    x = (rng.standard_normal((n_ch, n)) * 12.0).astype(np.float32)
    d = np.stack([s._next_window(n) for s in states])
    sf0 = np.zeros((n_ch, 2), np.float32)
    ovf = Overflow(max=float(fmt.imax))
    host = np.stack([
        states[c]._quantize_py(x[c], d[c], fmt, ovf) for c in range(n_ch)])
    s, sf, meters = dither_quantize(jnp.asarray(x), jnp.asarray(d),
                                    jnp.asarray(sf0), fmt.imin, fmt.imax)
    np.testing.assert_array_equal(np.asarray(s), host)
    np.testing.assert_allclose(np.asarray(sf)[:, 0],
                               [st.sf[0] for st in states], atol=1e-5)
    assert float(np.asarray(meters)[:, 0].sum()) == 0


def test_dither_quantize_large_amplitude_statistics():
    """At large amplitudes the host f32 recurrence rounds on a coarse
    grid; outputs agree within +-2 LSB, unbiased, same noise shaping."""
    rng = np.random.default_rng(6)
    n_ch, n = 1, 4096
    fmt = parse_sample_format("S24_LE")
    t, states = _host_states(n_ch, block=n)
    x = (rng.standard_normal((n_ch, n)) * 2 ** 20).astype(np.float32)
    d = np.stack([s._next_window(n) for s in states])
    ovf = Overflow(max=float(fmt.imax))
    host = np.stack([
        states[c]._quantize_py(x[c], d[c], fmt, ovf) for c in range(n_ch)])
    s, sf, _ = dither_quantize(jnp.asarray(x), jnp.asarray(d),
                               jnp.zeros((n_ch, 2), jnp.float32),
                               fmt.imin, fmt.imax)
    diff = np.asarray(s).astype(np.int64) - host
    assert np.abs(diff).max() <= 2
    assert abs(diff.mean()) < 0.05
    # error feedback must high-pass the quantization error
    err = np.asarray(s)[0] - x[0].astype(np.float64)
    F = np.abs(np.fft.rfft(err - err.mean())) ** 2
    half = len(F) // 2
    assert F[half:].mean() > 4 * F[:half].mean()


def test_dither_quantize_feedback_continuity_across_blocks():
    """Block-boundary sf carry: quantizing 2 blocks separately equals
    quantizing the concatenation (both in the parallel form)."""
    rng = np.random.default_rng(7)
    n = 384
    fmt = parse_sample_format("S16_LE")
    t, states = _host_states(1, block=2 * n)
    x = (rng.standard_normal((1, 2 * n)) * 3000).astype(np.float32)
    d = states[0]._next_window(2 * n)[None]
    sf0 = jnp.zeros((1, 2), jnp.float32)
    s_all, _, _ = dither_quantize(jnp.asarray(x), jnp.asarray(d), sf0,
                                  fmt.imin, fmt.imax)
    s1, sf1, _ = dither_quantize(jnp.asarray(x[:, :n]),
                                 jnp.asarray(d[:, :n]), sf0,
                                 fmt.imin, fmt.imax)
    s2, _, _ = dither_quantize(jnp.asarray(x[:, n:]),
                               jnp.asarray(d[:, n:]), sf1,
                               fmt.imin, fmt.imax)
    np.testing.assert_array_equal(
        np.asarray(jnp.concatenate([s1, s2], axis=1)), np.asarray(s_all))


def test_dither_quantize_clipping_counts():
    fmt = parse_sample_format("S16_LE")
    x = np.array([[40000.0, -40000.0, 100.0, 32767.4]], np.float32)
    d = np.array([[0.5, 0.5, 0.5, 0.9]], np.float32)
    s, sf, meters = dither_quantize(jnp.asarray(x), jnp.asarray(d),
                                    jnp.zeros((1, 2), jnp.float32),
                                    fmt.imin, fmt.imax)
    s = np.asarray(s)[0]
    assert s[0] == fmt.imax and s[1] == fmt.imin
    assert float(np.asarray(meters)[0, 0]) >= 2
    assert abs(int(s[2]) - 100) <= 1


def test_engine_dio_dither_matches_host_path(tmp_path):
    """A dithered S16 output is now device-IO eligible; the device
    pipeline's output must match the host codec path within the f32
    recurrence's rounding (same Tausworthe dither sequence)."""
    from brutefir_tpu.config import parse_config
    from brutefir_tpu.runtime import Engine

    rng = np.random.default_rng(11)
    N, B, C = 256, 2, 2
    taps = (rng.standard_normal(N) * 0.015).astype(np.float32)
    tap_file = tmp_path / "t.txt"
    tap_file.write_text("\n".join(repr(float(v)) for v in taps))
    x = np.clip((rng.standard_normal((N * 6, C)) * 8000).round(),
                -32768, 32767).astype("<i2")
    inp = tmp_path / "in.raw"
    x.tofile(inp)
    outs = {}
    for mode in ("dio", "host"):
        outp = tmp_path / f"out_{mode}.raw"
        conf = parse_config(f"""
sampling_rate: 44100;
filter_length: {N},{B};
coeff 0 {{ filename: "{tap_file}"; format: "TEXT"; }};
input 0,1 {{ device: "file" {{ path: "{inp}"; }}; sample: "S16_LE"; channels: {C}; }};
output 0,1 {{ device: "file" {{ path: "{outp}"; }}; sample: "S16_LE"; channels: {C}; dither: true; }};
filter 0 {{ from_inputs: 0; to_outputs: 0; coeff: 0; }};
filter 1 {{ from_inputs: 1; to_outputs: 1; coeff: 0; }};
""")
        eng = Engine(conf)
        if mode == "dio":
            assert eng.dio is not None, "dithered S16 must be dio-eligible"
            assert eng.dio.dstate, "dither state missing"
        else:
            eng.dio = None
        eng.run()
        outs[mode] = np.fromfile(outp, dtype="<i2")
    assert outs["dio"].shape == outs["host"].shape
    diff = outs["dio"].astype(np.int64) - outs["host"].astype(np.int64)
    assert np.abs(diff).max() <= 2
    # identical dither sequence + recurrence: overwhelmingly bit-equal
    assert np.mean(diff == 0) > 0.95


def test_overflow_counts_on_prefloor_value():
    """t in (imax, imax+1) floors to imax but must still count as an
    overflow (host 'dithered > rmax' semantics)."""
    fmt = parse_sample_format("S16_LE")
    x = np.array([[32766.8, 100.0]], np.float32)
    d = np.array([[0.5, 0.5]], np.float32)   # t[0] = 32767.3 > imax
    s, sf, meters = dither_quantize(jnp.asarray(x), jnp.asarray(d),
                                    jnp.zeros((1, 2), jnp.float32),
                                    fmt.imin, fmt.imax)
    assert int(np.asarray(s)[0, 0]) == fmt.imax
    assert float(np.asarray(meters)[0, 0]) == 1.0


def test_warmup_preserves_dither_state(tmp_path):
    """Program warmup must not advance the persistent dither pointers
    (the sequence's start offset is part of the bit-exact contract)."""
    from brutefir_tpu.config import parse_config
    from brutefir_tpu.runtime import Engine

    x = np.zeros((512, 1), "<i2")
    inp = tmp_path / "in.raw"
    x.tofile(inp)
    conf = parse_config(f"""
sampling_rate: 44100;
filter_length: 256,2;
coeff 0 {{ filename: "dirac pulse"; }};
input 0 {{ device: "file" {{ path: "{inp}"; }}; sample: "S16_LE"; channels: 1; }};
output 0 {{ device: "file" {{ path: "{tmp_path / 'o.raw'}"; }}; sample: "S16_LE"; channels: 1; dither: true; }};
filter 0 {{ from_inputs: 0; to_outputs: 0; coeff: 0; }};
""")
    eng = Engine(conf)
    assert eng.dio is not None and eng.dio.dstate
    ptr_before = np.asarray(eng.dio.dstate["ptr"]).copy()
    sf_before = np.asarray(eng.dio.dstate["sf"]).copy()
    eng.setup()
    eng._warm_programs()
    np.testing.assert_array_equal(np.asarray(eng.dio.dstate["ptr"]),
                                  ptr_before)
    np.testing.assert_array_equal(np.asarray(eng.dio.dstate["sf"]),
                                  sf_before)
