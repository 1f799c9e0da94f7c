"""Partitioned overlap-save correctness vs direct convolution oracles."""

import numpy as np
import pytest
import scipy.signal

import jax.numpy as jnp

from brutefir_tpu.ops import partconv
from brutefir_tpu.ops.partconv import make_bank
from brutefir_tpu.graph import build_graph_spec, CompiledGraph, make_ctrl


def run_blocks(cg, ctrl, bank, x_blocks):
    state = cg.init_state()
    outs = []
    for xb in x_blocks:
        state, y = cg.step(state, ctrl, bank, jnp.asarray(xb))
        outs.append(np.asarray(y))
    return np.concatenate(outs, axis=-1)


def simple_ctrl(spec, n_coeffs, coeff=0, delay=0, mask_blocks=None):
    F, B = spec.n_filters, spec.n_blocks
    in_mix = np.eye(F, spec.n_inputs, dtype=np.float32)
    fmix = np.zeros((F, F), np.float32)
    out_mix = np.eye(spec.n_outputs, F, dtype=np.float32)
    d = np.full(F, delay, np.int32)
    cb = B - delay if mask_blocks is None else min(mask_blocks, B - delay)
    mask = (np.arange(B)[None, :] < cb).astype(np.float32).repeat(F, 0)
    cidx = np.full(F, coeff, np.int32)
    return make_ctrl(spec, in_mix, fmix, out_mix, d, cidx, mask)


@pytest.mark.parametrize("N,B", [(64, 1), (64, 4), (128, 8), (32, 16)])
def test_partitioned_equals_direct(N, B, rng):
    taps = rng.standard_normal(N * B).astype(np.float32) * 0.1
    x = rng.standard_normal(N * (B + 3)).astype(np.float32)

    spec = build_graph_spec(N, B, 1, 1, [[]], [False])
    bank = make_bank([partconv.preprocess_coeffs(taps, N, B)])
    cg = CompiledGraph(spec)
    ctrl = simple_ctrl(spec, 1)
    y = run_blocks(cg, ctrl, jnp.asarray(bank), x.reshape(-1, 1, N))

    ref = scipy.signal.fftconvolve(x, taps)[: len(x)]
    np.testing.assert_allclose(y[0], ref, rtol=0, atol=5e-4 * np.abs(ref).max())


def test_partitioned_equals_single_partition(rng):
    """filter_length N,B must equal filter_length N*B,1 (reference invariant)."""
    N, B = 32, 8
    taps = rng.standard_normal(N * B).astype(np.float32) * 0.1
    x = rng.standard_normal(N * B * 2).astype(np.float32)

    spec_m = build_graph_spec(N, B, 1, 1, [[]], [False])
    bank_m = make_bank([partconv.preprocess_coeffs(taps, N, B)])
    y_m = run_blocks(CompiledGraph(spec_m), simple_ctrl(spec_m, 1),
                     jnp.asarray(bank_m), x.reshape(-1, 1, N))

    spec_1 = build_graph_spec(N * B, 1, 1, 1, [[]], [False])
    bank_1 = make_bank([partconv.preprocess_coeffs(taps, N * B, 1)])
    y_1 = run_blocks(CompiledGraph(spec_1), simple_ctrl(spec_1, 1),
                     jnp.asarray(bank_1), x.reshape(-1, 1, N * B))

    np.testing.assert_allclose(y_m[0], y_1[0], rtol=0, atol=2e-4)


def test_dirac_is_passthrough(rng):
    N, B = 64, 4
    x = rng.standard_normal(N * 6).astype(np.float32)
    spec = build_graph_spec(N, B, 1, 1, [[]], [False])
    bank = make_bank([partconv.dirac_bank_entry(N, B)])
    y = run_blocks(CompiledGraph(spec), simple_ctrl(spec, 1),
                   jnp.asarray(bank), x.reshape(-1, 1, N))
    np.testing.assert_allclose(y[0], x, rtol=0, atol=1e-4 * np.abs(x).max())


def test_filter_predelay_blocks(rng):
    """filter { delay: d; } delays output by d*N samples (bfrun.c:1600)."""
    N, B, d = 32, 8, 2
    taps = rng.standard_normal(N).astype(np.float32)
    x = rng.standard_normal(N * 8).astype(np.float32)
    spec = build_graph_spec(N, B, 1, 1, [[]], [False])
    bank = make_bank([partconv.preprocess_coeffs(taps, N, B)])
    ctrl = simple_ctrl(spec, 1, delay=d, mask_blocks=1)
    y = run_blocks(CompiledGraph(spec), ctrl, jnp.asarray(bank),
                   x.reshape(-1, 1, N))
    ref = scipy.signal.fftconvolve(x, taps)[: len(x)]
    shifted = np.concatenate([np.zeros(d * N, np.float32), ref[: len(x) - d * N]])
    np.testing.assert_allclose(y[0], shifted, rtol=0, atol=5e-4)


def test_mix_matrix_crosstalk(rng):
    """2x2 crosstalk graph (xtc_config shape): y_L = d*x_L + c*x_R etc."""
    N, B = 64, 2
    d_taps = rng.standard_normal(N * B).astype(np.float32) * 0.2
    c_taps = rng.standard_normal(N * B).astype(np.float32) * 0.2
    xL = rng.standard_normal(N * 5).astype(np.float32)
    xR = rng.standard_normal(N * 5).astype(np.float32)

    # 4 filters: Ld, Lc, Rd, Rc  (direct/cross per side)
    spec = build_graph_spec(N, B, 2, 2, [[], [], [], []], [False] * 4)
    bank = make_bank([
        partconv.preprocess_coeffs(d_taps, N, B),
        partconv.preprocess_coeffs(c_taps, N, B),
    ])
    in_mix = np.array([[1, 0], [0, 1], [0, 1], [1, 0]], np.float32)
    out_mix = np.array([[1, 1, 0, 0], [0, 0, 1, 1]], np.float32)
    ctrl = make_ctrl(
        spec, in_mix, np.zeros((4, 4), np.float32), out_mix,
        np.zeros(4, np.int32), np.array([0, 1, 0, 1], np.int32),
        np.ones((4, B), np.float32))
    x = np.stack([xL, xR]).reshape(2, -1, N).transpose(1, 0, 2)
    y = run_blocks(CompiledGraph(spec), ctrl, jnp.asarray(bank), x)

    refL = (scipy.signal.fftconvolve(xL, d_taps) + scipy.signal.fftconvolve(xR, c_taps))[: len(xL)]
    refR = (scipy.signal.fftconvolve(xR, d_taps) + scipy.signal.fftconvolve(xL, c_taps))[: len(xR)]
    np.testing.assert_allclose(y[0], refL, rtol=0, atol=1e-3)
    np.testing.assert_allclose(y[1], refR, rtol=0, atol=1e-3)


def test_cascade_matches_sequential_convolution(rng):
    """filter->filter edge == convolving with both IRs in sequence."""
    N, B = 64, 2
    t1 = rng.standard_normal(N * B).astype(np.float32) * 0.3
    t2 = rng.standard_normal(N * B).astype(np.float32) * 0.3
    x = rng.standard_normal(N * 8).astype(np.float32)

    # filter 0: input -> filter 1; filter 1: -> output
    spec = build_graph_spec(N, B, 1, 1, [[], [0]], [False, False])
    bank = make_bank([
        partconv.preprocess_coeffs(t1, N, B),
        partconv.preprocess_coeffs(t2, N, B),
    ])
    in_mix = np.array([[1.0], [0.0]], np.float32)
    fmix = np.array([[0, 0], [1, 0]], np.float32)
    out_mix = np.array([[0.0, 1.0]], np.float32)
    ctrl = make_ctrl(spec, in_mix, fmix, out_mix,
                     np.zeros(2, np.int32), np.array([0, 1], np.int32),
                     np.ones((2, B), np.float32))
    y = run_blocks(CompiledGraph(spec), ctrl, jnp.asarray(bank),
                   x.reshape(-1, 1, N))
    ref = scipy.signal.fftconvolve(scipy.signal.fftconvolve(x, t1)[: len(x)], t2)[: len(x)]
    np.testing.assert_allclose(y[0], ref, rtol=0, atol=2e-3)


def test_crossfade_ramp(rng):
    """Coefficient swap with crossfade ramps linearly old->new over one block."""
    N, B = 64, 2
    t_old = rng.standard_normal(N).astype(np.float32) * 0.2
    t_new = rng.standard_normal(N).astype(np.float32) * 0.2
    x = rng.standard_normal(N * 6).astype(np.float32)

    spec = build_graph_spec(N, B, 1, 1, [[]], [True])
    bank = make_bank([
        partconv.preprocess_coeffs(t_old, N, B),
        partconv.preprocess_coeffs(t_new, N, B),
    ])
    cg = CompiledGraph(spec)
    blocks = x.reshape(-1, 1, N)
    swap_at = 3

    state = cg.init_state()
    outs = []
    for k, xb in enumerate(blocks):
        if k < swap_at:
            ctrl = simple_ctrl(spec, 2, coeff=0)
        elif k == swap_at:
            ctrl = make_ctrl(
                spec, np.eye(1, 1, dtype=np.float32), np.zeros((1, 1), np.float32),
                np.eye(1, 1, dtype=np.float32), np.zeros(1, np.int32),
                np.array([1], np.int32), np.ones((1, B), np.float32),
                prev_idx=np.array([0], np.int32),
                prev_mask=np.ones((1, B), np.float32),
                xfade=np.ones(1, np.float32))
        else:
            ctrl = simple_ctrl(spec, 2, coeff=1)
        state, y = cg.step(state, ctrl, jnp.asarray(bank), jnp.asarray(xb))
        outs.append(np.asarray(y)[0])
    y = np.concatenate(outs)

    ref_old = scipy.signal.fftconvolve(x, t_old)[: len(x)]
    ref_new = scipy.signal.fftconvolve(x, t_new)[: len(x)]
    # before the swap: old; after: new; during: linear ramp
    np.testing.assert_allclose(y[: swap_at * N], ref_old[: swap_at * N],
                               rtol=0, atol=1e-3)
    np.testing.assert_allclose(y[(swap_at + 1) * N:], ref_new[(swap_at + 1) * N:],
                               rtol=0, atol=1e-3)
    f = np.arange(N) / (N - 1)
    seg = slice(swap_at * N, (swap_at + 1) * N)
    expect = ref_old[seg] * (1 - f) + ref_new[seg] * f
    np.testing.assert_allclose(y[seg], expect, rtol=0, atol=1e-3)


def test_short_coeff_mask(rng):
    """A coeff with fewer blocks than the ring just skips MACs (cblocks)."""
    N, B = 32, 8
    taps = rng.standard_normal(N * 3).astype(np.float32)
    x = rng.standard_normal(N * 12).astype(np.float32)
    spec = build_graph_spec(N, B, 1, 1, [[]], [False])
    bank = make_bank([partconv.preprocess_coeffs(taps, N, B)])
    ctrl = simple_ctrl(spec, 1, mask_blocks=3)
    y = run_blocks(CompiledGraph(spec), ctrl, jnp.asarray(bank),
                   x.reshape(-1, 1, N))
    ref = scipy.signal.fftconvolve(x, taps)[: len(x)]
    np.testing.assert_allclose(y[0], ref, rtol=0, atol=5e-4)


def test_spectral_mac_rollh_identical(rng):
    """The gather-composed MAC (spectral_mac_rollh) computes the same
    terms as spectral_mac; only the partition summation order differs
    (float tolerance)."""
    import jax.numpy as jnp
    from brutefir_tpu.ops.partconv import spectral_mac, spectral_mac_rollh
    F, B, N, E = 5, 8, 128, 3
    ring = rng.standard_normal((F, B, 2, N)).astype(np.float32)
    bank = rng.standard_normal((E, B, 2, N)).astype(np.float32)
    idx = np.array([0, 2, 1, 2, 0], np.int32)
    mask = (rng.uniform(size=(F, B)) > 0.3).astype(np.float32)
    for t in (0, 1, 7, 13):
        h = bank[idx] * mask[:, :, None, None]
        a = spectral_mac(jnp.asarray(ring), jnp.asarray(h), jnp.int32(t))
        b = spectral_mac_rollh(jnp.asarray(ring), jnp.asarray(bank),
                               jnp.asarray(idx), jnp.asarray(mask),
                               jnp.int32(t))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2e-5)


def test_spectral_mac_uniform_matches_gather(rng):
    """The broadcast fast path (all filters sharing one coeff row + mask
    row, the host-selected `uniform` program variant) matches the
    per-filter gather MAC exactly."""
    import jax.numpy as jnp
    from brutefir_tpu.ops.partconv import (spectral_mac_rollh,
                                           spectral_mac_uniform)
    F, B, N, E = 6, 8, 128, 3
    ring = rng.standard_normal((F, B, 2, N)).astype(np.float32)
    bank = rng.standard_normal((E, B, 2, N)).astype(np.float32)
    idx = np.full((F,), 1, np.int32)
    mask = np.ones((F, B), np.float32)
    mask[:, 5:] = 0.0  # uniform short-coeff clamp
    for t in (0, 2, 9):
        a = spectral_mac_rollh(jnp.asarray(ring), jnp.asarray(bank),
                               jnp.asarray(idx), jnp.asarray(mask),
                               jnp.int32(t))
        b = spectral_mac_uniform(jnp.asarray(ring), jnp.asarray(bank),
                                 jnp.asarray(idx), jnp.asarray(mask),
                                 jnp.int32(t))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=2e-5)


def test_uniform_program_engine_parity(tmp_path, rng):
    """A full engine run dispatching the uniform-coefficient program
    produces the same output as one forced onto the general program."""
    import jax.numpy as jnp
    from brutefir_tpu.config import parse_config
    from brutefir_tpu.runtime import Engine

    N, B, C = 64, 4, 2
    frames = N * 6
    raw = (rng.standard_normal((frames, C)) * 0.2).astype(np.float32)
    src = tmp_path / "in.f32"
    raw.tofile(src)
    outs = []
    for force_general in (False, True):
        dst = tmp_path / f"out{force_general}.f32"
        conf = parse_config(f"""
sampling_rate: 44100;
filter_length: {N},{B};
coeff 0 {{ filename: "dirac pulse"; }};
input 0,1 {{ device: "file" {{ path: "{src}"; }};
            sample: "FLOAT_LE"; channels: {C}; }};
output 0,1 {{ device: "file" {{ path: "{dst}"; }};
             sample: "FLOAT_LE"; channels: {C}; dither: false; }};
filter 0 {{ from_inputs: 0; to_outputs: 0; coeff: 0; }};
filter 1 {{ from_inputs: 1; to_outputs: 1; coeff: 0; }};
""")
        eng = Engine(conf)
        if force_general:
            eng.control.snapshot()
            eng.control.snapshot_uniform = False
            orig = type(eng.control).snapshot

            def pinned(self, _o=orig):
                c = _o(self)
                self.snapshot_uniform = False
                return c
            eng.control.snapshot = pinned.__get__(eng.control)
        eng.run()
        outs.append(np.fromfile(dst, np.float32))
    np.testing.assert_allclose(outs[0], outs[1], rtol=0, atol=1e-6)
