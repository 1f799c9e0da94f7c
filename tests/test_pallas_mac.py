"""Pallas MAC kernel (interpret mode) vs the dense jnp path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from brutefir_tpu.ops import partconv
from brutefir_tpu.ops.pallas_mac import pallas_spectral_mac


def test_pallas_matches_dense(rng):
    F, B, N, E = 3, 4, 256, 2
    ring = rng.standard_normal((F, B, 2, N)).astype(np.float32)
    bank = rng.standard_normal((E, B, 2, N)).astype(np.float32)
    idx = np.array([0, 1, 0], np.int32)
    mask = (rng.uniform(size=(F, B)) > 0.3).astype(np.float32)
    for t in (0, 3, 7):
        h = bank[idx] * mask[:, :, None, None]
        ref = partconv.spectral_mac(jnp.asarray(ring), jnp.asarray(h),
                                    jnp.int32(t))
        got = pallas_spectral_mac(jnp.asarray(ring), jnp.asarray(bank),
                                  jnp.asarray(idx), jnp.asarray(mask),
                                  jnp.int32(t), interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0, atol=1e-5)


@pytest.mark.parametrize("variant", ["row", "tile", "chunked"])
def test_pallas_variants_match_dense(rng, variant, monkeypatch):
    monkeypatch.setenv("BRUTEFIR_TPU_PALLAS_VARIANT", variant)
    F, B, N, E = 5, 8, 384, 3
    ring = rng.standard_normal((F, B, 2, N)).astype(np.float32)
    bank = rng.standard_normal((E, B, 2, N)).astype(np.float32)
    idx = np.array([0, 1, 2, 1, 0], np.int32)
    mask = (rng.uniform(size=(F, B)) > 0.3).astype(np.float32)
    for t in (0, 5, 11):
        h = bank[idx] * mask[:, :, None, None]
        ref = partconv.spectral_mac(jnp.asarray(ring), jnp.asarray(h),
                                    jnp.int32(t))
        got = pallas_spectral_mac(jnp.asarray(ring), jnp.asarray(bank),
                                  jnp.asarray(idx), jnp.asarray(mask),
                                  jnp.int32(t), interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0, atol=1e-5)


def test_pallas_uniform_matches_dense(rng):
    """The uniform-coefficient kernel (shared bank row VMEM-resident
    across the filter grid) against the dense uniform path."""
    from brutefir_tpu.ops.pallas_mac import pallas_spectral_mac_uniform
    F, B, N, E = 4, 6, 256, 3
    ring = rng.standard_normal((F, B, 2, N)).astype(np.float32)
    bank = rng.standard_normal((E, B, 2, N)).astype(np.float32)
    idx = np.full(F, 2, np.int32)
    mask = np.tile((rng.uniform(size=B) > 0.3).astype(np.float32), (F, 1))
    for t in (0, 4, 9):
        ref = partconv.spectral_mac_uniform(
            jnp.asarray(ring), jnp.asarray(bank), jnp.asarray(idx),
            jnp.asarray(mask), jnp.int32(t))
        got = pallas_spectral_mac_uniform(
            jnp.asarray(ring), jnp.asarray(bank), jnp.asarray(idx),
            jnp.asarray(mask), jnp.int32(t), interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0, atol=1e-5)


def test_tiled_layout_matches_flat(rng):
    """Every MAC accepts the engine's lane-tiled [.., 2, N/128, 128]
    ring/bank layout and returns the same flat [F, 2, N] spectra."""
    from brutefir_tpu.ops.pallas_mac import (pallas_spectral_mac,
                                             pallas_spectral_mac_uniform)
    F, B, N, E = 3, 4, 384, 2
    R = N // 128
    ring = rng.standard_normal((F, B, 2, N)).astype(np.float32)
    bank = rng.standard_normal((E, B, 2, N)).astype(np.float32)
    ring5 = jnp.asarray(ring.reshape(F, B, 2, R, 128))
    bank5 = jnp.asarray(bank.reshape(E, B, 2, R, 128))
    mask = (rng.uniform(size=(F, B)) > 0.3).astype(np.float32)
    t = jnp.int32(5)

    idx = np.array([0, 1, 0], np.int32)
    for fn in (partconv.spectral_mac_rollh,
               lambda *a: pallas_spectral_mac(*a, interpret=True)):
        flat = fn(jnp.asarray(ring), jnp.asarray(bank),
                  jnp.asarray(idx), jnp.asarray(mask), t)
        tiled = fn(ring5, bank5, jnp.asarray(idx), jnp.asarray(mask), t)
        assert tiled.shape == (F, 2, N)
        np.testing.assert_allclose(np.asarray(tiled), np.asarray(flat),
                                   rtol=0, atol=1e-5)
        # mixed ranks: tiled ring with an untiled bank (test callers)
        mixed = fn(ring5, jnp.asarray(bank), jnp.asarray(idx),
                   jnp.asarray(mask), t)
        np.testing.assert_allclose(np.asarray(mixed), np.asarray(flat),
                                   rtol=0, atol=1e-5)

    uidx = np.ones(F, np.int32)
    umask = np.tile(mask[:1], (F, 1))
    for fn in (partconv.spectral_mac_uniform,
               lambda *a: pallas_spectral_mac_uniform(*a, interpret=True)):
        flat = fn(jnp.asarray(ring), jnp.asarray(bank),
                  jnp.asarray(uidx), jnp.asarray(umask), t)
        tiled = fn(ring5, bank5, jnp.asarray(uidx), jnp.asarray(umask), t)
        np.testing.assert_allclose(np.asarray(tiled), np.asarray(flat),
                                   rtol=0, atol=1e-5)


def test_engine_uniform_pallas_program_matches_dense(tmp_path, monkeypatch):
    """The engine's uniform-coefficient fast-path program exists for the
    Pallas MAC too (pallas_spectral_mac_uniform); outputs must match the
    dense engine bit-for-bit at small amplitudes."""
    from brutefir_tpu.config import parse_config
    from brutefir_tpu.runtime import Engine

    rng = np.random.RandomState(8)
    vals = np.clip((rng.randn(512 * 3, 2) * 2 ** 18).round(),
                   -(2 ** 23), 2 ** 23 - 1).astype("<i4")
    inp = tmp_path / "in.raw"
    vals.tofile(inp)
    outs = {}
    for mac in ("pallas", "jnp"):
        monkeypatch.setenv("BRUTEFIR_TPU_MAC", mac)
        outp = tmp_path / f"o_{mac}.raw"
        conf = parse_config(f"""
sampling_rate: 44100;
filter_length: 256,2;
coeff 0 {{ filename: "dirac pulse"; }};
input 0,1 {{ device: "file" {{ path: "{inp}"; }}; sample: "S32_LE"; channels: 2; }};
output 0,1 {{ device: "file" {{ path: "{outp}"; }}; sample: "S32_LE"; channels: 2; dither: false; }};
filter 0 {{ from_inputs: 0; to_outputs: 0; coeff: 0; }};
filter 1 {{ from_inputs: 1; to_outputs: 1; coeff: 0; }};
""")
        eng = Engine(conf)
        if mac == "pallas":
            assert eng.cg.mac == "pallas-interpret"
            # both filters share coeff 0 -> host selects the uniform program
            eng.control.snapshot()
            assert eng.control.snapshot_uniform
        eng.run()
        outs[mac] = np.fromfile(outp, dtype="<i4")
    np.testing.assert_array_equal(outs["pallas"], outs["jnp"])


def test_pallas_step_with_predelay_matches_dense(rng):
    """Filter pre-delay (delayblocks) writes into a rotated ring slot;
    the tiled-pallas program must match the dense one."""
    from brutefir_tpu.graph import build_graph_spec, CompiledGraph, make_ctrl
    from brutefir_tpu.ops.partconv import make_bank, preprocess_coeffs

    N, B, C = 256, 4, 3
    taps = rng.standard_normal(N * B).astype(np.float32) * 0.1
    spec = build_graph_spec(N, B, C, C, [[] for _ in range(C)], [False] * C)
    bank = make_bank([preprocess_coeffs(taps, N, B)])
    delay = np.array([0, 1, 3], np.int32)
    ctrl = make_ctrl(
        spec, np.eye(C, dtype=np.float32), np.zeros((C, C), np.float32),
        np.eye(C, dtype=np.float32), delay,
        np.zeros(C, np.int32), np.ones((C, B), np.float32))
    xs = rng.standard_normal((6, C, N)).astype(np.float32)

    outs = {}
    for mac in ("jnp", "pallas-interpret"):
        cg = CompiledGraph(spec, mac=mac)
        assert cg.tiled == (mac != "jnp")
        st = cg.init_state()
        ys = []
        for xb in xs:
            st, y = cg.step(st, ctrl, jnp.asarray(bank), jnp.asarray(xb))
            ys.append(np.asarray(y))
        outs[mac] = np.stack(ys)
    np.testing.assert_allclose(outs["pallas-interpret"], outs["jnp"],
                               rtol=0, atol=1e-5)


def test_fused_mac_mix_matches_dense(rng):
    """pallas_spectral_mac_mix == complex_mix(w, pallas_spectral_mac)."""
    from brutefir_tpu.ops.pallas_mac import pallas_spectral_mac_mix
    F, B, N, E, C = 4, 4, 256, 2, 3
    ring = rng.standard_normal((F, B, 2, N)).astype(np.float32)
    bank = rng.standard_normal((E, B, 2, N)).astype(np.float32)
    idx = np.array([0, 1, 0, 1], np.int32)
    mask = (rng.uniform(size=(F, B)) > 0.3).astype(np.float32)
    w = rng.standard_normal((C, F)).astype(np.float32)
    for t in (0, 3, 6):
        y = pallas_spectral_mac(jnp.asarray(ring), jnp.asarray(bank),
                                jnp.asarray(idx), jnp.asarray(mask),
                                jnp.int32(t), interpret=True)
        ref = partconv.complex_mix(jnp.asarray(w), y)
        got = pallas_spectral_mac_mix(
            jnp.asarray(ring), jnp.asarray(bank), jnp.asarray(idx),
            jnp.asarray(mask), jnp.int32(t), jnp.asarray(w),
            interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0, atol=1e-4)


def test_fused_mac_mix_tiled_matches_dense(rng):
    """The bin-tiled MXU fused MAC+mix (big-shape route) == dense,
    called directly at a small shape (R divisible by the 8-row chunk)."""
    from brutefir_tpu.ops.pallas_mac import (_tiled_mix_call, _bin0,
                                             pallas_spectral_mac)
    F, B, N, E, C = 6, 4, 1024, 3, 5       # R = 8 -> one bin chunk
    ring = rng.standard_normal((F, B, 2, N)).astype(np.float32)
    bank = rng.standard_normal((E, B, 2, N)).astype(np.float32)
    idx = np.array([0, 1, 2, 0, 1, 2], np.int32)
    mask = (rng.uniform(size=(F, B)) > 0.3).astype(np.float32)
    w = rng.standard_normal((C, F)).astype(np.float32)
    R = N // 128
    ring5 = jnp.asarray(ring.reshape(F, B, 2, R, 128))
    bank5 = jnp.asarray(bank.reshape(E, B, 2, R, 128))
    for t in (0, 3):
        y = pallas_spectral_mac(jnp.asarray(ring), jnp.asarray(bank),
                                jnp.asarray(idx), jnp.asarray(mask),
                                jnp.int32(t), interpret=True)
        ref = partconv.complex_mix(jnp.asarray(w), y)
        rpos = jnp.mod(jnp.int32(t) - jnp.arange(B, dtype=jnp.int32),
                       B).astype(jnp.int32)
        out5 = _tiled_mix_call(ring5, bank5, jnp.asarray(idx), rpos,
                               jnp.asarray(mask), jnp.asarray(w),
                               interpret=True)
        out = out5.reshape(C, 2, N)
        y0r, y0i = _bin0(jnp.asarray(ring), jnp.asarray(bank),
                         jnp.asarray(idx), jnp.asarray(mask), rpos)
        out = out.at[:, 0, 0].set(w @ np.asarray(y0r)) \
                 .at[:, 1, 0].set(w @ np.asarray(y0i))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=0, atol=1e-4)


def test_fused_mac_mix_uniform_matches_dense(rng):
    from brutefir_tpu.ops.pallas_mac import (pallas_spectral_mac_mix,
                                             pallas_spectral_mac_uniform)
    F, B, N, E, C = 4, 4, 256, 2, 4
    ring = rng.standard_normal((F, B, 2, N)).astype(np.float32)
    bank = rng.standard_normal((E, B, 2, N)).astype(np.float32)
    idx = np.ones(F, np.int32)
    mask = np.tile((rng.uniform(size=B) > 0.2).astype(np.float32), (F, 1))
    w = rng.standard_normal((C, F)).astype(np.float32)
    for t in (0, 2, 5):
        y = pallas_spectral_mac_uniform(
            jnp.asarray(ring), jnp.asarray(bank), jnp.asarray(idx),
            jnp.asarray(mask), jnp.int32(t), interpret=True)
        ref = partconv.complex_mix(jnp.asarray(w), y)
        got = pallas_spectral_mac_mix(
            jnp.asarray(ring), jnp.asarray(bank), jnp.asarray(idx),
            jnp.asarray(mask), jnp.int32(t), jnp.asarray(w),
            uniform=True, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0, atol=1e-4)


def test_fused_mix_step_matches_unfused(tmp_path, rng, monkeypatch):
    """The engine step with BRUTEFIR_TPU_FUSED_MIX on vs off (pallas
    interpret) produces identical audio."""
    from brutefir_tpu.graph import build_graph_spec, CompiledGraph, make_ctrl
    from brutefir_tpu.ops.partconv import preprocess_coeffs, make_bank
    N, B, C = 256, 2, 3
    taps = (rng.standard_normal(N * B) * 0.1).astype(np.float32)
    spec = build_graph_spec(N, B, C, C, [[] for _ in range(C)], [False] * C)
    bank = make_bank([preprocess_coeffs(taps, N, B)])
    ctrl = make_ctrl(spec, rng.standard_normal((C, C)).astype(np.float32),
                     np.zeros((C, C), np.float32),
                     rng.standard_normal((C, C)).astype(np.float32),
                     np.zeros(C, np.int32), np.zeros(C, np.int32),
                     np.ones((C, B), np.float32))
    xs = rng.standard_normal((4, C, N)).astype(np.float32)
    outs = {}
    for fused in ("1", "0"):
        monkeypatch.setenv("BRUTEFIR_TPU_FUSED_MIX", fused)
        cg = CompiledGraph(spec, mac="pallas-interpret")
        st = cg.init_state()
        ys = []
        for xb in xs:
            st, y = cg.step(st, ctrl, jnp.asarray(bank), jnp.asarray(xb))
            ys.append(np.asarray(y))
        outs[fused] = np.concatenate(ys, axis=1)
    np.testing.assert_allclose(outs["1"], outs["0"], rtol=0, atol=1e-4)


def test_pallas_dual_matches_two_singles(rng):
    """Crossfade dual MAC (one ring pass, two coefficient sets) returns
    exactly what two plain kernel calls return."""
    from brutefir_tpu.ops.pallas_mac import pallas_spectral_mac_dual
    F, B, N, E = 4, 4, 256, 3
    ring = rng.standard_normal((F, B, 2, N)).astype(np.float32)
    bank = rng.standard_normal((E, B, 2, N)).astype(np.float32)
    idx = np.array([0, 1, 2, 1], np.int32)
    pidx = np.array([2, 0, 1, 0], np.int32)
    mask = (rng.uniform(size=(F, B)) > 0.3).astype(np.float32)
    pmask = (rng.uniform(size=(F, B)) > 0.3).astype(np.float32)
    for t in (0, 3, 6):
        ref_new = pallas_spectral_mac(
            jnp.asarray(ring), jnp.asarray(bank), jnp.asarray(idx),
            jnp.asarray(mask), jnp.int32(t), interpret=True)
        ref_old = pallas_spectral_mac(
            jnp.asarray(ring), jnp.asarray(bank), jnp.asarray(pidx),
            jnp.asarray(pmask), jnp.int32(t), interpret=True)
        got_new, got_old = pallas_spectral_mac_dual(
            jnp.asarray(ring), jnp.asarray(bank), jnp.asarray(idx),
            jnp.asarray(mask), jnp.asarray(pidx), jnp.asarray(pmask),
            jnp.int32(t), interpret=True)
        np.testing.assert_allclose(np.asarray(got_new), np.asarray(ref_new),
                                   rtol=0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got_old), np.asarray(ref_old),
                                   rtol=0, atol=1e-5)


def test_pallas_dual_uniform_and_tiled(rng):
    """Dual MAC: the uniform-coefficient variant and the lane-tiled
    layout agree with the distinct/flat results."""
    from brutefir_tpu.ops.pallas_mac import pallas_spectral_mac_dual
    F, B, N, E = 3, 4, 384, 3
    R = N // 128
    ring = rng.standard_normal((F, B, 2, N)).astype(np.float32)
    bank = rng.standard_normal((E, B, 2, N)).astype(np.float32)
    idx = np.full(F, 1, np.int32)
    pidx = np.full(F, 2, np.int32)
    mask = np.tile((rng.uniform(size=B) > 0.3).astype(np.float32), (F, 1))
    pmask = np.tile((rng.uniform(size=B) > 0.3).astype(np.float32), (F, 1))
    t = jnp.int32(5)
    base = pallas_spectral_mac_dual(
        jnp.asarray(ring), jnp.asarray(bank), jnp.asarray(idx),
        jnp.asarray(mask), jnp.asarray(pidx), jnp.asarray(pmask), t,
        interpret=True)
    uni = pallas_spectral_mac_dual(
        jnp.asarray(ring), jnp.asarray(bank), jnp.asarray(idx),
        jnp.asarray(mask), jnp.asarray(pidx), jnp.asarray(pmask), t,
        uniform=True, interpret=True)
    tiled = pallas_spectral_mac_dual(
        jnp.asarray(ring.reshape(F, B, 2, R, 128)),
        jnp.asarray(bank.reshape(E, B, 2, R, 128)), jnp.asarray(idx),
        jnp.asarray(mask), jnp.asarray(pidx), jnp.asarray(pmask), t,
        interpret=True)
    for got in (uni, tiled):
        for g, b in zip(got, base):
            assert g.shape == (F, 2, N)
            np.testing.assert_allclose(np.asarray(g), np.asarray(b),
                                       rtol=0, atol=1e-5)


def test_compiled_crossfade_dual_path_matches_dense(rng):
    """A crossfade block through CompiledGraph on the pallas path (which
    now takes the fused dual-MAC branch) matches the dense path."""
    from brutefir_tpu.graph import build_graph_spec, CompiledGraph, make_ctrl
    from brutefir_tpu.ops.partconv import make_bank, preprocess_coeffs

    N, B, C = 256, 4, 3
    taps_a = rng.standard_normal(N * B).astype(np.float32) * 0.1
    taps_b = rng.standard_normal(N * 2).astype(np.float32) * 0.1
    spec = build_graph_spec(N, B, C, C, [[] for _ in range(C)], [True] * C)
    bank = make_bank([preprocess_coeffs(taps_a, N, B),
                      preprocess_coeffs(taps_b, N, B)])
    mask_a = np.ones((C, B), np.float32)
    mask_b = np.concatenate([np.ones((C, 2)), np.zeros((C, B - 2))],
                            axis=1).astype(np.float32)  # cblocks clamp

    def ctrl_for(idx, msk, prev, pmsk, xf):
        return make_ctrl(
            spec, np.eye(C, dtype=np.float32), np.zeros((C, C), np.float32),
            np.eye(C, dtype=np.float32), np.zeros(C, np.int32),
            np.full(C, idx, np.int32), msk,
            prev_idx=np.full(C, prev, np.int32), prev_mask=pmsk,
            xfade=np.full(C, xf, np.float32))

    plans = [ctrl_for(0, mask_a, 0, mask_a, 0.0),
             ctrl_for(1, mask_b, 0, mask_a, 1.0),   # swap w/ crossfade
             ctrl_for(1, mask_b, 1, mask_b, 0.0)]
    xs = rng.standard_normal((3, C, N)).astype(np.float32)

    outs = {}
    for mac in ("jnp", "pallas-interpret"):
        cg = CompiledGraph(spec, mac=mac)
        st = cg.init_state()
        ys = []
        for xb, ct in zip(xs, plans):
            st, y = cg.step(st, ct, jnp.asarray(bank), jnp.asarray(xb))
            ys.append(np.asarray(y))
        outs[mac] = np.stack(ys)
    np.testing.assert_allclose(outs["pallas-interpret"], outs["jnp"],
                               rtol=0, atol=1e-4)


def test_pallas_dual_vmem_fallback_matches(rng, monkeypatch):
    """When three resident rows exceed the VMEM budget, the dual MAC
    falls back to two plain passes -- results must be identical."""
    import brutefir_tpu.ops.pallas_mac as pm
    F, B, N, E = 3, 4, 256, 2
    ring = rng.standard_normal((F, B, 2, N)).astype(np.float32)
    bank = rng.standard_normal((E, B, 2, N)).astype(np.float32)
    idx = np.array([0, 1, 0], np.int32)
    pidx = np.array([1, 0, 1], np.int32)
    mask = (rng.uniform(size=(F, B)) > 0.3).astype(np.float32)
    pmask = (rng.uniform(size=(F, B)) > 0.3).astype(np.float32)
    t = jnp.int32(2)
    args = (jnp.asarray(ring), jnp.asarray(bank), jnp.asarray(idx),
            jnp.asarray(mask), jnp.asarray(pidx), jnp.asarray(pmask), t)
    fused = pm.pallas_spectral_mac_dual(*args, interpret=True)
    monkeypatch.setattr(pm, "_DUAL_VMEM_BUDGET", 0)
    fallback = pm.pallas_spectral_mac_dual(*args, interpret=True)
    for a, b in zip(fallback, fused):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=1e-5)


def test_bf16_bank_kernels_match_dense(rng):
    """BRUTEFIR_TPU_BANK_DTYPE=bf16: all kernels accept a bfloat16 bank
    (upconverting on load) and match the dense path run on the same
    quantized coefficients."""
    from brutefir_tpu.ops.pallas_mac import (pallas_spectral_mac,
                                             pallas_spectral_mac_uniform,
                                             pallas_spectral_mac_dual,
                                             pallas_spectral_mac_mix)
    F, B, N, E, C = 3, 4, 256, 2, 2
    ring = rng.standard_normal((F, B, 2, N)).astype(np.float32)
    bank = rng.standard_normal((E, B, 2, N)).astype(np.float32)
    bank16 = jnp.asarray(bank, jnp.bfloat16)
    bank_q = np.asarray(bank16.astype(jnp.float32))   # dense on same values
    idx = np.array([0, 1, 0], np.int32)
    uidx = np.ones(F, np.int32)
    mask = (rng.uniform(size=(F, B)) > 0.3).astype(np.float32)
    umask = np.tile(mask[:1], (F, 1))
    w = rng.standard_normal((C, F)).astype(np.float32)
    t = jnp.int32(3)

    ref = partconv.spectral_mac_rollh(
        jnp.asarray(ring), jnp.asarray(bank_q), jnp.asarray(idx),
        jnp.asarray(mask), t)
    got = pallas_spectral_mac(jnp.asarray(ring), bank16, jnp.asarray(idx),
                              jnp.asarray(mask), t, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-4)

    refu = partconv.spectral_mac_uniform(
        jnp.asarray(ring), jnp.asarray(bank_q), jnp.asarray(uidx),
        jnp.asarray(umask), t)
    gotu = pallas_spectral_mac_uniform(
        jnp.asarray(ring), bank16, jnp.asarray(uidx), jnp.asarray(umask),
        t, interpret=True)
    np.testing.assert_allclose(np.asarray(gotu), np.asarray(refu),
                               rtol=0, atol=1e-4)

    dn, dp = pallas_spectral_mac_dual(
        jnp.asarray(ring), bank16, jnp.asarray(idx), jnp.asarray(mask),
        jnp.asarray(uidx), jnp.asarray(umask), t, interpret=True)
    np.testing.assert_allclose(np.asarray(dn), np.asarray(ref),
                               rtol=0, atol=1e-4)

    refm = partconv.complex_mix(jnp.asarray(w), ref)
    gotm = pallas_spectral_mac_mix(
        jnp.asarray(ring), bank16, jnp.asarray(idx), jnp.asarray(mask),
        t, jnp.asarray(w), interpret=True)
    np.testing.assert_allclose(np.asarray(gotm), np.asarray(refm),
                               rtol=0, atol=1e-3)


def test_bf16_bank_engine_dirac_exact(tmp_path, monkeypatch, rng):
    """Engine e2e with the bf16 bank: dirac coefficients are exactly
    representable in bfloat16 (+-1 spectra), so the output must be
    bit-identical to the f32-bank run."""
    from brutefir_tpu.config import parse_config
    from brutefir_tpu.runtime import Engine

    vals = np.clip((rng.standard_normal((256 * 3, 2)) * 2 ** 20).round(),
                   -(2 ** 23), 2 ** 23 - 1).astype("<i4")
    inp = tmp_path / "in.raw"
    vals.tofile(inp)
    outs = {}
    for dt in ("", "bf16"):
        if dt:
            monkeypatch.setenv("BRUTEFIR_TPU_BANK_DTYPE", dt)
        else:
            monkeypatch.delenv("BRUTEFIR_TPU_BANK_DTYPE", raising=False)
        outp = tmp_path / f"o{dt or 'f32'}.raw"
        conf = parse_config(f"""
sampling_rate: 44100;
filter_length: 256,2;
coeff 0 {{ filename: "dirac pulse"; }};
input 0,1 {{ device: "file" {{ path: "{inp}"; }}; sample: "S32_LE"; channels: 2; }};
output 0,1 {{ device: "file" {{ path: "{outp}"; }}; sample: "S32_LE"; channels: 2; dither: false; }};
filter 0 {{ from_inputs: 0; to_outputs: 0; coeff: 0; }};
filter 1 {{ from_inputs: 1; to_outputs: 1; coeff: 0; }};
""")
        eng = Engine(conf)
        if dt:
            assert eng.bank.dtype == jnp.bfloat16
        eng.run()
        outs[dt] = np.fromfile(outp, dtype="<i4")
    np.testing.assert_array_equal(outs["bf16"], outs[""])


def test_bf16_ring_kernels_match_dense(rng):
    """BRUTEFIR_TPU_RING_DTYPE=bf16: kernels accept a bfloat16 ring
    (upconverting on load, f32 accumulate) and match the dense path run
    on the same quantized history."""
    from brutefir_tpu.ops.pallas_mac import (pallas_spectral_mac,
                                             pallas_spectral_mac_uniform,
                                             pallas_spectral_mac_dual,
                                             pallas_spectral_mac_mix)
    F, B, N, E, C = 3, 4, 256, 2, 2
    ring = rng.standard_normal((F, B, 2, N)).astype(np.float32)
    bank = rng.standard_normal((E, B, 2, N)).astype(np.float32)
    ring16 = jnp.asarray(ring, jnp.bfloat16)
    ring_q = np.asarray(ring16.astype(jnp.float32))
    idx = np.array([0, 1, 0], np.int32)
    uidx = np.ones(F, np.int32)
    mask = (rng.uniform(size=(F, B)) > 0.3).astype(np.float32)
    umask = np.tile(mask[:1], (F, 1))
    w = rng.standard_normal((C, F)).astype(np.float32)
    t = jnp.int32(3)

    ref = partconv.spectral_mac_rollh(
        jnp.asarray(ring_q), jnp.asarray(bank), jnp.asarray(idx),
        jnp.asarray(mask), t)
    got = pallas_spectral_mac(ring16, jnp.asarray(bank), jnp.asarray(idx),
                              jnp.asarray(mask), t, interpret=True)
    assert got.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-4)

    refu = partconv.spectral_mac_uniform(
        jnp.asarray(ring_q), jnp.asarray(bank), jnp.asarray(uidx),
        jnp.asarray(umask), t)
    gotu = pallas_spectral_mac_uniform(
        ring16, jnp.asarray(bank), jnp.asarray(uidx), jnp.asarray(umask),
        t, interpret=True)
    np.testing.assert_allclose(np.asarray(gotu), np.asarray(refu),
                               rtol=0, atol=1e-4)

    dn, _ = pallas_spectral_mac_dual(
        ring16, jnp.asarray(bank), jnp.asarray(idx), jnp.asarray(mask),
        jnp.asarray(uidx), jnp.asarray(umask), t, interpret=True)
    np.testing.assert_allclose(np.asarray(dn), np.asarray(ref),
                               rtol=0, atol=1e-4)

    refm = partconv.complex_mix(jnp.asarray(w), ref)
    gotm = pallas_spectral_mac_mix(
        ring16, jnp.asarray(bank), jnp.asarray(idx), jnp.asarray(mask),
        t, jnp.asarray(w), interpret=True)
    assert gotm.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(gotm), np.asarray(refm),
                               rtol=0, atol=1e-3)


def test_bf16_ring_engine_e2e(tmp_path, monkeypatch, rng):
    """Engine e2e with the bf16 ring: completes, and the dirac
    passthrough output stays within bf16 quantization (~0.4%) of the
    f32-ring run."""
    from brutefir_tpu.config import parse_config
    from brutefir_tpu.runtime import Engine

    vals = np.clip((rng.standard_normal((256 * 3, 2)) * 2 ** 20).round(),
                   -(2 ** 23), 2 ** 23 - 1).astype("<i4")
    inp = tmp_path / "in.raw"
    vals.tofile(inp)
    outs = {}
    for dt in ("", "bf16"):
        if dt:
            monkeypatch.setenv("BRUTEFIR_TPU_RING_DTYPE", dt)
        else:
            monkeypatch.delenv("BRUTEFIR_TPU_RING_DTYPE", raising=False)
        outp = tmp_path / f"or{dt or 'f32'}.raw"
        conf = parse_config(f"""
sampling_rate: 44100;
filter_length: 256,2;
coeff 0 {{ filename: "dirac pulse"; }};
input 0,1 {{ device: "file" {{ path: "{inp}"; }}; sample: "S32_LE"; channels: 2; }};
output 0,1 {{ device: "file" {{ path: "{outp}"; }}; sample: "S32_LE"; channels: 2; dither: false; }};
filter 0 {{ from_inputs: 0; to_outputs: 0; coeff: 0; }};
filter 1 {{ from_inputs: 1; to_outputs: 1; coeff: 0; }};
""")
        eng = Engine(conf)
        if dt:
            assert eng.state.ring.dtype == jnp.bfloat16
        eng.run()
        outs[dt] = np.fromfile(outp, dtype="<i4").astype(np.int64)
    err = np.abs(outs["bf16"] - outs[""]).max()
    assert err <= np.abs(outs[""]).max() * 0.005 + 2


@pytest.mark.parametrize("F,B,N", [(1, 1, 256), (2, 1, 512), (1, 3, 256),
                                   (5, 2, 384)])
def test_pallas_dual_edge_shapes(rng, F, B, N):
    """Dual MAC at edge shapes: single partition (bench3-style configs
    with crossfade engage the dual kernel at B=1), single filter."""
    from brutefir_tpu.ops.pallas_mac import (pallas_spectral_mac,
                                             pallas_spectral_mac_dual)
    E = 2
    ring = rng.standard_normal((F, B, 2, N)).astype(np.float32)
    bank = rng.standard_normal((E, B, 2, N)).astype(np.float32)
    idx = (np.arange(F) % E).astype(np.int32)
    pidx = ((np.arange(F) + 1) % E).astype(np.int32)
    mask = np.ones((F, B), np.float32)
    pmask = (rng.uniform(size=(F, B)) > 0.2).astype(np.float32)
    for t in (0, 1, 5):
        rn = pallas_spectral_mac(jnp.asarray(ring), jnp.asarray(bank),
                                 jnp.asarray(idx), jnp.asarray(mask),
                                 jnp.int32(t), interpret=True)
        ro = pallas_spectral_mac(jnp.asarray(ring), jnp.asarray(bank),
                                 jnp.asarray(pidx), jnp.asarray(pmask),
                                 jnp.int32(t), interpret=True)
        gn, go = pallas_spectral_mac_dual(
            jnp.asarray(ring), jnp.asarray(bank), jnp.asarray(idx),
            jnp.asarray(mask), jnp.asarray(pidx), jnp.asarray(pmask),
            jnp.int32(t), interpret=True)
        np.testing.assert_allclose(np.asarray(gn), np.asarray(rn),
                                   rtol=0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(go), np.asarray(ro),
                                   rtol=0, atol=1e-5)
