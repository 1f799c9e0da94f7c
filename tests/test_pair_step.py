"""Two-blocks-per-dispatch pair program (graph/compile._pair_step_impl +
ops/pallas_mac.pallas_spectral_mac_mix_pair).

The batched offline dispatch freezes controls across each batch, so two
consecutive blocks can share ONE pass over the spectra ring and the
coefficient bank -- at the 256ch scale shape the MAC streams ring+bank at
the HBM roofline, making bytes-per-block the only bit-parity lever left
(docs/PERFORMANCE.md). Semantics must be identical to the per-block scan:
the one ring slot whose content differs between the pair and sequential
schedules is either partition 0 of a delay-0 filter (fed the fresh
spectra via ``xnew``) or masked by the cblocks <= B - delayblocks clamp
(control._cblocks, mirroring /root/reference/bfrun.c:1585-1591).
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from brutefir_tpu.config import parse_config  # noqa: E402
from brutefir_tpu.ops import partconv  # noqa: E402
from brutefir_tpu.ops.pallas_mac import (  # noqa: E402
    pallas_spectral_mac_mix_pair, pair_mix_fusable)


# ---------------------------------------------------------------- kernel


def _dense_block(ring_flat, bank_flat, coeff_idx, mask, t, w):
    """Oracle: dense MAC + output mix for one block (flat layouts)."""
    y = partconv.spectral_mac_rollh(ring_flat, bank_flat, coeff_idx,
                                    mask, jnp.int32(t))
    return partconv.complex_mix(w, y)


@pytest.mark.parametrize("B,delays", [
    (4, [0, 0, 0, 0, 0]),          # all delay-0: block 1 reads xnew at b=0
    (4, [0, 1, 3, 2, 0]),          # mixed: masked-slot path per filter
    (1, [0, 0, 0, 0, 0]),          # single partition edge
])
def test_pair_kernel_matches_sequential(B, delays):
    F, E, N, C_out = 5, 3, 256, 4
    R = N // 128
    t0 = 7
    rng = np.random.default_rng(42 + B)
    ring = rng.standard_normal((F, B, 2, N)).astype(np.float32)
    bank = rng.standard_normal((E, B, 2, N)).astype(np.float32)
    blk0 = rng.standard_normal((F, 2, N)).astype(np.float32)
    blk1 = rng.standard_normal((F, 2, N)).astype(np.float32)
    w = rng.standard_normal((C_out, F)).astype(np.float32)
    coeff_idx = jnp.asarray(rng.integers(0, E, F), jnp.int32)
    delays = np.asarray(delays[:F]) % B
    # the cblocks clamp: partitions >= B - delay are always masked
    mask = np.zeros((F, B), np.float32)
    for f in range(F):
        mask[f, : B - delays[f]] = 1.0
    mask[0, max(0, B - delays[0] - 1):] = 0.0   # a shorter coeff too
    mask = jnp.asarray(mask)
    dly = jnp.asarray(delays, jnp.int32)

    def wr(ring, blk, tw):
        wpos = jnp.mod(tw + dly, B)
        return ring.at[jnp.arange(F), wpos].set(blk)

    # sequential schedule (the per-block scan)
    ring0 = wr(jnp.asarray(ring), jnp.asarray(blk0), t0)
    out0_ref = _dense_block(ring0, jnp.asarray(bank), coeff_idx, mask,
                            t0, jnp.asarray(w))
    ring1 = wr(ring0, jnp.asarray(blk1), t0 + 1)
    out1_ref = _dense_block(ring1, jnp.asarray(bank), coeff_idx, mask,
                            t0 + 1, jnp.asarray(w))

    # pair schedule: one ring pass, xnew side channel
    ring5 = ring0.reshape(F, B, 2, R, 128)
    bank5 = jnp.asarray(bank).reshape(E, B, 2, R, 128)
    xnew = jnp.asarray(blk1).reshape(F, 2, R, 128)
    usenew = (dly == 0).astype(jnp.int32)
    out0, out1 = pallas_spectral_mac_mix_pair(
        ring5, xnew, bank5, coeff_idx, mask, jnp.int32(t0),
        jnp.asarray(w), usenew, interpret=True)

    np.testing.assert_allclose(np.asarray(out0), np.asarray(out0_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out1_ref),
                               rtol=2e-5, atol=2e-5)


def test_pair_mix_fusable_budget():
    assert pair_mix_fusable(256, 16, 8192, 256)        # the scale shape
    assert not pair_mix_fusable(256, 16, 8191, 256)    # lane misalignment


# ------------------------------------------------------------- eligibility


def _mk_engine(tmp_path, delays, tag, C=3, N=256, B=4, fmt="FLOAT_LE",
               dither="false"):
    # N >= 256: pallas_available's bin floor -- smaller blocks resolve
    # the MAC to "jnp", which silently disqualifies the pair path and
    # would turn the parity tests below into scan-vs-scan no-ops
    coeffs = "\n".join(
        f'coeff {i} {{ filename: "{tmp_path}/c{i}_{tag}.txt"; '
        f'format: "text"; }};'
        for i in range(C))
    rng = np.random.default_rng(hash(tag) % 2**31)
    for i in range(C):
        t = (rng.standard_normal(N * 2) * 0.2).astype(np.float64)
        np.savetxt(tmp_path / f"c{i}_{tag}.txt", t)
    chans = ",".join(str(i) for i in range(C))
    conf = parse_config(f"""
sampling_rate: 44100;
filter_length: {N},{B};
{coeffs}
input {chans} {{ device: "file" {{ path: "/dev/zero"; }}; sample: "{fmt}"; channels: {C}; }};
output {chans} {{ device: "file" {{ path: "/dev/null"; }}; sample: "{fmt}"; channels: {C}; dither: {dither}; }};
""" + "\n".join(
        f"filter {i} {{ from_inputs: {i}; to_outputs: {i}; coeff: {i}; "
        f"delay: {delays[i]}; }};"
        for i in range(C)))
    conf.quiet = True
    from brutefir_tpu.runtime import Engine
    eng = Engine(conf)
    eng.setup()
    return eng


def test_pair_eligible_gates(tmp_path, monkeypatch):
    from brutefir_tpu.graph.compile import pair_eligible, group_size
    monkeypatch.setenv("BRUTEFIR_TPU_MAC", "pallas")
    eng = _mk_engine(tmp_path, [0, 0, 0], "gate")
    spec = eng.spec
    # small shape: only with force
    monkeypatch.setenv("BRUTEFIR_TPU_PAIR", "2")
    assert not pair_eligible(spec, "pallas-interpret", None, None)
    monkeypatch.setenv("BRUTEFIR_TPU_PAIR", "force")
    assert pair_eligible(spec, "pallas-interpret", None, None)
    monkeypatch.setenv("BRUTEFIR_TPU_PAIR", "0")
    assert not pair_eligible(spec, "pallas-interpret", None, None)
    monkeypatch.setenv("BRUTEFIR_TPU_PAIR", "force")
    # dense MAC / taps / mesh all disqualify
    assert not pair_eligible(spec, "jnp", None, None)
    assert not pair_eligible(spec, "pallas-interpret", {"x": 1}, None)
    # group size: honors divisibility (m=6 cannot group by 4 -> falls to 3)
    monkeypatch.setenv("BRUTEFIR_TPU_PAIR", "force:4")
    assert group_size(spec, "pallas-interpret", None, None, 8) == 4
    assert group_size(spec, "pallas-interpret", None, None, 6) == 3
    assert group_size(spec, "pallas-interpret", None, None, 5) == 1


# ------------------------------------------------------- engine batch parity


def _spy_pair(monkeypatch):
    """Instrument _group_step_impl (the grouped dispatch's graph step);
    returns a list that records the group size of each call."""
    import brutefir_tpu.graph.compile as C
    taken = []
    orig = C._group_step_impl

    def spy(spec, mac, state, ctrl, bank, xs, **k):
        taken.append(len(xs))
        return orig(spec, mac, state, ctrl, bank, xs, **k)

    monkeypatch.setattr(C, "_group_step_impl", spy)
    return taken


def _run_batch(eng, m, udelay=False, xfade=False, seed=11):
    N = eng.N
    # the program cache key ignores env knobs (BRUTEFIR_TPU_PAIR flips
    # between A/B runs here): rebuild per run so the knob is honored
    eng.dio._multi.clear()
    rng = np.random.default_rng(seed)
    with eng.control_mutex:
        ctrl = eng.control.snapshot()
        g0, g1 = eng._mute_gains()
        uni = eng.control.snapshot_uniform
    mstep = eng.dio.multi_step(m, uniform=uni, udelay=udelay, xfade=xfade)
    stacks = []
    for i in range(len(eng.dio.in_wire_shape)):
        shp = (m, N) + eng.dio.in_wire_shape[i]
        dt = eng.dio.in_wire_dtype[i]
        if np.issubdtype(dt, np.floating):
            words = (rng.standard_normal(shp) * 0.5).astype(dt)
        else:
            info = np.iinfo(dt)
            words = rng.integers(info.min, info.max + 1, shp).astype(dt)
        stacks.append(jnp.asarray(words))
    st = eng.cg.init_state()
    dstate = jax.tree.map(jnp.copy, eng.dio.dstate)
    try:
        st, outs, meters, nan = mstep(st, ctrl, g0, g1, eng.bank, stacks)
        return ([np.asarray(o) for o in outs],
                [np.asarray(md) for md in meters],
                np.asarray(st.ring), bool(nan))
    finally:
        eng.dio.dstate = dstate


@pytest.mark.parametrize("delays,udelay,group", [
    ([0, 0, 0], False, 2),
    ([0, 0, 0], True, 2),   # scalar-slot ring write variant
    ([0, 1, 2], False, 2),  # mixed pre-delays: usenew + masked slots
    ([0, 0, 0], False, 3),  # odd group size
    ([0, 1, 2], False, 4),  # G=4: multi-xnew selection per filter
    ([0, 0, 0], True, 4),
])
def test_pair_batch_matches_scanned(tmp_path, monkeypatch, delays, udelay,
                                    group):
    """The grouped dispatch must reproduce the per-block scan through the
    full device program (decode -> FFT -> MAC+mix -> iFFT -> encode ->
    meters), including the chained per-block meter/delay state."""
    monkeypatch.setenv("BRUTEFIR_TPU_MAC", "pallas")
    tag = f"pb{''.join(map(str, delays))}{int(udelay)}{group}"
    eng = _mk_engine(tmp_path, delays, tag)

    assert eng.cg.mac == "pallas-interpret"
    monkeypatch.setenv("BRUTEFIR_TPU_PAIR", "0")
    outs_a, met_a, ring_a, nan_a = _run_batch(eng, 12, udelay=udelay)
    monkeypatch.setenv("BRUTEFIR_TPU_PAIR", f"force:{group}")
    taken = _spy_pair(monkeypatch)
    outs_b, met_b, ring_b, nan_b = _run_batch(eng, 12, udelay=udelay)
    assert taken and taken[0] == group, \
        "the grouped dispatch was not routed through"

    assert nan_a and nan_b
    for a, b in zip(outs_a, outs_b):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)
    for a, b in zip(met_a, met_b):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(ring_a, ring_b, rtol=2e-5, atol=2e-6)


def test_pair_batch_int_dither_matches(tmp_path, monkeypatch):
    """Integer output with dither: the dither state advances per block in
    the pair body exactly like the scan (bit-exact Tausworthe windows),
    so words agree within one LSB of the f32 mix-order difference."""
    monkeypatch.setenv("BRUTEFIR_TPU_MAC", "pallas")
    eng = _mk_engine(tmp_path, [0, 1, 0], "pdith", fmt="S24_4LE",
                     dither="true")
    monkeypatch.setenv("BRUTEFIR_TPU_PAIR", "0")
    outs_a, met_a, _, _ = _run_batch(eng, 4)
    monkeypatch.setenv("BRUTEFIR_TPU_PAIR", "force")
    taken = _spy_pair(monkeypatch)
    outs_b, met_b, _, _ = _run_batch(eng, 4)
    assert taken
    for a, b in zip(outs_a, outs_b):
        np.testing.assert_array_less(
            np.abs(a.astype(np.int64) - b.astype(np.int64)), 2)


@pytest.mark.parametrize("group", [2, 4])
def test_pair_single_partition(tmp_path, monkeypatch, group):
    """B=1 edge: every filter is delay-0; all of a later block's history
    comes from the group's own xnew side channel (B < G exercises the
    in-group chain)."""
    monkeypatch.setenv("BRUTEFIR_TPU_MAC", "pallas")
    eng = _mk_engine(tmp_path, [0, 0], f"pb1g{group}", C=2, B=1)
    monkeypatch.setenv("BRUTEFIR_TPU_PAIR", "0")
    outs_a, _, ring_a, _ = _run_batch(eng, 4)
    monkeypatch.setenv("BRUTEFIR_TPU_PAIR", f"force:{group}")
    taken = _spy_pair(monkeypatch)
    outs_b, _, ring_b, _ = _run_batch(eng, 4)
    assert taken and taken[0] == group
    for a, b in zip(outs_a, outs_b):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(ring_a, ring_b, rtol=2e-5, atol=2e-6)


def test_pair_powersave_gate_matches(tmp_path, monkeypatch):
    """analog powersave (test_silent, bfrun.c:722-772): the pair program
    gates each of its two overlap-save frames independently, exactly like
    the per-block scan."""
    monkeypatch.setenv("BRUTEFIR_TPU_MAC", "pallas")
    N, B, C = 256, 4, 3
    coeffs = "\n".join(
        f'coeff {i} {{ filename: "{tmp_path}/ps{i}.txt"; format: "text"; }};'
        for i in range(C))
    rng = np.random.default_rng(9)
    for i in range(C):
        np.savetxt(tmp_path / f"ps{i}.txt",
                   (rng.standard_normal(N) * 0.2).astype(np.float64))
    chans = ",".join(str(i) for i in range(C))
    conf = parse_config(f"""
sampling_rate: 44100;
filter_length: {N},{B};
powersave: -40;
{coeffs}
input {chans} {{ device: "file" {{ path: "/dev/zero"; }}; sample: "FLOAT_LE"; channels: {C}; }};
output {chans} {{ device: "file" {{ path: "/dev/null"; }}; sample: "FLOAT_LE"; channels: {C}; dither: false; }};
""" + "\n".join(
        f"filter {i} {{ from_inputs: {i}; to_outputs: {i}; coeff: {i}; }};"
        for i in range(C)))
    conf.quiet = True
    from brutefir_tpu.runtime import Engine
    eng = Engine(conf)
    eng.setup()
    assert eng.spec.powersave

    # channel 0 loud, channel 1 sub-threshold noise, channel 2 silent
    m = 4
    rng = np.random.default_rng(13)
    words = np.zeros((m, N, C), np.float32)
    words[:, :, 0] = rng.standard_normal((m, N)) * 0.5
    words[:, :, 1] = rng.standard_normal((m, N)) * 1e-5

    def run_ps():
        eng.dio._multi.clear()
        with eng.control_mutex:
            ctrl = eng.control.snapshot()
            g0, g1 = eng._mute_gains()
        mstep = eng.dio.multi_step(m, xfade=False)
        st = eng.cg.init_state()
        dstate = jax.tree.map(jnp.copy, eng.dio.dstate)
        try:
            st, outs, meters, nan = mstep(st, ctrl, g0, g1, eng.bank,
                                          [jnp.asarray(words)])
            return [np.asarray(o) for o in outs]
        finally:
            eng.dio.dstate = dstate

    monkeypatch.setenv("BRUTEFIR_TPU_PAIR", "0")
    outs_a = run_ps()
    monkeypatch.setenv("BRUTEFIR_TPU_PAIR", "force")
    taken = _spy_pair(monkeypatch)
    outs_b = run_ps()
    assert taken
    for a, b in zip(outs_a, outs_b):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)
    # the gated channel really is gated: silent + sub-threshold inputs
    # produce exact zeros
    assert np.all(outs_b[0][:, :, 1] == 0.0)
    assert np.all(outs_b[0][:, :, 2] == 0.0)


def test_pair_not_taken_when_xfade_unknown(tmp_path, monkeypatch):
    """xfade=None (the legacy dynamic-cond program) must not route to the
    pair dispatch -- it cannot represent a crossfading block."""
    monkeypatch.setenv("BRUTEFIR_TPU_MAC", "pallas")
    monkeypatch.setenv("BRUTEFIR_TPU_PAIR", "force")
    eng = _mk_engine(tmp_path, [0, 0, 0], "pxf")
    eng.dio.multi_step(4, xfade=None)
    eng.dio.multi_step(3, xfade=False)   # odd m keeps the per-block scan
    assert (4, False, False, None) in eng.dio._multi
    assert (3, False, False, False) in eng.dio._multi


# ------------------------------------------------------- unfused group form


@pytest.mark.parametrize("N,rc_env", [(256, None), (2048, None),
                                       (2048, "8")])
def test_group_unfused_kernel_matches_sequential(N, rc_env, monkeypatch):
    """pallas_spectral_mac_group (the unfused G-block MAC -- the form
    G >= 3 takes where the fused kernel's 2*G*C_out output windows
    exceed the scoped-VMEM budget) vs the dense sequential oracle:
    identical per-filter spectra for every block of the group. The
    default is full-row (Rc=R, the measured winner); the rc_env="8"
    case forces BRUTEFIR_TPU_GROUPTILE_RC=8 so the multi-r-block grid
    (R=16, Rc=8) and its block-spec index maps get coverage too."""
    from brutefir_tpu.ops.pallas_mac import pallas_spectral_mac_group

    if rc_env is not None:
        monkeypatch.setenv("BRUTEFIR_TPU_GROUPTILE_RC", rc_env)
    F, E, B, G = 5, 3, 4, 4
    R = N // 128
    t0 = 5
    rng = np.random.default_rng(77)
    ring = rng.standard_normal((F, B, 2, N)).astype(np.float32)
    bank = rng.standard_normal((E, B, 2, N)).astype(np.float32)
    blks = [rng.standard_normal((F, 2, N)).astype(np.float32)
            for _ in range(G)]
    coeff_idx = jnp.asarray(rng.integers(0, E, F), jnp.int32)
    delays = np.asarray([0, 1, 3, 2, 0]) % B
    mask = np.zeros((F, B), np.float32)
    for f in range(F):
        mask[f, : B - delays[f]] = 1.0
    mask = jnp.asarray(mask)
    dly = jnp.asarray(delays, jnp.int32)

    def wr(r, blk, tw):
        wpos = jnp.mod(tw + dly, B)
        return r.at[jnp.arange(F), wpos].set(blk)

    refs = []
    r = wr(jnp.asarray(ring), jnp.asarray(blks[0]), t0)
    ring0 = r
    for g in range(G):
        if g:
            r = wr(r, jnp.asarray(blks[g]), t0 + g)
        refs.append(partconv.spectral_mac_rollh(
            r, jnp.asarray(bank), coeff_idx, mask, jnp.int32(t0 + g)))

    ring5 = ring0.reshape(F, B, 2, R, 128)
    bank5 = jnp.asarray(bank).reshape(E, B, 2, R, 128)
    xnews = jnp.stack([jnp.asarray(b) for b in blks[1:]])  # [G-1, F, 2, N]
    ys = pallas_spectral_mac_group(ring5, xnews, bank5, coeff_idx, mask,
                                   jnp.int32(t0), dly, interpret=True)
    for y, ref in zip(ys, refs):
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("delays,group", [
    ([0, 0, 0], 4),
    ([0, 1, 2], 4),   # multi-xnew selection per filter
    ([0, 1, 2], 3),
])
def test_group_unfused_batch_matches_scanned(tmp_path, monkeypatch,
                                             delays, group):
    """BRUTEFIR_TPU_GROUP_FORM=unfused through the full device program:
    grouped dispatch with the unfused MAC + separate mix must reproduce
    the per-block scan. The unfused kernel call is spied -- without the
    routing proof this would silently compare fused-vs-scan."""
    import brutefir_tpu.ops.pallas_mac as PM

    monkeypatch.setenv("BRUTEFIR_TPU_MAC", "pallas")
    tag = f"uf{''.join(map(str, delays))}{group}"
    eng = _mk_engine(tmp_path, delays, tag)
    monkeypatch.setenv("BRUTEFIR_TPU_PAIR", "0")
    outs_a, met_a, ring_a, _ = _run_batch(eng, 12)

    monkeypatch.setenv("BRUTEFIR_TPU_PAIR", f"force:{group}")
    monkeypatch.setenv("BRUTEFIR_TPU_GROUP_FORM", "unfused")
    taken = _spy_pair(monkeypatch)
    unfused_calls = []
    orig = PM.pallas_spectral_mac_group

    def spy(*a, **k):
        unfused_calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(PM, "pallas_spectral_mac_group", spy)
    outs_b, met_b, ring_b, _ = _run_batch(eng, 12)
    assert taken and taken[0] == group
    assert unfused_calls, "the unfused group kernel was not routed through"

    for a, b in zip(outs_a, outs_b):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)
    for a, b in zip(met_a, met_b):
        np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(ring_a, ring_b, rtol=2e-5, atol=2e-6)


def test_group_sharded_matches_unsharded(monkeypatch):
    """The sharded grouped program -- the unfused kernel per ('f','sp')
    shard with the partitioner's psum over 'f' in the separate mix --
    vs single-device sequential steps, on the virtual 8-device CPU mesh
    (f=2 x sp=4; per-shard bins 1024/4 = 256, the pallas floor)."""
    import functools

    monkeypatch.setenv("BRUTEFIR_TPU_PAIR", "force:4")
    from jax.sharding import NamedSharding, PartitionSpec as P
    from brutefir_tpu.graph import build_graph_spec, make_ctrl
    from brutefir_tpu.graph.compile import (_group_step_impl, _step_impl,
                                            StepState, group_size)
    from brutefir_tpu.ops.partconv import preprocess_coeffs, make_bank
    from brutefir_tpu.parallel.mesh import make_mesh, step_shardings

    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs the 8-device virtual CPU mesh")
    mesh = make_mesh(devices[:8], f_axis=2)

    N, B, C, G = 1024, 4, 8, 4
    rng = np.random.default_rng(21)
    spec = build_graph_spec(N, B, C, C, [[] for _ in range(C)],
                            [False] * C)
    # the mesh gate admits this shape (routing proof for the sharded
    # grouped selection itself)
    assert group_size(spec, "pallas-interpret", None, mesh, 8) >= 2

    taps = rng.standard_normal(N * B).astype(np.float32) * 0.05
    bank = np.asarray(make_bank([preprocess_coeffs(taps, N, B)]))
    bank_t = jnp.asarray(bank.reshape(spec.bank_shape(1, True)))
    delays = np.asarray([0, 1, 0, 2, 0, 0, 1, 0], np.int32)
    mask = np.zeros((C, B), np.float32)
    for f in range(C):
        mask[f, : B - delays[f]] = 1.0
    ctrl = make_ctrl(
        spec,
        in_mix=np.eye(C, dtype=np.float32),
        fmix=np.zeros((C, C), np.float32),
        out_mix=rng.standard_normal((C, C)).astype(np.float32) * 0.3,
        delay=delays,
        coeff_idx=np.zeros(C, np.int32),
        mask=mask,
    )
    state = StepState(
        prev_in=jnp.zeros((C, N), np.float32),
        ring=jnp.zeros(spec.ring_shape(True), np.float32),
        eval_prev=jnp.zeros((spec.n_casc, N), np.float32),
        t=jnp.zeros((), jnp.int32))
    xs = [jnp.asarray(rng.standard_normal((C, N)).astype(np.float32))
          for _ in range(G)]

    # single-device sequential oracle
    step = jax.jit(functools.partial(_step_impl, spec,
                                     "pallas-interpret", tiled=True))
    st_s, refs = state, []
    for x in xs:
        st_s, y = step(st_s, ctrl, bank_t, x)
        refs.append(y)

    # sharded grouped program
    st_sh, ct_sh, bank_sh, x_sh, _ = step_shardings(
        mesh, True, spec.n_bins // 128)

    def replicate(a):
        return jax.lax.with_sharding_constraint(
            a, NamedSharding(mesh, P(*([None] * a.ndim))))

    grouped = jax.jit(functools.partial(
        _group_step_impl, spec, "pallas-interpret", mesh=mesh,
        constrain=replicate))
    state_p = jax.tree.map(jax.device_put, state, st_sh)
    ctrl_p = jax.tree.map(jax.device_put, ctrl, ct_sh)
    bank_p = jax.device_put(bank_t, bank_sh)
    xs_p = [jax.device_put(x, x_sh) for x in xs]
    stg, ys = grouped(state_p, ctrl_p, bank_p, xs_p)

    for y, ref in zip(ys, refs):
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                                   rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(stg.ring),
                               np.asarray(st_s.ring),
                               rtol=3e-5, atol=3e-5)
