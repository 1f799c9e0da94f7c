"""Dynamic EQ module tests: render math, hot-swap, runtime commands."""

import numpy as np
import pytest

from brutefir_tpu.config import parse_config
from brutefir_tpu.runtime import Engine


def make_eq_engine(tmp_path, rng, n_samples, eq_params, N=64, B=2):
    x = rng.standard_normal(n_samples).astype(np.float32) * 0.25
    inp, outp = tmp_path / "in.f32", tmp_path / "out.f32"
    x.astype("<f4").tofile(inp)
    conf = parse_config(f"""
sampling_rate: 44100;
filter_length: {N},{B};
logic: "eq" {{ {eq_params} }};
coeff 0 {{ filename: "dirac pulse"; shared_mem: true; }};
coeff 1 {{ filename: "dirac pulse"; shared_mem: true; }};
input 0 {{ device: "file" {{ path: "{inp}"; }}; sample: "FLOAT_LE"; channels: 1; }};
output 0 {{ device: "file" {{ path: "{outp}"; }}; sample: "FLOAT_LE"; channels: 1; }};
filter 0 {{ from_inputs: 0; to_outputs: 0; coeff: 0; }};
""")
    return Engine(conf), x, outp


def test_flat_eq_is_linear_phase_delay(tmp_path, rng):
    """A 0 dB EQ renders a pure taps/2-sample delay (linear-phase dirac)."""
    N, B = 64, 2
    eng, x, outp = make_eq_engine(
        tmp_path, rng, N * 8,
        'coeff: 0, 1; bands: 1000, 8000; magnitude: 1000/0, 8000/0;',
        N=N, B=B)
    eng.run()
    y = np.fromfile(outp, dtype="<f4")
    taps = N * B
    d = taps // 2
    expect = np.concatenate([np.zeros(d, np.float32), x[: len(x) - d]])
    np.testing.assert_allclose(y, expect, rtol=0, atol=2e-3)


def test_eq_magnitude_applied(tmp_path, rng):
    """A -20 dB EQ across all bands attenuates by 10x."""
    N, B = 64, 2
    eng, x, outp = make_eq_engine(
        tmp_path, rng, N * 8,
        'coeff: 0, 1; bands: 1000, 8000; magnitude: 1000/-20, 8000/-20;',
        N=N, B=B)
    eng.run()
    y = np.fromfile(outp, dtype="<f4")
    taps = N * B
    d = taps // 2
    expect = 0.1 * np.concatenate([np.zeros(d, np.float32), x[: len(x) - d]])
    np.testing.assert_allclose(y, expect, rtol=0, atol=3e-3)


def test_eq_runtime_command_rerender(tmp_path, rng):
    N, B = 64, 2
    eng, x, outp = make_eq_engine(
        tmp_path, rng, N * 8,
        'coeff: 0, 1; bands: "ISO octave"; magnitude: 1000/0;',
        N=N, B=B)
    eng.setup()
    eng.attach_logic()
    eqmod = eng.logic[0]

    ok, msg = eqmod.command("0 info")
    assert ok and "coefficient 0,1" in msg and "31.5" in msg

    ok, msg = eqmod.command("0 mag 1000/-20")
    assert ok and msg == "ok\n"
    ok, msg = eqmod.command("0 info")
    assert " -20.0" in msg

    ok, msg = eqmod.command("0 mag 1234/-3")
    assert not ok and "invalid frequency band" in msg

    ok, msg = eqmod.command("5 info")
    assert not ok and "not controlled" in msg
    eng.run(setup=False)
    eng.teardown()


def test_eq_double_buffer_swap(tmp_path, rng):
    """Re-render flips the active coeff; filters follow via coeff_final."""
    N, B = 64, 2
    eng, x, outp = make_eq_engine(
        tmp_path, rng, N * 8,
        'coeff: 0, 1; bands: 1000, 8000;', N=N, B=B)
    eng.setup()
    eng.attach_logic()
    eqmod = eng.logic[0]
    eq = eqmod.equalisers[0]
    a0 = eq.active
    assert eqmod._coeff_final(0, 0) == eq.coeff[a0]
    ok, _ = eqmod.command("0 mag 1000/-6")
    assert ok
    assert eq.active == 1 - a0
    assert eqmod._coeff_final(0, 0) == eq.coeff[1 - a0]
    assert eqmod._coeff_final(0, 5) == 5  # unrelated coeff untouched
    eng.teardown()


def test_eq_braced_multi_equaliser_syntax(tmp_path, rng):
    """The reference's brace-block syntax with two equalizers."""
    N, B = 64, 2
    x = rng.standard_normal(N * 4).astype(np.float32) * 0.25
    inp, outp = tmp_path / "in.f32", tmp_path / "out.f32"
    x.astype("<f4").tofile(inp)
    conf = parse_config(f"""
sampling_rate: 44100;
filter_length: {N},{B};
logic: "eq" {{
    {{ coeff: 0, 1; bands: 1000, 8000; }};
    {{ coeff: 2; bands: "ISO octave"; magnitude: 1000/-6; }};
}};
coeff 0 {{ filename: "dirac pulse"; shared_mem: true; }};
coeff 1 {{ filename: "dirac pulse"; shared_mem: true; }};
coeff 2 {{ filename: "dirac pulse"; shared_mem: true; }};
input 0 {{ device: "file" {{ path: "{inp}"; }}; sample: "FLOAT_LE"; channels: 1; }};
output 0 {{ device: "file" {{ path: "{outp}"; }}; sample: "FLOAT_LE"; channels: 1; }};
filter 0 {{ from_inputs: 0; to_outputs: 0; coeff: 0; }};
""")
    eng = Engine(conf)
    eng.setup()
    eng.attach_logic()
    eqmod = eng.logic[0]
    assert len(eqmod.equalisers) == 2
    assert eqmod.equalisers[0].coeff == [0, 1]
    assert eqmod.equalisers[1].coeff == [2, 2]  # single coeff doubles up
    eng.run(setup=False)
    eng.teardown()


def test_two_eq_modules_chain_coeff_final(tmp_path):
    """Two eq logic modules must both keep their double-buffer redirect
    (the hook chains instead of the second module replacing the first)."""
    import numpy as np
    from brutefir_tpu.config import parse_config
    from brutefir_tpu.runtime import Engine

    x = np.zeros((512, 2), "<i2")
    inp = tmp_path / "in.raw"
    x.tofile(inp)
    conf = parse_config(f"""
sampling_rate: 44100;
filter_length: 256,2;
logic: "eq" {{ coeff: 0, 1; bands: "ISO octave"; }},
       "eq" {{ coeff: 2, 3; bands: "ISO octave"; }};
coeff 0 {{ filename: "dirac pulse"; shared_mem: true; }};
coeff 1 {{ filename: "dirac pulse"; shared_mem: true; }};
coeff 2 {{ filename: "dirac pulse"; shared_mem: true; }};
coeff 3 {{ filename: "dirac pulse"; shared_mem: true; }};
input 0,1 {{ device: "file" {{ path: "{inp}"; }}; sample: "S16_LE"; channels: 2; }};
output 0,1 {{ device: "file" {{ path: "{tmp_path / 'o.raw'}"; }}; sample: "S16_LE"; channels: 2; dither: false; }};
filter 0 {{ from_inputs: 0; to_outputs: 0; coeff: 0; }};
filter 1 {{ from_inputs: 1; to_outputs: 1; coeff: 2; }};
""")
    eng = Engine(conf)
    eng.attach_logic()
    # each module redirects its own filter's coeff to that module's
    # active buffer; both redirects must survive
    hook = eng.control.coeff_final_hook
    assert hook is not None
    c0 = hook(0, 0)
    c1 = hook(1, 2)
    assert c0 in (0, 1) and c1 in (2, 3)
    # flip module 2's active buffer via its own hook path: rendering is
    # exercised by run; here the chain shape is what matters
    eng.run()
