"""float_bits: 64 engine path."""

import numpy as np
import scipy.signal

from brutefir_tpu.config import parse_config
from brutefir_tpu.runtime import Engine


def test_float64_engine(tmp_path, rng):
    import jax
    jax.config.update("jax_enable_x64", True)
    try:
        N, B = 128, 2
        taps = (rng.standard_normal(N * B) * 0.1)
        tap_file = tmp_path / "t.txt"
        tap_file.write_text("\n".join(repr(float(v)) for v in taps))
        x = rng.standard_normal(N * 5)
        inp, outp = tmp_path / "in.f64", tmp_path / "out.f64"
        x.astype("<f8").tofile(inp)
        conf = parse_config(f"""
sampling_rate: 44100;
float_bits: 64;
filter_length: {N},{B};
coeff 0 {{ filename: "{tap_file}"; format: "TEXT"; }};
input 0 {{ device: "file" {{ path: "{inp}"; }}; sample: "FLOAT64_LE"; channels: 1; }};
output 0 {{ device: "file" {{ path: "{outp}"; }}; sample: "FLOAT64_LE"; channels: 1; }};
filter 0 {{ from_inputs: 0; to_outputs: 0; coeff: 0; }};
""")
        Engine(conf).run()
        y = np.fromfile(outp, dtype="<f8")
        ref = scipy.signal.fftconvolve(x, taps)[: len(x)]
        np.testing.assert_allclose(y, ref, rtol=0, atol=1e-9 * np.abs(ref).max())
    finally:
        jax.config.update("jax_enable_x64", False)
