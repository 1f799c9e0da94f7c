"""Scale stress: a 64-channel, 64-filter graph (BF_MAXCHANNELS direction)."""

import numpy as np

from brutefir_tpu.config import parse_config
from brutefir_tpu.runtime import Engine


def test_64_channel_graph(tmp_path, rng):
    C, N, B = 64, 128, 2
    x = rng.standard_normal((C, N * 3)).astype(np.float32) * 0.2
    inp, outp = tmp_path / "in.f32", tmp_path / "out.f32"
    np.ascontiguousarray(x.T.astype("<f4")).tofile(inp)
    chans = ",".join(str(i) for i in range(C))
    filters = "\n".join(
        f"filter {i} {{ from_inputs: {i}; to_outputs: {(i + 1) % C}; coeff: 0; }};"
        for i in range(C))
    conf = parse_config(f"""
sampling_rate: 44100;
filter_length: {N},{B};
coeff 0 {{ filename: "dirac pulse"; }};
input {chans} {{ device: "file" {{ path: "{inp}"; }}; sample: "FLOAT_LE"; channels: {C}; }};
output {chans} {{ device: "file" {{ path: "{outp}"; }}; sample: "FLOAT_LE"; channels: {C}; }};
{filters}
""")
    Engine(conf).run()
    y = np.fromfile(outp, dtype="<f4").reshape(-1, C).T
    # channel rotation by the graph wiring
    for i in range(C):
        np.testing.assert_allclose(y[(i + 1) % C], x[i], atol=1e-4)
