"""The shipped example configs must parse and run end to end."""

import os
import re

import numpy as np

from brutefir_tpu.config import parse_config
from brutefir_tpu.runtime.engine import Engine

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


def _load(name, tmp_path, taps=None, rate_frames=4096, channels=2):
    text = open(os.path.join(EXAMPLES, name)).read()
    # point placeholder files at generated ones
    inp = tmp_path / "input.f32"
    x = (np.random.RandomState(1).standard_normal(
        (rate_frames, channels)) * 0.1).astype("<f4")
    x.tofile(inp)
    text = text.replace('"input.f32"', f'"{inp}"')
    text = re.sub(r'"output\.(s24|f32)"', f'"{tmp_path / "out.raw"}"', text)
    for coeff_file in ("lp.txt", "hp.txt"):
        p = tmp_path / coeff_file
        p.write_text("\n".join(
            repr(float(v)) for v in (taps if taps is not None
                                     else [1.0, 0.5, 0.25])))
        text = text.replace(f'"{coeff_file}"', f'"{p}"')
    # unix sockets in tmp, not /tmp
    text = text.replace('"/tmp/brutefir.sock"',
                        f'"{tmp_path / "bf.sock"}"')
    return parse_config(text)


def test_crossover_example_runs(tmp_path):
    conf = _load("crossover_2way.conf", tmp_path)
    eng = Engine(conf)
    stats = eng.run()
    assert stats["frames"] == 4096
    out = np.fromfile(tmp_path / "out.raw", dtype=np.uint8)
    assert len(out) == 4096 * 4 * 3      # S24_LE, 4 channels


def test_room_correction_example_runs(tmp_path):
    frames = 10 * 8192
    conf = _load("room_correction_eq.conf", tmp_path, rate_frames=frames)
    eng = Engine(conf)
    stats = eng.run()
    assert stats["frames"] == frames
    out = np.fromfile(tmp_path / "out.raw", dtype="<f4").reshape(-1, 2)
    assert out.shape[0] == frames
    # a flat EQ renders a linear-phase taps/2-sample delay (test_eq.py)
    x = np.fromfile(tmp_path / "input.f32", dtype="<f4").reshape(-1, 2)
    d = 8192 * 8 // 2
    expect = np.concatenate([np.zeros((d, 2), np.float32), x[:frames - d]])
    np.testing.assert_allclose(out, expect, rtol=0, atol=2e-3)


def test_xtc_example_runs(tmp_path):
    text = open(os.path.join(EXAMPLES, "xtc_lowlatency.conf")).read()
    inp = tmp_path / "input.f32"
    x = (np.random.RandomState(2).standard_normal((2048, 2)) * 0.1).astype("<f4")
    x.tofile(inp)
    text = text.replace('"input.f32"', f'"{inp}"')
    text = re.sub(r'"output\.(s24|f32)"', f'"{tmp_path / "out.raw"}"', text)
    for cf in ("direct.txt", "cross.txt"):
        p = tmp_path / cf
        p.write_text("\n".join(repr(float(v))
                               for v in np.random.RandomState(3)
                               .standard_normal(200) * 0.05))
        text = text.replace(f'"{cf}"', f'"{p}"')
    conf = parse_config(text)
    stats = Engine(conf).run()
    assert stats["frames"] == 2048


def test_massive_example_parses_and_runs_small(tmp_path):
    """The massive example, shrunk to test scale (taps truncate into the
    same partition layout), runs end to end."""
    text = open(os.path.join(EXAMPLES, "multichannel_massive.conf")).read()
    inp = tmp_path / "input.raw"
    x = np.clip((np.random.RandomState(4).standard_normal(
        (8192, 26)) * 2 ** 20).round(), -(2 ** 23), 2 ** 23 - 1)
    x.astype("<i4").tofile(inp)
    text = text.replace('"input.raw"', f'"{inp}"')
    text = text.replace('"output.raw"', f'"{tmp_path / "out.raw"}"')
    p = tmp_path / "correction.txt"
    p.write_text("1.0\n")          # short coeff: zero-padded partitions
    text = text.replace('"correction.txt"', f'"{p}"')
    conf = parse_config(text)
    eng = Engine(conf)
    assert eng.control.snapshot() is not None
    eng.control.snapshot()
    assert eng.control.snapshot_uniform   # shared coeff -> uniform program
    stats = eng.run()
    assert stats["frames"] == 8192
