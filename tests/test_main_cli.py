"""Top-level CLI entry (__main__) and defaults-file behavior."""

import os
import subprocess
import sys

import numpy as np
import pytest

from brutefir_tpu.__main__ import main, parse_config_probe
from brutefir_tpu.config.defaults import (
    DEFAULT_CONFIG_TEXT, ensure_defaults_file)


def test_defaults_file_roundtrip(tmp_path):
    path = ensure_defaults_file(str(tmp_path / "defaults"))
    text = open(path).read()
    assert text == DEFAULT_CONFIG_TEXT
    # parses as a defaults layer
    from brutefir_tpu.config import parse_config
    conf = parse_config("""
coeff 0 { filename: "dirac pulse"; format: "PROCESSED"; };
input 0 { device: "file" { path: "/dev/zero"; }; sample: "S16_LE"; channels: 1; };
output 0 { device: "file" { path: "/dev/null"; }; sample: "S16_LE"; channels: 1; };
filter 0 { from_inputs: 0; to_outputs: 0; coeff: 0; };
""", defaults_text=text)
    assert conf.sampling_rate == 44100
    assert conf.safety_limit == pytest.approx(10.0)  # 20 dB


def test_config_file_probe():
    assert parse_config_probe(DEFAULT_CONFIG_TEXT).endswith(".brutefir_config")


def test_main_runs_config(tmp_path, rng):
    x = rng.standard_normal(256 * 2).astype("<f4")
    inp, outp = tmp_path / "in.f32", tmp_path / "out.f32"
    x.tofile(inp)
    cfg = tmp_path / "config"
    cfg.write_text(f"""
sampling_rate: 44100;
filter_length: 256;
coeff 0 {{ filename: "dirac pulse"; }};
input 0 {{ device: "file" {{ path: "{inp}"; }}; sample: "FLOAT_LE"; channels: 1; }};
output 0 {{ device: "file" {{ path: "{outp}"; }}; sample: "FLOAT_LE"; channels: 1; }};
filter 0 {{ from_inputs: 0; to_outputs: 0; coeff: 0; }};
""")
    rc = main(["-quiet", "-nodefault", str(cfg)])
    assert rc == 0
    y = np.fromfile(outp, dtype="<f4")
    np.testing.assert_allclose(y, x, atol=1e-4)


def test_main_usage_errors(tmp_path):
    assert main(["-bogus"]) == 2
    assert main(["-nodefault"]) == 2  # no config file given
    assert main(["-nodefault", str(tmp_path / "nonexistent")]) in (1, 2)


def test_init_error_exit_code(tmp_path, monkeypatch):
    """Init-time failures (unknown device) exit with a clean message and
    a deliberate code, not a traceback."""
    import subprocess
    import sys as _sys
    import os
    cfg = tmp_path / "bad.conf"
    cfg.write_text("""
sampling_rate: 44100;
filter_length: 256,2;
coeff 0 { filename: "dirac pulse"; };
input 0 { device: "nosuchdev" {}; sample: "S16_LE"; channels: 1; };
output 0 { device: "file" { path: "/dev/null"; }; sample: "S16_LE"; channels: 1; dither: false; };
filter 0 { from_inputs: 0; to_outputs: 0; coeff: 0; };
""")
    code = (f"import sys, jax; jax.config.update('jax_platforms', 'cpu'); "
            f"sys.argv = ['brutefir_tpu', '-nodefault', {str(cfg)!r}]; "
            f"import runpy; runpy.run_module('brutefir_tpu', "
            f"run_name='__main__')")
    env = dict(os.environ)
    env["PYTHONPATH"] = os.getcwd() + ":" + env.get("PYTHONPATH", "")
    r = subprocess.run([_sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=120, env=env)
    # SystemExit(1) from main(); message clean, no engine traceback
    assert r.returncode == 1
    assert "unknown I/O module" in r.stderr
    assert "Traceback (most recent call last)" not in r.stderr.split(
        "SystemExit")[0].split("unknown I/O module")[0]


def test_escaped_backslash_string(tmp_path):
    """A string ending in an escaped backslash must not swallow the
    following tokens (flex reference pattern excludes backslash from
    the plain char class)."""
    from brutefir_tpu.config.lexer import tokenize, T
    toks = list(tokenize(r'path: "C:\\"; other: "x";'))
    kinds = [t.kind for t in toks]
    assert kinds.count(T.STRING) == 2
    assert toks[1].value == "C:\\"
