"""Regression tests for the round-3 config/control/io review findings."""

import numpy as np
import pytest

from brutefir_tpu.config import parse_config
from brutefir_tpu.config.lexer import ConfigParseError


def _base(n_filters_extra="", coeffs=""):
    return f"""
sampling_rate: 44100;
filter_length: 64,2;
coeff 0 {{ filename: "dirac pulse"; }};
{coeffs}
input 0 {{ device: "file" {{ path: "/dev/zero"; }}; sample: "FLOAT_LE"; channels: 1; }};
output 0 {{ device: "file" {{ path: "/dev/null"; }}; sample: "FLOAT_LE"; channels: 1; }};
{n_filters_extra}
"""


def test_loop_not_containing_first_filter_is_clean_error():
    """A cycle B<->C probed from A must raise the config error, not
    RecursionError (the old recursion had no visited set)."""
    cfg = _base("""
filter "A" { from_inputs: 0; to_filters: "B"; coeff: -1; };
filter "B" { from_inputs: 0; from_filters: "A", "C"; to_filters: "C"; to_outputs: 0; coeff: -1; };
filter "C" { from_filters: "B"; to_filters: "B"; coeff: -1; };
""")
    with pytest.raises(ConfigParseError, match="loop"):
        parse_config(cfg)


def test_deep_diamond_dag_parses_fast():
    """30 chained diamonds are loop-free; exponential recursion would
    hang here for 2^30 steps."""
    n = 30
    blocks = ['filter "d0" { from_inputs: 0; to_filters: "a0", "b0"; '
              "coeff: -1; };"]
    for i in range(n):
        blocks.append(f'filter "a{i}" {{ from_filters: "d{i}"; '
                      f'to_filters: "m{i}"; coeff: -1; }};')
        blocks.append(f'filter "b{i}" {{ from_filters: "d{i}"; '
                      f'to_filters: "m{i}"; coeff: -1; }};')
        merge_out = (f'to_filters: "d{i + 1}"; ' if i + 1 < n
                     else "to_outputs: 0; ")
        blocks.append(f'filter "m{i}" {{ from_filters: "a{i}", "b{i}"; '
                      f"{merge_out}coeff: -1; }};")
        if i + 1 < n:
            blocks.append(
                f'filter "d{i + 1}" {{ from_filters: "m{i}"; '
                f'to_filters: "a{i + 1}", "b{i + 1}"; coeff: -1; }};')
    conf = parse_config(_base("\n".join(blocks)))
    assert len(conf.filters) > 3 * n


def test_filter_edge_alias_repeat_rejected():
    """'inputs' and 'from_inputs' share one repeat bit
    (bfconf.c:1046-1055): both in one filter block is an error."""
    cfg = _base("""
filter 0 { inputs: 0; from_inputs: 0; to_outputs: 0; coeff: 0; };
""")
    with pytest.raises(ConfigParseError, match="already set"):
        parse_config(cfg)


def test_safety_limit_zero_is_reference_quirk():
    """'safety_limit: 0;' converts to 10^0 = 1.0 linear -- the
    reference does the same unconditional pow (bfconf.c:1631), so a
    0 dB abort threshold is the (quirky) contract, not 'disabled'."""
    cfg = "safety_limit: 0;" + _base(
        "filter 0 { from_inputs: 0; to_outputs: 0; coeff: 0; };")
    conf = parse_config(cfg)
    assert conf.safety_limit == 1.0


def test_cli_quoted_names_with_spaces(tmp_path, rng):
    """Names containing spaces stay addressable over the CLI: get_id
    scans to the closing quote (bflogic_cli.c:295-299)."""
    import io as _io
    from brutefir_tpu.control.cli import CliModule, _SleepTask
    from brutefir_tpu.runtime import Engine

    x = rng.standard_normal(64 * 4).astype("<f4")
    inp = tmp_path / "in.f32"
    x.tofile(inp)
    conf = parse_config(f"""
sampling_rate: 44100;
filter_length: 64,2;
coeff "my coeff" {{ filename: "dirac pulse"; }};
input 0 {{ device: "file" {{ path: "{inp}"; }}; sample: "FLOAT_LE"; channels: 1; }};
output 0 {{ device: "file" {{ path: "{tmp_path}/o.f32"; }}; sample: "FLOAT_LE"; channels: 1; }};
filter "low pass" {{ from_inputs: 0; to_outputs: 0; coeff: "my coeff"; }};
""")
    eng = Engine(conf)
    mod = CliModule({}, eng)
    out = _io.StringIO()
    assert mod.run_line(out, 'cfc "low pass" "my coeff"', _SleepTask())
    assert "no filter" not in out.getvalue()
    out = _io.StringIO()
    mod.run_line(out, 'cfc "low pass" 0; lf', _SleepTask())
    assert "no filter" not in out.getvalue()
    assert "low pass" in out.getvalue()


def test_text_input_bad_token_is_clean_io_error(tmp_path):
    """A stray non-numeric token in a text-mode input stream raises the
    module's typed error (the reference's 'bad text format' strtod
    check), not an uncaught ValueError."""
    from brutefir_tpu.io import IoModuleError
    from brutefir_tpu.runtime import Engine

    inp = tmp_path / "in.txt"
    inp.write_text("0.1\n0.2\nxyz\n0.3\n" * 64)
    conf = parse_config(f"""
sampling_rate: 44100;
filter_length: 64,2;
coeff 0 {{ filename: "dirac pulse"; }};
input 0 {{ device: "file" {{ path: "{inp}"; text: true; }}; sample: "FLOAT64_NE"; channels: 1; }};
output 0 {{ device: "file" {{ path: "{tmp_path}/o.f32"; }}; sample: "FLOAT_LE"; channels: 1; }};
filter 0 {{ from_inputs: 0; to_outputs: 0; coeff: 0; }};
""")
    eng = Engine(conf)
    with pytest.raises(IoModuleError, match="bad text format"):
        eng.run()
