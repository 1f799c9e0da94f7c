"""CLI command fuzzing: garbage input must never crash the module.

The reference's CLI tolerates arbitrary client input (parse_command,
bflogic_cli.c) -- a malformed line prints an error and the session
lives on. run_line here must uphold the same contract: no exception
for ANY byte salad, every response a string, and the engine still
processes audio afterwards.
"""

import io

import numpy as np

from brutefir_tpu.control.cli import CliModule, _SleepTask
from tests.test_cli import make_engine

COMMANDS = ["lf", "lc", "li", "lo", "lm", "cfoa", "cfia", "cffa", "cfc",
            "cfd", "cod", "cid", "tmo", "tmi", "imc", "omc", "lmc", "sleep",
            "block", "stop", "tp", "ppk", "rpk", "upk", "rti", "quit",
            "help"]

JUNK = ["", " ", ";", ";;;", "\x00", "\xff\xfe", "🎛️", "(", ")", "-", "--",
        "1e309", "nan", "inf", "-inf", "0x41", "9" * 400, "a" * 10000,
        "\t\n\r", "'", '"', "\\", "%s%n", "../../../etc/passwd"]


def _drive(mod, lines):
    st = _SleepTask()
    for line in lines:
        out = io.StringIO()
        ok = mod.run_line(out, line, st)
        assert isinstance(ok, bool)
        out.getvalue()  # must be a readable string


def test_run_line_survives_byte_salad(tmp_path, rng):
    eng, x, outp = make_engine(tmp_path, rng, 64 * 4)
    mod = CliModule({}, eng)
    _drive(mod, JUNK)
    # every command with junk / missing / overflowing arguments
    lines = []
    for cmd in COMMANDS:
        if cmd == "quit":
            continue  # quit legitimately ends the session
        for arg in ("", " zz", " -1", " 999999", " 1 zz", " 0 1e309",
                    " 0 nan", " \x00", " 0 0 0 0 0", " 'x'"):
            lines.append(cmd + arg)
    _drive(mod, lines)
    # seeded random token soup
    r = np.random.RandomState(99)
    alphabet = list("abcdefgortz0123456789 -.;:/\\\"'\x00\xff")
    for _ in range(300):
        n = r.randint(1, 60)
        lines = ["".join(alphabet[i] for i in r.randint(0, len(alphabet), n))]
        _drive(mod, lines)
    # the engine must still run audio end to end afterwards
    eng.run()
    y = np.fromfile(outp, dtype="<f4")
    assert y.size == x.size and np.all(np.isfinite(y))
