"""The parser must fail cleanly (ConfigParseError), never crash."""

import random

import pytest

from brutefir_tpu.config import parse_config, ConfigParseError

GOOD = """
sampling_rate: 44100; filter_length: 256;
coeff 0 { filename: "dirac pulse"; };
input 0 { device: "file" { path: "/dev/zero"; }; sample: "S16_LE"; channels: 1; };
output 0 { device: "file" { path: "/dev/null"; }; sample: "S16_LE"; channels: 1; };
filter 0 { from_inputs: 0; to_outputs: 0; coeff: 0; };
"""


def test_truncations_fail_cleanly():
    for cut in range(0, len(GOOD), 7):
        try:
            parse_config(GOOD[:cut])
        except ConfigParseError:
            pass


def test_mutations_fail_cleanly():
    rnd = random.Random(7)
    tokens = list(GOOD)
    for _ in range(300):
        s = list(GOOD)
        for _ in range(rnd.randint(1, 4)):
            i = rnd.randrange(len(s))
            s[i] = rnd.choice('{};:,/"0aZ #\n')
        try:
            parse_config("".join(s))
        except (ConfigParseError, RecursionError):
            pass
