"""Live JACK/PulseAudio smoke tests (tools/sound_server_smoke.py).

These run only where the daemons exist; this build image has neither
(docs/PARITY.md #9), so they skip with the documented blocker. CI hosts
with jackd/pulseaudio exercise one real callback cycle / pa_simple_write.
"""

import ctypes.util
import shutil
import subprocess
import sys

import pytest


def _have(binary, lib):
    return (shutil.which(binary) is not None
            and ctypes.util.find_library(lib) is not None)


@pytest.mark.skipif(not _have("jackd", "jack"),
                    reason="no jackd/libjack in this environment "
                           "(docs/PARITY.md #9)")
def test_jack_live_smoke():
    rc = subprocess.run(
        [sys.executable, "tools/sound_server_smoke.py", "jack"],
        timeout=120).returncode
    assert rc == 0


@pytest.mark.skipif(not _have("pulseaudio", "pulse-simple"),
                    reason="no pulseaudio/libpulse-simple in this "
                           "environment (docs/PARITY.md #9)")
def test_pulse_live_smoke():
    rc = subprocess.run(
        [sys.executable, "tools/sound_server_smoke.py", "pulse"],
        timeout=120).returncode
    assert rc == 0
