#!/usr/bin/env python
"""Live sound-server smoke test: JACK (dummy driver) and PulseAudio
(null sink).

Converts the JACK/Pulse clients from "written" to "working" wherever the
environment provides the daemons (docs/PARITY.md #9): spins up a server,
runs a short engine config against it, and checks that real audio
callbacks / writes happened. In environments without jackd/pulseaudio
(like this build image: no libjack/libpulse/libasound, verified via
ldconfig) it exits 2 with a clear message -- the documented blocker.

Usage: python tools/sound_server_smoke.py [jack|pulse|all]

Exit codes: 0 = every available server passed; 1 = a live test failed;
2 = no server available (environment-blocked).
"""

import os
import shutil
import signal
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def have(binary: str, lib: str) -> bool:
    if shutil.which(binary) is None:
        return False
    import ctypes.util
    return ctypes.util.find_library(lib) is not None


def run_engine_blocks(config_text: str, blocks: int = 20) -> dict:
    import jax
    jax.config.update("jax_platforms", "cpu")  # latency, not throughput
    from brutefir_tpu.config import parse_config
    from brutefir_tpu.runtime import Engine
    conf = parse_config(config_text)
    eng = Engine(conf)
    stats = eng.run(max_blocks=blocks)
    return stats


def smoke_jack() -> bool:
    """jackd -d dummy; engine writes N blocks through JackDevice; pass if
    the engine completed blocks (each one is a real process callback)."""
    env = dict(os.environ, JACK_NO_START_SERVER="1")
    srv = subprocess.Popen(
        ["jackd", "-r", "-d", "dummy", "-r", "44100", "-p", "256"],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL, env=env)
    try:
        time.sleep(2.0)
        if srv.poll() is not None:
            print("jack: server failed to start")
            return False
        cfg = """
sampling_rate: 44100;
filter_length: 256,2;
coeff 0 { filename: "dirac pulse"; };
input 0,1 { device: "file" { path: "/dev/zero"; };
            sample: "FLOAT_LE"; channels: 2; };
output 0,1 { device: "jack" { clientname: "bftpu_smoke"; };
             sample: "FLOAT_LE"; channels: 2; dither: false; };
filter 0 { from_inputs: 0; to_outputs: 0; coeff: 0; };
filter 1 { from_inputs: 1; to_outputs: 1; coeff: 0; };
"""
        stats = run_engine_blocks(cfg)
        ok = stats["blocks"] >= 10
        print(f"jack: {'PASS' if ok else 'FAIL'} "
              f"({stats['blocks']} blocks through the callback bridge)")
        return ok
    finally:
        srv.send_signal(signal.SIGTERM)
        srv.wait(timeout=10)


def smoke_pulse() -> bool:
    """pulseaudio with a null sink; engine writes through PulseDevice
    (libpulse-simple blocking writes); pass if blocks completed."""
    rt = tempfile.mkdtemp(prefix="pa_smoke")
    env = dict(os.environ, PULSE_RUNTIME_PATH=rt, XDG_RUNTIME_DIR=rt,
               HOME=rt)
    srv = subprocess.Popen(
        ["pulseaudio", "-n", "--daemonize=no", "--exit-idle-time=-1",
         "--load=module-null-sink sink_name=null",
         "--load=module-native-protocol-unix"],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL, env=env)
    os.environ["PULSE_RUNTIME_PATH"] = rt
    try:
        time.sleep(2.0)
        if srv.poll() is not None:
            print("pulse: server failed to start")
            return False
        cfg = """
sampling_rate: 44100;
filter_length: 256,2;
coeff 0 { filename: "dirac pulse"; };
input 0,1 { device: "file" { path: "/dev/zero"; };
            sample: "FLOAT_LE"; channels: 2; };
output 0,1 { device: "pulse" { device: "null"; };
             sample: "S16_LE"; channels: 2; dither: false; };
filter 0 { from_inputs: 0; to_outputs: 0; coeff: 0; };
filter 1 { from_inputs: 1; to_outputs: 1; coeff: 0; };
"""
        stats = run_engine_blocks(cfg)
        ok = stats["blocks"] >= 10
        print(f"pulse: {'PASS' if ok else 'FAIL'} "
              f"({stats['blocks']} blocks via pa_simple_write)")
        return ok
    finally:
        srv.send_signal(signal.SIGTERM)
        srv.wait(timeout=10)
        os.environ.pop("PULSE_RUNTIME_PATH", None)


def main() -> int:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    ran, failed = 0, 0
    if which in ("jack", "all"):
        if have("jackd", "jack"):
            ran += 1
            failed += 0 if smoke_jack() else 1
        else:
            print("jack: no jackd/libjack in this environment "
                  "(docs/PARITY.md #9)")
    if which in ("pulse", "all"):
        if have("pulseaudio", "pulse-simple"):
            ran += 1
            failed += 0 if smoke_pulse() else 1
        else:
            print("pulse: no pulseaudio/libpulse-simple in this "
                  "environment (docs/PARITY.md #9)")
    if ran == 0:
        print("environment-blocked: no sound server available")
        return 2
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
