"""Command-line entry point (the analog of `brutefir.c:27-95`).

Usage: python -m brutefir_tpu [-quiet] [-nodefault] [-daemon] [config file]

Without -nodefault the two-level config applies: ``~/.brutefir_defaults``
(auto-created on first run) is parsed first, then the main config (default
path from the defaults file's ``config_file`` setting).
"""

from __future__ import annotations

import os
import sys

from .config.defaults import ensure_defaults_file
from .config.parser import parse_config_file, ConfigParseError
from .errors import (BFError, BF_EXIT_OK, BF_EXIT_OTHER, BF_EXIT_INVALID_CONFIG,
                     BF_EXIT_NO_MEMORY, BF_EXIT_INVALID_INPUT,
                     BF_EXIT_BUFFER_UNDERFLOW)
from .runtime.engine import Engine

USAGE = ("Usage: %s [-quiet] [-nodefault] [-daemon] [config file]\n")


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    quiet = nodefault = daemon = False
    config_file = None
    for a in argv:
        if a == "-quiet":
            quiet = True
        elif a == "-nodefault":
            nodefault = True
        elif a == "-daemon":
            daemon = True
        elif a.startswith("-"):
            sys.stderr.write(USAGE % "brutefir_tpu")
            return BF_EXIT_INVALID_CONFIG
        elif config_file is None:
            config_file = a
        else:
            sys.stderr.write(USAGE % "brutefir_tpu")
            return BF_EXIT_INVALID_CONFIG

    try:
        defaults_path = None
        if not nodefault:
            defaults_path = ensure_defaults_file()
        if config_file is None:
            if nodefault:
                sys.stderr.write("No configuration file given.\n")
                return BF_EXIT_INVALID_CONFIG
            # the defaults file's config_file setting decides
            with open(defaults_path) as fh:
                dtext = fh.read()
            probe = parse_config_probe(dtext)
            config_file = probe or os.path.expanduser("~/.brutefir_config")
        conf = parse_config_file(config_file, defaults_path)
        conf.quiet = quiet
    except ConfigParseError as e:
        sys.stderr.write(f"{e}\n")
        return BF_EXIT_INVALID_CONFIG
    except OSError as e:
        sys.stderr.write(f"{e}\n")
        return BF_EXIT_OTHER

    import signal

    def _exit_code(e) -> int:
        # reference exit-code contract (bfmod.h:64-70): every abort-worthy
        # exception is a BFError carrying its typed BF_EXIT_* code
        # (errors.py), so supervisors can distinguish underflow and
        # invalid-signal aborts without message sniffing
        return getattr(e, "exit_code", BF_EXIT_OTHER)

    # daemonize BEFORE the engine exists: constructing it initializes
    # the JAX/XLA client and its worker threads, and fork() in that
    # state leaves the child's runtime broken (thread pools do not
    # survive fork). The reference's contract -- a supervisor must not
    # see exit 0 before the engine actually came up -- is kept via a
    # readiness pipe: the parent exits with the code the child reports
    # after its initialization.
    daemon_w = None
    if daemon:
        r, w = os.pipe()
        if os.fork() != 0:
            os.close(w)
            status = os.read(r, 1)
            os.close(r)
            return status[0] if status else BF_EXIT_OTHER
        os.close(r)
        daemon_w = w
        # detach from the controlling terminal (the reference's
        # setsid(), brutefir.c:78-81): without it a closed terminal
        # HUPs the "daemon". The reference's chdir("/") is NOT copied
        # -- coeff paths resolve at parse but output files open at
        # engine setup, and relative paths must keep working -- and
        # neither is umask(0) (world-writable outputs).
        try:
            os.setsid()
        except OSError:
            pass   # already a session leader

    def _report_ready(code: int):
        nonlocal daemon_w
        if daemon_w is not None:
            try:
                os.write(daemon_w, bytes([code & 0xFF]))
                os.close(daemon_w)
            except OSError:
                pass
            daemon_w = None

    try:
        eng = Engine(conf)
    except BFError as e:
        # init-time failures (device open, float64-on-TPU, AUTO format)
        # still honor the clean-message + exit-code contract
        sys.stderr.write(f"{e}\n")
        _report_ready(_exit_code(e))
        return _exit_code(e)
    _report_ready(BF_EXIT_OK)

    def _stop(signum, frame):
        eng.stop()

    signal.signal(signal.SIGINT, _stop)
    signal.signal(signal.SIGTERM, _stop)
    try:
        # clockless runs (file-to-file, the reference's benchmark rig)
        # have no latency contract, so dispatch scan-batched for
        # throughput (run_offline falls back to run() when the device-IO
        # path or config does not allow batching). Clocked devices keep
        # the per-block pipeline and its fixed 2N latency, and so do
        # clockless devices on live endpoints (pipes/FIFOs/ttys, e.g.
        # `path: "/dev/stdin";` pipelines): batching there would add
        # batch_blocks*N of latency and bursty writes a peer can see.
        # benchmark/debug keep run(): the per-10-periods stage table
        # (bfrun.c:2035-2078) and the event timeline live there
        clockless = (all(not inst.uses_sample_clock and inst.batch_safe
                         for io in (0, 1) for inst in eng.devices[io])
                     and not conf.benchmark and not conf.debug)
        if clockless:
            try:
                batch = int(os.environ.get("BRUTEFIR_TPU_BATCH", "8"))
            except ValueError:
                sys.stderr.write(
                    "BRUTEFIR_TPU_BATCH must be an integer; using 8\n")
                batch = 8
            stats = eng.run_offline(batch_blocks=batch)
        else:
            stats = eng.run()
    except BFError as e:
        sys.stderr.write(f"{e}\n")
        return _exit_code(e)
    if not quiet:
        sys.stderr.write(
            f"Finished: {stats['blocks']} blocks, {stats['frames']} frames, "
            f"{stats['xrt']:.1f}x realtime.\n")
    return BF_EXIT_OK


def parse_config_probe(defaults_text: str):
    """Extract the config_file setting from the defaults file, if present."""
    from .config.lexer import tokenize, T
    toks = list(tokenize(defaults_text))
    for i, t in enumerate(toks):
        if t.kind == T.FIELD and t.value == "config_file":
            if i + 1 < len(toks) and toks[i + 1].kind == T.STRING:
                return os.path.expanduser(toks[i + 1].value)
    return None


if __name__ == "__main__":
    sys.exit(main())
