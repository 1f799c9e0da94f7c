"""Build and run the reference golden-vector harness.

Compiles tools/golden/harness.c against the reference sources at
/root/reference (headers only -- dither.c is compiled in, no FFTW), runs
it, and writes the vectors + manifest into tests/golden/.

Usage: python tools/golden/gen_golden.py [outdir]
"""

from __future__ import annotations

import os
import subprocess
import sys

REF = os.environ.get("BRUTEFIR_REFERENCE", "/root/reference")
HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))


def gen_defaults_file(outdir):
    """Capture the reference's auto-created defaults file byte-for-byte.

    ``create_default_config`` is static inside bfconf.c (which needs the
    flex lexer and FFTW to compile whole), so the function text is
    extracted verbatim from the source at build time, compiled in a tiny
    wrapper whose ``tilde_expansion`` stub redirects the output path, and
    run -- reference-compiled truth without hand-copying the string."""
    src = open(os.path.join(REF, "bfconf.c")).read()
    pos = src.index("create_default_config(void)")
    start = src.rindex("static void", 0, pos)
    end = src.index("\n}\n", pos) + 3
    wrapper = (
        '#include <stdio.h>\n#include <stdlib.h>\n#include <string.h>\n'
        '#include <errno.h>\n#include "defs.h"\n#include "bfmod.h"\n'
        '#define CONVOLVER_NEEDS_CONFIGFILE 1\n'
        '#define DEFAULT_BFCONF_NAME "~/.brutefir_defaults"\n'
        'static const char *tilde_expansion(const char path[]) {\n'
        '    (void)path; return getenv("GOLDEN_DEFAULTS_OUT");\n}\n'
        + src[start:end]
        + '\nint main(void) { create_default_config(); return 0; }\n')
    cfile = os.path.join(HERE, "defaults_gen.c")
    exe = os.path.join(HERE, "defaults_gen")
    with open(cfile, "w") as f:
        f.write(wrapper)
    subprocess.run(["gcc", "-O2", "-I", REF, cfile, "-o", exe], check=True)
    out = os.path.join(outdir, "defaults_file.txt")
    env = dict(os.environ, GOLDEN_DEFAULTS_OUT=out)
    subprocess.run([exe], check=True, env=env)
    os.unlink(cfile)
    os.unlink(exe)


def main(outdir=None):
    outdir = outdir or os.path.join(REPO, "tests", "golden")
    os.makedirs(outdir, exist_ok=True)
    exe = os.path.join(HERE, "harness")
    cmd = ["gcc", "-O2", "-I", REF,
           os.path.join(HERE, "harness.c"),
           os.path.join(REF, "dither.c"),
           os.path.join(REF, "firwindow.c"),
           os.path.join(REF, "delay.c"),
           "-lm", "-o", exe]
    subprocess.run(cmd, check=True)
    subprocess.run([exe, outdir], check=True)
    gen_defaults_file(outdir)
    print(f"wrote {len(os.listdir(outdir))} files to {outdir}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
