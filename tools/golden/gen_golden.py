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


def main(outdir=None):
    outdir = outdir or os.path.join(REPO, "tests", "golden")
    os.makedirs(outdir, exist_ok=True)
    exe = os.path.join(HERE, "harness")
    cmd = ["gcc", "-O2", "-I", REF,
           os.path.join(HERE, "harness.c"),
           os.path.join(REF, "dither.c"),
           os.path.join(REF, "firwindow.c"),
           "-lm", "-o", exe]
    subprocess.run(cmd, check=True)
    subprocess.run([exe, outdir], check=True)
    print(f"wrote {len(os.listdir(outdir))} files to {outdir}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
