#!/bin/sh
# Round-3 measurement batch: run when the relay/TPU is healthy, nothing
# else running concurrently (single host core + tunnel contention).
# Usage: sh tools/r3_measure.sh [logfile]
LOG="${1:-/tmp/r3_measurements.log}"
cd "$(dirname "$0")/.." || exit 1
run() {
    echo "=== $* ===" | tee -a "$LOG"
    timeout 900 "$@" 2>&1 | tee -a "$LOG"
}
echo "--- r3 measurement batch $(date -u +%FT%TZ) ---" | tee -a "$LOG"
# 0. hardware validation first (cheap; also the Mosaic compile check for
# the glue kernels' lane flip/roll — failures surface before the A/Bs)
run python tools/validate_tpu.py
run env BRUTEFIR_TPU_FFT_GLUE=pallas python tools/validate_tpu.py
# 1. crossfade dual-MAC fusion vs two passes (bench5-style, flagship)
run python tools/xfade_ab.py uniform
run python tools/xfade_ab.py alldistinct
# 2. fused Pallas FFT glue vs XLA glue (flagship component + composed)
run python tools/step_breakdown.py
run env BRUTEFIR_TPU_FFT_GLUE=pallas python tools/step_breakdown.py
# 3. bf16 bank/ring at the scale shape (MAC-only roofline view)
run env SCALE_PROBE=bf16 python tools/scale_mac_probe.py
# 4. composed scale step with the bf16 knobs (engine multi_step slopes)
run env BENCH_C=256 BENCH_N=8192 BENCH_B=16 \
    python tools/mac_step_compare.py alldistinct pallas
run env BENCH_C=256 BENCH_N=8192 BENCH_B=16 BRUTEFIR_TPU_BANK_DTYPE=bf16 \
    python tools/mac_step_compare.py alldistinct pallas
run env BENCH_C=256 BENCH_N=8192 BENCH_B=16 BRUTEFIR_TPU_BANK_DTYPE=bf16 \
    BRUTEFIR_TPU_RING_DTYPE=bf16 python tools/mac_step_compare.py \
    alldistinct pallas
# 4b. mix precision: accuracy + speed of HIGH vs HIGHEST, and the
# composed scale step under MIX_PRECISION=high
run python tools/mix_precision_probe.py
run env BENCH_C=256 BENCH_N=8192 BENCH_B=16 BRUTEFIR_TPU_MIX_PRECISION=high \
    python tools/mac_step_compare.py alldistinct pallas
# 5. headline
run python bench.py
echo "--- done $(date -u +%FT%TZ) ---" | tee -a "$LOG"
