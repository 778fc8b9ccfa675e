#!/bin/sh
# Measure the compiled C++ reference's DEHW throughput at the REDUCED grid
# matched to artifacts/dehw_small_r4 (worm_numb (2,1,1,2,2), whee_numb
# (2,2,1,2,2), glob_inho 0, glob_homo 1, loca_leve 1) — the vs_baseline
# denominator for the flagship and the contact-pattern parity source.
#
# Requires a build tree where examples/DEHWSURF.h has been patched to read
# DEHW_G* / DEHW_GLOB_* / DEHW_LOCA_LEVE env overrides (this repo's patch,
# mirroring the BLOCK_GLOB_LEVE patch of measure_reference.sh) and PREP.h's
# OUTPUT_TIME prints microsecond steady_clock stamps.
#
# stdin menu sequence (examples/DEHW.cpp):
#   0  ISNO_SELO: contact analysis with driving worm  -> coloSett=1,
#      mu=0.08 (DEHW.h:1619), distCrit {55,35,15}um (DEHW.h:2230)
#   1  ADMM with DD: 34/18 domains
#   3  tangential penalty coefficient tapeCoef = 25
#   0  contact analysis (no eigen)
#   0  coarse space correction: LATIN macroscopic (whadCosp = 1<<0)
#
# Usage: sh scripts/measure_reference_dehw.sh /tmp/refbuild2/examples/DEHW_ENV /tmp/dehw_ref_run
set -e
BIN=${1:?patched DEHW binary}; OUT=${2:?scratch run dir}
mkdir -p "$OUT"; cd "$OUT"
printf '0\n1\n3\n0\n0\n' | \
  DEHW_G00=2 DEHW_G01=1 DEHW_G02=1 DEHW_G03=2 DEHW_G04=2 \
  DEHW_G10=2 DEHW_G11=2 DEHW_G12=1 DEHW_G13=2 DEHW_G14=2 \
  DEHW_GLOB_INHO=0 DEHW_GLOB_HOMO=1 DEHW_LOCA_LEVE=1 \
  OMP_NUM_THREADS=${OMP_NUM_THREADS:-2} "$BIN" > stdout.log 2>&1 || true
python3 - "$OUT/stdout.log" "$OUT/Dehw/resuMoni.txt" <<'PY'
import re, sys
log = open(sys.argv[1]).read()
its = re.findall(r'The (\d+)-th iteration: T=([0-9.]+)', log)
if not its:
    sys.exit("no iteration stamps found")
n0, t0 = int(its[0][0]), float(its[0][1])
n1, t1 = int(its[-1][0]), float(its[-1][1])
span, n = t1 - t0, n1 - n0
iters = sum(1 for _ in open(sys.argv[2]))
print(f"iterations={iters} span_s={span:.1f} s/it={span/max(n,1):.4f} "
      f"it/s={max(n,1)/span:.5f}")
PY
