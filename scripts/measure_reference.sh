#!/bin/sh
# Measure the compiled C++ reference's ADMM throughput (the bench.py
# vs_baseline denominator; results recorded in baseline_measured.json).
#
# The reference builds per its own makefile (g++ -O3 -std=c++17 -fopenmp
# -march=native) and takes all configuration from interactive stdin menus;
# problem sizes are compile-time members, so reduced-scale runs patch the
# ctor to read BLOCK_GLOB_LEVE from the environment (geometry/code path
# otherwise identical).
#
# Usage:  sh scripts/measure_reference.sh /path/to/reference /tmp/refrun
set -e
REF=${1:?reference dir}; OUT=${2:?scratch dir}
mkdir -p "$OUT/build" && cp -r "$REF"/* "$OUT/build/"
# env-configurable globLeve for reduced matched runs
sed -i 's/\tglobLeve = 4;/\tglobLeve = getenv("BLOCK_GLOB_LEVE") ? atol(getenv("BLOCK_GLOB_LEVE")) : 4;/' \
    "$OUT/build/examples/BLOCK.h"
( cd "$OUT/build" && make -j2 )

run_block () {  # $1 = glob_leve, $2 = menu (1 = 2^3 DD), $3 = coarse (0 = LATIN... BLOCK: 0 = MULTISCALE_1 menu)
    d="$OUT/block_l$1_m$2"; mkdir -p "$d"; cd "$d"
    printf '%s\n%s\n' "$2" "$3" | BLOCK_GLOB_LEVE=$1 OMP_NUM_THREADS=$(nproc) \
        "$OUT/build/examples/BLOCK" > stdout.log 2>&1 || true
    # it/s from the per-iteration OUTPUT_TIME stamps; iterations from resuMoni
    python3 - "$d/stdout.log" "$d/Block/resuMoni.txt" <<'PY'
import sys, re, datetime
log = open(sys.argv[1]).read()
its = re.findall(r'The (\d+)-th iteration: (.+ \d{4})', log)
ts = [datetime.datetime.strptime(t.strip(), '%a %b %d %H:%M:%S %Y') for _, t in its]
n = int(its[-1][0]); span = (ts[-1] - ts[0]).total_seconds()
iters = sum(1 for _ in open(sys.argv[2]))
print(f"iterations={iters} s/it={span/max(n,1):.3f} it/s={max(n,1)/span:.5f}")
PY
}

run_block 2 1 0
run_block 4 1 0
