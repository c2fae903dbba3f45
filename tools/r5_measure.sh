#!/bin/bash
# Round-5 measurement battery: re-anchor every PERF.md table on the r5
# engine (lax.switch safe_lookup + packed phase-1 bitonic probe sort).
# Most-important first; one job at a time (single host core -- CLAUDE.md).
# Logs -> artifacts/r5/.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-artifacts/r5}
mkdir -p "$OUT"

step() {  # step <name> <timeout-s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1
  echo "    rc=$? -> $OUT/$name.log ($(tail -1 "$OUT/$name.log" | cut -c1-100))"
}

step bench     1800 python bench.py
step exp1_t0   2400 python exp1.py -R 20 -S 24 --no-skew -t 0 -b 1 --backend device --measure-file "$OUT/e1_t0.csv"
step exp1_t4   1800 python exp1.py -R 20 -S 24 --no-skew -t 4 -b 1 --backend device --measure-file "$OUT/e1_t4.csv" -p Crs,Nrs,NrsNU
step exp1_zipf 1800 python exp1.py -R 20 -S 24 --skew -t 0 -b 1 --backend device --measure-file "$OUT/e1_zipf.csv" -p Crs,Nrs,NrsNU
step exp1_25   2400 python exp1.py -R 21 -S 25 --no-skew -t 0 -b 1 --backend device --measure-file "$OUT/e1_25.csv" -p Csr,Crs,Nrs,NrsNU
step exp4_24   2400 python exp4.py -R 24 -a 4 -A 4 -b 2 -B 2 --backend device --measure-file "$OUT/e4_24.csv"
step exp4_20   1200 python exp4.py -R 20 -a 4 -A 4 -b 2 -B 2 --backend auto --measure-file "$OUT/e4_20.csv"
step roofline  1800 python tools/roofline.py
step dist_overhead 1800 python tools/dist_overhead.py --n 22
echo "=== done ($(date +%H:%M:%S)) ==="
