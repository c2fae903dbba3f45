#!/bin/bash
# Round-4 battery, part 3: the steps part 2 (tools/r4b_measure.sh) did not
# reach before the wall clock — the scan-kernel decision (scanbench crashed
# on the since-fixed x64 trace bug), distributed overhead, the 2^27
# out-of-core run, and the remaining experiment tables.  Most-important
# first.  Logs -> artifacts/r4/.
set -u
cd "$(dirname "$0")/.."
OUT=${1:-artifacts/r4}
mkdir -p "$OUT"

step() {  # step <name> <timeout-s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1
  echo "    rc=$? -> $OUT/$name.log ($(tail -1 "$OUT/$name.log" | cut -c1-100))"
}

step scanbench 1200 python tools/scanbench.py --quick
step dist_overhead 1200 python tools/dist_overhead.py --n 22
step oocbench  1800 python tools/oocbench.py --logp 27
step exp1_t4   1200 python exp1.py -R 20 -S 24 --no-skew -t 4 -b 1 --backend device --measure-file "$OUT/e1_t4.csv" -p Crs,Nrs,NrsNU
step exp1_zipf 1200 python exp1.py -R 20 -S 24 --skew -t 0 -b 1 --backend device --measure-file "$OUT/e1_zipf.csv" -p Crs,Nrs,NrsNU
step exp4_20   900  python exp4.py -R 20 -a 4 -A 4 -b 2 -B 2 --backend auto --measure-file "$OUT/e4_20.csv"
echo "=== done ($(date +%H:%M:%S)) ==="
