#!/bin/bash
# Round-4 battery, part 2 (after bench/roofline/sortbench already ran):
# the experiment tables, the scan-kernel decision, distributed overhead,
# and the 2^27 out-of-core run.  Most-important steps first so a wall-clock
# cutoff still leaves committed evidence.  Logs -> artifacts/r4/.
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

step exp1_t0   1500 python exp1.py -R 20 -S 24 --no-skew -t 0 -b 1 --backend device --measure-file "$OUT/e1_t0.csv"
step exp4_24   1500 python exp4.py -R 24 -a 4 -A 4 -b 2 -B 2 --backend device --measure-file "$OUT/e4_24.csv"
step scanbench 1200 python tools/scanbench.py --quick
step dist_overhead 1200 python tools/dist_overhead.py --n 22
step oocbench  1500 python tools/oocbench.py --logp 27
step exp1_t4   1200 python exp1.py -R 20 -S 24 --no-skew -t 4 -b 1 --backend device --measure-file "$OUT/e1_t4.csv" -p Crs,Nrs,NrsNU
step exp1_zipf 1200 python exp1.py -R 20 -S 24 --skew -t 0 -b 1 --backend device --measure-file "$OUT/e1_zipf.csv" -p Crs,Nrs,NrsNU
step exp1_25   1500 python exp1.py -R 21 -S 25 --no-skew -t 0 -b 1 --backend device --measure-file "$OUT/e1_25.csv" -p Csr,Crs,Nrs,NrsNU
step exp4_20   900  python exp4.py -R 20 -a 4 -A 4 -b 2 -B 2 --backend auto --measure-file "$OUT/e4_20.csv"
echo "=== done ($(date +%H:%M:%S)) ==="
