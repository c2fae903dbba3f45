#!/bin/bash
# Round-4 TPU measurement battery (VERDICT r3 item 3: re-run everything on
# the healthy tunnel and re-anchor every PERF.md/README number on logs the
# repo actually contains).  Each step has its own timeout and log so a hang
# never blocks the rest; commit the logs under artifacts/r4/.
# Usage:  bash tools/r4_measure.sh [outdir]       (default /tmp/r4m)
set -u
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/r4m}
mkdir -p "$OUT"

step() {  # step <name> <timeout-s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" "$@" >"$OUT/$name.log" 2>&1
  echo "    rc=$? -> $OUT/$name.log ($(tail -1 "$OUT/$name.log" | cut -c1-100))"
}

step health    360 python -c "import jax; import jax.numpy as jnp; print(jax.devices()); print(int(jnp.sum(jnp.arange(8))))"
grep -q "28" "$OUT/health.log" || { echo "TPU unhealthy; aborting"; exit 1; }

step bench     1800 python bench.py
step roofline  2400 python tools/roofline.py
step buildprof 2400 python tools/buildprof.py
step scanbench 2400 python tools/scanbench.py
step sortbench 1800 python tools/sortbench.py
step oocbench  3000 python tools/oocbench.py --logp 27
step dist_overhead 2400 python tools/dist_overhead.py --n 22
step exp1_t0   1800 python exp1.py -R 20 -S 24 --no-skew -t 0 -b 1 --backend device --measure-file "$OUT/e1_t0.csv"
step exp1_t4   1800 python exp1.py -R 20 -S 24 --no-skew -t 4 -b 1 --backend device --measure-file "$OUT/e1_t4.csv" -p Crs,Nrs,NrsNU
step exp1_zipf 1800 python exp1.py -R 20 -S 24 --skew -t 0 -b 1 --backend device --measure-file "$OUT/e1_zipf.csv" -p Crs,Nrs,NrsNU
step exp1_25   2400 python exp1.py -R 21 -S 25 --no-skew -t 0 -b 1 --backend device --measure-file "$OUT/e1_25.csv" -p Csr,Crs,Nrs,NrsNU
step exp4_24   2400 python exp4.py -R 24 -a 4 -A 4 -b 2 -B 2 --backend device --measure-file "$OUT/e4_24.csv"
step exp4_20   1200 python exp4.py -R 20 -a 4 -A 4 -b 2 -B 2 --backend auto --measure-file "$OUT/e4_20.csv"
echo "=== done ($(date +%H:%M:%S)); logs in $OUT ==="
