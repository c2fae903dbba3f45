"""Pallas fused multi-scan (ops/scan.py) vs XLA lax scans on the real TPU.

Decides whether run_boundaries / expand / merge_lookup switch their scans
to the kernel: rows compare single scans, the fused 3-op pass, the reverse
pass, and expand()'s packed-i64 cummax vs the i32 maxpair kernel, all
fence-amortized at 2^24.  Correctness is asserted against the lax twins
before any timing is reported.

    python tools/scanbench.py [--n 24] [--quick]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from hashjoin3d_tpu.ops.scan import multi_scan
from roofline import fence_floor, timeit


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=24, help="log2 elements")
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()
    mt = 0.2 if args.quick else 0.5
    n = 1 << args.n

    print(f"devices: {jax.devices()}  n=2^{args.n}", flush=True)
    print(f"fence floor: {fence_floor()*1e3:.2f} ms", flush=True)

    rng = np.random.default_rng(13)
    a = jnp.asarray(rng.integers(-100, 100, n).astype(np.int32))
    b = jnp.asarray(rng.integers(-1 << 30, 1 << 30, n).astype(np.int32))
    c = jnp.asarray(rng.integers(-1 << 30, 1 << 30, n).astype(np.int32))
    rank = jnp.asarray(np.sort(rng.integers(-1, 1 << 20, n)).astype(np.int32))
    val = jnp.asarray(rng.integers(0, 1 << 26, n).astype(np.int32))

    # interp=True exercises the kernel through the pallas interpreter (the
    # only option on CPU smoke runs); on TPU the compiled kernel runs
    interp = jax.default_backend() == "cpu"

    from hashjoin3d_tpu.ops.scan import _twin

    # correctness first (against the exact lax twins, fwd + rev, all ops)
    for ops, arrs in ((("sum",), (a,)), (("max",), (b,)),
                      (("min",), (c,)), (("maxpair",), (rank, val))):
        for rev in (False, True):
            got = multi_scan(arrs, ops, reverse=rev, interpret=interp)
            want = _twin(arrs, ops, rev)
            for g, w in zip(got, want):
                assert np.array_equal(np.asarray(g), np.asarray(w)), \
                    f"kernel WRONG for {ops} reverse={rev}"
    print("kernel results match lax twins (fwd+rev, all ops)", flush=True)

    rows = []

    def report(name, secs):
        rows.append((name, secs * 1e3, secs * 1e9 / n))
        print(f"{name:44s} {secs*1e3:9.2f} ms  {secs*1e9/n:6.2f} ns/elem",
              flush=True)

    lax_sum = jax.jit(lambda x: jnp.cumsum(x))
    lax_max = jax.jit(lambda x: jax.lax.cummax(x, 0))
    lax_min_r = jax.jit(lambda x: jax.lax.cummin(x, 0, reverse=True))
    report("lax cumsum i32", timeit(lax_sum, a, min_time=mt))
    report("lax cummax i32", timeit(lax_max, b, min_time=mt))
    report("lax cummin i32 (reverse)", timeit(lax_min_r, c, min_time=mt))

    k_sum = jax.jit(lambda x: multi_scan((x,), ("sum",), interpret=interp))
    k_max = jax.jit(lambda x: multi_scan((x,), ("max",), interpret=interp))
    k_min_r = jax.jit(lambda x: multi_scan((x,), ("min",), reverse=True,
                                           interpret=interp))
    report("pallas cumsum i32", timeit(k_sum, a, min_time=mt))
    report("pallas cummax i32", timeit(k_max, b, min_time=mt))
    report("pallas cummin i32 (reverse)", timeit(k_min_r, c, min_time=mt))

    # the run_boundaries bundle: 3 lax scans vs one fused pass
    lax3 = jax.jit(lambda x, y, z: (jnp.cumsum(x), jax.lax.cummax(y, 0),
                                    jax.lax.cummin(z, 0)))
    k3 = jax.jit(lambda x, y, z: multi_scan((x, y, z),
                                            ("sum", "max", "min"),
                                            interpret=interp))
    report("lax 3 scans (sum+max+min)", timeit(lax3, a, b, c, min_time=mt))
    report("pallas fused 3 scans (one pass)", timeit(k3, a, b, c,
                                                     min_time=mt))

    # expand()'s strong-expansion payload path: packed-i64 cummax vs maxpair
    packed = (rank.astype(jnp.int64) << 26) | val.astype(jnp.int64)
    lax_i64 = jax.jit(lambda p: jax.lax.cummax(p, 0))
    k_pair = jax.jit(lambda k, v: multi_scan((k, v), ("maxpair",),
                                             interpret=interp))
    report("lax cummax i64 (packed rank|val)", timeit(lax_i64, packed,
                                                      min_time=mt))
    report("pallas maxpair (rank, val) i32", timeit(k_pair, rank, val,
                                                    min_time=mt))

    print("\n| op | ms | ns/elem |")
    print("|---|---|---|")
    for name, ms, ns in rows:
        print(f"| {name} | {ms:.2f} | {ns:.2f} |")


if __name__ == "__main__":
    main()
