"""Broad CSV-parity sweep: reference binaries vs this engine, many configs.

The CI suite pins a handful of golden CSVs (tests/test_experiments.py);
this sweep drives BOTH experiment CLIs and the reference executables
across a wide config grid -- skew on/off, t in 0..4, b in 1..4, exp-4
alpha/beta shapes -- and diffs EVERY shared counter/statistic column
(c_*, ht_*, card_*, nodv_*).  Row times are machine-dependent and
ignored.

Requires the reference binaries (see .claude/skills/verify/SKILL.md):
    cp -r /root/reference /tmp/refbuild && make -C /tmp/refbuild CXX=g++ CC=gcc

Usage: python tools/parity_sweep.py [--ref /tmp/refbuild] [--out /tmp/psweep]
       [--backend host|device] [--platform cpu|default] [--quick]
"""

import argparse
import csv
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

EXP1_GRID = [
    # (R, S, skew, t, b)
    (10, 12, False, 0, 1),
    (10, 12, False, 1, 1),
    (10, 12, False, 4, 1),
    (10, 12, True, 0, 1),
    (10, 12, True, 2, 1),
    (11, 13, False, 0, 2),
    (11, 13, False, 3, 4),
    (11, 13, True, 0, 3),
    (12, 14, False, 2, 2),
    (12, 14, True, 4, 1),
]
EXP4_GRID = [
    # (R, a, A, b, B)
    (10, 2, 2, 3, 2),
    (10, 1, 1, 1, 1),
    (11, 3, 2, 2, 3),
    (11, 2, 4, 4, 2),
    (12, 4, 3, 1, 2),
]


def load(path):
    with open(path) as f:
        return list(csv.DictReader(f, delimiter=";"))


def diff(mine, ref, label):
    a, b = load(mine), load(ref)
    if len(a) != len(b):
        print(f"FAIL {label}: row count {len(a)} vs {len(b)}")
        return 1
    cols = [c for c in a[0]
            if c.startswith(("c_", "ht_", "card_", "nodv_", "no_"))
            and c in b[0]]
    bad = 0
    for i, (ra, rb) in enumerate(zip(a, b)):
        for c in cols:
            if ra[c] != rb[c]:
                print(f"FAIL {label} row {i} ({ra.get('plan', '?')}) "
                      f"{c}: {ra[c]} vs {rb[c]}")
                bad += 1
    print(f"ok   {label}: {len(a)} rows x {len(cols)} cols diffed"
          + (f", {bad} MISMATCHES" if bad else ""))
    return bad


def run(cmd, log):
    with open(log, "w") as f:
        r = subprocess.run(cmd, stdout=f, stderr=subprocess.STDOUT,
                           timeout=1800)
    if r.returncode != 0:
        print(f"FAIL rc={r.returncode}: {' '.join(map(str, cmd))} "
              f"(log: {log})")
    return r.returncode


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/tmp/refbuild")
    ap.add_argument("--out", default="/tmp/psweep")
    ap.add_argument("--backend", default="host",
                    choices=["host", "device", "auto"])
    ap.add_argument("--platform", default="cpu", choices=["cpu", "default"])
    ap.add_argument("--quick", action="store_true",
                    help="first 3 configs of each grid only")
    args = ap.parse_args()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    ref = Path(args.ref)
    if not (ref / "main_experiment1.out").exists():
        sys.exit(f"reference binaries not found under {ref} "
                 "(see module docstring)")

    e1 = EXP1_GRID[:3] if args.quick else EXP1_GRID
    e4 = EXP4_GRID[:3] if args.quick else EXP4_GRID
    plat = ([] if args.platform == "default"
            else ["--platform", args.platform])
    total_bad = rc_bad = 0

    for R, S, skew, t, b in e1:
        tag = f"e1_R{R}S{S}{'z' if skew else 'u'}t{t}b{b}"
        sk = "--skew" if skew else "--no-skew"
        rc_bad += run([str(ref / "main_experiment1.out"), "-R", str(R),
                       "-S", str(S), sk, "-t", str(t), "-b", str(b),
                       "--measure-file", str(out / f"{tag}_ref.csv")],
                      out / f"{tag}_ref.log")
        rc_bad += run([sys.executable, str(REPO / "exp1.py"), "-R", str(R),
                       "-S", str(S), sk, "-t", str(t), "-b", str(b),
                       "--backend", args.backend, *plat,
                       "--measure-file", str(out / f"{tag}_my.csv")],
                      out / f"{tag}_my.log")
        total_bad += diff(out / f"{tag}_my.csv", out / f"{tag}_ref.csv", tag)

    for R, a, A, b, B in e4:
        tag = f"e4_R{R}a{a}A{A}b{b}B{B}"
        rc_bad += run([str(ref / "main_experiment4.out"), "-R", str(R),
                       "-a", str(a), "-A", str(A), "-b", str(b),
                       "-B", str(B),
                       "--measure-file", str(out / f"{tag}_ref.csv")],
                      out / f"{tag}_ref.log")
        rc_bad += run([sys.executable, str(REPO / "exp4.py"), "-R", str(R),
                       "-a", str(a), "-A", str(A), "-b", str(b),
                       "-B", str(B), "--backend", args.backend, *plat,
                       "--measure-file", str(out / f"{tag}_my.csv")],
                      out / f"{tag}_my.log")
        total_bad += diff(out / f"{tag}_my.csv", out / f"{tag}_ref.csv", tag)

    if total_bad or rc_bad:
        sys.exit(f"PARITY SWEEP FAILED: {total_bad} column mismatches, "
                 f"{rc_bad} nonzero exits")
    print("PARITY SWEEP PASSED")


if __name__ == "__main__":
    main()
