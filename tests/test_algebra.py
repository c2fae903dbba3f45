"""Golden tests for the composable algebra: the reference's example plans.

Expected counts and result tuples captured from running the reference's
``main_algebra_example.out`` (SURVEY.md section 4.1); result sets compared as
sorted multisets (row order in the reference is a linked-list artifact).
"""

import io

import numpy as np

from hashjoin3d_tpu.models import algebra_example as ex
from hashjoin3d_tpu.models.algebra import get_runtime_excl, print_strand


def _rows(top, cols):
    b = top.result
    mask = np.asarray(b.mask) if b.mask is not None else np.ones(b.n, bool)
    data = {k: np.asarray(v) for k, v in b.columns.items()}
    return sorted(
        tuple(int(data[c][i]) for c in cols) for i in range(b.n) if mask[i])


def test0_counts_and_rows():
    scan, sel, top = ex.test0(io.StringIO())
    assert (top.count(), sel.count(), scan.count()) == (3, 3, 4)
    assert _rows(top, ("a", "b")) == [(1, 11), (2, 21), (3, 31)]


def test1_counts():
    ops = ex.test1(io.StringIO())
    assert ops["build"].count() == 6
    assert ops["scan_r"].count() == 6
    assert ops["top"].count() == 3
    assert ops["probe"].count() == 3
    assert ops["sel"].count() == 3
    assert ops["scan_l"].count() == 4


def test2_counts_and_rows():
    ops = ex.test2(io.StringIO())
    assert ops["top"].count() == 6
    assert ops["unnest"].count() == 6
    assert ops["probe"].count() == 3
    # 6-row join result of algebra_test2 (main_algebra_example.cc:265-347)
    assert _rows(ops["top"], ("a", "b", "r.c", "r.d")) == [
        (1, 11, 1, -3), (1, 11, 1, -2), (1, 11, 1, -1),
        (2, 21, 2, -2), (2, 21, 2, -1), (3, 31, 3, -1)]


def test3_counts_and_rows():
    ops = ex.test3(io.StringIO())
    assert ops["top"].count() == 6
    assert ops["probe"].count() == 6
    assert ops["probe"].num_cmps == 10  # keys 1 and 3 share bucket 2
    assert _rows(ops["top"], ("l.a", "l.b", "r.c", "r.d")) == [
        (1, 11, 1, -3), (1, 11, 1, -2), (1, 11, 1, -1),
        (2, 21, 2, -2), (2, 21, 2, -1), (3, 31, 3, -1)]


def test_print_strand_and_runtimes():
    ops = ex.test3(io.StringIO())
    buf = io.StringIO()
    print_strand(ops["scan_l"], 1, buf)
    lines = buf.getvalue().splitlines()
    assert [l.split("|")[0].strip() for l in lines] == [
        "AlgTop", "AlgHashJoinProbe", "AlgSelection", "AlgScan"]
    assert get_runtime_excl(ops["top"]) == ops["top"].runtime()
    assert all(op.runs() == 1 for op in ops.values())


def _fused_rows(top, cols):
    return _rows(top, cols)


def test_compile_strand_fuses_nested_plan():
    """Fused strand (one device program) == interpreted run: counts,
    comparison counters, result multisets (plans of algebra_test2/test3)."""
    import io
    from hashjoin3d_tpu.models.algebra import compile_strand

    # 3D join + unnest plan (test2 shape), profile-then-fuse
    ops = ex.test2(io.StringIO())
    want = _rows(ops["top"], ("a", "b", "r.c", "r.d"))
    run = compile_strand(ops["scan_l"])
    top = run()
    assert top.count() == 6
    assert ops["probe"].count() == 3
    assert ops["probe"].num_cmps == 4  # == interpreted run's value
    assert ops["unnest"].count() == 6
    assert ops["sel"].count() == 3
    assert _rows(top, ("a", "b", "r.c", "r.d")) == want

    # chaining join plan (test3 shape)
    ops3 = ex.test3(io.StringIO())
    want3 = _rows(ops3["top"], ("l.a", "l.b", "r.c", "r.d"))
    run3 = compile_strand(ops3["scan_l"])
    top3 = run3()
    assert top3.count() == 6
    assert ops3["probe"].count() == 6
    assert ops3["probe"].num_cmps == 10
    assert _rows(top3, ("l.a", "l.b", "r.c", "r.d")) == want3

    # explicit capacity hints (no prior run needed) + overflow detection
    ops2 = ex.test2(io.StringIO())
    run2 = compile_strand(ops2["scan_l"],
                          out_sizes={ops2["probe"]: 8, ops2["unnest"]: 8})
    assert run2().count() == 6
    import pytest
    run_small = compile_strand(ops2["scan_l"],
                               out_sizes={ops2["unnest"]: 2})
    with pytest.raises(ValueError, match="capacity"):
        run_small()
