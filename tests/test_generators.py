"""Generator parity: python fallback == native library == reference streams.

The native backend is bit-exact with the reference binaries by construction
(same libstdc++ calls); golden files captured from the reference binaries pin
that equivalence (tests/golden/).  The python backend is then checked for
bit-equality against the native one.
"""

from pathlib import Path

import numpy as np
import pytest

from hashjoin3d_tpu.utils import gen

GOLDEN = Path(__file__).parent / "golden"

native_available = gen.native_lib() is not None
needs_native = pytest.mark.skipif(not native_available, reason="no native lib")


def test_mt19937_python_matches_native_or_known():
    py = gen.mt19937_stream(2000, backend="python")
    # first outputs of a default-seeded (5489) mt19937 are well known
    assert py[0] == 3499211612
    assert py[1] == 581869302
    if native_available:
        nat = gen.mt19937_stream(2000, backend="native")
        np.testing.assert_array_equal(py, nat)
    # seeded stream
    py7 = gen.mt19937_stream(700, seed=7, backend="python")
    if native_available:
        np.testing.assert_array_equal(py7, gen.mt19937_stream(700, seed=7))


@needs_native
@pytest.mark.parametrize("skew", [False, True])
def test_exp1_python_matches_native(skew):
    rk_n, sa_n, ndv_n = gen.exp1_data(6, 8, skew, 1, backend="native")
    rk_p, sa_p, ndv_p = gen.exp1_data(6, 8, skew, 1, backend="python")
    np.testing.assert_array_equal(rk_n, rk_p)
    np.testing.assert_array_equal(sa_n, sa_p)
    assert ndv_n == ndv_p


@needs_native
def test_exp4_python_matches_native():
    sa_n, ta_n = gen.exp4_data(6, 1, 3, 2, 2, backend="native")
    sa_p, ta_p = gen.exp4_data(6, 1, 3, 2, 2, backend="python")
    np.testing.assert_array_equal(sa_n, sa_p)
    np.testing.assert_array_equal(ta_n, ta_p)


@needs_native
@pytest.mark.parametrize("dist,maxv,param,flags,order", [
    ("key", 64, 0.0, 0, -1),
    ("div", 0, 4.0, 0, 0),
    ("uni", 32, 0.0, 0, 0),
    ("uni", 32, 0.0, 1, 0),     # fill
    ("zipf", 50, 1.0, 0, -1),
    ("zipf", 50, 0.8, 2, 0),    # shuffle freq
    ("self", 40, 0.2, 0, 0),
])
def test_gen_int_vec_python_matches_native(dist, maxv, param, flags, order):
    card = 128
    n = gen.gen_rand_int_vec(dist, card, maxv, 0, param, flags, order,
                             backend="native")
    p = gen.gen_rand_int_vec(dist, card, maxv, 0, param, flags, order,
                             backend="python")
    np.testing.assert_array_equal(n, p)


def _load_golden_relation(path, col):
    """Parse a `k|a|b` dump captured from the reference binary."""
    vals = []
    for line in path.read_text().splitlines():
        parts = line.split("|")
        vals.append(int(parts[col]))
    return np.array(vals, np.uint32)


@pytest.mark.parametrize("name,skew", [("e1_R4_S6_t1_uni", False),
                                       ("e1_R4_S6_t0_zipf", True)])
def test_exp1_matches_reference_golden(name, skew):
    """Inputs equal the reference binary's --print-relations dump (SURVEY 5.4)."""
    rdir = GOLDEN / name
    if not rdir.exists():
        pytest.skip("golden files not captured in this checkout")
    t = 1 if not skew else 0
    rk, sa, _ = gen.exp1_data(4, 6, skew, t)
    np.testing.assert_array_equal(rk, _load_golden_relation(rdir / "R.txt", 0))
    np.testing.assert_array_equal(sa, _load_golden_relation(rdir / "S.txt", 1))


def test_exp4_matches_reference_golden():
    rdir = GOLDEN / "e4_R4_a1_A2_b2_B3"
    if not rdir.exists():
        pytest.skip("golden files not captured in this checkout")
    sa, ta = gen.exp4_data(4, 1, 2, 2, 3)
    np.testing.assert_array_equal(sa, _load_golden_relation(rdir / "S.txt", 1))
    np.testing.assert_array_equal(ta, _load_golden_relation(rdir / "T.txt", 1))


def test_python_exp_norm_match_native():
    """libstdc++ exponential/normal replicas: bit-identical streams."""
    from hashjoin3d_tpu.utils.gen import gen_rand_int_vec, native_lib
    if native_lib() is None:
        import pytest
        pytest.skip("no native toolchain")
    for dist, param in (("exp", 2.0), ("norm", 50.0)):
        a = gen_rand_int_vec(dist, 4000, 400, param=param, backend="native")
        b = gen_rand_int_vec(dist, 4000, 400, param=param, backend="python")
        np.testing.assert_array_equal(a, b)
        a2 = gen_rand_int_vec(dist, 1500, 300, param=param, flags=3,
                              order=-1, backend="native")
        b2 = gen_rand_int_vec(dist, 1500, 300, param=param, flags=3,
                              order=-1, backend="python")
        np.testing.assert_array_equal(a2, b2)


def test_python_pois_matches_native():
    """libstdc++ poisson replica: both regimes (mean < 12 product-of-uniforms,
    mean >= 12 Devroye rejection) produce bit-identical streams."""
    from hashjoin3d_tpu.utils.gen import gen_rand_int_vec, native_lib
    if native_lib() is None:
        pytest.skip("no native toolchain")
    for param in (4.5, 11.999, 12.0, 100.0, 2500.0):
        a = gen_rand_int_vec("pois", 4000, 10**6, param=param,
                             backend="native")
        b = gen_rand_int_vec("pois", 4000, 10**6, param=param,
                             backend="python")
        np.testing.assert_array_equal(a, b)
    # fill+shuffle flags and the value-shift path over a small domain
    a = gen_rand_int_vec("pois", 1500, 300, shift=7, param=150.0, flags=3,
                         order=-1, backend="native")
    b = gen_rand_int_vec("pois", 1500, 300, shift=7, param=150.0, flags=3,
                         order=-1, backend="python")
    np.testing.assert_array_equal(a, b)
