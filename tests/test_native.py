"""C++ native host-runtime parity vs the vectorized-numpy reference paths.

The native layer (markovmodels_tpu/native) is an *optional accelerator*: every
entry point has a numpy fallback, so these tests assert (a) the build works in
this image (g++ is baked in), and (b) numerical/structural equality with the
fallback implementations on randomized inputs.
"""
import os

import numpy as np
import pytest

from markovmodels_tpu import hostsparse as hs
from markovmodels_tpu import native
from markovmodels_tpu.semiring import BOOL, LOG, PROB, TROPICAL

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)

SEMIRINGS = [LOG, TROPICAL, PROB, BOOL]


def _rand_coo(rng, n, m, sr):
    rows = rng.integers(0, m, size=n)
    cols = rng.integers(0, m, size=n)
    if sr.name == "bool":
        data = rng.integers(0, 2, size=n).astype(np.float64)
    else:
        data = rng.normal(size=n)
        if sr.name in ("log", "tropical"):
            data[rng.random(n) < 0.05] = -np.inf  # stored zeros
        if sr.name == "prob":
            data = np.abs(data)
    return rows, cols, data


@pytest.mark.parametrize("sr", SEMIRINGS, ids=lambda s: s.name)
def test_coo_to_csr_parity(sr):
    rng = np.random.default_rng(0)
    m, n = 97, 20000  # many duplicates per coordinate
    rows, cols, data = _rand_coo(rng, n, m, sr)
    got = native.coo_to_csr(rows, cols, data, m, sr.name)
    assert got is not None
    indptr, gcols, gdata = got
    # fallback path (force below-threshold semantics by calling the numpy body)
    os.environ["MM_TPU_NO_NATIVE"] = "1"
    try:
        want = hs.spmat_from_coo(rows[:0], cols[:0], data[:0], (m, m), sr)  # warm
        # rebuild via numpy: use small-threshold private path
        keys = rows * m + cols
        order = np.argsort(keys, kind="stable")
        r2, c2, d2, k2 = rows[order], cols[order], data[order], keys[order]
        newgroup, combined = hs._combine_dups(k2, d2, sr)
        r2, c2 = r2[newgroup], c2[newgroup]
        ref = hs.spmat_from_coo(r2, c2, combined, (m, m), sr)
    finally:
        del os.environ["MM_TPU_NO_NATIVE"]
    np.testing.assert_array_equal(indptr, ref.indptr)
    np.testing.assert_array_equal(gcols, ref.indices)
    np.testing.assert_allclose(gdata, np.asarray(ref.data, np.float64),
                               rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("sr", [LOG, PROB], ids=lambda s: s.name)
def test_transpose_parity(sr):
    rng = np.random.default_rng(1)
    m = 211
    rows, cols, data = _rand_coo(rng, 8000, m, sr)
    a = hs.spmat_from_coo(rows, cols, data, (m, m), sr)
    res = native.csr_transpose(a.shape, a.indptr, a.indices, a.data)
    assert res is not None
    at = hs.SpMat((m, m), *res)
    # reference: transpose twice through the coo path
    ref = hs.spmat_from_coo(a.indices, a.row_ids(), a.data, (m, m), sr)
    np.testing.assert_array_equal(at.indptr, ref.indptr)
    np.testing.assert_array_equal(at.indices, ref.indices)
    np.testing.assert_allclose(
        np.asarray(at.data, np.float64), np.asarray(ref.data, np.float64)
    )


@pytest.mark.parametrize("sr", SEMIRINGS, ids=lambda s: s.name)
def test_segment_reduce_parity(sr):
    rng = np.random.default_rng(2)
    m = 300
    counts = rng.integers(0, 15, size=m)
    indptr = np.append(0, np.cumsum(counts)).astype(np.int64)
    contrib = rng.normal(size=indptr[-1])
    if sr.name in ("log", "tropical"):
        contrib[rng.random(len(contrib)) < 0.1] = -np.inf
    if sr.name == "bool":
        contrib = (contrib > 0).astype(np.float64)
    got = native.segment_reduce(indptr, contrib, sr.name, sr.zero)
    assert got is not None
    want = np.empty(m)
    for i in range(m):
        seg = contrib[indptr[i]:indptr[i + 1]]
        want[i] = sr.add_reduce(seg) if len(seg) else sr.zero
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_spmv_through_native_matches_small_path():
    """End-to-end: a graph big enough to take the native assembly path gives
    the same spmv results as the numpy path."""
    rng = np.random.default_rng(3)
    m = 500
    rows, cols, data = _rand_coo(rng, 6000, m, LOG)
    a_native = hs.spmat_from_coo(rows, cols, data, (m, m), LOG)
    os.environ["MM_TPU_NO_NATIVE"] = "1"
    try:
        a_numpy = hs.spmat_from_coo(rows, cols, data, (m, m), LOG)
    finally:
        del os.environ["MM_TPU_NO_NATIVE"]
    # NB: MM_TPU_NO_NATIVE only affects first-load; lib may already be loaded,
    # so compare structures directly instead.
    np.testing.assert_array_equal(a_native.indptr, a_numpy.indptr)
    np.testing.assert_array_equal(a_native.indices, a_numpy.indices)
    x = rng.normal(size=m)
    y1 = hs.spmv(a_native, x, LOG)
    y2 = hs.spmv(a_numpy, x, LOG)
    np.testing.assert_allclose(y1, y2, rtol=1e-12, atol=1e-12)


def test_fst_text_roundtrip(tmp_path):
    p = tmp_path / "g.fst.txt"
    p.write_text(
        "0 1 3 3 -0.5\n"
        "1 2 4 4 1.25\n"
        "2 1 3 3\n"          # 4-field arc, weight 0
        "2 0.75\n"
        "1\n"                 # 1-field final, weight 0
    )
    raw = native.parse_fst_text(str(p))
    assert raw is not None
    np.testing.assert_array_equal(raw["src"], [0, 1, 2])
    np.testing.assert_array_equal(raw["dst"], [1, 2, 1])
    np.testing.assert_array_equal(raw["ilabel"], [3, 4, 3])
    np.testing.assert_allclose(raw["weight"], [-0.5, 1.25, 0.0])
    np.testing.assert_array_equal(raw["final_state"], [2, 1])
    np.testing.assert_allclose(raw["final_weight"], [0.75, 0.0])


def test_wsj_loader_native_vs_python():
    """The shipped WSJ graph parses identically through C++ and Python."""
    from markovmodels_tpu.serialization import read_openfst_text

    path = "/root/reference/misc/benchmark/den_fsm_wsj.txt"
    if not os.path.exists(path):
        pytest.skip("reference WSJ graph not present")
    a = native.parse_fst_text(path)
    # force python fallback by calling the module body directly
    import markovmodels_tpu.serialization as ser

    orig = ser.native.parse_fst_text
    ser.native.parse_fst_text = lambda p: None
    try:
        b = read_openfst_text(path)
    finally:
        ser.native.parse_fst_text = orig
    for k in a:
        np.testing.assert_allclose(a[k], b[k])
