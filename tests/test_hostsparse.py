"""Host sparse semiring linalg vs dense numpy oracle
(design mirrors reference test/test_linalg.jl: the dense computation is the
oracle for every sparse kernel)."""
import numpy as np
import pytest

from markovmodels_tpu import hostsparse as hs
from markovmodels_tpu.semiring import BOOL, LOG, PROB, TROPICAL

SRS = [LOG, TROPICAL, PROB, BOOL]


def random_spmat(sr, rng, m, n, density=0.3):
    mask = rng.uniform(size=(m, n)) < density
    if sr.name == "bool":
        vals = np.ones((m, n))
    elif sr.name == "prob":
        vals = rng.uniform(0.1, 2.0, size=(m, n))
    else:
        vals = rng.uniform(-4, 1, size=(m, n))
    dense = np.where(mask, vals, sr.zero)
    return hs.spmat_from_dense(dense, sr), dense


def dense_spmv(sr, A, x):
    m, n = A.shape
    out = sr.zeros(m)
    for i in range(m):
        acc = sr.zero
        for j in range(n):
            acc = sr.add(acc, sr.mul(A[i, j], x[j]))
        out[i] = acc
    return out


@pytest.mark.parametrize("sr", SRS, ids=lambda s: s.name)
def test_spmv_and_spmv_t(sr):
    rng = np.random.default_rng(2)
    A, dense = random_spmat(sr, rng, 7, 5)
    x = rng.uniform(-3, 1, size=5) if sr.name not in ("prob", "bool") else rng.uniform(0, 1, size=5)
    y = rng.uniform(-3, 1, size=7) if sr.name not in ("prob", "bool") else rng.uniform(0, 1, size=7)
    np.testing.assert_allclose(hs.spmv(A, x, sr), dense_spmv(sr, dense, x), atol=1e-12)
    np.testing.assert_allclose(hs.spmv_t(A, y, sr), dense_spmv(sr, dense.T, y), atol=1e-12)


@pytest.mark.parametrize("sr", SRS, ids=lambda s: s.name)
def test_structural_ops(sr):
    rng = np.random.default_rng(3)
    A, da = random_spmat(sr, rng, 4, 6)
    B, db = random_spmat(sr, rng, 3, 2)
    # transpose
    np.testing.assert_allclose(hs.transpose(A, sr).to_dense(sr), da.T)
    # blockdiag
    bd = hs.blockdiag([A, B], sr).to_dense(sr)
    expected = sr.zeros((7, 8))
    expected[:4, :6] = da
    expected[4:, 6:] = db
    np.testing.assert_allclose(bd, expected)
    # submatrix / getcol
    np.testing.assert_allclose(hs.submatrix(A, 3, 4, sr).to_dense(sr), da[:3, :4])
    np.testing.assert_allclose(hs.getcol(A, 2, sr), da[:, 2])


@pytest.mark.parametrize("sr", SRS, ids=lambda s: s.name)
def test_row_reduce_and_scaling(sr):
    rng = np.random.default_rng(4)
    A, da = random_spmat(sr, rng, 5, 5, density=0.5)
    v = rng.uniform(0.1, 1.0, size=5) if sr.name in ("prob", "bool") else rng.uniform(-2, 0, size=5)
    if sr.name == "bool":
        v = np.ones(5)
    rr = hs.row_reduce(A, sr)
    for i in range(5):
        acc = sr.zero
        for k in range(A.indptr[i], A.indptr[i + 1]):
            acc = sr.add(acc, A.data[k])
        np.testing.assert_allclose(rr[i], acc, atol=1e-12)
    sr_rows = hs.scale_rows(A, v, sr).to_dense(sr)
    sr_cols = hs.scale_cols(A, v, sr).to_dense(sr)
    mask = ~sr.is_zero(da)
    expect_rows = sr.zeros((5, 5))
    expect_cols = sr.zeros((5, 5))
    for i in range(5):
        for j in range(5):
            if mask[i, j]:
                expect_rows[i, j] = sr.mul(v[i], da[i, j])
                expect_cols[i, j] = sr.mul(da[i, j], v[j])
    np.testing.assert_allclose(sr_rows, expect_rows)
    np.testing.assert_allclose(sr_cols, expect_cols)


def test_duplicate_combining():
    A = hs.spmat_from_coo([0, 0, 1], [1, 1, 0], np.log([0.5, 0.5, 1.0]), (2, 2), LOG)
    assert A.nnz == 2
    np.testing.assert_allclose(A.to_dense(LOG)[0, 1], 0.0, atol=1e-12)  # log(0.5+0.5)
    v = hs.spvec_from_pairs([(1, np.log(0.25)), (1, np.log(0.75))], 3, LOG)
    assert v.nnz == 1
    np.testing.assert_allclose(v.to_dense(LOG)[1], 0.0, atol=1e-12)


def test_stored_zeros_preserved():
    # structure keeps semiring-zero entries (Julia SparseArrays semantics)
    A = hs.spmat_from_coo([0, 1], [1, 0], np.array([-np.inf, 0.0]), (2, 2), LOG)
    assert A.nnz == 2
