"""Unit tests for the data model (SURVEY.md §6: IndexedDF, RelationData,
assignToTest!, SparseBinMatrix products vs dense)."""
import os

import numpy as np
import pytest

import bayesiandatafusion_jl_tpu as bdf
from bayesiandatafusion_jl_tpu.ops.sparse import (SparseBinMatrix,
                                                  read_sparse_binary,
                                                  read_sparse_float64,
                                                  write_sparse_binary,
                                                  write_sparse_float64)


def test_indexed_df_basic():
    idx = np.array([[0, 1], [0, 2], [2, 0], [1, 1]])
    vals = np.array([1.0, 2.0, 3.0, 4.0])
    df = bdf.IndexedDF(idx, vals, (3, 3))
    assert df.nnz == 4 and df.arity == 2
    assert df.size() == (3, 3) and df.size(0) == 3
    np.testing.assert_array_equal(df.degrees(0), [2, 1, 1])
    inv = df.index(0)
    assert sorted(inv[0].tolist()) == [0, 1]
    assert inv[2].tolist() == [2]


def test_indexed_df_remove_samples():
    idx = np.array([[0, 0], [1, 1], [2, 2], [0, 2]])
    df = bdf.IndexedDF(idx, np.arange(4.0), (3, 3))
    df2 = df.remove_samples([1, 3])
    assert df2.nnz == 2
    np.testing.assert_array_equal(df2.vals, [0.0, 2.0])
    assert df.nnz == 4  # original untouched


def test_indexed_df_validation():
    with pytest.raises(ValueError):
        bdf.IndexedDF(np.array([[0, 5]]), np.array([1.0]), (3, 4))
    with pytest.raises(ValueError):
        bdf.IndexedDF(np.array([[0, 1]]), np.array([1.0, 2.0]), (3, 4))


def test_from_dense_and_scipy():
    import scipy.sparse as sp
    m = np.array([[0, 1.5], [2.5, 0]])
    df = bdf.IndexedDF.from_dense(m)
    assert df.nnz == 2
    df2 = bdf.IndexedDF.from_scipy(sp.csr_matrix(m))
    assert df2.nnz == 2
    assert set(map(tuple, df2.idx.tolist())) == {(0, 1), (1, 0)}


def test_assign_to_test():
    rng = np.random.default_rng(0)
    mask = rng.random((20, 20)) < 0.5
    df = bdf.IndexedDF(np.stack(np.nonzero(mask), 1),
                       rng.random(mask.sum()), (20, 20))
    rd = bdf.RelationData.from_indexed_df(df)
    n0 = rd.relations[0].data.nnz
    rd.assign_to_test(0, 30)
    rel = rd.relations[0]
    assert rel.data.nnz == n0 - 30
    assert len(rel.test_vals) == 30
    # test tuples are disjoint from remaining train tuples
    train = set(map(tuple, rel.data.idx.tolist()))
    test = set(map(tuple, rel.test_idx.tolist()))
    assert not (train & test)


def test_set_precision():
    df = bdf.IndexedDF(np.array([[0, 0]]), np.array([1.0]), (1, 1))
    rd = bdf.RelationData.from_indexed_df(df)
    rd.set_precision(0, 2.5, sample=True)
    assert rd.relations[0].model.alpha == 2.5
    assert rd.relations[0].model.alpha_sample


def test_entity_feature_count_inference():
    F = np.zeros((7, 3)); F[0, 0] = 1
    e = bdf.Entity("x", F=F)
    assert e.count == 7 and e.num_features == 3 and e.has_features


def test_sparse_bin_matrix_products():
    rng = np.random.default_rng(1)
    dense = (rng.random((13, 9)) < 0.3).astype(np.float64)
    m = SparseBinMatrix.from_dense(dense)
    v = rng.standard_normal((9, 4))
    u = rng.standard_normal((13, 4))
    np.testing.assert_allclose(m.matmul(v), dense @ v)
    np.testing.assert_allclose(m.t_matmul(u), dense.T @ u)
    np.testing.assert_allclose(m.gram(), dense.T @ dense)
    np.testing.assert_allclose(m.to_dense(), dense)


def test_sparse_matrix_real_values():
    """Value-carrying sparse feature matrix: products/gram/dense match the
    real-valued dense reference (round-1 gap: values were discarded)."""
    rng = np.random.default_rng(8)
    dense = rng.standard_normal((13, 9)) * (rng.random((13, 9)) < 0.35)
    m = SparseBinMatrix.from_dense(dense)
    assert not m.is_binary
    v = rng.standard_normal((9, 4))
    u = rng.standard_normal((13, 4))
    np.testing.assert_allclose(m.matmul(v), dense @ v)
    np.testing.assert_allclose(m.t_matmul(u), dense.T @ u)
    np.testing.assert_allclose(m.gram(), dense.T @ dense)
    np.testing.assert_allclose(m.to_dense(), dense)
    np.testing.assert_allclose(m.col_sq_sums(), (dense ** 2).sum(axis=0))
    # binary input still reports binary (fast path preserved)
    mb = SparseBinMatrix.from_dense((dense != 0).astype(np.float64))
    assert mb.is_binary


def test_bucketed_matvec_real_values():
    import jax.numpy as jnp
    from bayesiandatafusion_jl_tpu.ops.spmv import (build_bucketed_matvec,
                                                    bucketed_spmm)
    rng = np.random.default_rng(9)
    dense = rng.standard_normal((15, 11)) * (rng.random((15, 11)) < 0.4)
    m = SparseBinMatrix.from_dense(dense)
    mv = build_bucketed_matvec(m.rows, m.cols, m.shape, vals=m.vals,
                               widths=(2, 4, 8), dtype=np.float64)
    v = rng.standard_normal((11, 3))
    u = rng.standard_normal((15, 3))
    np.testing.assert_allclose(
        np.asarray(bucketed_spmm(mv["fwd"], 15, jnp.asarray(v))),
        dense @ v, rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(bucketed_spmm(mv["t"], 11, jnp.asarray(u))),
        dense.T @ u, rtol=1e-12)


def test_sparse_device_ops():
    import jax.numpy as jnp
    from bayesiandatafusion_jl_tpu.ops.sparse import spmm, spmm_t
    rng = np.random.default_rng(2)
    dense = (rng.random((11, 6)) < 0.4).astype(np.float64)
    m = SparseBinMatrix.from_dense(dense)
    v = rng.standard_normal((6, 3))
    u = rng.standard_normal((11, 3))
    y = spmm(jnp.asarray(m.rows), jnp.asarray(m.cols), 11, jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(y), dense @ v)
    yt = spmm_t(jnp.asarray(m.rows), jnp.asarray(m.cols), 6, jnp.asarray(u))
    np.testing.assert_allclose(np.asarray(yt), dense.T @ u)


def test_sparse_io_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    dense = (rng.random((10, 20)) < 0.2).astype(np.float64)
    m = SparseBinMatrix.from_dense(dense)
    p = str(tmp_path / "x.sbm")
    write_sparse_binary(p, m)
    m2 = read_sparse_binary(p)
    assert m2.shape == m.shape
    np.testing.assert_array_equal(m2.rows, m.rows)
    np.testing.assert_array_equal(m2.cols, m.cols)

    p2 = str(tmp_path / "x.sbf")
    vals = rng.random(m.nnz)
    write_sparse_float64(p2, m.rows, m.cols, vals, m.shape)
    r, c, v, shp = read_sparse_float64(p2)
    np.testing.assert_array_equal(r, m.rows)
    np.testing.assert_allclose(v, vals)
    assert shp == m.shape


def test_matrix_market_roundtrip(tmp_path):
    from bayesiandatafusion_jl_tpu.ops.sparse import (read_matrix_market,
                                                      write_matrix_market)
    rng = np.random.default_rng(4)
    dense = np.where(rng.random((6, 9)) < 0.3, rng.random((6, 9)), 0.0)
    r, c = np.nonzero(dense)
    p = str(tmp_path / "m.mtx")
    write_matrix_market(p, r, c, dense[r, c], dense.shape)
    rr, cc, vv, shp = read_matrix_market(p)
    assert shp == dense.shape
    back = np.zeros(shp)
    back[rr, cc] = vv
    np.testing.assert_allclose(back, dense)
