"""Differential tests for llm/decomp.py: the distributed one-pass
covariance must equal a local NumPy computation EXACTLY (fixed-point
integer sums), and the PCA projection must match a pure-NumPy PCA on the
same parquet."""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from mysqldump_to_parquet_spark.llm import decomp as D

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def local_emb():
    t = pq.read_table(f"{SF}/embeddings.parquet")
    X = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    return X


def _local_cov_quantized(X):
    """Reference covariance over the same fixed-point lattice the engine
    uses: exact int64 sums, then the identical double expression."""
    Q = np.round(X * D.QUANT).astype(np.int64)
    n = float(Q.shape[0])
    G = (Q.T @ Q).astype(np.float64)
    s = Q.sum(axis=0).astype(np.float64)
    return (G - np.outer(s, s) / n) / n / float(D.QUANT) ** 2


def test_covariance_matches_numpy_exactly(spark, local_emb):
    C_ref = _local_cov_quantized(local_emb)
    rows = D.embed_covariance(spark, SF).collect()
    assert len(rows) == D.DIM * (D.DIM + 1) // 2
    for r in rows:
        want = round(C_ref[r.i, r.j], 6) + 0.0
        assert r.cov == want, (r.i, r.j, r.cov, want)


def test_covariance_close_to_float_covariance(local_emb):
    """The quantized lattice is within ~1e-6 of the float covariance —
    quantization is a representation choice, not a semantic change."""
    C_q = _local_cov_quantized(local_emb)
    C_f = np.cov(local_emb, rowvar=False, bias=True)
    assert np.max(np.abs(C_q - C_f)) < 1e-5


def test_pca_components_properties(spark):
    comps, mean, evs = D.pca_components(spark, SF)
    assert comps.shape == (D.DIM, D.N_COMPONENTS)
    # orthonormal columns
    assert np.allclose(comps.T @ comps, np.eye(D.N_COMPONENTS), atol=1e-9)
    # descending, non-negative eigenvalues
    assert all(evs[k] >= evs[k + 1] for k in range(len(evs) - 1))
    assert evs[-1] >= 0
    # sign convention: largest-|x| element of each component is positive
    for k in range(D.N_COMPONENTS):
        assert comps[np.argmax(np.abs(comps[:, k])), k] > 0


def test_pca_projection_matches_local(spark, local_emb):
    comps, mean, evs = D.pca_components(spark, SF)
    ref = np.round((local_emb - mean) @ comps, 6) + 0.0
    t = pq.read_table(f"{SF}/embeddings.parquet")
    ids = np.asarray(t.column("vec_id").to_pylist())
    by_id = {int(v): ref[ix] for ix, v in enumerate(ids)}
    out = D.embed_pca(spark, SF).collect()
    assert len(out) == len(ids)
    for r in out:
        want = by_id[r.vec_id]
        got = np.array([r.pc1, r.pc2, r.pc3, r.pc4])
        assert np.array_equal(got, want), (r.vec_id, got, want)


def test_pca_projection_variance_tracks_eigenvalues(spark, local_emb):
    """Var of the k-th projected coordinate ≈ the k-th eigenvalue (the
    defining property of PCA)."""
    comps, mean, evs = D.pca_components(spark, SF)
    P = (local_emb - mean) @ comps
    var = P.var(axis=0)
    assert np.allclose(var, evs, rtol=1e-3)
