"""Distributed PCA: exact layout-insensitive moment fold, sign
determinism, projection correctness."""

import numpy as np
import pyarrow as pa

import ray.data

from dots_ocr_ray.pipelines.pca import (
    _moment_partials,
    fit_pca,
    pca_fit,
    pca_project,
)


def _toy(n=300, d=6, seed=11):
    rng = np.random.RandomState(seed)
    # anisotropic: one dominant direction so top component is stable
    base = rng.randn(n, d)
    base[:, 0] *= 5.0
    base[:, 1] *= 2.0
    vecs = base + rng.randn(d)  # nonzero mean
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n), type=pa.int64()),
            "embedding": pa.array(
                [row.astype(np.float32) for row in vecs],
                type=pa.list_(pa.float32()),
            ),
        }
    )


def test_fit_layout_insensitive(ray_session):
    tbl = _toy()
    fits = []
    for parts in (1, 4, 13):
        ds = ray.data.from_arrow(tbl).repartition(parts)
        fits.append(fit_pca(ds, k=3))
    m0, c0, e0 = fits[0]
    for m, c, e in fits[1:]:
        assert np.array_equal(m, m0)
        assert np.array_equal(c, c0)
        assert np.array_equal(e, e0)


def test_fit_matches_numpy_cov():
    from dots_ocr_ray.util import vec_matrix

    tbl = _toy()
    mat = vec_matrix(tbl.column("embedding"), dtype=np.float64)
    ssum, m2, n = _moment_partials(mat)
    mean, comps, evals = pca_fit(ssum, m2, n, k=3)
    # against plain float64 PCA (quantization error ~1e-6)
    ref_mean = mat.mean(axis=0)
    assert np.allclose(mean, ref_mean, atol=1e-5)
    cov = np.cov(mat.T, bias=True)
    ref_evals = np.sort(np.linalg.eigvalsh(cov))[::-1][:3]
    assert np.allclose(evals, ref_evals, rtol=1e-4)
    # dominant direction ≈ e0 axis (we inflated column 0 by 5x)
    assert abs(comps[0, 0]) > 0.9
    # deterministic sign: largest-|loading| coordinate positive
    for row in comps:
        assert row[int(np.argmax(np.abs(np.round(row, 12))))] > 0


def test_projection_variances_match_eigvals(ray_session):
    tbl = _toy()
    ds = ray.data.from_arrow(tbl).repartition(3)
    mean, comps, evals = fit_pca(ds, k=3)
    proj = pca_project(ds, mean, comps).to_pandas().set_index("vec_id").sort_index()
    for j in range(3):
        v = proj[f"c{j}"].to_numpy()
        assert np.isclose(v.var(), evals[j], rtol=1e-3)
        # components are centered
        assert abs(v.mean()) < 1e-4


def test_moment_partials_exact_split():
    rng = np.random.RandomState(5)
    mat = rng.randn(1000, 4) * 50  # exercise the |x|~100 range
    s_all, m_all, n_all = _moment_partials(mat)
    s1, m1, n1 = _moment_partials(mat[:333])
    s2, m2, n2 = _moment_partials(mat[333:])
    assert n1 + n2 == n_all
    assert [a + b for a, b in zip(s1, s2)] == s_all
    assert [a + b for a, b in zip(m1, m2)] == m_all
