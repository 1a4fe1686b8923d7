"""Distributed PCA over an embedding column.

The dimensionality-reduction step a 100-TB embedding corpus runs
before ANN indexing / clustering: fit the d×d covariance ONCE from
mergeable block partials, then project every vector in a zero-exchange
broadcast pass.

Exactness scheme (the engine's int64-quantization convention): each
ROW's vector is quantized to int64 units of 2^-20 — from there on the
arithmetic is INTEGER.  A block's second-moment partial is a
per-slice ``qxᵀ @ qx`` int64 matmul folded through Python ints
(exact: a 256-row slice keeps per-element sums < 2^62 even at
|x| ≤ 100), its mean partial an int64 column sum; cross-block folding
is Python int (arbitrary precision).  Integer
addition is associative, so the folded moments are EXACTLY layout- and
order-insensitive, and the sequential golden mirror — which calls the
same :func:`pca_fit` on the same integer totals — produces
bit-identical components.  ``eigh`` runs on the driver over the tiny
d×d matrix in both paths; eigenvector sign is fixed deterministically
(largest-|loading| coordinate made positive).

Exchange budget: one (d + d² + 1)-int64 row per block for the fit
(32 KB at d=64), zero exchange for the projection.

Reference analog: none (the reference has no embedding ops); standard
public PCA.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from dots_ocr_ray.util import round_half_away, vec_matrix

_VEC_SCALE = float(1 << 20)
_SLICE = 256  # 256-row int64 matmul slices: exact up to |x| ≈ 100


def _moment_partials(mat: np.ndarray) -> tuple[list[int], list[int], int]:
    """Exact int64 (sum, second-moment, n) partials of a float matrix.
    Pure — shared by the Ray stage and the sequential mirror (integer
    totals are identical under any row partitioning)."""
    q = (np.sign(mat) * np.floor(np.abs(mat) * _VEC_SCALE + 0.5)).astype(np.int64)
    d = q.shape[1]
    ssum = [0] * d
    m2 = np.zeros((d, d), dtype=object)
    for i in range(0, len(q), _SLICE):
        s = q[i : i + _SLICE]
        cs = s.sum(axis=0, dtype=np.int64)
        for j in range(d):
            ssum[j] += int(cs[j])
        m2 += s.T @ s  # int64 matmul — exact per slice; object fold above
    return ssum, [int(v) for v in m2.ravel()], len(q)


def pca_fit(
    ssum: list[int], m2: list[int], n: int, *, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(mean (d,), components (k, d), eigvals (k,)) from the exact
    integer moments — deterministic float math given identical
    integers; both paths call this same function."""
    d = len(ssum)
    mean = np.array([s / _VEC_SCALE for s in ssum], dtype=np.float64) / n
    e_xxt = (
        np.array([v / (_VEC_SCALE * _VEC_SCALE) for v in m2], dtype=np.float64).reshape(d, d)
        / n
    )
    cov = e_xxt - np.outer(mean, mean)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T.copy()
    evals = evals[order]
    # deterministic sign: the largest-|loading| coordinate (first on
    # ties) is made positive
    for i in range(len(comps)):
        j = int(np.argmax(np.abs(np.round(comps[i], 12))))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, evals


def fit_pca(
    ds: ray.data.Dataset,
    *,
    vec_col: str = "embedding",
    k: int = 8,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Distributed moment fold → (mean, components, eigvals)."""

    def _partial(batch: pa.Table) -> pa.Table:
        mat = vec_matrix(batch.column(vec_col), dtype=np.float64)
        ssum, m2, n = _moment_partials(mat)
        # m2 entries are Python ints that can exceed int64 on a very
        # large block (the in-block fold is arbitrary-precision), so
        # they ship as decimal strings; ssum stays comfortably int64
        return pa.table(
            {
                "s": pa.array([ssum], type=pa.list_(pa.int64())),
                "m2": pa.array([[str(v) for v in m2]], type=pa.list_(pa.string())),
                "n": pa.array([n], type=pa.int64()),
            }
        )

    parts = ds.map_batches(_partial, batch_format="pyarrow").take_all()
    if not parts:
        raise ValueError("fit_pca: empty dataset")
    d = len(parts[0]["s"])
    ssum = [0] * d
    m2 = [0] * (d * d)
    n = 0
    for r in parts:
        for j, v in enumerate(r["s"]):
            ssum[j] += int(v)
        for j, v in enumerate(r["m2"]):
            m2[j] += int(v)
        n += int(r["n"])
    return pca_fit(ssum, m2, n, k=k)


def pca_project(
    ds: ray.data.Dataset,
    mean: np.ndarray,
    components: np.ndarray,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    decimals: int = 6,
) -> ray.data.Dataset:
    """Zero-exchange projection: (id, c0..c{k-1}) with coordinates
    quantized per row before the matmul (the same 2^-20 grid the fit
    used) so the scores are layout-independent, then rounded
    half-away."""
    state_ref = ray.put((np.asarray(mean), np.asarray(components)))

    def _proj(batch: pa.Table) -> pa.Table:
        from dots_ocr_ray.util import cached_object

        mu, comps = cached_object(state_ref)
        mat = vec_matrix(batch.column(vec_col), dtype=np.float64)
        q = np.floor(np.abs(mat) * _VEC_SCALE + 0.5) * np.sign(mat) / _VEC_SCALE
        scores = (q - mu) @ comps.T
        out = {id_col: batch.column(id_col)}
        for j in range(comps.shape[0]):
            out[f"c{j}"] = pa.array(
                round_half_away(scores[:, j], decimals), type=pa.float64()
            )
        return pa.table(out)

    return ds.map_batches(_proj, batch_format="pyarrow")
