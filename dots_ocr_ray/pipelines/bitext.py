"""Margin-based bitext mining over the embedding column — the
CCMatrix / LASER parallel-corpus miner (Artetxe & Schwenk 2019,
"Margin-based Parallel Corpus Mining with Multilingual Sentence
Embeddings"): for every source-language vector, find the
target-language vector with the best MARGIN score

    margin(x, y) = cos(x, y) / (avg_topk(x) / 2 + avg_topk(y) / 2)

where ``avg_topk`` is the mean cosine of the vector's k nearest
neighbours on the OTHER side — the ratio discounts hub vectors that
are close to everything.

Distributed shape (the 100-TB contract):

* the TARGET side is the broadcast side — the published use case mines
  a low-resource language against a web-scale one, so the small side
  rides ``ray.put`` once (budget-checked) and every source batch scans
  it with one matmul; a two-big-sides variant would swap this for the
  IVF index (`similarity.ivf_topk`), same margin math;
* the target-side ``avg_topk`` needs each target's top-k cosines over
  ALL source rows, which no single batch sees — so pass T emits ONE
  bounded (k × |tgt|) partial top-k block per source batch and the
  driver merges them (the ``brute_force_topk`` merge pattern turned
  sideways);
* pass S then scores margins batch-locally against the broadcast
  (tgt_avg, tgt_ids) — candidates are the source row's top-k by
  cosine, per the published algorithm, so the argmax never touches
  the full similarity matrix.

Ties are pinned everywhere (stable argsort on negated sims → equal
cosines resolve to the lowest target position) so the distributed and
sequential golden engines agree bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from dots_ocr_ray.pipelines.similarity import _normalize_rows
from dots_ocr_ray.util import cached_object, round_half_away, vec_matrix

BITEXT_K = 4
BITEXT_SRC_LABEL = 0
BITEXT_TGT_LABEL = 1


def col_topk_partial(sims: np.ndarray, k: int) -> np.ndarray:
    """Top-k values per COLUMN of a (rows × T) sims block, descending;
    pads with -inf when the block has fewer than k rows.  Shared by
    the Ray pass-T partials and the golden merge."""
    r, t = sims.shape
    if r >= k:
        part = np.sort(sims, axis=0)[r - k :][::-1]
    else:
        part = np.full((k, t), -np.inf, dtype=sims.dtype)
        part[:r] = np.sort(sims, axis=0)[::-1]
    return part


def merge_col_topk(parts: list[np.ndarray], k: int) -> np.ndarray:
    """Fold per-batch column top-k blocks into the global per-column
    top-k MEAN (ignoring -inf padding)."""
    stacked = np.concatenate(parts, axis=0)
    top = np.sort(stacked, axis=0)[stacked.shape[0] - k :][::-1]
    valid = np.isfinite(top)
    return np.where(
        valid.any(axis=0), top.sum(axis=0, where=valid) / valid.sum(axis=0).clip(min=1), 0.0
    )


def row_candidates(sims: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """(idx, cos) of each row's top-k columns, cosine-descending with
    ties to the lowest column index (stable argsort)."""
    kk = min(k, sims.shape[1])
    order = np.argsort(-sims, axis=1, kind="stable")[:, :kk]
    return order, np.take_along_axis(sims, order, axis=1)


def margin_scores(
    cand_cos: np.ndarray, cand_idx: np.ndarray, src_avg: np.ndarray, tgt_avg: np.ndarray
) -> np.ndarray:
    """margin = cos / (src_avg/2 + tgt_avg/2), vectorized over the
    (rows × k) candidate block."""
    return cand_cos / (src_avg[:, None] / 2.0 + tgt_avg[cand_idx] / 2.0)


def _side_matrix(sf_dir: str, label: int) -> tuple[np.ndarray, np.ndarray]:
    """Collect one label side as (ids, L2-normalized float64 matrix).
    Driver-bounded by the side's size — the documented broadcast
    budget assumption (the low-resource mining side)."""
    ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )

    def _pick(batch: pa.Table, want=label) -> pa.Table:
        import pyarrow.compute as pc

        return batch.filter(pc.equal(batch.column("label"), want)).select(
            ["vec_id", "embedding"]
        )

    ids, mats = [], []
    for b in ds.map_batches(_pick, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        if b.num_rows:
            ids.append(b.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64))
            mats.append(vec_matrix(b.column("embedding"), dtype=np.float32))
    if not ids:
        return np.array([], dtype=np.int64), np.zeros((0, 0))
    ids = np.concatenate(ids)
    mat = _normalize_rows(np.concatenate(mats, axis=0)).astype(np.float64)
    order = np.argsort(ids, kind="stable")
    return ids[order], mat[order]


def mine_bitext(
    sf_dir: str,
    *,
    src_label: int = BITEXT_SRC_LABEL,
    tgt_label: int = BITEXT_TGT_LABEL,
    k: int = BITEXT_K,
) -> pa.Table:
    """Best margin-scored target per source vector:
    (src_id, tgt_id, cos, margin), margins rounded half-away to 6."""
    tgt_ids, tgt_mat = _side_matrix(sf_dir, tgt_label)
    tgt_ref = ray.put((tgt_ids, tgt_mat))

    src = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )

    def _src_batch(batch: pa.Table):
        import pyarrow.compute as pc

        b = batch.filter(pc.equal(batch.column("label"), src_label))
        if b.num_rows == 0:
            return None, None
        sids = b.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        mat = _normalize_rows(vec_matrix(b.column("embedding"), dtype=np.float32)).astype(
            np.float64
        )
        return sids, mat

    def _pass_t(batch: pa.Table) -> pa.Table:
        _, t_mat = cached_object(tgt_ref)
        sids, mat = _src_batch(batch)
        if sids is None:
            return pa.table({"part": pa.array([], type=pa.binary())})
        part = col_topk_partial(mat @ t_mat.T, k)
        return pa.table({"part": pa.array([part.tobytes()], type=pa.binary())})

    t_cols = tgt_mat.shape[0]
    parts = []
    for b in (
        src.map_batches(_pass_t, batch_format="pyarrow").iter_batches(batch_format="pyarrow")
    ):
        for blob in b.column("part").to_pylist():
            parts.append(np.frombuffer(blob, dtype=np.float64).reshape(k, t_cols))
    tgt_avg = merge_col_topk(parts, k) if parts else np.zeros(t_cols)
    avg_ref = ray.put(tgt_avg)

    def _pass_s(batch: pa.Table) -> pa.Table:
        t_ids, t_mat = cached_object(tgt_ref)
        t_avg = cached_object(avg_ref)
        sids, mat = _src_batch(batch)
        empty = {
            "src_id": pa.array([], type=pa.int64()),
            "tgt_id": pa.array([], type=pa.int64()),
            "cos": pa.array([], type=pa.float64()),
            "margin": pa.array([], type=pa.float64()),
        }
        if sids is None:
            return pa.table(empty)
        sims = mat @ t_mat.T
        cand_idx, cand_cos = row_candidates(sims, k)
        src_avg = cand_cos.mean(axis=1)
        marg = margin_scores(cand_cos, cand_idx, src_avg, t_avg)
        best = np.argmax(marg, axis=1)  # ties → first = highest cos / lowest idx
        rows = np.arange(len(sids))
        bi = cand_idx[rows, best]
        return pa.table(
            {
                "src_id": pa.array(sids, type=pa.int64()),
                "tgt_id": pa.array(t_ids[bi], type=pa.int64()),
                "cos": pa.array(
                    round_half_away(cand_cos[rows, best], 6), type=pa.float64()
                ),
                "margin": pa.array(
                    round_half_away(marg[rows, best], 6), type=pa.float64()
                ),
            }
        )

    out = src.map_batches(_pass_s, batch_format="pyarrow")
    tbl = pa.concat_tables(
        [b for b in out.iter_batches(batch_format="pyarrow")]
    )
    return tbl.sort_by("src_id")
