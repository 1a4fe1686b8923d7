"""Isotonic calibration of a document-quality score — the
Zadrozny/Elkan (2002) pool-adjacent-violators (PAV) recipe a pipeline
runs before thresholding a cheap quality score at corpus scale: bin
the score, measure the empirical keep rate per bin, and replace the
raw rates with the best monotone fit so downstream thresholds are
order-consistent.

Distributed shape (the 100-TB contract): the score/label pass is the
ordinary vectorized annotate stage; each batch then emits ONE bounded
(bins × 3) partial count row block, the driver folds integer counts
(Python cost O(bins), never O(rows)), and PAV runs on the bounded bin
table.  PAV itself compares pooled rates by INTEGER cross-
multiplication (pos_a * n_b vs pos_b * n_a), so the monotone pooling
is bit-exact between the Ray engine and the sequential golden — floats
appear only in the final per-bin division.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from dots_ocr_ray.util import round_half_away

CAL_BINS = 24
CAL_SCORE = "stopword_ratio"


def score_bin_ids(scores: np.ndarray, bins: int = CAL_BINS) -> np.ndarray:
    """Equal-width bins over [0, 1]; score 1.0 folds into the last bin."""
    return np.minimum((scores * bins).astype(np.int64), bins - 1)


def bin_label_counts(scores: np.ndarray, labels: np.ndarray, bins: int = CAL_BINS):
    """(n, n_pos) int64 arrays of length ``bins``."""
    b = score_bin_ids(scores, bins)
    n = np.zeros(bins, dtype=np.int64)
    pos = np.zeros(bins, dtype=np.int64)
    np.add.at(n, b, 1)
    np.add.at(pos, b, labels.astype(np.int64))
    return n, pos


def pav_pool(n: np.ndarray, pos: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Weighted PAV over occupied bins: returns per-bin pooled
    (pos, n) pairs whose ratios are nondecreasing.  Comparisons use
    integer cross-multiplication — no float enters the pooling."""
    occupied = np.flatnonzero(n > 0)
    stack: list[list[int]] = []  # [pos, n, span]
    for i in occupied:
        stack.append([int(pos[i]), int(n[i]), 1])
        while len(stack) > 1 and stack[-2][0] * stack[-1][1] > stack[-1][0] * stack[-2][1]:
            p2, n2, s2 = stack.pop()
            stack[-1][0] += p2
            stack[-1][1] += n2
            stack[-1][2] += s2
    out_pos = np.zeros(len(occupied), dtype=np.int64)
    out_n = np.zeros(len(occupied), dtype=np.int64)
    j = 0
    for p, nn, span in stack:
        out_pos[j : j + span] = p
        out_n[j : j + span] = nn
        j += span
    return out_pos, out_n


def calibration_table(n: np.ndarray, pos: np.ndarray, bins: int = CAL_BINS) -> pa.Table:
    """Final per-occupied-bin report from folded integer counts —
    shared verbatim by the Ray pipeline and the sequential golden."""
    occupied = np.flatnonzero(n > 0)
    iso_pos, iso_n = pav_pool(n, pos)
    rate_raw = pos[occupied] * 1.0 / n[occupied]
    rate_iso = iso_pos * 1.0 / iso_n
    return pa.table(
        {
            "bin_id": pa.array(occupied.astype(np.int64), type=pa.int64()),
            "n": pa.array(n[occupied], type=pa.int64()),
            "n_pos": pa.array(pos[occupied], type=pa.int64()),
            "rate_raw": pa.array(round_half_away(rate_raw, 6), type=pa.float64()),
            "rate_iso": pa.array(round_half_away(rate_iso, 6), type=pa.float64()),
        }
    )


def isotonic_calibration(sf_dir: str, *, bins: int = CAL_BINS) -> pa.Table:
    """Calibrate ``stopword_ratio`` (an English-stopword density — a
    cheap English-ness score) against the true ``lang == 'en'`` label:
    per occupied bin, raw and isotonic P(en | score bin)."""
    import pyarrow.compute as pc

    from dots_ocr_ray.pipelines.text_analysis import annotate_documents

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["text", "lang"])
    ann = annotate_documents(ds, features=("quality",))

    def _partial(batch: pa.Table) -> pa.Table:
        s = batch.column(CAL_SCORE).to_numpy(zero_copy_only=False)
        y = pc.equal(batch.column("lang"), "en").to_numpy(zero_copy_only=False)
        nb, pb = bin_label_counts(s, y, bins)
        return pa.table(
            {
                "bin_id": pa.array(np.arange(bins, dtype=np.int64), type=pa.int64()),
                "n": pa.array(nb, type=pa.int64()),
                "n_pos": pa.array(pb, type=pa.int64()),
            }
        )

    n = np.zeros(bins, dtype=np.int64)
    pos = np.zeros(bins, dtype=np.int64)
    for b in ann.map_batches(_partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        bid = b.column("bin_id").to_numpy(zero_copy_only=False)
        np.add.at(n, bid, b.column("n").to_numpy(zero_copy_only=False))
        np.add.at(pos, bid, b.column("n_pos").to_numpy(zero_copy_only=False))
    return calibration_table(n, pos, bins)
