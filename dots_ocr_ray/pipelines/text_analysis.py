"""Text-analysis pipelines over the documents table: language ID,
quality scoring, token counting, fingerprinting — the per-document
annotation ops a training-data pipeline runs at corpus scale.

All are a single stateless vectorizable ``map_batches`` (regexes are
module-level compiled = warm on every worker); aggregates use the
partial-then-small-groupby pattern.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from dots_ocr_ray.kernel.textops import (
    count_tokens_bpeish,
    count_tokens_whitespace,
    detect_lang,
    fingerprint,
    quality_features,
    quality_keep,
)


ALL_FEATURES = ("lang", "tokens", "quality", "fingerprint")
"""Feature families: "tokens" computes both counters; "tokens_ws" /
"tokens_bpe" select a single counter."""


def annotate_documents(
    ds: ray.data.Dataset,
    text_col: str = "text",
    *,
    features: tuple[str, ...] = ALL_FEATURES,
) -> ray.data.Dataset:
    """Add lang_pred / quality / token-count / fingerprint columns.

    ``features`` selects which (heuristic, per-string Python) feature
    families to compute — an aggregate that needs only token counts
    should not pay for language-ID and winnowing fingerprints on every
    document (they are the dominant per-row cost at corpus scale)."""
    want = frozenset(features)

    def _annotate(batch: pa.Table) -> pa.Table:
        texts = [t or "" for t in batch.column(text_col).to_pylist()]
        if "lang" in want:
            batch = batch.append_column(
                "lang_pred", pa.array([detect_lang(t) for t in texts], type=pa.string())
            )
        if "tokens" in want or "tokens_ws" in want:
            batch = batch.append_column(
                "n_tokens_ws", pa.array([count_tokens_whitespace(t) for t in texts], type=pa.int64())
            )
        if "tokens" in want or "tokens_bpe" in want:
            batch = batch.append_column(
                "n_tokens_bpe", pa.array([count_tokens_bpeish(t) for t in texts], type=pa.int64())
            )
        if "quality" in want:
            feats = [quality_features(t) for t in texts]
            batch = (
                batch.append_column("punct_ratio", pa.array([f["punct_ratio"] for f in feats], type=pa.float64()))
                .append_column("alpha_ratio", pa.array([f["alpha_ratio"] for f in feats], type=pa.float64()))
                .append_column("stopword_ratio", pa.array([f["stopword_ratio"] for f in feats], type=pa.float64()))
                .append_column("mean_word_len", pa.array([f["mean_word_len"] for f in feats], type=pa.float64()))
                .append_column("quality_keep", pa.array([quality_keep(f) for f in feats], type=pa.bool_()))
            )
        if "fingerprint" in want:
            batch = batch.append_column(
                "fingerprint", pa.array([fingerprint(t) for t in texts], type=pa.uint64())
            )
        return batch

    return ds.map_batches(_annotate, batch_format="pyarrow")


def token_count_by_lang(sf_dir: str) -> ray.data.Dataset:
    """Per-lang token totals (whitespace tokenizer) over documents."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    annotated = annotate_documents(docs, features=("tokens",))
    agg = annotated.groupby("lang").sum(["n_tokens_ws", "n_tokens_bpe"])

    def _rename(batch: pa.Table) -> pa.Table:
        mapping = {"sum(n_tokens_ws)": "sum_tokens_ws", "sum(n_tokens_bpe)": "sum_tokens_bpe"}
        return batch.rename_columns([mapping.get(n, n) for n in batch.column_names])

    return agg.map_batches(_rename, batch_format="pyarrow")


def quality_filter(sf_dir: str) -> ray.data.Dataset:
    """Documents that pass the quality keep-rule, with their features."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    annotated = annotate_documents(docs, features=("tokens_ws", "quality"))

    def _keep(batch: pa.Table) -> pa.Table:
        return batch.filter(batch.column("quality_keep"))

    return annotated.map_batches(_keep, batch_format="pyarrow").select_columns(
        ["doc_id", "lang", "n_tokens_ws", "alpha_ratio", "mean_word_len"]
    )


def lang_id_confusion(sf_dir: str) -> ray.data.Dataset:
    """(declared lang, predicted lang, count) — a confusion table for
    the n-gram language-ID heuristic."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    annotated = annotate_documents(docs, features=("lang",))
    counts = annotated.groupby(["lang", "lang_pred"]).count()

    def _rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["lang", "lang_pred", "n"])

    return counts.map_batches(_rename, batch_format="pyarrow")


def fingerprint_duplicates(sf_dir: str) -> ray.data.Dataset:
    """Groups of documents sharing a winnowing fingerprint (shift-robust
    near-dup signal): (fingerprint, n_docs, min_doc_id) for groups >1."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    annotated = annotate_documents(docs, features=("fingerprint",))

    def _partial(batch: pa.Table) -> pa.Table:
        return batch.select(["fingerprint", "doc_id"])

    def _group(group: pa.Table) -> pa.Table:
        n = group.num_rows
        if n < 2:
            return pa.table(
                {
                    "fingerprint": pa.array([], type=pa.uint64()),
                    "n_docs": pa.array([], type=pa.int64()),
                    "min_doc_id": pa.array([], type=pa.int64()),
                }
            )
        import pyarrow.compute as pc

        return pa.table(
            {
                "fingerprint": group.column("fingerprint").slice(0, 1),
                "n_docs": pa.array([n], type=pa.int64()),
                "min_doc_id": pa.array([pc.min(group.column("doc_id")).as_py()], type=pa.int64()),
            }
        )

    return (
        annotated.map_batches(_partial, batch_format="pyarrow")
        .groupby("fingerprint")
        .map_groups(_group, batch_format="pyarrow")
    )
