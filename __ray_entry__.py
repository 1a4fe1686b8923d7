"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself; nothing here (or in the library)
initialises or shuts down Ray.

``queries()`` exposes one callable per implemented pipeline/operator
(SURVEY.md §2 + the training-data ops); ``oracle_sql()`` gives the
DuckDB-equivalent SQL over the same parquet tables.  Column names match
between the two on every query (the driver hashes values after sorting
columns by name).

The extraction queries run the REAL Ray pipeline (documents wrapped
into Common-Crawl-style pages by a deterministic rule, then the
actor-pool extraction kernel); the SQL mirrors the expected output of
that rule — see dots_ocr_ray/fixtures.py:page_row_from_document.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

# CASE expressions mirroring fixtures.page_row_from_document: which
# documents rows become fallback (script-only html) / failed (empty
# html+text) pages.  Keep in lockstep with FALLBACK_MOD/FAILED_MOD.
_STATUS_SQL = (
    "CASE WHEN doc_id % 31 = 11 THEN 'failed' "
    "WHEN doc_id % 23 = 7 THEN 'fallback' ELSE 'finished' END"
)
_TEXT_SQL = (
    "CASE WHEN doc_id % 31 = 11 THEN '' "
    "WHEN doc_id % 23 = 7 THEN trim(text) "
    "ELSE 'Doc ' || doc_id || chr(10) || chr(10) || trim(text) || chr(10) || chr(10) "
    "|| 'Footer ' || (doc_id % 40) END"
)
_TEXT_NOHF_SQL = (
    "CASE WHEN doc_id % 31 = 11 THEN '' "
    "WHEN doc_id % 23 = 7 THEN trim(text) "
    "ELSE 'Doc ' || doc_id || chr(10) || chr(10) || trim(text) END"
)
_NSPANS_SQL = "CASE WHEN doc_id % 31 = 11 THEN 0 WHEN doc_id % 23 = 7 THEN 1 ELSE 3 END"


def _extract_ds(sf_dir: str):
    from dots_ocr_ray.pipelines.extract import extract_pages
    from dots_ocr_ray.sources.pages import pages_from_documents

    pages = pages_from_documents(sf_dir, override_num_blocks=8)
    return extract_pages(pages, batch_size=64)


def _q_extract_text(sf_dir: str):
    ds = _extract_ds(sf_dir)
    return ds.select_columns(["doc_id", "extracted_text", "extracted_text_nohf", "status", "n_spans"])


def _q_extract_status_counts(sf_dir: str):
    import pyarrow as pa

    ds = _extract_ds(sf_dir)
    counts = ds.groupby(["lang", "status"]).count()

    def _rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            ["lang", "status", "n"] if batch.column_names[-1] == "count()" else batch.column_names
        )

    return counts.map_batches(_rename, batch_format="pyarrow")


def _q_extract_span_stats(sf_dir: str):
    import pyarrow as pa

    ds = _extract_ds(sf_dir)
    agg = ds.groupby("lang").sum("n_spans")
    counts = ds.groupby("lang").count()

    def _rename_sum(batch: pa.Table) -> pa.Table:
        cols = ["lang" if n == "lang" else "sum_spans" for n in batch.column_names]
        return batch.rename_columns(cols)

    def _rename_cnt(batch: pa.Table) -> pa.Table:
        cols = ["lang" if n == "lang" else "n_docs" for n in batch.column_names]
        return batch.rename_columns(cols)

    import pandas as pd

    a = _rename_sum(pa.Table.from_pylist(agg.take_all())).to_pandas()
    b = _rename_cnt(pa.Table.from_pylist(counts.take_all())).to_pandas()
    out = pd.merge(a, b, on="lang")
    out["sum_spans"] = out["sum_spans"].astype("int64")
    return out[["lang", "sum_spans", "n_docs"]]


def entry() -> Any:
    """Flagship pipeline: documents@sf0.001 → pages → actor-pool
    extraction → result Dataset (driver checks rows>=0, stable schema)."""
    ds = _extract_ds("/root/testdata/sf0.001")
    return ds.select_columns(
        ["url", "lang", "extracted_text", "extracted_text_nohf", "status", "n_spans", "bytes_in"]
    )


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "extract_text": _q_extract_text,
        "extract_status_counts": _q_extract_status_counts,
        "extract_span_stats": _q_extract_span_stats,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "extract_text": (
            f"SELECT doc_id, {_TEXT_SQL} AS extracted_text, "
            f"{_TEXT_NOHF_SQL} AS extracted_text_nohf, "
            f"{_STATUS_SQL} AS status, "
            f"CAST({_NSPANS_SQL} AS INT) AS n_spans FROM documents"
        ),
        "extract_status_counts": (
            "SELECT lang, status, CAST(count(*) AS BIGINT) AS n FROM "
            f"(SELECT lang, {_STATUS_SQL} AS status FROM documents) GROUP BY lang, status"
        ),
        "extract_span_stats": (
            f"SELECT lang, CAST(sum({_NSPANS_SQL}) AS BIGINT) AS sum_spans, "
            "CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang"
        ),
    }
