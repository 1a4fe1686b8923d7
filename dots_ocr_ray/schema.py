"""Explicit Arrow schemas for the engine's data plane.

The reference keeps schemas implicit (Python dicts validated ad hoc,
e.g. reference layout_utils.py:226-239); here every table the engine
reads or writes has a declared ``pyarrow.Schema`` so blocks stay
zero-copy Arrow end-to-end.
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------------------
# Input: Common-Crawl-style pages table (BASELINE.json input_hint).
PAGES_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("html", pa.binary()),
        pa.field("text", pa.string()),
        pa.field("lang", pa.string()),
    ]
)

# ---------------------------------------------------------------------------
# Span = the cell analog (reference cell dict: bbox/category/text,
# prompts.py:7-17).  char_start/char_end are offsets into extracted_text;
# list order IS the reading order, exactly like the reference's cell-list
# order (output_cleaner.py:583-587 preserves it through cleaning).
SPAN_TYPE = pa.struct(
    [
        pa.field("category", pa.string()),
        pa.field("bbox", pa.list_(pa.int32(), 4)),
        pa.field("char_start", pa.int64()),
        pa.field("char_end", pa.int64()),
        pa.field("text", pa.string()),
    ]
)

# Extraction output row (analog of page result + .md/_nohf.md files,
# reference page_parser.py:199-231).
RESULT_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("lang", pa.string()),
        pa.field("extracted_text", pa.string()),
        pa.field("extracted_text_nohf", pa.string()),
        pa.field("spans", pa.list_(SPAN_TYPE)),
        pa.field("status", pa.string()),  # finished | fallback | failed (stats.py:23)
        pa.field("n_spans", pa.int32()),
        pa.field("bytes_in", pa.int64()),
        pa.field("partition_id", pa.int32()),
    ]
)

# Per-partition lineage/metrics rows (north_rule requirement; analog of
# JobTaskStats counters, reference job_executor_pool.py:53-57).
METRICS_SCHEMA = pa.schema(
    [
        pa.field("partition_id", pa.int32()),
        pa.field("input_rows", pa.int64()),
        pa.field("ok", pa.int64()),
        pa.field("fallback", pa.int64()),
        pa.field("failed", pa.int64()),
        pa.field("bytes_in", pa.int64()),
        pa.field("wall_ms", pa.int64()),
    ]
)

STATUS_FINISHED = "finished"
STATUS_FALLBACK = "fallback"
STATUS_FAILED = "failed"

# Job fails if failed/total exceeds this (reference configs.py:79,
# dotsocr_service.py:430-443).
TASK_FAIL_THRESHOLD = 0.1
