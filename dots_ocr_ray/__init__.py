"""dots_ocr_ray — a Ray-Data-native main-content extraction engine.

A from-scratch rebuild of the capabilities of the reference
(AKCqhzdy/dots.ocr — document layout parsing, reading-order sort,
layout-to-markdown serialization, output repair/dedup, fallback
extraction, md5-gated resume, per-job metrics) re-expressed over
Common-Crawl-style web pages as idiomatic Ray Data pipelines:
``ray.data.read_parquet → map_batches(actor pool, pyarrow batches) →
groupby/aggregate → write_parquet``.

Layout:
    kernel/     pure-Python deterministic extraction kernel (no Ray) —
                shared by the distributed pipeline and the single-process
                oracle; this is what makes byte-identical output testable.
    sources/    dataset constructors (pages table readers / synthesizers).
    stages/     map_batches callables & actor classes.
    pipelines/  end-to-end pipelines (extract, dedup, similarity, text
                analysis, relational/window ops).
    state/      resume manifests, partition markers, fail-ratio gate.
    functions/  scalar/vector function library shared across pipelines.
"""

__version__ = "0.1.0"

# Importing util fills Arrow's lazily-initialized unicode tables while
# this thread holds the import lock (util._arrow_unicode_warmup) — a
# racy first utf8-kernel call inside a multi-threaded Ray worker can
# otherwise silently mis-split whitespace on its first batch.  Any
# pipeline UDF unpickled in a worker imports this package first, so
# the warmup is guaranteed to precede every kernel call of ours.
from dots_ocr_ray import util as _util  # noqa: E402,F401

CATEGORIES = [
    "Caption",
    "Footnote",
    "Formula",
    "List-item",
    "Page-footer",
    "Page-header",
    "Picture",
    "Section-header",
    "Table",
    "Text",
    "Title",
]
"""The fixed 11-category layout schema (reference: dots_ocr/utils/prompts.py:7)."""
