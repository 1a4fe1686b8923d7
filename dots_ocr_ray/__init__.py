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
