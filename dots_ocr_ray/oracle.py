"""Single-process reference oracle.

Runs the same pure kernel row-at-a-time in one process — the
deterministic reference implementation the north rule gates against:
the Ray pipeline's ``extracted_text`` must be byte-identical per url to
this oracle's output (BASELINE.json north_rule; SURVEY.md §5.2).
"""

from __future__ import annotations

import pyarrow as pa

from dots_ocr_ray.kernel.extract import ExtractConfig, extract_page


def oracle_extract(pages: pa.Table, config: ExtractConfig = ExtractConfig()) -> dict[str, dict]:
    """``{url: {extracted_text, extracted_text_nohf, spans, status}}``
    computed sequentially with zero parallelism."""
    out: dict[str, dict] = {}
    urls = pages.column("url").to_pylist()
    htmls = pages.column("html").to_pylist()
    texts = pages.column("text").to_pylist()
    for url, html, text in zip(urls, htmls, texts):
        out[url] = extract_page(url, html, text, config)
    return out
