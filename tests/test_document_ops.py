"""Tests for document-level merge / crawl dedup / salted domain
metrics (reference S8/O2/D3 analogs)."""

import datetime

import pyarrow as pa

import ray.data

from dots_ocr_ray.functions.viz import render_layout
from dots_ocr_ray.pipelines.document import (
    latest_page_per_url,
    merge_document_pages,
    metrics_by_domain,
)


def test_merge_document_pages_sorts_by_page_no(ray_session):
    rows = [
        {"doc_url": "d1", "page_no": 2, "extracted_text": "page two", "extracted_text_nohf": "p2"},
        {"doc_url": "d1", "page_no": 1, "extracted_text": "page one", "extracted_text_nohf": "p1"},
        {"doc_url": "d2", "page_no": 1, "extracted_text": "solo", "extracted_text_nohf": "solo"},
    ]
    out = merge_document_pages(ray.data.from_items(rows)).to_pandas().sort_values("doc_url")
    d1 = out[out.doc_url == "d1"].iloc[0]
    assert d1.extracted_text == "page one\n\npage two"  # page_no order, \n\n join
    assert d1.n_pages == 2
    assert out[out.doc_url == "d2"].iloc[0].extracted_text == "solo"


def test_latest_page_per_url(ray_session):
    t0 = datetime.datetime(2025, 1, 1)
    rows = [
        {"url": "u1", "warc_ts": t0, "html": b"old"},
        {"url": "u1", "warc_ts": t0 + datetime.timedelta(days=1), "html": b"new"},
        {"url": "u2", "warc_ts": t0, "html": b"only"},
    ]
    out = latest_page_per_url(ray.data.from_items(rows)).to_pandas().sort_values("url")
    assert len(out) == 2
    assert out[out.url == "u1"].iloc[0].html == b"new"


def test_metrics_by_domain_salted(ray_session):
    rows = []
    for i in range(100):
        domain = "hot.example.com" if i % 2 == 0 else f"site-{i % 5}.org"
        rows.append(
            {
                "url": f"https://{domain}/p{i}",
                "status": "finished" if i % 3 else "fallback",
                "bytes_in": 100,
            }
        )
    out = metrics_by_domain(ray.data.from_items(rows), n_salt=4).to_pandas()
    hot = out[out.domain == "hot.example.com"].iloc[0]
    assert hot.rows == 50
    assert hot.bytes_in == 5000
    assert out.rows.sum() == 100


def test_render_layout():
    spans = [
        {"category": "Title", "bbox": [0, 1, 10, 2], "text": "Hello"},
        {"category": "Text", "bbox": [0, 3, 99, 4], "text": "x" * 100},
    ]
    art = render_layout(spans)
    assert "[0] Title" in art and "(0,1,10,2)" in art
    assert "…" in art  # long text truncated


def test_pages_explode_merge_roundtrip(ray_session):
    """pages_from_multipage_docs ∘ merge_document_pages is word-level
    lossless for any n_pages (the S2 explode is the inverse of the
    S8/O2 merge up to the page-join separator)."""
    import ray.data

    from dots_ocr_ray.pipelines.document import (
        merge_document_pages,
        pages_from_multipage_docs,
    )

    rows = [
        {"doc_id": 1, "text": " ".join(f"w{i}" for i in range(17))},
        {"doc_id": 2, "text": "solo"},
        {"doc_id": 3, "text": ""},
    ]
    docs = ray.data.from_items(rows)
    merged = (
        merge_document_pages(pages_from_multipage_docs(docs, n_pages=3))
        .to_pandas()
        .sort_values("doc_url")
        .reset_index(drop=True)
    )
    assert merged.n_pages.tolist() == [3, 3, 3]
    # words survive in order (separators differ: " " within a page,
    # "\n\n" at page joins)
    for row, src in zip(merged.itertuples(), rows):
        assert row.extracted_text.split() == src["text"].split()


def test_crawl_diff(ray_session):
    import pyarrow as pa
    import ray.data

    from dots_ocr_ray.pipelines.document import crawl_diff

    def snap(rows):
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                    "content_md5": pa.array([r[1] for r in rows], type=pa.string()),
                }
            )
        )

    old = snap([(1, "a"), (2, "b"), (3, "c")])
    new = snap([(2, "b"), (3, "c2"), (4, "d")])
    got = {r["doc_id"]: r["change"] for r in crawl_diff(old, new).take_all()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}
