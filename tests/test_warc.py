"""WARC source tests: pure-Python record walker, gzip members, pages
schema, and end-to-end extraction from WARC input."""

import io

import pytest

import ray.data

from dots_ocr_ray.sources.warc import (
    PAGES_SCHEMA,
    http_payload,
    iter_warc_records,
    make_warc_bytes,
    read_warc,
)

RECORDS = [
    {"url": "https://a.test/x", "date": "2025-03-01T10:00:00Z", "html": "<html><body><h1>T</h1><p>hello world</p></body></html>"},
    {"url": "https://b.test/y", "date": "2025-03-02T11:30:00Z", "html": "<p>second page body text</p>"},
    {"url": "https://c.test/z", "date": "2025-03-03T12:45:00Z", "html": b"<p>bytes \xc3\xa9</p>"},
]


def _write(tmp_path, name, compress):
    p = tmp_path / name
    p.write_bytes(make_warc_bytes(RECORDS, compress=compress))
    return str(p)


def test_record_walker_plain_and_gzip(tmp_path):
    import gzip

    for compress in (False, True):
        raw = make_warc_bytes(RECORDS, compress=compress)
        stream = io.BytesIO(gzip.decompress(raw) if False else raw)
        if compress:
            stream = gzip.open(io.BytesIO(raw), "rb")
        recs = list(iter_warc_records(stream))
        assert len(recs) == 3
        assert recs[0][0]["warc-target-uri"] == "https://a.test/x"
        assert http_payload(recs[0][1]).startswith(b"<html>")


def test_read_warc_schema_and_rows(ray_session, tmp_path):
    path = _write(tmp_path, "t.warc", compress=False)
    ds = read_warc(path)
    tbl = ds.to_pandas().sort_values("url").reset_index(drop=True)
    assert list(tbl.columns) == [f.name for f in PAGES_SCHEMA]
    assert len(tbl) == 3
    assert tbl.url[0] == "https://a.test/x"
    assert bytes(tbl.html[0]).startswith(b"<html>")
    assert str(tbl.warc_ts[0]) == "2025-03-01 10:00:00"


def test_read_warc_gz_and_glob(ray_session, tmp_path):
    _write(tmp_path, "a.warc.gz", compress=True)
    _write(tmp_path, "b.warc.gz", compress=True)
    ds = read_warc(f"{tmp_path}/*.warc.gz")
    assert ds.count() == 6  # 3 records × 2 files


def test_extract_from_warc_end_to_end(ray_session, tmp_path):
    from dots_ocr_ray.pipelines.extract import extract_pages

    path = _write(tmp_path, "t.warc.gz", compress=True)
    out = extract_pages(read_warc(path), batch_size=8, concurrency=2).to_pandas()
    assert len(out) == 3
    by_url = dict(zip(out.url, out.extracted_text))
    assert "hello world" in by_url["https://a.test/x"]
    assert set(out.status) <= {"finished", "fallback", "failed"}


def test_truncated_and_empty_inputs(ray_session, tmp_path):
    p = tmp_path / "trunc.warc"
    raw = make_warc_bytes(RECORDS)
    p.write_bytes(raw[: len(raw) - 40])  # cut inside the last block
    ds = read_warc(str(p))
    assert ds.count() == 2  # truncated tail record dropped, no raise
    assert read_warc([]).count() == 0
