"""Resilient JSONL source (sources/jsonl.py): per-line damage skip
with observable counters, partial trailing lines, chunked streaming of
files larger than one read, and null-fill for missing fields."""

import json

import pyarrow as pa
import pytest

import ray.data

from dots_ocr_ray.sources.jsonl import read_jsonl

SCHEMA = pa.schema([("id", pa.int64()), ("text", pa.string())])


def _write(path, chunks: list[bytes]):
    with open(path, "wb") as f:
        for c in chunks:
            f.write(c)


def test_jsonl_skips_damage_and_counts(ray_session, tmp_path):
    p = str(tmp_path / "a.jsonl")
    _write(
        p,
        [
            json.dumps({"id": 1, "text": "hello"}).encode() + b"\n",
            b"{broken json\n",
            json.dumps({"id": 2}).encode() + b"\n",  # missing field -> null
            b"\xff\xfe not utf8 \n",
            b"[1,2,3]\n",  # valid JSON, not an object
            json.dumps({"id": 3, "text": "no trailing newline"}).encode(),
        ],
    )
    rows = read_jsonl(p, schema=SCHEMA).take_all()
    assert [r["id"] for r in rows] == [1, 2, 3]
    assert rows[1]["text"] is None
    assert rows[-1]["_skipped"] == 3
    assert all(r["_source"] == p for r in rows)


def test_jsonl_streams_in_chunks(ray_session, tmp_path):
    """A file far larger than chunk_bytes yields every row exactly
    once — lines split across chunk boundaries are reassembled."""
    p = str(tmp_path / "big.jsonl")
    n = 5000
    _write(
        p,
        [json.dumps({"id": i, "text": "x" * (i % 97)}).encode() + b"\n" for i in range(n)],
    )
    ds = read_jsonl(p, schema=SCHEMA, chunk_bytes=1 << 12)
    rows = ds.take_all()
    assert sorted(r["id"] for r in rows) == list(range(n))
    assert all(r["_skipped"] == 0 for r in rows)


def test_jsonl_multiple_files(ray_session, tmp_path):
    pa_ = str(tmp_path / "a.jsonl")
    pb = str(tmp_path / "b.jsonl")
    _write(pa_, [json.dumps({"id": 1, "text": "a"}).encode() + b"\n"])
    _write(pb, [b"garbage\n", json.dumps({"id": 2, "text": "b"}).encode() + b"\n"])
    rows = read_jsonl([pa_, pb], schema=SCHEMA).take_all()
    by_id = {r["id"]: r for r in rows}
    assert set(by_id) == {1, 2}
    assert by_id[1]["_skipped"] == 0 and by_id[2]["_skipped"] == 1


def test_jsonl_empty_and_all_garbage(ray_session, tmp_path):
    pe = str(tmp_path / "empty.jsonl")
    pg = str(tmp_path / "garbage.jsonl")
    _write(pe, [])
    _write(pg, [b"nope\n", b"{also nope\n"])
    assert read_jsonl([pe, pg], schema=SCHEMA).count() == 0
