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


def test_write_jsonl_roundtrip(ray_session, tmp_path):
    import pyarrow as pa
    import ray.data

    from dots_ocr_ray.sources.jsonl import read_jsonl, write_jsonl

    tbl = pa.table(
        {
            "doc_id": pa.array(range(100), type=pa.int64()),
            "text": pa.array([f"doc {i} café ✓" for i in range(100)], type=pa.string()),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(4)
    out = str(tmp_path / "export")
    manifest = write_jsonl(ds, out)
    paths = [m["path"] for m in manifest]
    assert len(paths) == 4 and all(p.endswith(".jsonl.gz") for p in paths)
    assert sum(m["rows"] for m in manifest) == 100

    back = read_jsonl(
        paths, schema=pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    )
    got = back.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == list(range(100))
    assert got["text"].tolist() == tbl.column("text").to_pylist()
    assert (got["_skipped"].to_numpy() >= 0).all()

    # idempotent re-run: same content-addressed names, no new files
    paths2 = [m["path"] for m in write_jsonl(ds, out)]
    assert paths2 == paths


def test_write_jsonl_identical_blocks_do_not_collide(ray_session, tmp_path):
    """Two distinct blocks with byte-identical content must both land
    on disk (dup-heavy corpora are the norm here): the writer resolves
    content-address collisions with deterministic -dupN copies."""
    import pyarrow as pa

    import ray.data

    from dots_ocr_ray.sources.jsonl import read_jsonl, write_jsonl

    tbl = pa.table(
        {
            "doc_id": pa.array([7, 7], type=pa.int64()),
            "text": pa.array(["same", "same"], type=pa.string()),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(2)  # 2 identical 1-row blocks
    out = str(tmp_path / "dup_export")
    manifest = write_jsonl(ds, out)
    assert len(manifest) == 2 and len({m["path"] for m in manifest}) == 2
    assert sum(m["rows"] for m in manifest) == 2
    back = read_jsonl(
        [m["path"] for m in manifest],
        schema=pa.schema([("doc_id", pa.int64()), ("text", pa.string())]),
    )
    assert back.count() == 2  # no silent row loss

    # re-run stays name-stable (same data -> same collision -> same names)
    manifest2 = write_jsonl(ds, out)
    assert sorted(m["path"] for m in manifest2) == sorted(m["path"] for m in manifest)


def test_jsonl_trailing_garbage_counted_in_final_block(ray_session, tmp_path):
    """Malformed lines in chunks AFTER the last valid row must appear
    in the per-file total carried by the file's final block (the held-
    back-block stamping contract)."""
    import json as _json

    p = str(tmp_path / "tail.jsonl")
    lines = [_json.dumps({"id": i, "text": "y" * 40}).encode() + b"\n" for i in range(200)]
    lines += [b"{broken tail %d\n" % i for i in range(50)]
    _write(p, lines)
    # chunk_bytes small enough that the garbage tail parses in chunks
    # after the last valid row's block was formed
    rows = read_jsonl(p, schema=SCHEMA, chunk_bytes=1 << 9).take_all()
    assert sorted(r["id"] for r in rows) == list(range(200))
    assert max(r["_skipped"] for r in rows) == 50
