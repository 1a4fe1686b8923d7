"""CDXJ index source: parse kernel hostility, streaming read with
skip counters, gzip + file:// URI paths."""

from __future__ import annotations

import gzip
import json

import pyarrow as pa

import ray.data

from dots_ocr_ray.sources.cdx import parse_cdx_lines, read_cdx


GOOD = b'com,example)/a 20240101000000 {"url": "https://example.com/a", "status": "200", "digest": "sha1:x", "length": 123}'


def test_parse_kernel_hostile_lines():
    raw = b"\n".join(
        [
            GOOD,
            b"",                                     # blank: ignored, not counted
            b"com,example)/b 2024 {}",               # short timestamp
            b"com,example)/c 20240101000000 [1,2]",  # json not an object
            b"only-two parts",                        # short line
            b"\xff\xfe garbage line with spaces x",   # undecodable / bad ts
            b'com,example)/d 20240101000001 {"status": "30x", "length": null}',
        ]
    )
    cols, skipped = parse_cdx_lines(raw)
    assert skipped == 4
    assert cols["urlkey"] == ["com,example)/a", "com,example)/d"]
    assert cols["ts"] == [20240101000000, 20240101000001]
    assert cols["status"] == [200, None]  # unparseable status -> null
    assert cols["length"] == [123, None]


def test_read_cdx_streaming_and_gzip(ray_session, tmp_path):
    plain = tmp_path / "a.cdx"
    plain.write_bytes(GOOD + b"\nbroken line\n")
    gz = tmp_path / "b.cdx.gz"
    rec = {"url": "u", "status": "404", "length": 7}
    with gzip.open(gz, "wb") as f:
        f.write(f"com,example)/z 20240102000000 {json.dumps(rec)}\n".encode())
    ds = read_cdx([str(plain), f"file://{gz}"])
    rows = sorted(ds.take_all(), key=lambda r: r["ts"])
    assert len(rows) == 2
    assert rows[0]["status"] == 200 and rows[0]["_skipped"] == 1
    assert rows[1]["status"] == 404 and rows[1]["_skipped"] == 0
    assert rows[1]["_source"].endswith("b.cdx.gz")


def test_cdx_trailing_garbage_counted_in_final_block(ray_session, tmp_path):
    """Per-file totals: malformed lines parsed after the last valid
    row's chunk still show up in the final block's _skipped stamp."""
    p = tmp_path / "tail.cdx"
    lines = [GOOD + b"\n" for _ in range(100)]
    lines += [b"broken line %d\n" % i for i in range(30)]
    p.write_bytes(b"".join(lines))
    rows = read_cdx(str(p), chunk_bytes=1 << 9).take_all()
    assert len(rows) == 100
    assert max(r["_skipped"] for r in rows) == 30
