"""WARC source: Common-Crawl-native input for the extraction pipeline.

The reference ingests documents through a universal fetch/normalize
seam (S4, `dots_ocr/utils/doc_utils.py` + `app/utils/storage.py`); at
100 TB the natural on-disk form of a web corpus is WARC (ISO 28500 —
the public Common Crawl format), so this module provides a pure-Python
reader that turns ``*.warc`` / ``*.warc.gz`` files into the engine's
pages schema ``(url, warc_ts, html, text, lang)``.

Scale shape:
- one TASK per WARC file (the shard unit — same zero-exchange layout
  as :func:`pipelines.extract.extract_shards`), scheduled by the
  streaming executor with backpressure;
- each task STREAMS its file record-by-record (never whole-file in
  memory; gzip members decode incrementally via the stdlib) and yields
  Arrow batches of ``batch_rows`` rows, so block size stays bounded
  no matter how large one WARC is;
- malformed records are skipped and counted, never fatal (the kernel's
  never-raise discipline).
"""

from __future__ import annotations

import gzip
import io
from collections.abc import Iterator
from datetime import datetime

import pyarrow as pa

import ray.data

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

_CRLF = b"\r\n"


def _read_headers(stream) -> dict[str, str] | None:
    """Read a WARC header block (terminated by an empty line).  Returns
    None at EOF."""
    version = stream.readline()
    while version in (_CRLF, b"\n"):  # skip inter-record blank lines
        version = stream.readline()
    if not version:
        return None
    if not version.startswith(b"WARC/"):
        raise ValueError(f"not a WARC record header: {version[:40]!r}")
    headers: dict[str, str] = {}
    last_key: str | None = None
    while True:
        line = stream.readline()
        if not line or line in (_CRLF, b"\n"):
            break
        if line[:1] in (b" ", b"\t") and last_key is not None:
            # folded header continuation (ISO 28500 §4: LWS-prefixed
            # lines extend the previous field value)
            headers[last_key] += " " + line.decode("utf-8", "replace").strip()
            continue
        if b":" in line:
            k, v = line.split(b":", 1)
            last_key = k.decode("ascii", "replace").strip().lower()
            headers[last_key] = v.decode("utf-8", "replace").strip()
    return headers


def http_payload(block: bytes) -> bytes:
    """Strip the HTTP response envelope from a ``response`` record
    block → the body bytes.  A block that is not an HTTP message is
    returned unchanged."""
    if block[:5] in (b"HTTP/", b"http/"):
        sep = block.find(b"\r\n\r\n")
        if sep != -1:
            return block[sep + 4 :]
    return block


def parse_warc_date(value: str) -> datetime | None:
    try:
        return datetime.fromisoformat(value.replace("Z", "+00:00")).replace(tzinfo=None)
    except ValueError:
        return None


def iter_warc_records(stream) -> Iterator[tuple[dict[str, str], bytes]]:
    """Stream (headers, block) pairs off a binary WARC stream.  The
    block is read exactly per Content-Length; the record trailer
    (CRLF CRLF) is consumed."""
    while True:
        headers = _read_headers(stream)
        if headers is None:
            return
        length = int(headers.get("content-length", "0"))
        block = stream.read(length)
        if len(block) < length:
            return  # truncated tail record
        yield headers, block


def _open_warc(path: str):
    fobj = open(path, "rb")
    if path.endswith(".gz"):
        # Common Crawl gzips each record as its own member; the stdlib
        # reader concatenates members transparently and decompresses
        # incrementally — no whole-file buffering.
        return gzip.open(fobj, "rb")
    return io.BufferedReader(fobj)


def _warc_file_batches(path: str, record_types: frozenset[str], batch_rows: int):
    urls, tss, htmls = [], [], []
    with _open_warc(path) as stream:
        records = iter_warc_records(stream)
        while True:
            try:
                headers, block = next(records)
            except StopIteration:
                break
            except (ValueError, EOFError, OSError):
                # corrupt record framing / bad gzip member mid-file:
                # keep what parsed so far, drop the unreadable tail —
                # a damaged shard must degrade, never kill the task
                # (the kernel's never-raise discipline)
                break
            if headers.get("warc-type", "") not in record_types:
                continue
            url = headers.get("warc-target-uri", "")
            if not url:
                continue
            urls.append(url)
            tss.append(parse_warc_date(headers.get("warc-date", "")))
            htmls.append(http_payload(block))
            if len(urls) >= batch_rows:
                yield _pages_table(urls, tss, htmls)
                urls, tss, htmls = [], [], []
    if urls:
        yield _pages_table(urls, tss, htmls)


def _pages_table(urls, tss, htmls) -> pa.Table:
    n = len(urls)
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(tss, type=pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array([""] * n, type=pa.string()),
            "lang": pa.array([""] * n, type=pa.string()),
        }
    )


def read_warc(
    paths: str | list[str],
    *,
    record_types: tuple[str, ...] = ("response",),
    batch_rows: int = 256,
) -> ray.data.Dataset:
    """WARC file(s) → pages Dataset ``(url, warc_ts, html, text,
    lang)``.  ``paths`` may be a glob, a single path, or a list; one
    streaming task per file."""
    if isinstance(paths, str):
        import glob as globmod

        expanded = sorted(globmod.glob(paths)) or [paths]
    else:
        expanded = list(paths)
    if not expanded:
        return ray.data.from_arrow(PAGES_SCHEMA.empty_table())
    types = frozenset(record_types)

    def _parse(batch: pa.Table) -> Iterator[pa.Table]:
        emitted = False
        for path in batch.column("path").to_pylist():
            for tbl in _warc_file_batches(path, types, batch_rows):
                emitted = True
                yield tbl
        if not emitted:
            yield PAGES_SCHEMA.empty_table()

    work = ray.data.from_items(
        [{"path": p} for p in expanded], override_num_blocks=len(expanded)
    )
    return work.map_batches(_parse, batch_size=1, batch_format="pyarrow")


def make_warc_bytes(records: list[dict], *, compress: bool = False) -> bytes:
    """Build WARC bytes from ``{url, date, html}`` dicts — the test /
    fixture writer (each record its own gzip member when compressed,
    Common-Crawl style)."""
    out = io.BytesIO()
    for rec in records:
        body = rec["html"] if isinstance(rec["html"], bytes) else rec["html"].encode("utf-8")
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
        head = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            + f"WARC-Target-URI: {rec['url']}\r\n".encode()
            + f"WARC-Date: {rec.get('date', '2025-01-01T00:00:00Z')}\r\n".encode()
            + f"Content-Length: {len(http)}\r\n".encode()
            + b"\r\n"
        )
        payload = head + http + b"\r\n\r\n"
        out.write(gzip.compress(payload) if compress else payload)
    return out.getvalue()
