"""The scanned-page pipeline as a reusable Dataset stage: image rows →
layout spans + markdown (the image-input twin of
`pipelines/extract.py`'s HTML path).

Mirrors the reference's image job shape (page image → layout model →
reading order → layoutjson2md: parser.py:49-96 `parse_image`,
pdf pages rasterized by pdf_extractor.py:23-44 `to_image` before the
same path in parser.py:98-176 `parse_pdf`; serialization
format_transformer.py:141-179)
with the repo's published-algorithm kernels: stdlib PNG decode →
optional projection-variance deskew → XY-cut block segmentation →
geometry classification → template OCR → the SAME `spans_to_markdown`
serialization the HTML path uses.  Fail-soft per row: undecodable or
blank pages land in status="failed"/"empty", never raise.

Scale shape: one stateless task per Arrow batch (the per-image work is
the unit — pages are independent); keep ``batch_size`` small because
rows carry whole images.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from dots_ocr_ray.schema import SPAN_TYPE

SCAN_RESULT_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.int64()),
        pa.field("status", pa.string()),  # finished | empty | failed
        pa.field("skew_px", pa.int32()),
        pa.field("n_blocks", pa.int32()),
        pa.field("markdown", pa.string()),
        pa.field("spans", pa.list_(SPAN_TYPE)),
    ]
)


def scan_page(
    payload: bytes,
    *,
    deskew: bool = True,
    k_range: int = 2,
    max_err: int = 3,
    min_gap: int = 8,
) -> dict:
    """Pure per-page kernel (shared by the Ray stage and tests):
    decode → (deskew) → segment → classify → OCR → serialize."""
    from dots_ocr_ray.kernel.glyphs import ocr_page_lines
    from dots_ocr_ray.kernel.layout_detect import (
        classify_block,
        detect_blocks,
        detect_shear,
        shear_rows,
    )
    from dots_ocr_ray.kernel.serialize import spans_to_markdown
    from dots_ocr_ray.stages.media import decode_gray_image

    empty = {"status": "failed", "skew_px": 0, "n_blocks": 0, "markdown": "", "spans": []}
    try:
        gray = decode_gray_image(payload or b"")
    except (ValueError, NotImplementedError):
        return dict(empty)
    k = 0
    if deskew:
        k = detect_shear(gray, k_range=k_range)
        if k:
            gray = shear_rows(gray, k, invert=True)
    from dots_ocr_ray.kernel.layout_detect import read_table_cells

    h, w = gray.shape
    spans = []
    for bbox in detect_blocks(gray, min_gap=min_gap):
        x1, y1, x2, y2 = bbox
        region = gray[y1:y2, x1:x2]
        # ruled-grid probe: a block with a >=2x2 CELL grid is a TABLE
        # (the reference's Table category) — cells OCR'd row-major and
        # serialized as pipe-markdown rows.  The size guard keeps a
        # lone glyph (whose 7x5 bitmap can have fully-inked border
        # rows) from probing as a degenerate grid; real text lines
        # never have full-coverage rules across their whole width
        cells = []
        if region.shape[0] >= 12 and region.shape[1] >= 12:
            cells = read_table_cells(region, max_err=max_err)
            if cells and (max(r for r, _, _ in cells) < 1 or max(c for _, c, _ in cells) < 1):
                cells = []  # demand >=2 rows AND >=2 cols of cells
        if cells:
            n_cols = max(c for _, c, _ in cells) + 1
            rows: list[list[str]] = []
            for r, c, t in cells:
                while len(rows) <= r:
                    rows.append([""] * n_cols)
                rows[r][c] = t
            text = "\n".join(" | ".join(row) for row in rows)
            category = "Table"
        else:
            text = "\n".join(ocr_page_lines(region, min_gap=min_gap, max_err=max_err))
            if text and not (set(text) - {"?", " ", "\n"}):
                # a dense region no glyph matches anywhere: a PICTURE
                # (photo/figure).  Mirroring the reference's semantics
                # (format_transformer.py:141-179): a Picture cell with
                # no description contributes an EMPTY markdown item
                category = "Picture"
                text = ""
            else:
                category = classify_block(bbox, w, h)
        spans.append(
            {
                "category": category,
                "bbox": [int(v) for v in bbox],
                "char_start": 0,
                "char_end": 0,
                "text": text,
            }
        )
    # char offsets via the serializer's own accounting (same rule as
    # the HTML path: offsets into the joined markdown)
    md = spans_to_markdown(spans)
    pos = 0
    for i, s in enumerate(spans):
        t = s["text"] or ""
        s["char_start"] = pos
        s["char_end"] = pos + len(t)
        pos += len(t) + (2 if i + 1 < len(spans) else 0)
    return {
        "status": "finished" if spans else "empty",
        "skew_px": int(k),
        "n_blocks": len(spans),
        "markdown": md,
        "spans": spans,
    }


def scan_pages(
    media: ray.data.Dataset,
    *,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    deskew: bool = True,
    max_err: int = 3,
    batch_size: int = 16,
) -> ray.data.Dataset:
    """Image rows → SCAN_RESULT_SCHEMA rows (stateless tasks)."""

    def _scan(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_pylist()
        payloads = batch.column(payload_col).to_pylist()
        rows = []
        for d, p in zip(ids, payloads):
            res = scan_page(p, deskew=deskew, max_err=max_err)
            res["doc_id"] = int(d) if d is not None else -1
            rows.append(res)
        return pa.Table.from_pylist(rows, schema=SCAN_RESULT_SCHEMA)

    return media.map_batches(_scan, batch_format="pyarrow", batch_size=batch_size)


def read_png_dir(pattern: str) -> ray.data.Dataset:
    """A directory/glob of ``.png`` files → media rows ``(doc_id,
    path, payload)``; doc_id is the file's sorted index (stable), one
    read task per file batch."""
    import glob as globmod
    import os

    paths = sorted(globmod.glob(pattern))
    if not paths:
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "path": pa.array([], type=pa.string()),
                    "payload": pa.array([], type=pa.binary()),
                }
            )
        )

    def _read(batch: pa.Table) -> pa.Table:
        ids, outs = [], []
        for i, p in zip(batch.column("doc_id").to_pylist(), batch.column("path").to_pylist()):
            with open(p, "rb") as f:
                outs.append(f.read())
            ids.append(i)
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "path": batch.column("path"),
                "payload": pa.array(outs, type=pa.binary()),
            }
        )

    base = ray.data.from_items(
        [{"doc_id": i, "path": p} for i, p in enumerate(paths)],
        override_num_blocks=max(1, min(len(paths), 64)),
    )
    return base.map_batches(_read, batch_format="pyarrow")
