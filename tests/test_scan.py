"""Scanned-page pipeline (pipelines/scan.py) + the `scan` CLI path."""

import numpy as np
import pytest

from dots_ocr_ray.kernel.glyphs import render_text_line
from dots_ocr_ray.kernel.layout_detect import shear_rows
from dots_ocr_ray.kernel.png import encode_png
from dots_ocr_ray.pipelines.scan import read_png_dir, scan_page, scan_pages


def _page(lines, *, skew=0):
    page = np.full((72, 170), 255, np.uint8)
    for i, text in enumerate(lines):
        ink = render_text_line(text)
        page[2 + i * 16 : 9 + i * 16, 12 : 12 + ink.shape[1]][ink] = 0
    if skew:
        page = shear_rows(page, skew)
    return encode_png(page, filter_mode="cover")


def test_scan_page_kernel_full_result():
    res = scan_page(_page(["TITLE OF DOCUMENT 000007", "BODY 0 7"], skew=2))
    assert res["status"] == "finished"
    assert res["skew_px"] == 2
    assert res["n_blocks"] == 2
    assert res["markdown"] == "TITLE OF DOCUMENT 000007\n\nBODY 0 7"
    assert res["spans"][0]["category"] == "Title"
    assert res["spans"][1]["category"] == "Text"
    # offsets follow the markdown join rule
    assert res["spans"][0]["char_start"] == 0
    assert res["spans"][0]["char_end"] == len("TITLE OF DOCUMENT 000007")
    assert res["spans"][1]["char_start"] == res["spans"][0]["char_end"] + 2


def test_scan_page_fail_soft():
    assert scan_page(b"not a png")["status"] == "failed"
    assert scan_page(b"")["status"] == "failed"
    blank = encode_png(np.full((20, 20), 255, np.uint8))
    assert scan_page(blank)["status"] == "empty"


def test_scan_pages_dataset_and_png_dir(ray_session, tmp_path):
    for i, skew in enumerate([0, 1, -2]):
        (tmp_path / f"page-{i}.png").write_bytes(
            _page([f"TITLE OF DOCUMENT {i:06d}", f"BODY 0 {i}"], skew=skew)
        )
    (tmp_path / "bad.png").write_bytes(b"junk")
    media = read_png_dir(str(tmp_path / "*.png"))
    out = (
        scan_pages(media)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(out) == 4
    # sorted glob: bad.png is doc 0, pages are 1..3
    assert out.loc[0, "status"] == "failed"
    for row_i, (i, skew) in enumerate([(0, 0), (1, 1), (2, -2)], start=1):
        assert out.loc[row_i, "status"] == "finished"
        assert out.loc[row_i, "skew_px"] == skew
        assert out.loc[row_i, "markdown"] == f"TITLE OF DOCUMENT {i:06d}\n\nBODY 0 {i}"


def test_scan_cli(ray_session, tmp_path):
    import json

    from dots_ocr_ray.cli import main

    for i in range(2):
        (tmp_path / f"p{i}.png").write_bytes(_page([f"DOC {i:06d}"]))
    out_dir = tmp_path / "out"
    rc = main(
        [
            "scan",
            "--input",
            str(tmp_path / "*.png"),
            "--input-format",
            "png",
            "--out",
            str(out_dir),
        ]
    )
    assert rc == 0
    import pyarrow.parquet as pq

    import glob as globmod

    files = globmod.glob(str(out_dir / "*.parquet"))
    tbl = pq.read_table(files)
    assert tbl.num_rows == 2
    assert set(tbl.column("markdown").to_pylist()) == {"DOC 000000", "DOC 000001"}


def test_scan_page_table_branch():
    from dots_ocr_ray.kernel.layout_detect import shear_rows as _  # noqa: F401

    page = np.full((72, 170), 255, np.uint8)
    t_ink = render_text_line("TITLE OF DOCUMENT 000009")
    page[2:9, 12 : 12 + t_ink.shape[1]][t_ink] = 0
    # ruled 3x2 table at (12, 20): 12/65 pitch
    y0, x0 = 20, 12
    for i in range(4):
        page[y0 + i * 12, x0 : x0 + 131] = 0
    for j in range(3):
        page[y0 : y0 + 37, x0 + j * 65] = 0
    for (r, c), t in {(0, 0): "ID", (0, 1): "VAL", (1, 0): "1", (1, 1): "57", (2, 0): "2", (2, 1): "9"}.items():
        ink = render_text_line(t)
        page[y0 + r * 12 + 3 : y0 + r * 12 + 10, x0 + c * 65 + 3 : x0 + c * 65 + 3 + ink.shape[1]][ink] = 0
    res = scan_page(encode_png(page, filter_mode="cover"), deskew=False)
    assert res["status"] == "finished"
    assert [s["category"] for s in res["spans"]] == ["Title", "Table"]
    assert res["spans"][1]["text"] == "ID | VAL\n1 | 57\n2 | 9"
    assert res["markdown"] == "TITLE OF DOCUMENT 000009\n\nID | VAL\n1 | 57\n2 | 9"
    # a lone glyph never probes as a table
    lone = np.full((20, 20), 255, np.uint8)
    g = render_text_line("8")
    lone[6:13, 7:12][g] = 0
    res2 = scan_page(encode_png(lone), deskew=False)
    assert [s["category"] for s in res2["spans"]] == ["Text"]


def test_scan_page_picture_branch():
    page = np.full((72, 170), 255, np.uint8)
    t = render_text_line("TITLE OF DOCUMENT 000003")
    page[2:9, 12 : 12 + t.shape[1]][t] = 0
    yy, xx = np.mgrid[20:44, 12:92]
    page[20:44, 12:92][(yy + xx) % 2 == 0] = 40  # dithered figure
    b = render_text_line("BODY 0 3")
    page[52:59, 12 : 12 + b.shape[1]][b] = 0
    res = scan_page(encode_png(page, filter_mode="cover"), deskew=False)
    assert [s["category"] for s in res["spans"]] == ["Title", "Picture", "Text"]
    # the reference's empty-Picture markdown subtlety: an empty item
    # still joins, producing the double "\n\n"
    assert res["markdown"] == "TITLE OF DOCUMENT 000003\n\n\n\nBODY 0 3"
    assert res["spans"][1]["text"] == ""
