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
