"""Pixel-level block segmentation (kernel/layout_detect.py)."""

import numpy as np
import pytest

from dots_ocr_ray.kernel.layout_detect import classify_block, detect_blocks


def test_empty_and_blank_pages():
    assert detect_blocks(np.full((32, 32), 255, np.uint8)) == []
    assert detect_blocks(np.zeros((0, 0), np.uint8)) == []
    assert detect_blocks(np.array([], np.uint8)) == []


def test_single_block_tight_bounds():
    img = np.full((40, 60), 255, np.uint8)
    img[10:20, 15:45] = 0
    assert detect_blocks(img) == [(15, 10, 45, 20)]


def test_two_column_with_title_reading_order():
    img = np.full((192, 256), 255, np.uint8)
    img[8:24, 32:224] = 60  # title
    img[48:80, 16:116] = 60  # left top
    img[92:124, 16:116] = 60  # left bottom
    img[48:80, 140:240] = 60  # right top
    blocks = detect_blocks(img)
    assert blocks == [
        (32, 8, 224, 24),
        (16, 48, 116, 80),
        (16, 92, 116, 124),
        (140, 48, 240, 80),
    ]


def test_min_gap_merges_close_lines():
    img = np.full((40, 60), 255, np.uint8)
    img[10:14, 10:50] = 0
    img[16:20, 10:50] = 0  # 2-px gap < min_gap=4: one block
    img[30:34, 10:50] = 0  # 10-px gap: separate block
    assert detect_blocks(img) == [(10, 10, 50, 20), (10, 30, 50, 34)]


def test_max_blocks_bound():
    img = np.full((8, 1000), 255, np.uint8)
    for k in range(0, 1000, 10):
        img[2:6, k : k + 4] = 0
    blocks = detect_blocks(img, max_blocks=16)
    assert len(blocks) <= 17  # bounded, never pathological


def test_classify_block_rules():
    assert classify_block((32, 8, 224, 24), 256, 192) == "Title"
    assert classify_block((16, 48, 240, 80), 256, 192) == "Text"  # tall
    assert classify_block((16, 48, 116, 80), 256, 192) == "Text"  # narrow
    assert classify_block((16, 48, 140, 58), 256, 192) == "Header"  # short strip


def test_shear_rows_exact_inversion():
    from dots_ocr_ray.kernel.layout_detect import shear_rows

    rng = np.random.RandomState(0)
    img = np.full((40, 80), 255, np.uint8)
    img[10:30, 20:60] = rng.randint(0, 200, (20, 40), dtype=np.uint8)
    for k in range(-3, 4):
        sheared = shear_rows(img, k)
        assert (shear_rows(sheared, k, invert=True) == img).all()


def test_detect_shear_recovers_planted_skew():
    from dots_ocr_ray.kernel.glyphs import render_text_line
    from dots_ocr_ray.kernel.layout_detect import detect_shear, shear_rows

    page = np.full((72, 170), 255, np.uint8)
    for i, t in enumerate(["TITLE OF DOCUMENT 000042", "BODY 0 42", "BODY 1 42"]):
        ink = render_text_line(t)
        page[2 + i * 16 : 9 + i * 16, 12 : 12 + ink.shape[1]][ink] = 0
    for k in range(-2, 3):
        assert detect_shear(shear_rows(page, k), k_range=2) == k
    # blank page: deterministic 0
    assert detect_shear(np.full((30, 30), 255, np.uint8)) == 0


def test_detect_grid_lines_and_cells():
    from dots_ocr_ray.kernel.glyphs import render_text_line
    from dots_ocr_ray.kernel.layout_detect import detect_grid_lines, read_table_cells

    img = np.full((37, 131), 255, np.uint8)  # 3x2 grid, 12/65 pitch
    for i in range(4):
        img[i * 12, :] = 0
    for j in range(3):
        img[:, j * 65] = 0
    texts = {(0, 0): "ID", (0, 1): "VAL", (1, 1): "57", (2, 0): "2"}
    for (r, c), t in texts.items():
        ink = render_text_line(t)
        img[r * 12 + 3 : r * 12 + 10, c * 65 + 3 : c * 65 + 3 + ink.shape[1]][ink] = 0
    rows, cols = detect_grid_lines(img < 128)
    assert rows == [0, 12, 24, 36] and cols == [0, 65, 130]
    cells = dict(((r, c), t) for r, c, t in read_table_cells(img))
    assert cells == {(0, 0): "ID", (0, 1): "VAL", (1, 0): "", (1, 1): "57", (2, 0): "2", (2, 1): ""}
    # no grid → no cells
    assert read_table_cells(np.full((30, 30), 255, np.uint8)) == []


def test_read_table_cells_noise_tolerant_and_fuzz():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dots_ocr_ray.kernel.glyphs import render_text_line
    from dots_ocr_ray.kernel.layout_detect import read_table_cells

    # noise inside a cell decodes through the Hamming classifier
    img = np.full((25, 131), 255, np.uint8)
    for i in range(3):
        img[i * 12, :] = 0
    for j in range(3):
        img[:, j * 65] = 0
    ink = render_text_line("57")
    img[3:10, 68 : 68 + ink.shape[1]][ink] = 0
    img[5, 70] = 255 - img[5, 70]  # flip one pixel
    cells = dict(((r, c), t) for r, c, t in read_table_cells(img, max_err=3))
    assert cells[(0, 1)] == "57"


def test_detect_blocks_never_crashes_fuzz():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dots_ocr_ray.kernel.layout_detect import detect_blocks

    @settings(max_examples=30, deadline=None)
    @given(h=st.integers(1, 40), w=st.integers(1, 40), seed=st.integers(0, 2**31 - 1))
    def _run(h, w, seed):
        rng = np.random.RandomState(seed)
        img = rng.randint(0, 256, (h, w), dtype=np.uint8)
        blocks = detect_blocks(img)
        for x1, y1, x2, y2 in blocks:
            assert 0 <= x1 < x2 <= w and 0 <= y1 < y2 <= h
        assert detect_blocks(img) == blocks  # deterministic

    _run()
