"""Template-matching OCR kernel (kernel/glyphs.py)."""

import numpy as np
import pytest

from dots_ocr_ray.kernel.glyphs import (
    ALPHABET,
    _GLYPHS,
    ocr_page_lines,
    read_text_line,
    render_text_line,
)


def test_every_alphabet_char_roundtrips():
    text = ALPHABET  # all 36 glyphs in one line
    assert read_text_line(render_text_line(text)) == text


@pytest.mark.parametrize(
    "text", ["DOC 000123", "HELLO WORLD", "A", "ABC XYZ 789", "A B C"]
)
def test_roundtrip_with_spaces(text):
    assert read_text_line(render_text_line(text)) == text


def test_glyphs_distinct_and_corner_pinned():
    assert len({g.tobytes() for g in _GLYPHS.values()}) == len(ALPHABET)
    for g in _GLYPHS.values():
        assert g[0, 0] and g[0, -1] and g[-1, 0] and g[-1, -1]


def test_unknown_cell_reads_question_mark():
    ink = render_text_line("AB")
    ink = ink.copy()
    ink[3, 2] = not ink[3, 2]  # flip one pixel inside 'A'
    got = read_text_line(ink)
    assert got[0] == "?" and got[1] == "B"


def test_edge_inputs():
    assert read_text_line(np.zeros((7, 0), bool)) == ""
    assert read_text_line(np.zeros((7, 30), bool)) == ""
    assert render_text_line("").shape == (7, 0)
    # wrong-height ink degrades to ?s, never raises
    assert set(read_text_line(np.ones((3, 11), bool))) == {"?"}


def test_ocr_page_lines_two_lines_with_spaces():
    page = np.full((40, 140), 255, np.uint8)
    for i, text in enumerate(["DOC 42", "LANG EN"]):
        ink = render_text_line(text)
        page[4 + i * 16 : 11 + i * 16, 4 : 4 + ink.shape[1]][ink] = 0
    assert ocr_page_lines(page) == ["DOC 42", "LANG EN"]
    assert ocr_page_lines(np.full((20, 20), 255, np.uint8)) == []


def test_noise_tolerant_matching():
    from dots_ocr_ray.kernel.glyphs import _MIN_PAIR_DIST

    assert _MIN_PAIR_DIST >= 7  # max_err=3 decisions guaranteed unique
    ink = render_text_line("HELLO 123").copy()
    for r, c in [(3, 2), (5, 8), (1, 14), (2, 20)]:
        ink[r, c] = not ink[r, c]
    assert "?" in read_text_line(ink)  # exact match fails
    assert read_text_line(ink, max_err=3) == "HELLO 123"
    # noise beyond the budget still refuses rather than guessing
    heavy = render_text_line("A").copy()
    for r in range(5):
        heavy[r, 2] = not heavy[r, 2]
    assert read_text_line(heavy, max_err=3) == "?"
