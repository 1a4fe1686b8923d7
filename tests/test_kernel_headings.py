"""Unit tests for the heading-level rebuild (reference J1 semantics,
directory_entry.py:15-215)."""

from dots_ocr_ray.kernel.headings import SectionHeader, indel_ratio, rebuild_directory_by_toc


def test_level_extraction_rules():
    assert SectionHeader("Anything", "Title", [0, 0, 1, 1]).level == 0
    assert SectionHeader("## Two", "Section-header", [0, 0, 1, 1]).level == 2
    assert SectionHeader("**Bold**", "Section-header", [0, 0, 1, 1]).level == 7
    assert SectionHeader("Bare", "Section-header", [0, 0, 1, 1]).level == 8
    assert SectionHeader("# One", "List-item", [0, 0, 1, 1]).level == 11
    assert SectionHeader("Bare", "List-item", [0, 0, 1, 1]).level == 18


def test_clean_text_strips_markdown():
    h = SectionHeader("### My Header", "Section-header", [0, 0, 1, 1])
    assert h.clean_text == "My Header"
    h2 = SectionHeader("**Bold Head**", "Section-header", [0, 0, 1, 1])
    assert h2.clean_text == "Bold Head"


def test_indel_ratio():
    assert indel_ratio("abc", "abc") == 100.0
    assert indel_ratio("abc", "xyz") == 0.0
    assert 0 < indel_ratio("header one", "header two") < 100


def test_calc_dist_fuzzy_gate():
    h = SectionHeader("1.2 Introduction", "Section-header", [10, 10, 100, 20])
    # numeric prefix stripped before fuzzy match
    assert h.calc_dist({"text": "Introduction", "to": [50, 15]}) == 0.0
    assert h.calc_dist({"text": "Completely Different", "to": [50, 15]}) == float("inf")
    # outside the bbox → euclidean distance
    d = h.calc_dist({"text": "Introduction", "to": [10, 40]})
    assert d == 20.0


def test_rebuild_matched_header_gets_toc_level():
    spans = [
        {"category": "Section-header", "bbox": [0, 10, 100, 20], "text": "Overview"},
        {"category": "Text", "bbox": [0, 30, 100, 40], "text": "body"},
    ]
    toc = [{"level": 2, "text": "Overview", "to": [5, 15]}]
    rebuild_directory_by_toc(spans, toc)
    assert spans[0]["text"] == "## Overview"
    assert spans[1]["text"] == "body"  # non-headers untouched


def test_rebuild_unmatched_releveled_with_max5_floor():
    spans = [
        {"category": "Section-header", "bbox": [0, 10, 100, 20], "text": "Matched"},
        {"category": "Section-header", "bbox": [0, 30, 100, 40], "text": "Unmatched"},
        {"category": "List-item", "bbox": [0, 50, 100, 60], "text": "item"},
    ]
    toc = [{"level": 1, "text": "Matched", "to": [5, 15]}]
    rebuild_directory_by_toc(spans, toc)
    # matched → level 1 → "# " + title rewrite
    assert spans[0]["text"] == "# Matched"
    # unmatched Section-header: max_level=max(5,1)=5; rank 0 → level 6
    assert spans[1]["text"] == "###### Unmatched"
    # List-item → level 8 → bare text
    assert spans[2]["text"] == "item"
    assert spans[2]["category"] == "List-item"


def test_rebuild_level7_bold_rewrite():
    spans = [
        {"category": "Section-header", "bbox": [0, 0, 10, 10], "text": "A"},
        {"category": "Section-header", "bbox": [0, 20, 10, 30], "text": "B"},
    ]
    toc = [
        {"level": 6, "text": "A", "to": [5, 5]},
    ]
    rebuild_directory_by_toc(spans, toc)
    assert spans[0]["text"] == "###### A"
    # unmatched: max_level=6, rank 0 → min(8, 6+1)=7 → bold rewrite
    assert spans[1]["text"] == "**B**"
