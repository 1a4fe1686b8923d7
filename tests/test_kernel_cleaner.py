"""Unit tests for the output repair / dedup ladder (reference
output_cleaner.py semantics, M7/M8/D1/D2)."""

import json

from dots_ocr_ray.kernel.cleaner import (
    clean_list_data,
    clean_model_output,
    clean_string_data,
    dedup_dict_substrings,
    ensure_json_format,
    fix_missing_delimiters,
    remove_duplicate_pairs_and_bboxes,
    truncate_last_incomplete_element,
)


def _cell(i, text="t"):
    return {"bbox": [i, i, i + 10, i + 10], "category": "Text", "text": text}


def test_fix_missing_delimiters():
    # the reference pattern (output_cleaner.py:39) rewrites `}{` only
    # when NOT followed by a quote (nested-dict boundary, not a new cell)
    s = '{"bbox": [1,2,3,4]} {bbox: [5,6,7,8]}'
    assert fix_missing_delimiters(s) == '{"bbox": [1,2,3,4]},{bbox: [5,6,7,8]}'
    s2 = '{"a": 1} {"b": 1}'
    assert fix_missing_delimiters(s2) == s2


def test_truncate_tail_only_when_multiple_elements():
    # single element, no ']' → never truncated away
    s = '[{"bbox": [1,2,3,4], "category": "Text", "text": "abc'
    assert truncate_last_incomplete_element(s) == s
    # two elements, missing ']' → last one dropped
    s2 = '[{"bbox": [1,2,3,4], "category": "Text"}, {"bbox": [5,6,7,8], "cat'
    out = truncate_last_incomplete_element(s2)
    assert out.endswith('}') and '"bbox": [5' not in out


def test_dedup_dict_substrings_preserves_order():
    a = json.dumps(_cell(1, "a"))
    b = json.dumps(_cell(2, "b"))
    s = f"[{a}, {b}, {a}]"
    out = dedup_dict_substrings(s)
    parsed = json.loads(ensure_json_format(out))
    assert parsed == [_cell(1, "a"), _cell(2, "b")]


def test_string_ladder_end_to_end():
    # malformed: truncated tail + missing closing bracket
    s = '[{"bbox": [1,2,3,4], "category": "Text", "text": "a"}, {"bbox": [5,6,7,8], "category": "Text", "text": "b"}, {"bbox": [9,9'
    out = clean_string_data(s)
    assert [c["text"] for c in out] == ["a", "b"]


def test_single_incomplete_dict_salvage():
    s = '[{"bbox": [10, 20, 30, 40], "category": "Table", "text": "partial tex'
    out = clean_string_data(s)
    # the bracket-fix step appends ']' before salvage (as the reference's
    # clean_string_data step 4 does), so the salvaged text carries it
    assert out == [{"bbox": [10, 20, 30, 40], "category": "Table", "text": "partial tex]"}]


def test_list_mode_three_coord_bbox():
    data = [
        {"bbox": [1, 2, 3], "category": "Text", "text": "keep me"},
        {"bbox": [1, 2, 3, 4], "category": "Text", "text": "normal"},
        {"bbox": "bad", "category": "Text", "text": "dropped"},
        {"category": "Text", "text": "no bbox kept"},
        {"text": "no category dropped"},
        "not a dict",
    ]
    out = clean_list_data(data)
    assert out == [
        {"category": "Text", "text": "keep me"},
        {"bbox": [1, 2, 3, 4], "category": "Text", "text": "normal"},
        {"category": "Text", "text": "no bbox kept"},
    ]


def test_pair_dedup_threshold_is_five():
    four = [dict(_cell(i), text="same") for i in range(4)]
    for i, c in enumerate(four):
        c["bbox"] = [i, 0, i + 1, 1]
    assert remove_duplicate_pairs_and_bboxes(list(four)) == four  # 4 < 5 → kept
    five = four + [{"bbox": [9, 0, 10, 1], "category": "Text", "text": "same"}]
    out = remove_duplicate_pairs_and_bboxes(five)
    assert len(out) == 1 and out[0] == five[0]  # first occurrence kept


def test_bbox_dedup_threshold_is_two():
    a = {"bbox": [0, 0, 5, 5], "category": "Text", "text": "x"}
    b = {"bbox": [0, 0, 5, 5], "category": "Title", "text": "y"}
    c = {"bbox": [9, 9, 10, 10], "category": "Text", "text": "z"}
    out = remove_duplicate_pairs_and_bboxes([a, b, c])
    assert out == [a, c]


def test_clean_model_output_never_raises():
    assert clean_model_output(None) == []
    assert clean_model_output(12345) == []
    assert clean_model_output("") == []
    assert clean_model_output("complete garbage }{") == []
