"""Unit tests for geometry kernels (reference M1/M4/M5/M18)."""

import pytest

from dots_ocr_ray.kernel.geometry import (
    exclude_overlap_boxes,
    iou,
    post_process_bboxes,
    pre_process_bboxes,
    smart_resize,
    validate_and_clamp_bbox,
)


def test_smart_resize_snaps_to_28():
    h, w = smart_resize(1000, 700)
    assert h % 28 == 0 and w % 28 == 0
    assert abs(h / w - 1000 / 700) < 0.1


def test_smart_resize_min_pixels():
    h, w = smart_resize(10, 10)
    assert h * w >= 3136


def test_smart_resize_max_pixels():
    h, w = smart_resize(10000, 10000)
    assert h * w <= 11289600


def test_smart_resize_rejects_extreme_aspect():
    with pytest.raises(ValueError):
        smart_resize(10000, 10)


def test_bbox_roundtrip():
    original = (800, 600)  # (w, h)
    cells = [{"bbox": [80, 60, 160, 120], "category": "Text"}]
    pre = pre_process_bboxes(original, [c["bbox"] for c in cells], original)
    back = post_process_bboxes(original, [{"bbox": pre[0], "category": "Text"}], original)
    for a, b in zip(back[0]["bbox"], cells[0]["bbox"]):
        assert abs(a - b) <= 2  # int truncation tolerance


def test_validate_and_clamp():
    assert validate_and_clamp_bbox([0, 0, 2000, 50], 1000, 100) == [0, 0, 1000, 50]
    with pytest.raises(ValueError):
        validate_and_clamp_bbox([5, 5, 4, 10], 100, 100)
    with pytest.raises(ValueError):
        validate_and_clamp_bbox([1, 2, 3], 100, 100)


def test_iou_and_overlap_suppression():
    big = {"bbox": [0, 0, 100, 100], "category": "Text"}
    small_inside = {"bbox": [1, 1, 99, 99], "category": "Text"}
    far = {"bbox": [200, 200, 300, 300], "category": "Text"}
    assert iou(big["bbox"], far["bbox"]) == 0.0
    assert iou(big["bbox"], small_inside["bbox"]) > 0.9
    out = exclude_overlap_boxes([big, small_inside, far])
    assert out == [big, far]  # smaller of the overlapping pair dropped


# --- geometric reading order -------------------------------------------------


def test_reading_order_two_column_with_header():
    from dots_ocr_ray.kernel.geometry import reading_order

    boxes = [[50, 20, 950, 80]]  # full-width header
    for j in range(6):
        x1 = 60 + (j % 2) * 480
        y1 = 120 + (j // 2) * 110
        boxes.append([x1, y1, x1 + 400, y1 + 90])
    # header first, then LEFT column top-to-bottom, then right —
    # column-major even though the row grid is y-aligned
    assert reading_order(boxes, 1000, 1000) == [0, 1, 3, 5, 2, 4, 6]


def test_reading_order_misaligned_columns_and_single_column():
    from dots_ocr_ray.kernel.geometry import reading_order

    boxes = []
    for j in range(4):
        boxes.append([60, 100 + j * 120, 460, 190 + j * 120])
    for j in range(5):
        boxes.append([540, 80 + j * 100, 940, 150 + j * 100])
    assert reading_order(boxes, 1000, 1000) == list(range(9))
    # single column: pure top-to-bottom regardless of x or input order
    col = [[300, 500, 700, 600], [100, 100, 900, 200], [200, 300, 800, 400]]
    assert reading_order(col, 1000, 1000) == [1, 2, 0]


def test_reading_order_identity_fallback():
    from dots_ocr_ray.kernel.geometry import reading_order

    good = [[0, 0, 100, 50], [0, 60, 100, 110]]
    assert reading_order(good, 200, 200) == [0, 1]
    # inverted box, out-of-page box, bad dims, non-numeric → identity
    assert reading_order([[100, 50, 0, 0], good[1]], 200, 200) == [0, 1]
    assert reading_order([good[0], [0, 60, 100, 999]], 200, 200) == [0, 1]
    assert reading_order(good, 0, 200) == [0, 1]
    assert reading_order([good[0], ["x", 0, 1, 1]], 200, 200) == [0, 1]
    assert reading_order([], 100, 100) == []


def test_reading_order_narrow_gap_is_not_a_gutter():
    from dots_ocr_ray.kernel.geometry import reading_order

    # 8-unit x gap (< READING_ORDER_MIN_GUTTER): word spacing, not a
    # column break → top-to-bottom, left-to-right within lines
    boxes = [
        [0, 0, 496, 100],
        [504, 0, 1000, 100],
        [0, 120, 496, 220],
        [504, 120, 1000, 220],
    ]
    assert reading_order(boxes, 1000, 1000) == [0, 1, 2, 3]
