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
