"""Geometry kernels (reference M1/M4/M5/M18 and bbox validation).

Pure scalar math mirroring the reference:

* ``smart_resize`` — factor-28 snapping within pixel bounds, aspect>200
  rejected (dots_ocr/utils/image_utils.py:32-66, consts.py:1-4).
* bbox pre/post scaling for grounding mode
  (dots_ocr/utils/layout_utils.py:122-204).
* bbox legality validation + clamping (layout_utils.py:226-239).
* IoU + overlap suppression: drop the smaller of any pair with IoU>0.9
  (dots_ocr/model/layout_service.py:59-85).
"""

from __future__ import annotations

import math

MIN_PIXELS = 3136
MAX_PIXELS = 11289600
IMAGE_FACTOR = 28


def round_by_factor(number: float, factor: int) -> int:
    return round(number / factor) * factor


def ceil_by_factor(number: float, factor: int) -> int:
    return math.ceil(number / factor) * factor


def floor_by_factor(number: float, factor: int) -> int:
    return math.floor(number / factor) * factor


def smart_resize(
    height: int,
    width: int,
    factor: int = IMAGE_FACTOR,
    min_pixels: int = MIN_PIXELS,
    max_pixels: int = MAX_PIXELS,
) -> tuple[int, int]:
    """Snap (h, w) to multiples of ``factor`` within the pixel budget,
    keeping aspect ratio; aspect ratios above 200 are rejected
    (image_utils.py:32-66)."""
    if max(height, width) / min(height, width) > 200:
        raise ValueError(
            f"absolute aspect ratio must be smaller than 200, "
            f"got {max(height, width) / min(height, width)}"
        )
    h_bar = max(factor, round_by_factor(height, factor))
    w_bar = max(factor, round_by_factor(width, factor))
    if h_bar * w_bar > max_pixels:
        beta = math.sqrt((height * width) / max_pixels)
        h_bar = max(factor, floor_by_factor(height / beta, factor))
        w_bar = max(factor, floor_by_factor(width / beta, factor))
    elif h_bar * w_bar < min_pixels:
        beta = math.sqrt(min_pixels / (height * width))
        h_bar = ceil_by_factor(height * beta, factor)
        w_bar = ceil_by_factor(width * beta, factor)
        if h_bar * w_bar > max_pixels:
            beta = math.sqrt((h_bar * w_bar) / max_pixels)
            h_bar = max(factor, floor_by_factor(h_bar / beta, factor))
            w_bar = max(factor, floor_by_factor(w_bar / beta, factor))
    return h_bar, w_bar


def pre_process_bboxes(
    original_size: tuple[int, int],
    bboxes: list[list[float]],
    input_size: tuple[int, int],
    factor: int = IMAGE_FACTOR,
    min_pixels: int = MIN_PIXELS,
    max_pixels: int = MAX_PIXELS,
) -> list[list[int]]:
    """Map user bboxes from original coords into the smart-resized input
    space (grounding mode; layout_utils.py:122-153)."""
    original_width, original_height = original_size
    input_width, input_height = input_size
    input_height, input_width = smart_resize(
        input_height, input_width, factor=factor, min_pixels=min_pixels, max_pixels=max_pixels
    )
    scale_x = original_width / input_width
    scale_y = original_height / input_height
    return [
        [
            int(float(b[0]) / scale_x),
            int(float(b[1]) / scale_y),
            int(float(b[2]) / scale_x),
            int(float(b[3]) / scale_y),
        ]
        for b in bboxes
    ]


def post_process_bboxes(
    original_size: tuple[int, int],
    cells: list[dict],
    input_size: tuple[int, int],
    min_pixels: int = MIN_PIXELS,
    max_pixels: int = MAX_PIXELS,
) -> list[dict]:
    """Map cell bboxes from the resized input space back to original
    coords (layout_utils.py:155-204)."""
    original_width, original_height = original_size
    input_width, input_height = input_size
    input_height, input_width = smart_resize(
        input_height, input_width, min_pixels=min_pixels, max_pixels=max_pixels
    )
    scale_x = input_width / original_width
    scale_y = input_height / original_height
    out = []
    for cell in cells:
        b = cell["bbox"]
        cell_copy = cell.copy()
        cell_copy["bbox"] = [
            int(float(b[0]) / scale_x),
            int(float(b[1]) / scale_y),
            int(float(b[2]) / scale_x),
            int(float(b[3]) / scale_y),
        ]
        out.append(cell_copy)
    return out


def validate_and_clamp_bbox(bbox, width: int, height: int) -> list[int]:
    """Bbox legality: list of 4 numbers, x0<x1, y0<y1; x1/y1 clamped to
    bounds (layout_utils.py:226-239).  Raises ValueError on illegal
    shape — callers route that row to the fallback ladder."""
    if not (isinstance(bbox, (list, tuple)) and len(bbox) == 4):
        raise ValueError("Each 'bbox' must be a list of four numbers [x0, y0, x1, y1].")
    x0, y0, x1, y1 = bbox
    if not (x0 < x1 and y0 < y1):
        raise ValueError("Each 'bbox' must satisfy x0 < x1 and y0 < y1.")
    return [int(x0), int(y0), int(min(x1, width)), int(min(y1, height))]


def iou(box1, box2) -> float:
    """Intersection-over-union (layout_service.py:64-73)."""
    x1 = max(box1[0], box2[0])
    y1 = max(box1[1], box2[1])
    x2 = min(box1[2], box2[2])
    y2 = min(box1[3], box2[3])
    inter = max(0, x2 - x1) * max(0, y2 - y1)
    if inter == 0:
        return 0.0
    a1 = (box1[2] - box1[0]) * (box1[3] - box1[1])
    a2 = (box2[2] - box2[0]) * (box2[3] - box2[1])
    union = a1 + a2 - inter
    return inter / union if union > 0 else 0.0


def exclude_overlap_boxes(cells: list[dict], iou_threshold: float = 0.9) -> list[dict]:
    """Drop the smaller of any box pair with IoU above the threshold,
    preserving order (layout_service.py:59-85)."""
    if len(cells) <= 1:
        return cells
    areas = [
        (c["bbox"][2] - c["bbox"][0]) * (c["bbox"][3] - c["bbox"][1]) for c in cells
    ]
    dropped: set[int] = set()
    for i in range(len(cells)):
        if i in dropped:
            continue
        for j in range(i + 1, len(cells)):
            if j in dropped:
                continue
            if iou(cells[i]["bbox"], cells[j]["bbox"]) > iou_threshold:
                dropped.add(i if areas[i] < areas[j] else j)
                if i in dropped:
                    break
    return [c for k, c in enumerate(cells) if k not in dropped]
