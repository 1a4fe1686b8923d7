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


# ---------------------------------------------------------------------------
# Geometric reading order (layout mode)


READING_ORDER_MIN_GUTTER = 12
"""Minimum normalized-x gap (of 1000) treated as a column gutter —
narrower gaps are word/cell spacing, not layout columns."""


def reading_order(boxes, width: int, height: int) -> list[int]:
    """Column-aware geometric reading order for pixel-bbox spans — the
    deterministic counterpart of the reference's LayoutReader decode
    (reader_helper.py:89-121): given ``[x1, y1, x2, y2]`` boxes on a
    ``width×height`` page, return the index permutation that reads
    top-to-bottom, left-to-right with column detection.

    Mirrors the reference's contract precisely where it is mechanical:
    boxes are first normalized to the 0-1000 grid exactly as
    layout_service.py:211-222 does (``int(v * 1000 / dim)``), and ANY
    invalid input (empty page dims, non-numeric, inverted or
    out-of-range boxes) falls back to IDENTITY order, mirroring
    layout_service.py:232-235's except-branch.  In place of the
    LayoutLMv3 model it runs the classic recursive XY-cut (Nagy &
    Seth 1984, public domain): split on clear horizontal gaps into
    bands (top-to-bottom), split bands on vertical gutters ≥
    ``READING_ORDER_MIN_GUTTER`` into columns (left-to-right),
    recurse; an unsplittable region orders by (y1, x1, index).
    """
    n = len(boxes)
    if n <= 1:
        return list(range(n))
    try:
        if width <= 0 or height <= 0:
            raise ValueError("bad page dims")
        norm = []
        for b in boxes:
            x1, y1, x2, y2 = (float(v) for v in b)
            if not (x1 < x2 and y1 < y2):
                raise ValueError("inverted bbox")
            if x1 < 0 or y1 < 0 or x2 > width or y2 > height:
                raise ValueError("bbox out of page")
            norm.append(
                (
                    int(x1 * 1000 / width),
                    int(y1 * 1000 / height),
                    int(x2 * 1000 / width),
                    int(y2 * 1000 / height),
                )
            )
    except (ValueError, TypeError):
        return list(range(n))
    return _xy_cut(list(range(n)), norm)


def _largest_gap(idx: list[int], lo: list[int], hi: list[int], min_gap: int) -> tuple[int, int]:
    """Largest uncovered gap ≥ min_gap in the projection of ``idx``
    onto one axis → (gap_size, split_coordinate); (0, 0) if none."""
    order = sorted(idx, key=lambda i: (lo[i], hi[i], i))
    best, split_at = 0, 0
    reach = hi[order[0]]
    for i in order[1:]:
        gap = lo[i] - reach
        if gap >= min_gap and gap > best:
            best, split_at = gap, lo[i]
        reach = max(reach, hi[i])
    return best, split_at


def _xy_cut(idx: list[int], norm: list[tuple[int, int, int, int]]) -> list[int]:
    """Recursive largest-gap XY-cut: binary-split the region at the
    single widest qualifying gap — horizontal gaps (band breaks) need
    ≥1 unit, vertical gaps (column gutters) ≥ READING_ORDER_MIN_GUTTER
    — preferring the horizontal cut on ties (top-down bias), so a
    full-width header splits off before the column gutter is
    considered, while an aligned row grid inside a column region
    still reads column-major."""
    if len(idx) <= 1:
        return idx
    x1 = [b[0] for b in norm]
    y1 = [b[1] for b in norm]
    x2 = [b[2] for b in norm]
    y2 = [b[3] for b in norm]
    y_gap, y_at = _largest_gap(idx, y1, y2, min_gap=1)
    x_gap, x_at = _largest_gap(idx, x1, x2, min_gap=READING_ORDER_MIN_GUTTER)
    if y_gap == 0 and x_gap == 0:
        return sorted(idx, key=lambda i: (y1[i], x1[i], i))
    if y_gap >= x_gap:
        first = [i for i in idx if y1[i] < y_at]
        second = [i for i in idx if y1[i] >= y_at]
    else:
        first = [i for i in idx if x1[i] < x_at]
        second = [i for i in idx if x1[i] >= x_at]
    return _xy_cut(first, norm) + _xy_cut(second, norm)
