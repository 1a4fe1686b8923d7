"""Pixel-level page-layout block detection — the scanned-page half of
the layout parser.

The reference's layout model segments a page image into category
blocks with bboxes (the single-VLM layout parse in
dots_ocr/model/inference.py:50-267 driven by parser.py:49-96, the
11-category schema of utils/prompts.py:7; the north-star's
"PDF/scanned-page layout analysis").  With no vision model in this
sandbox, this kernel implements the CLASSIC published alternative:
recursive XY-cut on ink projection profiles (Nagy & Seth 1984 — the
same family as `geometry.reading_order`, but operating on PIXELS):

1. binarize (ink = gray < threshold);
2. trim the region to its ink bounding box;
3. split at the LARGEST all-white gap ≥ ``min_gap`` on either axis
   (horizontal band gaps and vertical column gutters compete; the
   horizontal cut wins ties — top-down bias), recurse both halves;
4. an unsplittable region is one BLOCK (its trimmed bbox).

Deterministic, integer-exact, dependency-free; solid content regions
are recovered with EXACT tight bounds, which is what puts the
detection under the driver's SQL-arithmetic oracle (`layout_blocks`).
Category assignment is a separate pure function so the heuristic is
swappable for a real model at the same seam.
"""

from __future__ import annotations

import numpy as np


def _largest_gap_1d(mask: np.ndarray, min_gap: int) -> tuple[int, int]:
    """Largest run of False (no ink) strictly inside ``mask`` →
    (run_length, split_index); (0, 0) if none ≥ min_gap.  The mask is
    already trimmed, so runs at the borders cannot occur."""
    if len(mask) == 0:
        return 0, 0
    # run-length encode the gap positions
    gaps = ~mask
    if not gaps.any():
        return 0, 0
    idx = np.nonzero(gaps)[0]
    breaks = np.nonzero(np.diff(idx) > 1)[0]
    starts = np.concatenate([[0], breaks + 1])
    ends = np.concatenate([breaks, [len(idx) - 1]])
    lengths = idx[ends] - idx[starts] + 1
    best = int(np.argmax(lengths))
    if lengths[best] < min_gap:
        return 0, 0
    return int(lengths[best]), int(idx[ends[best]]) + 1  # split AFTER the gap


def detect_blocks(
    gray: np.ndarray,
    *,
    ink_threshold: int = 128,
    min_gap: int = 4,
    max_blocks: int = 256,
) -> list[tuple[int, int, int, int]]:
    """Segment an (h, w) uint8 grayscale page into content blocks →
    ``[(x1, y1, x2, y2), ...]`` in recursion (reading) order.  Empty
    pages return ``[]``; pathological inputs are bounded by
    ``max_blocks`` (first-found wins).  Never raises on valid arrays."""
    gray = np.asarray(gray)
    if gray.ndim != 2 or gray.size == 0:
        return []
    ink = gray < ink_threshold
    out: list[tuple[int, int, int, int]] = []

    def rec(y0: int, y1: int, x0: int, x1: int) -> None:
        if len(out) >= max_blocks:
            return
        region = ink[y0:y1, x0:x1]
        rows = region.any(axis=1)
        if not rows.any():
            return
        cols = region.any(axis=0)
        ry = np.nonzero(rows)[0]
        rx = np.nonzero(cols)[0]
        ty0, ty1 = y0 + int(ry[0]), y0 + int(ry[-1]) + 1
        tx0, tx1 = x0 + int(rx[0]), x0 + int(rx[-1]) + 1
        rows_t = rows[ry[0] : ry[-1] + 1]
        cols_t = cols[rx[0] : rx[-1] + 1]
        y_gap, y_at = _largest_gap_1d(rows_t, min_gap)
        x_gap, x_at = _largest_gap_1d(cols_t, min_gap)
        if y_gap == 0 and x_gap == 0:
            out.append((tx0, ty0, tx1, ty1))
            return
        if y_gap >= x_gap:  # horizontal cut wins ties (top-down bias)
            rec(ty0, ty0 + y_at - y_gap, tx0, tx1)
            rec(ty0 + y_at, ty1, tx0, tx1)
        else:
            rec(ty0, ty1, tx0, tx0 + x_at - x_gap)
            rec(ty0, ty1, tx0 + x_at, tx1)

    rec(0, gray.shape[0], 0, gray.shape[1])
    return out


def classify_block(
    bbox: tuple[int, int, int, int], page_w: int, page_h: int
) -> str:
    """Geometry-only category heuristic (the model seam): a short,
    page-wide block is a Title; a block wider than tall with height
    under 1/16 page is a section Header; everything else is Text.
    Pure and integer-exact so the driver oracle can mirror it."""
    x1, y1, x2, y2 = bbox
    w = x2 - x1
    h = y2 - y1
    if h <= page_h // 8 and w >= (3 * page_w) // 5:
        return "Title"
    if h <= page_h // 16 and w > h:
        return "Header"
    return "Text"


def shear_rows(
    img: np.ndarray, k: int, *, denom: int = 16, fill: int = 255, invert: bool = False
) -> np.ndarray:
    """Integer row-shear: row r shifts right by ``(r * k) // denom``
    px (k < 0 shifts left) — the exact-arithmetic stand-in for a small
    page rotation (a real scan's skew of ≈ k/denom radians).
    ``invert=True`` applies the SAME per-row offsets with opposite
    sign, which inverts the forward shear exactly (floor division is
    not sign-symmetric, so ``shear_rows(x, -k)`` would not)."""
    img = np.asarray(img)
    h, w = img.shape
    out = np.full_like(img, fill)
    for r in range(h):
        off = (r * k) // denom
        if invert:
            off = -off
        if off >= 0:
            if off < w:
                out[r, off:] = img[r, : w - off]
        else:
            if -off < w:
                out[r, : w + off] = img[r, -off:]
    return out


def detect_shear(
    gray: np.ndarray, *, k_range: int = 4, ink_threshold: int = 128
) -> int:
    """Skew estimation by projection-profile variance maximization
    (the classic published deskew method — Baird 1987 family): try
    every integer shear in ``[-k_range, k_range]``, unshear, and score
    the COLUMN ink-count profile's variance — a horizontal (row-wise)
    shear leaves the row profile untouched, but only the correct
    unshear re-aligns the glyph columns and inter-character gaps
    across lines, which maximizes column-profile variance.
    Deterministic tie-break: smaller |k|, then smaller k (the
    candidate order below).  Returns the estimated shear ``k`` such
    that ``shear_rows(gray, k, invert=True)`` deskews the page; scores
    are exact integers (n·Σx² − (Σx)²), so ties are bit-stable."""
    gray = np.asarray(gray)
    ink = (gray < ink_threshold).astype(np.int64)
    best_k, best_score = 0, -1
    for k in sorted(range(-k_range, k_range + 1), key=lambda v: (abs(v), v)):
        un = shear_rows(ink, k, fill=0, invert=True)
        prof = un.sum(axis=0)
        n = len(prof)
        score = int(n * (prof * prof).sum() - int(prof.sum()) ** 2)
        if score > best_score:
            best_k, best_score = k, score
    return best_k


def detect_grid_lines(
    ink: np.ndarray, *, coverage: float = 0.9
) -> tuple[list[int], list[int]]:
    """Ruled-table line detection by projection coverage: a pixel row
    (column) whose ink spans ≥ ``coverage`` of the region's width
    (height) is a rule line; consecutive line pixels merge to one line
    (its first index).  Returns (row_lines, col_lines)."""
    ink = np.asarray(ink, dtype=bool)
    h, w = ink.shape

    def _lines(profile: np.ndarray, full: int) -> list[int]:
        hits = np.nonzero(profile >= coverage * full)[0]
        starts = []  # keep only the START of each merged run
        prev = None
        for i in hits:
            if prev is None or i > prev + 1:
                starts.append(int(i))
            prev = i
        return starts

    return _lines(ink.sum(axis=1), w), _lines(ink.sum(axis=0), h)


def read_table_cells(
    gray: np.ndarray, *, ink_threshold: int = 128, max_err: int = 0
) -> list[tuple[int, int, str]]:
    """Ruled-table structure recognition: detect the grid (projection
    coverage), slice the cell interiors between consecutive rule
    lines (1-px rules assumed; interiors exclude the lines), and
    template-OCR each cell → ``[(row, col, text), ...]`` row-major.
    A region without at least a 2×2 line grid returns ``[]``."""
    from dots_ocr_ray.kernel.glyphs import read_text_line

    gray = np.asarray(gray)
    ink = gray < ink_threshold
    row_lines, col_lines = detect_grid_lines(ink)
    if len(row_lines) < 2 or len(col_lines) < 2:
        return []
    out = []
    for r in range(len(row_lines) - 1):
        y0, y1 = row_lines[r] + 1, row_lines[r + 1]
        for c in range(len(col_lines) - 1):
            x0, x1 = col_lines[c] + 1, col_lines[c + 1]
            cell = ink[y0:y1, x0:x1]
            out.append((r, c, read_text_line(cell, max_err=max_err)))
    return out
