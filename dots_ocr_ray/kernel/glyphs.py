"""Template-matching OCR over a fixed monospace glyph set — the
text-recognition half of the scanned-page path.

The reference reads page text with a VLM (dots_ocr/model/inference.py:
50-267, invoked per page image by parser.py:49-96); this sandbox has
neither a
vision model nor font files, so this kernel implements the CLASSIC
pre-neural baseline instead: render text as fixed-pitch 5×7 glyph
bitmaps, and recognize by exact template match per character cell —
binarize, trim to the ink bounding box, slice cells at the known
pitch, look each cell's bitmap up in the glyph table.  The TABLE is
the swappable asset (a real font drops in without touching the
pipeline); glyph shapes here are procedurally generated (seeded,
verified pairwise-distinct at import) because what the driver oracle
certifies is the PIPELINE — real PNG decode, segmentation, pitch
arithmetic, cell extraction — not font aesthetics.
"""

from __future__ import annotations

import hashlib

import numpy as np

GLYPH_W, GLYPH_H = 5, 7
PITCH = GLYPH_W + 1  # one blank spacing column between cells
ALPHABET = "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"


def _make_glyph(ch: str) -> np.ndarray:
    """Deterministic (7, 5) bool bitmap for one character: 35 bits off
    a seeded blake2b stream, with the corner pixels forced ON so every
    glyph touches its cell borders (trim-stability: the first and last
    character of a line pin the ink bounding box exactly)."""
    digest = hashlib.blake2b(f"glyph:{ch}".encode(), digest_size=5).digest()
    bits = np.unpackbits(np.frombuffer(digest, dtype=np.uint8))[: GLYPH_H * GLYPH_W]
    g = bits.reshape(GLYPH_H, GLYPH_W).astype(bool)
    g[0, 0] = g[0, -1] = g[-1, 0] = g[-1, -1] = True
    return g


_GLYPHS: dict[str, np.ndarray] = {ch: _make_glyph(ch) for ch in ALPHABET}
# pairwise distinctness is what makes exact template match well-defined
assert len({g.tobytes() for g in _GLYPHS.values()}) == len(ALPHABET)
_LOOKUP: dict[bytes, str] = {g.tobytes(): ch for ch, g in _GLYPHS.items()}
_TEMPLATES = np.stack([_GLYPHS[ch] for ch in ALPHABET])  # (36, 7, 5) bool
_MIN_PAIR_DIST = min(
    int((_TEMPLATES[i] ^ _TEMPLATES[j]).sum())
    for i in range(len(ALPHABET))
    for j in range(i + 1, len(ALPHABET))
)


def render_text_line(text: str) -> np.ndarray:
    """Render ``text`` (ALPHABET chars + spaces) → (7, 6·n−1) bool ink
    mask at fixed pitch; unknown characters render as spaces."""
    n = len(text)
    if n == 0:
        return np.zeros((GLYPH_H, 0), dtype=bool)
    out = np.zeros((GLYPH_H, PITCH * n - 1), dtype=bool)
    for i, ch in enumerate(text):
        g = _GLYPHS.get(ch.upper())
        if g is not None:
            out[:, i * PITCH : i * PITCH + GLYPH_W] = g
    return out


def read_text_line(ink: np.ndarray, *, max_err: int = 0) -> str:
    """Recognize a rendered line from its ink mask: trim to the ink
    bounding box, infer the character count from the pitch arithmetic
    ``n = (w + 1) // 6``, slice cells, exact-match each bitmap
    (unmatched cells — noise, a half glyph, an unknown font — decode
    as ``?``).  Leading/trailing spaces are unrecoverable by design
    (they leave no ink); interior spaces come back as spaces.

    ``max_err > 0`` enables NOISE-TOLERANT matching: a cell with no
    exact match takes the nearest template by Hamming distance when
    that distance is ≤ max_err AND the nearest is unique — the classic
    minimum-distance classifier over bitmap templates.  Keep max_err
    below half the glyph set's minimum pairwise distance
    (``_MIN_PAIR_DIST``) for guaranteed-correct decisions."""
    ink = np.asarray(ink, dtype=bool)
    if ink.ndim != 2 or not ink.any():
        return ""
    rows = np.nonzero(ink.any(axis=1))[0]
    cols = np.nonzero(ink.any(axis=0))[0]
    box = ink[rows[0] : rows[-1] + 1, cols[0] : cols[-1] + 1]
    if box.shape[0] != GLYPH_H:
        return "?" * max(1, (box.shape[1] + 1) // PITCH)
    n = (box.shape[1] + 1) // PITCH
    out = []
    for i in range(n):
        cell = box[:, i * PITCH : i * PITCH + GLYPH_W]
        if cell.shape[1] < GLYPH_W:
            cell = np.pad(cell, ((0, 0), (0, GLYPH_W - cell.shape[1])))
        if not cell.any():
            out.append(" ")
            continue
        ch = _LOOKUP.get(np.ascontiguousarray(cell).tobytes())
        if ch is None and max_err > 0:
            dists = (_TEMPLATES ^ cell[None]).sum(axis=(1, 2))
            best = int(dists.min())
            if best <= max_err and int((dists == best).sum()) == 1:
                ch = ALPHABET[int(dists.argmin())]
        out.append(ch if ch is not None else "?")
    return "".join(out)


def ocr_page_lines(
    gray: np.ndarray, *, ink_threshold: int = 128, min_gap: int = 8, max_err: int = 0
) -> list[str]:
    """Full-page OCR: segment the page into line blocks with the
    projection XY-cut (`layout_detect.detect_blocks`) using a gap
    threshold ABOVE the inter-word space width (7 blank columns at
    this pitch) so words stay in their line, then template-read each
    block band by band (multi-line blocks read 8-row bands).  Pages
    must leave ≥ ``min_gap`` blank rows between lines — the renderer's
    contract."""
    from dots_ocr_ray.kernel.layout_detect import detect_blocks

    gray = np.asarray(gray)
    ink = gray < ink_threshold
    lines = []
    for x1, y1, x2, y2 in detect_blocks(gray, min_gap=min_gap):
        block = ink[y1:y2, x1:x2]
        for r0 in range(0, block.shape[0], GLYPH_H + 1):
            band = block[r0 : r0 + GLYPH_H]
            text = read_text_line(band, max_err=max_err)
            if text:
                lines.append(text)
    return lines
