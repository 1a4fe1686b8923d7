"""Heading-level rebuild from a document outline (reference J1/O3/O4).

Re-implements ``SectionHeader`` / ``DirectoryStructure``
(dots_ocr/utils/directory_entry.py:15-215) with the same rules:

* level extraction: Title→0; ``#``-depth 1-6; ``**bold**``→7; bare→8;
  List-item→10+tt; other→20+tt (directory_entry.py:36-54).
* TOC matching: fuzzy-text gate (ratio<40 → ∞) then point-to-bbox
  euclidean distance; argmin over headers (directory_entry.py:100-122,
  188-199).
* unmatched headers re-leveled by rank with ``max_level = max(5, ·)``,
  List-item→8, cap 8 (directory_entry.py:203-215).
* text rewrite: level 1→``# `` + category "title"; 7→``**…**``; 8→bare
  List-item; else ``#``*level (directory_entry.py:62-90).

The fuzzy ratio is the InDel similarity (rapidfuzz ``fuzz.ratio``
definition: ``2*LCS/(len_a+len_b)*100``), implemented here directly so
the kernel stays dependency-free and deterministic.
"""

from __future__ import annotations

import re

_HASH_PREFIX = re.compile(r"^(#{1,6})\s+")
_BOLD = re.compile(r"\*\*(.*?)\*\*")
_BOLD_WRAP = re.compile(r"^\*\*(.*?)\*\*$")
_NUM_PREFIX = re.compile(r"^[\d\.\s]+")

HEADER_CATEGORIES = ("Title", "Section-header", "List-item")


def indel_ratio(a: str, b: str) -> float:
    """InDel similarity in [0,100]: 2*LCS(a,b)/(|a|+|b|)*100 — the
    definition of rapidfuzz ``fuzz.ratio``."""
    if not a and not b:
        return 100.0
    if not a or not b:
        return 0.0
    # O(len(a)*len(b)) LCS with a rolling row; header strings are short.
    prev = [0] * (len(b) + 1)
    for ca in a:
        cur = [0]
        for j, cb in enumerate(b):
            if ca == cb:
                cur.append(prev[j] + 1)
            else:
                cur.append(max(prev[j + 1], cur[-1]))
        prev = cur
    lcs = prev[-1]
    return 200.0 * lcs / (len(a) + len(b))


class SectionHeader:
    """One heading candidate (directory_entry.py:15-97)."""

    def __init__(self, text: str, category: str, bbox, level: int | None = None, span: dict | None = None):
        self.text = text
        self.category = category
        self.bbox = bbox
        self.span = span
        self.level = level if level is not None else self._extract_level_from_text()
        self.new_level: int | None = None
        self.clean_text = self._clean_text()

    def _extract_level_from_text(self) -> int:
        if self.category == "Title":
            return 0
        hash_match = _HASH_PREFIX.match(self.text)
        bold_match = _BOLD.search(self.text)
        tt = 8
        if hash_match:
            tt = len(hash_match.group(1))
        elif bold_match:
            tt = 7
        if self.category == "Section-header":
            return tt
        elif self.category == "List-item":
            return 10 + tt
        return 20 + tt

    def _clean_text(self) -> str:
        self.text = _HASH_PREFIX.sub("", self.text)
        self.text = _BOLD_WRAP.sub(r"\1", self.text.strip())
        return self.text

    def calc_dist(self, entry: dict) -> float:
        """Fuzzy gate then point-to-bbox distance
        (directory_entry.py:100-122)."""
        cleaned = _NUM_PREFIX.sub("", self.clean_text).strip(" .\t\n")
        if indel_ratio(cleaned, entry["text"]) < 40:
            return float("inf")
        x, y = entry["to"][0], entry["to"][1]
        x1, y1, x2, y2 = self.bbox
        if x1 <= x <= x2 and y1 <= y <= y2:
            return 0.0
        dx = max(x1 - x, 0, x - x2)
        dy = max(y1 - y, 0, y - y2)
        return (dx**2 + dy**2) ** 0.5

    def reset_text_and_update(self) -> None:
        """Rewrite text/category from new_level (directory_entry.py:62-90),
        propagating into the backing span dict when present."""
        if self.new_level is None:
            return
        formatted = []
        for line in self.clean_text.split("\n"):
            if not line:
                continue
            if self.new_level == 1:
                self.category = "title"
                formatted.append("# " + line)
            elif self.new_level == 7:
                self.category = "Section-header"
                formatted.append("**" + line + "**")
            elif self.new_level == 8:
                self.category = "List-item"
                formatted.append(line)
            else:
                self.category = "Section-header"
                formatted.append("#" * self.new_level + " " + line)
        self.text = "\n".join(formatted)
        if self.span is not None:
            self.span["text"] = self.text
            self.span["category"] = self.category


def rebuild_directory_by_toc(spans: list[dict], toc: list[dict]) -> None:
    """Adjust heading levels of Title/Section-header/List-item spans to a
    TOC/outline, rewriting span text/category in place
    (directory_entry.py:180-215 semantics, including the
    ``max_level = max(5, ·)`` floor and the cap at 8).

    ``toc`` entries are ``{"level": int, "text": str, "to": [x, y]}`` —
    for HTML the outline comes from the document's own ``<h*>`` tags, the
    analog of the PDF TOC (SURVEY.md §2.4 J1).
    """
    headers = [
        SectionHeader(s.get("text", ""), s["category"], s["bbox"], span=s)
        for s in spans
        if s.get("category") in HEADER_CATEGORIES
    ]
    if not headers:
        return
    max_level = 0
    for entry in toc:
        min_dist = float("inf")
        closest = None
        for h in headers:
            d = h.calc_dist(entry)
            if d < min_dist:
                min_dist = d
                closest = h
        if closest is not None and min_dist != float("inf"):
            closest.new_level = entry["level"]
            max_level = max(max_level, closest.new_level)
    max_level = max(5, max_level)
    level_set = sorted({h.level for h in headers if h.new_level is None})
    for h in headers:
        if h.new_level is None:
            if h.category == "List-item" or max_level == 0:
                h.new_level = 8
            else:
                h.new_level = min(8, max_level + level_set.index(h.level) + 1)
        h.reset_text_and_update()
