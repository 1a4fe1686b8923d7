"""DOM-lite HTML block segmentation (the reference's layout-detection
analog, SURVEY.md §2.3 A3).

The reference segments a page image into category-labeled blocks with a
layout model (dots_ocr/model/layout_service.py:12-181) and aligns the
model's labels onto the fixed 11-category schema
(layout_service.py:44-57).  Here the "page" is an HTML document: a
stdlib ``html.parser`` pass segments it into blocks, maps tags/classes
onto the same 11 categories, and applies trafilatura-style boilerplate
pruning (tag/class blocklists, link-density) — warm compiled state is
module-level so actor construction is cheap.

Determinism: pure function of the bytes; tolerant of unclosed/truncated
markup (``HTMLParser`` is non-validating and never raises on malformed
nesting), mirroring the reference's repair-don't-crash stance
(output_cleaner.py).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from dots_ocr_ray.kernel.textops import fold_newlines

# Tag → category alignment (the M17 analog of layout_service.py:44-57).
TAG_CATEGORY = {
    "h1": "Title",
    "h2": "Section-header",
    "h3": "Section-header",
    "h4": "Section-header",
    "h5": "Section-header",
    "h6": "Section-header",
    "p": "Text",
    "blockquote": "Text",
    "pre": "Formula",  # code/display blocks serialize as formula-ish blocks
    "li": "List-item",
    "figcaption": "Caption",
    "header": "Page-header",
    "footer": "Page-footer",
    "math": "Formula",
}

# Subtrees that never contain main content — dropped outright.
DROP_TAGS = frozenset(
    ["script", "style", "nav", "aside", "noscript", "template", "iframe", "form", "button", "select", "svg"]
)

# Class/id substrings marking boilerplate containers
# (trafilatura-style blocklist; FIXTURES.md §2).
BLOCKLIST_RE = re.compile(
    r"(?:^|[\s_-])(nav|menu|ads?|advert\w*|cookie|share|social|related|sidebar|banner|promo|breadcrumb|pagination|comment)s?(?:$|[\s_-])",
    re.IGNORECASE,
)

LINK_DENSITY_THRESHOLD = 0.5

_LEAF_TAGS = frozenset(TAG_CATEGORY)
_VOID_TAGS = frozenset(["img", "br", "hr", "meta", "link", "input", "area", "base", "col", "embed", "source", "track", "wbr"])


class Block:
    __slots__ = ("category", "texts", "link_chars", "line", "col", "classes", "raw_parts", "alt")

    def __init__(self, category: str, line: int, col: int, classes: str):
        self.category = category
        self.texts: list[str] = []
        self.link_chars = 0
        self.line = line
        self.col = col
        self.classes = classes
        self.raw_parts: list[str] | None = None  # set for Table blocks
        self.alt = ""


class _BlockParser(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.blocks: list[Block] = []
        self._current: Block | None = None
        self._drop_depth = 0
        self._link_depth = 0
        self._table_depth = 0

    # -- helpers ----------------------------------------------------------
    def _class_of(self, attrs) -> str:
        parts = []
        for k, v in attrs:
            if k in ("class", "id") and v:
                parts.append(v)
        return " ".join(parts)

    def _open_block(self, category: str, classes: str):
        self._flush()
        line, col = self.getpos()
        self._current = Block(category, line, col, classes)

    def _flush(self):
        b = self._current
        if b is not None:
            self.blocks.append(b)
            self._current = None

    # -- parser events ----------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if self._drop_depth:
            if tag not in _VOID_TAGS:
                self._drop_depth += 1
            return
        classes = self._class_of(attrs)
        if tag in DROP_TAGS or (classes and BLOCKLIST_RE.search(classes)):
            if tag in _VOID_TAGS:
                return
            self._drop_depth = 1
            return
        if self._table_depth:
            if tag == "table":
                self._table_depth += 1
            if self._current is not None and self._current.raw_parts is not None:
                self._current.raw_parts.append(f"<{tag}>")
            return
        if tag == "table":
            self._open_block("Table", classes)
            self._current.raw_parts = ["<table>"]
            self._table_depth = 1
            return
        if tag == "img":
            self._flush()
            line, col = self.getpos()
            b = Block("Picture", line, col, classes)
            for k, v in attrs:
                if k == "alt" and v:
                    b.alt = v
            self.blocks.append(b)
            return
        if tag == "a":
            self._link_depth += 1
            return
        if tag in _LEAF_TAGS:
            category = TAG_CATEGORY[tag]
            if tag == "small" or "footnote" in classes.lower():
                category = "Footnote"
            self._open_block(category, classes)
            return
        if tag == "small":
            self._open_block("Footnote", classes)
            return
        # generic containers (div/section/article/ul/ol/...): transparent

    def handle_startendtag(self, tag, attrs):
        if tag == "img":
            self.handle_starttag(tag, attrs)

    def handle_endtag(self, tag):
        if self._drop_depth:
            if tag not in _VOID_TAGS:
                self._drop_depth -= 1
            return
        if self._table_depth:
            if self._current is not None and self._current.raw_parts is not None:
                self._current.raw_parts.append(f"</{tag}>")
            if tag == "table":
                self._table_depth -= 1
                if self._table_depth == 0:
                    self._flush()
            return
        if tag == "a":
            self._link_depth = max(0, self._link_depth - 1)
            return
        if tag in _LEAF_TAGS or tag == "small":
            self._flush()

    def handle_data(self, data):
        if self._drop_depth:
            return
        if self._table_depth:
            if self._current is not None:
                self._current.texts.append(data)
                if self._current.raw_parts is not None and data.strip():
                    self._current.raw_parts.append(data.strip())
            return
        if self._current is not None:
            self._current.texts.append(data)
            if self._link_depth:
                self._current.link_chars += len(data)

    def close(self):
        super().close()
        self._flush()


def segment_html(html_text: str) -> list[dict]:
    """Segment an HTML document into category-labeled candidate blocks.

    Returns span dicts ``{category, bbox, text, link_density, classes}``
    in DOM order (= reading order, the A4 analog: document order is the
    natural reading order for HTML).  No pruning here — see
    :func:`prune_boilerplate`.
    """
    parser = _BlockParser()
    try:
        parser.feed(html_text)
        parser.close()
    except Exception:
        # html.parser is robust, but guarantee no-raise regardless
        # (the reference's repair-don't-crash stance).
        parser._flush()
    spans: list[dict] = []
    for b in parser.blocks:
        if b.category == "Table":
            text = " ".join(p for p in (b.raw_parts or []))
        elif b.category == "Picture":
            text = ""
        else:
            text = fold_newlines("".join(b.texts))
        total = sum(len(t) for t in b.texts)
        link_density = (b.link_chars / total) if total else 0.0
        x1 = b.col
        y1 = b.line
        width = max(1, len(text))
        spans.append(
            {
                "category": b.category,
                "bbox": [x1, y1, x1 + width, y1 + 1],
                "text": text,
                "link_density": link_density,
                "classes": b.classes,
                "alt": b.alt,
            }
        )
    return spans


def prune_boilerplate(spans: list[dict]) -> list[dict]:
    """Trafilatura-style pruning over segmented blocks: blocklisted
    class/id, high link-density Text/List-item blocks, and empty
    non-Picture blocks are removed.  Order preserved."""
    out = []
    for s in spans:
        if s.get("classes") and BLOCKLIST_RE.search(s["classes"]):
            continue
        if s["category"] in ("Text", "List-item") and s.get("link_density", 0.0) > LINK_DENSITY_THRESHOLD:
            continue
        if s["category"] != "Picture" and not s["text"].strip():
            continue
        out.append(s)
    return out


_TAG_STRIP_RE = re.compile(r"<[^>]*>")
_SCRIPT_STYLE_RE = re.compile(r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL)
_ENTITY_RE = re.compile(r"&(amp|lt|gt|quot|#39|nbsp);")
_ENTITY_MAP = {"amp": "&", "lt": "<", "gt": ">", "quot": '"', "#39": "'", "nbsp": " "}


def strip_tags(html_text: str) -> str:
    """Whole-page tag strip — the fallback extractor (the analog of the
    reference's prompt_ocr whole-page-text fallback,
    dots_ocr/model/inference.py:235-253)."""
    no_scripts = _SCRIPT_STYLE_RE.sub(" ", html_text)
    text = _TAG_STRIP_RE.sub(" ", no_scripts)
    text = _ENTITY_RE.sub(lambda m: _ENTITY_MAP[m.group(1)], text)
    return re.sub(r"\s+", " ", text).strip()
