"""DOM-lite HTML block segmentation (the reference's layout-detection
analog, SURVEY.md §2.3 A3).

The reference segments a page image into category-labeled blocks with a
layout model (dots_ocr/model/layout_service.py:12-181) and aligns the
model's labels onto the fixed 11-category schema
(layout_service.py:44-57).  Here the "page" is an HTML document: a
single-pass regex tag scanner segments it into blocks, maps
tags/classes onto the same 11 categories, and applies
trafilatura-style boilerplate pruning (tag/class blocklists,
link-density).  The scanner is hand-rolled (not stdlib
``html.parser``) because this loop dominates extraction CPU at corpus
scale — measured ~3× faster with identical block output on the fixture
corpus.

Determinism: pure function of the input string; tolerant of
unclosed/truncated/malformed markup (a lone ``<`` is text, an unclosed
tag at EOF is dropped), mirroring the reference's repair-don't-crash
stance (output_cleaner.py).
"""

from __future__ import annotations

import html as html_mod
import re
from bisect import bisect_right

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
# script/style/template content is raw text (no nested markup parsing)
_RAWTEXT_TAGS = frozenset(["script", "style", "template"])
# precompiled case-insensitive close-tag finders: locating </script> must
# not lowercase the whole document per tag (O(n*tags) on script-heavy
# pages); a regex search from pos keeps offsets exact even for unicode
# whose str.lower() changes length
_RAWTEXT_CLOSE_RE = {t: re.compile(f"</{t}", re.IGNORECASE) for t in _RAWTEXT_TAGS}

# Class/id substrings marking boilerplate containers
# (trafilatura-style blocklist; FIXTURES.md §2).
BLOCKLIST_RE = re.compile(
    r"(?:^|[\s_-])(nav|menu|ads?|advert\w*|cookie|share|social|related|sidebar|banner|promo|breadcrumb|pagination|comment)s?(?:$|[\s_-])",
    re.IGNORECASE,
)

LINK_DENSITY_THRESHOLD = 0.5

_LEAF_TAGS = frozenset(TAG_CATEGORY)
_VOID_TAGS = frozenset(
    ["img", "br", "hr", "meta", "link", "input", "area", "base", "col", "embed", "source", "track", "wbr"]
)

_TAG_RE = re.compile(r"<(/?)([a-zA-Z][a-zA-Z0-9]*)((?:[^>'\"]|\"[^\"]*\"|'[^']*')*)>")
_COMMENT_RE = re.compile(r"<!--.*?-->", re.DOTALL)
_DECL_RE = re.compile(r"<![^>]*>|<\?[^>]*>")
_ATTR_RE = re.compile(r"(class|id|alt)\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>]+))", re.IGNORECASE)
_HAS_ENTITY = re.compile(r"&[#a-zA-Z]")


class Block:
    __slots__ = ("category", "texts", "link_chars", "start_offset", "classes", "raw_parts", "alt")

    def __init__(self, category: str, start_offset: int, classes: str):
        self.category = category
        self.texts: list[str] = []
        self.link_chars = 0
        self.start_offset = start_offset
        self.classes = classes
        self.raw_parts: list[str] | None = None  # set for Table blocks
        self.alt = ""


def _attrs_of(attr_str: str) -> dict:
    if not attr_str:
        return {}
    out = {}
    low = attr_str.lower()
    if "class" not in low and "id" not in low and "alt" not in low:
        return out
    for m in _ATTR_RE.finditer(attr_str):
        val = m.group(2) or m.group(3) or m.group(4) or ""
        out.setdefault(m.group(1).lower(), val)
    return out


def _decode_text(raw: str) -> str:
    return html_mod.unescape(raw) if _HAS_ENTITY.search(raw) else raw


import functools


@functools.lru_cache(maxsize=64)
def _extra_blocklist_re(classes: tuple[str, ...]):
    """Compile-once seam for per-run blocklist extensions (the warm
    per-worker state the reference holds in lazy singletons, A3/A4);
    cached per process so the kernel stays pure and cheap per row."""
    if not classes:
        return None
    joined = "|".join(re.escape(c) for c in classes)
    return re.compile(rf"(?:^|[\s_-])(?:{joined})(?:$|[\s_-])", re.IGNORECASE)


def _scan(html_text: str, extra_re=None) -> list[Block]:
    """Single pass over the markup, emitting blocks in DOM order (= the
    natural reading order for HTML, the A4 analog)."""
    blocks: list[Block] = []
    current: Block | None = None
    drop_depth = 0
    link_depth = 0
    table_depth = 0
    n = len(html_text)
    pos = 0
    find = html_text.find

    def flush():
        nonlocal current
        if current is not None:
            blocks.append(current)
            current = None

    def open_block(category: str, offset: int, classes: str):
        nonlocal current
        flush()
        current = Block(category, offset, classes)

    def on_text(data: str):
        nonlocal current
        if drop_depth or current is None:
            return
        if table_depth:
            current.texts.append(data)
            if current.raw_parts is not None:
                stripped = data.strip()
                if stripped:
                    current.raw_parts.append(stripped)
            return
        current.texts.append(data)
        if link_depth:
            current.link_chars += len(data)

    while pos < n:
        lt = find("<", pos)
        if lt == -1:
            on_text(html_text[pos:])
            break
        if lt > pos:
            on_text(html_text[pos:lt])
        m = _TAG_RE.match(html_text, lt)
        if m is None:
            cm = _COMMENT_RE.match(html_text, lt) or _DECL_RE.match(html_text, lt)
            if cm is not None:
                pos = cm.end()
                continue
            on_text("<")
            pos = lt + 1
            continue
        closing, tag, attr_str = m.group(1, 2, 3)
        tag = tag.lower()
        pos = m.end()
        self_closing = attr_str.endswith("/") or attr_str.rstrip().endswith("/")

        if not closing:
            # rawtext elements: skip straight to the closing tag
            if tag in _RAWTEXT_TAGS:
                cm2 = _RAWTEXT_CLOSE_RE[tag].search(html_text, pos)
                pos = n if cm2 is None else (html_text.find(">", cm2.start()) + 1 or n)
                continue
            if drop_depth:
                if tag not in _VOID_TAGS and not self_closing:
                    drop_depth += 1
                continue
            attrs = _attrs_of(attr_str)
            classes = " ".join(v for k, v in (("class", attrs.get("class")), ("id", attrs.get("id"))) if v)
            if tag in DROP_TAGS or (
                classes
                and (BLOCKLIST_RE.search(classes) or (extra_re and extra_re.search(classes)))
            ):
                if tag not in _VOID_TAGS and not self_closing:
                    drop_depth = 1
                continue
            if table_depth:
                if tag == "table":
                    table_depth += 1
                if current is not None and current.raw_parts is not None:
                    current.raw_parts.append(f"<{tag}>")
                continue
            if tag == "table":
                open_block("Table", lt, classes)
                current.raw_parts = ["<table>"]
                table_depth = 1
                continue
            if tag == "img":
                flush()
                b = Block("Picture", lt, classes)
                b.alt = attrs.get("alt", "")
                blocks.append(b)
                continue
            if tag == "a":
                link_depth += 1
                continue
            if tag in _LEAF_TAGS:
                category = TAG_CATEGORY[tag]
                if "footnote" in classes.lower():
                    category = "Footnote"
                open_block(category, lt, classes)
                continue
            if tag == "small":
                open_block("Footnote", lt, classes)
                continue
            # generic containers (div/section/article/ul/ol/...): transparent
        else:
            if drop_depth:
                if tag not in _VOID_TAGS:
                    drop_depth -= 1
                continue
            if table_depth:
                if current is not None and current.raw_parts is not None:
                    current.raw_parts.append(f"</{tag}>")
                if tag == "table":
                    table_depth -= 1
                    if table_depth == 0:
                        flush()
                continue
            if tag == "a":
                link_depth = max(0, link_depth - 1)
                continue
            if tag in _LEAF_TAGS or tag == "small":
                flush()
    flush()
    return blocks


def segment_html(html_text: str, extra_blocklist: tuple[str, ...] = ()) -> list[dict]:
    """Segment an HTML document into category-labeled candidate blocks.

    Returns span dicts ``{category, bbox, text, link_density, classes}``
    in DOM order.  bbox is a deterministic source-position box
    ``[col, line, col+len(text), line+1]``.  ``extra_blocklist`` extends
    the boilerplate class blocklist per run (compiled once per process).
    No pruning here — see :func:`prune_boilerplate`.
    """
    try:
        blocks = _scan(html_text, _extra_blocklist_re(extra_blocklist))
    except Exception:
        # guarantee no-raise regardless (repair-don't-crash stance)
        blocks = []
    # newline index for offset → (line, col), 1-based lines
    nl_positions = []
    _idx = html_text.find("\n")
    while _idx != -1:
        nl_positions.append(_idx)
        _idx = html_text.find("\n", _idx + 1)
    spans: list[dict] = []
    for b in blocks:
        if b.category == "Table":
            text = " ".join(b.raw_parts or [])
        elif b.category == "Picture":
            text = ""
        else:
            text = fold_newlines(_decode_text("".join(b.texts)))
        total = sum(len(t) for t in b.texts)
        link_density = (b.link_chars / total) if total else 0.0
        line = bisect_right(nl_positions, b.start_offset - 1) + 1
        col = b.start_offset - (nl_positions[line - 2] + 1 if line > 1 else 0)
        width = max(1, len(text))
        spans.append(
            {
                "category": b.category,
                "bbox": [col, line, col + width, line + 1],
                "text": text,
                "link_density": link_density,
                "classes": b.classes,
                "alt": _decode_text(b.alt) if b.alt else "",
            }
        )
    return spans


def prune_boilerplate(spans: list[dict], extra_blocklist: tuple[str, ...] = ()) -> list[dict]:
    """Trafilatura-style pruning over segmented blocks: blocklisted
    class/id, high link-density Text/List-item blocks, and empty
    non-Picture blocks are removed.  Order preserved."""
    extra_re = _extra_blocklist_re(extra_blocklist)
    out = []
    for s in spans:
        if s.get("classes") and (
            BLOCKLIST_RE.search(s["classes"]) or (extra_re and extra_re.search(s["classes"]))
        ):
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


# ---------------------------------------------------------------------------
# link extraction (crawl-graph construction)

_ANCHOR_RE = re.compile(
    r"<a\b[^>]*?\bhref\s*=\s*(?:\"([^\"]*)\"|'([^']*)'|([^\s>]+))[^>]*>(.*?)</a>",
    re.IGNORECASE | re.DOTALL,
)


def extract_links(url: str, html_text: str) -> list[dict]:
    """Every <a href> in the page → ``[{"href": <absolute>, "anchor":
    <tag-stripped text>}]`` in document order.  Relative hrefs resolve
    against ``url`` (stdlib urljoin); anchors are entity-unescaped and
    whitespace-collapsed.  Boilerplate links are deliberately KEPT —
    link-graph construction wants the nav edges main-content
    extraction prunes."""
    from urllib.parse import urljoin

    out: list[dict] = []
    for m in _ANCHOR_RE.finditer(html_text or ""):
        href = m.group(1) or m.group(2) or m.group(3) or ""
        href = html_mod.unescape(href.strip())
        if not href:
            continue
        try:
            absolute = urljoin(url, href)
        except ValueError:
            continue
        anchor = html_mod.unescape(re.sub(r"<[^>]*>", " ", m.group(4)))
        anchor = re.sub(r"\s+", " ", anchor).strip()
        out.append({"href": absolute, "anchor": anchor})
    return out


# ---------------------------------------------------------------------------
# DOM structure fingerprinting (template detection)

_STRUCT_TAG_RE = re.compile(r"<\s*([a-zA-Z][a-zA-Z0-9-]*)")


def structure_fingerprint(html_text: str) -> str:
    """16-hex fingerprint of a page's TAG SEQUENCE (element names in
    document order, text ignored) — two pages rendered from the same
    server-side template share it even when their content differs.
    Per-host clusters of equal fingerprints are exactly the boilerplate
    templates a main-content extractor must strip; the rollup over this
    is the data-driven counterpart of the static tag-class blocklists
    in segment_html (trafilatura-style template detection).  Pure
    function shared by the Ray pipeline and the sequential golden
    oracle.  Empty / tagless input → ``"none"``."""
    from dots_ocr_ray.kernel.textops import md5_hex

    tags = _STRUCT_TAG_RE.findall(html_text or "")
    if not tags:
        return "none"
    return md5_hex(" ".join(t.lower() for t in tags))[:16]


_TABLE_TOKEN_TAG_RE = re.compile(r"^</?[a-z][a-z0-9]*>$")


def extract_table_cells(html_text: str) -> list[dict]:
    """Parse every <table> on a page into RELATIONAL cell records
    ``{table_idx, row_idx, col_idx, cell}`` — the structured-data
    complement of the Table category's HTML passthrough (the reference
    serializes Table blocks as raw HTML into markdown,
    dots_ocr/utils/format_transformer.py; this op turns them into rows
    a downstream query can aggregate).

    Runs over the same single-pass scanner as :func:`segment_html`
    (the Table block's normalized tag/text token stream), so
    boilerplate-dropped and rawtext regions can never leak cells.
    Only depth-1 structure counts rows/cells — a nested inner table's
    text folds into the enclosing cell (documented flattening).  A
    cell before any <tr> lands in row 0; inline markup inside a cell
    (<b>, <span>, inner tables) is transparent.  Never raises."""
    try:
        blocks = _scan(html_text or "")
    except Exception:
        return []
    out: list[dict] = []
    t_idx = -1
    for b in blocks:
        if b.category != "Table" or b.raw_parts is None:
            continue
        t_idx += 1
        depth = 0
        row = -1  # no row open yet; first <tr> (or stray cell) opens row 0
        col = -1
        in_cell = False
        parts: list[str] = []
        for tok in b.raw_parts:
            if _TABLE_TOKEN_TAG_RE.match(tok):
                if tok == "<table>":
                    depth += 1
                elif tok == "</table>":
                    depth = max(0, depth - 1)
                elif depth == 1 and tok == "<tr>":
                    if not in_cell:  # malformed <tr> inside an open cell: fold
                        # EVERY <tr> advances the row — an empty/spacer
                        # row still occupies an index
                        row = row + 1 if row >= 0 else 0
                        col = -1
                elif depth == 1 and tok in ("<td>", "<th>"):
                    if not in_cell:
                        in_cell = True
                        if row < 0:
                            row = 0
                        col += 1
                        parts = []
                elif depth == 1 and tok in ("</td>", "</th>"):
                    if in_cell:
                        out.append(
                            {
                                "table_idx": t_idx,
                                "row_idx": row,
                                "col_idx": col,
                                "cell": _decode_text(" ".join(parts)),
                            }
                        )
                    in_cell = False
                # other tags (inline markup) are transparent
            elif in_cell:
                parts.append(tok)
    return out


# ---------------------------------------------------------------------------
# Encoding sniffing (the S4 fetch/normalize seam's charset half)

_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([A-Za-z0-9_\-]+)""", re.IGNORECASE
)

_CHARSET_ALIASES = {
    "utf8": "utf-8",
    "latin-1": "iso-8859-1",
    "latin1": "iso-8859-1",
    "cp1251": "windows-1251",
    "gbk": "gb2312",
}


def sniff_charset(raw: bytes, *, scan_limit: int = 1024) -> str:
    """Simplified HTML5 encoding sniffing (the published WHATWG
    algorithm's deterministic core; the reference's universal input
    seam decodes bytes before parsing, doc_utils.py / S4):

    1. byte-order marks win outright (UTF-8 / UTF-16 LE / BE);
    2. else the first ``<meta … charset=…>`` declaration inside the
       first ``scan_limit`` bytes (covers both the HTML5 short form
       and the http-equiv content form, since the charset= token is
       scanned positionally);
    3. else the spec's modern default, ``utf-8``.

    Labels normalize case + common aliases; never raises."""
    raw = bytes(raw or b"")
    if raw[:3] == b"\xef\xbb\xbf":
        return "utf-8"
    if raw[:2] == b"\xff\xfe":
        return "utf-16-le"
    if raw[:2] == b"\xfe\xff":
        return "utf-16-be"
    m = _META_CHARSET_RE.search(raw[:scan_limit])
    if m:
        label = m.group(1).decode("ascii", "replace").strip().lower()
        return _CHARSET_ALIASES.get(label, label)
    return "utf-8"
