"""Deterministic synthetic Common-Crawl-style pages (FIXTURES.md).

Two generators:

* :func:`make_pages_table` — the rich seeded corpus for the
  byte-identity gate (all 11 categories, boilerplate, degradation
  cases, hot-domain skew, a mega-page).  Plays the role of the
  reference's golden test documents (test/data/PGhandbook.pdf) since the
  reference ships no hermetic corpus (SURVEY.md §5).
* :func:`pages_from_documents` — wraps the driver's ``documents``
  table into pages whose expected extraction is expressible in ANSI SQL,
  powering the DuckDB-checked ``queries()``/``oracle_sql()`` contract.

Everything is a pure function of (seed, index): no wall clock, no
global RNG.
"""

from __future__ import annotations

import datetime
import html as html_mod
import random

import pyarrow as pa

from dots_ocr_ray.schema import PAGES_SCHEMA

EPOCH = datetime.datetime(2025, 1, 1)
LANGS = ["en", "en", "en", "zh", "ru", "de", "hi"]  # weighted round-robin
_WORDS = (
    "stream layout parse block anchor render table column row span cell "
    "header footer body margin index corpus shard batch arrow vector "
    "kernel schema marker lineage replica quorum ledger socket packet"
).split()


def _domain(rng: random.Random, i: int) -> str:
    # Zipf-ish skew: one hot domain holds ~30% of rows (FIXTURES.md §1).
    if rng.random() < 0.30:
        return "hot.example.com"
    return f"site-{rng.randrange(39):02d}.example.org"


def _sentence(rng: random.Random, n: int) -> str:
    return " ".join(rng.choice(_WORDS) for _ in range(n)).capitalize() + "."


def _make_html(rng: random.Random, i: int, scale: int = 1) -> tuple[str, str]:
    """One synthetic page; returns (html, naive_text)."""
    parts = ["<html><head><title>t</title>", '<style>.x{color:red}</style>', "</head><body>"]
    # boilerplate: nav link farm + cookie banner + sidebar (all pruned)
    parts.append('<nav class="nav"><a href="/">Home</a><a href="/b">Blog</a><a href="/c">Contact</a></nav>')
    parts.append('<div class="cookie"><p>We use cookies to improve your experience.</p></div>')
    parts.append('<div class="sidebar related"><ul><li><a href="/r1">Related one</a></li></ul></div>')
    parts.append(f'<header class="page-header">Site header {i % 7}</header>')
    parts.append(f"<h1>Document {i:06d}</h1>")
    n_sections = (1 + rng.randrange(3)) * scale
    for s in range(n_sections):
        parts.append(f"<h2>Section {s + 1}</h2>")
        for _ in range(1 + rng.randrange(3)):
            parts.append(f"<p>{_sentence(rng, 8 + rng.randrange(12))}</p>")
        if rng.random() < 0.4:
            parts.append("<ul>" + "".join(f"<li>Item {k}: {_sentence(rng, 4)}</li>" for k in range(2 + rng.randrange(3))) + "</ul>")
    if rng.random() < 0.35:
        parts.append("<table><tr><th>k</th><th>v</th></tr><tr><td>alpha</td><td>1</td></tr><tr><td>beta</td><td>2</td></tr></table>")
    if rng.random() < 0.3:
        parts.append(f"<math>E = mc^2 + {rng.randrange(9)}</math>")
    if rng.random() < 0.3:
        parts.append(f'<img src="/img{i}.png" alt="Figure {i % 5}">')
        parts.append(f"<figcaption>Figure caption {i % 5}</figcaption>")
    if rng.random() < 0.25:
        parts.append(f'<small class="footnote">Footnote {i % 11}</small>')
    parts.append(f'<footer class="page-footer">Copyright {i % 3}</footer>')
    parts.append("</body></html>")
    html_text = "\n".join(parts)
    # naive crawler text (tag-stripped), the `text` column
    import re as _re

    naive = _re.sub(r"<[^>]*>", " ", html_text)
    naive = html_mod.unescape(_re.sub(r"\s+", " ", naive).strip())
    return html_text, naive


def _page_record(i: int, seed: int = 42, scale: int = 1) -> tuple:
    """One page, pure function of (seed, i): (url, ts, html, text, lang)."""
    rng = random.Random((seed << 20) + i)
    domain = _domain(rng, i)
    url = f"https://{domain}/page-{i:06d}"
    html_text, naive = _make_html(rng, i, scale)

    # degradation cases by index (FIXTURES.md §2)
    if i % 17 == 3:
        # truncated html: cut mid-tag — repair ladder case
        html_text = html_text[: max(40, len(html_text) * 2 // 3)].rsplit("<", 1)[0] + "<p>trunc"
    elif i % 17 == 5:
        # unclosed tags
        html_text = html_text.replace("</p>", "", 3).replace("</h2>", "", 1)
    elif i % 17 == 7:
        # duplicated blocks: trip the ≥5 pair-dedup threshold
        dup = "<p>Repeated boiler line.</p>"
        html_text = html_text.replace("</body>", dup * 6 + "</body>")
    elif i % 17 == 9:
        # empty html → fallback to text column
        html_text = ""
    elif i % 17 == 11:
        # nothing extractable at all → failed
        html_text = ""
        naive = ""
    elif i % 17 == 13 and i > 0:
        # corpus-level exact-dup: identical html to row i-1
        prev_rng = random.Random((seed << 20) + (i - 1))
        _domain(prev_rng, i - 1)
        html_text, naive = _make_html(prev_rng, i - 1, scale)

    ts = EPOCH + datetime.timedelta(seconds=137 * i)
    return url, ts, html_text.encode("utf-8"), naive, LANGS[i % len(LANGS)]


def pages_batch(indices, seed: int = 42, scale: int = 1) -> pa.Table:
    """Pages table for an arbitrary index set — the batch form used to
    generate large corpora IN PARALLEL with Ray (each batch of indices
    is independent; output identical to make_pages_table row-for-row)."""
    records = [_page_record(int(i), seed, scale) for i in indices]
    return pa.Table.from_pydict(
        {
            "url": [r[0] for r in records],
            "warc_ts": [r[1] for r in records],
            "html": [r[2] for r in records],
            "text": [r[3] for r in records],
            "lang": [r[4] for r in records],
        },
        schema=PAGES_SCHEMA,
    )


def make_pages_table(n_rows: int = 64, seed: int = 42, scale: int = 1) -> pa.Table:
    """The rich byte-identity fixture corpus (FIXTURES.md §1-2).

    ``scale`` multiplies per-page content (sections) so benchmarks can
    dial pages toward realistic Common-Crawl sizes (~scale×2 KB)."""
    return pages_batch(range(n_rows), seed, scale)


def make_mega_page(seed: int = 42, target_bytes: int = 2_000_000) -> dict:
    """One ~2 MB page (skew/memory case, FIXTURES.md §2)."""
    rng = random.Random(seed ^ 0x5EED)
    parts = ["<html><body>", "<h1>Mega page</h1>"]
    while sum(len(p) for p in parts) < target_bytes:
        parts.append(f"<p>{_sentence(rng, 40)}</p>")
    parts.append("</body></html>")
    html_text = "\n".join(parts)
    return {
        "url": "https://hot.example.com/mega-000000",
        "warc_ts": EPOCH,
        "html": html_text.encode("utf-8"),
        "text": "",
        "lang": "en",
    }


# ---------------------------------------------------------------------------
# SQL-mirrorable pages derived from the driver's `documents` table.

FALLBACK_MOD, FALLBACK_REM = 23, 7
FAILED_MOD, FAILED_REM = 31, 11


IMAGE_MOD, IMAGE_REM = 5, 2
"""with_images=True adds an <img> to normal docs with
``doc_id % IMAGE_MOD == IMAGE_REM`` (the describe-pool fixture rule)."""

JSONLD_MOD, JSONLD_REM = 8, 3
JSONLD_TYPES = ("Article", "NewsArticle", "BlogPosting")
"""with_jsonld=True embeds a <script type="application/ld+json">
block into normal docs with ``doc_id % JSONLD_MOD == JSONLD_REM``:
@type rotates by ``(doc_id // 8) % 3``, wordCount is
``(doc_id * 17) % 997 + 10``, datePublished is the page timestamp —
all SQL-mirrorable arithmetic (the structured-metadata fixture rule)."""

HREFLANG_MOD, HREFLANG_REM = 6, 2
HREFLANG_LANGS = ("en", "de", "fr", "es", "ja", "zh")
"""with_hreflang=True embeds ``<link rel="alternate" hreflang=..>``
head entries into normal docs with ``doc_id % HREFLANG_MOD ==
HREFLANG_REM``: ``2 + doc_id % 3`` alternates, language j is
``HREFLANG_LANGS[(doc_id // 6 + j) % 6]`` and its href is the page
url with a ``/{lang}/`` path segment — all SQL-mirrorable arithmetic
(the i18n-cluster fixture rule)."""

TABLE_MOD, TABLE_REM = 4, 1
TABLE_ROWS, TABLE_COLS = 2, 3
"""with_tables=True adds a TABLE_ROWS×TABLE_COLS <table> to normal
docs with ``doc_id % TABLE_MOD == TABLE_REM``; cell (r, c) reads
``r{r}c{c}-{(doc_id * (r*TABLE_COLS + c + 1)) % 97}`` — arithmetic a
SQL oracle reproduces exactly (the table-extraction fixture rule)."""


def fixture_table_html(doc_id: int) -> str:
    """The deterministic fixture table markup for one page."""
    rows = []
    for r in range(TABLE_ROWS):
        cells = "".join(
            f"<td>r{r}c{c}-{(doc_id * (r * TABLE_COLS + c + 1)) % 97}</td>"
            for c in range(TABLE_COLS)
        )
        rows.append(f"<tr>{cells}</tr>")
    return "<table>" + "".join(rows) + "</table>"


def page_row_from_document(
    doc_id: int, text: str, lang: str, *, with_images: bool = False, with_tables: bool = False, with_jsonld: bool = False, with_hreflang: bool = False
) -> dict:
    """Deterministically wrap one `documents` row into a page whose
    extraction output is expressible in SQL (see __ray_entry__.oracle_sql):

    * normal: Title "Doc {id}" + one <p> body + Page-footer → extracted
      ``'Doc {id}\\n\\n' || trim(text) || '\\n\\nFooter {id%40}'``.
    * ``doc_id % 23 == 7``: script-only html → tier-2 fallback to the
      ``text`` column (status "fallback").
    * ``doc_id % 31 == 11``: empty html AND empty text → "failed".

    ``with_images=True`` additionally inserts an alt-less ``<img>``
    into normal docs selected by the IMAGE_MOD rule — an empty Picture
    span for the second-stage describe pool (A2) to caption.  The
    caption itself is not SQL-expressible (blake2b), so describe
    queries check against a golden parquet, not inline SQL.
    """
    url = f"https://example-{doc_id % 40:02d}.com/doc-{doc_id:06d}"
    ts = EPOCH + datetime.timedelta(seconds=137 * doc_id)
    if doc_id % FAILED_MOD == FAILED_REM:
        return {"url": url, "warc_ts": ts, "html": b"", "text": "", "lang": lang}
    if doc_id % FALLBACK_MOD == FALLBACK_REM:
        return {
            "url": url,
            "warc_ts": ts,
            "html": b"<script>var x = 1;</script>",
            "text": text,
            "lang": lang,
        }
    body = html_mod.escape(text)
    img = (
        f'<img src="/img{doc_id}.png">'
        if with_images and doc_id % IMAGE_MOD == IMAGE_REM
        else ""
    )
    table = (
        fixture_table_html(doc_id)
        if with_tables and doc_id % TABLE_MOD == TABLE_REM
        else ""
    )
    jsonld = ""
    if with_jsonld and doc_id % JSONLD_MOD == JSONLD_REM:
        ld_type = JSONLD_TYPES[(doc_id // JSONLD_MOD) % 3]
        wc = (doc_id * 17) % 997 + 10
        jsonld = (
            '<script type="application/ld+json">'
            f'{{"@type": "{ld_type}", "wordCount": {wc}, '
            f'"datePublished": "{ts.isoformat()}"}}'
            "</script>"
        )
    hreflang = ""
    if with_hreflang and doc_id % HREFLANG_MOD == HREFLANG_REM:
        links = []
        for j in range(2 + doc_id % 3):
            alt = HREFLANG_LANGS[(doc_id // HREFLANG_MOD + j) % len(HREFLANG_LANGS)]
            href = f"https://example-{doc_id % 40:02d}.com/{alt}/doc-{doc_id:06d}"
            links.append(f'<link rel="alternate" hreflang="{alt}" href="{href}">')
        hreflang = "".join(links)
    # the nav carries one relative link plus one deterministic
    # cross-site link (the extract_links fixture rule; nav is
    # boilerplate-pruned, so extracted text/spans are unaffected)
    next_href = f"https://example-{(doc_id * 7) % 40:02d}.com/doc-{(doc_id * 13) % 500:06d}"
    page = (
        f"<html><head><title>t</title>{hreflang}</head><body>"
        f'<nav class="nav"><a href="/">Home</a><a href="{next_href}">Next</a></nav>'
        f"<h1>Doc {doc_id}</h1>"
        f"<p>{body}</p>"
        f"{img}"
        f"{table}"
        f"{jsonld}"
        f'<footer class="page-footer">Footer {doc_id % 40}</footer>'
        "</body></html>"
    )
    return {"url": url, "warc_ts": ts, "html": page.encode("utf-8"), "text": text, "lang": lang}


def pages_from_documents_batch(
    batch: pa.Table, *, with_images: bool = False, with_tables: bool = False, with_jsonld: bool = False, with_hreflang: bool = False
) -> pa.Table:
    """Vector-friendly batch wrapper used inside map_batches."""
    rows = [
        page_row_from_document(d, t, lg, with_images=with_images, with_tables=with_tables, with_jsonld=with_jsonld, with_hreflang=with_hreflang)
        for d, t, lg in zip(
            batch.column("doc_id").to_pylist(),
            batch.column("text").to_pylist(),
            batch.column("lang").to_pylist(),
        )
    ]
    out = {name: [r[name] for r in rows] for name in PAGES_SCHEMA.names}
    tbl = pa.Table.from_pydict(out, schema=PAGES_SCHEMA)
    return tbl.append_column("doc_id", batch.column("doc_id"))


def inject_near_dup_embeddings(ids, mat, *, mod: int = 9, rem: int = 4, n_groups: int = 3, eps: float = 0.1):
    """Deterministically replace the embeddings of rows with
    ``vec_id % mod == rem`` by near-duplicates: group ``g = vec_id %
    n_groups`` rows become ``normalize(e_g + eps * unit(v))`` — within
    a group pairwise cosine ≈ 1/(1+eps²) ≈ 0.99, across groups ≈ 0;
    the group index comes from ``(vec_id // mod) % n_groups`` (the
    residue would be pinned by ``% mod`` whenever the moduli share a
    factor).
    The raw embeddings table has no near-dup pairs (max pairwise sim
    ≈ 0.51), so SemDeDup-style queries inject these; pure numpy shared
    by the Ray query and the sequential golden (same seam as the
    incremental_dedup SHARED texts).  Returns a new float32 matrix."""
    import numpy as np

    ids = np.asarray(ids, dtype=np.int64)
    mat = np.asarray(mat, dtype=np.float32)
    m = (ids % mod) == rem
    out = mat.copy()
    if not m.any():
        return out
    sel = mat[m].astype(np.float64)
    norms = np.linalg.norm(sel, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    unit = sel / norms
    # group by the quotient, not the residue — ids % mod == rem pins
    # ids % n_groups whenever gcd(mod, n_groups) > 1
    g = ((ids[m] // mod) % n_groups).astype(np.int64)
    base = np.zeros((n_groups, mat.shape[1]), dtype=np.float64)
    base[np.arange(n_groups), np.arange(n_groups)] = 1.0
    v = base[g] + eps * unit
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    out[m] = v.astype(np.float32)
    return out


CONTAIN_MOD = 41
"""Quote-inclusion injection rule (containment_text): docs with
``doc_id % 41 == 3`` become a short deterministic base text; docs with
``doc_id % 41 == 5`` become the SAME base (same ``doc_id // 41``
family) plus a unique tail — so each (3+41m, 5+41m) pair is a planted
containment case (high containment, Jaccard diluted by the tail)."""


def _containment_base(m: int) -> str:
    words = [f"quote{m} segment{(m * 7 + i) % 23} body{(m + i) % 11}" for i in range(8)]
    return " ".join(words)


def containment_text(doc_id: int, text: str) -> str:
    """Apply the CONTAIN_MOD injection to one document's text (pure;
    shared by the Ray query and the sequential golden oracle)."""
    m, r = divmod(doc_id, CONTAIN_MOD)
    if r == 3:
        return _containment_base(m)
    if r == 5:
        return _containment_base(m) + f" extended tail content unique to {doc_id} plus trailing filler words"
    return text


PII_MOD, PII_REM = 6, 1
"""PII injection rule (pii_text): docs with ``doc_id % 6 == 1`` get a
deterministic ' contact <email> or <ip> at <url>' suffix whose three
spans the scrub regexes consume EXACTLY (2-digit IP octets so the
phone pattern can never partially eat the IP) — redaction becomes
SQL-mirrorable as a constant-suffix replacement."""


def pii_text(doc_id: int, text: str) -> str:
    """Apply the PII_MOD injection to one document's text (pure;
    shared by the Ray query and the SQL mirror's arithmetic)."""
    if doc_id % PII_MOD != PII_REM:
        return text
    ip = f"10.{10 + doc_id % 90}.{10 + (doc_id * 3) % 90}.{10 + (doc_id * 7) % 90}"
    return (
        text
        + f" contact user{doc_id}@mail-{doc_id % 13}.example.com or {ip}"
        + f" at https://pii-{doc_id % 9}.example.org/x"
    )


MOJI_MOD, MOJI_REM = 9, 4
"""Mojibake injection rule (moji_text): docs with ``doc_id % 9 == 4``
get ``k = (doc_id // 9) % 3 + 1`` copies of ONE mangled signature
appended (rotating by ``(doc_id // 9) % 3`` — NOT ``doc_id % 3``,
which is constant 1 on the residue class since 9 % 3 == 0).  Each
signature repairs to exactly one character via the cp1252/UTF-8
round-trip, so detection counts and before/after codepoint lengths
are SQL-mirrorable arithmetic on (doc_id, length(text))."""

_MOJI_SEQS = (
    "Ã©",          # mangled e-acute  (2 chars -> 1)
    "â€™",    # mangled right single quote (3 chars -> 1)
    "Ã¼",          # mangled u-umlaut (2 chars -> 1)
)


def moji_text(doc_id: int, text: str) -> str:
    """Apply the MOJI_MOD injection to one document's text (pure;
    shared by the Ray query and the SQL mirror's arithmetic)."""
    if doc_id % MOJI_MOD != MOJI_REM:
        return text
    sel = (doc_id // MOJI_MOD) % 3
    return text + _MOJI_SEQS[sel] * (sel + 1)


def script_text(doc_id: int, text: str) -> str:
    """Script-mix injection rule (SQL-mirrorable arithmetic): three
    independent residue rules append non-Latin runs to the ASCII base —
    ``doc_id % 7 == 2`` → Cyrillic "привет" × ((doc_id // 7) % 2 + 1),
    ``doc_id % 7 == 5`` → CJK "你好世界",
    ``doc_id % 11 == 3`` → Greek "αβγ" (can stack with either 7-rule,
    exercising mixed-script documents)."""
    out = text
    if doc_id % 7 == 2:
        out += "привет" * ((doc_id // 7) % 2 + 1)
    elif doc_id % 7 == 5:
        out += "你好世界"
    if doc_id % 11 == 3:
        out += "αβγ"
    return out


def compat_text(doc_id: int, text: str) -> str:
    """NFKC-audit injection rule (SQL-mirrorable arithmetic): three
    stackable residue rules append compatibility characters —
    ``doc_id % 13 == 6`` → full-width "ＡＢ" (NFKC "AB", 2 → 2 chars),
    ``doc_id % 13 == 9`` → ligature "ﬁ" (NFKC "fi", 1 → 2 chars),
    ``doc_id % 17 == 2`` → circled "①" (NFKC "1", 1 → 1 char)."""
    out = text
    if doc_id % 13 == 6:
        out += "ＡＢ"
    elif doc_id % 13 == 9:
        out += "ﬁ"
    if doc_id % 17 == 2:
        out += "①"
    return out


CARD_MOD, CARD_REM = 10, 7


def card_text(doc_id: int, text: str) -> str:
    """Card-injection rule: docs with ``doc_id % 10 == 7`` get
    ' card ' + a 16-digit number whose first 15 digits are
    ``(doc_id * (i + 3) + doc_id // 10) % 10`` (the quotient term
    varies the digits across the residue class); Luhn-correct when
    ``(doc_id // 10) % 2 == 0`` (a VALID card) and off-by-one
    otherwise (checksum-invalid) — so validity is SQL-mirrorable
    arithmetic while the engine must genuinely run Luhn."""
    if doc_id % CARD_MOD != CARD_REM:
        return text
    from dots_ocr_ray.functions.scrub import luhn_check_digit

    d15 = "".join(str((doc_id * (i + 3) + doc_id // 10) % 10) for i in range(15))
    c = luhn_check_digit(d15)
    if (doc_id // CARD_MOD) % 2 == 1:
        c = str((int(c) + 1) % 10)
    return text + " card " + d15 + c


def media_payload(doc_id: int, text: str, *, mod: int = 11, rem: int = 5, n_groups: int = 4) -> bytes:
    """Deterministic media-payload rule shared by the perceptual-hash
    dedup query and its golden: docs with ``doc_id % mod == rem`` get
    a planted GROUP TEXTURE (4 KB multiplicative byte pattern keyed by
    the group index, plus one trailing doc-specific byte — so group
    members are near-identical "images" and groups are mutually
    distant), everyone else keeps their text bytes.  The raw corpus
    has no pHash-range near-dups (measured median Hamming 32), so the
    injection is what gives the dedup query a non-trivial answer —
    while the engine still genuinely decodes, hashes, blocks and
    verifies every row."""
    import numpy as np

    if doc_id % mod != rem:
        return (text or "").encode("utf-8")
    g = (doc_id // mod) % n_groups
    i = np.arange(4096, dtype=np.uint64)
    tex = (
        ((i + np.uint64(1)) * np.uint64(2 * g + 3) * np.uint64(2654435761))
        >> np.uint64(7)
    ) & np.uint64(0xFF)
    return tex.astype(np.uint8).tobytes() + bytes([doc_id % 251])


def text_png_payload(text: str, *, width: int = 64) -> bytes:
    """A REAL PNG whose grayscale pixels are the utf-8 bytes of
    ``text`` row-major (zero-padded to the last row; empty text → one
    zero pixel).  Scanline filters rotate 0-4, so decoding exercises
    every filter-reconstruction branch.  Inverse:
    `stages/media.py:png_text_roundtrip` — together they put a genuine
    zlib-inflate + unfilter pass under the md5-of-text SQL oracle."""
    import numpy as np

    from dots_ocr_ray.kernel.png import encode_png

    data = np.frombuffer((text or "").encode("utf-8"), dtype=np.uint8)
    if len(data) == 0:
        data = np.zeros(1, dtype=np.uint8)
    h = -(-len(data) // width)
    img = np.zeros(h * width, dtype=np.uint8)
    img[: len(data)] = data
    return encode_png(img.reshape(h, width), filter_mode="rotate")


def media_png_payload(doc_id: int, text: str, *, mod: int = 11, rem: int = 5, n_groups: int = 4) -> bytes:
    """Real-PNG version of the :func:`media_payload` group rule for
    the REAL-pixel perceptual-hash query: docs with
    ``doc_id % mod == rem`` get a 32×32 GROUP TEXTURE image (same
    multiplicative pattern keyed by group index, one doc-specific
    pixel nudged so members are near- but not bit-identical); everyone
    else gets their text bytes as pixels (full rows only — no zero
    tail to correlate the hash bits).  Every payload is a real PNG,
    so the query decodes EVERY row (inflate + unfilter + luma +
    area-mean thumbnail) before hashing."""
    import numpy as np

    from dots_ocr_ray.kernel.png import encode_png

    if doc_id % mod == rem:
        g = (doc_id // mod) % n_groups
        i = np.arange(1024, dtype=np.uint64)
        tex = (
            ((i + np.uint64(1)) * np.uint64(2 * g + 3) * np.uint64(2654435761))
            >> np.uint64(7)
        ) & np.uint64(0xFF)
        img = tex.astype(np.uint8).astype(np.int64)
        # doc-specific smudge: a 48-px run brightened by 24 shifts a
        # couple of thumbnail-cell means across the global mean, so
        # group members land a FEW phash bits apart (true near-dups,
        # not bit-identical), still inside the Hamming-3 radius
        start = (doc_id * 131) % (1024 - 32)
        img[start : start + 32] = np.minimum(img[start : start + 32] + 10, 255)
        return encode_png(img.reshape(32, 32).astype(np.uint8), filter_mode="rotate")
    data = np.frombuffer((text or "").encode("utf-8"), dtype=np.uint8)
    # 8 columns, COLUMN-major byte placement: each 8×8-thumbnail cell
    # then averages one contiguous byte chunk (the chunk_image
    # geometry whose measured non-dup median Hamming is 32) — a plain
    # row-major raster of prose bytes is too self-similar and collides
    h = max(1, len(data) // 8)
    img = np.zeros((8, h), dtype=np.uint8)
    flat = img.reshape(-1)
    flat[: min(len(data), 8 * h)] = data[: 8 * h]
    return encode_png(img.T.copy(), filter_mode="rotate")


VIDEO_MOD, VIDEO_REM = 6, 2
VIDEO_W, VIDEO_H = 16, 8


def video_y4m_payload(doc_id: int) -> bytes:
    """Deterministic REAL Y4M stream for docs with
    ``doc_id % 6 == 2``: ``1 + (doc_id // 6) % 5`` frames of 16×8
    luma with ``pixel(f,y,x) = (31·doc_id + 17·f + 13·y + 7·x) % 256``
    — pure arithmetic, so per-frame mean luma is SQL-mirrorable while
    the engine genuinely parses the container and slices the planes."""
    import numpy as np

    from dots_ocr_ray.kernel.y4m import encode_y4m

    n_frames = 1 + (doc_id // VIDEO_MOD) % 5
    f = np.arange(n_frames, dtype=np.int64)[:, None, None]
    y = np.arange(VIDEO_H, dtype=np.int64)[None, :, None]
    x = np.arange(VIDEO_W, dtype=np.int64)[None, None, :]
    frames = ((31 * doc_id + 17 * f + 13 * y + 7 * x) % 256).astype(np.uint8)
    return encode_y4m(frames)
