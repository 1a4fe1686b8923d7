"""Mojibake detection + repair for web corpora.

Common Crawl pages are full of double-encoded text: UTF-8 bytes that
were decoded once as cp1252 and re-encoded, turning "é" into "Ã©" and
"'" (U+2019) into "â€™".  The classic repair (the core of ftfy) is the
reverse round-trip ``s.encode("cp1252").decode("utf-8")`` — cp1252 is
the right intermediate (not latin-1) because the mangled forms contain
€/™/œ-class characters that only cp1252 maps back to bytes 0x80-0x9F.

Pipeline shape: detection is fully vectorized — one Arrow
``count_substring`` kernel per lexicon signature per batch (the
lexicon is a dozen maximal, mutually-non-overlapping mangled
sequences, so the per-signature counts sum without double counting).
Repair runs ONLY on the (typically rare) rows with a detection hit —
a narrow Python loop over the matched rows, guarded so a failed
round-trip leaves the row untouched.  The output carries an explicit
``repair_ok`` flag: after the round-trip the signatures are re-counted
on the repaired text, so "detected but could not repair" rows (mixed
mojibake + genuine non-cp1252 characters) are observable instead of
silently passing through.  Zero exchange: pure per-batch transform,
streams at any corpus size.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

# Maximal mangled signatures (UTF-8 bytes read as cp1252).  Ordered
# longest-first for documentation; none is a substring of another and
# no two can overlap in a scan, so per-signature counts are additive.
MOJIBAKE_SIGNATURES: tuple[str, ...] = (
    "\u00e2\u20ac\u2122",  # mangled \u2019 (right single quote)
    "\u00e2\u20ac\u0153",  # mangled \u201c (left double quote)
    "\u00e2\u20ac\u201c",  # mangled \u2013 (en dash)
    "\u00e2\u20ac\u201d",  # mangled \u2014 (em dash)
    "\u00c3\u00a9",  # mangled \u00e9 (e acute)
    "\u00c3\u00bc",  # mangled \u00fc (u umlaut)
    "\u00c3\u00a4",  # mangled \u00e4 (a umlaut)
    "\u00c3\u00b6",  # mangled \u00f6 (o umlaut)
    "\u00c3\u00b1",  # mangled \u00f1 (n tilde)
    "\u00c3\u00a1",  # mangled \u00e1 (a acute)
    "\u00c3\u00b3",  # mangled \u00f3 (o acute)
    "\u00c2\u00b0",  # mangled \u00b0 (degree sign)
    "\u00c2\u00bb",  # mangled \u00bb (right guillemet)
)


def repair_text(text: str) -> str:
    """Reverse cp1252/UTF-8 round-trip; returns ``text`` unchanged if
    the round-trip fails or does not decode cleanly."""
    try:
        return text.encode("cp1252").decode("utf-8")
    except (UnicodeEncodeError, UnicodeDecodeError):
        return text


def repair_mojibake(
    ds: ray.data.Dataset, *, text_col: str = "text"
) -> ray.data.Dataset:
    """Detect + repair mojibake in ``text_col``.

    Output adds ``text_repaired`` (round-trip-fixed where signatures
    hit, untouched elsewhere), ``n_mojibake`` (additive signature
    count), ``chars_before`` / ``chars_after`` (codepoint lengths) and
    ``repair_ok`` (1 unless signatures remain after the round-trip —
    i.e. the repair failed or only partially applied).
    """
    import numpy as np
    import pyarrow.compute as pc

    def _count_signatures(col) -> "np.ndarray":
        n = np.zeros(len(col), dtype=np.int64)
        for sig in MOJIBAKE_SIGNATURES:
            n += pc.count_substring(col, sig).to_numpy(zero_copy_only=False)
        return n

    def _repair(batch: pa.Table) -> pa.Table:
        col = pc.fill_null(batch.column(text_col), "")
        n = _count_signatures(col)
        before = pc.utf8_length(col).cast(pa.int64())
        if int(n.sum()) == 0:
            repaired = col
            remaining = n
        else:
            texts = col.to_pylist()
            hit_rows = np.nonzero(n)[0]
            for i in hit_rows:
                texts[i] = repair_text(texts[i])
            repaired = pa.array(texts, type=pa.string())
            remaining = _count_signatures(repaired)
        after = pc.utf8_length(repaired).cast(pa.int64())
        return (
            batch.append_column("text_repaired", repaired)
            .append_column("n_mojibake", pa.array(n))
            .append_column("chars_before", before)
            .append_column("chars_after", after)
            .append_column(
                "repair_ok", pa.array((remaining == 0).astype(np.int64))
            )
        )

    return ds.map_batches(_repair, batch_format="pyarrow")


def nfkc_normalize(ds: ray.data.Dataset, *, text_col: str = "text") -> ray.data.Dataset:
    """NFKC compatibility normalization audit + apply: full-width
    forms, ligatures and enclosed digits collapse to their canonical
    ASCII-ish forms — the standard canonicalization pass before
    tokenizer training (a "ﬁ" ligature and "fi" must count as the
    same bigram).

    Fast path: rows are pre-filtered with one vectorized non-ASCII
    regex (`match_substring_regex`); pure-ASCII text is NFKC-invariant
    by construction, so ``unicodedata.normalize`` runs only on the
    (typically rare) non-ASCII rows.  Adds ``text_nfkc``, ``changed``
    (0/1), ``len_before``, ``len_after``.  Zero exchange."""
    import unicodedata

    import numpy as np
    import pyarrow.compute as pc

    def _norm(batch: pa.Table) -> pa.Table:
        col = pc.fill_null(batch.column(text_col), "")
        before = pc.utf8_length(col).cast(pa.int64())
        non_ascii = pc.match_substring_regex(col, r"[^\x00-\x7F]").to_numpy(
            zero_copy_only=False
        )
        if not non_ascii.any():
            normed = col
        else:
            texts = col.to_pylist()
            for i in np.nonzero(non_ascii)[0]:
                texts[i] = unicodedata.normalize("NFKC", texts[i])
            normed = pa.array(texts, type=pa.string())
        after = pc.utf8_length(normed).cast(pa.int64())
        changed = pc.cast(pc.not_equal(col, normed), pa.int64())
        return (
            batch.append_column("text_nfkc", normed)
            .append_column("changed", changed)
            .append_column("len_before", before)
            .append_column("len_after", after)
        )

    return ds.map_batches(_norm, batch_format="pyarrow")
