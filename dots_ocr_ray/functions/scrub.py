"""PII scrubbing for web corpora: regex redaction of emails, phone
numbers, IP addresses and URLs — deterministic, vectorizable per batch
(compiled patterns are module-level = warm on every worker).

Patterns are deliberately conservative (precision over recall): a
training-data pipeline wants predictable masking, not NLP guessing.
"""

from __future__ import annotations

import re

import pyarrow as pa

import ray.data

EMAIL_RE = re.compile(r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b")
PHONE_RE = re.compile(r"\b(?:\+?\d{1,3}[ .-]?)?(?:\(\d{2,4}\)[ .-]?)?\d{3}[ .-]\d{3,4}[ .-]?\d{0,4}\b")
IPV4_RE = re.compile(r"\b(?:(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\b")
URL_RE = re.compile(r"\bhttps?://[^\s<>\"]+")

MASKS = {
    "email": (EMAIL_RE, "<EMAIL>"),
    "phone": (PHONE_RE, "<PHONE>"),
    "ip": (IPV4_RE, "<IP>"),
    "url": (URL_RE, "<URL>"),
}


def scrub_text(text: str, kinds: tuple[str, ...] = ("email", "phone", "ip", "url")) -> tuple[str, dict]:
    """Redact; returns (scrubbed, {kind: n_redactions})."""
    counts = {}
    for kind in kinds:
        pattern, mask = MASKS[kind]
        text, n = pattern.subn(mask, text)
        counts[kind] = n
    return text, counts


def scrub_documents(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    kinds: tuple[str, ...] = ("email", "phone", "ip", "url"),
) -> ray.data.Dataset:
    """Adds ``{text_col}_scrubbed`` and per-kind redaction-count columns."""

    def _scrub(batch: pa.Table) -> pa.Table:
        scrubbed, count_cols = [], {k: [] for k in kinds}
        for t in batch.column(text_col).to_pylist():
            s, counts = scrub_text(t or "", kinds)
            scrubbed.append(s)
            for k in kinds:
                count_cols[k].append(counts[k])
        batch = batch.append_column(f"{text_col}_scrubbed", pa.array(scrubbed, type=pa.string()))
        for k in kinds:
            batch = batch.append_column(f"n_{k}", pa.array(count_cols[k], type=pa.int32()))
        return batch

    return ds.map_batches(_scrub, batch_format="pyarrow")


def pseudonymize_ids(
    ds: ray.data.Dataset,
    *,
    id_col: str = "user_id",
    salt: str = "graft",
    out_col: str | None = None,
    hex_digits: int = 16,
) -> ray.data.Dataset:
    """Deterministic keyed pseudonymization of an identifier column:
    ``md5(salt || ':' || id)[:hex_digits]`` — the PII-safe surrogate a
    corpus needs before sharing event/user tables (same id → same
    pseudonym for joinability, original unrecoverable without the
    salt; rotate the salt to unlink releases).

    Zero exchange; md5 is computed once per DISTINCT value per batch
    (a per-batch memo), so hot-user event streams pay one digest per
    user per batch, not per row.  Null ids stay null.  Values hash
    from their Python repr (``to_pylist``), never a numpy cast — an
    int64 column with one null would otherwise float-convert and hash
    ``'42.0'`` in null-carrying batches but ``'42'`` elsewhere,
    splitting one user across two pseudonyms."""
    import hashlib

    out_name = out_col or f"{id_col}_pseud"

    def _pseud(batch: pa.Table) -> pa.Table:
        memo: dict = {}
        out = []
        for v in batch.column(id_col).to_pylist():
            if v is None:
                out.append(None)
                continue
            if v not in memo:
                memo[v] = hashlib.md5(f"{salt}:{v}".encode()).hexdigest()[:hex_digits]
            out.append(memo[v])
        return batch.append_column(out_name, pa.array(out, type=pa.string()))

    return ds.map_batches(_pseud, batch_format="pyarrow")
