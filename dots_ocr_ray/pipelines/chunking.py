"""Document chunking for training-data preparation.

Splits documents into overlapping ~N-token chunks — the op that turns
an extracted corpus into model-ready samples.  Pure per-row explode
(1 row → k rows) inside ``map_batches``; no shuffle.  Offsets are char
positions into the source text so chunks can always be traced back
(lineage, like span char offsets in the extraction schema).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data


def chunk_text(text: str, chunk_tokens: int = 128, overlap_tokens: int = 16) -> list[tuple[int, int, str]]:
    """Greedy whitespace-token chunker → [(char_start, char_end, chunk)].

    Deterministic; the final chunk may be short; overlap is taken from
    the tail of the previous chunk.  Empty text → no chunks.
    """
    if not text or chunk_tokens <= 0:
        return []
    if overlap_tokens >= chunk_tokens:
        raise ValueError("overlap_tokens must be < chunk_tokens")
    # token spans (start, end) in char coordinates
    spans = []
    pos = 0
    for tok in text.split():
        start = text.index(tok, pos)
        spans.append((start, start + len(tok)))
        pos = start + len(tok)
    if not spans:
        return []
    out = []
    step = chunk_tokens - overlap_tokens
    i = 0
    while i < len(spans):
        window = spans[i : i + chunk_tokens]
        c_start, c_end = window[0][0], window[-1][1]
        out.append((c_start, c_end, text[c_start:c_end]))
        if i + chunk_tokens >= len(spans):
            break
        i += step
    return out


def chunk_documents(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 128,
    overlap_tokens: int = 16,
    passthrough_cols: tuple[str, ...] = (),
) -> ray.data.Dataset:
    """documents → chunks: (doc_id, chunk_id, char_start, char_end,
    chunk_text, n_tokens [, passthrough…]).  chunk_id numbers chunks
    within a doc from 0; ``passthrough_cols`` replicate per-doc lineage
    columns (e.g. url) onto every chunk row."""

    def _explode(batch: pa.Table) -> pa.Table:
        ids, chunk_ids, starts, ends, texts, ntoks = [], [], [], [], [], []
        extra: dict[str, list] = {c: [] for c in passthrough_cols}
        extra_src = {c: batch.column(c).to_pylist() for c in passthrough_cols}
        for row_i, (doc_id, text) in enumerate(
            zip(batch.column(id_col).to_pylist(), batch.column(text_col).to_pylist())
        ):
            for k, (s, e, chunk) in enumerate(chunk_text(text or "", chunk_tokens, overlap_tokens)):
                ids.append(doc_id)
                chunk_ids.append(k)
                starts.append(s)
                ends.append(e)
                texts.append(chunk)
                ntoks.append(len(chunk.split()))
                for c in passthrough_cols:
                    extra[c].append(extra_src[c][row_i])
        cols = {
            "doc_id": pa.array(ids, type=pa.int64()),
            "chunk_id": pa.array(chunk_ids, type=pa.int32()),
            "char_start": pa.array(starts, type=pa.int64()),
            "char_end": pa.array(ends, type=pa.int64()),
            "chunk_text": pa.array(texts, type=pa.string()),
            "n_tokens": pa.array(ntoks, type=pa.int32()),
        }
        for c in passthrough_cols:
            cols[c] = pa.array(extra[c], type=batch.schema.field(c).type)
        return pa.table(cols)

    return ds.map_batches(_explode, batch_format="pyarrow")
