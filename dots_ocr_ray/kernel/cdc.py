"""Content-defined chunking (CDC): Gear-hash rolling boundaries.

The storage-dedup primitive (LBFS/FastCDC family): chunk boundaries
are chosen where a rolling hash of the trailing window hits a mask,
so an insertion or deletion only reshifts boundaries NEAR the edit —
unlike fixed-size blocks, where one inserted byte re-aligns (and thus
re-hashes) every later block.  Re-crawled pages that changed one
paragraph then share every other chunk with the archived version.

Pure kernel — no Ray: the pipeline (pipelines/cdc.py) maps it over
batches, and the sequential golden oracle (tools/make_golden.py)
calls the SAME functions, so the distributed/sequential cross-check
is over orchestration, not chunking logic.

Determinism: the gear table derives from md5 of the byte value, so
boundaries are stable across processes, platforms and runs (no
Python hash(), no RNG).
"""

from __future__ import annotations

import hashlib

import numpy as np

_WINDOW = 64  # gear hash width: (h << 1) forgets a byte after 64 shifts


def _gear_table() -> np.ndarray:
    out = np.empty(256, dtype=np.uint64)
    for b in range(256):
        out[b] = np.uint64(
            int.from_bytes(hashlib.md5(bytes([b]) + b"gear-cdc").digest()[:8], "big")
        )
    return out


GEAR = _gear_table()


def gear_hashes(data: bytes) -> np.ndarray:
    """Rolling gear hash at every position (uint64):
    ``h[i] = sum_{j<64} GEAR[data[i-j]] << j`` — the closed form of
    the sequential ``h = (h << 1) + GEAR[b]`` recurrence, which this
    computes VECTORIZED as 64 shifted adds instead of a per-byte
    Python loop."""
    arr = np.frombuffer(data, dtype=np.uint8)
    g = GEAR[arr]
    h = np.zeros(len(arr), dtype=np.uint64)
    for j in range(min(_WINDOW, len(arr))):
        h[j:] += g[: len(arr) - j] << np.uint64(j)
    return h


def cdc_boundaries(
    data: bytes,
    *,
    min_size: int = 64,
    avg_size: int = 256,
    max_size: int = 1024,
) -> list[int]:
    """Chunk END offsets (exclusive), last one always ``len(data)``.

    A position cuts when the rolling hash meets ``avg_size - 1`` as a
    mask (avg_size must be a power of two — expected chunk length is
    ``avg_size`` bytes), subject to ``min_size``/``max_size``: the
    candidate scan is vectorized; only the accepted cuts (a few per
    KB) go through the sequential min/max walk."""
    n = len(data)
    if n == 0:
        return []
    if avg_size & (avg_size - 1):
        raise ValueError("avg_size must be a power of two")
    mask = np.uint64(avg_size - 1)
    cand = np.nonzero((gear_hashes(data) & mask) == 0)[0] + 1  # cut AFTER position
    cuts: list[int] = []
    prev = 0
    ci = 0
    nc = len(cand)
    while prev < n:
        lo = prev + min_size
        hard = prev + max_size
        while ci < nc and cand[ci] < lo:
            ci += 1
        if ci < nc and cand[ci] <= hard and cand[ci] < n:
            cut = int(cand[ci])
            ci += 1
        else:
            cut = min(hard, n)
        cuts.append(cut)
        prev = cut
    return cuts


def cdc_chunks(
    data: bytes,
    *,
    min_size: int = 64,
    avg_size: int = 256,
    max_size: int = 1024,
) -> list[tuple[int, int, str]]:
    """(start, length, md5-hex) per chunk — what the dedup pipeline
    aggregates on."""
    out: list[tuple[int, int, str]] = []
    prev = 0
    for end in cdc_boundaries(data, min_size=min_size, avg_size=avg_size, max_size=max_size):
        out.append((prev, end - prev, hashlib.md5(data[prev:end]).hexdigest()))
        prev = end
    return out
