"""Jaro-Winkler string similarity (Winkler 1990) — the record-linkage
standard for short identifier strings (names, hosts, vocab variants),
complementing the engine's edit-distance matcher
(``vocab_edit_pairs``) with a transposition-tolerant, prefix-weighted
measure.  Implemented from the published definition — including the
0.7 boost-threshold gate (the prefix boost applies only when the Jaro
score exceeds 0.7); verified against the classic examples
(MARTHA/MARHTA 0.9611, DIXON/DICKSONX 0.8133, DWAYNE/DUANE 0.84).

Micro-quantized at the boundary only — internal float arithmetic is a
pure function of the two strings, so any partitioning of the work
reproduces identical scores.
"""

from __future__ import annotations

import math


def jaro_winkler_micro(a: str, b: str) -> int:
    """floor(1e6 · JW(a, b)); 1_000_000 for equal strings, 0 when
    either is empty or there are no matching characters."""
    if a == b:
        return 1_000_000
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    ma = [False] * la
    mb = [False] * lb
    m = 0
    for i in range(la):
        lo, hi = max(0, i - window), min(lb, i + window + 1)
        for j in range(lo, hi):
            if not mb[j] and a[i] == b[j]:
                ma[i] = mb[j] = True
                m += 1
                break
    if m == 0:
        return 0
    t = 0
    k = 0
    for i in range(la):
        if ma[i]:
            while not mb[k]:
                k += 1
            if a[i] != b[k]:
                t += 1
            k += 1
    t //= 2
    jaro = (m / la + m / lb + (m - t) / m) / 3.0
    # Winkler's prefix boost applies only above the published 0.7
    # boost threshold; below it the score is plain Jaro
    if jaro <= 0.7:
        return int(math.floor(1_000_000 * jaro))
    p = 0
    for x, y in zip(a, b):
        if x == y and p < 4:
            p += 1
        else:
            break
    return int(math.floor(1_000_000 * (jaro + 0.1 * p * (1.0 - jaro))))
