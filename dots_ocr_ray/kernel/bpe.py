"""Pure byte-pair-encoding kernels (Sennrich et al. 2016; greedy
lowest-rank encode as popularized by GPT-2's public tokenizer).

Shared by the Ray pipeline (`pipelines/tokenizer.py`) and the
sequential golden oracle (`tools/make_golden.py`) — every function
here is deterministic and engine-independent, so the two paths can be
hash-compared.

Reference analog: the reference engine ships a fixed pretrained
tokenizer with its VLM (dots_ocr/model/inference.py loads it with the
weights); a from-scratch training-data engine must also TRAIN one, so
this module implements the standard public algorithm rather than
porting anything.
"""

from __future__ import annotations

from collections import defaultdict

# Words longer than this bypass merging and are emitted as fixed-width
# slices: the naive greedy encode is O(L^2) and a pathological
# 50k-char "word" (minified JS, base64 blob) would stall a worker.
# Applied identically in training (such words are skipped) and encode.
MAX_WORD_LEN = 256


def bpe_train(word_counts: dict[str, int], num_merges: int) -> list[tuple[str, str]]:
    """Learn up to ``num_merges`` merges from a word→count table.

    Classic BPE: start from characters, repeatedly merge the most
    frequent adjacent symbol pair.  Fully deterministic: ties break on
    the lexicographically smallest (left, right) pair, and the
    selection key is a total order, so dict iteration order cannot
    leak in.  Stops early when the best pair occurs fewer than 2
    times (merging hapax pairs just memorizes the sample)."""
    words: list[tuple[list[str], int]] = [
        (list(w), int(c))
        for w, c in word_counts.items()
        if w and len(w) <= MAX_WORD_LEN
    ]
    pair_counts: dict[tuple[str, str], int] = defaultdict(int)
    pair_words: dict[tuple[str, str], set[int]] = defaultdict(set)
    for wi, (syms, c) in enumerate(words):
        for pair in zip(syms, syms[1:]):
            pair_counts[pair] += c
            pair_words[pair].add(wi)

    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        best: tuple[str, str] | None = None
        best_count = 1  # require >= 2
        for pair, cnt in pair_counts.items():
            if cnt > best_count or (cnt == best_count and best is not None and pair < best):
                if cnt >= 2:
                    best, best_count = pair, cnt
        if best is None:
            break
        merges.append(best)
        new_sym = best[0] + best[1]
        # rewrite only the words that (may) contain the pair; stale
        # pair_words entries are harmless — the rewrite below is a
        # no-op for them (old pairs removed == new pairs added)
        for wi in sorted(pair_words.pop(best, ())):
            syms, c = words[wi]
            for pair in zip(syms, syms[1:]):
                pair_counts[pair] -= c
                if pair_counts[pair] <= 0:
                    del pair_counts[pair]
            out: list[str] = []
            i = 0
            n = len(syms)
            while i < n:
                if i + 1 < n and syms[i] == best[0] and syms[i + 1] == best[1]:
                    out.append(new_sym)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[wi] = (out, c)
            for pair in zip(out, out[1:]):
                pair_counts[pair] += c
                pair_words[pair].add(wi)
        pair_counts.pop(best, None)
    return merges


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Segment one word with trained merges: repeatedly apply the
    lowest-rank pair present (all occurrences at once) until no
    learned pair remains.  For a word seen in training this reproduces
    the training-time segmentation exactly (merges commute with rank
    order).  Over-long words bypass merging (see MAX_WORD_LEN)."""
    if not word:
        return []
    if len(word) > MAX_WORD_LEN:
        return [word[i : i + MAX_WORD_LEN] for i in range(0, len(word), MAX_WORD_LEN)]
    syms = list(word)
    while len(syms) > 1:
        best_rank: int | None = None
        best: tuple[str, str] | None = None
        for pair in zip(syms, syms[1:]):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best = r, pair
        if best is None:
            break
        out: list[str] = []
        i = 0
        n = len(syms)
        while i < n:
            if i + 1 < n and syms[i] == best[0] and syms[i + 1] == best[1]:
                out.append(syms[i] + syms[i + 1])
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def word_counts_from_texts(texts: list[str]) -> dict[str, int]:
    """Whitespace word-frequency table (the engine's tokenization
    convention everywhere: str.split())."""
    counts: dict[str, int] = defaultdict(int)
    for t in texts:
        if not t:
            continue
        for w in t.split():
            counts[w] += 1
    return dict(counts)
