"""BPE tokenizer: kernel determinism + pipeline/sequential parity."""

import numpy as np
import pyarrow as pa

import ray.data

from dots_ocr_ray.kernel.bpe import (
    MAX_WORD_LEN,
    bpe_encode_word,
    bpe_train,
    word_counts_from_texts,
)
from dots_ocr_ray.pipelines.tokenizer import (
    bpe_encode,
    bpe_token_stats,
    ranks_from_merges,
    train_bpe,
)


def test_bpe_train_classic():
    # Sennrich's canonical toy corpus: first merges pick the most
    # frequent adjacent pair, ties broken lexicographically.
    counts = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe_train(counts, 4)
    assert merges[0] == ("e", "s")  # 9 occurrences
    assert merges[1] == ("es", "t")  # 9
    assert ("l", "o") in merges or ("lo", "w") in merges


def test_bpe_train_tie_break_and_min_count():
    # equal-count pairs -> lexicographically smallest wins
    merges = bpe_train({"ab": 2, "cd": 2}, 10)
    assert merges[0] == ("a", "b")
    assert merges[1] == ("c", "d")
    # hapax pairs (count 1) never merge
    assert bpe_train({"xy": 1}, 5) == []


def test_bpe_encode_roundtrip_training_words():
    counts = word_counts_from_texts(["the cat sat on the mat", "the cat ran"] * 3)
    merges = bpe_train(counts, 50)
    ranks = {m: i for i, m in enumerate(merges)}
    for w in counts:
        pieces = bpe_encode_word(w, ranks)
        assert "".join(pieces) == w  # lossless segmentation
    # a fully-merged training word collapses to one piece
    assert bpe_encode_word("the", ranks) == ["the"]


def test_bpe_encode_oversize_word_bypasses():
    long_word = "a" * (MAX_WORD_LEN * 2 + 7)
    pieces = bpe_encode_word(long_word, {("a", "a"): 0})
    assert "".join(pieces) == long_word
    assert all(len(p) <= MAX_WORD_LEN for p in pieces)
    # and training skips it entirely (no single-word memorization blowup)
    assert bpe_train({long_word: 100}, 3) == []


def test_pipeline_parity_with_sequential(ray_session):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox",
        "pack my box with five dozen liquor jugs",
        "",
        None,
        "sphinx of black quartz judge my vow",
    ] * 4
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts)), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(3)
    merges = train_bpe(ds, num_merges=40, sample_docs=len(texts))
    # sample covers every doc -> identical to a plain sequential train
    seq = bpe_train(word_counts_from_texts([t or "" for t in texts]), 40)
    got = list(zip(merges.column("left").to_pylist(), merges.column("right").to_pylist()))
    assert got == seq

    ranks = ranks_from_merges(merges)
    stats = bpe_token_stats(ds, merges).to_pandas().set_index("doc_id").sort_index()
    for i, t in enumerate(texts):
        words = (t or "").split()
        assert stats.loc[i, "n_tokens"] == len(words)
        assert stats.loc[i, "n_pieces"] == sum(
            len(bpe_encode_word(w, ranks)) for w in words
        )


def test_bpe_encode_positions(ray_session):
    tbl = pa.table(
        {
            "doc_id": pa.array([7, 8], type=pa.int64()),
            "text": pa.array(["aa bb aa", "cc"], type=pa.string()),
        }
    )
    ds = ray.data.from_arrow(tbl)
    merges = train_bpe(ds, num_merges=10, sample_docs=2)
    out = bpe_encode(ds, merges).to_pandas().sort_values(["doc_id", "pos"])
    ranks = ranks_from_merges(merges)
    for doc_id, text in [(7, "aa bb aa"), (8, "cc")]:
        want = [p for w in text.split() for p in bpe_encode_word(w, ranks)]
        sub = out[out.doc_id == doc_id]
        assert list(sub.piece) == want
        assert list(sub.pos) == list(range(1, len(want) + 1))


def test_token_stats_keep_cols(ray_session):
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "lang": pa.array(["en", "de"], type=pa.string()),
            "text": pa.array(["aa bb", "cc"], type=pa.string()),
        }
    )
    ds = ray.data.from_arrow(tbl)
    merges = train_bpe(ds, num_merges=5, sample_docs=2)
    out = bpe_token_stats(ds, merges, keep_cols=("lang",)).to_pandas()
    assert list(out.columns) == ["doc_id", "lang", "n_tokens", "n_pieces"]
    assert dict(zip(out.doc_id, out.lang)) == {1: "en", 2: "de"}


def test_bpe_piece_vocab(ray_session):
    from collections import Counter

    from dots_ocr_ray.pipelines.tokenizer import bpe_piece_vocab

    texts = ["aa bb aa cc", "bb aa", "cc cc dd"]
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    ds = ray.data.from_arrow(tbl).repartition(2)
    merges = train_bpe(ds, num_merges=10, sample_docs=3)
    out = bpe_piece_vocab(ds, merges, k=3).to_pylist()
    ranks = ranks_from_merges(merges)
    counts = Counter(p for t in texts for w in t.split() for p in bpe_encode_word(w, ranks))
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    assert [(r["piece"], r["cnt"]) for r in out] == want
    assert [r["rank"] for r in out] == list(range(len(out)))


def test_sample_is_layout_insensitive(ray_session):
    texts = [f"doc {i} word{i % 7} token{i % 3}" for i in range(300)]
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(300), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    m1 = train_bpe(ray.data.from_arrow(tbl).repartition(2), num_merges=30, sample_docs=64)
    m4 = train_bpe(ray.data.from_arrow(tbl).repartition(13), num_merges=30, sample_docs=64)
    assert m1.equals(m4)
