"""Porter stemmer: published-example parity; stemmed-vocab rollup
correctness and partition invariance."""

from __future__ import annotations

import pyarrow as pa

import ray.data

from dots_ocr_ray.functions.stem import porter_stem


PUBLISHED = {
    # one representative per rule family from Porter (1980)
    "caresses": "caress", "ponies": "poni", "cats": "cat",
    "agreed": "agre", "motoring": "motor", "hopping": "hop",
    "filing": "file", "happy": "happi", "sky": "sky",
    "relational": "relat", "digitizer": "digit", "vietnamization": "vietnam",
    "triplicate": "triplic", "hopeful": "hope", "goodness": "good",
    "adjustment": "adjust", "adoption": "adopt", "effective": "effect",
    "probate": "probat", "rate": "rate", "controll": "control", "roll": "roll",
}


def test_porter_published_examples():
    for w, want in PUBLISHED.items():
        assert porter_stem(w) == want, (w, porter_stem(w), want)


def test_porter_short_words_unchanged():
    for w in ("a", "is", "by", ""):
        assert porter_stem(w) == w


def test_stemmed_vocab_collapses_forms():
    from dots_ocr_ray.pipelines.text_analysis import stemmed_vocab

    t = pa.table(
        {
            "text": pa.array(
                [
                    "joining joined joins join!",
                    "Joined JOINS hash hash",
                    "",
                    None,
                ],
                type=pa.string(),
            )
        }
    )
    out = stemmed_vocab(ray.data.from_arrow(t), top_n=5).to_pylist()
    rows = {r["stem"]: r for r in out}
    assert rows["join"]["total"] == 6
    assert rows["join"]["n_forms"] == 4  # joining joined joins join
    assert rows["hash"]["total"] == 2 and rows["hash"]["n_forms"] == 1


def test_stemmed_vocab_partition_invariant():
    from dots_ocr_ray.pipelines.text_analysis import stemmed_vocab

    texts = [f"running runs ran runner word{i}" for i in range(40)]
    t = pa.table({"text": pa.array(texts, type=pa.string())})
    a = stemmed_vocab(ray.data.from_arrow(t).repartition(1), top_n=10).to_pylist()
    b = stemmed_vocab(ray.data.from_arrow(t).repartition(8), top_n=10).to_pylist()
    assert a == b
