"""DSIR importance-resampling kernels and pipeline behavior."""

import numpy as np
import pyarrow as pa

import ray.data

from dots_ocr_ray.pipelines.curation import (
    dsir_resample,
    dsir_scores,
    gumbel_keys,
    hashed_ngram_features,
    log_likelihood_ratio,
    ngram_distribution,
)


def test_hashed_ngram_features():
    f = hashed_ngram_features("a b c", 1024)
    assert f.shape == (5,)  # 3 unigrams + 2 bigrams
    assert ((0 <= f) & (f < 1024)).all()
    # case-insensitive, whitespace-agnostic, deterministic
    assert (hashed_ngram_features("A  B\tC", 1024) == f).all()
    assert hashed_ngram_features("", 1024).size == 0
    assert hashed_ngram_features(None, 1024).size == 0
    assert hashed_ngram_features("solo", 1024).shape == (1,)


def test_llr_and_gumbel_determinism():
    raw = np.array([10, 10, 10, 10], dtype=np.int64)
    tgt = np.array([20, 0, 0, 0], dtype=np.int64)
    llr = log_likelihood_ratio(tgt, raw)
    assert llr[0] > 0 > llr[1]  # target-heavy feature up, absent down
    ids = np.arange(100, dtype=np.int64)
    g = gumbel_keys(ids)
    assert (g == gumbel_keys(ids)).all()
    assert np.isfinite(g).all()
    assert len(np.unique(g)) == 100


def test_dsir_prefers_target_like_docs(ray_session):
    # target vocabulary is disjoint from the background vocabulary —
    # docs written in target words must outscore background docs
    target_texts = ["quantum flux lattice " * 4] * 6
    noise_texts = [f"common filler words row {i}" for i in range(20)]
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(26), type=pa.int64()),
                "text": pa.array(target_texts[:3] + noise_texts + target_texts[3:]),
            }
        )
    )
    target = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(100, 106), type=pa.int64()),
                "text": pa.array(target_texts),
            }
        )
    )
    out = dsir_scores(docs, target).to_pandas().set_index("doc_id")
    target_ids = [0, 1, 2, 23, 24, 25]
    lo_target = min(out.loc[i, "logw"] for i in target_ids)
    hi_noise = max(
        out.loc[i, "logw"] for i in out.index if i not in target_ids
    )
    assert lo_target > hi_noise
    sample = dsir_resample(docs, target, 6).to_pandas()
    assert len(sample) == 6
    # importance-weighted sampling must pull in all target-like docs
    assert set(target_ids) <= set(sample.doc_id)


def test_ngram_distribution_matches_sequential(ray_session):
    texts = ["alpha beta gamma", "beta gamma", "", "alpha alpha"]
    ds = ray.data.from_arrow(pa.table({"text": pa.array(texts)}))
    dist = ngram_distribution(ds, dim=512)
    seq = np.zeros(512, dtype=np.int64)
    for t in texts:
        f = hashed_ngram_features(t, 512)
        if f.size:
            seq += np.bincount(f, minlength=512)
    assert (dist == seq).all()


def test_ngram_decontaminate_cut_and_flag(ray_session):
    from dots_ocr_ray.pipelines.curation import ngram_decontaminate

    leak = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(
                    [
                        f"clean words only here {1}",
                        f"prefix {leak} suffix tail",
                        leak,
                    ]
                ),
            }
        )
    )
    bench = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([99], pa.int64()), "text": pa.array([leak])})
    )
    cut = {r["doc_id"]: r for r in ngram_decontaminate(docs, bench, k=8).take_all()}
    assert cut[1]["text_decon"] == "clean words only here 1"
    assert cut[1]["n_dropped"] == 0
    # the leaked 8-gram is surgically removed, surroundings survive
    assert cut[2]["text_decon"] == "prefix suffix tail"
    assert cut[2]["n_dropped"] == 8
    # a doc that IS the benchmark erases entirely
    assert cut[3]["text_decon"] == ""
    assert cut[3]["n_kept"] == 0

    flag = {r["doc_id"]: r for r in ngram_decontaminate(docs, bench, k=8, mode="flag").take_all()}
    assert not flag[1]["contaminated"]
    assert flag[2]["contaminated"] and flag[2]["n_hits"] == 1
    assert flag[3]["contaminated"]


def test_ngram_decontaminate_short_docs_pass(ray_session):
    from dots_ocr_ray.pipelines.curation import ngram_decontaminate

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(["too short", ""]),
            }
        )
    )
    bench = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([9], pa.int64()), "text": pa.array(["too short"])})
    )
    # sub-k docs have no grams: never contaminated, pass through
    out = {r["doc_id"]: r for r in ngram_decontaminate(docs, bench, k=8).take_all()}
    assert out[1]["text_decon"] == "too short" and out[1]["n_dropped"] == 0
    assert out[2]["text_decon"] == ""


# --- preference pairs ------------------------------------------------------

def _pref_fixture(num_blocks: int = 1):
    import pyarrow as pa
    import ray.data

    rows = [
        # group (en, a): scores — d1 "abc" 1.0, d2 "a b" floor(2/3*1e6), d3 "" 0
        (1, "abc", "en", "a"),
        (2, "a b", "en", "a"),
        (3, "", "en", "a"),
        # group (en, b): singleton -> dropped
        (4, "xyz", "en", "b"),
        # group (fr, a): tie on score (both 'ab') -> chosen min id, rejected max id
        (5, "ab", "fr", "a"),
        (6, "ab", "fr", "a"),
    ]
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "text": pa.array([r[1] for r in rows], type=pa.string()),
            "lang": pa.array([r[2] for r in rows], type=pa.string()),
            "source": pa.array([r[3] for r in rows], type=pa.string()),
        }
    )
    return ray.data.from_arrow(t).repartition(num_blocks)


def test_preference_pairs_hand_computed():
    from dots_ocr_ray.pipelines.curation import preference_pairs

    out = {(r["lang"], r["source"]): r for r in preference_pairs(_pref_fixture()).to_pylist()}
    assert set(out) == {("en", "a"), ("fr", "a")}
    en = out[("en", "a")]
    assert en["chosen_id"] == 1 and en["rejected_id"] == 3
    assert en["margin_micro"] == 1_000_000
    fr = out[("fr", "a")]
    assert fr["chosen_id"] == 5 and fr["rejected_id"] == 6 and fr["margin_micro"] == 0


def test_preference_pairs_partition_invariant():
    from dots_ocr_ray.pipelines.curation import preference_pairs

    a = preference_pairs(_pref_fixture(1)).to_pylist()
    b = preference_pairs(_pref_fixture(5)).to_pylist()
    assert a == b


# --- max coverage ------------------------------------------------------------

def _cov_fixture(num_blocks=1):
    import pyarrow as pa
    import ray.data

    texts = {
        1: "a b c d e f",          # 5 bigrams
        2: "a b c d e f g h",      # superset of 1 (7 bigrams)
        3: "x y z w",              # 3 disjoint bigrams
        4: "a b",                  # 1 bigram, subset
    }
    t = pa.table(
        {
            "doc_id": pa.array(list(texts), type=pa.int64()),
            "text": pa.array(list(texts.values()), type=pa.string()),
        }
    )
    return ray.data.from_arrow(t).repartition(num_blocks)


def test_max_coverage_greedy_order(ray_session):
    from dots_ocr_ray.pipelines.curation import max_coverage_select

    out = max_coverage_select(_cov_fixture(), k=3).to_pylist()
    assert [r["doc_id"] for r in out] == [2, 3, 1]
    assert [r["new_tokens"] for r in out] == [7, 3, 0]
    assert out[-1]["covered_total"] == 10


def test_max_coverage_partition_invariant(ray_session):
    from dots_ocr_ray.pipelines.curation import max_coverage_select

    a = max_coverage_select(_cov_fixture(1), k=4).to_pylist()
    b = max_coverage_select(_cov_fixture(4), k=4).to_pylist()
    assert a == b
