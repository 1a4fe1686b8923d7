"""Inverted-index build + keyword search (pipelines/retrieval.py)."""

import shutil

import pyarrow as pa
import pytest

import ray.data

DOCS = [
    (0, "apple banana apple cherry"),
    (1, "banana cherry"),
    (2, "apple apple apple"),
    (3, "date cherry apple banana"),
    (4, ""),
    (5, "banana banana"),
]


def _brute(terms, mode):
    hits = {}
    for doc_id, text in DOCS:
        tf = {}
        for t in text.split():
            tf[t] = tf.get(t, 0) + 1
        matched = {t: tf[t] for t in terms if t in tf}
        need = len(terms) if mode == "and" else 1
        if len(matched) >= need:
            hits[doc_id] = (len(matched), sum(matched.values()))
    return hits


def _build(tmp_path, num_buckets=8):
    from dots_ocr_ray.pipelines.retrieval import build_inverted_index

    ds = ray.data.from_items([{"doc_id": i, "text": t} for i, t in DOCS])
    idx = str(tmp_path / "index")
    build_inverted_index(ds, idx, num_buckets=num_buckets)
    return idx


def _search_dict(idx, terms, mode):
    from dots_ocr_ray.pipelines.retrieval import keyword_search

    return {
        r["doc_id"]: (r["n_terms"], r["total_tf"])
        for r in keyword_search(idx, terms, mode=mode).take_all()
    }


def test_keyword_search_and_or_vs_brute_force(ray_session, tmp_path):
    idx = _build(tmp_path)
    for mode in ("and", "or"):
        for terms in (["apple"], ["apple", "banana"], ["apple", "banana", "cherry"]):
            assert _search_dict(idx, terms, mode) == _brute(terms, mode), (mode, terms)


def test_keyword_search_missing_term_and_duplicate_terms(ray_session, tmp_path):
    idx = _build(tmp_path)
    assert _search_dict(idx, ["apple", "zzz"], "and") == {}
    assert _search_dict(idx, ["apple", "zzz"], "or") == _brute(["apple"], "or")
    # duplicate probe terms collapse (AND of {apple} not {apple, apple})
    assert _search_dict(idx, ["apple", "apple"], "and") == _brute(["apple"], "and")


def test_keyword_search_reads_only_term_buckets(ray_session, tmp_path):
    """Deleting every bucket directory the probe terms do NOT hash
    into must not change the result — proof the read is bounded by the
    query's posting lists."""
    from dots_ocr_ray.pipelines.bucketed import _bucket_of

    idx = _build(tmp_path, num_buckets=8)
    terms = ["apple", "cherry"]
    want = set(_bucket_of(pa.array(terms), 8).tolist())
    assert len(want) < 8  # the test only proves something if buckets are pruned
    expected = _brute(terms, "and")
    for b in range(8):
        if b not in want:
            shutil.rmtree(tmp_path / "index" / f"__bucket={b}", ignore_errors=True)
    assert _search_dict(idx, terms, "and") == expected


def test_keyword_search_validation(ray_session, tmp_path):
    from dots_ocr_ray.pipelines.retrieval import keyword_search

    idx = _build(tmp_path)
    with pytest.raises(ValueError):
        keyword_search(idx, [])
    with pytest.raises(ValueError):
        keyword_search(idx, ["apple"], mode="xor")


def test_hybrid_rrf_fusion_rule(ray_session):
    """Fusion arithmetic on a constructed corpus where the lexical and
    semantic winners differ: RRF must prefer the doc ranked by BOTH."""
    import numpy as np

    import ray.data

    from dots_ocr_ray.pipelines.similarity import hybrid_rrf

    # doc 0 wins lexically, doc 2 wins semantically, doc 1 is second
    # on both → RRF puts 1 first
    docs = ray.data.from_items(
        [
            {"doc_id": 0, "text": "data data data data"},
            {"doc_id": 1, "text": "data data x"},
            {"doc_id": 2, "text": "y"},
        ]
    )
    vecs = {
        0: [0.0, 1.0],
        1: [0.8, 0.6],
        2: [1.0, 0.0],
    }
    embeds = ray.data.from_items(
        [{"vec_id": i, "embedding": v} for i, v in vecs.items()]
    )
    out = hybrid_rrf(
        docs,
        embeds,
        probes=["data"],
        query_vec=np.array([1.0, 0.0]),
        k=3,
        k_cand=2,
    ).to_pylist()
    # lexical ranks: 0→1, 1→2 (doc 2 has no probe); semantic: 2→1, 1→2
    c1, c2 = 10**9 // 61, 10**9 // 62
    expect = sorted(
        [(0, c1), (1, 2 * c2), (2, c1)], key=lambda kv: (-kv[1], kv[0])
    )
    assert [(r["doc_id"], r["rrf_q"]) for r in out] == expect
    assert [r["rank"] for r in out] == [1, 2, 3]


def test_ivf_index_roundtrip_equals_in_memory(ray_session, tmp_path):
    """Stored-index queries must be bit-equal to ivf_topk, and must
    read only the probed cells' files."""
    import os

    import numpy as np
    import pyarrow.parquet as pq

    import ray.data

    from dots_ocr_ray.pipelines.similarity import (
        ivf_build_index,
        ivf_query_index,
        ivf_topk,
    )

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    order = {v: i for i, v in enumerate(t.column("vec_id").to_pylist())}
    queries = np.array(
        [t.column("embedding")[order[v]].as_py() for v in sorted(order)[:4]],
        dtype=np.float32,
    )
    ds = ray.data.read_parquet(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])

    idx = str(tmp_path / "ivf")
    ivf_build_index(ds, idx, n_cells=8, train_sample=64)
    stored = ivf_query_index(idx, queries, k=5, n_probe=3)
    direct = ivf_topk(ds, queries, k=5, n_cells=8, n_probe=3, train_sample=64)
    assert stored.select(["query_id", "vec_id", "rank"]).equals(
        direct.select(["query_id", "vec_id", "rank"])
    )
    # the hive layout exists and holds every vector exactly once
    cells = [d for d in os.listdir(os.path.join(idx, "data")) if d.startswith("cell=")]
    assert 1 <= len(cells) <= 8
    total = sum(
        pq.read_table(os.path.join(idx, "data", c)).num_rows for c in cells
    )
    assert total == t.num_rows


# --- phrase search ------------------------------------------------------------

def _build_pos_index(tmp_path, texts):
    import pyarrow as pa
    import ray.data

    from dots_ocr_ray.pipelines.retrieval import build_positional_index

    t = pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
        }
    )
    out = str(tmp_path / "posindex")
    build_positional_index(ray.data.from_arrow(t).repartition(3), out, num_buckets=8)
    return out


def test_phrase_search_overlap_safe(ray_session, tmp_path):
    from dots_ocr_ray.pipelines.retrieval import phrase_search

    idx = _build_pos_index(
        tmp_path,
        [
            "alpha beta gamma",          # 1 match
            "alpha beta alpha beta",     # 2 matches (overlap-safe counting)
            "beta alpha",                # 0 (wrong order)
            "alpha gamma beta",          # 0 (not adjacent)
        ],
    )
    out = {r["doc_id"]: r["n_matches"] for r in phrase_search(idx, "alpha beta").to_pylist()}
    assert out == {0: 1, 1: 2}


def test_phrase_search_three_tokens(ray_session, tmp_path):
    from dots_ocr_ray.pipelines.retrieval import phrase_search

    idx = _build_pos_index(
        tmp_path,
        ["x a b c y", "a b x c", "a b c a b c"],
    )
    out = {r["doc_id"]: r["n_matches"] for r in phrase_search(idx, "a b c").to_pylist()}
    assert out == {0: 1, 2: 2}


def test_phrase_search_whitespace_runs(ray_session, tmp_path):
    # interior runs of 2+ whitespace chars must NOT leave position
    # gaps: "alpha  beta" (double space) is still an adjacent phrase,
    # matching string_split_regex('[ \t\n]+') ordinality
    from dots_ocr_ray.pipelines.retrieval import phrase_search

    idx = _build_pos_index(
        tmp_path,
        [
            "alpha  beta",               # double space inside the phrase
            "alpha \t\n beta",           # mixed whitespace run
            "  alpha beta  ",            # leading/trailing runs
            "alpha x  beta",             # still not adjacent
        ],
    )
    out = {r["doc_id"]: r["n_matches"] for r in phrase_search(idx, "alpha beta").to_pylist()}
    assert out == {0: 1, 1: 1, 2: 1}


def test_phrase_search_wide_ids_and_long_docs(ray_session, tmp_path):
    # doc ids far above 2^43 and documents longer than the old 2^20
    # position budget both work with the dense-id data-derived packing
    import ray.data

    from dots_ocr_ray.pipelines.retrieval import build_positional_index, phrase_search

    long_doc = "filler " * (1 << 21) + "alpha beta"
    t = pa.table(
        {
            "doc_id": pa.array([1 << 50, (1 << 50) + 7, 3], type=pa.int64()),
            "text": pa.array([long_doc, "alpha beta alpha beta", "beta alpha"], type=pa.string()),
        }
    )
    idx = str(tmp_path / "wideindex")
    build_positional_index(ray.data.from_arrow(t).repartition(2), idx, num_buckets=4)
    out = {r["doc_id"]: r["n_matches"] for r in phrase_search(idx, "alpha beta").to_pylist()}
    assert out == {1 << 50: 1, (1 << 50) + 7: 2}


def test_phrase_search_validates(ray_session, tmp_path):
    import pytest

    from dots_ocr_ray.pipelines.retrieval import phrase_search

    idx = _build_pos_index(tmp_path, ["a b"])
    with pytest.raises(ValueError):
        phrase_search(idx, "single")


# --- postings compression -------------------------------------------------------

def test_varint_len_boundaries():
    import numpy as np

    from dots_ocr_ray.pipelines.retrieval import varint_len

    vals = np.array([0, 127, 128, 16383, 16384, (1 << 21) - 1, 1 << 21, (1 << 63) - 1])
    assert varint_len(vals).tolist() == [1, 1, 2, 2, 3, 3, 4, 9]


def test_varint_oracle_ladder_matches_kernel():
    # pin the SQL oracle's CASE ladder (oracle_sql()['postings_compression'])
    # to varint_len at every 2^7k boundary so the certified mirror can
    # never silently disagree with the engine on wide gaps
    import re

    import duckdb
    import numpy as np

    import __ray_entry__ as entry
    from dots_ocr_ray.pipelines.retrieval import varint_len

    sql = entry.oracle_sql()["postings_compression"]
    case = re.search(r"(CASE WHEN v < .*? END)", sql).group(1)
    bounds = [1 << (7 * k) for k in range(1, 10)]
    vals = sorted({0, 1} | {b - 1 for b in bounds} | {b for b in bounds if b < (1 << 63)} | {(1 << 63) - 1})
    rows = ", ".join(f"({v})" for v in vals)
    got = duckdb.sql(f"SELECT {case} FROM (VALUES {rows}) t(v) ORDER BY v").fetchall()
    expect = varint_len(np.array(vals, dtype=np.int64)).tolist()
    assert [r[0] for r in got] == expect


def test_postings_compression_hand_computed(ray_session):
    import pyarrow as pa
    import ray.data

    from dots_ocr_ray.pipelines.retrieval import postings_compression_audit

    # token 'a' in docs 0 and 200: gaps are 0 (abs, 1 byte) and 200 (2 bytes)
    # token 'b' only in doc 200: abs 200 (2 bytes)
    t = pa.table(
        {
            "doc_id": pa.array([0, 200], type=pa.int64()),
            "text": pa.array(["a a", "a b"], type=pa.string()),
        }
    )
    out = postings_compression_audit(ray.data.from_arrow(t).repartition(2)).to_pylist()[0]
    assert out["n_postings"] == 3
    assert out["raw_bytes"] == 24
    assert out["varint_bytes"] == 1 + 2 + 2
