"""Tests for chunking, PII scrubbing and IVF ANN."""

import numpy as np
import pytest

import ray.data

from dots_ocr_ray.functions.scrub import scrub_documents, scrub_text
from dots_ocr_ray.pipelines.chunking import chunk_documents, chunk_text
from dots_ocr_ray.pipelines.similarity import brute_force_topk, ivf_topk

SF_DIR = "/root/testdata/sf0.001"


# --- chunking -------------------------------------------------------------
def test_chunk_text_offsets_and_overlap():
    text = " ".join(f"w{i}" for i in range(300))
    chunks = chunk_text(text, chunk_tokens=100, overlap_tokens=10)
    # starts stride by 90: 0, 90, 180, 270 (tail chunk holds the rest)
    assert len(chunks) == 4
    for s, e, c in chunks:
        assert text[s:e] == c  # offsets trace back exactly
    assert [c.split()[0] for _, _, c in chunks] == ["w0", "w90", "w180", "w270"]
    assert chunks[-1][2].split()[-1] == "w299"  # full coverage


def test_chunk_text_edges():
    assert chunk_text("", 100, 10) == []
    assert chunk_text("one two", 100, 10) == [(0, 7, "one two")]
    with pytest.raises(ValueError):
        chunk_text("x", 10, 10)


def test_chunk_documents(ray_session):
    docs = ray.data.read_parquet(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    chunks = chunk_documents(docs, chunk_tokens=32, overlap_tokens=4).to_pandas()
    assert (chunks.n_tokens <= 32).all()
    assert (chunks.groupby("doc_id").chunk_id.min() == 0).all()
    # every doc with text produced at least one chunk
    assert chunks.doc_id.nunique() == 500


# --- scrubbing ------------------------------------------------------------
def test_scrub_text():
    s, counts = scrub_text("mail a@b.com or visit https://x.org/page from 10.0.0.1")
    assert s == "mail <EMAIL> or visit <URL> from <IP>"
    assert counts == {"email": 1, "phone": 0, "ip": 1, "url": 1}


def test_scrub_documents(ray_session):
    rows = [
        {"doc_id": 0, "text": "contact me: foo.bar@example.com please"},
        {"doc_id": 1, "text": "nothing sensitive here"},
    ]
    out = scrub_documents(ray.data.from_items(rows)).to_pandas().sort_values("doc_id")
    assert out.iloc[0].text_scrubbed == "contact me: <EMAIL> please"
    assert out.iloc[0].n_email == 1
    assert out.iloc[1].text_scrubbed == "nothing sensitive here"


# --- IVF ANN --------------------------------------------------------------
def test_ivf_topk_recall(ray_session):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    ids = np.array(t.column("vec_id").to_pylist())
    mat = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    queries = mat[:4]
    ds = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    exact = brute_force_topk(ds, queries, k=10).to_pandas()
    approx = ivf_topk(ds, queries, k=10, n_cells=16, n_probe=6).to_pandas()
    recalls = []
    for qi in range(4):
        e = set(exact[exact.query_id == qi].vec_id)
        a = set(approx[approx.query_id == qi].vec_id)
        recalls.append(len(e & a) / 10)
    assert sum(recalls) / 4 >= 0.5
    # self-vector always found (it sits in the query's own best cell)
    for qi in range(4):
        assert int(ids[qi]) in set(approx[approx.query_id == qi].vec_id)


def test_ivf_deterministic(ray_session):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    mat = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    ds = ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])
    a = ivf_topk(ds, mat[:2], k=5).to_pandas()
    b = ivf_topk(ds, mat[:2], k=5).to_pandas()
    assert a.equals(b)


def test_ivf_recall_on_cluster_sorted_input(ray_session):
    """A corpus SORTED by cluster is the adversarial case for first-N
    k-means sampling (all training rows come from one cluster and the
    other cells collapse); the hash-sample trainer must stay unbiased
    and keep recall high for queries from every cluster."""
    rng = np.random.RandomState(3)
    centers = rng.standard_normal((4, 32)).astype(np.float32) * 10
    rows = []
    vid = 0
    for c in range(4):  # sorted: all of cluster 0 first, then 1, ...
        for _ in range(250):
            rows.append(
                {
                    "vec_id": vid,
                    "embedding": (centers[c] + rng.standard_normal(32).astype(np.float32)).tolist(),
                }
            )
            vid += 1
    ds = ray.data.from_items(rows)
    queries = np.stack([centers[c] for c in range(4)])
    exact = brute_force_topk(ds, queries, k=10).to_pandas()
    approx = ivf_topk(ds, queries, k=10, n_cells=8, n_probe=2, train_sample=128).to_pandas()
    for qi in range(4):
        e = set(exact[exact.query_id == qi].vec_id)
        a = set(approx[approx.query_id == qi].vec_id)
        assert len(e & a) / 10 >= 0.8, f"cluster {qi} recall degraded"


def test_pii_injection_scrubs_exactly():
    """The PII_MOD fixture spans must be consumed EXACTLY by the scrub
    regexes (email/ip/url, never phone) for every doc id in the rule."""
    from dots_ocr_ray.fixtures import PII_MOD, PII_REM, pii_text
    from dots_ocr_ray.functions.scrub import scrub_text

    for doc_id in range(PII_REM, 2000, PII_MOD):
        injected = pii_text(doc_id, "base words here")
        scrubbed, counts = scrub_text(injected)
        assert scrubbed == "base words here contact <EMAIL> or <IP> at <URL>", doc_id
        assert counts == {"email": 1, "phone": 0, "ip": 1, "url": 1}, doc_id
    # non-matching ids are untouched
    assert pii_text(PII_REM + 1, "x") == "x"


def test_pseudonymize_ids(ray_session):
    import hashlib

    import ray.data

    from dots_ocr_ray.functions.scrub import pseudonymize_ids

    rows = [{"event_id": i, "user_id": i % 3} for i in range(9)]
    out = pseudonymize_ids(
        ray.data.from_items(rows), id_col="user_id", salt="s1"
    ).take_all()
    by_user = {}
    for r in out:
        expect = hashlib.md5(f"s1:{r['event_id'] % 3}".encode()).hexdigest()[:16]
        assert r["user_id_pseud"] == expect
        by_user.setdefault(r["event_id"] % 3, set()).add(r["user_id_pseud"])
    # same id → same pseudonym; distinct ids stay distinct
    assert all(len(s) == 1 for s in by_user.values())
    assert len({next(iter(s)) for s in by_user.values()}) == 3
    # a different salt unlinks
    out2 = pseudonymize_ids(
        ray.data.from_items(rows), id_col="user_id", salt="s2"
    ).take_all()
    assert out2[0]["user_id_pseud"] != out[0]["user_id_pseud"]


def test_pseudonymize_ids_null_safe(ray_session):
    """A null in the id column must stay null and must NOT float-poison
    the other ids' hash inputs ('42.0' vs '42')."""
    import hashlib

    import pyarrow as pa

    import ray.data

    from dots_ocr_ray.functions.scrub import pseudonymize_ids

    ds = ray.data.from_arrow(
        pa.table({"user_id": pa.array([42, None, 7], type=pa.int64())})
    )
    out = {r["user_id"]: r["user_id_pseud"] for r in pseudonymize_ids(ds, salt="s").take_all()}
    assert out[42] == hashlib.md5(b"s:42").hexdigest()[:16]
    assert out[7] == hashlib.md5(b"s:7").hexdigest()[:16]
    assert out[None] is None


def test_luhn_and_card_scrub(ray_session):
    import pyarrow as pa

    import ray.data

    from dots_ocr_ray.functions.scrub import luhn_check_digit, luhn_valid, scrub_cards

    assert luhn_valid("4539578763621486")  # classic valid test number
    assert not luhn_valid("4539578763621487")
    d15 = "453957876362148"
    assert luhn_check_digit(d15) == "6"

    tbl = pa.table(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "pay 4539578763621486 now",  # valid → redacted
                "ref 4539578763621487 kept",  # invalid checksum → kept
                "short 123456 digits",  # not 16 digits → untouched
            ],
        }
    )
    out = scrub_cards(ray.data.from_arrow(tbl)).to_pandas().sort_values("doc_id")
    assert out["n_cc_valid"].tolist() == [1, 0, 0]
    assert out["n_cc_invalid"].tolist() == [0, 1, 0]
    assert out["text_scrubbed"].tolist()[0] == "pay <CC> now"
    assert out["text_scrubbed"].tolist()[1] == "ref 4539578763621487 kept"


# --- DP count release -----------------------------------------------------------

def test_dp_noise_deterministic_and_centered():
    from dots_ocr_ray.functions.scrub import dp_laplace_noise_micro

    assert dp_laplace_noise_micro("en") == dp_laplace_noise_micro("en")
    # over many keys the empirical mean of Laplace(1) noise ≈ 0
    vals = [dp_laplace_noise_micro(f"k{i}") for i in range(2000)]
    mean = sum(vals) / len(vals) / 1e6
    assert abs(mean) < 0.1
    # higher epsilon -> smaller noise magnitude
    tight = [abs(dp_laplace_noise_micro(f"k{i}", epsilon_micro=10_000_000)) for i in range(200)]
    loose = [abs(dp_laplace_noise_micro(f"k{i}", epsilon_micro=1_000_000)) for i in range(200)]
    assert sum(tight) < sum(loose)


def test_dp_release_counts(ray_session):
    import pyarrow as pa
    import ray.data

    from dots_ocr_ray.functions.scrub import dp_laplace_noise_micro, dp_release_counts

    t = pa.table({"lang": pa.array(["en"] * 7 + ["fr"] * 3, type=pa.string())})
    out = {r["key"]: r["noisy_count_micro"] for r in dp_release_counts(
        ray.data.from_arrow(t).repartition(4), key_col="lang"
    ).to_pylist()}
    assert out["en"] == 7_000_000 + dp_laplace_noise_micro("en")
    assert out["fr"] == 3_000_000 + dp_laplace_noise_micro("fr")
