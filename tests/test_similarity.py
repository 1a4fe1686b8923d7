"""Tests for ANN search (brute-force exact + LSH approximate)."""

import numpy as np
import pytest

import ray.data

from dots_ocr_ray.pipelines.similarity import brute_force_topk, lsh_topk

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    return ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])


@pytest.fixture(scope="module")
def all_vecs():
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    ids = np.array(t.column("vec_id").to_pylist())
    mat = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    return ids, mat


def _numpy_topk(ids, mat, queries, k):
    qn = queries / np.linalg.norm(queries, axis=1, keepdims=True)
    mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = qn @ mn.T
    out = {}
    for qi in range(len(queries)):
        order = sorted(range(len(ids)), key=lambda i: (-sims[qi, i], ids[i]))[:k]
        out[qi] = [int(ids[i]) for i in order]
    return out


def test_brute_force_matches_numpy(ray_session, emb_ds, all_vecs):
    ids, mat = all_vecs
    queries = mat[:3]
    got = brute_force_topk(emb_ds, queries, k=5).to_pandas()
    want = _numpy_topk(ids, mat, queries, 5)
    for qi in range(3):
        got_ids = list(got[got.query_id == qi].sort_values("rank").vec_id)
        assert got_ids == want[qi], f"query {qi}"
    # self-similarity: each query IS a corpus vector → rank 1 score ≈ 1
    top1 = got[got["rank"] == 1]
    assert np.allclose(top1.score, 1.0, atol=1e-5)


def test_lsh_topk_high_recall(ray_session, emb_ds, all_vecs):
    ids, mat = all_vecs
    queries = mat[:4]
    exact = _numpy_topk(ids, mat, queries, 10)
    approx = lsh_topk(emb_ds, queries, k=10, n_planes=6).to_pandas()
    recalls = []
    for qi in range(4):
        got_ids = set(approx[approx.query_id == qi].vec_id)
        recalls.append(len(got_ids & set(exact[qi])) / 10)
    assert sum(recalls) / len(recalls) >= 0.5  # multiprobe recall floor
    # the query's own vector must always survive (identical bucket)
    for qi in range(4):
        assert exact[qi][0] in set(approx[approx.query_id == qi].vec_id)


def test_quantize_embeddings_roundtrip_and_topk_overlap(ray_session):
    """int8 quantization: reconstruction error bounded by half a step
    per dim; dequantized brute-force top-k overlaps the float top-k."""
    import numpy as np
    import ray.data

    from dots_ocr_ray.pipelines.similarity import (
        brute_force_topk,
        dequantized_topk,
        embedding_scale_stats,
        quantize_embeddings,
    )
    from dots_ocr_ray.util import vec_matrix

    SF = "/root/testdata/sf0.001"
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet", columns=["vec_id", "embedding"])
    mins, maxs = embedding_scale_stats(ds)
    assert (maxs >= mins).all()

    quantized, codebook = quantize_embeddings(ds)
    q_df = quantized.to_pandas().set_index("vec_id")
    raw = ds.take_all()
    step = codebook["scale"]
    for row in raw[:20]:
        orig = np.asarray(row["embedding"], dtype=np.float32)
        code = np.frombuffer(q_df.loc[row["vec_id"], "q"], dtype=np.uint8).astype(np.float32)
        recon = code * codebook["scale"] + codebook["mins"]
        assert (np.abs(recon - orig) <= step * 0.51 + 1e-6).all()

    # top-k overlap vs the exact float path
    queries = [r for r in raw if r["vec_id"] < 4]
    qmat = np.stack([np.asarray(r["embedding"], dtype=np.float32) for r in queries])
    qids = [r["vec_id"] for r in queries]
    int8_tbl = dequantized_topk(quantized, codebook, qmat, qids, k=5)
    float_tbl = brute_force_topk(ds, qmat, k=5)
    def topset(tbl):
        out = {}
        for q, v in zip(tbl.column("query_id").to_pylist(), tbl.column("vec_id").to_pylist()):
            out.setdefault(q, set()).add(v)
        return out
    a, b = topset(int8_tbl), topset(float_tbl)
    assert set(a) == set(b)
    for q in a:
        assert len(a[q] & b[q]) >= 4  # >= 80% overlap @5
        # the self-match (rank 1) must survive quantization
        assert q in a[q]


def test_semdedup_flags_threshold_and_blocks():
    """Greedy min-id-survivor rule; blocked path must equal one-shot."""
    import numpy as np

    from dots_ocr_ray.pipelines.similarity import semdedup_flags

    # two tight groups + one singleton, shuffled id order
    rng = np.random.RandomState(0)
    d = 16
    a = rng.standard_normal(d)
    b = rng.standard_normal(d)
    group_a = np.stack([a + 0.01 * rng.standard_normal(d) for _ in range(4)])
    group_b = np.stack([b + 0.01 * rng.standard_normal(d) for _ in range(3)])
    lone = rng.standard_normal((1, d))
    mat = np.concatenate([group_a, group_b, lone]).astype(np.float32)
    ids = np.array([30, 10, 20, 40, 55, 5, 15, 99], dtype=np.int64)
    dup = semdedup_flags(ids, mat, threshold=0.95)
    # survivor = min id per group: 10 (group a), 5 (group b), 99 alone
    kept_ids = sorted(ids[~dup])
    assert kept_ids == [5, 10, 99]
    # block=1 and block=3 exercise the inter/intra block split paths
    for blk in (1, 2, 3, 100):
        assert (semdedup_flags(ids, mat, 0.95, block=blk) == dup).all()
    # at an unreachable threshold nothing is pruned
    assert not semdedup_flags(ids, mat, threshold=1.0000001).any()
    assert semdedup_flags(np.empty(0, np.int64), np.empty((0, d)), 0.9).size == 0


def test_semdedup_prune_matches_sequential(ray_session):
    import numpy as np
    import pyarrow.parquet as pq

    import ray.data

    from dots_ocr_ray.fixtures import inject_near_dup_embeddings
    from dots_ocr_ray.pipelines.similarity import semdedup_prune
    from dots_ocr_ray.util import vec_matrix
    import pyarrow as pa

    sf = "/root/testdata/sf0.001"
    ds = ray.data.read_parquet(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])

    def _inject(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
        mat = inject_near_dup_embeddings(ids, vec_matrix(batch.column("embedding"), dtype=np.float32))
        return pa.table(
            {
                "vec_id": batch.column("vec_id"),
                "embedding": pa.array(list(mat), type=pa.list_(pa.float32())),
            }
        )

    out = semdedup_prune(
        ds.map_batches(_inject, batch_format="pyarrow"), threshold=0.95
    ).to_pandas()
    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id"])
    n = t.num_rows
    assert len(out) == n
    injected = set(
        int(i) for i in t.column("vec_id").to_pylist() if int(i) % 9 == 4
    )
    pruned = set(out[~out.kept].vec_id)
    assert pruned and pruned <= injected
    # exactly one survivor per injected group
    groups = {}
    for i in injected:
        groups.setdefault((i // 9) % 3, []).append(i)
    for g, members in groups.items():
        kept_members = [i for i in members if i not in pruned]
        assert kept_members == [min(members)]


def test_label_centroid_stats_exact_and_partition_invariant(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data

    from dots_ocr_ray.pipelines.similarity import label_centroid_stats

    rng = np.random.RandomState(11)
    vecs = rng.randn(50, 4).astype(np.float32)
    labels = (np.arange(50) % 3).astype(np.int64)
    rows = [
        {"embedding": vecs[i].tolist(), "label": int(labels[i])} for i in range(50)
    ]
    t1 = label_centroid_stats(ray.data.from_items(rows))
    t2 = label_centroid_stats(ray.data.from_items(rows).repartition(9))
    assert t1.equals(t2)  # integer partials fold layout-insensitively

    # reference: half-away rounding then integer sums
    q = np.sign(vecs.astype(np.float64) * (1 << 20)) * np.floor(
        np.abs(vecs.astype(np.float64) * (1 << 20)) + 0.5
    )
    got = {(r["label"], r["dim"]): (r["sum_q"], r["n"]) for r in t1.to_pylist()}
    for lab in range(3):
        mask = labels == lab
        for d in range(4):
            assert got[(lab, d)] == (int(q[mask, d].sum()), int(mask.sum()))


def test_pq_encode_partition_invariant_and_recall(ray_session, emb_ds, all_vecs):
    from dots_ocr_ray.pipelines.similarity import (
        _normalize_rows,
        hash_sample_matrix,
        pq_encode,
        pq_encode_matrix,
        pq_topk,
        pq_train_codebooks,
    )

    ids, mat = all_vecs
    sample = hash_sample_matrix(emb_ds, n=128)
    books = pq_train_codebooks(sample, m=16, n_codes=32, iters=5)
    assert books.shape == (16, 32, mat.shape[1] // 16)

    # encode is a pure per-row function: any partitioning yields the
    # same (vec_id -> code) mapping, and it matches the numpy kernel
    enc1 = {
        r["vec_id"]: r["code"]
        for r in pq_encode(emb_ds, books).iter_rows()
    }
    enc2 = {
        r["vec_id"]: r["code"]
        for r in pq_encode(emb_ds.repartition(7), books).iter_rows()
    }
    assert enc1 == enc2
    ref = pq_encode_matrix(_normalize_rows(mat), books)
    order = {int(v): i for i, v in enumerate(ids)}
    for vid, code in enc1.items():
        assert np.frombuffer(code, dtype=np.uint8).tolist() == ref[order[vid]].tolist()

    # ADC top-k recalls most of the exact top-k on the fixture corpus
    queries = mat[np.argsort(ids)[:4]]
    exact = _numpy_topk(ids, mat, queries, 10)
    got = pq_topk(pq_encode(emb_ds, books), books, queries, k=10)
    by_q = {}
    for r in got.to_pylist():
        by_q.setdefault(r["query_id"], []).append(r["vec_id"])
    recalls = [
        len(set(by_q[qi]) & set(exact[qi])) / 10 for qi in range(len(queries))
    ]
    assert sum(recalls) / len(recalls) >= 0.5, recalls
    # the query vector itself is always its own nearest neighbor
    for qi in range(len(queries)):
        assert by_q[qi][0] == exact[qi][0]


def test_pq_rejects_indivisible_subspaces():
    from dots_ocr_ray.pipelines.similarity import pq_train_codebooks

    with pytest.raises(ValueError):
        pq_train_codebooks(np.zeros((10, 10)), m=3)


def test_silhouette_terms_and_cluster_means(ray_session):
    import numpy as np
    import pyarrow as pa

    import ray.data

    from dots_ocr_ray.pipelines.similarity import (
        silhouette_by_cluster,
        silhouette_terms_matrix,
    )

    # two orthogonal tight clusters: every point sits exactly on its
    # centroid → a = 0, b = 1 → s = 1 (1e6 micro)
    cents = np.array([[1.0, 0.0], [0.0, 1.0]], dtype=np.float64)
    mat = np.array([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]], dtype=np.float32)
    cid, s = silhouette_terms_matrix(mat, cents)
    assert cid.tolist() == [0, 0, 1]
    assert s.tolist() == [1_000_000, 1_000_000, 1_000_000]

    # end-to-end over the fixture embeddings: sane bounds, full cover
    ds = ray.data.read_parquet(
        f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    out = silhouette_by_cluster(ds).to_pandas()
    assert out["n"].sum() == ds.count()
    assert (out["mean_s_micro"] > -1_000_000).all()
    assert (out["mean_s_micro"] <= 1_000_000).all()


# --- k-center greedy ---------------------------------------------------------

def test_kcenter_picks_farthest_cluster_reps():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from dots_ocr_ray.pipelines.similarity import kcenter_greedy

    # three tight clusters at distance >> intra spread; k=3 must pick
    # one point from each, starting at min id
    rng_pts = []
    ids = []
    for ci, base in enumerate([0.0, 10.0, 20.0]):
        for j in range(5):
            ids.append(ci * 100 + j)
            rng_pts.append([base + 0.01 * j, 0.0])
    t = pa.table(
        {
            "vec_id": pa.array(ids, type=pa.int64()),
            "embedding": pa.array(rng_pts, type=pa.list_(pa.float32())),
        }
    )
    out = kcenter_greedy(ray.data.from_arrow(t).repartition(4), k=3).to_pylist()
    assert out[0]["vec_id"] == 0 and out[0]["dist_micro"] == 0
    picked_clusters = {r["vec_id"] // 100 for r in out}
    assert picked_clusters == {0, 1, 2}
    # covering radius shrinks (or stays) as ranks increase
    assert out[1]["dist_micro"] >= out[2]["dist_micro"]


def test_kcenter_partition_invariance():
    import pyarrow as pa
    import ray.data

    from dots_ocr_ray.pipelines.similarity import kcenter_greedy

    import numpy as np

    rng = np.random.RandomState(7)
    mat = rng.rand(60, 8).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(60), type=pa.int64()),
            "embedding": pa.array(mat.tolist(), type=pa.list_(pa.float32())),
        }
    )
    a = kcenter_greedy(ray.data.from_arrow(t).repartition(1), k=5).to_pylist()
    b = kcenter_greedy(ray.data.from_arrow(t).repartition(7), k=5).to_pylist()
    assert a == b


# --- kNN outliers ------------------------------------------------------------

def test_knn_outliers_finds_planted_outlier():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from dots_ocr_ray.pipelines.similarity import knn_outliers

    rng = np.random.RandomState(3)
    mat = rng.rand(100, 4).astype(np.float32) * 0.1
    mat[17] = [50.0, 50.0, 50.0, 50.0]  # far away
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(100), type=pa.int64()),
            "embedding": pa.array(mat.tolist(), type=pa.list_(pa.float32())),
        }
    )
    out = knn_outliers(ray.data.from_arrow(t).repartition(3), k=4, sample_n=32, top_n=5).to_pylist()
    assert out[0]["vec_id"] == 17
    assert out[0]["score_micro"] > 10 * out[1]["score_micro"]


def test_knn_outliers_partition_invariance():
    import numpy as np
    import pyarrow as pa
    import ray.data

    from dots_ocr_ray.pipelines.similarity import knn_outliers

    rng = np.random.RandomState(11)
    mat = rng.rand(80, 6).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(80), type=pa.int64()),
            "embedding": pa.array(mat.tolist(), type=pa.list_(pa.float32())),
        }
    )
    a = knn_outliers(ray.data.from_arrow(t).repartition(1), k=3, sample_n=16, top_n=10).to_pylist()
    b = knn_outliers(ray.data.from_arrow(t).repartition(9), k=3, sample_n=16, top_n=10).to_pylist()
    assert a == b


# --- HAC ----------------------------------------------------------------------

def test_hac_dendrogram_kernel():
    import numpy as np

    from dots_ocr_ray.pipelines.similarity import hac_merge_dendrogram

    # 4 points on a line at 0, 1, 10, 12 (micro units)
    pts = np.array([[0], [1], [10], [12]], dtype=np.int64)
    merges = hac_merge_dendrogram(pts, linkage="complete")
    assert merges[0] == (0, 0, 1, 1)          # closest pair first
    assert merges[1] == (1, 2, 3, 4)          # then 10,12
    # last merge: complete linkage distance = max pair = (0 vs 12)^2
    assert merges[2] == (2, 0, 2, 144)
    # single linkage final distance = min cross pair = (1 vs 10)^2
    single = hac_merge_dendrogram(pts, linkage="single")
    assert single[2][3] == 81


def test_hac_over_kmeans_partition_invariant(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data

    from dots_ocr_ray.pipelines.similarity import hac_over_kmeans

    rng = np.random.RandomState(4)
    mat = rng.rand(120, 6).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(120), type=pa.int64()),
            "embedding": pa.array(mat.tolist(), type=pa.list_(pa.float32())),
        }
    )
    a = hac_over_kmeans(ray.data.from_arrow(t).repartition(1), n_clusters=5).to_pylist()
    b = hac_over_kmeans(ray.data.from_arrow(t).repartition(8), n_clusters=5).to_pylist()
    assert a == b
    assert len(a) == 4  # n_clusters - 1 merges
