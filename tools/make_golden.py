"""Golden-parquet oracle generator for the non-SQL-expressible queries.

For each query whose semantics DuckDB cannot mirror (LSH dedup
families, approximate ANN, heuristic lang-ID / fingerprinting, the
word-midpoint page merge), this module computes the expected output
with a SINGLE-PROCESS sequential implementation that shares the pure
kernels (`dots_ocr_ray.functions.hashing`, `kernel.textops`,
`pipelines.similarity.train_kmeans`, `pipelines.document.
split_words_midpoints`) with the Ray pipelines — the same
shared-pure-kernel oracle pattern the extraction byte-identity gate
uses (see `dots_ocr_ray/oracle.py`).

The goldens are checked in under `golden/<sf>/<query>.parquet` and the
driver's DuckDB oracle reads them verbatim:

    SELECT * FROM read_parquet('/root/repo/golden/sf0.01/<query>.parquet')

Regenerate with:

    python tools/make_golden.py /root/testdata/sf0.01 golden/sf0.01

`tests/test_golden.py` recomputes these sequentially at sf0.001 on
every pytest run and compares them to the live Ray pipelines, so the
checked-in files cannot silently drift from the engine.
"""

from __future__ import annotations

import os
import sys
from collections import defaultdict

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dots_ocr_ray.functions.hashing import (  # noqa: E402
    MinHasher,
    char_ngram_hashes,
    hamming64,
    jaccard_hashes,
    shingles,
    simhash64,
    simhash_block_keys,
)
from dots_ocr_ray.kernel.textops import detect_lang, fingerprint  # noqa: E402
from dots_ocr_ray.pipelines.dedup import HOT_BUCKET_CAP, _root_map_from_pairs  # noqa: E402
from dots_ocr_ray.pipelines.document import split_words_midpoints  # noqa: E402
from dots_ocr_ray.pipelines.similarity import (  # noqa: E402
    assign_clusters_matrix,
    knuth_hash32,
    silhouette_terms_matrix,
    train_kmeans,
)


def _normalize_rows(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def _clusters_table(ids: list[int], pairs: list[tuple[int, int]]) -> pa.Table:
    roots = _root_map_from_pairs(pairs)
    ids = sorted(ids)
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "cluster_id": pa.array([roots.get(i, i) for i in ids], type=pa.int64()),
        }
    )


def _read_docs(sf_dir: str) -> tuple[list[int], list[str]]:
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return t.column("doc_id").to_pylist(), t.column("text").to_pylist()


def _bucket_candidates(buckets: dict, cap: int = HOT_BUCKET_CAP) -> set[tuple[int, int]]:
    """Mirror of the pipelines' bucket→pair rule: all pairs on small
    buckets, star-link vs the min doc on hot ones."""
    cand: set[tuple[int, int]] = set()
    for members in buckets.values():
        docs = sorted(set(members))
        if len(docs) < 2:
            continue
        if len(docs) <= cap:
            for i in range(len(docs)):
                for j in range(i + 1, len(docs)):
                    cand.add((docs[i], docs[j]))
        else:
            cand.update((docs[0], j) for j in docs[1:])
    return cand


def _minhash_pairs_seq(
    ids: list[int],
    texts: list[str],
    *,
    threshold: float,
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 5,
) -> list[tuple[int, int]]:
    hasher = MinHasher(num_perm=num_perm)
    sigs = {
        i: hasher.signature(shingles(t or "", shingle_k)).astype(np.uint64)
        for i, t in zip(ids, texts)
    }
    buckets: dict = defaultdict(list)
    for i in ids:
        for b, key in enumerate(MinHasher.band_keys(sigs[i], bands)):
            buckets[(b, key)].append(i)
    cand = _bucket_candidates(buckets)
    return sorted(
        (a, b) for a, b in cand if MinHasher.jaccard_estimate(sigs[a], sigs[b]) >= threshold
    )


def golden_dedup_minhash(sf_dir: str) -> pa.Table:
    ids, texts = _read_docs(sf_dir)
    return _clusters_table(ids, _minhash_pairs_seq(ids, texts, threshold=0.8))


def golden_dedup_best_survivors(sf_dir: str) -> pa.Table:
    """Sequential mirror of pipelines.dedup.best_survivor_per_cluster
    over the minhash clusters: per cluster keep the max-n_chars member
    (tie → min doc_id)."""
    ids, texts = _read_docs(sf_dir)
    roots = _root_map_from_pairs(_minhash_pairs_seq(ids, texts, threshold=0.8))
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])
    nchars = dict(zip(t.column("doc_id").to_pylist(), t.column("n_chars").to_pylist()))
    best: dict[int, tuple[int, int]] = {}  # cluster -> (-quality, id)
    for i in ids:
        c = roots.get(i, i)
        cand = (-nchars[i], i)
        if c not in best or cand < best[c]:
            best[c] = cand
    rows = sorted((i, c) for c, (_negq, i) in best.items())
    return pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "cluster_id": pa.array([r[1] for r in rows], type=pa.int64()),
            "n_chars": pa.array([nchars[r[0]] for r in rows], type=pa.int64()),
        }
    )


def golden_containment_pairs(sf_dir: str) -> pa.Table:
    """Sequential mirror of pipelines.dedup.containment_pairs over the
    CONTAIN_MOD injection: loose MinHash candidates (threshold 0.5),
    exact char-3-gram containment ≥ 0.9 in integer micro-units."""
    from dots_ocr_ray.fixtures import containment_text
    from dots_ocr_ray.functions.hashing import containment_micro

    ids, texts = _read_docs(sf_dir)
    texts = [containment_text(i, t or "") for i, t in zip(ids, texts)]
    text_of = dict(zip(ids, texts))
    pairs = _minhash_pairs_seq(ids, texts, threshold=0.5)
    grams = {i: char_ngram_hashes(text_of[i] or "", 3) for i in {x for p in pairs for x in p}}
    out_a, out_b, out_c = [], [], []
    for a, b in pairs:
        cm = containment_micro(grams[a], grams[b])
        if cm >= 900_000:
            out_a.append(a)
            out_b.append(b)
            out_c.append(cm)
    return pa.table(
        {
            "a": pa.array(out_a, type=pa.int64()),
            "b": pa.array(out_b, type=pa.int64()),
            "cont_micro": pa.array(out_c, type=pa.int64()),
        }
    )


def golden_incremental_minhash(sf_dir: str, *, threshold: float = 0.8) -> pa.Table:
    """Sequential mirror of pipelines.dedup.minhash_dedup_incremental
    over the fixture rule: docs with doc_id%7==4 form one planted
    near-dup family (shared base, tail varies by doc_id%3); archive =
    doc_id%3==0 (signatures only), new batch = the rest.  Incremental
    semantics: a new id near-matching ANY archive id drops; within-new
    clusters keep their min id; archive×archive pairs are ignored."""
    ids, texts = _read_docs(sf_dir)
    base = " ".join(f"w{k:02d}" for k in range(60))
    texts = [
        f"{base} tail {i % 3}" if i % 7 == 4 else t for i, t in zip(ids, texts)
    ]
    pairs = _minhash_pairs_seq(ids, texts, threshold=threshold)
    new_ids = {i for i in ids if i % 3 != 0}
    drop: set[int] = set()
    new_pairs = []
    for a, b in pairs:
        na, nb = a in new_ids, b in new_ids
        if na and nb:
            new_pairs.append((a, b))
        elif na:
            drop.add(a)
        elif nb:
            drop.add(b)
    roots = _root_map_from_pairs(new_pairs)
    drop.update(i for i, r in roots.items() if i != r)
    keep = [(i, t) for i, t in zip(ids, texts) if i in new_ids and i not in drop]
    return pa.table(
        {
            "doc_id": pa.array([i for i, _ in keep], type=pa.int64()),
            "text": pa.array([t for _, t in keep], type=pa.string()),
        }
    )


def golden_dedup_ngram(sf_dir: str, *, threshold: float = 0.9, n: int = 3) -> pa.Table:
    ids, texts = _read_docs(sf_dir)
    by_id = dict(zip(ids, texts))
    cand = _minhash_pairs_seq(ids, texts, threshold=max(0.3, threshold - 0.3))
    grams = {i: char_ngram_hashes(by_id[i] or "", n) for pair in cand for i in pair}
    verified = [(a, b) for a, b in cand if jaccard_hashes(grams[a], grams[b]) >= threshold]
    return _clusters_table(ids, verified)


def golden_dedup_simhash(sf_dir: str, *, max_hamming: int = 3, n_blocks: int = 4) -> pa.Table:
    ids, texts = _read_docs(sf_dir)
    hs = {i: simhash64(t or "") for i, t in zip(ids, texts)}
    buckets: dict = defaultdict(list)
    for i in ids:
        for b, v in simhash_block_keys(hs[i], n_blocks):
            buckets[(b, v)].append(i)
    pairs = sorted(
        (a, b) for a, b in _bucket_candidates(buckets) if hamming64(hs[a], hs[b]) <= max_hamming
    )
    return _clusters_table(ids, pairs)


def golden_dedup_embedding(
    sf_dir: str, *, threshold: float = 0.95, n_planes: int = 12, seed: int = 42
) -> pa.Table:
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_pylist()
    vecs = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    planes = np.random.RandomState(seed).standard_normal((vecs.shape[1], n_planes)).astype(np.float32)
    keys = ((vecs @ planes) > 0) @ (1 << np.arange(n_planes, dtype=np.int64))
    unit = _normalize_rows(vecs)
    row_of = {i: r for r, i in enumerate(ids)}
    buckets: dict = defaultdict(list)
    for i, k in zip(ids, keys):
        buckets[int(k)].append(i)
    pairs = []
    for members in buckets.values():
        docs = sorted(members)
        if len(docs) < 2:
            continue
        mat = unit[[row_of[i] for i in docs]]
        if len(docs) <= HOT_BUCKET_CAP:
            sims = mat @ mat.T
            for i in range(len(docs)):
                for j in range(i + 1, len(docs)):
                    if sims[i, j] >= threshold:
                        pairs.append((docs[i], docs[j]))
        else:
            sims = mat @ mat[0]
            for j in range(1, len(docs)):
                if sims[j] >= threshold:
                    pairs.append((docs[0], docs[j]))
    return _clusters_table(ids, sorted(set(pairs)))


def _read_embeddings(sf_dir: str):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = np.asarray(t.column("vec_id").to_pylist(), dtype=np.int64)
    vecs = np.array(t.column("embedding").to_pylist(), dtype=np.float32)
    order = np.argsort(ids)
    queries = vecs[order[:4]]  # vec_ids sorted ascending, first 4 (mirrors the query)
    return ids, vecs, queries


def _topk_table(per_query_candidates: dict[int, list[tuple[float, int]]], k: int) -> pa.Table:
    """Global top-k with the engine's tie-break: by (-score, vec_id)."""
    q_out, v_out, r_out = [], [], []
    for qi in sorted(per_query_candidates):
        ranked = sorted(per_query_candidates[qi], key=lambda t: (-t[0], t[1]))[:k]
        for rank, (_score, vid) in enumerate(ranked, 1):
            q_out.append(qi)
            v_out.append(vid)
            r_out.append(rank)
    return pa.table(
        {
            "query_id": pa.array(q_out, type=pa.int32()),
            "vec_id": pa.array(v_out, type=pa.int64()),
            "rank": pa.array(r_out, type=pa.int32()),
        }
    )


def golden_ann_lsh_topk(sf_dir: str, *, k: int = 5, n_planes: int = 8, seed: int = 42) -> pa.Table:
    ids, vecs, queries = _read_embeddings(sf_dir)
    qn = _normalize_rows(queries)
    planes = np.random.RandomState(seed).standard_normal((qn.shape[1], n_planes)).astype(np.float32)
    powers = 1 << np.arange(n_planes, dtype=np.int64)
    probe = {int(key) for key in ((qn @ planes) > 0) @ powers}
    for key in list(probe):
        for bit in range(n_planes):
            probe.add(int(key) ^ (1 << bit))
    keys = ((vecs @ planes) > 0) @ powers
    mask = np.fromiter((int(key) in probe for key in keys), dtype=bool, count=len(keys))
    unit = _normalize_rows(vecs[mask])
    sub_ids = ids[mask]
    sims = qn @ unit.T
    cands = {
        qi: [(float(sims[qi, ci]), int(sub_ids[ci])) for ci in range(sims.shape[1])]
        for qi in range(len(qn))
    }
    return _topk_table(cands, k)


def golden_ann_ivf_topk(
    sf_dir: str,
    *,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    train_sample: int = 512,
    kmeans_iters: int = 5,
) -> pa.Table:
    ids, vecs, queries = _read_embeddings(sf_dir)
    h = knuth_hash32(ids)
    order = np.lexsort((ids, h))[:train_sample]
    sample = _normalize_rows(vecs[order])
    centroids = train_kmeans(sample, n_cells, kmeans_iters)
    qn = _normalize_rows(queries)
    probe_cells = np.argsort(-(qn @ centroids.T), axis=1)[:, :n_probe]
    unit = _normalize_rows(vecs)
    cells = np.argmax(unit @ centroids.T, axis=1)
    cands: dict[int, list[tuple[float, int]]] = {}
    for qi in range(len(qn)):
        m = np.isin(cells, probe_cells[qi])
        sims = unit[m] @ qn[qi]
        sub_ids = ids[m]
        cands[qi] = [(float(s), int(i)) for s, i in zip(sims, sub_ids)]
    return _topk_table(cands, k)


def golden_ann_pq_topk(
    sf_dir: str,
    *,
    k: int = 5,
    m: int = 8,
    n_codes: int = 16,
    train_sample: int = 256,
    iters: int = 5,
) -> pa.Table:
    """Sequential PQ mirror: shares only the pure codebook trainer
    (like golden_ann_ivf_topk shares train_kmeans); encoding and ADC
    scoring are independent per-row Python loops."""
    from dots_ocr_ray.pipelines.similarity import pq_train_codebooks

    ids, vecs, queries = _read_embeddings(sf_dir)
    h = knuth_hash32(ids)
    order = np.lexsort((ids, h))[:train_sample]
    sample = _normalize_rows(vecs[order])
    books = pq_train_codebooks(sample, m, n_codes, iters)
    unit = _normalize_rows(vecs).astype(np.float64)
    dsub = unit.shape[1] // m
    codes = np.empty((len(unit), m), dtype=np.int64)
    for r in range(len(unit)):
        row = unit[r]
        for j in range(m):
            sub = row[j * dsub : (j + 1) * dsub]
            d2 = np.round(
                (sub * sub).sum() - 2.0 * (books[j] @ sub) + (books[j] * books[j]).sum(axis=1),
                9,
            )
            codes[r, j] = int(np.argmin(d2))
    qn = _normalize_rows(queries).astype(np.float64)
    cands: dict[int, list[tuple[float, int]]] = {}
    for qi in range(len(qn)):
        lut = np.empty((m, n_codes), dtype=np.float64)
        for j in range(m):
            lut[j] = books[j] @ qn[qi, j * dsub : (j + 1) * dsub]
        rows = []
        for r in range(len(unit)):
            s = 0.0
            for j in range(m):
                s += lut[j, codes[r, j]]
            rows.append((float(np.round(s, 9)), int(ids[r])))
        cands[qi] = rows
    return _topk_table(cands, k)


def golden_lang_id_confusion(sf_dir: str) -> pa.Table:
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text", "lang"])
    counts: dict = defaultdict(int)
    for lang, text in zip(t.column("lang").to_pylist(), t.column("text").to_pylist()):
        counts[(lang, detect_lang(text or ""))] += 1
    keys = sorted(counts)
    return pa.table(
        {
            "lang": pa.array([k[0] for k in keys], type=pa.string()),
            "lang_pred": pa.array([k[1] for k in keys], type=pa.string()),
            "n": pa.array([counts[k] for k in keys], type=pa.int64()),
        }
    )


def golden_fingerprint_dups(sf_dir: str) -> pa.Table:
    ids, texts = _read_docs(sf_dir)
    groups: dict = defaultdict(list)
    for i, t in zip(ids, texts):
        groups[fingerprint(t or "")].append(i)
    fps = sorted(fp for fp, members in groups.items() if len(members) > 1)
    return pa.table(
        {
            "fingerprint": pa.array(fps, type=pa.uint64()),
            "n_docs": pa.array([len(groups[fp]) for fp in fps], type=pa.int64()),
            "min_doc_id": pa.array([min(groups[fp]) for fp in fps], type=pa.int64()),
        }
    )


def golden_merge_docs(sf_dir: str, *, n_pages: int = 2) -> pa.Table:
    ids, texts = _read_docs(sf_dir)
    rows = sorted(zip(ids, texts))
    merged = ["\n\n".join(split_words_midpoints(t, n_pages)) for _, t in rows]
    return pa.table(
        {
            "doc_url": pa.array([f"doc-{i:06d}" for i, _ in rows], type=pa.string()),
            "n_pages": pa.array([n_pages] * len(rows), type=pa.int32()),
            "extracted_text": pa.array(merged, type=pa.string()),
            "extracted_text_nohf": pa.array(merged, type=pa.string()),
        }
    )


def golden_approx_distinct_users(sf_dir: str) -> pa.Table:
    from dots_ocr_ray.functions.sketches import HyperLogLog

    t = pq.read_table(f"{sf_dir}/events.parquet", columns=["user_id"])
    hll = HyperLogLog(12)
    for v in t.column("user_id").to_pylist():
        hll.add(str(v))
    return pa.table({"approx_distinct": pa.array([int(round(hll.count()))], type=pa.int64())})


def golden_reservoir_doc_sample(sf_dir: str, *, k: int = 32) -> pa.Table:
    from dots_ocr_ray.functions.sketches import Reservoir

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    r = Reservoir(k)
    for v in t.column("doc_id").to_pylist():
        r.add(str(v))
    return pa.table({"key": pa.array(sorted(r.sample()), type=pa.string())})


def golden_describe_docs(sf_dir: str) -> pa.Table:
    """Sequential A2 describe oracle: extract each fixture page (with
    the IMAGE_MOD img rule) through the shared kernel, then apply the
    reference's picture-describe rule row-at-a-time — caption empty
    Picture spans with the deterministic fake captioner and re-serialize
    the markdown (ocr_task.py:150-203 analog)."""
    from dots_ocr_ray.fixtures import page_row_from_document
    from dots_ocr_ray.kernel.extract import extract_page
    from dots_ocr_ray.kernel.serialize import spans_to_markdown
    from dots_ocr_ray.stages.describe import fake_caption

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang"])
    rows = sorted(
        zip(
            t.column("doc_id").to_pylist(),
            t.column("text").to_pylist(),
            t.column("lang").to_pylist(),
        )
    )
    ids, texts, n_spans, statuses = [], [], [], []
    for d, tx, lg in rows:
        page = page_row_from_document(d, tx, lg, with_images=True)
        r = extract_page(page["url"], page["html"], page["text"])
        spans = [dict(s) for s in r["spans"]]
        changed = False
        for i, s in enumerate(spans):
            if s["category"] == "Picture" and not (s.get("text") or ""):
                s["text"] = fake_caption(f"{page['url']}#{i}")
                changed = True
        text_out = spans_to_markdown(spans, no_page_hf=False) if changed else r["extracted_text"]
        ids.append(d)
        texts.append(text_out)
        n_spans.append(len(spans))
        statuses.append(r["status"])
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "extracted_text": pa.array(texts, type=pa.string()),
            "n_spans": pa.array(n_spans, type=pa.int32()),
            "status": pa.array(statuses, type=pa.string()),
        }
    )


def golden_chars_quantiles_approx(sf_dir: str) -> pa.Table:
    """Sequential log-histogram quantiles — same deterministic sketch
    as the pipeline, single process."""
    from dots_ocr_ray.functions.sketches import LogHistogram

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    h = LogHistogram()
    h.add_array(np.array([len(x or "") for x in t.column("text").to_pylist()], dtype=np.int64))
    qs = (0.5, 0.9, 0.99)
    return pa.table(
        {
            "q": pa.array(list(qs), type=pa.float64()),
            "value": pa.array([h.quantile(q) for q in qs], type=pa.float64()),
        }
    )


def golden_kmeans_clusters(
    sf_dir: str, *, n_clusters: int = 8, train_sample: int = 512, kmeans_iters: int = 5
) -> pa.Table:
    """Sequential mirror of pipelines.similarity.kmeans_assign: same
    bottom-k hash sample, same train_kmeans, same float64 rounded-sim
    assignment kernel (assign_clusters_matrix)."""
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    mat = np.asarray(t.column("embedding").to_pylist(), dtype=np.float32)
    h = knuth_hash32(ids)
    order = np.lexsort((ids, h))[:train_sample]
    sample = _normalize_rows(mat[order].astype(np.float32))
    centroids = train_kmeans(sample, n_clusters, kmeans_iters)
    cid, sim = assign_clusters_matrix(mat, centroids)
    return pa.table(
        {
            "vec_id": pa.array(ids, type=pa.int64()),
            "cluster_id": pa.array(cid, type=pa.int32()),
            "sim": pa.array(sim, type=pa.float64()),
        }
    )



def golden_silhouette_clusters(
    sf_dir: str, *, n_clusters: int = 8, train_sample: int = 512, kmeans_iters: int = 5
) -> pa.Table:
    """Sequential mirror of pipelines.similarity.silhouette_by_cluster:
    same bottom-k hash sample, same train_kmeans, same quantized
    per-point kernel (silhouette_terms_matrix), integer floor-div
    per-cluster mean."""
    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    mat = np.asarray(t.column("embedding").to_pylist(), dtype=np.float32)
    h = knuth_hash32(ids)
    order = np.lexsort((ids, h))[:train_sample]
    sample = _normalize_rows(mat[order].astype(np.float32))
    centroids = train_kmeans(sample, n_clusters, kmeans_iters)
    cid, s_micro = silhouette_terms_matrix(mat, centroids)
    out_cid, out_n, out_mean = [], [], []
    for c in sorted(set(cid.tolist())):
        m = cid == c
        out_cid.append(int(c))
        out_n.append(int(m.sum()))
        out_mean.append(int(s_micro[m].sum()) // int(m.sum()))
    return pa.table(
        {
            "cluster_id": pa.array(out_cid, type=pa.int32()),
            "n": pa.array(out_n, type=pa.int64()),
            "mean_s_micro": pa.array(out_mean, type=pa.int64()),
        }
    )



def golden_semdedup_docs(
    sf_dir: str,
    *,
    n_clusters: int = 8,
    threshold: float = 0.95,
    train_sample: int = 512,
    kmeans_iters: int = 5,
) -> pa.Table:
    """Sequential mirror of pipelines.similarity.semdedup_prune over
    the near-dup-injected embeddings: same injection, same sample /
    train / assign kernels, same shared semdedup_flags rule."""
    from dots_ocr_ray.fixtures import inject_near_dup_embeddings
    from dots_ocr_ray.pipelines.similarity import semdedup_flags

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    mat = np.asarray(t.column("embedding").to_pylist(), dtype=np.float32)
    mat = inject_near_dup_embeddings(ids, mat)
    h = knuth_hash32(ids)
    order = np.lexsort((ids, h))[:train_sample]
    centroids = train_kmeans(_normalize_rows(mat[order].astype(np.float32)), n_clusters, kmeans_iters)
    cid, _ = assign_clusters_matrix(mat, centroids)
    kept = np.ones(len(ids), dtype=bool)
    for c in np.unique(cid):
        m = cid == c
        kept[m] = ~semdedup_flags(ids[m], mat[m], threshold)
    return pa.table(
        {
            "vec_id": pa.array(ids, type=pa.int64()),
            "cluster_id": pa.array(cid, type=pa.int32()),
            "kept": pa.array(kept, type=pa.bool_()),
        }
    )


def _dsir_scores_seq(sf_dir: str, *, dim: int = 8192, alpha: float = 1.0):
    """Sequential DSIR scores over the documents table; target domain
    = rows with doc_id % 11 == 2.  Shares the pure kernels
    (hashed_ngram_features, log_likelihood_ratio, gumbel_keys) with
    pipelines/curation.py."""
    from dots_ocr_ray.pipelines.curation import (
        hashed_ngram_features,
        log_likelihood_ratio,
    )
    from dots_ocr_ray.util import round_half_away

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    ids = t.column("doc_id").to_numpy(zero_copy_only=False).astype(np.int64)
    texts = t.column("text").to_pylist()
    feats = [hashed_ngram_features(x, dim) for x in texts]
    raw = np.zeros(dim, dtype=np.int64)
    tgt = np.zeros(dim, dtype=np.int64)
    for i, f in zip(ids, feats):
        if f.size:
            c = np.bincount(f, minlength=dim)
            raw += c
            if i % 11 == 2:
                tgt += c
    llr = log_likelihood_ratio(tgt, raw, alpha=alpha)
    logw = np.array(
        [float(llr[f].sum()) if f.size else 0.0 for f in feats], dtype=np.float64
    )
    return ids, round_half_away(logw, 6), np.array([f.size for f in feats], np.int64)


def golden_dsir_scores(sf_dir: str) -> pa.Table:
    ids, logw, nf = _dsir_scores_seq(sf_dir)
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "logw": pa.array(logw, type=pa.float64()),
            "n_feats": pa.array(nf, type=pa.int64()),
        }
    )


def golden_dsir_sample(sf_dir: str, *, k: int = 64) -> pa.Table:
    from dots_ocr_ray.pipelines.curation import gumbel_keys
    from dots_ocr_ray.util import round_half_away

    ids, logw, _ = _dsir_scores_seq(sf_dir)
    key = round_half_away(logw + gumbel_keys(ids), 6)
    order = np.lexsort((ids, -key))[:k]
    return pa.table(
        {
            "doc_id": pa.array(ids[order], type=pa.int64()),
            "logw": pa.array(logw[order], type=pa.float64()),
            "key": pa.array(key[order], type=pa.float64()),
        }
    )


def golden_host_pagerank(sf_dir: str, *, num_iters: int = 5, damping: float = 0.85) -> pa.Table:
    """Sequential PageRank over the deterministic host-edge fixture
    (pipelines/graph.py:host_edges_from_documents); rank reported
    relative to uniform (mean 1.0)."""
    from dots_ocr_ray.pipelines.graph import EDGE_MULTIPLIERS, N_HOSTS

    ids = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"]).column(
        "doc_id"
    ).to_numpy()
    src = np.concatenate([ids % N_HOSTS for _ in EDGE_MULTIPLIERS])
    dst = np.concatenate([(ids * m) % N_HOSTS for m in EDGE_MULTIPLIERS])
    hosts = np.unique(np.concatenate([src, dst]))
    n = len(hosts)
    out_deg = np.bincount(np.searchsorted(hosts, src), minlength=n)
    ranks = np.full(n, 1.0 / n)
    for _ in range(num_iters):
        share = np.where(out_deg > 0, ranks / np.maximum(out_deg, 1), 0.0)
        contrib = np.zeros(n)
        np.add.at(contrib, np.searchsorted(hosts, dst), share[np.searchsorted(hosts, src)])
        dangling = ranks[out_deg == 0].sum()
        ranks = (1.0 - damping) / n + damping * (contrib + dangling / n)
    return pa.table(
        {
            "host": pa.array(hosts.astype(np.int64), type=pa.int64()),
            "rank_rel": pa.array(ranks * n, type=pa.float64()),
        }
    )


def golden_host_trustrank(
    sf_dir: str, *, num_iters: int = 5, damping: float = 0.85, seeds=(1, 2)
) -> pa.Table:
    """Sequential personalized PageRank (TrustRank) over the host-edge
    fixture: teleport + dangling mass only to the seed hosts."""
    from dots_ocr_ray.pipelines.graph import EDGE_MULTIPLIERS, N_HOSTS

    ids = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"]).column(
        "doc_id"
    ).to_numpy()
    src = np.concatenate([ids % N_HOSTS for _ in EDGE_MULTIPLIERS])
    dst = np.concatenate([(ids * m) % N_HOSTS for m in EDGE_MULTIPLIERS])
    hosts = np.unique(np.concatenate([src, dst]))
    n = len(hosts)
    out_deg = np.bincount(np.searchsorted(hosts, src), minlength=n)
    seed_mask = np.isin(hosts, np.asarray(sorted(set(seeds)), dtype=np.int64))
    tele = seed_mask.astype(np.float64) / seed_mask.sum()
    ranks = tele.copy()
    for _ in range(num_iters):
        share = np.where(out_deg > 0, ranks / np.maximum(out_deg, 1), 0.0)
        contrib = np.zeros(n)
        np.add.at(contrib, np.searchsorted(hosts, dst), share[np.searchsorted(hosts, src)])
        dangling = ranks[out_deg == 0].sum()
        ranks = (1.0 - damping) * tele + damping * (contrib + dangling * tele)
    return pa.table(
        {
            "host": pa.array(hosts.astype(np.int64), type=pa.int64()),
            "trust_rel": pa.array(np.round(ranks * n, 9), type=pa.float64()),
        }
    )


def golden_host_kcore(sf_dir: str, *, k: int = 4) -> pa.Table:
    """Independent sequential k-core peel (set-based, no numpy sharing
    with the engine's bincount path) over the host-edge fixture."""
    from collections import defaultdict

    from dots_ocr_ray.pipelines.graph import EDGE_MULTIPLIERS, N_HOSTS

    ids = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"]).column(
        "doc_id"
    ).to_numpy()
    adj: dict = defaultdict(set)
    for m in EDGE_MULTIPLIERS:
        for a, b in zip(ids % N_HOSTS, (ids * m) % N_HOSTS):
            if a != b:
                adj[int(a)].add(int(b))
                adj[int(b)].add(int(a))
    alive = set(adj)
    changed = True
    while changed:
        changed = False
        for n in list(alive):
            if n in alive and len(adj[n] & alive) < k:
                alive.discard(n)
                changed = True
    return pa.table({"host": pa.array(sorted(alive), type=pa.int64())})


def golden_cms_token_counts(sf_dir: str) -> pa.Table:
    """Sequential Count-Min build over the same whitespace tokens and
    probes as the driver query — integer adds commute, so this matrix
    is bit-equal to any partitioned fold of the same corpus."""
    from dots_ocr_ray.functions.sketches import CountMin

    probes = ["the", "data", "join", "hash", "zqxzqx"]
    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    cm = CountMin(2048, 4)
    for t in tbl.column("text").to_pylist():
        toks = (t or "").split()
        if toks:
            u, c = np.unique(np.asarray(toks, dtype=object), return_counts=True)
            cm.add_many(list(u), c.astype(np.int64))
    return pa.table(
        {
            "term": pa.array(probes, type=pa.string()),
            "est_count": pa.array(cm.estimate_many(probes), type=pa.int64()),
        }
    )


def golden_corpus_overlap(sf_dir: str, *, p: int = 14) -> pa.Table:
    """Sequential HLL overlap (customer keys vs event user ids) —
    register folds are max-commutative, so this is bit-equal to the
    distributed build."""
    from dots_ocr_ray.functions.sketches import HyperLogLog

    def _hll(path: str, col: str) -> HyperLogLog:
        h = HyperLogLog(p)
        vals = pq.read_table(path, columns=[col]).column(col).to_pylist()
        h.add_many([str(v) for v in vals if v is not None])
        return h

    ha = _hll(f"{sf_dir}/customer.parquet", "c_custkey")
    hb = _hll(f"{sf_dir}/events.parquet", "user_id")
    na, nb = ha.count(), hb.count()
    nu = ha.merge(hb).count()
    ni = max(0.0, na + nb - nu)
    return pa.table(
        {
            "n_left": pa.array([int(round(na))], type=pa.int64()),
            "n_right": pa.array([int(round(nb))], type=pa.int64()),
            "n_union": pa.array([int(round(nu))], type=pa.int64()),
            "n_intersect": pa.array([int(round(ni))], type=pa.int64()),
            "jaccard": pa.array([round(ni / (nu if nu > 0 else 1.0), 6)], type=pa.float64()),
        }
    )


def golden_host_hits(sf_dir: str, *, num_iters: int = 5) -> pa.Table:
    """Sequential HITS over the deterministic host-edge fixture
    (pipelines/graph.py:host_edges_from_documents); hub/authority
    L1-normalized, reported relative to uniform (mean 1.0)."""
    from dots_ocr_ray.pipelines.graph import EDGE_MULTIPLIERS, N_HOSTS

    ids = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"]).column(
        "doc_id"
    ).to_numpy()
    src = np.concatenate([ids % N_HOSTS for _ in EDGE_MULTIPLIERS])
    dst = np.concatenate([(ids * m) % N_HOSTS for m in EDGE_MULTIPLIERS])
    hosts = np.unique(np.concatenate([src, dst]))
    n = len(hosts)
    s_idx = np.searchsorted(hosts, src)
    d_idx = np.searchsorted(hosts, dst)
    hub = np.full(n, 1.0 / n)
    for _ in range(num_iters):
        auth = np.zeros(n)
        np.add.at(auth, d_idx, hub[s_idx])
        t = auth.sum()
        auth = auth / t if t > 0 else auth
        hub = np.zeros(n)
        np.add.at(hub, s_idx, auth[d_idx])
        t = hub.sum()
        hub = hub / t if t > 0 else hub
    return pa.table(
        {
            "host": pa.array(hosts.astype(np.int64), type=pa.int64()),
            "hub_rel": pa.array(np.round(hub * n, 9), type=pa.float64()),
            "auth_rel": pa.array(np.round(auth * n, 9), type=pa.float64()),
        }
    )


def golden_cdc_dedup_stats(sf_dir: str) -> pa.Table:
    """Sequential CDC dedup summary sharing the pure kernel/cdc.py
    chunker with the Ray pipeline (pipelines/cdc.py)."""
    from collections import Counter

    from dots_ocr_ray.kernel.cdc import cdc_chunks

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    counts: Counter = Counter()
    sizes: dict[str, int] = {}
    for t in tbl.column("text").to_pylist():
        for _s, length, h in cdc_chunks((t or "").encode("utf-8", errors="replace")):
            counts[h] += 1
            sizes[h] = length
    total_chunks = sum(counts.values())
    distinct_chunks = len(counts)
    total_bytes = sum(counts[h] * sizes[h] for h in counts)
    distinct_bytes = sum(sizes.values())
    return pa.table(
        {
            "total_chunks": pa.array([total_chunks], type=pa.int64()),
            "distinct_chunks": pa.array([distinct_chunks], type=pa.int64()),
            "total_bytes": pa.array([total_bytes], type=pa.int64()),
            "distinct_bytes": pa.array([distinct_bytes], type=pa.int64()),
            "dedup_ratio": pa.array(
                [round(distinct_bytes / total_bytes, 6) if total_bytes else 0.0],
                type=pa.float64(),
            ),
        }
    )


def golden_compression_ratios(sf_dir: str) -> pa.Table:
    """Sequential compression-ratio reference (shares the zlib kernel,
    kernel/textops.compression_ratio, with the Ray pipeline)."""
    from dots_ocr_ray.kernel.textops import compression_ratio

    tbl = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    texts = tbl.column("text").to_pylist()
    return pa.table(
        {
            "doc_id": tbl.column("doc_id").cast(pa.int64()),
            "comp_ratio": pa.array([compression_ratio(t) for t in texts], type=pa.float64()),
            "n_bytes": pa.array(
                [len((t or "").encode("utf-8", errors="replace")) for t in texts],
                type=pa.int64(),
            ),
        }
    )


def golden_host_templates(sf_dir: str) -> pa.Table:
    """Sequential per-host template rollup sharing the pure
    structure_fingerprint kernel with the Ray pipeline
    (pipelines/text_analysis.py:host_template_stats)."""
    from collections import Counter

    from dots_ocr_ray.fixtures import page_row_from_document
    from dots_ocr_ray.kernel.html_parse import structure_fingerprint

    tbl = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text", "lang"]
    )
    per_host: dict[str, Counter] = defaultdict(Counter)
    for d, t, lg in zip(
        tbl.column("doc_id").to_pylist(),
        tbl.column("text").to_pylist(),
        tbl.column("lang").to_pylist(),
    ):
        row = page_row_from_document(d, t, lg)
        host = row["url"].split("://", 1)[1].split("/", 1)[0]
        fp = structure_fingerprint(row["html"].decode("utf-8", errors="replace"))
        per_host[host][fp] += 1
    hosts = sorted(per_host)
    tops = [
        min((fp for fp, c in per_host[h].items() if c == max(per_host[h].values())))
        for h in hosts
    ]
    return pa.table(
        {
            "host": pa.array(hosts, type=pa.string()),
            "n_pages": pa.array(
                [sum(per_host[h].values()) for h in hosts], type=pa.int64()
            ),
            "n_templates": pa.array([len(per_host[h]) for h in hosts], type=pa.int64()),
            "top_template": pa.array(tops, type=pa.string()),
            "top_template_n": pa.array(
                [max(per_host[h].values()) for h in hosts], type=pa.int64()
            ),
        }
    )


def golden_table_profile(sf_dir: str) -> pa.Table:
    """Sequential column profile over documents: stats via pandas/numpy
    (independent of the pipeline's partial-merge code), distinct via the
    shared HyperLogLog kernel on the same Arrow string-cast keys."""
    import pyarrow.compute as pc

    from dots_ocr_ray.functions.sketches import HyperLogLog
    from dots_ocr_ray.pipelines.profile import PROFILE_HLL_P

    tbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
    rows = []
    for name in tbl.column_names:
        col = tbl.column(name).combine_chunks()
        t = col.type
        valid = col.drop_null()
        hll = HyperLogLog(PROFILE_HLL_P)
        if len(valid):
            hll.add_many(pc.cast(valid, pa.string()).to_pylist())
        numeric = pa.types.is_integer(t) or pa.types.is_floating(t)
        stringy = pa.types.is_string(t) or pa.types.is_large_string(t)
        row = {
            "column": name,
            "dtype": str(t),
            "n_rows": len(col),
            "n_nulls": col.null_count,
            "approx_distinct": int(round(hll.count())) if len(valid) else 0,
            "vmin": 0.0,
            "vmax": 0.0,
            "vmean": 0.0,
            "len_min": 0,
            "len_max": 0,
            "len_mean": 0.0,
        }
        if numeric and len(valid):
            v = valid.to_numpy(zero_copy_only=False).astype(np.float64)
            row.update(vmin=float(v.min()), vmax=float(v.max()), vmean=round(float(v.sum()) / len(v), 4))
        if stringy and len(valid):
            lens = np.array([len(x) for x in valid.to_pylist()], dtype=np.int64)
            row.update(len_min=int(lens.min()), len_max=int(lens.max()), len_mean=round(int(lens.sum()) / len(lens), 4))
        rows.append(row)
    from dots_ocr_ray.pipelines.profile import _OUT_SCHEMA

    return pa.Table.from_pylist(rows, schema=_OUT_SCHEMA)


def _bpe_merges_seq(sf_dir: str, *, num_merges: int = 160, sample_docs: int = 256):
    """Sequential mirror of pipelines.tokenizer.train_bpe: same
    (knuth_hash32, id) bottom-k sample, same shared bpe_train kernel."""
    from dots_ocr_ray.kernel.bpe import bpe_train, word_counts_from_texts

    ids, texts = _read_docs(sf_dir)
    ids_np = np.array(ids, dtype=np.int64)
    h = knuth_hash32(ids_np)
    order = np.lexsort((ids_np, h))[:sample_docs]
    sample_texts = [texts[i] or "" for i in order]
    return bpe_train(word_counts_from_texts(sample_texts), num_merges)


def golden_bpe_merges(sf_dir: str) -> pa.Table:
    merges = _bpe_merges_seq(sf_dir)
    return pa.table(
        {
            "rank": pa.array(np.arange(len(merges)), type=pa.int64()),
            "left": pa.array([m[0] for m in merges], type=pa.string()),
            "right": pa.array([m[1] for m in merges], type=pa.string()),
        }
    )


def golden_bpe_token_stats(sf_dir: str) -> pa.Table:
    """Sequential per-doc BPE fertility stats: train on the shared
    sample, then encode every document word-by-word (memoized) with
    the shared greedy kernel."""
    from dots_ocr_ray.kernel.bpe import bpe_encode_word

    merges = _bpe_merges_seq(sf_dir)
    ranks = {m: i for i, m in enumerate(merges)}
    ids, texts = _read_docs(sf_dir)
    memo: dict[str, int] = {}
    n_tokens, n_pieces = [], []
    for t in texts:
        words = (t or "").split()
        total = 0
        for w in words:
            p = memo.get(w)
            if p is None:
                p = len(bpe_encode_word(w, ranks))
                memo[w] = p
            total += p
        n_tokens.append(len(words))
        n_pieces.append(total)
    return pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "n_tokens": pa.array(n_tokens, type=pa.int64()),
            "n_pieces": pa.array(n_pieces, type=pa.int64()),
        }
    )


def golden_bpe_piece_vocab(sf_dir: str, *, k: int = 64) -> pa.Table:
    """Sequential top-k piece frequencies: word-by-word greedy encode
    (memoized) with a plain Counter, (cnt desc, piece asc) order."""
    from collections import Counter

    from dots_ocr_ray.kernel.bpe import bpe_encode_word

    merges = _bpe_merges_seq(sf_dir)
    ranks = {m: i for i, m in enumerate(merges)}
    ids, texts = _read_docs(sf_dir)
    memo: dict[str, list[str]] = {}
    counts: Counter = Counter()
    for t in texts:
        for w in (t or "").split():
            p = memo.get(w)
            if p is None:
                p = bpe_encode_word(w, ranks)
                memo[w] = p
            counts.update(p)
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return pa.table(
        {
            "rank": pa.array(np.arange(len(top)), type=pa.int64()),
            "piece": pa.array([p for p, _ in top], type=pa.string()),
            "cnt": pa.array([c for _, c in top], type=pa.int64()),
        }
    )


def _logreg_seq(sf_dir: str, *, iters: int = 8, l2: float = 1e-3):
    """Sequential mirror of pipelines.classifier training: the SAME
    featurize kernel on the full table, the SAME per-row int64-
    quantized Newton partials (one 'block' = the whole corpus —
    integer sums are layout-insensitive, so this equals the
    distributed fold exactly), the SAME driver solve."""
    from dots_ocr_ray.pipelines.classifier import (
        _quantized_newton_row,
        logreg_features,
        logreg_update,
        quality_label,
    )

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    X = logreg_features(t.column("text"))
    y = quality_label(t.column("text"))
    w = np.zeros(X.shape[1], dtype=np.float64)
    for _ in range(iters):
        gsum, hsum, n = _quantized_newton_row(X, y, w)
        w = logreg_update(w, gsum, hsum, n, l2=l2)
    return t, X, y, w


def golden_logreg_weights(sf_dir: str) -> pa.Table:
    _, _, _, w = _logreg_seq(sf_dir)
    from dots_ocr_ray.util import round_half_away

    return pa.table(
        {
            "idx": pa.array(np.arange(len(w)), type=pa.int64()),
            "weight": pa.array(round_half_away(w, 6), type=pa.float64()),
        }
    )


def golden_logreg_scores(sf_dir: str) -> pa.Table:
    from dots_ocr_ray.util import round_half_away

    t, X, y, w = _logreg_seq(sf_dir)
    z = np.round(X @ w, 9)
    score = round_half_away(1.0 / (1.0 + np.exp(-z)), 6)
    return pa.table(
        {
            "doc_id": t.column("doc_id").cast(pa.int64()),
            "score": pa.array(score, type=pa.float64()),
            "pred": pa.array(score >= 0.5, type=pa.bool_()),
            "label": pa.array(y >= 0.5, type=pa.bool_()),
        }
    )


def _pca_seq(sf_dir: str, *, k: int = 8):
    """Sequential mirror of pipelines.pca: the SAME per-row int64
    moment quantization over the full matrix (integer totals are
    layout-insensitive), the SAME pca_fit driver solve."""
    from dots_ocr_ray.pipelines.pca import _moment_partials, pca_fit
    from dots_ocr_ray.util import vec_matrix

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    mat = vec_matrix(t.column("embedding"), dtype=np.float64)
    ssum, m2, n = _moment_partials(mat)
    mean, comps, evals = pca_fit(ssum, m2, n, k=k)
    return t, mat, mean, comps, evals


def golden_pca_components(sf_dir: str) -> pa.Table:
    from dots_ocr_ray.util import round_half_away

    _, _, _, comps, evals = _pca_seq(sf_dir)
    k, d = comps.shape
    return pa.table(
        {
            "component": pa.array(np.repeat(np.arange(k), d), type=pa.int64()),
            "idx": pa.array(np.tile(np.arange(d), k), type=pa.int64()),
            "loading": pa.array(
                round_half_away(comps.ravel(), 6), type=pa.float64()
            ),
            "eigval": pa.array(
                round_half_away(np.repeat(evals, d), 6), type=pa.float64()
            ),
        }
    )


def golden_pca_projected(sf_dir: str) -> pa.Table:
    from dots_ocr_ray.pipelines.pca import _VEC_SCALE
    from dots_ocr_ray.util import round_half_away

    t, mat, mean, comps, _ = _pca_seq(sf_dir)
    q = np.floor(np.abs(mat) * _VEC_SCALE + 0.5) * np.sign(mat) / _VEC_SCALE
    scores = (q - mean) @ comps.T
    out = {"vec_id": t.column("vec_id").cast(pa.int64())}
    for j in range(comps.shape[0]):
        out[f"c{j}"] = pa.array(round_half_away(scores[:, j], 6), type=pa.float64())
    return pa.table(out)


def golden_approx_users_by_type(sf_dir: str) -> pa.Table:
    """Sequential grouped HLL: one sketch per event_type, per-row adds
    in file order (register max is order-independent, so this matches
    any Ray partitioning)."""
    from dots_ocr_ray.functions.sketches import HyperLogLog

    t = pq.read_table(f"{sf_dir}/events.parquet", columns=["event_type", "user_id"])
    by: dict[str, "HyperLogLog"] = {}
    for k, v in zip(t.column("event_type").to_pylist(), t.column("user_id").to_pylist()):
        if k not in by:
            by[k] = HyperLogLog(12)
        by[k].add(str(v))
    keys = sorted(by)
    return pa.table(
        {
            "event_type": pa.array(keys, type=pa.string()),
            "approx_distinct": pa.array(
                [int(round(by[k].count())) for k in keys], type=pa.int64()
            ),
        }
    )


def golden_ngram_diversity(sf_dir: str, *, max_n: int = 3, p: int = 14) -> pa.Table:
    """Sequential n-gram diversity curve: per-doc ``str.split()``
    n-grams (the Ray side's parent mask keeps windows inside one doc)
    into one HLL per n."""
    from dots_ocr_ray.functions.sketches import HyperLogLog

    _, texts = _read_docs(sf_dir)
    ns, totals, distincts, ratios = [], [], [], []
    for n in range(1, max_n + 1):
        hll = HyperLogLog(p)
        total = 0
        for t in texts:
            toks = (t or "").split()
            grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
            hll.add_many(grams)
            total += len(grams)
        d = int(round(hll.count()))
        ns.append(n)
        totals.append(total)
        distincts.append(d)
        ratios.append(round(d / total, 6) if total else 0.0)
    return pa.table(
        {
            "n": pa.array(ns, type=pa.int64()),
            "total_ngrams": pa.array(totals, type=pa.int64()),
            "approx_distinct": pa.array(distincts, type=pa.int64()),
            "distinct_ratio": pa.array(ratios, type=pa.float64()),
        }
    )




def golden_host_communities(sf_dir: str, *, num_iters: int = 8) -> pa.Table:
    """Sequential label propagation over the planted-community host
    fixture (pipelines/graph.py:community_edges_from_documents),
    derived INDEPENDENTLY: a per-node Counter loop rather than the
    pipeline's vectorized pair-count folds.  Same exact rule: distinct
    undirected edges, neighbor votes + one self-vote, synchronous
    update, ties to the smallest label."""
    from collections import Counter

    ids = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"]).column(
        "doc_id"
    ).to_numpy()
    h = ids % 400
    ring = h[h % 16 < 15]
    skip = h[h % 16 < 14]
    bridge = h[ids % 89 == 0]
    src = np.concatenate([ring, skip, bridge])
    dst = np.concatenate([ring + 1, skip + 2, (bridge + 16) % 400])
    keep = src != dst
    a = np.minimum(src[keep], dst[keep])
    b = np.maximum(src[keep], dst[keep])
    edges = {(int(x), int(y)) for x, y in zip(a, b)}
    nbrs: dict[int, list[int]] = {}
    for x, y in edges:
        nbrs.setdefault(x, []).append(y)
        nbrs.setdefault(y, []).append(x)
    hosts = sorted(nbrs)
    lab = {v: v for v in hosts}
    for _ in range(num_iters):
        new = {}
        for v in hosts:
            c = Counter(lab[u] for u in nbrs[v])
            c[lab[v]] += 1
            best = max(c.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        lab = new
    return pa.table(
        {
            "host": pa.array(hosts, type=pa.int64()),
            "community": pa.array([lab[v] for v in hosts], type=pa.int64()),
        }
    )




def golden_host_random_walks(
    sf_dir: str, *, walks_per_node: int = 2, walk_len: int = 4, seed: int = 7
) -> pa.Table:
    """Sequential deterministic random walks over the host-edge
    fixture — dict adjacency + per-walk Python loop, sharing ONLY the
    pure step hash (pipelines/graph.py:_walk_choice_hash) with the
    distributed implementation."""
    from dots_ocr_ray.pipelines.graph import (
        EDGE_MULTIPLIERS,
        N_HOSTS,
        _walk_choice_hash,
    )

    ids = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"]).column(
        "doc_id"
    ).to_numpy()
    src_a = np.concatenate([ids % N_HOSTS for _ in EDGE_MULTIPLIERS])
    dst_a = np.concatenate([(ids * m) % N_HOSTS for m in EDGE_MULTIPLIERS])
    edges = sorted({(int(s), int(d)) for s, d in zip(src_a, dst_a)})
    adj: dict[int, list[int]] = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    nodes = sorted({v for e in edges for v in e})
    rows = []
    for v in nodes:
        for w in range(walks_per_node):
            cur = v
            rows.append((v, w, 0, cur))
            for step in range(1, walk_len + 1):
                nbrs = adj.get(cur, [])
                if not nbrs:
                    break
                h = int(
                    _walk_choice_hash(
                        np.array([cur]), np.array([w]), step, seed
                    )[0]
                )
                cur = sorted(nbrs)[h % len(nbrs)]
                rows.append((v, w, step, cur))
    return pa.table(
        {
            "start_host": pa.array([r[0] for r in rows], type=pa.int64()),
            "walk_id": pa.array([r[1] for r in rows], type=pa.int64()),
            "step": pa.array([r[2] for r in rows], type=pa.int64()),
            "host": pa.array([r[3] for r in rows], type=pa.int64()),
        }
    )




def golden_host_scc(sf_dir: str) -> pa.Table:
    """Sequential Kosaraju SCC over the directed host fixture
    (pipelines/graph.py:scc_edges_from_documents) — an INDEPENDENT
    algorithm from the pipeline's iterative Tarjan / distributed
    FW-BW tiers.  scc_id = min member id."""
    ids = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"]).column(
        "doc_id"
    ).to_numpy()
    h = ids % 400
    cyc_dst = np.where(h % 20 == 19, h - 19, h + 1)
    bridge_mask = (ids % 7 == 0) & (h % 20 == 19) & (h < 399)
    bh = h[bridge_mask]
    src_a = np.concatenate([h, bh])
    dst_a = np.concatenate([cyc_dst, bh + 1])
    edges = sorted({(int(s), int(d)) for s, d in zip(src_a, dst_a) if s != d})
    fwd: dict[int, list[int]] = {}
    rev: dict[int, list[int]] = {}
    nodes = sorted({v for e in edges for v in e})
    for s, d in edges:
        fwd.setdefault(s, []).append(d)
        rev.setdefault(d, []).append(s)
    # pass 1: iterative DFS finish order on the forward graph
    visited: set[int] = set()
    order: list[int] = []
    for root in nodes:
        if root in visited:
            continue
        stack = [(root, iter(fwd.get(root, [])))]
        visited.add(root)
        while stack:
            v, it = stack[-1]
            advanced = False
            for w in it:
                if w not in visited:
                    visited.add(w)
                    stack.append((w, iter(fwd.get(w, []))))
                    advanced = True
                    break
            if not advanced:
                order.append(v)
                stack.pop()
    # pass 2: reverse-graph DFS in reverse finish order
    assign: dict[int, int] = {}
    for root in reversed(order):
        if root in assign:
            continue
        comp = [root]
        assign[root] = root
        stack2 = [root]
        while stack2:
            v = stack2.pop()
            for w in rev.get(v, []):
                if w not in assign:
                    assign[w] = root
                    comp.append(w)
                    stack2.append(w)
        cid = min(comp)
        for v in comp:
            assign[v] = cid
    hosts = sorted(assign)
    return pa.table(
        {
            "host": pa.array(hosts, type=pa.int64()),
            "scc_id": pa.array([assign[v] for v in hosts], type=pa.int64()),
        }
    )




def golden_host_harmonic(sf_dir: str, *, seeds=(0, 7, 13, 21), micro: int = 1_000_000) -> pa.Table:
    """Sequential seed-sampled harmonic centrality over the host-edge
    fixture: per-seed BFS (deque) + floor(micro/d) integer sums —
    independent of the pipeline's Dataset BFS tiers."""
    from collections import deque

    from dots_ocr_ray.pipelines.graph import EDGE_MULTIPLIERS, N_HOSTS

    ids = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"]).column(
        "doc_id"
    ).to_numpy()
    src_a = np.concatenate([ids % N_HOSTS for _ in EDGE_MULTIPLIERS])
    dst_a = np.concatenate([(ids * m) % N_HOSTS for m in EDGE_MULTIPLIERS])
    adj: dict[int, set[int]] = {}
    for s, d in zip(src_a, dst_a):
        adj.setdefault(int(s), set()).add(int(d))
    cent: dict[int, int] = {}
    nsr: dict[int, int] = {}
    for seed in sorted(set(seeds)):
        dist = {seed: 0}
        q = deque([seed])
        while q:
            v = q.popleft()
            for w in adj.get(v, ()):  # directed BFS
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
        for v, d in dist.items():
            if d > 0:
                cent[v] = cent.get(v, 0) + micro // d
                nsr[v] = nsr.get(v, 0) + 1
    hosts = sorted(cent)
    return pa.table(
        {
            "host": pa.array(hosts, type=pa.int64()),
            "centrality_micro": pa.array([cent[v] for v in hosts], type=pa.int64()),
            "n_seeds_reaching": pa.array([nsr[v] for v in hosts], type=pa.int64()),
        }
    )


def golden_bitext_mining(sf_dir: str) -> pa.Table:
    """Sequential mirror of pipelines.bitext.mine_bitext: full
    similarity matrix, same shared top-k / merge / margin kernels,
    same float32-normalize -> float64-matmul dtype path."""
    from dots_ocr_ray.pipelines.bitext import (
        BITEXT_K,
        BITEXT_SRC_LABEL,
        BITEXT_TGT_LABEL,
        col_topk_partial,
        margin_scores,
        merge_col_topk,
        row_candidates,
    )
    from dots_ocr_ray.pipelines.similarity import _normalize_rows as _nrm
    from dots_ocr_ray.util import round_half_away

    k = BITEXT_K
    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )
    ids = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    lab = t.column("label").to_numpy(zero_copy_only=False).astype(np.int64)
    mat = np.asarray(t.column("embedding").to_pylist(), dtype=np.float32)

    def _side(label):
        m = lab == label
        sids = ids[m]
        order = np.argsort(sids, kind="stable")
        return sids[order], _nrm(mat[m][order]).astype(np.float64)

    src_ids_all = ids[lab == BITEXT_SRC_LABEL]
    src_mat = _nrm(mat[lab == BITEXT_SRC_LABEL]).astype(np.float64)
    tgt_ids, tgt_mat = _side(BITEXT_TGT_LABEL)
    sims = src_mat @ tgt_mat.T
    tgt_avg = merge_col_topk([col_topk_partial(sims, k)], k)
    cand_idx, cand_cos = row_candidates(sims, k)
    src_avg = cand_cos.mean(axis=1)
    marg = margin_scores(cand_cos, cand_idx, src_avg, tgt_avg)
    best = np.argmax(marg, axis=1)
    rows = np.arange(len(src_ids_all))
    bi = cand_idx[rows, best]
    out = pa.table(
        {
            "src_id": pa.array(src_ids_all, type=pa.int64()),
            "tgt_id": pa.array(tgt_ids[bi], type=pa.int64()),
            "cos": pa.array(round_half_away(cand_cos[rows, best], 6), type=pa.float64()),
            "margin": pa.array(round_half_away(marg[rows, best], 6), type=pa.float64()),
        }
    )
    return out.sort_by("src_id")


def golden_isotonic_calibration(sf_dir: str) -> pa.Table:
    """Sequential mirror of pipelines.calibration.isotonic_calibration:
    same quality_features kernel, same shared binning / integer-exact
    PAV / report functions."""
    from dots_ocr_ray.kernel.textops import quality_features
    from dots_ocr_ray.pipelines.calibration import bin_label_counts, calibration_table

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text", "lang"])
    texts = [x or "" for x in t.column("text").to_pylist()]
    s = np.array([quality_features(x)["stopword_ratio"] for x in texts])
    y = np.array([v == "en" for v in t.column("lang").to_pylist()])
    n, pos = bin_label_counts(s, y)
    return calibration_table(n, pos)


def golden_sq8_recall(sf_dir: str, *, k: int = 50) -> pa.Table:
    """Sequential mirror of the sq8_recall query: same 4-lowest-vec_id
    query rule, same f32 normalize / quantize kernels, same
    (-score, vec_id) top-k tie rule on both the exact and the
    dequantized side."""
    from dots_ocr_ray.pipelines.similarity import _normalize_rows as _nrm
    from dots_ocr_ray.util import round_half_away

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    mat = np.asarray(t.column("embedding").to_pylist(), dtype=np.float32)
    order = np.argsort(ids, kind="stable")
    queries = mat[order[:4]]
    qn = _nrm(queries)

    def _topk_sets(sims: np.ndarray) -> list[set]:
        out = []
        for qi in range(sims.shape[0]):
            sel = np.lexsort((ids, -sims[qi]))[:k]
            out.append(set(ids[sel].tolist()))
        return out

    ex = _topk_sets(qn @ _nrm(mat).T)
    mins = mat.min(axis=0).astype(np.float64)
    maxs = mat.max(axis=0).astype(np.float64)
    scale = (maxs - mins) / 255.0
    scale[scale == 0] = 1.0
    lo, sc = mins.astype(np.float32), scale.astype(np.float32)
    q8 = np.clip(np.rint((mat - lo) / sc), 0, 255).astype(np.uint8)
    deq = _nrm(q8.astype(np.float32) * sc + lo)
    qz = _topk_sets(qn @ deq.T)
    overlap = np.array([len(a & b) for a, b in zip(ex, qz)], dtype=np.int64)
    return pa.table(
        {
            "query_id": pa.array(np.arange(len(ex), dtype=np.int64), type=pa.int64()),
            "n_overlap": pa.array(overlap, type=pa.int64()),
            "recall": pa.array(round_half_away(overlap * 1.0 / k, 6), type=pa.float64()),
        }
    )


def golden_host_betweenness(sf_dir: str, *, micro: int = 1_000_000) -> pa.Table:
    """Sequential mirror of pipelines.graph.betweenness_centrality:
    same distinct self-loop-free directed edges, same shared
    brandes_source_dependency kernel (per-source micro-floor), plain
    Python loop over sources — independent of the pipeline's broadcast
    / source-fan-out machinery."""
    from dots_ocr_ray.pipelines.graph import (
        EDGE_MULTIPLIERS,
        N_HOSTS,
        brandes_source_dependency,
    )

    ids = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"]).column(
        "doc_id"
    ).to_numpy()
    adj: dict[int, set[int]] = {}
    for m in EDGE_MULTIPLIERS:
        for s0, d0 in zip(ids % N_HOSTS, (ids * m) % N_HOSTS):
            if s0 != d0:
                adj.setdefault(int(s0), set()).add(int(d0))
    adj_sorted = {v: sorted(ws) for v, ws in adj.items()}
    nodes = sorted(set(adj_sorted) | {w for ws in adj_sorted.values() for w in ws})
    totals: dict[int, int] = {}
    for s0 in nodes:
        for v, c in brandes_source_dependency(adj_sorted, s0, micro=micro).items():
            totals[v] = totals.get(v, 0) + c
    hosts = sorted(totals)
    return pa.table(
        {
            "host": pa.array(hosts, type=pa.int64()),
            "betweenness_micro": pa.array([totals[v] for v in hosts], type=pa.int64()),
        }
    )


def golden_shard_plan(sf_dir: str, *, n_workers: int = 8) -> pa.Table:
    """Sequential mirror of functions.partitioning.plan_partitions:
    plain pandas per-host n_chars sums + the shared lpt_assign
    kernel — independent of the pipeline's groupby/materialize path."""
    from dots_ocr_ray.functions.partitioning import lpt_assign

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])
    ids = t.column("doc_id").to_numpy()
    chars = t.column("n_chars").to_numpy()
    sums: dict[str, int] = {}
    for i, c in zip(ids, chars):
        h = f"example-{int(i) % 40:02d}.com"
        sums[h] = sums.get(h, 0) + int(c)
    placed = lpt_assign(sorted(sums.items()), n_workers)
    return pa.table(
        {
            "host": pa.array([p[0] for p in placed], type=pa.string()),
            "worker": pa.array([p[1] for p in placed], type=pa.int64()),
            "weight": pa.array([p[2] for p in placed], type=pa.int64()),
        }
    )


def golden_dedup_eval(sf_dir: str, *, threshold: float = 0.95) -> pa.Table:
    """Sequential mirror of _q_dedup_eval: golden_semdedup_docs'
    pruned flags scored against the planted-truth rule (planted member
    that is not its group's min id), integer floor-div micro P/R/F1."""
    kept_tbl = golden_semdedup_docs(sf_dir, threshold=threshold)
    ids = kept_tbl.column("vec_id").to_numpy().astype(np.int64)
    pred = ~kept_tbl.column("kept").to_numpy(zero_copy_only=False)
    planted = ids % 9 == 4
    gmins: dict[int, int] = {}
    for i in ids[planted]:
        g = int((i // 9) % 3)
        gmins[g] = min(gmins.get(g, int(i)), int(i))
    gmin = np.array([gmins.get(int(g), -1) for g in (ids // 9) % 3])
    truth = planted & (ids != gmin)
    tp = int((truth & pred).sum())
    fp = int((~truth & pred).sum())
    fn = int((truth & ~pred).sum())
    tn = int((~truth & ~pred).sum())
    p = 0 if tp + fp == 0 else 1_000_000 * tp // (tp + fp)
    r = 0 if tp + fn == 0 else 1_000_000 * tp // (tp + fn)
    f1 = 0 if 2 * tp + fp + fn == 0 else 2_000_000 * tp // (2 * tp + fp + fn)
    i64 = pa.int64()
    return pa.table(
        {
            "tp": pa.array([tp], i64),
            "fp": pa.array([fp], i64),
            "fn": pa.array([fn], i64),
            "tn": pa.array([tn], i64),
            "precision_micro": pa.array([p], i64),
            "recall_micro": pa.array([r], i64),
            "f1_micro": pa.array([f1], i64),
        }
    )



def golden_kcenter_prototypes(sf_dir: str, *, k: int = 8) -> pa.Table:
    """Sequential mirror of similarity.kcenter_greedy: full-matrix
    Gonzalez loop over the SAME micro-quantized distance kernel —
    independent of the pipeline's pass/fold structure."""
    from dots_ocr_ray.pipelines.similarity import kcenter_min_dist_micro

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy().astype(np.int64)
    mat = np.stack(t.column("embedding").to_pylist()).astype(np.float32)
    order = np.argsort(ids)
    ids, mat = ids[order], mat[order]
    chosen = [(0, int(ids[0]), 0)]
    centers = [mat[0]]
    for rank in range(1, k):
        d = kcenter_min_dist_micro(mat, np.stack(centers))
        sel = np.lexsort((ids, -d))[0]
        chosen.append((rank, int(ids[sel]), int(d[sel])))
        centers.append(mat[sel])
    return pa.table(
        {
            "rank": pa.array([c[0] for c in chosen], type=pa.int64()),
            "vec_id": pa.array([c[1] for c in chosen], type=pa.int64()),
            "dist_micro": pa.array([c[2] for c in chosen], type=pa.int64()),
        }
    )


def golden_knn_outliers(
    sf_dir: str, *, k: int = 8, sample_n: int = 256, top_n: int = 32
) -> pa.Table:
    """Sequential mirror of similarity.knn_outliers: the SAME
    hash-sample rule (bottom-n Knuth hash, tie -> id) and the SAME
    micro-quantized kNN-distance kernel over the full matrix."""
    from dots_ocr_ray.pipelines.similarity import (
        knn_outlier_scores_matrix,
        knuth_hash32,
    )

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy().astype(np.int64)
    mat = np.stack(t.column("embedding").to_pylist()).astype(np.float32)
    h = knuth_hash32(ids)
    order = np.lexsort((ids, h))[:sample_n]
    s_ids, s_mat = ids[order], mat[order]
    s = knn_outlier_scores_matrix(ids, mat, s_ids, s_mat, k)
    sel = np.lexsort((ids, -s))[:top_n]
    return pa.table(
        {
            "vec_id": pa.array(ids[sel], type=pa.int64()),
            "score_micro": pa.array(s[sel], type=pa.int64()),
        }
    )


def golden_stemmed_vocab(sf_dir: str, *, top_n: int = 20) -> pa.Table:
    """Sequential mirror of text_analysis.stemmed_vocab: one dict
    pass over [a-z]+ tokens of the lowercased text, shared Porter
    kernel, top_n by (count desc, stem asc) with distinct-form
    counts."""
    import re

    from dots_ocr_ray.functions.stem import porter_stem

    tok_re = re.compile(r"[a-z]+")
    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    counts: dict[str, int] = {}
    forms: dict[str, set] = {}
    memo: dict[str, str] = {}
    for txt in t.column("text").to_pylist():
        for w in tok_re.findall((txt or "").lower()):
            s = memo.get(w)
            if s is None:
                s = memo[w] = porter_stem(w)
            counts[s] = counts.get(s, 0) + 1
            forms.setdefault(s, set()).add(w)
    best = sorted(((-c, s) for s, c in counts.items()))[:top_n]
    return pa.table(
        {
            "stem": pa.array([s for _, s in best], type=pa.string()),
            "total": pa.array([-c for c, _ in best], type=pa.int64()),
            "n_forms": pa.array([len(forms[s]) for _, s in best], type=pa.int64()),
        }
    )


def golden_media_phash_dups(sf_dir: str, *, max_hamming: int = 3, n_blocks: int = 4) -> pa.Table:
    """Sequential mirror of the media perceptual-hash dedup over REAL
    decoded pixels: the shared phash64_png kernel (stdlib PNG decode →
    integer luma → area-mean thumbnail → average hash) + the same
    pigeonhole-block candidate generation and exact Hamming
    verification as golden_dedup_simhash."""
    from dots_ocr_ray.fixtures import media_png_payload
    from dots_ocr_ray.stages.media import phash64_png

    ids, texts = _read_docs(sf_dir)
    hs = {i: phash64_png(media_png_payload(int(i), t)) for i, t in zip(ids, texts)}
    buckets: dict = defaultdict(list)
    for i in ids:
        for b, v in simhash_block_keys(hs[i], n_blocks):
            buckets[(b, v)].append(i)
    pairs = sorted(
        (a, b) for a, b in _bucket_candidates(buckets) if hamming64(hs[a], hs[b]) <= max_hamming
    )
    t = _clusters_table(ids, pairs)
    return t.rename_columns(["media_id", "cluster_id"])


def golden_snm_dedup(
    sf_dir: str, *, window: int = 4, n: int = 3, threshold: float = 0.8
) -> pa.Table:
    """Sequential mirror of dedup.snm_dedup: sort by the shared
    normalized-prefix key, compare records within ``window`` positions,
    verify with exact char-n-gram Jaccard, union-find clusters."""
    from dots_ocr_ray.pipelines.dedup import snm_sort_key

    ids, texts = _read_docs(sf_dir)
    by_id = dict(zip(ids, texts))
    order = sorted(ids, key=lambda i: (snm_sort_key(by_id[i]), i))
    grams = {}

    def _g(i):
        if i not in grams:
            grams[i] = char_ngram_hashes(by_id[i] or "", n)
        return grams[i]

    pairs = []
    for x in range(len(order)):
        for y in range(x + 1, min(x + window, len(order))):
            a, b = order[x], order[y]
            if jaccard_hashes(_g(a), _g(b)) >= threshold:
                pairs.append((min(a, b), max(a, b)))
    return _clusters_table(ids, sorted(set(pairs)))


def golden_coverage_select(sf_dir: str, *, k: int = 8) -> pa.Table:
    """Sequential mirror of curation.max_coverage_select: full dict
    greedy over the shared doc_token_hashes kernel."""
    from dots_ocr_ray.pipelines.curation import doc_token_hashes

    ids, texts = _read_docs(sf_dir)
    hsets = {i: doc_token_hashes(t) for i, t in zip(ids, texts)}
    covered = np.zeros(0, dtype=np.uint64)
    rows = []
    for rank in range(k):
        best = None
        for i in sorted(ids):
            h = hsets[i]
            gain = int((~np.isin(h, covered)).sum())
            if best is None or (gain, -i) > (best[0], -best[1]):
                best = (gain, i)
        covered = np.union1d(covered, hsets[best[1]])
        rows.append((rank, best[1], best[0], len(covered)))
    return pa.table(
        {
            "rank": pa.array([r[0] for r in rows], type=pa.int64()),
            "doc_id": pa.array([r[1] for r in rows], type=pa.int64()),
            "new_tokens": pa.array([r[2] for r in rows], type=pa.int64()),
            "covered_total": pa.array([r[3] for r in rows], type=pa.int64()),
        }
    )


def golden_hac_dendrogram(sf_dir: str, *, n_clusters: int = 8) -> pa.Table:
    """Sequential mirror of similarity.hac_over_kmeans: same k-means
    seam (hash sample, train, assign), full-matrix int64-micro cell
    means, shared dendrogram kernel."""
    from dots_ocr_ray.pipelines.similarity import hac_merge_dendrogram

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy(zero_copy_only=False).astype(np.int64)
    mat = np.asarray(t.column("embedding").to_pylist(), dtype=np.float32)
    h = knuth_hash32(ids)
    order = np.lexsort((ids, h))[:512]
    sample = _normalize_rows(mat[order].astype(np.float32))
    cents = train_kmeans(sample, n_clusters, 5)
    cid, _ = assign_clusters_matrix(mat.astype(np.float32), cents)
    mat_q = np.floor(1e6 * mat.astype(np.float64)).astype(np.int64)
    sums = np.zeros((n_clusters, mat.shape[1]), dtype=np.int64)
    np.add.at(sums, cid, mat_q)
    cnts = np.bincount(cid, minlength=n_clusters).astype(np.int64)
    cell = np.floor(1e6 * cents.astype(np.float64)).astype(np.int64)
    occ = cnts > 0
    cell[occ] = np.floor_divide(sums[occ], cnts[occ][:, None])
    merges = hac_merge_dendrogram(cell)
    return pa.table(
        {
            "step": pa.array([x[0] for x in merges], type=pa.int64()),
            "cluster_a": pa.array([x[1] for x in merges], type=pa.int64()),
            "cluster_b": pa.array([x[2] for x in merges], type=pa.int64()),
            "dist_sq": pa.array([x[3] for x in merges], type=pa.int64()),
        }
    )


def golden_kappa_lang_id(sf_dir: str) -> pa.Table:
    """Sequential mirror of the lang-id Cohen's kappa: the golden
    confusion table through the SAME shared kappa arithmetic."""
    from dots_ocr_ray.pipelines.text_analysis import cohens_kappa

    return cohens_kappa(golden_lang_id_confusion(sf_dir))


def golden_jw_vocab_pairs(sf_dir: str, *, threshold_micro: int = 700_000) -> pa.Table:
    """Sequential mirror of text_analysis.jw_vocab_pairs: full
    all-pairs over the corpus vocabulary through the SAME kernel."""
    from dots_ocr_ray.functions.strsim import jaro_winkler_micro

    t = pq.read_table(f"{sf_dir}/documents.parquet", columns=["text"])
    vocab = sorted({w for x in t.column("text").to_pylist() for w in (x or "").split()})
    rows = []
    for i, a in enumerate(vocab):
        for b in vocab[i + 1 :]:
            s = jaro_winkler_micro(a, b)
            if s >= threshold_micro:
                rows.append((a, b, s))
    rows.sort()
    return pa.table(
        {
            "w1": pa.array([r[0] for r in rows], type=pa.string()),
            "w2": pa.array([r[1] for r in rows], type=pa.string()),
            "jw_micro": pa.array([r[2] for r in rows], type=pa.int64()),
        }
    )

GOLDEN_BUILDERS = {
    "kmeans_clusters": golden_kmeans_clusters,
    "silhouette_clusters": golden_silhouette_clusters,
    "semdedup_docs": golden_semdedup_docs,
    "dsir_scores": golden_dsir_scores,
    "dsir_sample": golden_dsir_sample,
    "incremental_minhash": golden_incremental_minhash,
    "host_pagerank": golden_host_pagerank,
    "host_betweenness": golden_host_betweenness,
    "shard_plan": golden_shard_plan,
    "dedup_eval": golden_dedup_eval,
    "host_hits": golden_host_hits,
    "host_trustrank": golden_host_trustrank,
    "host_kcore": golden_host_kcore,
    "cms_token_counts": golden_cms_token_counts,
    "corpus_overlap": golden_corpus_overlap,
    "cdc_dedup_stats": golden_cdc_dedup_stats,
    "describe_docs": golden_describe_docs,
    "chars_quantiles_approx": golden_chars_quantiles_approx,
    "dedup_minhash": golden_dedup_minhash,
    "dedup_simhash": golden_dedup_simhash,
    "dedup_ngram": golden_dedup_ngram,
    "dedup_embedding": golden_dedup_embedding,
    "ann_lsh_topk": golden_ann_lsh_topk,
    "ann_ivf_topk": golden_ann_ivf_topk,
    "ann_pq_topk": golden_ann_pq_topk,
    "lang_id_confusion": golden_lang_id_confusion,
    "fingerprint_dups": golden_fingerprint_dups,
    "merge_docs": golden_merge_docs,
    "approx_distinct_users": golden_approx_distinct_users,
    "reservoir_doc_sample": golden_reservoir_doc_sample,
    "compression_ratios": golden_compression_ratios,
    "host_templates": golden_host_templates,
    "table_profile": golden_table_profile,
    "bpe_merges": golden_bpe_merges,
    "bpe_token_stats": golden_bpe_token_stats,
    "bpe_piece_vocab": golden_bpe_piece_vocab,
    "logreg_weights": golden_logreg_weights,
    "logreg_scores": golden_logreg_scores,
    "pca_components": golden_pca_components,
    "pca_projected": golden_pca_projected,
    "approx_users_by_type": golden_approx_users_by_type,
    "ngram_diversity": golden_ngram_diversity,
    "host_communities": golden_host_communities,
    "host_random_walks": golden_host_random_walks,
    "host_scc": golden_host_scc,
    "host_harmonic": golden_host_harmonic,
    "bitext_mining": golden_bitext_mining,
    "isotonic_calibration": golden_isotonic_calibration,
    "sq8_recall": golden_sq8_recall,
    "dedup_best_survivors": golden_dedup_best_survivors,
    "containment_pairs": golden_containment_pairs,
    "kcenter_prototypes": golden_kcenter_prototypes,
    "knn_outliers": golden_knn_outliers,
    "stemmed_vocab": golden_stemmed_vocab,
    "media_phash_dups": golden_media_phash_dups,
    "snm_dedup": golden_snm_dedup,
    "coverage_select": golden_coverage_select,
    "hac_dendrogram": golden_hac_dendrogram,
    "kappa_lang_id": golden_kappa_lang_id,
    "jw_vocab_pairs": golden_jw_vocab_pairs,
}


def main() -> None:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    os.makedirs(out_dir, exist_ok=True)
    for name, builder in GOLDEN_BUILDERS.items():
        tbl = builder(sf_dir)
        pq.write_table(tbl, os.path.join(out_dir, f"{name}.parquet"), compression="zstd")
        print(f"{name}: {tbl.num_rows} rows -> {out_dir}/{name}.parquet")


if __name__ == "__main__":
    main()
