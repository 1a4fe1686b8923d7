"""Corpus-level deduplication pipelines (SURVEY.md §2.7 D3 + the
large-scale training-data ops).

The reference's only corpus-level dedup is exact (md5 job identity +
md5-gated skip, dotsocr_service.py:595-623); a 100 TB training-data
engine needs the full family:

* :func:`exact_dedup` — hash-partitioned groupby, first-by-key.
* :func:`minhash_lsh_dedup` — shingle → minhash signature → banded LSH
  buckets → candidate pairs → connected components.
* :func:`simhash_dedup` — 64-bit simhash, pigeonhole block index,
  Hamming-distance verification.
* :func:`ngram_jaccard_dedup` — LSH candidates verified with exact
  character-n-gram Jaccard.
* :func:`embedding_dedup` — random-hyperplane LSH buckets + cosine
  verification over an embedding column.

Scale notes (single-node test, multi-node design):
- every stage is ``map_batches`` (vectorized, actor pool where state is
  warm) and the only all-to-all exchanges are the bucket groupbys,
  keyed by content hash — uniformly distributed by construction.
- candidate PAIRS are a tiny fraction of the corpus (that is the point
  of LSH), so the final connected-components runs on the driver over
  pairs only; at 10^12 docs swap in iterative min-label propagation
  (a few rounds of groupby-min) — the bucket stages are unchanged.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from dots_ocr_ray.functions.hashing import (
    MinHasher,
    char_ngrams,
    hamming64,
    jaccard,
    shingles,
    simhash64,
    simhash_block_keys,
)
from dots_ocr_ray.kernel.textops import md5_hex
from dots_ocr_ray.util import autoscale_pool


HOT_BUCKET_CAP = 64
"""Above this size a candidate bucket switches from full pairwise
verification (O(n^2)) to star-linking vs its min doc (O(n)) — the
hot-key guard for duplicate-heavy corpora (SURVEY §7.4 hard part 6)."""


# ---------------------------------------------------------------------------
# exact dedup
def exact_dedup(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Exact dedup: content-hash partition + per-group first (min id).

    Vectorized hash inside map_batches, then ONE groupby shuffle keyed
    by md5(text) — uniformly distributed, no hot keys possible since
    identical content IS the group."""

    def _add_hash(batch: pa.Table) -> pa.Table:
        hashes = [md5_hex(t or "") for t in batch.column(text_col).to_pylist()]
        return batch.append_column("content_md5", pa.array(hashes, type=pa.string()))

    def _first(group: pa.Table) -> pa.Table:
        return group.sort_by(id_col).slice(0, 1)

    return (
        ds.map_batches(_add_hash, batch_format="pyarrow")
        .groupby("content_md5")
        .map_groups(_first, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# connected components over candidate pairs
class _UnionFind:
    def __init__(self):
        self.parent: dict[int, int] = {}

    def find(self, x: int) -> int:
        self.parent.setdefault(x, x)
        root = x
        while self.parent[root] != root:
            root = self.parent[root]
        while self.parent[x] != root:
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic: smaller id wins as root
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            self.parent[hi] = lo


def _clusters_from_pairs(ids: list[int], pairs: list[tuple[int, int]]) -> pa.Table:
    """(id, cluster_id) assignment; cluster_id = min member id."""
    uf = _UnionFind()
    for i in ids:
        uf.find(i)
    for a, b in pairs:
        uf.union(a, b)
    # path-compress to the true min root
    roots: dict[int, int] = {}
    for i in ids:
        r = uf.find(i)
        roots[r] = min(roots.get(r, i), i)
    return pa.table(
        {
            "doc_id": pa.array(sorted(ids), type=pa.int64()),
            "cluster_id": pa.array([roots[uf.find(i)] for i in sorted(ids)], type=pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
class MinHashSignatures:
    """Actor stage: warm MinHasher (permutation tables built once per
    actor) → per-row signature bytes."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id", num_perm: int = 128, shingle_k: int = 5):
        self.text_col = text_col
        self.id_col = id_col
        self.shingle_k = shingle_k
        self.hasher = MinHasher(num_perm=num_perm)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [
            self.hasher.signature(shingles(t or "", self.shingle_k)).astype(np.uint64).tobytes()
            for t in batch.column(self.text_col).to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch.column(self.id_col).cast(pa.int64()),
                "sig": pa.array(sigs, type=pa.binary()),
            }
        )


def minhash_lsh_dedup(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 5,
    threshold: float = 0.8,
    concurrency: int | None = None,
) -> ray.data.Dataset:
    """MinHash+LSH near-dup clustering → (doc_id, cluster_id).

    shingle→minhash per batch (actor pool) → explode to
    (band_id, band_key) rows → bucket groupby → pairwise signature
    verification inside each bucket (est. Jaccard ≥ threshold) →
    connected components.  Docs with no near-dup get cluster_id ==
    doc_id."""
    concurrency = concurrency or autoscale_pool()
    sigs = ds.map_batches(
        MinHashSignatures,
        fn_constructor_kwargs={"text_col": text_col, "id_col": id_col, "num_perm": num_perm, "shingle_k": shingle_k},
        batch_format="pyarrow",
        concurrency=concurrency,
    )

    def _explode_bands(batch: pa.Table) -> pa.Table:
        band_ids, band_keys, doc_ids, sig_out = [], [], [], []
        for doc_id, sig_bytes in zip(batch.column("doc_id").to_pylist(), batch.column("sig").to_pylist()):
            sig = np.frombuffer(sig_bytes, dtype=np.uint64)
            for b, key in enumerate(MinHasher.band_keys(sig, bands)):
                band_ids.append(b)
                band_keys.append(key)
                doc_ids.append(doc_id)
                sig_out.append(sig_bytes)
        return pa.table(
            {
                "band_id": pa.array(band_ids, type=pa.int32()),
                "band_key": pa.array(band_keys, type=pa.uint64()),
                "doc_id": pa.array(doc_ids, type=pa.int64()),
                "sig": pa.array(sig_out, type=pa.binary()),
            }
        )

    bands_ds = sigs.map_batches(_explode_bands, batch_format="pyarrow")

    def _bucket_pairs(group: pa.Table) -> pa.Table:
        docs = group.column("doc_id").to_pylist()
        if len(docs) < 2:
            return pa.table({"a": pa.array([], type=pa.int64()), "b": pa.array([], type=pa.int64())})
        sig_arrays = [np.frombuffer(s, dtype=np.uint64) for s in group.column("sig").to_pylist()]
        a_out, b_out = [], []
        order = np.argsort(docs)
        if len(order) <= HOT_BUCKET_CAP:
            # small bucket: full pairwise verification
            for ii in range(len(order)):
                for jj in range(ii + 1, len(order)):
                    i, j = order[ii], order[jj]
                    if MinHasher.jaccard_estimate(sig_arrays[i], sig_arrays[j]) >= threshold:
                        a_out.append(min(docs[i], docs[j]))
                        b_out.append(max(docs[i], docs[j]))
        else:
            # HOT bucket (e.g. a 30%-of-corpus duplicate cluster): full
            # pairwise is O(n^2).  Star-link every member against the
            # bucket's min doc instead — O(n); near-dups missed by one
            # star are recovered by the other 31 bands' buckets.
            pivot = order[0]
            for jj in range(1, len(order)):
                j = order[jj]
                if MinHasher.jaccard_estimate(sig_arrays[pivot], sig_arrays[j]) >= threshold:
                    a_out.append(min(docs[pivot], docs[j]))
                    b_out.append(max(docs[pivot], docs[j]))
        return pa.table({"a": pa.array(a_out, type=pa.int64()), "b": pa.array(b_out, type=pa.int64())})

    pairs_ds = bands_ds.groupby(["band_id", "band_key"]).map_groups(_bucket_pairs, batch_format="pyarrow")

    # candidate pairs are tiny → driver-side components (see module doc)
    pairs = {(r["a"], r["b"]) for r in pairs_ds.take_all()}
    all_ids = [r["doc_id"] for r in sigs.select_columns(["doc_id"]).take_all()]
    return ray.data.from_arrow(_clusters_from_pairs(all_ids, sorted(pairs)))


# ---------------------------------------------------------------------------
# SimHash
def simhash_dedup(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    n_blocks: int = 4,
) -> ray.data.Dataset:
    """SimHash near-dup clustering → (doc_id, cluster_id).

    64-bit simhash per row; pigeonhole block index (any pair within
    Hamming ≤ n_blocks-1 shares a block key) → bucket groupby →
    exact Hamming verification → components."""

    def _sim(batch: pa.Table) -> pa.Table:
        hs = [simhash64(t or "") for t in batch.column(text_col).to_pylist()]
        return pa.table(
            {
                "doc_id": batch.column(id_col).cast(pa.int64()),
                "simhash": pa.array(hs, type=pa.uint64()),
            }
        )

    sims = ds.map_batches(_sim, batch_format="pyarrow")

    def _explode(batch: pa.Table) -> pa.Table:
        blk, key, ids, hs = [], [], [], []
        for doc_id, h in zip(batch.column("doc_id").to_pylist(), batch.column("simhash").to_pylist()):
            for b, v in simhash_block_keys(h, n_blocks):
                blk.append(b)
                key.append(v)
                ids.append(doc_id)
                hs.append(h)
        return pa.table(
            {
                "block": pa.array(blk, type=pa.int32()),
                "key": pa.array(key, type=pa.uint64()),
                "doc_id": pa.array(ids, type=pa.int64()),
                "simhash": pa.array(hs, type=pa.uint64()),
            }
        )

    def _pairs(group: pa.Table) -> pa.Table:
        docs = group.column("doc_id").to_pylist()
        hs = group.column("simhash").to_pylist()
        a_out, b_out = [], []
        if len(docs) <= HOT_BUCKET_CAP:
            for i in range(len(docs)):
                for j in range(i + 1, len(docs)):
                    if docs[i] != docs[j] and hamming64(hs[i], hs[j]) <= max_hamming:
                        a_out.append(min(docs[i], docs[j]))
                        b_out.append(max(docs[i], docs[j]))
        else:
            # hot bucket: star-link vs the min doc (see minhash note)
            order = sorted(range(len(docs)), key=lambda k: docs[k])
            pivot = order[0]
            for j in order[1:]:
                if docs[pivot] != docs[j] and hamming64(hs[pivot], hs[j]) <= max_hamming:
                    a_out.append(min(docs[pivot], docs[j]))
                    b_out.append(max(docs[pivot], docs[j]))
        return pa.table({"a": pa.array(a_out, type=pa.int64()), "b": pa.array(b_out, type=pa.int64())})

    pairs_ds = (
        sims.map_batches(_explode, batch_format="pyarrow").groupby(["block", "key"]).map_groups(_pairs, batch_format="pyarrow")
    )
    pairs = {(r["a"], r["b"]) for r in pairs_ds.take_all()}
    all_ids = [r["doc_id"] for r in sims.select_columns(["doc_id"]).take_all()]
    return ray.data.from_arrow(_clusters_from_pairs(all_ids, sorted(pairs)))


# ---------------------------------------------------------------------------
# n-gram Jaccard (LSH candidates + exact verification)
def ngram_jaccard_dedup(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
) -> ray.data.Dataset:
    """Character-n-gram Jaccard near-dup clustering → (doc_id,
    cluster_id).  Candidates come from a loose MinHash pass (recall
    net); each candidate pair is verified with EXACT n-gram Jaccard on
    the two texts, so precision is exact at the threshold."""
    clusters = minhash_lsh_dedup(
        ds, text_col=text_col, id_col=id_col, threshold=max(0.3, threshold - 0.3)
    )
    cand = [
        (r["doc_id"], r["cluster_id"]) for r in clusters.take_all() if r["doc_id"] != r["cluster_id"]
    ]
    cand_ids = {i for pair in cand for i in pair}
    if not cand_ids:
        return clusters

    # fetch candidate texts only (tiny subset) — broadcastable lookup
    def _only_cands(batch: pa.Table) -> pa.Table:
        mask = pa.array([i in cand_ids for i in batch.column(id_col).to_pylist()])
        return batch.filter(mask)

    texts = {
        r[id_col]: r[text_col]
        for r in ds.map_batches(_only_cands, batch_format="pyarrow").select_columns([id_col, text_col]).take_all()
    }
    grams = {i: char_ngrams(texts.get(i, "") or "", n) for i in cand_ids}
    verified = [
        (a, b)
        for a, b in ((min(x, y), max(x, y)) for x, y in cand)
        if jaccard(grams[a], grams[b]) >= threshold
    ]
    all_ids = [r["doc_id"] for r in clusters.select_columns(["doc_id"]).take_all()]
    return ray.data.from_arrow(_clusters_from_pairs(all_ids, sorted(set(verified))))


# ---------------------------------------------------------------------------
# embedding cosine near-dup
def embedding_dedup(
    ds: ray.data.Dataset,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 42,
) -> ray.data.Dataset:
    """Embedding near-dup clustering → (doc_id, cluster_id).

    Random-hyperplane LSH (seeded, built once per actor) buckets the
    vectors; within-bucket exact cosine ≥ threshold → pairs →
    components.  n_planes trades recall vs bucket size (12 planes →
    4096 buckets)."""

    class _Bucketize:
        def __init__(self):
            self.planes = None

        def __call__(self, batch: pa.Table) -> pa.Table:
            vecs = np.array(batch.column(vec_col).to_pylist(), dtype=np.float32)
            if self.planes is None:
                rng = np.random.RandomState(seed)
                self.planes = rng.standard_normal((vecs.shape[1], n_planes)).astype(np.float32)
            bits = (vecs @ self.planes) > 0
            keys = bits @ (1 << np.arange(n_planes, dtype=np.int64))
            norms = np.linalg.norm(vecs, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            unit = vecs / norms
            return pa.table(
                {
                    "bucket": pa.array(keys, type=pa.int64()),
                    "doc_id": batch.column(id_col).cast(pa.int64()),
                    "unit": pa.array([v.tobytes() for v in unit], type=pa.binary()),
                }
            )

    buckets = ds.map_batches(_Bucketize, batch_format="pyarrow", concurrency=autoscale_pool())

    def _pairs(group: pa.Table) -> pa.Table:
        docs = group.column("doc_id").to_pylist()
        if len(docs) < 2:
            return pa.table({"a": pa.array([], type=pa.int64()), "b": pa.array([], type=pa.int64())})
        mat = np.stack([np.frombuffer(u, dtype=np.float32) for u in group.column("unit").to_pylist()])
        a_out, b_out = [], []
        if len(docs) <= HOT_BUCKET_CAP:
            sims = mat @ mat.T
            for i in range(len(docs)):
                for j in range(i + 1, len(docs)):
                    if sims[i, j] >= threshold:
                        a_out.append(min(docs[i], docs[j]))
                        b_out.append(max(docs[i], docs[j]))
        else:
            # hot bucket: one matvec against the min doc instead of n^2
            order = sorted(range(len(docs)), key=lambda k: docs[k])
            pivot = order[0]
            sims = mat @ mat[pivot]
            for j in order[1:]:
                if sims[j] >= threshold:
                    a_out.append(min(docs[pivot], docs[j]))
                    b_out.append(max(docs[pivot], docs[j]))
        return pa.table({"a": pa.array(a_out, type=pa.int64()), "b": pa.array(b_out, type=pa.int64())})

    pairs_ds = buckets.groupby("bucket").map_groups(_pairs, batch_format="pyarrow")
    pairs = {(r["a"], r["b"]) for r in pairs_ds.take_all()}
    all_ids = [r["doc_id"] for r in buckets.select_columns(["doc_id"]).take_all()]
    return ray.data.from_arrow(_clusters_from_pairs(all_ids, sorted(pairs)))
