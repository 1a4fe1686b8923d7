"""Content-defined chunking: kernel invariants + distributed rollup
(kernel/cdc.py, pipelines/cdc.py)."""

import numpy as np
import pyarrow as pa

import ray.data


def test_gear_hash_matches_sequential_recurrence():
    from dots_ocr_ray.kernel.cdc import GEAR, gear_hashes

    data = bytes(range(256)) * 3
    h = 0
    seq = []
    for b in data:
        h = ((h << 1) & 0xFFFFFFFFFFFFFFFF) + int(GEAR[b])
        h &= 0xFFFFFFFFFFFFFFFF
        seq.append(h)
    vec = gear_hashes(data)
    assert [int(v) for v in vec] == seq


def test_cdc_boundaries_cover_and_respect_sizes():
    from dots_ocr_ray.kernel.cdc import cdc_boundaries

    rng = np.random.RandomState(5)
    data = rng.bytes(30000)
    cuts = cdc_boundaries(data)
    assert cuts[-1] == len(data)
    sizes = np.diff([0] + cuts)
    assert sizes.min() >= 1
    assert sizes.max() <= 1024
    assert all(s >= 64 for s in sizes[:-1])  # only the tail may undershoot min
    assert cdc_boundaries(b"") == []
    assert cdc_boundaries(b"x") == [1]


def test_cdc_insertion_realigns_chunks():
    """The CDC property: a local edit changes only nearby chunks;
    fixed-size blocks would reshift every later block."""
    from dots_ocr_ray.kernel.cdc import cdc_chunks

    rng = np.random.RandomState(7)
    data = rng.bytes(40000)
    edited = data[:5000] + b"@@inserted@@" + data[5000:]
    h1 = {h for _, _, h in cdc_chunks(data)}
    h2 = {h for _, _, h in cdc_chunks(edited)}
    assert len(h1 & h2) >= 0.9 * len(h1)


def test_cdc_deterministic_across_calls():
    from dots_ocr_ray.kernel.cdc import cdc_chunks

    data = np.random.RandomState(9).bytes(10000)
    assert cdc_chunks(data) == cdc_chunks(data)


def test_cdc_dedup_stats_counts_duplicates(ray_session):
    from dots_ocr_ray.kernel.cdc import cdc_chunks
    from dots_ocr_ray.pipelines.cdc import cdc_dedup_stats

    rng = np.random.RandomState(11)
    base = rng.bytes(4000).decode("latin-1")
    texts = [base, base, base + "tail edit", rng.bytes(3000).decode("latin-1")]
    docs = ray.data.from_arrow(pa.table({"text": pa.array(texts, type=pa.string())}))
    out = cdc_dedup_stats(docs).to_pylist()[0]
    # sequential reference over the same kernel
    from collections import Counter

    counts: Counter = Counter()
    sizes = {}
    for t in texts:
        for _s, ln, h in cdc_chunks(t.encode("utf-8", errors="replace")):
            counts[h] += 1
            sizes[h] = ln
    assert out["total_chunks"] == sum(counts.values())
    assert out["distinct_chunks"] == len(counts)
    assert out["distinct_bytes"] == sum(sizes.values())
    assert out["total_bytes"] == sum(counts[h] * sizes[h] for h in counts)
    # the two identical docs must actually dedup
    assert out["dedup_ratio"] < 0.75
