"""Tests for mergeable sketches (HLL, SpaceSaving, deterministic
reservoir) — accuracy vs exact answers and merge-equals-global-pass."""

import pyarrow.parquet as pq
import pytest

import ray.data

from dots_ocr_ray.functions.sketches import (
    HyperLogLog,
    Reservoir,
    SpaceSaving,
    approx_distinct,
    approx_heavy_hitters,
    deterministic_sample,
)


def test_hll_accuracy_and_merge():
    a, b = HyperLogLog(12), HyperLogLog(12)
    for i in range(5000):
        a.add(f"key-{i}")
    for i in range(2500, 7500):
        b.add(f"key-{i}")
    merged = a.merge(b)
    est = merged.count()
    assert abs(est - 7500) / 7500 < 0.05  # ~1.6% std error at p=12
    # merge == single pass
    c = HyperLogLog(12)
    for i in range(7500):
        c.add(f"key-{i}")
    assert merged.count() == c.count()
    # serialization round-trip
    assert HyperLogLog.deserialize(merged.serialize()).count() == merged.count()


def test_hll_small_range_linear_counting():
    h = HyperLogLog(12)
    for i in range(10):
        h.add(f"k{i}")
    assert abs(h.count() - 10) < 1.0


def test_spacesaving_finds_heavy_hitters():
    ss = SpaceSaving(capacity=32)
    # one heavy key (30%), long uniform tail
    for i in range(7000):
        ss.add("HEAVY" if i % 3 == 0 else f"tail-{i}")
    top = ss.top(1)
    assert top[0][0] == "HEAVY"
    assert top[0][1] >= 2333  # never underestimates


def test_reservoir_merge_equals_global():
    a, b, g = Reservoir(16), Reservoir(16), Reservoir(16)
    for i in range(1000):
        (a if i % 2 else b).add(f"item-{i}")
        g.add(f"item-{i}")
    assert a.merge(b).sample() == g.sample()


def test_distributed_sketches_match_exact(ray_session):
    ds = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "lang", "text"])
    exact_distinct = 500  # doc_ids are unique
    est = approx_distinct(ds, "doc_id", p=12)
    assert abs(est - exact_distinct) / exact_distinct < 0.05

    hh = approx_heavy_hitters(ds, "lang", k=2, capacity=64)
    t = pq.read_table("/root/testdata/sf0.001/documents.parquet", columns=["lang"])
    import collections

    true_counts = collections.Counter(t.column("lang").to_pylist())
    assert hh[0][0] == true_counts.most_common(1)[0][0]
    assert hh[0][1] == true_counts.most_common(1)[0][1]  # capacity ≫ distinct → exact

    # deterministic sample: same whatever the partitioning
    s1 = deterministic_sample(ds, "doc_id", k=10)
    s2 = deterministic_sample(ds.repartition(7), "doc_id", k=10)
    assert s1 == s2 and len(s1) == 10


def test_add_many_identical_to_per_item():
    """The vectorized bulk-ingest paths must produce byte-identical
    sketch state to per-item adds (HLL registers, Reservoir items) and
    identical output in SpaceSaving's exact regime."""
    import numpy as np

    from dots_ocr_ray.functions.sketches import HyperLogLog, Reservoir, SpaceSaving

    keys = [f"key-{i % 97}-{i}" for i in range(5000)] + ["dup"] * 50
    a, b = HyperLogLog(10), HyperLogLog(10)
    for k in keys:
        a.add(k)
    b.add_many(keys)
    assert np.array_equal(a.registers, b.registers)

    ra, rb = Reservoir(17), Reservoir(17)
    for k in keys:
        ra.add(k)
    rb.add_many(keys)
    assert ra.items == rb.items

    sa, sb = SpaceSaving(256), SpaceSaving(256)  # capacity > distinct: exact
    for k in keys:
        sa.add(k)
    sb.add_many(keys)
    assert sa.counts == sb.counts and sa.errors == sb.errors


def test_bit_length_u64_exact():
    import numpy as np

    from dots_ocr_ray.functions.sketches import _bit_length_u64

    vals = np.array(
        [0, 1, 2, 3, 4, 255, 256, 2**31, 2**53 - 1, 2**53, 2**53 + 1, 2**63, 2**64 - 1],
        dtype=np.uint64,
    )
    got = _bit_length_u64(vals)
    want = np.array([int(v).bit_length() for v in vals], dtype=np.uint8)
    assert np.array_equal(got, want)


def test_log_histogram_quantiles_and_merge():
    """Merged partials equal one pass; quantile estimates land within
    the bin's relative error of the exact quantile."""
    import numpy as np

    from dots_ocr_ray.functions.sketches import LogHistogram

    rng = np.random.RandomState(11)
    vals = rng.lognormal(mean=6.0, sigma=1.2, size=20000)
    whole = LogHistogram()
    whole.add_array(vals)
    p1, p2 = LogHistogram(), LogHistogram()
    p1.add_array(vals[:7000])
    p2.add_array(vals[7000:])
    merged = p1.merge(p2)
    assert np.array_equal(merged.counts, whole.counts)
    assert LogHistogram.deserialize(whole.serialize()).counts.tolist() == whole.counts.tolist()
    for q in (0.1, 0.5, 0.9, 0.99):
        exact = float(np.quantile(vals, q))
        approx = merged.quantile(q)
        assert abs(approx - exact) / exact < 0.06  # half-bin relative error

    empty = LogHistogram()
    assert str(empty.quantile(0.5)) == "nan"
    under = LogHistogram(lo=10.0)
    under.add_array(np.array([0.5, 2.0]))
    assert under.quantile(0.5) == 10.0  # underflow bin reports lo


def test_grouped_approx_distinct(ray_session):
    from dots_ocr_ray.functions.sketches import grouped_approx_distinct

    SF = "/root/testdata/sf0.001"
    events = ray.data.read_parquet(f"{SF}/events.parquet", columns=["event_type", "user_id"])
    out = {
        r["event_type"]: r["approx_distinct"]
        for r in grouped_approx_distinct(events, key_col="event_type", val_col="user_id", p=12).take_all()
    }
    exact = (
        pq.read_table(f"{SF}/events.parquet", columns=["event_type", "user_id"])
        .to_pandas()
        .groupby("event_type")["user_id"]
        .nunique()
        .to_dict()
    )
    assert set(out) == set(exact)
    for k, n in exact.items():
        assert abs(out[k] - n) / max(n, 1) < 0.05
    # partitioning-independent (register max is commutative)
    again = {
        r["event_type"]: r["approx_distinct"]
        for r in grouped_approx_distinct(
            ray.data.read_parquet(f"{SF}/events.parquet", columns=["event_type", "user_id"]).repartition(9),
            key_col="event_type",
            val_col="user_id",
            p=12,
        ).take_all()
    }
    assert out == again


def test_countmin_guarantees_and_merge():
    import numpy as np

    from dots_ocr_ray.functions.sketches import CountMin

    rng = np.random.RandomState(3)
    keys = [f"k{int(i)}" for i in rng.zipf(1.5, 5000) if i < 10000]
    from collections import Counter

    true = Counter(keys)
    bulk = CountMin(width=1024, depth=4)
    bulk.add_many(keys)
    # split-and-merge builds the identical matrix (integer adds commute)
    a, b = CountMin(1024, 4), CountMin(1024, 4)
    a.add_many(keys[: len(keys) // 2])
    b.add_many(keys[len(keys) // 2 :])
    merged = a.merge(b)
    assert (merged.counts == bulk.counts).all()
    # never undercounts; overshoot bounded by (e/width) * N w.h.p.
    probes = list(true)[:200]
    est = bulk.estimate_many(probes)
    truth = np.array([true[p] for p in probes])
    assert (est >= truth).all()
    import math

    bound = math.e / 1024 * len(keys)
    assert float(np.mean(est - truth)) <= bound
    # serialize roundtrip
    rt = CountMin.deserialize(bulk.serialize())
    assert (rt.counts == bulk.counts).all()
    assert (rt.estimate_many(probes) == est).all()


def test_cms_probe_counts_pipeline_exactness(ray_session):
    """With a wide sketch and a tiny vocabulary there are no
    collisions, so the distributed estimate equals the exact count."""
    import pyarrow as pa

    import ray.data

    from dots_ocr_ray.functions.sketches import cms_probe_counts

    texts = ["a b a", "b c", "a", ""] * 50
    ds = ray.data.from_arrow(pa.table({"text": pa.array(texts, type=pa.string())}))
    out = cms_probe_counts(ds, col="text", probes=["a", "b", "c", "zz"])
    got = dict(zip(out.column("term").to_pylist(), out.column("est_count").to_pylist()))
    assert got == {"a": 150, "b": 100, "c": 50, "zz": 0}


def test_corpus_overlap_estimates(ray_session):
    """HLL inclusion-exclusion overlap: estimates within the p=14
    error envelope on known sets, and intersection floors at 0 for
    disjoint sides."""
    import pyarrow as pa

    import ray.data
    from dots_ocr_ray.functions.sketches import corpus_overlap

    a = [f"k{i}" for i in range(4000)]
    b = [f"k{i}" for i in range(3000, 6000)]  # true: |A|=4000 |B|=3000 |A∩B|=1000
    da = ray.data.from_arrow(pa.table({"k": pa.array(a, type=pa.string())}))
    db = ray.data.from_arrow(pa.table({"k": pa.array(b, type=pa.string())}))
    row = corpus_overlap(da, db, col="k").to_pylist()[0]
    assert abs(row["n_left"] - 4000) / 4000 < 0.05
    assert abs(row["n_right"] - 3000) / 3000 < 0.05
    assert abs(row["n_union"] - 6000) / 6000 < 0.05
    assert abs(row["n_intersect"] - 1000) < 0.05 * 6000  # inherits union's abs error
    # disjoint: intersection clamps at >= 0
    dc = ray.data.from_arrow(
        pa.table({"k": pa.array([f"z{i}" for i in range(500)], type=pa.string())})
    )
    row2 = corpus_overlap(da, dc, col="k").to_pylist()[0]
    assert row2["n_intersect"] <= 0.05 * 4500
    assert row2["jaccard"] <= 0.05
