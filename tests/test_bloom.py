"""Tests for the Bloom-filter broadcast semi/anti join."""

import ray.data

from dots_ocr_ray.functions.bloom import BloomFilter, bloom_anti_join, bloom_semi_join


def test_bloom_no_false_negatives():
    keys = [f"https://x.com/{i}" for i in range(5000)]
    bf = BloomFilter.build(keys, fp_rate=0.01)
    assert all(k in bf for k in keys)  # zero false negatives, always


def test_bloom_fp_rate_in_range():
    keys = [f"https://x.com/{i}" for i in range(5000)]
    bf = BloomFilter.build(keys, fp_rate=0.01)
    others = [f"https://y.org/{i}" for i in range(5000)]
    fp = sum(1 for k in others if k in bf) / len(others)
    assert fp < 0.03  # ~1% nominal, generous bound


def test_bloom_anti_and_semi_join(ray_session):
    done = {f"u{i}" for i in range(0, 100, 2)}  # evens done
    bf = BloomFilter.build(done, fp_rate=0.001)
    rows = [{"url": f"u{i}", "i": i} for i in range(100)]
    ds = ray.data.from_items(rows)
    remaining = bloom_anti_join(ds, bf).to_pandas()
    # anti-join never yields a done key (no false negatives)
    assert all(u not in done for u in remaining.url)
    # and at 0.1% fp over 50 odd keys, essentially all survive
    assert len(remaining) >= 48
    kept = bloom_semi_join(ds, bf).to_pandas()
    assert set(kept.url) >= done


def test_bloom_deterministic():
    a = BloomFilter.build(["k1", "k2", "k3"])
    b = BloomFilter.build(["k1", "k2", "k3"])
    assert (a.bits == b.bits).all()
