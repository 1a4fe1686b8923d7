"""bucket_keyed_fold (util.py): the O(num_buckets)-Python per-key
aggregate must equal the native groupby sum/min/distinct exactly,
including negative keys, skewed keys, and values at int64 extremes."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from dots_ocr_ray.util import bucket_keyed_fold


def _table(ds):
    t = pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)
    return t.sort_by(t.column_names[0])


@pytest.mark.parametrize("num_buckets", [1, 7, 64])
def test_fold_sum_matches_native(ray_session, num_buckets):
    rng = np.random.default_rng(7)
    k = rng.integers(-500, 500, size=20_000).astype(np.int64)
    # skew: half the rows on one hot key
    k[:10_000] = 42
    v = rng.integers(-(10**12), 10**12, size=20_000).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"node": pa.array(k), "deg": pa.array(v)})
    ).repartition(9)

    got = _table(bucket_keyed_fold(ds, "node", "sum", val_col="deg", num_buckets=num_buckets))
    want = _table(ds.groupby("node").sum("deg"))
    assert got.column("node").to_pylist() == want.column("node").to_pylist()
    assert got.column("deg").to_pylist() == want.column("sum(deg)").to_pylist()


def test_fold_min_and_distinct(ray_session):
    rng = np.random.default_rng(11)
    k = rng.integers(0, 300, size=5_000).astype(np.int64)
    v = rng.integers(np.iinfo(np.int64).min + 1, np.iinfo(np.int64).max, size=5_000)
    ds = ray.data.from_arrow(
        pa.table({"node": pa.array(k), "label": pa.array(v.astype(np.int64))})
    ).repartition(5)

    got = _table(bucket_keyed_fold(ds, "node", "min", val_col="label"))
    want = _table(ds.groupby("node").min("label"))
    assert got.column("node").to_pylist() == want.column("node").to_pylist()
    assert got.column("label").to_pylist() == want.column("min(label)").to_pylist()

    dist = _table(bucket_keyed_fold(ds, "node", "distinct"))
    assert dist.column_names == ["node"]
    assert dist.column("node").to_pylist() == sorted(set(k.tolist()))


def test_fold_rejects_bad_args(ray_session):
    ds = ray.data.from_items([{"node": 1, "v": 2}])
    with pytest.raises(ValueError):
        bucket_keyed_fold(ds, "node", "max", val_col="v")
    with pytest.raises(ValueError):
        bucket_keyed_fold(ds, "node", "sum")


def test_merge_pair_counts_tiers_vs_pandas(ray_session):
    """merge_pair_counts ≡ pandas groupby-sum on (a, b), for BOTH the
    driver tier and the forced distributed tier, over extreme /
    negative int64 keys."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    import ray.data

    from dots_ocr_ray.util import merge_pair_counts

    rng = np.random.RandomState(7)
    a = np.concatenate(
        [rng.randint(-5, 5, 300), np.array([1 << 62, -(1 << 62), 1 << 40] * 10)]
    ).astype(np.int64)
    b = np.concatenate(
        [rng.randint(-3, 3, 300), np.array([-(1 << 61), 1 << 55, 7] * 10)]
    ).astype(np.int64)
    c = rng.randint(1, 9, len(a)).astype(np.int64)
    t = pa.table(
        {
            "x": pa.array(a, type=pa.int64()),
            "y": pa.array(b, type=pa.int64()),
            "n": pa.array(c, type=pa.int64()),
        }
    )
    expect = (
        pd.DataFrame({"x": a, "y": b, "n": c})
        .groupby(["x", "y"], sort=True)["n"]
        .sum()
        .reset_index()
    )
    for kw in ({}, {"driver_limit": 0}):
        got = (
            merge_pair_counts(
                ray.data.from_arrow(t).repartition(5), "x", "y", "n", **kw
            )
            .to_pandas()
            .sort_values(["x", "y"])
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(got, expect.astype("int64"))
