"""Co-partitioned bucketed storage (pipelines/bucketed.py): the
zero-exchange join must equal the on-line hash_join exactly, the
manifest must reject non-co-partitioned layouts, and per-batch
aggregation over the join output must be globally correct (one batch
== one bucket == all rows of its keys)."""

import shutil

import pyarrow as pa
import pytest

import ray.data

from dots_ocr_ray.pipelines.bucketed import bucketed_join, write_bucketed
from dots_ocr_ray.pipelines.relational import hash_join

SF = "/root/testdata/sf0.001"


def _sides():
    orders = ray.data.read_parquet(
        f"{SF}/orders.parquet", columns=["o_custkey", "o_totalprice", "o_orderkey"]
    )

    def _rk(b: pa.Table) -> pa.Table:
        return b.rename_columns(["c_custkey", "o_totalprice", "o_orderkey"])

    left = orders.map_batches(_rk, batch_format="pyarrow")
    right = ray.data.read_parquet(
        f"{SF}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    return left, right


@pytest.fixture(scope="module")
def layout(ray_session, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("bucketed"))
    left, right = _sides()
    write_bucketed(left, f"{base}/orders", key="c_custkey", num_buckets=8)
    write_bucketed(right, f"{base}/customer", key="c_custkey", num_buckets=8)
    yield base
    shutil.rmtree(base, ignore_errors=True)


def _canon(ds):
    df = ds.to_pandas()
    return (
        df[sorted(df.columns)]
        .sort_values(sorted(df.columns))
        .reset_index(drop=True)
    )


def test_bucketed_join_matches_hash_join(layout):
    import pandas as pd

    left, right = _sides()
    got = _canon(bucketed_join(f"{layout}/orders", f"{layout}/customer", on="c_custkey"))
    ref = _canon(hash_join(left, right, on="c_custkey"))
    pd.testing.assert_frame_equal(got, ref, check_dtype=False)
    assert len(got) > 0


def test_bucketed_join_rejects_mismatched_layouts(layout, tmp_path):
    other = str(tmp_path / "other")
    _, right = _sides()
    write_bucketed(right, other, key="c_custkey", num_buckets=4)  # different count
    with pytest.raises(ValueError, match="not co-partitioned"):
        bucketed_join(f"{layout}/orders", other, on="c_custkey")


def test_per_batch_rollup_is_globally_correct(layout):
    """Co-partitioning makes a per-batch group_by globally exact: no
    custkey can span two batches of the bucketed join output."""
    joined = bucketed_join(f"{layout}/orders", f"{layout}/customer", on="c_custkey")

    def _rollup(batch: pa.Table) -> pa.Table:
        g = batch.group_by("c_custkey").aggregate([("o_orderkey", "count")])
        return g.rename_columns(["c_custkey", "n"])

    got = {
        r["c_custkey"]: r["n"]
        for r in joined.map_batches(_rollup, batch_format="pyarrow").take_all()
    }
    import duckdb

    exp = dict(
        duckdb.sql(
            f"SELECT o_custkey, count(*) FROM read_parquet('{SF}/orders.parquet') o "
            f"JOIN read_parquet('{SF}/customer.parquet') c ON o.o_custkey = c.c_custkey "
            "GROUP BY o_custkey"
        ).fetchall()
    )
    assert got == exp


def test_bucketed_left_join_int64_exact_above_2_53(ray_session, tmp_path):
    """Left join with unmatched rows must NOT round-trip the right
    side's int64 payload through float64 (lossy above 2^53), and every
    bucket — including those whose right side is empty — must emit the
    same joined schema."""
    base = str(tmp_path / "big_ids")
    big = 2**60 + 3
    left = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 2, 3, 4, 5, 6, 7, 8], type=pa.int64()),
                "lv": pa.array(range(8), type=pa.int64()),
            }
        )
    )
    right = ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array([1, 3], type=pa.int64()),
                "rid": pa.array([big, big + 1], type=pa.int64()),
            }
        )
    )
    write_bucketed(left, f"{base}/l", key="k", num_buckets=4)
    write_bucketed(right, f"{base}/r", key="k", num_buckets=4)
    joined = bucketed_join(f"{base}/l", f"{base}/r", on="k", how="left")
    batches = [
        b for b in joined.iter_batches(batch_format="pyarrow") if b.num_rows
    ]
    # every bucket's block carries the SAME schema with rid still int64
    for b in batches:
        assert b.schema.field("rid").type == pa.int64()
    out = pa.concat_tables(batches)
    assert out.num_rows == 8  # every left row survives
    rid = {r["k"]: r["rid"] for r in out.to_pylist()}
    assert rid[1] == big and rid[3] == big + 1
    assert all(rid[k] is None for k in (2, 4, 5, 6, 7, 8))
