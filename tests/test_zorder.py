"""Z-order clustering (pipelines/zorder.py): Morton codes must match a
bit-by-bit reference, the clustered layout must be invisible to box
results, the 2-D zone manifest must actually prune, and the SQL mirror
must agree with the numpy kernel."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from dots_ocr_ray.pipelines.zorder import (
    add_zvalue,
    interleave_bits2,
    morton_sql_expr,
    pruning_stats,
    read_box,
    zorder_write,
)


def _morton_ref(x: int, y: int, bits: int) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_interleave_matches_reference():
    rng = np.random.default_rng(3)
    x = rng.integers(0, 1 << 16, size=2_000).astype(np.int64)
    y = rng.integers(0, 1 << 16, size=2_000).astype(np.int64)
    got = interleave_bits2(x, y, bits=16)
    want = np.array([_morton_ref(a, b, 16) for a, b in zip(x.tolist(), y.tolist())])
    assert np.array_equal(got, want)
    # masking: values above the bit budget wrap to their low bits
    assert interleave_bits2(
        np.array([1 << 16]), np.array([0]), bits=16
    ).tolist() == [0]
    with pytest.raises(ValueError):
        interleave_bits2(x, y, bits=32)


def test_morton_sql_expr_matches_numpy():
    import duckdb

    rng = np.random.default_rng(5)
    x = rng.integers(0, 1 << 16, size=500).astype(np.int64)
    y = rng.integers(0, 1 << 16, size=500).astype(np.int64)
    con = duckdb.connect()
    con.register("t", pa.table({"x": x, "y": y}))
    got = [
        r[0]
        for r in con.execute(
            f"SELECT {morton_sql_expr('x', 'y', 16)} FROM t"
        ).fetchall()
    ]
    assert got == interleave_bits2(x, y, bits=16).tolist()


@pytest.fixture(scope="module")
def zlayout(ray_session, tmp_path_factory):
    rng = np.random.default_rng(11)
    n = 8_000
    t = pa.table(
        {
            "rid": pa.array(np.arange(n), type=pa.int64()),
            "u": pa.array(rng.integers(0, 200, size=n).astype(np.int64)),
            "d": pa.array(rng.integers(0, 400, size=n).astype(np.int64)),
        }
    )
    out = str(tmp_path_factory.mktemp("zorder") / "zones")
    manifest = zorder_write(
        ray.data.from_arrow(t).repartition(6),
        out,
        col_x="u",
        col_y="d",
        rows_per_file=512,
    )
    return t, out, manifest


def test_box_read_matches_plain_filter(zlayout):
    t, out, _ = zlayout
    got = (
        read_box(out, (50, 90), (100, 180), columns=["rid", "u", "d"])
        .to_pandas()
        .sort_values("rid")
    )
    u = t.column("u").to_numpy()
    d = t.column("d").to_numpy()
    mask = (u >= 50) & (u <= 90) & (d >= 100) & (d <= 180)
    want = t.filter(pa.array(mask)).to_pandas().sort_values("rid")
    assert got["rid"].tolist() == want["rid"].tolist()
    assert got["u"].tolist() == want["u"].tolist()
    assert got["d"].tolist() == want["d"].tolist()


def test_zone_manifest_prunes_small_boxes(zlayout):
    _, out, manifest = zlayout
    assert len(manifest["zones"]) >= 8
    stats = pruning_stats(out, (0, 20), (0, 40))
    # a ~1% box must not touch most files — the layout's whole point
    assert stats["files_scanned"] < stats["files_total"] / 2, stats


def test_empty_box_returns_schema_correct_empty(zlayout):
    _, out, _ = zlayout
    ds = read_box(out, (10_000, 10_001), (0, 1), columns=["rid"])
    assert ds.count() == 0
    assert ds.schema().names == ["rid"]


def test_add_zvalue_column(ray_session):
    t = pa.table(
        {"a": pa.array([1, 2], type=pa.int64()), "b": pa.array([3, 4], type=pa.int64())}
    )
    out = add_zvalue(ray.data.from_arrow(t), "a", "b").to_pandas()
    assert out["zval"].tolist() == [
        _morton_ref(1, 3, 16),
        _morton_ref(2, 4, 16),
    ]
