"""Snapshot-versioned table (pipelines/timetravel.py): copy-on-write
merge correctness (replace / insert / delete), time-travel isolation,
zone-selective rewrites, and vacuum retention."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from dots_ocr_ray.pipelines.timetravel import (
    create_table,
    latest_version,
    merge_version,
    read_version,
    vacuum,
)


def _base(n=100):
    return pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "text": pa.array([f"t{i}" for i in range(n)], type=pa.string()),
        }
    )


def _as_of(table_dir, version):
    df = read_version(table_dir, version).to_pandas()
    return df.sort_values("doc_id").reset_index(drop=True)


def test_cow_merge_replace_insert_delete(ray_session, tmp_path):
    d = str(tmp_path / "tt")
    m1 = create_table(ray.data.from_arrow(_base()).repartition(4), d, key_col="doc_id", rows_per_file=25)
    assert m1["version"] == 1 and len(m1["files"]) >= 4
    assert sum(e["rows"] for e in m1["files"]) == 100

    ups = pa.table(
        {
            "doc_id": pa.array([3, 50, 200, 201], type=pa.int64()),
            "text": pa.array(["t3v2", "t50v2", "new200", "new201"], type=pa.string()),
        }
    )
    m2 = merge_version(d, upserts=ups, delete_keys=[7, 99])
    assert m2["version"] == 2 and latest_version(d) == 2

    v2 = _as_of(d, 2)
    got = dict(zip(v2["doc_id"], v2["text"]))
    assert got[3] == "t3v2" and got[50] == "t50v2"
    assert got[200] == "new200" and got[201] == "new201"
    assert 7 not in got and 99 not in got
    assert len(v2) == 100 - 2 + 2

    # time travel: v1 unchanged
    v1 = _as_of(d, 1)
    assert len(v1) == 100 and dict(zip(v1["doc_id"], v1["text"]))[3] == "t3"


def test_cow_rewrites_only_touched_files(ray_session, tmp_path):
    """A delta confined to one zone must carry every other file
    forward BY REFERENCE (same path in both manifests)."""
    d = str(tmp_path / "tt2")
    m1 = create_table(ray.data.from_arrow(_base()).repartition(4), d, key_col="doc_id", rows_per_file=25)
    ups = pa.table(
        {"doc_id": pa.array([1], type=pa.int64()), "text": pa.array(["x"], type=pa.string())}
    )
    m2 = merge_version(d, upserts=ups)
    untouched = {e["path"] for e in m1["files"] if not (e["lo"] <= 1 <= e["hi"])}
    touched = {e["path"] for e in m1["files"]} - untouched
    p2 = {e["path"] for e in m2["files"]}
    assert untouched <= p2  # carried forward by reference
    assert not (touched & p2)  # rewritten under new names
    assert len(p2 - untouched) == len(touched)  # one new file per touched


def test_upsert_key_in_zone_gap_is_not_lost(ray_session, tmp_path):
    """A key inside a file's [lo, hi] range but absent from the file
    (zone gap) must land as an insert into that file, exactly once."""
    d = str(tmp_path / "tt3")
    evens = pa.table(
        {
            "doc_id": pa.array(range(0, 40, 2), type=pa.int64()),
            "text": pa.array([f"t{i}" for i in range(0, 40, 2)], type=pa.string()),
        }
    )
    create_table(ray.data.from_arrow(evens), d, key_col="doc_id", rows_per_file=10)
    ups = pa.table(
        {"doc_id": pa.array([5], type=pa.int64()), "text": pa.array(["gap5"], type=pa.string())}
    )
    merge_version(d, upserts=ups)
    v2 = _as_of(d, 2)
    assert (v2["doc_id"] == 5).sum() == 1
    assert len(v2) == 21


def test_merge_guards(ray_session, tmp_path):
    d = str(tmp_path / "tt4")
    create_table(ray.data.from_arrow(_base(10)), d, key_col="doc_id")
    dup = pa.table(
        {"doc_id": pa.array([1, 1], type=pa.int64()), "text": pa.array(["a", "b"], type=pa.string())}
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        merge_version(d, upserts=dup)
    with pytest.raises(ValueError, match="no committed version"):
        merge_version(str(tmp_path / "nope"), delete_keys=[1])


def test_vacuum_keeps_live_versions_readable(ray_session, tmp_path):
    d = str(tmp_path / "tt5")
    create_table(ray.data.from_arrow(_base()).repartition(4), d, key_col="doc_id", rows_per_file=25)
    for step in range(3):
        ups = pa.table(
            {
                "doc_id": pa.array([step], type=pa.int64()),
                "text": pa.array([f"v{step}"], type=pa.string()),
            }
        )
        merge_version(d, upserts=ups)
    deleted = vacuum(d, keep_versions=2)
    assert deleted  # something expired
    # kept versions still read exactly
    v4 = _as_of(d, 4)
    assert len(v4) == 100 and dict(zip(v4["doc_id"], v4["text"]))[2] == "v2"
    v3 = _as_of(d, 3)
    assert dict(zip(v3["doc_id"], v3["text"]))[1] == "v1"
    # expired manifests are gone
    with pytest.raises(Exception):
        read_version(d, 1)


def test_schema_evolution_null_backfill(ray_session, tmp_path):
    import pyarrow as pa

    import ray.data

    from dots_ocr_ray.pipelines.timetravel import (
        create_table,
        merge_version,
        read_version,
    )

    out = str(tmp_path / "tbl")
    rows = [{"k": i, "v": f"r{i}"} for i in range(10)]
    create_table(ray.data.from_items(rows), out, key_col="k", rows_per_file=4)
    delta = pa.table(
        {
            "k": pa.array([3, 100], type=pa.int64()),
            "v": pa.array(["r3b", "new"], type=pa.string()),
            "extra": pa.array([33, 77], type=pa.int64()),
        }
    )
    merge_version(out, upserts=delta)
    got = {r["k"]: r for r in read_version(out, 2).take_all()}
    assert got[3] == {"k": 3, "v": "r3b", "extra": 33}
    assert got[100] == {"k": 100, "v": "new", "extra": 77}
    # rows predating the column read back as null
    assert got[0] == {"k": 0, "v": "r0", "extra": None}
    assert len(got) == 11
    # v1 stays readable with its original schema (no extra column)
    v1 = read_version(out, 1)
    assert "extra" not in v1.schema().names
    assert v1.count() == 10
