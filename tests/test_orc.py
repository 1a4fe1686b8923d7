"""ORC sink + source (sources/orc.py): lossless roundtrip through
per-batch .orc files, reader-level column projection, file:// URI
layouts via pyarrow.fs, and footer-only schema probe."""

import pyarrow as pa
import pytest

import ray.data

from dots_ocr_ray.sources.orc import orc_file_schema, read_orc, write_orc


def _table(n=300):
    return pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "text": pa.array([f"doc {i} café ✓" for i in range(n)], type=pa.string()),
            "score": pa.array([i * 0.5 for i in range(n)], type=pa.float64()),
        }
    )


def test_orc_roundtrip(ray_session, tmp_path):
    tbl = _table()
    out = str(tmp_path / "orc")
    paths = write_orc(ray.data.from_arrow(tbl).repartition(4), out, rows_per_file=100)
    assert len(paths) >= 3 and all(p.endswith(".orc") for p in paths)
    got = read_orc(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == list(range(300))
    assert got["text"].tolist() == tbl.column("text").to_pylist()
    assert got["score"].tolist() == tbl.column("score").to_pylist()


def test_orc_column_projection_and_schema(ray_session, tmp_path):
    out = str(tmp_path / "orc2")
    write_orc(ray.data.from_arrow(_table(64)), out, rows_per_file=32)
    sch = orc_file_schema(out)
    assert set(sch.names) == {"doc_id", "text", "score"}
    got = read_orc(out, columns=["doc_id", "score"]).to_pandas()
    assert sorted(got.columns) == ["doc_id", "score"]
    assert len(got) == 64


def test_orc_file_uri(ray_session, tmp_path):
    out = f"file://{tmp_path}/orc3"
    write_orc(ray.data.from_arrow(_table(32)), out, rows_per_file=16)
    got = read_orc(f"{tmp_path}/orc3").to_pandas()
    assert len(got) == 32


def test_orc_empty_layout_raises(tmp_path):
    (tmp_path / "empty").mkdir()
    with pytest.raises(ValueError, match="no .orc files"):
        orc_file_schema(str(tmp_path / "empty"))
