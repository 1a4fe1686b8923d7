"""Arrow IPC (Feather v2) sink + source (sources/ipc.py): lossless
roundtrip through per-batch .arrow files, column projection at read,
file:// URI layouts via pyarrow.fs, and footer-only schema probe."""

import pyarrow as pa
import pytest

import ray.data

from dots_ocr_ray.sources.ipc import ipc_file_schema, read_ipc, write_ipc


def _table(n=300):
    return pa.table(
        {
            "doc_id": pa.array(range(n), type=pa.int64()),
            "text": pa.array([f"doc {i} café ✓" for i in range(n)], type=pa.string()),
            "score": pa.array([i * 0.5 for i in range(n)], type=pa.float64()),
        }
    )


def test_ipc_roundtrip(ray_session, tmp_path):
    tbl = _table()
    out = str(tmp_path / "ipc")
    paths = write_ipc(
        ray.data.from_arrow(tbl).repartition(4), out, rows_per_file=100
    )
    assert len(paths) >= 3 and all(p.endswith(".arrow") for p in paths)
    got = read_ipc(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got["doc_id"].tolist() == list(range(300))
    assert got["text"].tolist() == tbl.column("text").to_pylist()
    assert got["score"].tolist() == tbl.column("score").to_pylist()


def test_ipc_column_projection_and_schema(ray_session, tmp_path):
    out = str(tmp_path / "ipc2")
    write_ipc(ray.data.from_arrow(_table(64)), out, rows_per_file=32)
    sch = ipc_file_schema(out)
    assert set(sch.names) == {"doc_id", "text", "score"}
    got = read_ipc(out, columns=["doc_id", "score"]).schema()
    assert set(got.names) == {"doc_id", "score"}


def test_ipc_file_uri(ray_session, tmp_path):
    """A file:// URI must resolve through pyarrow.fs on both sides."""
    out = "file://" + str(tmp_path / "ipc3")
    write_ipc(ray.data.from_arrow(_table(10)), out, rows_per_file=10)
    assert read_ipc(str(tmp_path / "ipc3")).count() == 10


def test_ipc_empty_dir_raises(ray_session, tmp_path):
    d = tmp_path / "nothing"
    d.mkdir()
    with pytest.raises(ValueError):
        ipc_file_schema(str(d))
