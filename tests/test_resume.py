"""Resumable-output tests (reference S9/J4 md5-gate analog,
SURVEY.md §5.4): rerun after partial completion recomputes only the
missing partitions and bytes match."""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from dots_ocr_ray.fixtures import make_pages_table
from dots_ocr_ray.pipelines.extract import extract_pages
from dots_ocr_ray.state.manifest import completed_partitions, read_marker


@pytest.fixture()
def out_dir(tmp_path):
    return str(tmp_path / "out")


def _read_all(out_dir):
    tables = [pq.read_table(p) for p in sorted(glob.glob(os.path.join(out_dir, "part-*.parquet")))]
    return pa.concat_tables(tables).sort_by("url")


def test_resume_skips_completed_partitions(ray_session, out_dir):
    pages = make_pages_table(64, seed=42)
    ds = ray.data.from_arrow(pages)
    extract_pages(ds, batch_size=8, out_dir=out_dir, num_partitions=8)
    full = _read_all(out_dir)
    assert full.num_rows == 64
    done = completed_partitions(out_dir)
    assert len(done) >= 4

    # simulate a crash: delete half the partitions (data + marker)
    victims = sorted(done)[: len(done) // 2]
    survivors = sorted(done)[len(done) // 2 :]
    mtimes_before = {}
    for pid in victims:
        os.remove(os.path.join(out_dir, f"part-{pid:05d}.parquet"))
        os.remove(os.path.join(out_dir, f"part-{pid:05d}.done"))
    for pid in survivors:
        mtimes_before[pid] = os.path.getmtime(os.path.join(out_dir, f"part-{pid:05d}.parquet"))

    # rerun: only the missing partitions may be (re)written
    extract_pages(ray.data.from_arrow(pages), batch_size=8, out_dir=out_dir, num_partitions=8)
    for pid in survivors:
        assert os.path.getmtime(os.path.join(out_dir, f"part-{pid:05d}.parquet")) == mtimes_before[pid]
    resumed = _read_all(out_dir)
    assert resumed.equals(full)  # byte-equal content after resume


def test_marker_carries_content_hash(ray_session, out_dir):
    pages = make_pages_table(16, seed=42)
    extract_pages(ray.data.from_arrow(pages), batch_size=8, out_dir=out_dir, num_partitions=4)
    for pid in completed_partitions(out_dir):
        meta = read_marker(out_dir, pid)
        assert meta["rows"] > 0 and len(meta["content_md5"]) == 32


def test_stale_staging_not_compacted(ray_session, out_dir):
    """A crashed run's leftover _staging files must NOT be folded into
    the next run's partitions (they would silently duplicate rows, and
    the marker md5 — computed over the duplicated table — would hide
    it)."""
    pages = make_pages_table(48, seed=7)
    extract_pages(ray.data.from_arrow(pages), batch_size=8, out_dir=out_dir, num_partitions=8)
    full = _read_all(out_dir)

    # simulate a crash mid-phase-1: stale staging rows exist for a
    # partition that ALSO gets re-extracted by the next run
    stale_dir = os.path.join(out_dir, "_staging", "deadbeef")
    os.makedirs(stale_dir, exist_ok=True)
    victim = sorted(completed_partitions(out_dir))[0]
    stale_rows = pq.read_table(os.path.join(out_dir, f"part-{victim:05d}.parquet"))
    pq.write_table(stale_rows, os.path.join(stale_dir, f"{victim:05d}-stale.parquet"))
    os.remove(os.path.join(out_dir, f"part-{victim:05d}.parquet"))
    os.remove(os.path.join(out_dir, f"part-{victim:05d}.done"))

    extract_pages(ray.data.from_arrow(pages), batch_size=8, out_dir=out_dir, num_partitions=8)
    resumed = _read_all(out_dir)
    assert resumed.num_rows == full.num_rows  # no duplicated rows
    assert resumed.equals(full)


def test_empty_corpus_returns_empty_dataset(ray_session, out_dir):
    from dots_ocr_ray.schema import RESULT_SCHEMA

    empty = make_pages_table(0, seed=1)
    out = extract_pages(ray.data.from_arrow(empty), batch_size=8, out_dir=out_dir, num_partitions=4)
    assert out.count() == 0
    assert out.schema().names == RESULT_SCHEMA.names


def test_no_marker_for_missing_data(tmp_path):
    # a marker without its data file must not count as completed
    d = str(tmp_path)
    with open(os.path.join(d, "part-00003.done"), "w") as f:
        f.write("{}")
    assert completed_partitions(d) == set()


def test_manifest_via_filesystem_uri(tmp_path):
    """Manifests resolve through pyarrow.fs: a file:// URI behaves
    exactly like a bare local path (the S6 object-storage seam)."""
    from dots_ocr_ray.state.manifest import (
        list_partition_files,
        write_partition_atomic,
    )

    uri = f"file://{tmp_path}/out"
    tbl = pa.table({"url": ["u1", "u2"], "extracted_text": ["a", "b"]})
    write_partition_atomic(uri, 3, tbl, "x" * 32, extra={"ok": 2})
    assert completed_partitions(uri) == {3}
    assert completed_partitions(str(tmp_path / "out")) == {3}  # same dir, bare path
    meta = read_marker(uri, 3)
    assert meta["rows"] == 2 and meta["ok"] == 2
    files = list_partition_files(uri)
    assert len(files) == 1 and files[0].startswith("file://")
    assert pq.read_table(files[0]).num_rows == 2


def test_extract_pages_with_uri_out_dir(ray_session, tmp_path):
    pages = make_pages_table(16, seed=42)
    uri = f"file://{tmp_path}/out"
    out = extract_pages(ray.data.from_arrow(pages), batch_size=8, out_dir=uri, num_partitions=4)
    assert out.count() == 16
