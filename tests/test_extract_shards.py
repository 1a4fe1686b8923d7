"""Tests for the zero-shuffle shard-aligned extraction pipeline."""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from dots_ocr_ray.fixtures import make_pages_table
from dots_ocr_ray.oracle import oracle_extract
from dots_ocr_ray.pipelines.extract import check_fail_gate, extract_shards
from dots_ocr_ray.state.manifest import completed_partitions


@pytest.fixture()
def shard_files(tmp_path):
    pages = make_pages_table(48, seed=42)
    files = []
    for s in range(4):
        f = str(tmp_path / f"shard-{s:02d}.parquet")
        pq.write_table(pages.slice(s * 12, 12), f)
        files.append(f)
    return files, pages


def _read_out(out_dir):
    parts = sorted(glob.glob(os.path.join(out_dir, "part-*.parquet")))
    return pa.concat_tables([pq.read_table(p) for p in parts])


def test_shard_pipeline_byte_identity(ray_session, shard_files, tmp_path):
    files, pages = shard_files
    out_dir = str(tmp_path / "out")
    metrics = extract_shards(files, out_dir, concurrency=2)
    assert metrics.num_rows == 4
    out = _read_out(out_dir)
    assert out.num_rows == 48
    expected = oracle_extract(pages)
    for row in out.to_pylist():
        assert row["extracted_text"] == expected[row["url"]]["extracted_text"]
    stats = check_fail_gate(metrics, threshold=0.5)
    assert stats["total"] == 48


def test_shard_resume_skips_done(ray_session, shard_files, tmp_path):
    files, _ = shard_files
    out_dir = str(tmp_path / "out")
    m1 = extract_shards(files, out_dir, concurrency=2)
    assert completed_partitions(out_dir) == {0, 1, 2, 3}
    # drop shard 2; rerun must recompute ONLY it, others untouched
    os.remove(os.path.join(out_dir, "part-00002.parquet"))
    os.remove(os.path.join(out_dir, "part-00002.done"))
    mtimes = {p: os.path.getmtime(os.path.join(out_dir, f"part-{p:05d}.parquet")) for p in (0, 1, 3)}
    m2 = extract_shards(files, out_dir, concurrency=2)
    for p in (0, 1, 3):
        assert os.path.getmtime(os.path.join(out_dir, f"part-{p:05d}.parquet")) == mtimes[p]
    # metrics identical whether computed fresh or folded back from markers
    a = sorted(m1.to_pylist(), key=lambda r: r["partition_id"])
    b = sorted(m2.to_pylist(), key=lambda r: r["partition_id"])
    for ra, rb in zip(a, b):
        for k in ("partition_id", "input_rows", "ok", "fallback", "failed", "bytes_in"):
            assert ra[k] == rb[k], (ra, rb)


def test_mega_shard_split_by_row_groups(ray_session, tmp_path):
    """max_rows_per_task splits an oversized parquet shard into
    row-group runs: more partitions, identical total output, exact
    resume on the split units."""
    import pyarrow.parquet as pq

    from dots_ocr_ray.fixtures import make_pages_table
    from dots_ocr_ray.pipelines.extract import extract_shards
    from dots_ocr_ray.state.manifest import completed_partitions, list_partition_files

    pages = make_pages_table(96, seed=11)
    big = tmp_path / "big.parquet"
    pq.write_table(pages, str(big), row_group_size=16)  # 6 row groups
    small = tmp_path / "small.parquet"
    pq.write_table(make_pages_table(8, seed=12), str(small))

    out_a = tmp_path / "whole"
    m_a = extract_shards([str(big), str(small)], str(out_a), batch_size=16)
    out_b = tmp_path / "split"
    m_b = extract_shards([str(big), str(small)], str(out_b), batch_size=16, max_rows_per_task=40)
    assert m_a.num_rows == 2
    assert m_b.num_rows == 4  # 3 runs of ≤40 rows (16+16, 16+16, 16+16) + small
    assert sum(m_b.column("input_rows").to_pylist()) == 104

    def _all_rows(d):
        tbls = [pq.read_table(f) for f in list_partition_files(str(d))]
        import pyarrow as pa

        return pa.concat_tables(tbls).sort_by("url")

    a, b = _all_rows(out_a), _all_rows(out_b)
    assert a.column("extracted_text").to_pylist() == b.column("extracted_text").to_pylist()

    # resume on split units: drop one unit, rerun, only that unit redone
    import os

    victim = 1
    os.remove(str(out_b / f"part-{victim:05d}.parquet"))
    os.remove(str(out_b / f"part-{victim:05d}.done"))
    m_b2 = extract_shards([str(big), str(small)], str(out_b), batch_size=16, max_rows_per_task=40)
    assert completed_partitions(str(out_b)) == {0, 1, 2, 3}
    redone = [r for r in m_b2.to_pylist() if r["wall_ms"] > 0]
    assert len(redone) == 1 and redone[0]["partition_id"] == victim


def test_extract_shards_persists_job_stats(ray_session, tmp_path, shard_files):
    """Every run leaves _job_stats.json next to the partitions: job
    totals always, the Ray Data per-stage stats string for the Dataset
    dispatch (raw-task dispatch records none)."""
    from dots_ocr_ray.state.manifest import read_job_stats

    files, _ = shard_files
    out = str(tmp_path / "out")
    metrics = extract_shards(files, out, batch_size=64)
    stats = read_job_stats(out)
    assert stats["job"] == "extract_shards"
    assert stats["totals"]["input_rows"] == sum(metrics.column("input_rows").to_pylist())
    assert isinstance(stats["dataset_stats"], str) and stats["dataset_stats"]

    # resumed run: stats rewritten, zero fresh partitions
    extract_shards(files, out, batch_size=64)
    stats2 = read_job_stats(out)
    assert stats2["fresh_partitions"] == 0
    assert stats2["totals"]["input_rows"] == stats["totals"]["input_rows"]
