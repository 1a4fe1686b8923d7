"""Partitioned, resumable output layout (reference S9/S10/J4 analogs).

The reference gates whole jobs on an ``.md5`` marker next to the
outputs (dotsocr_service.py:253-384, storage.py:165-228); here the unit
is one hash-keyed partition:

    out_dir/
      part-00007.parquet        # the data
      part-00007.done           # marker, written AFTER the data file

Markers commit atomically *after* the partition file (write to a temp
name, ``os.replace``, then marker) so a crashed run never leaves a
marker for a half-written partition — resume skips exactly the
partitions whose markers exist (SURVEY.md §7.4 hard part 5).

All listing and marker IO goes through ``pyarrow.fs`` so ``out_dir``
may be a filesystem URI (the reference's S6 object storage,
storage.py:22-163): a bare path resolves to LocalFileSystem, an
``s3://…``-style URI to the matching FileSystem.  On local paths the
data file is still committed via tmp-name + ``os.replace``; on object
stores the single-object PUT is already atomic and the marker (written
last) remains the commit point either way.
"""

from __future__ import annotations

import json
import os
import re

import pyarrow as pa
import pyarrow.fs as pafs
import pyarrow.parquet as pq

# \d{5,}: {pid:05d} spills past five digits above 99,999 partitions
# (the petabyte shard-count design point) — a fixed-width match would
# make those partitions invisible to resume and read-back
_MARKER_RE = re.compile(r"^part-(\d{5,})\.done$")
_PART_RE = re.compile(r"^part-(\d{5,})\.parquet$")


def resolve_fs(path: str) -> tuple[pafs.FileSystem, str]:
    """(filesystem, fs-local path) for a bare path or URI."""
    if "://" in path:
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


def partition_file(out_dir: str, partition_id: int) -> str:
    return os.path.join(out_dir, f"part-{partition_id:05d}.parquet")


def marker_file(out_dir: str, partition_id: int) -> str:
    return os.path.join(out_dir, f"part-{partition_id:05d}.done")


def _list_names(out_dir: str) -> dict[str, pafs.FileInfo]:
    fs, root = resolve_fs(out_dir)
    try:
        infos = fs.get_file_info(pafs.FileSelector(root, recursive=False))
    except (FileNotFoundError, OSError):
        return {}
    return {os.path.basename(fi.path): fi for fi in infos if fi.type == pafs.FileType.File}


def completed_partitions(out_dir: str) -> set[int]:
    """Scan markers → set of finished partition ids (the S10 analog:
    regex-scan of the output prefix, storage.py:199-228).  One listing
    call serves both the marker and the data-file existence check."""
    names = _list_names(out_dir)
    done = set()
    for name in names:
        m = _MARKER_RE.match(name)
        if m and f"part-{m.group(1)}.parquet" in names:
            done.add(int(m.group(1)))
    return done


def list_partition_files(out_dir: str) -> list[str]:
    """Final partition files under out_dir (full paths/URIs), in
    NUMERIC partition order (lexicographic order breaks once ids spill
    past the 5-digit padding)."""
    names = _list_names(out_dir)
    sep = "/" if "://" in out_dir else os.sep
    matched = [(int(m.group(1)), n) for n in names if (m := _PART_RE.match(n))]
    return [out_dir.rstrip(sep) + sep + n for _, n in sorted(matched)]


def write_partition_atomic(
    out_dir: str,
    partition_id: int,
    table: pa.Table,
    content_hash: str,
    extra: dict | None = None,
) -> None:
    """Data file first (tmp + rename on local fs, direct atomic PUT on
    object stores), marker last — marker presence implies a complete,
    readable partition.  ``extra`` fields (e.g. status counts) ride in
    the marker so resumed runs can rebuild the metrics table without
    re-reading data."""
    fs, root = resolve_fs(out_dir)
    fs.create_dir(root, recursive=True)
    final = f"{root}/part-{partition_id:05d}.parquet"
    local = isinstance(fs, pafs.LocalFileSystem)
    if local:
        tmp = final + ".tmp"
        pq.write_table(table, tmp, compression="zstd")
        os.replace(tmp, final)
    else:
        with fs.open_output_stream(final) as out:
            pq.write_table(table, out, compression="zstd")
    meta = {"partition_id": partition_id, "rows": table.num_rows, "content_md5": content_hash}
    if extra:
        meta.update(extra)
    payload = json.dumps(meta).encode("utf-8")
    marker = f"{root}/part-{partition_id:05d}.done"
    if local:
        mtmp = marker + ".tmp"
        with open(mtmp, "wb") as f:
            f.write(payload)
        os.replace(mtmp, marker)
    else:
        with fs.open_output_stream(marker) as out:
            out.write(payload)


def write_job_stats(out_dir: str, payload: dict) -> str:
    """Persist per-run execution stats next to the output partitions
    (`_job_stats.json`) — the engine's analog of the reference's
    tracing/metrics exporters (app/utils/metrics.py:9-26,
    app/utils/tracing.py): the Ray Data per-stage stats string plus
    job-level totals, so a slow 100-TB run can be diagnosed from the
    manifest alone, after the driver is gone."""
    fs, root = resolve_fs(out_dir)
    fs.create_dir(root, recursive=True)
    target = f"{root}/_job_stats.json"
    data = json.dumps(payload, indent=2, default=str).encode("utf-8")
    if isinstance(fs, pafs.LocalFileSystem):
        tmp = target + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, target)
    else:
        with fs.open_output_stream(target) as out:
            out.write(data)
    return target


def read_job_stats(out_dir: str) -> dict | None:
    fs, root = resolve_fs(out_dir)
    target = f"{root}/_job_stats.json"
    if fs.get_file_info(target).type != pafs.FileType.File:
        return None
    with fs.open_input_stream(target) as f:
        return json.loads(f.read().decode("utf-8"))


def read_marker(out_dir: str, partition_id: int) -> dict | None:
    fs, root = resolve_fs(out_dir)
    marker = f"{root}/part-{partition_id:05d}.done"
    info = fs.get_file_info(marker)
    if info.type != pafs.FileType.File:
        return None
    with fs.open_input_stream(marker) as f:
        return json.loads(f.read().decode("utf-8"))
