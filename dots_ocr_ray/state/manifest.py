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
"""

from __future__ import annotations

import json
import os
import re

import pyarrow as pa
import pyarrow.parquet as pq

_MARKER_RE = re.compile(r"^part-(\d{5})\.done$")


def partition_file(out_dir: str, partition_id: int) -> str:
    return os.path.join(out_dir, f"part-{partition_id:05d}.parquet")


def marker_file(out_dir: str, partition_id: int) -> str:
    return os.path.join(out_dir, f"part-{partition_id:05d}.done")


def completed_partitions(out_dir: str) -> set[int]:
    """Scan markers → set of finished partition ids (the S10 analog:
    regex-scan of the output prefix, storage.py:199-228)."""
    if not os.path.isdir(out_dir):
        return set()
    done = set()
    for name in os.listdir(out_dir):
        m = _MARKER_RE.match(name)
        if m and os.path.exists(partition_file(out_dir, int(m.group(1)))):
            done.add(int(m.group(1)))
    return done


def write_partition_atomic(
    out_dir: str,
    partition_id: int,
    table: pa.Table,
    content_hash: str,
    extra: dict | None = None,
) -> None:
    """Data file first (tmp + rename), marker last — marker presence
    implies a complete, readable partition.  ``extra`` fields (e.g.
    status counts) ride in the marker so resumed runs can rebuild the
    metrics table without re-reading data."""
    os.makedirs(out_dir, exist_ok=True)
    final = partition_file(out_dir, partition_id)
    tmp = final + ".tmp"
    pq.write_table(table, tmp, compression="zstd")
    os.replace(tmp, final)
    meta = {"partition_id": partition_id, "rows": table.num_rows, "content_md5": content_hash}
    if extra:
        meta.update(extra)
    mtmp = marker_file(out_dir, partition_id) + ".tmp"
    with open(mtmp, "w", encoding="utf-8") as f:
        json.dump(meta, f)
    os.replace(mtmp, marker_file(out_dir, partition_id))


def read_marker(out_dir: str, partition_id: int) -> dict | None:
    path = marker_file(out_dir, partition_id)
    if not os.path.exists(path):
        return None
    with open(path, encoding="utf-8") as f:
        return json.load(f)
