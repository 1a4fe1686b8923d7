"""The flagship extraction pipeline (SURVEY.md §7.1).

    pages parquet ──read_parquet(columns pruned)──▶ Dataset
      └─ [resume] filter out completed partitions (anti-join vs markers)
      └─ map_batches(ExtractorActor, batch_format="pyarrow",
                     concurrency=N)                 ← the actor pool
      └─ either: write partitioned parquet + done markers (resumable)
         or:     stream results onward
      └─ metrics: per-batch partial counts → tiny groupby → METRICS rows
      └─ fail gate: failed/total > 10% raises (reference configs.py:79)

Everything streams; nothing materializes the full dataset on the
driver.  The ``html`` payload column is dropped inside the extract
stage so only narrow result blocks move through shuffles/sinks.
"""

from __future__ import annotations

import time

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from dots_ocr_ray.kernel.extract import ExtractConfig
from dots_ocr_ray.kernel.textops import md5_hex
from dots_ocr_ray.schema import METRICS_SCHEMA, TASK_FAIL_THRESHOLD
from dots_ocr_ray.stages.extract_stage import ExtractorActor, url_partition_id
from dots_ocr_ray.state.manifest import completed_partitions, write_partition_atomic

DEFAULT_NUM_PARTITIONS = 64


def read_pages(path: str, columns: list[str] | None = None, override_num_blocks: int | None = None) -> ray.data.Dataset:
    """Read the pages table with column pruning at the source."""
    kwargs = {}
    if override_num_blocks is not None:
        kwargs["override_num_blocks"] = override_num_blocks
    return ray.data.read_parquet(path, columns=columns, **kwargs)


def extract_pages(
    pages: ray.data.Dataset,
    config: ExtractConfig | None = None,
    *,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 64,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    out_dir: str | None = None,
    resume: bool = True,
) -> ray.data.Dataset:
    """Run the extraction actor pool over a pages Dataset.

    With ``out_dir`` the result is written as hash-partitioned parquet
    with done markers (resumable: already-marked partitions are filtered
    BEFORE extraction — the reference's md5 skip gate, J4) and the
    returned Dataset reads back the full output directory.  Without it
    the extracted Dataset is returned streaming, unwritten.

    ``batch_size`` is deliberately small: one row can carry MBs of html,
    and batch × concurrency must fit the worker heap (SURVEY §7.4).
    """
    ds = pages
    if out_dir and resume:
        done = completed_partitions(out_dir)
        if done:
            done_ref = done  # captured by value in the closure; small set

            def _not_done(batch: pa.Table) -> pa.Table:
                pids = [url_partition_id(u, num_partitions) for u in batch.column("url").to_pylist()]
                mask = pa.array([p not in done_ref for p in pids])
                return batch.filter(mask)

            ds = ds.map_batches(_not_done, batch_format="pyarrow", batch_size=batch_size)

    if concurrency is None:
        # actor-pool size: leave headroom for read/write stages so the
        # pool doesn't starve them (ray_guide: size concurrency×num_cpus
        # below the node's CPU count)
        try:
            ncpu = int(ray.cluster_resources().get("CPU", 4))
        except Exception:
            ncpu = 4
        concurrency = max(2, ncpu - 1)

    extracted = ds.map_batches(
        ExtractorActor,
        fn_constructor_kwargs={"config": config or ExtractConfig(), "num_partitions": num_partitions},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )

    if out_dir is None:
        return extracted

    write_extracted(extracted, out_dir, num_partitions=num_partitions)
    import glob as _glob
    import os as _os

    part_files = sorted(_glob.glob(_os.path.join(out_dir, "part-*.parquet")))
    return ray.data.read_parquet(part_files)


def write_extracted(
    extracted: ray.data.Dataset,
    out_dir: str,
    *,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> pa.Table:
    """Write extraction results as hash-partitioned parquet with done
    markers, emitting per-partition lineage/metrics in the SAME pass.

    One keyed exchange co-locates each partition_id; the write function
    writes one file+marker per partition id and returns METRICS_SCHEMA
    rows — write + metrics cost ONE execution, not two.

    Exchange choice: ``groupby(partition_id)`` (sort-based pull
    shuffle).  The hash-shuffle strategy was measured too: its
    aggregator ACTORS deadlock against a near-full extract actor pool
    on a small node (they can't get CPUs), so the sort shuffle is the
    robust default; at real cluster scale flip
    ``DataContext.shuffle_strategy`` and re-measure.
    """

    def _write_group(group: pa.Table) -> pa.Table:
        t0 = time.perf_counter()
        pid = group.column("partition_id")[0].as_py()
        # deterministic within-partition order → byte-stable files
        group = group.sort_by("url")
        content = md5_hex("".join(group.column("extracted_text").to_pylist()))
        write_partition_atomic(out_dir, pid, group, content)
        statuses = group.column("status").to_pylist()
        row = {
            "partition_id": pid,
            "input_rows": group.num_rows,
            "ok": sum(s == "finished" for s in statuses),
            "fallback": sum(s == "fallback" for s in statuses),
            "failed": sum(s == "failed" for s in statuses),
            "bytes_in": pc.sum(group.column("bytes_in")).as_py() or 0,
            "wall_ms": int((time.perf_counter() - t0) * 1000),
        }
        return pa.Table.from_pylist([row], schema=METRICS_SCHEMA)

    metrics_ds = extracted.groupby("partition_id").map_groups(_write_group, batch_format="pyarrow")
    return pa.Table.from_pylist(metrics_ds.take_all(), schema=METRICS_SCHEMA)


def compute_metrics(extracted: ray.data.Dataset) -> ray.data.Dataset:
    """Per-partition lineage/metrics (north_rule): partial counts inside
    map_batches (combiner) → small groupby — no full-row shuffle."""

    def _partials(batch: pa.Table) -> pa.Table:
        t0 = time.perf_counter()
        pids = batch.column("partition_id").to_pylist()
        statuses = batch.column("status").to_pylist()
        nbytes = batch.column("bytes_in").to_pylist()
        agg: dict[int, list[int]] = {}
        for pid, st, b in zip(pids, statuses, nbytes):
            row = agg.setdefault(pid, [0, 0, 0, 0, 0, 0])
            row[0] += 1
            row[1] += st == "finished"
            row[2] += st == "fallback"
            row[3] += st == "failed"
            row[4] += b
        wall_ms = int((time.perf_counter() - t0) * 1000)
        for row in agg.values():
            row[5] = wall_ms
        return pa.table(
            {
                "partition_id": pa.array(list(agg.keys()), type=pa.int32()),
                "input_rows": pa.array([r[0] for r in agg.values()], type=pa.int64()),
                "ok": pa.array([r[1] for r in agg.values()], type=pa.int64()),
                "fallback": pa.array([r[2] for r in agg.values()], type=pa.int64()),
                "failed": pa.array([r[3] for r in agg.values()], type=pa.int64()),
                "bytes_in": pa.array([r[4] for r in agg.values()], type=pa.int64()),
                "wall_ms": pa.array([r[5] for r in agg.values()], type=pa.int64()),
            }
        )

    partials = extracted.map_batches(_partials, batch_format="pyarrow")
    aggregated = partials.groupby("partition_id").sum(
        ["input_rows", "ok", "fallback", "failed", "bytes_in", "wall_ms"]
    )

    def _rename(batch: pa.Table) -> pa.Table:
        mapping = {f"sum({c})": c for c in ["input_rows", "ok", "fallback", "failed", "bytes_in", "wall_ms"]}
        return batch.rename_columns([mapping.get(n, n) for n in batch.column_names])

    return aggregated.map_batches(_rename, batch_format="pyarrow")


def check_fail_gate(metrics, threshold: float = TASK_FAIL_THRESHOLD) -> dict:
    """Job-level fail-ratio gate (reference dotsocr_service.py:430-443,
    threshold configs.py:79).  Accepts a metrics Dataset or Arrow table;
    returns the totals; raises when breached."""
    tbl = metrics if isinstance(metrics, pa.Table) else pa.Table.from_pylist(metrics.take_all())
    total = pc.sum(tbl.column("input_rows")).as_py() or 0
    failed = pc.sum(tbl.column("failed")).as_py() or 0
    stats = {
        "total": total,
        "ok": pc.sum(tbl.column("ok")).as_py() or 0,
        "fallback": pc.sum(tbl.column("fallback")).as_py() or 0,
        "failed": failed,
    }
    if total and failed / total > threshold:
        raise RuntimeError(
            f"job failed: {failed}/{total} rows failed "
            f"(> {threshold:.0%} threshold, reference configs.py:79)"
        )
    return stats
