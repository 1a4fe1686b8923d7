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
from dots_ocr_ray.state.manifest import (
    completed_partitions,
    list_partition_files,
    write_partition_atomic,
)

DEFAULT_NUM_PARTITIONS = 64


def read_pages(path: str, columns: list[str] | None = None, override_num_blocks: int | None = None) -> ray.data.Dataset:
    """Read the pages table with column pruning at the source."""
    kwargs = {}
    if override_num_blocks is not None:
        kwargs["override_num_blocks"] = override_num_blocks
    return ray.data.read_parquet(path, columns=columns, **kwargs)


_TASK_EXTRACTORS: dict = {}


def _extract_batch_task(batch: pa.Table, *, config, num_partitions: int) -> pa.Table:
    """Task-dispatch wrapper around the SAME ExtractorActor logic: the
    instance is built once per WORKER PROCESS (module-level cache —
    worker processes stay warm across tasks) instead of once per pool
    actor, so a query-sized run pays zero pool-ramp.  Output is
    bit-identical to the actor path (same __call__)."""
    key = (repr(config), num_partitions)
    actor = _TASK_EXTRACTORS.get(key)
    if actor is None:
        actor = ExtractorActor(config=config, num_partitions=num_partitions)
        _TASK_EXTRACTORS.clear()  # one live config per worker is plenty
        _TASK_EXTRACTORS[key] = actor
    return actor(batch)


def extract_pages(
    pages: ray.data.Dataset,
    config: ExtractConfig | None = None,
    *,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 64,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
    out_dir: str | None = None,
    resume: bool = True,
    num_cpus: float = 1.0,
    dispatch: str = "actors",
) -> ray.data.Dataset:
    """Run the extraction stage over a pages Dataset.

    ``dispatch="actors"`` (default) is the model seam: an actor pool
    whose per-actor ``__init__`` is where a real VLM/layout model
    loads once (reference A1/A3).  ``dispatch="tasks"`` runs the SAME
    kernel as plain tasks with a per-worker-process warm instance —
    right for the built-in heuristic kernel whose state is compiled
    regexes (module-warm anyway): no pool ramp, identical output.

    ``num_cpus`` sets the per-actor CPU reservation (per-stage resource
    sizing: raise it for a heavier model-backed extractor so
    concurrency × num_cpus still fits the node).

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

    if dispatch == "tasks":
        extracted = ds.map_batches(
            _extract_batch_task,
            fn_kwargs={"config": config or ExtractConfig(), "num_partitions": num_partitions},
            batch_format="pyarrow",
            batch_size=batch_size,
            num_cpus=num_cpus,
        )
    else:
        if concurrency is None:
            # autoscaling pool leaving headroom for read/write stages so
            # the pool doesn't starve them (ray_guide: size
            # concurrency×num_cpus below the node's CPU count); min 1 so
            # small jobs skip the ramp
            from dots_ocr_ray.util import autoscale_pool

            concurrency = autoscale_pool()

        extracted = ds.map_batches(
            ExtractorActor,
            fn_constructor_kwargs={"config": config or ExtractConfig(), "num_partitions": num_partitions},
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=num_cpus,
        )

    if out_dir is None:
        return extracted

    write_extracted(extracted, out_dir, num_partitions=num_partitions)
    part_files = list_partition_files(out_dir)
    if not part_files:
        # empty corpus (or every partition filtered by resume AND no
        # prior output): an empty dataset with the result schema, not a
        # read_parquet([]) ValueError
        from dots_ocr_ray.schema import RESULT_SCHEMA

        return ray.data.from_arrow(RESULT_SCHEMA.empty_table())
    # read back through the resolved filesystem so out_dir may be a URI
    from dots_ocr_ray.state.manifest import resolve_fs

    fs, _ = resolve_fs(out_dir)
    return ray.data.read_parquet([resolve_fs(p)[1] for p in part_files], filesystem=fs)


def write_extracted(
    extracted: ray.data.Dataset,
    out_dir: str,
    *,
    num_partitions: int = DEFAULT_NUM_PARTITIONS,
) -> pa.Table:
    """Write extraction results as hash-partitioned parquet with done
    markers, emitting per-partition lineage/metrics in the SAME pass.

    The exchange is a two-phase write-then-compact through the output
    store (the standard shared-storage shuffle for petabyte batch
    jobs): phase 1 streams extraction batches and appends each
    partition_id's rows to staging files under ``out_dir/_staging``;
    phase 2 compacts each partition's staging files into its final
    ``part-XXXXX.parquet`` (rows sorted by url → byte-deterministic)
    + marker, one task per partition, emitting the METRICS_SCHEMA row.

    Both phases are embarrassingly parallel — no object-store
    all-to-all.  Measured against the alternatives on this node:
    sort-shuffle groupby cost ~10 s of barrier on a 20 k-row corpus;
    the hash-shuffle strategy's aggregator actors deadlock against a
    near-full extract actor pool.  At cluster scale ``out_dir`` must be
    shared storage (it is the job's output store anyway).
    """
    import os
    import uuid

    import pyarrow.fs as pafs
    import pyarrow.parquet as pq

    from dots_ocr_ray.state.manifest import resolve_fs

    # per-RUN staging subdir: a crashed previous run leaves its staging
    # files behind, and compacting those together with this run's rows
    # silently duplicates data (the marker md5 is computed over the
    # duplicated table, so the corruption would be undetectable).  A
    # unique run dir means phase 2 only ever sees this run's files;
    # stale run dirs are swept here, before any new staging is written.
    # All staging IO resolves through pyarrow.fs so out_dir may be a
    # filesystem URI (manifest.py S6 seam); FileSystem objects pickle
    # into the staging/compact tasks.
    fs, root = resolve_fs(out_dir)
    root_stage = f"{root}/_staging"
    if fs.get_file_info(root_stage).type == pafs.FileType.Directory:
        fs.delete_dir(root_stage)
    stage_dir = f"{root_stage}/{uuid.uuid4().hex}"
    fs.create_dir(stage_dir, recursive=True)

    def _stage(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"partition_id": pa.array([], type=pa.int32())})
        tag = uuid.uuid4().hex  # staging names need uniqueness only
        pids = pc.unique(batch.column("partition_id")).to_pylist()
        for pid in pids:
            sub = batch.filter(pc.equal(batch.column("partition_id"), pid))
            with fs.open_output_stream(f"{stage_dir}/{pid:05d}-{tag}.parquet") as sink:
                pq.write_table(sub, sink, compression="lz4")
        return pa.table({"partition_id": pa.array(pids, type=pa.int32())})

    extracted.map_batches(_stage, batch_format="pyarrow").materialize()

    staged = [
        os.path.basename(fi.path)
        for fi in fs.get_file_info(pafs.FileSelector(stage_dir, recursive=False))
        if fi.type == pafs.FileType.File
    ]
    pids = sorted({int(name.split("-")[0]) for name in staged if name.endswith(".parquet")})

    def _compact(batch: pa.Table) -> pa.Table:
        rows = []
        for pid in batch.column("pid").to_pylist():
            t0 = time.perf_counter()
            files = sorted(n for n in staged if n.startswith(f"{pid:05d}-"))
            group = pa.concat_tables(
                [pq.read_table(f"{stage_dir}/{n}", filesystem=fs) for n in files]
            )
            # deterministic within-partition order → byte-stable files
            group = group.sort_by("url")
            content = md5_hex("".join(group.column("extracted_text").to_pylist()))
            write_partition_atomic(out_dir, pid, group, content)
            statuses = group.column("status").to_pylist()
            rows.append(
                {
                    "partition_id": pid,
                    "input_rows": group.num_rows,
                    "ok": sum(s == "finished" for s in statuses),
                    "fallback": sum(s == "fallback" for s in statuses),
                    "failed": sum(s == "failed" for s in statuses),
                    "bytes_in": pc.sum(group.column("bytes_in")).as_py() or 0,
                    "wall_ms": int((time.perf_counter() - t0) * 1000),
                }
            )
        return pa.Table.from_pylist(rows, schema=METRICS_SCHEMA)

    metrics_ds = ray.data.from_items([{"pid": p} for p in pids]).map_batches(
        _compact, batch_format="pyarrow", batch_size=1
    )
    metrics = pa.Table.from_pylist(metrics_ds.take_all(), schema=METRICS_SCHEMA)
    try:
        fs.delete_dir(root_stage)
    except (FileNotFoundError, OSError):
        pass
    return metrics


def _shard_record_batches(path: str, batch_size: int, row_groups: list[int] | None = None):
    """Stream a shard file as pages batches: parquet shards read
    column-pruned (optionally only the listed row groups — the
    mega-shard split unit); ``*.warc`` / ``*.warc.gz`` shards stream
    through the pure-Python WARC walker (sources/warc.py) — the
    flagship's partition == input-shard layout is format-agnostic."""
    import pyarrow.parquet as pq

    if path.endswith((".warc", ".warc.gz")):
        from dots_ocr_ray.sources.warc import _warc_file_batches

        for tbl in _warc_file_batches(path, frozenset({"response"}), batch_size):
            yield tbl.select(["url", "html", "text", "lang"])
        return
    cols = ["url", "html", "text", "lang"]
    if row_groups is None:
        tbl = pq.read_table(path, columns=cols)
    else:
        tbl = pq.ParquetFile(path).read_row_groups(list(row_groups), columns=cols)
    for off in range(0, tbl.num_rows, batch_size):
        yield tbl.slice(off, batch_size)


def _shard_units(shard_files: list[str], max_rows_per_task: int | None) -> list[tuple[str, list[int] | None]]:
    """Deterministic work-unit list: one unit per shard file, except
    parquet shards above ``max_rows_per_task`` rows, which split into
    runs of whole row groups (the mega-shard straggler guard, SURVEY
    §7.4 hard part 6 — one 10× shard no longer holds a wave hostage).
    Unit ids (= partition ids) depend only on the file list and the
    split threshold, so resume stays exact."""
    import pyarrow.parquet as pq

    if max_rows_per_task is None:
        return [(p, None) for p in shard_files]
    units: list[tuple[str, list[int] | None]] = []
    for p in shard_files:
        if p.endswith((".warc", ".warc.gz")):
            units.append((p, None))  # warc shards stream; no cheap row metadata
            continue
        md = pq.ParquetFile(p).metadata
        if md.num_rows <= max_rows_per_task or md.num_row_groups <= 1:
            units.append((p, None))
            continue
        run: list[int] = []
        run_rows = 0
        for rg in range(md.num_row_groups):
            nrows = md.row_group(rg).num_rows
            if run and run_rows + nrows > max_rows_per_task:
                units.append((p, run))
                run, run_rows = [], 0
            run.append(rg)
            run_rows += nrows
        if run:
            units.append((p, run))
    return units


def _process_one_shard(
    shard: int,
    path: str,
    out_dir: str,
    config: ExtractConfig,
    batch_size: int,
    n_shards: int,
    row_groups: list[int] | None = None,
) -> dict | None:
    """One whole input shard → final partition file + marker; returns
    the partition's metrics row (None for an empty shard)."""
    import pyarrow.parquet as pq

    # honor the task's 1-CPU allocation: pyarrow's internal pool would
    # otherwise fan compression/decompression across every PHYSICAL
    # core, silently oversubscribing the node (and faking scaling
    # numbers on a shared box)
    if pa.cpu_count() != 1:
        pa.set_cpu_count(1)
        pa.set_io_thread_count(2)

    t0 = time.perf_counter()
    extractor = ExtractorActor(config=config, num_partitions=n_shards)
    outs = []
    for batch in _shard_record_batches(path, batch_size, row_groups):
        chunk = extractor(batch)
        # partition identity is the shard, not the url hash
        pid_col = pa.array([shard] * chunk.num_rows, type=pa.int32())
        chunk = chunk.set_column(chunk.column_names.index("partition_id"), "partition_id", pid_col)
        outs.append(chunk)
    group = pa.concat_tables(outs) if outs else None
    if group is None or group.num_rows == 0:
        # an EMPTY shard still gets its done marker: without one,
        # resume never sees the shard as finished and re-downloads and
        # re-parses the whole file on every run of an already-complete
        # job (and the job totals fluctuate across resumes)
        from dots_ocr_ray.schema import RESULT_SCHEMA

        empty = RESULT_SCHEMA.empty_table()
        write_partition_atomic(
            out_dir,
            shard,
            empty,
            md5_hex(""),
            extra={"ok": 0, "fallback": 0, "failed": 0, "bytes_in": 0},
        )
        return {
            "partition_id": shard,
            "input_rows": 0,
            "ok": 0,
            "fallback": 0,
            "failed": 0,
            "bytes_in": 0,
            "wall_ms": int((time.perf_counter() - t0) * 1000),
        }
    content = md5_hex("".join(group.column("extracted_text").to_pylist()))
    statuses = group.column("status").to_pylist()
    counts = {
        "ok": sum(s == "finished" for s in statuses),
        "fallback": sum(s == "fallback" for s in statuses),
        "failed": sum(s == "failed" for s in statuses),
        "bytes_in": pc.sum(group.column("bytes_in")).as_py() or 0,
    }
    write_partition_atomic(out_dir, shard, group, content, extra=counts)
    return {
        "partition_id": shard,
        "input_rows": group.num_rows,
        **counts,
        "wall_ms": int((time.perf_counter() - t0) * 1000),
    }


def _run_shard_task(
    batch: pa.Table,
    *,
    out_dir: str,
    config: ExtractConfig,
    batch_size: int,
    n_shards: int,
) -> pa.Table:
    """map_batches wrapper around :func:`_process_one_shard`
    (module-level so Ray pickles it by reference and worker processes
    keep the imported module warm across tasks)."""
    rows = []
    rgs = (
        batch.column("row_groups").to_pylist()
        if "row_groups" in batch.column_names
        else [None] * batch.num_rows
    )
    for shard, path, rg in zip(
        batch.column("shard").to_pylist(), batch.column("path").to_pylist(), rgs
    ):
        row = _process_one_shard(shard, path, out_dir, config, batch_size, n_shards, rg)
        if row is not None:
            rows.append(row)
    if not rows:
        return METRICS_SCHEMA.empty_table()
    return pa.Table.from_pylist(rows, schema=METRICS_SCHEMA)


def extract_shards(
    shard_files: list[str],
    out_dir: str,
    config: ExtractConfig | None = None,
    *,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 256,
    resume: bool = True,
    dispatch: str = "ray_data",
    max_rows_per_task: int | None = None,
) -> pa.Table:
    """Zero-shuffle flagship: output partition == input shard.

    A Dataset OF SHARD PATHS fans out one task per input parquet shard;
    each task reads its shard, runs the extraction kernel, writes the
    final ``part-{shard:05d}.parquet`` + done marker and returns the
    partition's METRICS_SCHEMA row.  No exchange at all: rows keep
    input-file order (deterministic), checkpointing is input-aligned
    (the reference's md5 skip gate operates at exactly this unit — one
    input document, dotsocr_service.py:253-348), and scaling is linear
    in shards.  Use :func:`extract_pages` + :func:`write_extracted`
    instead when downstream work needs url-hash-partitioned output.

    Skew note: one mega-shard straggles a wave — keep shard count ≥ 2×
    task slots when producing the input layout (SURVEY §7.4 hard part
    6), or set ``max_rows_per_task`` to split oversized parquet shards
    into row-group runs (deterministic unit ids, so resume is exact as
    long as the file list and threshold are unchanged).
    Returns the metrics table for ALL partitions (completed ones read
    back from their markers).

    ``concurrency`` is accepted for API symmetry but ignored: the
    workers are stateless TASKS (the scheduler packs them onto all
    available CPUs), not an actor pool.
    """
    import pyarrow.parquet as pq

    cfg = config or ExtractConfig()
    units = _shard_units(shard_files, max_rows_per_task)
    done = completed_partitions(out_dir) if resume else set()
    items = [
        {"shard": i, "path": p, "row_groups": rg}
        for i, (p, rg) in enumerate(units)
        if i not in done
    ]

    import functools

    fresh = []
    dataset_stats = None
    if items:
        if dispatch == "tasks":
            # raw-task dispatch for the shard MANIFEST (job-orchestration
            # layer): a fixed list of coarse work units doesn't need the
            # Dataset planner — measured ~25 ms for 129 tasks vs ~1 s of
            # streaming-executor fixed cost.  Row-level work inside each
            # task still runs the same Arrow-batch extractor.
            remote_fn = ray.remote(num_cpus=1)(_process_one_shard)
            refs = [
                remote_fn.remote(
                    it["shard"], it["path"], out_dir, cfg, batch_size,
                    max(1, len(units)), it["row_groups"],
                )
                for it in items
            ]
            fresh = [r for r in ray.get(refs) if r is not None]
        else:
            # one block per shard so every shard is an independent task —
            # from_items may pack the tiny manifest into few blocks, which
            # would serialize whole groups of shards onto one worker.
            # STATELESS tasks (not an actor pool): the extractor holds no
            # heavy per-worker state (compiled regexes are module-level,
            # the reference's lazy-singleton seam A3/A4), and tasks reuse
            # warm worker processes with zero pool-ramp cost per run.
            work = ray.data.from_items(items, override_num_blocks=len(items))
            fn = functools.partial(
                _run_shard_task,
                out_dir=out_dir,
                config=cfg,
                batch_size=batch_size,
                n_shards=max(1, len(units)),
            )
            metrics_ds = work.map_batches(fn, batch_size=1, batch_format="pyarrow")
            fresh = metrics_ds.take_all()
            dataset_stats = metrics_ds.stats()

    # fold in already-completed partitions from their markers (resume)
    from dots_ocr_ray.state.manifest import read_marker

    for pid in sorted(done):
        meta = read_marker(out_dir, pid) or {}
        fresh.append(
            {
                "partition_id": pid,
                "input_rows": meta.get("rows", 0),
                "ok": meta.get("ok", 0),
                "fallback": meta.get("fallback", 0),
                "failed": meta.get("failed", 0),
                "bytes_in": meta.get("bytes_in", 0),
                "wall_ms": 0,
            }
        )
    tbl = pa.Table.from_pylist(sorted(fresh, key=lambda r: r["partition_id"]), schema=METRICS_SCHEMA)

    # persist per-run execution stats next to the outputs (the
    # reference's tracing/metrics analog, app/utils/metrics.py:9-26):
    # job totals always; the Ray Data per-stage stats string when the
    # run went through the Dataset planner (raw-task dispatch has none)
    from dots_ocr_ray.state.manifest import write_job_stats

    write_job_stats(
        out_dir,
        {
            "job": "extract_shards",
            "dispatch": dispatch,
            "num_units": len(units),
            "resumed_partitions": len(done),
            "fresh_partitions": len(items),
            "totals": {
                c: int(pc.sum(tbl.column(c)).as_py() or 0)
                for c in ("input_rows", "ok", "fallback", "failed", "bytes_in", "wall_ms")
            },
            "dataset_stats": dataset_stats,
        },
    )
    return tbl


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
        # attribute the batch's wall time PROPORTIONALLY to each
        # partition's row share: charging the full batch wall to every
        # pid in the batch inflated the summed wall by the number of
        # distinct pids per batch
        wall_us = (time.perf_counter() - t0) * 1e6
        n_rows = max(len(pids), 1)
        for row in agg.values():
            row[5] = int(wall_us * row[0] / n_rows / 1000)
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
    if isinstance(metrics, pa.Table):
        tbl = metrics
    else:
        from dots_ocr_ray.schema import METRICS_SCHEMA

        # schema-pinned: from_pylist([]) on an empty corpus would have
        # no columns at all and KeyError instead of a zero-stats dict
        tbl = pa.Table.from_pylist(metrics.take_all(), schema=METRICS_SCHEMA)
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


def host_failure_wilson(
    extracted: ray.data.Dataset,
    *,
    url_col: str = "url",
    status_col: str = "status",
    z: float = 1.96,
) -> ray.data.Dataset:
    """Per-host extraction-health ranking: failure count, total, and
    the Wilson-score LOWER bound of the failure rate in micro units —
    the alerting statistic that won't page on a 1-failure/2-page host
    the way a raw ratio does (reference analog: the fail-ratio gate,
    G3, generalized from job-level to host-level).

    Shape: hosts come from the REAL url column (one vectorized
    ``extract_regex``), per-batch partial (n, failed) counts keyed by
    host, one bounded groupby fold, then the closed-form Wilson bound
    with a FIXED operand order mirrored literally by the SQL oracle
    (exact integer counts → identical IEEE doubles → micro-floor)."""
    import numpy as np

    def _partial(batch: pa.Table) -> pa.Table:
        hosts = pc.extract_regex(
            batch.column(url_col), r"^https?://(?P<host>[^/]+)"
        ).combine_chunks().field("host")
        failed = pc.cast(
            pc.equal(batch.column(status_col), "failed"), pa.int64()
        )
        part = pa.table({"host": hosts, "f": failed}).group_by("host").aggregate(
            [("f", "sum"), ("f", "count")]
        )
        return part.rename_columns(["host", "f", "n"])

    # coarse 256-way exchange on hash(host); the fold sums every
    # host's partials with one sort + reduceat and evaluates the
    # Wilson bound VECTORIZED with the same elementwise IEEE operand
    # order the scalar form (and the SQL oracle) uses — one Python
    # call per coarse bucket, not per host
    from dots_ocr_ray.pipelines.relational import _stable_key_hash

    def _tag(batch: pa.Table) -> pa.Table:
        bkt = (_stable_key_hash(batch.column("host")) % np.uint64(256)).astype(
            np.int32
        )
        return batch.append_column("__bucket", pa.array(bkt, type=pa.int32()))

    def _fold(group: pa.Table) -> pa.Table:
        group = group.sort_by([("host", "ascending")])
        m = group.num_rows
        hosts = group.column("host")
        if isinstance(hosts, pa.ChunkedArray):
            hosts = hosts.combine_chunks()
        new_run = np.ones(m, dtype=bool)
        if m > 1:
            new_run[1:] = pc.not_equal(hosts.slice(1), hosts.slice(0, m - 1)).to_numpy(
                zero_copy_only=False
            )
        starts = np.flatnonzero(new_run)
        nv = group.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        fv = group.column("f").to_numpy(zero_copy_only=False).astype(np.int64)
        n = np.add.reduceat(nv, starts).astype(np.float64)
        f = np.add.reduceat(fv, starts).astype(np.float64)
        p = f * 1.0 / n
        z2 = z * z
        arg = p * (1.0 - p) / n + z2 / (4.0 * n * n)
        lb = (p + z2 / (2 * n) - z * np.sqrt(arg)) / (1 + z2 / n)
        return pa.table(
            {
                "host": hosts.take(pa.array(starts)),
                "n": pa.array(n.astype(np.int64), pa.int64()),
                "f": pa.array(f.astype(np.int64), pa.int64()),
                "wilson_lb_micro": pa.array(
                    np.floor(1000000 * lb).astype(np.int64), pa.int64()
                ),
            }
        )

    return (
        extracted.map_batches(_partial, batch_format="pyarrow")
        .map_batches(_tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(_fold, batch_format="pyarrow")
    )
