"""Small shared runtime helpers."""

from __future__ import annotations

import ray


def _arrow_unicode_warmup() -> None:
    """Fill Arrow's lazily-initialized unicode lookup tables while the
    importing thread holds the module import lock.

    Arrow's utf8 string kernels build their unicode tables on FIRST
    use; inside a multi-threaded Ray worker that first call can race
    the lazy init and silently return wrong results (observed here:
    ``utf8_split_whitespace(" ") -> [" "]`` — the space not recognized
    as whitespace — on a worker's first batch, ~once per hundreds of
    fresh workers).  One single-threaded call per process makes every
    later kernel call see completed tables.  This module is imported
    (directly or transitively) by every pipeline UDF, so unpickling a
    UDF in a worker runs the warmup before the UDF can touch a kernel.
    """
    try:  # pragma: no cover - trivial, but must never break import
        import pyarrow as _pa
        import pyarrow.compute as _pc

        _pc.utf8_split_whitespace(_pa.array([" a\tb\nc "]))
        _pc.utf8_is_alpha(_pa.array(["aé1"]))
        _pc.utf8_lower(_pa.array(["ÁB"]))
    except Exception:
        pass


_arrow_unicode_warmup()


def split_whitespace_checked(col):
    """``pc.utf8_split_whitespace`` with an IN-CALL canary and a pure-
    Python fallback.

    Rarely, an Arrow utf8 kernel invocation inside a Ray worker
    misclassifies whitespace (observed: ``utf8_split_whitespace(" ")
    -> [" "]`` — the space not split — on isolated calls, ~1 in
    thousands; a separate canary call can PASS while the real call is
    corrupted, so the canary rows are appended to the batch and split
    IN THE SAME kernel invocation).  On canary mismatch the whole
    batch is split in Python with the same per-whitespace-char
    structure (boundary/interior empties preserved) so downstream
    empty-filtering arithmetic is unchanged.

    Nulls are treated as "" (every caller's ``t or ""`` convention).
    The result is REBUILT (offsets + trimmed child) rather than sliced,
    because ``.values`` on a sliced ListArray ignores the slice window
    and would leak the canary tokens to offset-based consumers like
    substring._tokens_from_batch."""
    import re

    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not pa.types.is_string(col.type) and not pa.types.is_large_string(col.type):
        col = col.cast(pa.string())  # e.g. an all-null block infers type null
    col = pc.fill_null(col, "")
    canary = pa.array([" ", "\n\n", "\ta\n b  c ", ""], type=col.type)
    lists = pc.utf8_split_whitespace(pa.concat_arrays([col, canary]))
    n = len(col)
    tail = lists.slice(n, 4).to_pylist()
    ok = (
        len(tail) == 4
        and all(t == "" for t in tail[0])
        and len(tail[0]) >= 2
        and all(t == "" for t in tail[1])
        and len(tail[1]) >= 2
        and [t for t in tail[2] if t] == ["a", "b", "c"]
        and tail[3] == [""]
    )
    if ok:
        offsets = lists.offsets.slice(0, n + 1)
        end = offsets[-1].as_py() if n else 0
        return pa.ListArray.from_arrays(offsets, lists.values.slice(0, end))
    py = [re.split(r"\s", t) for t in col.to_pylist()]
    return pa.array(py, type=pa.list_(pa.string()))


def ws_token_counts_checked(col):
    """Vectorized ``len(text.split())`` per row with an END-TO-END
    in-call canary over the full kernel chain (split → value_length →
    flatten → parent_indices → equal → filter), because any single
    link can be the one that misbehaves on a given invocation.  Canary
    rows ride the same batch through the same chain; if their final
    counts are wrong the whole batch recomputes in Python.  Returns an
    int64 numpy array aligned to the input (nulls count 0)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if not pa.types.is_string(col.type) and not pa.types.is_large_string(col.type):
        col = col.cast(pa.string())  # e.g. an all-null block infers type null
    n_rows = len(col)
    canary = pa.array([" ", "\n\n", "\ta\n b  c ", "", "x"], type=col.type)
    full = pa.concat_arrays([pc.fill_null(col, "").cast(col.type), canary])
    lists = pc.utf8_split_whitespace(full)
    n = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
    toks = pc.list_flatten(lists)
    parents = pc.list_parent_indices(lists)
    empt = pc.equal(toks, "")
    empty_parents = parents.filter(empt).to_numpy(zero_copy_only=False)
    if len(empty_parents):
        n -= np.bincount(empty_parents, minlength=len(n)).astype(np.int64)
    if list(n[n_rows:]) == [0, 0, 3, 0, 1]:
        return n[:n_rows]
    return np.array(
        [len(t.split()) if t else 0 for t in col.to_pylist()], dtype=np.int64
    )


def default_pool_size(reserve: int = 1, floor: int = 2) -> int:
    """Actor-pool size that leaves CPU headroom for the read/write
    stages — a pool reserving every CPU starves the other operators and
    the pipeline deadlocks under backpressure (ray_guide pitfall)."""
    try:
        ncpu = int(ray.cluster_resources().get("CPU", 4))
    except Exception:
        ncpu = 4
    return max(floor, ncpu - reserve)


def autoscale_pool(reserve: int = 1, floor: int = 2) -> tuple[int, int]:
    """(min, max) actor-pool bounds: small jobs spin 1 actor instead of
    paying a full-width pool ramp; big jobs scale to CPUs-1."""
    return (1, default_pool_size(reserve, floor))


_BROADCAST_CACHE: dict = {}
_BROADCAST_CACHE_SLOTS = 4


def cached_object(ref):
    """Per-worker-process cache for ``ray.put`` broadcast objects used
    from stateless TASKS: the first task on a worker pays one
    ``ray.get`` + deserialize, later tasks reuse the warm object.
    Lets broadcast-lookup stages run as plain tasks (zero pool-ramp
    cost) instead of actor pools whose per-execution ramp costs
    seconds (see memory: ~3-4 s at 30 actors).

    Bounded LRU (a few slots): long-lived worker processes would
    otherwise pin every broadcast object of every past job — root
    maps, keep-sets, payload dicts up to the 1 GB broadcast budget —
    in the heap forever, compounding the object-store copy."""
    import ray as _ray

    key = ref.hex() if hasattr(ref, "hex") else str(ref)
    if key in _BROADCAST_CACHE:
        _BROADCAST_CACHE[key] = _BROADCAST_CACHE.pop(key)  # refresh LRU order
    else:
        _BROADCAST_CACHE[key] = _ray.get(ref)
        while len(_BROADCAST_CACHE) > _BROADCAST_CACHE_SLOTS:
            _BROADCAST_CACHE.pop(next(iter(_BROADCAST_CACHE)))
    return _BROADCAST_CACHE[key]


def collect_arrow_blocks(ds) -> list:
    """Driver-side fetch of a Dataset's blocks as Arrow tables via
    ``to_arrow_refs`` + one ``ray.get`` — zero-copy plasma reads,
    measured ~50× faster than ``iter_batches``'s iterator machinery on
    multi-million-row pulls (4.3 s → 0.08 s for 6.5M pairs, round 5).
    Use for bounded driver-side collections (side tables, pair lists,
    partial aggregates); empty blocks are dropped."""
    import ray as _ray

    return [t for t in _ray.get(ds.to_arrow_refs()) if t.num_rows]


def bounded_blocks(ds, rows_per_block: int = 65536):
    """Materialize ``ds`` and cap its block count at
    max(cpus, rows/rows_per_block).

    Sort-based exchanges (groupby / map_groups / sort) launch one map
    task per input block: a dataset fragmented into hundreds of tiny
    blocks (from_items, a selective filter, a previous wide op) makes
    the next shuffle pay hundreds of task dispatches for kilobytes of
    data.  Coalescing to a row-proportional block count keeps small
    exchanges at fixed cost while leaving big datasets partitioned for
    full parallelism."""
    import math

    ds = ds.materialize()
    rows = ds.count()
    if rows == 0:
        return ds
    target = max(default_pool_size(), math.ceil(rows / rows_per_block))
    if ds.num_blocks() > 2 * target:
        ds = ds.repartition(target).materialize()
    return ds


def vec_matrix(col, dtype=None):
    """(n, d) numpy matrix from an Arrow list/fixed_size_list column
    without the to_pylist() Python round-trip (~10× on wide embedding
    columns): flatten() yields the child values respecting offsets, and
    for a rectangular embedding column a reshape is all that's left.
    Nulls are not supported (embedding columns are dense by contract).
    """
    import numpy as np
    import pyarrow as pa

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    flat = col.flatten()
    values = flat.to_numpy(zero_copy_only=False)
    if dtype is not None:
        values = np.asarray(values, dtype=dtype)
    d = len(values) // max(1, n)
    if n * d != len(values):
        raise ValueError("vec_matrix requires a rectangular list column")
    return values.reshape(n, d)


def round_half_away(x, decimals: int = 4):
    """SQL-style round half AWAY from zero (numpy's np.round is
    half-even and diverges from DuckDB on exact ties like 0.40625)."""
    import numpy as np

    p = 10.0**decimals
    return np.sign(x) * np.floor(np.abs(x) * p + 0.5) / p


def merge_int_counts(
    parts, key_col: str, cnt_col: str, *, driver_limit: int = 8_000_000
):
    """Two-tier sum of (int64 key, int64 count) partial tables.

    Under ``driver_limit`` total partial rows the merge runs on the
    driver in numpy (sort + reduceat — microseconds per 100k rows),
    skipping the sort-exchange whose fixed cost dominates small count
    tables (the nations_with_presence lesson, generalized).  Above it
    the ordinary ``groupby().sum()`` runs distributed.  Returns a
    MATERIALIZED dataset with columns ``(key_col, cnt_col)`` either
    way.  Callers whose key tables grow with the corpus (gram/line
    counts) keep their scale path; only the exchange's fixed cost is
    tiered away."""
    import numpy as np
    import pyarrow as pa

    import ray.data

    parts = parts.materialize()
    if parts.count() <= driver_limit:
        ks, cs = [], []
        for b in parts.iter_batches(batch_format="pyarrow"):
            if b.num_rows:
                ks.append(b.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64))
                cs.append(b.column(cnt_col).to_numpy(zero_copy_only=False).astype(np.int64))
        if not ks:
            return ray.data.from_arrow(
                pa.table(
                    {
                        key_col: pa.array([], type=pa.int64()),
                        cnt_col: pa.array([], type=pa.int64()),
                    }
                )
            )
        k = np.concatenate(ks)
        c = np.concatenate(cs)
        order = np.argsort(k, kind="stable")
        k, c = k[order], c[order]
        starts = np.concatenate([[0], np.nonzero(np.diff(k))[0] + 1])
        sums = np.add.reduceat(c, starts)
        return ray.data.from_arrow(
            pa.table(
                {
                    key_col: pa.array(k[starts], type=pa.int64()),
                    cnt_col: pa.array(sums.astype(np.int64), type=pa.int64()),
                }
            )
        )
    summed = bounded_blocks(parts, rows_per_block=262144).groupby(key_col).sum(cnt_col)

    def _rename(batch):
        return batch.rename_columns([key_col, cnt_col])

    return summed.map_batches(_rename, batch_format="pyarrow").materialize()


def parquet_int_minmax(path: str, cols: list[str]):
    """(lo, hi) across ``cols`` from parquet ROW-GROUP STATISTICS —
    no data read.  Returns None when any row group lacks min/max
    stats (caller falls back to a scan probe).  The zero-cost way to
    pick packed-vs-wide integer-key paths at the planning step."""
    import pyarrow.parquet as pq

    meta = pq.ParquetFile(path)
    lo = hi = None
    for col in cols:
        idx = meta.schema_arrow.get_field_index(col)
        for rg in range(meta.metadata.num_row_groups):
            st = meta.metadata.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                return None
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
    return (lo, hi)


def _logging_yaml_path() -> str:
    import os

    return os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "config", "ray_data_logging.yaml"
    )


def quiet_ray_data_schema_warnings() -> None:
    """Silence Ray Data's benign "Failed to hash the schemas (for
    deduplication): unhashable type: 'dict'" warning.

    Root cause: parquet files written through pandas carry a
    ``b'pandas'`` schema-metadata blob whose payload makes
    ``pyarrow.Schema.__hash__`` raise; Ray's ``unify_schemas`` then
    logs a WARNING every time its ``set()``-dedup fast path fails and
    falls back to the full unify (same result, trivial cost).

    A plain ``setLevel`` does NOT stick: Ray Data re-applies
    ``logging.config.dictConfig`` on every dataset registration (and in
    every worker via ``update_dataset_logger_for_worker``), and
    dictConfig resets any existing CHILD of a configured logger to
    NOTSET.  The supported mechanism is ``RAY_DATA_LOGGING_CONFIG``: we
    point it at ``config/ray_data_logging.yaml`` (the library default
    plus one ERROR-level entry for the noisy logger), so every
    re-configure re-applies the silence.  Call BEFORE ``ray.init`` so
    raylet-spawned workers inherit the env var; pass
    :func:`make_quiet_hook` as the worker_process_setup_hook as well
    for workers that pre-date the env (idempotent belt-and-braces).

    Exchange paths that we own strip the metadata at the source instead
    (see ``dedup.sorted_group_first``); this covers the long tail of
    reads whose ``count()`` fast path a blanket strip-map would
    destroy."""
    import logging
    import os

    os.environ.setdefault("RAY_DATA_LOGGING_CONFIG", _logging_yaml_path())
    logging.getLogger(
        "ray.data._internal.arrow_ops.transform_pyarrow"
    ).setLevel(logging.ERROR)


def make_quiet_hook():
    """Worker-side variant of :func:`quiet_ray_data_schema_warnings`
    for ``runtime_env={"worker_process_setup_hook": make_quiet_hook()}``.

    Returns a CLOSURE (with the YAML path baked in by value) so
    cloudpickle serializes it self-contained — the setup hook
    deserializes during early worker startup, before the driver's
    sys.path reaches the worker, so a plain module function (pickled by
    reference) would die with ModuleNotFoundError."""
    yaml_path = _logging_yaml_path()

    def _hook():
        import logging
        import os

        os.environ.setdefault("RAY_DATA_LOGGING_CONFIG", yaml_path)
        logging.getLogger(
            "ray.data._internal.arrow_ops.transform_pyarrow"
        ).setLevel(logging.ERROR)

    return _hook


def merge_pair_counts(
    parts,
    a_col: str,
    b_col: str,
    cnt_col: str,
    *,
    driver_limit: int = 8_000_000,
    num_buckets: int = 64,
):
    """Two-tier SUM(cnt) GROUP BY (a, b) for TWO int64 key columns —
    the unpacked sibling of :func:`merge_int_counts` for pair keys
    that don't fit a single int64 packing (ids ≥ 2^31).

    Under ``driver_limit`` total partial rows: driver lexsort +
    reduceat.  Above: one bucket-keyed exchange (bucket = mixed hash
    of both keys) + per-bucket vectorized lexsort fold — Python cost
    O(num_buckets), exchange moves each partial row once.  Returns a
    MATERIALIZED dataset with columns ``(a_col, b_col, cnt_col)``."""
    import numpy as np
    import pyarrow as pa

    import ray.data

    def _fold_np(a, b, c):
        order = np.lexsort((b, a))
        a, b, c = a[order], b[order], c[order]
        new = np.ones(len(a), dtype=bool)
        new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        starts = np.nonzero(new)[0]
        sums = np.add.reduceat(c, starts)
        return a[starts], b[starts], sums.astype(np.int64)

    empty = pa.table(
        {
            a_col: pa.array([], type=pa.int64()),
            b_col: pa.array([], type=pa.int64()),
            cnt_col: pa.array([], type=pa.int64()),
        }
    )
    parts = parts.materialize()
    if parts.count() <= driver_limit:
        avs, bvs, cvs = [], [], []
        for blk in parts.iter_batches(batch_format="pyarrow"):
            if blk.num_rows:
                avs.append(blk.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64))
                bvs.append(blk.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64))
                cvs.append(blk.column(cnt_col).to_numpy(zero_copy_only=False).astype(np.int64))
        if not avs:
            return ray.data.from_arrow(empty)
        a, b, c = _fold_np(np.concatenate(avs), np.concatenate(bvs), np.concatenate(cvs))
        return ray.data.from_arrow(
            pa.table(
                {
                    a_col: pa.array(a, type=pa.int64()),
                    b_col: pa.array(b, type=pa.int64()),
                    cnt_col: pa.array(c, type=pa.int64()),
                }
            )
        )

    _MIX = np.uint64(0x9E3779B97F4A7C15)

    def _tag(batch: "pa.Table") -> "pa.Table":
        a = batch.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = batch.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
        with np.errstate(over="ignore"):
            bkt = ((a.astype(np.uint64) * _MIX) ^ (b.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F))) % np.uint64(num_buckets)
        return batch.append_column("__bucket", pa.array(bkt.astype(np.int32), type=pa.int32()))

    def _fold(group: "pa.Table") -> "pa.Table":
        a = group.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
        b = group.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
        c = group.column(cnt_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(a):
            return empty
        a, b, c = _fold_np(a, b, c)
        return pa.table(
            {
                a_col: pa.array(a, type=pa.int64()),
                b_col: pa.array(b, type=pa.int64()),
                cnt_col: pa.array(c, type=pa.int64()),
            }
        )

    return (
        bounded_blocks(parts.map_batches(_tag, batch_format="pyarrow"), rows_per_block=262144)
        .groupby("__bucket")
        .map_groups(_fold, batch_format="pyarrow")
        .materialize()
    )


def sorted_lookup(sorted_arr, vals):
    """Vectorized probe of ``vals`` against an ASCENDING-sorted numpy
    array: ``(hit_mask, idx)`` where ``hit_mask[i]`` says whether
    ``vals[i]`` appears in ``sorted_arr`` and ``idx[i]`` is its
    position when it does (clamped but meaningless where ``hit_mask``
    is False — gather side arrays with ``side[idx[hit]]``).
    searchsorted + clamp + equality: the one canonical copy of a
    pattern that otherwise re-grows slightly-divergent clones at every
    broadcast-lookup site.  Empty ``sorted_arr`` → all-False mask."""
    import numpy as np

    vals = np.asarray(vals)
    if len(sorted_arr) == 0:
        return np.zeros(len(vals), dtype=bool), np.zeros(len(vals), dtype=np.int64)
    idx = np.searchsorted(sorted_arr, vals)
    if idx.size:
        np.minimum(idx, len(sorted_arr) - 1, out=idx)
    return sorted_arr[idx] == vals, idx


def sorted_membership(sorted_arr, vals):
    """Bool membership mask of ``vals`` in an ASCENDING-sorted numpy
    array (:func:`sorted_lookup` without the gather index)."""
    return sorted_lookup(sorted_arr, vals)[0]


def bucket_keyed_fold(
    ds,
    key_col: str,
    op: str,
    *,
    val_col: str | None = None,
    num_buckets: int = 64,
    rows_per_block: int = 1_048_576,
):
    """Per-key aggregate for HIGH-CARDINALITY int64 keys: ONE
    bucket-keyed exchange (deterministic hash of the key) + a
    per-bucket vectorized numpy fold — Python cost O(num_buckets),
    never O(distinct keys).

    Ray's native ``groupby(key).sum/min/count`` pays per DISTINCT KEY
    on the reduce: measured **178 s for a 3M-key degree sum** (the
    triangle-count profile) vs ~2 s for this fold — the difference
    between an iterative graph round taking seconds and minutes.

    ``op``: ``"sum"`` / ``"min"`` fold ``val_col`` (int64) per key;
    ``"distinct"`` emits each key once (``val_col`` ignored).
    Output columns: ``(key_col,)`` for distinct, else ``(key_col,
    val_col)``."""
    import numpy as np
    import pyarrow as pa

    if op not in ("sum", "min", "distinct"):
        raise ValueError(f"unsupported op={op!r}")
    if op != "distinct" and val_col is None:
        raise ValueError(f"op={op!r} needs val_col")

    def _tag(batch: "pa.Table") -> "pa.Table":
        k = batch.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        with np.errstate(over="ignore"):
            bkt = (k.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(
                num_buckets
            )
        cols = {key_col: pa.array(k, type=pa.int64())}
        if op != "distinct":
            cols[val_col] = batch.column(val_col).cast(pa.int64())
        cols["__bucket"] = pa.array(bkt.astype(np.int32), type=pa.int32())
        return pa.table(cols)

    def _fold(group: "pa.Table") -> "pa.Table":
        k = group.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(k, return_inverse=True)
        if op == "distinct":
            return pa.table({key_col: pa.array(uniq, type=pa.int64())})
        v = group.column(val_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if op == "sum":
            out = np.zeros(len(uniq), dtype=np.int64)
            np.add.at(out, inv, v)
        else:  # min
            out = np.full(len(uniq), np.iinfo(np.int64).max, dtype=np.int64)
            np.minimum.at(out, inv, v)
        return pa.table(
            {key_col: pa.array(uniq, type=pa.int64()), val_col: pa.array(out, type=pa.int64())}
        )

    return (
        bounded_blocks(
            ds.map_batches(_tag, batch_format="pyarrow"), rows_per_block=rows_per_block
        )
        .groupby("__bucket")
        .map_groups(_fold, batch_format="pyarrow")
    )
