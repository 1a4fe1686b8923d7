"""Snapshot-versioned table storage with copy-on-write MERGE and
time-travel reads — the Iceberg/Delta transaction-log pattern over
plain parquet + ``pyarrow.fs``.

A *version* is a manifest (``_v{N}.json``) listing immutable data
files with per-file key zones ``[lo, hi]`` and row counts; data files
are never mutated.  ``merge_version`` commits a new version by
rewriting ONLY the files whose key zone intersects the delta
(copy-on-write), carrying every untouched file forward by reference
and appending at most one new file for never-seen keys.  Reads are
plain parquet scans of one manifest's file list, so any historical
version stays readable until :func:`vacuum` drops its files.

Scale shape (the 100-TB contract):

* the driver holds one (path, lo, hi, rows) row per FILE — never rows;
* a merge touches O(affected files), not O(table): with a sorted
  initial write the zones are near-disjoint, so a 0.1% delta rewrites
  ~0.1% of files while 99.9% carry forward as manifest pointers;
* the delta itself is explicitly BUDGETED (``delta_bytes_limit``) and
  broadcast once via ``ray.put`` — the CDC-batch pattern: callers
  apply unbounded change streams as bounded successive merges, each
  committing one version;
* per-file rewrites run as independent Ray tasks over a manifest
  Dataset (``map_batches`` with one file per batch), so the rewrite
  wave parallelizes across the cluster and a failed commit leaves the
  previous version intact (new files are written before the new
  manifest appears — the manifest IS the atomic commit point).
"""

from __future__ import annotations

import json
import posixpath

import numpy as np
import pyarrow as pa

import ray
import ray.data

from dots_ocr_ray.state.manifest import resolve_fs


def _manifest_path(root: str, version: int) -> str:
    return posixpath.join(root, f"_v{version}.json")


def _load_manifest(fs, root: str, version: int) -> dict:
    with fs.open_input_stream(_manifest_path(root, version)) as f:
        return json.loads(f.read().decode())


def latest_version(table_dir: str) -> int:
    """Highest committed version number (0 when the table is empty)."""
    fs, root = resolve_fs(table_dir)
    best = 0
    for info in fs.get_file_info(pa.fs.FileSelector(root, allow_not_found=True)):
        name = posixpath.basename(info.path)
        if name.startswith("_v") and name.endswith(".json"):
            try:
                best = max(best, int(name[2:-5]))
            except ValueError:
                continue
    return best


def create_table(
    ds: ray.data.Dataset,
    table_dir: str,
    *,
    key_col: str,
    rows_per_file: int = 1 << 20,
) -> dict:
    """Version-1 write: sort by ``key_col`` (ONE range exchange — what
    makes later zones near-disjoint and merges selective), one file
    per ``rows_per_file`` batch, then commit the ``_v1.json`` manifest.
    Returns the manifest dict."""
    fs, root = resolve_fs(table_dir)
    fs.create_dir(root, recursive=True)

    def _write(batch: pa.Table, out=table_dir, col=key_col) -> pa.Table:
        import uuid

        import pyarrow.parquet as pq

        from dots_ocr_ray.state.manifest import resolve_fs as _rfs

        if batch.num_rows == 0:
            return pa.table(
                {
                    "path": pa.array([], pa.string()),
                    "lo": pa.array([], pa.int64()),
                    "hi": pa.array([], pa.int64()),
                    "rows": pa.array([], pa.int64()),
                }
            )
        ofs, oroot = _rfs(out)
        keys = batch.column(col).to_numpy(zero_copy_only=False)
        name = posixpath.join(oroot, f"part-{uuid.uuid4().hex[:12]}.parquet")
        with ofs.open_output_stream(name) as sink:
            pq.write_table(batch, sink)
        return pa.table(
            {
                "path": pa.array([name], pa.string()),
                "lo": pa.array([int(keys.min())], pa.int64()),
                "hi": pa.array([int(keys.max())], pa.int64()),
                "rows": pa.array([batch.num_rows], pa.int64()),
            }
        )

    from dots_ocr_ray.util import bounded_blocks

    entries: list[dict] = []
    written = (
        bounded_blocks(ds)
        .sort(key_col)
        .map_batches(_write, batch_format="pyarrow", batch_size=rows_per_file)
    )
    for b in written.iter_batches(batch_format="pyarrow"):
        for i in range(b.num_rows):
            entries.append({k: b.column(k)[i].as_py() for k in b.column_names})
    entries.sort(key=lambda e: (e["lo"], e["path"]))
    manifest = {"version": 1, "key_col": key_col, "files": entries}
    with fs.open_output_stream(_manifest_path(root, 1)) as f:
        f.write(json.dumps(manifest).encode())
    return manifest


def read_version(
    table_dir: str,
    version: int | None = None,
    *,
    columns: list[str] | None = None,
) -> ray.data.Dataset:
    """Time-travel read: the file list of ``version`` (default latest)
    as a streaming parquet scan."""
    import pyarrow.parquet as pq

    fs, root = resolve_fs(table_dir)
    v = version if version is not None else latest_version(table_dir)
    manifest = _load_manifest(fs, root, v)
    paths = [e["path"] for e in manifest["files"]]
    if not paths:
        return ray.data.from_arrow(pa.table({}))
    # additive schema evolution: files committed before a column
    # existed stay untouched on disk; unify their footers (metadata
    # reads, O(files) driver-side) and let the scan null-backfill.
    # At 10^6-file scale the unified schema would be cached in the
    # manifest instead — same read path.
    schemas = []
    for p in paths:
        with fs.open_input_file(p) as f:
            schemas.append(pq.read_schema(f))
    unified = pa.unify_schemas(schemas, promote_options="default")
    return ray.data.read_parquet(paths, filesystem=fs, schema=unified, columns=columns)


def merge_version(
    table_dir: str,
    *,
    upserts: ray.data.Dataset | pa.Table | None = None,
    delete_keys: list[int] | None = None,
    delta_bytes_limit: int = 1 << 30,
) -> dict:
    """Copy-on-write MERGE committing version N+1.

    * existing keys in ``upserts`` replace their row in place;
    * never-seen keys append as one new file;
    * ``delete_keys`` rows disappear.

    File selection is zone-based: only files whose [lo, hi] intersects
    a delta key are rewritten (as parallel Ray tasks over the manifest
    rows); all others carry forward by reference.  The delta is
    budgeted (``delta_bytes_limit``) and broadcast once — apply large
    change streams as successive bounded merges, one version each."""
    fs, root = resolve_fs(table_dir)
    v = latest_version(table_dir)
    if v == 0:
        raise ValueError(f"no committed version under {table_dir}")
    manifest = _load_manifest(fs, root, v)
    key_col = manifest["key_col"]

    if isinstance(upserts, ray.data.Dataset):
        up = upserts.materialize()
        if up.size_bytes() > delta_bytes_limit:
            raise ValueError(
                "merge delta exceeds delta_bytes_limit "
                f"({up.size_bytes()} > {delta_bytes_limit}); apply the "
                "change stream as successive bounded merges"
            )
        refs = up.to_arrow_refs()
        up_tbl = pa.concat_tables([ray.get(r) for r in refs]) if refs else None
    else:
        up_tbl = upserts
    if up_tbl is not None and up_tbl.num_rows == 0:
        up_tbl = None
    del_keys = np.asarray(sorted(set(delete_keys or [])), dtype=np.int64)

    up_keys = (
        up_tbl.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if up_tbl is not None
        else np.array([], dtype=np.int64)
    )
    if len(np.unique(up_keys)) != len(up_keys):
        raise ValueError("upsert delta carries duplicate keys")
    if len(up_keys) and len(del_keys) and np.isin(del_keys, up_keys).any():
        raise ValueError(
            "a key appears in both upserts and delete_keys; "
            "split the delta — the intended final state is ambiguous"
        )
    touch_keys = np.union1d(up_keys, del_keys)

    files = manifest["files"]
    lo = np.array([e["lo"] for e in files], dtype=np.int64)
    hi = np.array([e["hi"] for e in files], dtype=np.int64)
    # a file is touched iff some delta key falls inside its zone
    touched_mask = np.zeros(len(files), dtype=bool)
    if len(touch_keys):
        li = np.searchsorted(touch_keys, lo, side="left")
        touched_mask = (li < len(touch_keys)) & (
            touch_keys[np.minimum(li, len(touch_keys) - 1)] <= hi
        )
    touched = sorted(
        (e for e, m in zip(files, touched_mask) if m),
        key=lambda e: (e["lo"], e["path"]),
    )
    carried = [e for e, m in zip(files, touched_mask) if not m]

    # Driver-side OWNERSHIP: each upsert key belongs to exactly one
    # touched file (first zone, in (lo, path) order, containing it) or
    # to the append file when no zone contains it.  The owner file
    # appends/replaces the row; EVERY touched file drops stale copies
    # of upserted or deleted keys, which keeps boundary-duplicate keys
    # from resurrecting conflicting rows.
    owner = np.full(len(up_keys), -1, dtype=np.int64)
    for j, e in enumerate(touched):
        unowned = owner == -1
        mine = unowned & (up_keys >= e["lo"]) & (up_keys <= e["hi"])
        owner[mine] = j
    insert_tbl = (
        up_tbl.filter(pa.array(owner == -1))
        if up_tbl is not None and (owner == -1).any()
        else None
    )

    new_version = v + 1
    new_entries = list(carried)

    if touched:
        delta_ref = ray.put(
            {
                "up": up_tbl,
                "owner": owner,
                "up_keys": up_keys,
                "del": del_keys,
                "key_col": key_col,
                "table_dir": table_dir,
                "new_version": new_version,
            }
        )

        def _rewrite(batch: pa.Table, ref=delta_ref) -> pa.Table:
            import uuid

            import pyarrow.parquet as pq

            from dots_ocr_ray.state.manifest import resolve_fs as _rfs
            from dots_ocr_ray.util import cached_object

            d = cached_object(ref)
            kcol, up_d = d["key_col"], d["up"]
            ofs, oroot = _rfs(d["table_dir"])
            out_p, out_lo, out_hi, out_rows = [], [], [], []
            for i in range(batch.num_rows):
                path = batch.column("path")[i].as_py()
                file_idx = batch.column("idx")[i].as_py()
                with ofs.open_input_file(path) as f:
                    tbl = pq.read_table(f)
                keys = tbl.column(kcol).to_numpy(zero_copy_only=False).astype(np.int64)
                drop = np.zeros(len(keys), dtype=bool)
                if len(d["del"]):
                    drop |= np.isin(keys, d["del"])
                parts = []
                if up_d is not None:
                    drop |= np.isin(keys, d["up_keys"])
                    mine = d["owner"] == file_idx
                    if mine.any():
                        # keep the delta's full schema: additive
                        # evolution promotes on concat (old rows get
                        # nulls for columns they predate)
                        parts.append(up_d.filter(pa.array(mine)))
                kept = tbl.filter(pa.array(~drop))
                out = (
                    pa.concat_tables([kept] + parts, promote_options="default")
                    if parts
                    else kept
                )
                if out.num_rows == 0:
                    continue
                out = out.sort_by(kcol)
                nk = out.column(kcol).to_numpy(zero_copy_only=False)
                name = posixpath.join(
                    oroot, f"part-v{d['new_version']}-{uuid.uuid4().hex[:12]}.parquet"
                )
                with ofs.open_output_stream(name) as sink:
                    pq.write_table(out, sink)
                out_p.append(name)
                out_lo.append(int(nk.min()))
                out_hi.append(int(nk.max()))
                out_rows.append(out.num_rows)
            return pa.table(
                {
                    "path": pa.array(out_p, pa.string()),
                    "lo": pa.array(out_lo, pa.int64()),
                    "hi": pa.array(out_hi, pa.int64()),
                    "rows": pa.array(out_rows, pa.int64()),
                }
            )

        touched_ds = ray.data.from_arrow(
            pa.table(
                {
                    "path": pa.array([e["path"] for e in touched], pa.string()),
                    "idx": pa.array(range(len(touched)), pa.int64()),
                }
            )
        ).repartition(max(1, min(len(touched), 64)))
        for b in touched_ds.map_batches(
            _rewrite, batch_format="pyarrow"
        ).iter_batches(batch_format="pyarrow"):
            for i in range(b.num_rows):
                new_entries.append({k: b.column(k)[i].as_py() for k in b.column_names})

    if insert_tbl is not None and insert_tbl.num_rows:
        import pyarrow.parquet as pq

        import uuid

        ins = insert_tbl.sort_by(key_col)
        ik = ins.column(key_col).to_numpy(zero_copy_only=False)
        name = posixpath.join(root, f"part-v{new_version}-{uuid.uuid4().hex[:12]}.parquet")
        with fs.open_output_stream(name) as sink:
            pq.write_table(ins, sink)
        new_entries.append(
            {"path": name, "lo": int(ik.min()), "hi": int(ik.max()), "rows": ins.num_rows}
        )

    new_entries.sort(key=lambda e: (e["lo"], e["path"]))
    new_manifest = {"version": new_version, "key_col": key_col, "files": new_entries}
    with fs.open_output_stream(_manifest_path(root, new_version)) as f:
        f.write(json.dumps(new_manifest).encode())
    return new_manifest


def vacuum(table_dir: str, *, keep_versions: int = 2) -> list[str]:
    """Drop data files referenced ONLY by expired versions (older than
    the newest ``keep_versions`` manifests) and delete those manifests.
    Returns the deleted file paths.  The kept manifests stay exactly
    readable — vacuum never touches a live file."""
    fs, root = resolve_fs(table_dir)
    newest = latest_version(table_dir)
    if newest == 0:
        return []
    versions = [
        u
        for u in range(1, newest + 1)
        if fs.get_file_info(_manifest_path(root, u)).type != pa.fs.FileType.NotFound
    ]
    keep = set(versions[-keep_versions:]) if keep_versions > 0 else set()
    live: set[str] = set()
    for u in keep:
        live.update(e["path"] for e in _load_manifest(fs, root, u)["files"])
    deleted: set[str] = set()
    for u in versions:
        if u in keep:
            continue
        for e in _load_manifest(fs, root, u)["files"]:
            if e["path"] not in live and e["path"] not in deleted:
                fs.delete_file(e["path"])
                deleted.add(e["path"])
        fs.delete_file(_manifest_path(root, u))
    return sorted(deleted)
