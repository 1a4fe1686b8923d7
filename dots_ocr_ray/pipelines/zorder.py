"""Z-order (Morton-curve) clustering: sort a table by the bit-
interleaving of TWO integer key columns so that rows close in BOTH
dimensions land in the same files, then answer 2-D box predicates by
reading only the files whose per-file (min, max) ranges of BOTH
columns overlap — the multi-dimensional generalization of the 1-D
zone map in :mod:`dots_ocr_ray.pipelines.zonemap` (Delta/Iceberg
``OPTIMIZE ZORDER BY``, ClickHouse ``mortonEncode`` indexes).

Why it matters at 100 TB: a table sorted by ONE column prunes range
predicates on that column only; a box predicate on (user, time) —
the canonical event-log access pattern — still scans every file.
Z-ordering pays the same single sort exchange at write time but keeps
per-file min/max ranges TIGHT in both dimensions, so a box read
touches O(box area) files instead of O(table).

Layout matches zonemap.py: ``out_dir/z-*.parquet`` plus
``out_dir/_zzones.json`` holding per-file [min, max] for both key
columns; paths resolve through ``pyarrow.fs`` so object-store layouts
work unchanged (reference S6 analog: app/utils/storage.py:22-163).
"""

from __future__ import annotations

import json
import posixpath

import numpy as np
import pyarrow as pa

import ray
import ray.data

from dots_ocr_ray.state.manifest import resolve_fs

ZZONES_NAME = "_zzones.json"


def interleave_bits2(x: np.ndarray, y: np.ndarray, bits: int = 16) -> np.ndarray:
    """Morton code of two int arrays: the low ``bits`` bits of ``x``
    and ``y`` interleaved (x at even positions, y at odd), vectorized
    — ``bits`` numpy passes, never a Python row loop.  Values are
    masked to ``bits`` bits first, so callers map raw keys into that
    budget (bucket, clamp, or rank) beforehand."""
    if bits < 1 or bits * 2 > 62:
        raise ValueError(f"bits={bits} out of range (1..31)")
    xv = x.astype(np.int64) & ((1 << bits) - 1)
    yv = y.astype(np.int64) & ((1 << bits) - 1)
    out = np.zeros(len(xv), dtype=np.int64)
    for i in range(bits):
        out |= ((xv >> i) & 1) << (2 * i)
        out |= ((yv >> i) & 1) << (2 * i + 1)
    return out


def morton_sql_expr(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """The ANSI-SQL mirror of :func:`interleave_bits2` — a generated
    bit-twiddling expression DuckDB evaluates identically, so z-values
    can sit under the hash-exact oracle."""
    parts = []
    for i in range(bits):
        parts.append(f"((({x_expr} >> {i}) & 1) << {2 * i})")
        parts.append(f"((({y_expr} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(parts)


def add_zvalue(
    ds: ray.data.Dataset,
    col_x: str,
    col_y: str,
    *,
    bits: int = 16,
    out_col: str = "zval",
) -> ray.data.Dataset:
    """Append the Morton code of (``col_x``, ``col_y``) (both already
    int64-compatible) as ``out_col``.  Zero exchanges."""

    def _z(batch: pa.Table) -> pa.Table:
        x = batch.column(col_x).to_numpy(zero_copy_only=False)
        y = batch.column(col_y).to_numpy(zero_copy_only=False)
        z = interleave_bits2(x, y, bits=bits)
        return batch.append_column(out_col, pa.array(z, type=pa.int64()))

    return ds.map_batches(_z, batch_format="pyarrow")


def zorder_write(
    ds: ray.data.Dataset,
    out_dir: str,
    *,
    col_x: str,
    col_y: str,
    bits: int = 16,
    rows_per_file: int = 1 << 20,
) -> dict:
    """Z-order-cluster ``ds`` by (``col_x``, ``col_y``): one global
    sort exchange on the Morton code, one file per ``rows_per_file``
    batch, and a per-file 2-D zone manifest ([min, max] of BOTH key
    columns).  The transient ``zval`` column is dropped from the data
    files.  Returns the manifest dict."""
    fs, root = resolve_fs(out_dir)
    fs.create_dir(root, recursive=True)

    def _write(batch: pa.Table, out=out_dir, cx=col_x, cy=col_y) -> pa.Table:
        import uuid

        import pyarrow.parquet as pq

        from dots_ocr_ray.state.manifest import resolve_fs as _rfs

        empty = pa.table(
            {
                "path": pa.array([], pa.string()),
                "x_lo": pa.array([], pa.int64()),
                "x_hi": pa.array([], pa.int64()),
                "y_lo": pa.array([], pa.int64()),
                "y_hi": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        batch = batch.drop_columns(["zval"])
        x = batch.column(cx).to_numpy(zero_copy_only=False)
        y = batch.column(cy).to_numpy(zero_copy_only=False)
        ofs, oroot = _rfs(out)
        name = f"{oroot}/z-{uuid.uuid4().hex[:12]}.parquet"
        pq.write_table(batch, name, filesystem=ofs, compression="zstd")
        return pa.table(
            {
                "path": pa.array([name], pa.string()),
                "x_lo": pa.array([int(np.min(x))], pa.int64()),
                "x_hi": pa.array([int(np.max(x))], pa.int64()),
                "y_lo": pa.array([int(np.min(y))], pa.int64()),
                "y_hi": pa.array([int(np.max(y))], pa.int64()),
            }
        )

    zones = []
    for b in (
        add_zvalue(ds, col_x, col_y, bits=bits)
        .sort("zval")
        .map_batches(_write, batch_format="pyarrow", batch_size=rows_per_file)
        .iter_batches(batch_format="pyarrow")
    ):
        for r in range(b.num_rows):
            zones.append({k: b.column(k)[r].as_py() for k in b.column_names})
    zones.sort(key=lambda z: z["path"])
    manifest = {"col_x": col_x, "col_y": col_y, "bits": bits, "zones": zones}
    with fs.open_output_stream(posixpath.join(root, ZZONES_NAME)) as f:
        f.write(json.dumps(manifest).encode())
    return manifest


def read_box(
    dir_path: str,
    x_range: tuple[int, int],
    y_range: tuple[int, int],
    *,
    columns: list[str] | None = None,
) -> ray.data.Dataset:
    """2-D box read ``x_lo <= col_x <= x_hi AND y_lo <= col_y <=
    y_hi`` touching ONLY the files whose 2-D zone overlaps the box,
    with a parquet row filter inside the survivors.  Returns a
    streaming Dataset; the scan cost is bounded by the files the box
    overlaps, never the table size."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    fs, root = resolve_fs(dir_path)
    with fs.open_input_stream(posixpath.join(root, ZZONES_NAME)) as f:
        manifest = json.loads(f.read().decode())
    cx, cy = manifest["col_x"], manifest["col_y"]
    (xlo, xhi), (ylo, yhi) = x_range, y_range
    paths = [
        z["path"]
        for z in manifest["zones"]
        if not (z["x_hi"] < xlo or z["x_lo"] > xhi or z["y_hi"] < ylo or z["y_lo"] > yhi)
    ]
    if not paths:
        schema = None
        for z in manifest["zones"]:
            zfs, zpath = resolve_fs(z["path"])
            if zfs.get_file_info(zpath).type.name != "NotFound":
                schema = pq.read_schema(zpath, filesystem=zfs)
                break
        if schema is None:
            raise ValueError("zorder layout has no readable zone files")
        if columns is not None:
            schema = pa.schema([schema.field(c) for c in columns])
        return ray.data.from_arrow(schema.empty_table())
    want_cols = columns
    if want_cols is not None:
        want_cols = list(dict.fromkeys(list(want_cols) + [cx, cy]))
    flt = (
        (pads.field(cx) >= pads.scalar(xlo))
        & (pads.field(cx) <= pads.scalar(xhi))
        & (pads.field(cy) >= pads.scalar(ylo))
        & (pads.field(cy) <= pads.scalar(yhi))
    )
    out = ray.data.read_parquet(paths, columns=want_cols, filter=flt)
    if columns is not None and set(columns) != set(want_cols):
        out = out.select_columns(columns)
    return out


def pruning_stats(
    dir_path: str, x_range: tuple[int, int], y_range: tuple[int, int]
) -> dict:
    """(files_total, files_scanned) for a box — the observable the
    layout exists to improve; used by tests and ops dashboards."""
    fs, root = resolve_fs(dir_path)
    with fs.open_input_stream(posixpath.join(root, ZZONES_NAME)) as f:
        manifest = json.loads(f.read().decode())
    (xlo, xhi), (ylo, yhi) = x_range, y_range
    hit = sum(
        1
        for z in manifest["zones"]
        if not (z["x_hi"] < xlo or z["x_lo"] > xhi or z["y_hi"] < ylo or z["y_lo"] > yhi)
    )
    return {"files_total": len(manifest["zones"]), "files_scanned": hit}
