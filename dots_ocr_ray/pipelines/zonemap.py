"""Zone-map storage: write a table SORTED by a column with a per-file
min/max manifest, then answer range queries by reading ONLY the files
whose zone overlaps — the data-skipping trick every warehouse format
ships (parquet row-group stats, Iceberg/Delta file stats, ClickHouse
sparse index).

At 100 TB this is the difference between a full-corpus scan and
touching a handful of files for a selective range predicate: the sort
pays ONE exchange at write time; every later range read is pruned by
the manifest (driver holds one (path, min, max) row per FILE) plus a
parquet-level row filter inside the surviving files.

Layout: ``out_dir/zone-{i:05d}.parquet`` + ``out_dir/_zones.json``
recording the column and per-file [min, max].  Paths resolve through
``pyarrow.fs`` (the state/manifest.py seam) so object-store layouts
work unchanged.
"""

from __future__ import annotations

import json
import posixpath

import numpy as np
import pyarrow as pa

import ray
import ray.data

from dots_ocr_ray.state.manifest import resolve_fs

ZONES_NAME = "_zones.json"


def write_sorted_zonemap(
    ds: ray.data.Dataset,
    out_dir: str,
    *,
    sort_col: str,
    rows_per_file: int = 1 << 20,
) -> dict:
    """Globally sort ``ds`` by ``sort_col`` (one range-partition
    exchange — Ray's sort), write one file per ``rows_per_file`` batch
    and record each file's [min, max] zone.  Because the input is
    sorted, zones are near-disjoint, which is what makes later pruning
    selective.  Returns the manifest dict."""
    fs, root = resolve_fs(out_dir)
    fs.create_dir(root, recursive=True)

    def _write(batch: pa.Table, out=out_dir, col=sort_col) -> pa.Table:
        import pyarrow.parquet as pq

        from dots_ocr_ray.state.manifest import resolve_fs as _rfs

        if batch.num_rows == 0:
            return pa.table(
                {"path": pa.array([], pa.string()), "lo": pa.array([], pa.float64()), "hi": pa.array([], pa.float64())}
            )
        v = batch.column(col).to_numpy(zero_copy_only=False)
        lo, hi = float(np.min(v)), float(np.max(v))
        import uuid

        ofs, oroot = _rfs(out)
        name = f"{oroot}/zone-{uuid.uuid4().hex[:12]}.parquet"
        pq.write_table(batch, name, filesystem=ofs, compression="zstd")
        return pa.table(
            {
                "path": pa.array([name], pa.string()),
                "lo": pa.array([lo], pa.float64()),
                "hi": pa.array([hi], pa.float64()),
            }
        )

    zones = []
    for b in (
        ds.sort(sort_col)
        .map_batches(_write, batch_format="pyarrow", batch_size=rows_per_file)
        .iter_batches(batch_format="pyarrow")
    ):
        for r in range(b.num_rows):
            zones.append(
                {
                    "path": b.column("path")[r].as_py(),
                    "lo": b.column("lo")[r].as_py(),
                    "hi": b.column("hi")[r].as_py(),
                }
            )
    zones.sort(key=lambda z: (z["lo"], z["hi"], z["path"]))
    manifest = {"sort_col": sort_col, "zones": zones}
    with fs.open_output_stream(posixpath.join(root, ZONES_NAME)) as f:
        f.write(json.dumps(manifest).encode())
    return manifest


def read_range(
    dir_path: str,
    lo: float,
    hi: float,
    *,
    columns: list[str] | None = None,
) -> ray.data.Dataset:
    """Range read ``lo <= sort_col <= hi`` touching ONLY the files
    whose zone overlaps the predicate, with a parquet row filter
    inside the survivors.  The scan cost is bounded by the zones the
    predicate overlaps, never the table size."""
    import pyarrow.dataset as pads

    fs, root = resolve_fs(dir_path)
    with fs.open_input_stream(posixpath.join(root, ZONES_NAME)) as f:
        manifest = json.loads(f.read().decode())
    col = manifest["sort_col"]
    paths = [
        z["path"]
        for z in manifest["zones"]
        if not (z["hi"] < lo or z["lo"] > hi)
    ]
    if not paths:
        # schema-correct EMPTY dataset without touching any data file
        import pyarrow.parquet as pq

        schema = None
        for z in manifest["zones"]:
            zfs, zpath = resolve_fs(z["path"])
            if zfs.get_file_info(zpath).type.name != "NotFound":
                schema = pq.read_schema(zpath, filesystem=zfs)
                break
        if schema is None:
            raise ValueError("zonemap layout has no readable zone files")
        if columns is not None:
            schema = pa.schema([schema.field(c) for c in columns])
        return ray.data.from_arrow(schema.empty_table())
    want_cols = columns
    if want_cols is not None and col not in want_cols:
        want_cols = list(want_cols) + [col]
    out = ray.data.read_parquet(
        paths,
        columns=want_cols,
        filter=(pads.field(col) >= pads.scalar(lo)) & (pads.field(col) <= pads.scalar(hi)),
    )
    if columns is not None and col not in columns:
        out = out.select_columns(columns)
    return out
