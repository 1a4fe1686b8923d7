"""ORC sink + source: the columnar interchange format of the
Hadoop/Hive world — the one a Common-Crawl-adjacent warehouse most
often hands over when it is not parquet.

Same sink/source discipline as sources/ipc.py: the WRITE is a
``map_batches`` stage (one ``.orc`` file per output batch, through
``pyarrow.fs`` so object-store layouts work unchanged) and the READ is
per-file tasks (``read_binary_files`` + a stateless decode stage) —
both directions stream and parallelize by file, and the driver only
ever holds file paths.

ORC vs parquet here: ORC stripes carry lightweight min/max indexes and
dictionary encodings like parquet row groups do, but pyarrow's ORC
reader exposes only file-level column pruning (no row-group predicate
pushdown) — so parquet stays the PRIMARY layout and this connector is
for interchange, not the hot path.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data

from dots_ocr_ray.state.manifest import resolve_fs


def write_orc(
    ds: ray.data.Dataset,
    out_dir: str,
    *,
    rows_per_file: int = 1 << 20,
    compression: str = "zstd",
) -> list[str]:
    """Write ``ds`` as one ORC file per ``rows_per_file`` batch under
    ``out_dir``; returns the written paths."""
    fs, root = resolve_fs(out_dir)
    fs.create_dir(root, recursive=True)

    def _write(batch: pa.Table, out=out_dir, comp=compression) -> pa.Table:
        import uuid

        from pyarrow import orc

        from dots_ocr_ray.state.manifest import resolve_fs as _rfs

        if batch.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string())})
        ofs, oroot = _rfs(out)
        name = f"{oroot}/part-{uuid.uuid4().hex[:12]}.orc"
        with ofs.open_output_stream(name) as sink:
            orc.write_table(batch, sink, compression=comp)
        return pa.table({"path": pa.array([name], pa.string())})

    paths: list[str] = []
    for b in ds.map_batches(
        _write, batch_format="pyarrow", batch_size=rows_per_file
    ).iter_batches(batch_format="pyarrow"):
        paths.extend(b.column("path").to_pylist())
    return sorted(paths)


def read_orc(dir_path: str, *, columns: list[str] | None = None) -> ray.data.Dataset:
    """Read an ORC directory back as a streaming Dataset: per-file
    read tasks + a stateless decode stage.  ``columns`` prunes inside
    the ORC reader (stripe-level column projection)."""
    import io

    files = ray.data.read_binary_files(dir_path, file_extensions=["orc"])
    out_schema = orc_file_schema(dir_path)
    if columns is not None:
        out_schema = pa.schema([out_schema.field(c) for c in columns])

    def _parse(batch: pa.Table) -> pa.Table:
        from pyarrow import orc

        tables = []
        for blob in batch.column("bytes").to_pylist():
            t = orc.ORCFile(io.BytesIO(blob)).read(columns=columns)
            if columns is not None:
                # ORCFile.read returns FILE column order; force the
                # requested order so every block (incl. the empty-batch
                # fallback) carries an identical schema
                t = t.select(columns)
            tables.append(t)
        if not tables:
            return out_schema.empty_table()
        return pa.concat_tables(tables)

    return files.map_batches(_parse, batch_format="pyarrow")


def orc_file_schema(dir_path: str) -> pa.Schema:
    """Schema of the first ORC file in a layout (footer-only read)."""
    from pyarrow import orc

    fs, root = resolve_fs(dir_path)
    infos = [
        i
        for i in fs.get_file_info(pa.fs.FileSelector(root))
        if i.path.endswith(".orc")
    ]
    if not infos:
        raise ValueError(f"no .orc files under {dir_path}")
    with fs.open_input_file(sorted(i.path for i in infos)[0]) as f:
        return orc.ORCFile(f).schema
