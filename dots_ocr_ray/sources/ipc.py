"""Arrow IPC (Feather v2) sink + source: the zero-parse interchange
format for handing batches between engines (pandas/polars/DuckDB all
read it mmap-zero-copy).  Ray Data ships no IPC connector; this one
follows the repo's sink discipline (zonemap.py): the WRITE is a
map_batches stage — one ``.arrow`` file per output batch, written
through ``pyarrow.fs`` so object-store layouts work unchanged — and
the READ is per-file tasks (``read_binary_files`` + a stateless parse
stage), so both directions stream and parallelize by file.

At 100 TB the case for IPC next to parquet: intermediate handoffs that
are written once and read once (stage checkpoints, shuffle spill
exports) skip parquet's encode/decode CPU entirely — IPC is the raw
Arrow wire bytes.
"""

from __future__ import annotations

import posixpath

import pyarrow as pa

import ray.data

from dots_ocr_ray.state.manifest import resolve_fs


def write_ipc(
    ds: ray.data.Dataset,
    out_dir: str,
    *,
    rows_per_file: int = 1 << 20,
    compression: str | None = "zstd",
) -> list[str]:
    """Write ``ds`` as one IPC file per ``rows_per_file`` batch under
    ``out_dir``; returns the written paths (driver holds one path per
    FILE, never rows)."""
    fs, root = resolve_fs(out_dir)
    fs.create_dir(root, recursive=True)

    def _write(batch: pa.Table, out=out_dir, comp=compression) -> pa.Table:
        import uuid

        from dots_ocr_ray.state.manifest import resolve_fs as _rfs

        if batch.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string())})
        ofs, oroot = _rfs(out)
        name = f"{oroot}/part-{uuid.uuid4().hex[:12]}.arrow"
        with ofs.open_output_stream(name) as sink:
            with pa.ipc.new_file(
                sink,
                batch.schema,
                options=pa.ipc.IpcWriteOptions(compression=comp),
            ) as writer:
                writer.write_table(batch)
        return pa.table({"path": pa.array([name], pa.string())})

    paths: list[str] = []
    for b in ds.map_batches(
        _write, batch_format="pyarrow", batch_size=rows_per_file
    ).iter_batches(batch_format="pyarrow"):
        paths.extend(b.column("path").to_pylist())
    return sorted(paths)


def read_ipc(dir_path: str, *, columns: list[str] | None = None) -> ray.data.Dataset:
    """Read an IPC directory back as a streaming Dataset: per-file
    read tasks (``read_binary_files``) + a stateless parse stage —
    no driver-side row materialization.  ``columns`` prunes at the
    batch level (IPC files are written whole-batch, so projection
    happens post-read; write parquet instead when heavy column
    pruning at the scan is the access pattern)."""
    import io

    files = ray.data.read_binary_files(dir_path, file_extensions=["arrow"])
    # Footer-only schema probe so empty input blocks still carry the
    # output schema (keeps every RefBundle schema-stable downstream).
    out_schema = ipc_file_schema(dir_path)
    if columns is not None:
        out_schema = pa.schema([out_schema.field(c) for c in columns])

    def _parse(batch: pa.Table) -> pa.Table:
        tables = []
        for blob in batch.column("bytes").to_pylist():
            t = pa.ipc.open_file(io.BytesIO(blob)).read_all()
            if columns is not None:
                t = t.select(columns)
            tables.append(t)
        if not tables:
            return out_schema.empty_table()
        return pa.concat_tables(tables)

    return files.map_batches(_parse, batch_format="pyarrow")


def ipc_file_schema(dir_path: str) -> pa.Schema:
    """Schema of the first IPC file in a layout (footer-only read)."""
    fs, root = resolve_fs(dir_path)
    infos = [
        i
        for i in fs.get_file_info(pa.fs.FileSelector(root))
        if i.path.endswith(".arrow")
    ]
    if not infos:
        raise ValueError(f"no .arrow files under {dir_path}")
    with fs.open_input_file(sorted(i.path for i in infos)[0]) as f:
        return pa.ipc.open_file(f).schema
