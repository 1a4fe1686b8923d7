"""Mega-page routing (SURVEY.md §4 skew row: "split mega-pages: cap
len(html), route oversize rows to a dedicated pool or
truncate-with-flag").

A 100 TB crawl contains single pages of tens of MB; one such row makes
a batch (and its actor) a straggler and can blow the worker heap.  This
stage splits a Dataset into a normal stream and an oversize stream so
the caller can run the oversize rows through a dedicated low-batch-size
pool — or truncate them in place with a flag column.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

DEFAULT_MAX_HTML_BYTES = 1 << 20  # 1 MiB


def flag_oversize(ds: ray.data.Dataset, max_bytes: int = DEFAULT_MAX_HTML_BYTES) -> ray.data.Dataset:
    """Add ``oversize: bool`` (html byte length above the cap)."""

    def _flag(batch: pa.Table) -> pa.Table:
        lengths = pc.binary_length(batch.column("html"))
        # null html → flag False, NOT null: a null flag fails BOTH
        # split filters (filter drops nulls) and the row silently
        # vanishes from the corpus; null html is a legal degradation
        # row the extractor handles (bytes_in=0 → text fallback)
        flag = pc.fill_null(pc.greater(lengths, max_bytes), False)
        return batch.append_column("oversize", flag)

    return ds.map_batches(_flag, batch_format="pyarrow")


def split_oversize(
    ds: ray.data.Dataset, max_bytes: int = DEFAULT_MAX_HTML_BYTES
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """(normal, oversize) streams.  Run `oversize` through the same
    extract stage with a small ``batch_size`` (1-8) so one fat row
    never co-locates with hundreds of others in a batch."""
    # materialized once: both returned streams consume this lineage,
    # and un-materialized they would each re-run the full upstream
    # read + length scan (2× the input I/O at crawl scale)
    flagged = flag_oversize(ds, max_bytes).materialize()

    def _keep(value: bool):
        def _f(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.equal(batch.column("oversize"), value)).drop_columns(["oversize"])

        return _f

    return (
        flagged.map_batches(_keep(False), batch_format="pyarrow"),
        flagged.map_batches(_keep(True), batch_format="pyarrow"),
    )


def truncate_oversize(
    ds: ray.data.Dataset, max_bytes: int = DEFAULT_MAX_HTML_BYTES
) -> ray.data.Dataset:
    """Truncate oversize html to the cap (flag kept): the
    truncate-with-flag option.  The extraction kernel's repair ladder
    tolerates the cut-mid-tag tail by construction."""

    def _trunc(batch: pa.Table) -> pa.Table:
        htmls = batch.column("html").to_pylist()
        out, flags = [], []
        for h in htmls:
            if h is not None and len(h) > max_bytes:
                out.append(h[:max_bytes])
                flags.append(True)
            else:
                out.append(h)
                flags.append(False)
        batch = batch.set_column(
            batch.column_names.index("html"), "html", pa.array(out, type=pa.binary())
        )
        return batch.append_column("truncated", pa.array(flags, type=pa.bool_()))

    return ds.map_batches(_trunc, batch_format="pyarrow")
