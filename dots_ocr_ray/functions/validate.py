"""Data-quality assertions over a Dataset: named vectorized rules →
violation rows — the schema/content validation gate a pipeline runs
before committing an ingest (reference analog: the input-format
gating of S4/M20, which *routes* bad rows; this op *reports* them).

Zero exchange: every rule is a batch-local vectorized predicate; the
output is the flat (id, rule) violation stream, which downstream can
count per rule (tiny groupby) or join back to quarantine rows.  Rules
see the whole Arrow batch, so cross-column consistency checks
(n_chars == len(text)) cost one kernel, not a row loop."""

from __future__ import annotations

from collections.abc import Callable

import pyarrow as pa

import ray.data


def validate_rows(
    ds: ray.data.Dataset,
    rules: dict[str, Callable[[pa.Table], pa.Array]],
    *,
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """(id_col, rule) row per violation.  Each rule maps an Arrow batch
    to a boolean mask that is TRUE where the row VIOLATES the rule."""
    names = list(rules.items())

    def _check(batch: pa.Table) -> pa.Table:
        parts = []
        for name, fn in names:
            mask = fn(batch)
            if not isinstance(mask, (pa.Array, pa.ChunkedArray)):
                mask = pa.array(mask, type=pa.bool_())
            bad = batch.column(id_col).filter(mask)
            if len(bad):
                parts.append((name, bad))
        if not parts:
            return pa.table(
                {
                    id_col: pa.array([], type=batch.column(id_col).type),
                    "rule": pa.array([], type=pa.string()),
                }
            )
        id_arrays = []
        rule_arrays = []
        for name, bad in parts:
            id_arrays.append(bad.combine_chunks() if isinstance(bad, pa.ChunkedArray) else bad)
            rule_arrays.append(pa.array([name] * len(bad), type=pa.string()))
        return pa.table(
            {
                id_col: pa.concat_arrays(id_arrays),
                "rule": pa.concat_arrays(rule_arrays),
            }
        )

    return ds.map_batches(_check, batch_format="pyarrow")
