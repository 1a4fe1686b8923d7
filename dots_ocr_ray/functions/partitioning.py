"""Rendezvous (highest-random-weight) hashing: stable key→bucket
assignment that survives cluster resizes.

Hash-mod assignment reshuffles ~(1 - 1/n) of all keys when the bucket
count changes; rendezvous hashing moves EXACTLY the keys whose new
bucket wins — an expected 1/(n+1) fraction on grow, and every moved
key lands on the NEW bucket (never between old ones).  That property
is what a fixed-size multi-node pipeline wants for host→worker or
shard→node placement: adding nodes drains a minimal, targeted slice
of the keyspace instead of re-dealing everything.

Definition used here (SQL-mirrorable): ``bucket(key, n) = argmax over
b in [0, n) of md5(f"{key}#{b}")`` compared as the lowercase hex
string — equal-length hex compares identically as text and as the
big-endian integer, so DuckDB's ``ORDER BY md5(...) DESC`` is the
same argmax.

Cost shape: n md5 calls per key per batch, embarrassingly parallel,
zero exchange.  For bucket counts in the hundreds this is ~µs/key;
assign once per key (dedup first) when keys repeat heavily.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

import ray.data


def rendezvous_bucket(key: str, n_buckets: int, *, salt: str = "") -> int:
    """HRW bucket of one key (pure; shared with tests/oracles)."""
    best_b = 0
    best_h = ""
    for b in range(n_buckets):
        h = hashlib.md5(f"{salt}{key}#{b}".encode()).hexdigest()
        if h > best_h:
            best_h, best_b = h, b
    return best_b


def rendezvous_assign(
    ds: ray.data.Dataset,
    key_col: str,
    n_buckets: int,
    *,
    out_col: str = "bucket",
    salt: str = "",
) -> ray.data.Dataset:
    """Adds ``out_col`` = HRW bucket of ``key_col`` (int64)."""

    def _assign(batch: pa.Table) -> pa.Table:
        keys = batch.column(key_col).to_pylist()
        # memoize within the batch: repeated keys hash once
        memo: dict[str, int] = {}
        buckets = []
        for k in keys:
            k = k or ""
            if k not in memo:
                memo[k] = rendezvous_bucket(k, n_buckets, salt=salt)
            buckets.append(memo[k])
        return batch.append_column(out_col, pa.array(buckets, type=pa.int64()))

    return ds.map_batches(_assign, batch_format="pyarrow")
