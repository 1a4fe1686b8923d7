"""Small shared runtime helpers."""

from __future__ import annotations

import ray


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
