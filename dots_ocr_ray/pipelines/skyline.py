"""Distributed 2-D skyline (Pareto frontier) over a Dataset.

The skyline of a point set under (maximize x, maximize y) is every
point no other point dominates, where q dominates p iff q.x >= p.x and
q.y >= p.y with at least one strict.  Curation uses it to surface the
"undominated" documents/orders under two competing desiderata (recent
AND high-value, long AND high-quality) without committing to a single
weighted score.

Scale shape — the classic two-phase distributed skyline:

1. **Local pass** (``map_batches``, zero-copy Arrow → numpy): each
   block computes its own skyline with one ``lexsort`` + grouped
   strictly-above cummax sweep — O(b log b) per block, no Python row
   loop.  Dominance is a strict partial order (irreflexive/transitive),
   so every globally dominated point has a *maximal* dominator, which
   is globally undominated and therefore survives its own block's
   local pass.  Hence: union of local skylines ⊇ global skyline, and
   every non-skyline candidate still has its killer in the union.
2. **Final pass**: the candidate union (skyline-sized per block, ≪ n
   for any realistically correlated data) is coalesced into ONE block
   and the same kernel re-applied — exact global result.  The driver
   never holds rows; the coalesce is a Dataset ``repartition(1)``.

Ties: points equal on both dims do not dominate each other — all
copies survive, matching the SQL ``NOT EXISTS`` dominance oracle.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data


def _col_to_sortable(col: pa.ChunkedArray):
    """numpy view of an Arrow column usable in lexsort/compares:
    timestamps → int64 epoch units; integers STAY int64 (a float64
    cast would merge distinct values above 2^53 and corrupt the
    frontier); floats pass through as float64."""
    import numpy as np

    arr = col.combine_chunks()
    if pa.types.is_timestamp(arr.type):
        return arr.cast(pa.int64()).to_numpy(zero_copy_only=False)
    if pa.types.is_integer(arr.type):
        return arr.cast(pa.int64()).to_numpy(zero_copy_only=False)
    return arr.to_numpy(zero_copy_only=False).astype(np.float64, copy=False)


def local_skyline(batch: pa.Table, x_col: str, y_col: str) -> pa.Table:
    """Skyline of ONE batch under (maximize x_col, maximize y_col).

    Vectorized: sort by (y desc, x desc); within each equal-y group the
    group max of x is the first element; a row survives iff its x
    equals its group max AND that max strictly exceeds the running max
    over all strictly-greater-y groups (a >=/= dominator there would
    otherwise exist).  Equal-(x,y) duplicates all survive.
    """
    import numpy as np

    if batch.num_rows == 0:
        return batch
    xs = _col_to_sortable(batch.column(x_col))
    ys = _col_to_sortable(batch.column(y_col))
    idx = np.lexsort((-xs, -ys))  # primary: y desc; secondary: x desc
    sy = ys[idx]
    sx = xs[idx]
    new_group = np.empty(len(sy), dtype=bool)
    new_group[0] = True
    new_group[1:] = sy[1:] != sy[:-1]
    gid = np.cumsum(new_group) - 1
    gmax = sx[new_group]  # first row of each y-group = max x in group
    # running max over strictly-greater-y groups; sentinel below every
    # value of the dtype (int64 stays int64 — see _col_to_sortable)
    if np.issubdtype(sx.dtype, np.integer):
        sentinel = np.iinfo(sx.dtype).min
    else:
        sentinel = -np.inf
    prior = np.empty(len(gmax), dtype=sx.dtype)
    prior[0] = sentinel
    if len(gmax) > 1:
        np.maximum.accumulate(gmax[:-1], out=prior[1:])
    group_ok = gmax > prior
    if len(gmax) > 0 and gmax[0] == sentinel:
        group_ok[0] = True  # first group always undominated
    keep_sorted = group_ok[gid] & (sx == gmax[gid])
    keep_original = np.sort(idx[keep_sorted])
    return batch.take(pa.array(keep_original))


def skyline_2d(ds: ray.data.Dataset, x_col: str, y_col: str) -> ray.data.Dataset:
    """Global 2-D skyline (maximize both columns) of ``ds``.

    Two ``map_batches`` passes over zero-copy Arrow: per-block local
    skylines, then the same kernel once over the coalesced candidate
    union (``repartition(1)`` + whole-block batch).  Output rows keep
    their full original schema, values untouched.
    """

    def _kern(batch: pa.Table) -> pa.Table:
        return local_skyline(batch, x_col, y_col)

    local = ds.map_batches(_kern, batch_format="pyarrow")
    return local.repartition(1).map_batches(
        _kern, batch_format="pyarrow", batch_size=None
    )
