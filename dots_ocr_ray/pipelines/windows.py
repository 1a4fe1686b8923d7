"""Stream-shaped operators over the events table: session windows and
as-of joins.

Ray Data has no event-time windows; both ops follow the documented
pattern for stream-shaped workloads: partition by key, sort by ts
WITHIN each group (`groupby(key).map_groups`), and run the windowing
logic over the sorted group with pandas/pyarrow.  The ordering
assumption is per-group only — no global sort.
"""

from __future__ import annotations

import pandas as pd

import ray.data


def sessionize(
    sf_dir: str,
    gap_minutes: int = 30,
) -> ray.data.Dataset:
    """Gap-based session windows per user: consecutive events closer
    than ``gap_minutes`` belong to one session.

    Output: (user_id, session_id, n_events, session_start, session_end)
    where session_id numbers a user's sessions in time order from 1.
    """
    events = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    gap = pd.Timedelta(minutes=gap_minutes)

    def _sessions(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("ts")
        new_session = (g["ts"].diff() > gap).cumsum()
        out = (
            g.groupby(new_session)
            .agg(n_events=("ts", "size"), session_start=("ts", "min"), session_end=("ts", "max"))
            .reset_index(drop=True)
        )
        out.insert(0, "user_id", g["user_id"].iloc[0])
        out.insert(1, "session_id", range(1, len(out) + 1))
        return out

    return events.groupby("user_id").map_groups(_sessions, batch_format="pandas")


def user_event_sequence(sf_dir: str) -> ray.data.Dataset:
    """Cumulative window per key: events numbered in time order per
    user with a running value sum — the ROW_NUMBER / cumulative-SUM
    OVER (PARTITION BY … ORDER BY …) surface.  Partition by user, sort
    WITHIN the group, cumsum vectorized — no global sort."""
    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "value"]
    )

    def _seq(group: pd.DataFrame) -> pd.DataFrame:
        # value as tiebreak: two events at the same timestamp would
        # otherwise order arbitrarily (rows with equal (ts, value) are
        # interchangeable, so the output multiset stays deterministic)
        g = group.sort_values(["ts", "value"]).reset_index(drop=True)
        g["seq"] = range(1, len(g) + 1)
        g["running_value"] = g["value"].cumsum()
        return g[["user_id", "ts", "seq", "running_value"]]

    return events.groupby("user_id").map_groups(_seq, batch_format="pandas")


def events_sliding_agg(
    sf_dir: str,
    *,
    window_minutes: int = 60,
    hop_minutes: int = 15,
) -> ray.data.Dataset:
    """Sliding (hopping) window aggregate: per (event_type,
    window_start) count + value sum, where each event lands in
    ``window/hop`` overlapping windows.

    The explode-to-hops form: a vectorized ``map_batches`` replicates
    each row once per covering window (a pure flat map — no state, no
    shuffle), then ONE groupby over the derived (type, window) key.
    Window count per row is the constant window/hop, so the explode is
    bounded data amplification, not skew."""
    import numpy as np
    import pyarrow as pa

    if window_minutes % hop_minutes:
        raise ValueError("window_minutes must be a multiple of hop_minutes")
    k = window_minutes // hop_minutes
    hop_us = hop_minutes * 60 * 1_000_000
    window_us = window_minutes * 60 * 1_000_000

    def _explode(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        types = batch.column("event_type").to_numpy(zero_copy_only=False)
        values = batch.column("value").to_numpy(zero_copy_only=False)
        # newest window containing ts starts at floor(ts/hop)*hop; the
        # k-1 windows before it also contain ts (clipped at ts<start+win)
        base = (ts // hop_us) * hop_us
        starts = base[:, None] - hop_us * np.arange(k)[None, :]  # (n, k)
        keep = ts[:, None] < starts + window_us
        idx = np.repeat(np.arange(len(ts)), k)[keep.ravel()]
        return (
            pa.table(
                {
                    "event_type": pa.array(types[idx], type=pa.string()),
                    "window_start": pa.array(starts.ravel()[keep.ravel()], type=pa.int64()).cast(
                        pa.timestamp("us")
                    ),
                    "value": pa.array(values[idx], type=pa.float64()),
                }
            )
            .group_by(["event_type", "window_start"])
            .aggregate([("value", "sum"), ("value", "count")])
        )

    events = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"])
    agg = (
        events.map_batches(_explode, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .sum(["value_sum", "value_count"])
    )

    def _finalize(batch):
        import pyarrow as pa

        mapping = {"sum(value_sum)": "sum_value", "sum(value_count)": "n_events"}
        batch = batch.rename_columns([mapping.get(n, n) for n in batch.column_names])
        return batch.set_column(
            batch.column_names.index("n_events"), "n_events", batch.column("n_events").cast(pa.int64())
        )

    return agg.map_batches(_finalize, batch_format="pyarrow")


def asof_last_event(
    sf_dir: str,
    left_type: str = "purchase",
    right_type: str = "click",
) -> ray.data.Dataset:
    """As-of join within the events stream: for every ``left_type``
    event, the most recent strictly-earlier ``right_type`` event of the
    SAME user (backward as-of semantics, ``pd.merge_asof`` per user
    group after an in-group sort).

    Output: (user_id, ts, prior_ts) — prior_ts is NaT when no earlier
    right-side event exists.
    """
    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    )

    def _asof(group: pd.DataFrame) -> pd.DataFrame:
        left = group[group["event_type"] == left_type].sort_values("ts")
        right = group[group["event_type"] == right_type].sort_values("ts")
        if left.empty:
            return pd.DataFrame({"user_id": [], "ts": [], "prior_ts": []})
        merged = pd.merge_asof(
            left[["ts"]],
            right[["ts"]].rename(columns={"ts": "prior_ts"}),
            left_on="ts",
            right_on="prior_ts",
            direction="backward",
            allow_exact_matches=False,
        )
        merged.insert(0, "user_id", left["user_id"].iloc[0])
        return merged

    return events.groupby("user_id").map_groups(_asof, batch_format="pandas")


def window_distinct_users(
    sf_dir: str,
    *,
    window_minutes: int = 60,
) -> ray.data.Dataset:
    """Tumbling-window EXACT distinct users: per window_start, the
    number of distinct user_ids -> (window_start, n_users).

    Distinct-count is the classic shuffle trap — COUNT(DISTINCT) per
    key needs every (window, user) pair co-located.  Shape: each batch
    pre-dedups its own (window, user) pairs (vectorized np.unique on a
    packed window-index/user key), then ONE groupby(window_start)
    counts unique users per window with a vectorized np.unique inside
    the group fn — one Python call per WINDOW, group payload already
    batch-deduped.  Rows on the wire = distinct pairs per batch, never
    raw events.  (The approximate counterpart at extreme user
    cardinality is the mergeable HLL in functions/sketches.py — see
    the approx_distinct_users query.)"""
    import numpy as np
    import pyarrow as pa

    window_us = window_minutes * 60 * 1_000_000
    events = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])

    _PACK = np.int64(1_000_003)  # > max user_id in the fixture

    def _pairs(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        users = batch.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        widx = ts // window_us  # small window INDEX, not epoch-us (packing stays in int64)
        packed = np.unique(widx * _PACK + users)
        w = packed // _PACK
        u = packed - w * _PACK
        return pa.table(
            {
                "window_start": pa.array(w * window_us, type=pa.int64()),
                "user_id": pa.array(u, type=pa.int64()),
            }
        )

    from dots_ocr_ray.util import bounded_blocks

    pairs = bounded_blocks(
        events.map_batches(_pairs, batch_format="pyarrow"), rows_per_block=262144
    )

    def _count(group: pa.Table) -> pa.Table:
        users = group.column("user_id").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "window_start": group.column("window_start").slice(0, 1).cast(pa.timestamp("us")),
                "n_users": pa.array([len(np.unique(users))], type=pa.int64()),
            }
        )

    return pairs.groupby("window_start").map_groups(_count, batch_format="pyarrow")


def event_gaps(sf_dir: str) -> ray.data.Dataset:
    """LAG/LEAD window per key: microseconds since the previous event
    (-1 for the first) and the next event's type ('' for the last),
    per user in (ts, event_id) order — the LAG(...)/LEAD(...) OVER
    (PARTITION BY ... ORDER BY ...) surface.  Partition by user, sort
    WITHIN the group, vectorized shift — no global sort."""
    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id", "event_type"]
    )

    def _gaps(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["ts", "event_id"]).reset_index(drop=True)
        # explicit unit cast: the parquet timestamps arrive as
        # datetime64[us] (not [ns]), so a bare int64 view would
        # already be µs — pin the unit rather than assume it
        us = g["ts"].astype("datetime64[us]").astype("int64")
        gap = us - us.shift(1)
        g["gap_us"] = gap.fillna(-1).astype("int64")
        g["next_type"] = g["event_type"].shift(-1).fillna("")
        return g[["user_id", "event_id", "gap_us", "next_type"]]

    return events.groupby("user_id").map_groups(_gaps, batch_format="pandas")


def nearby_event_counts(
    sf_dir: str, *, window_s: int = 300
) -> ray.data.Dataset:
    """Stream-stream windowed self-join, aggregated: for every event,
    how many OTHER events of the same user fall within ± ``window_s``
    seconds — the `a JOIN b ON |a.ts-b.ts| <= w` surface, computed
    per-key with two vectorized searchsorted passes instead of the
    quadratic match set (same never-materialize discipline as
    interval_agg_join)."""
    import numpy as np

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"]
    )

    def _nearby(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["ts", "event_id"]).reset_index(drop=True)
        us = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        lo = np.searchsorted(us, us - window_s * 1_000_000, side="left")
        hi = np.searchsorted(us, us + window_s * 1_000_000, side="right")
        g["n_nearby"] = (hi - lo - 1).astype("int64")  # exclude self
        return g[["user_id", "event_id", "n_nearby"]]

    return events.groupby("user_id").map_groups(_nearby, batch_format="pandas")


def funnel_counts(
    events: ray.data.Dataset,
    stages: list[str],
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
):
    """Ordered funnel analysis: how many users completed stage 1, then
    stage 2 strictly AFTER their first stage-1 event, and so on — the
    sequential `min(ts) > prior-stage min(ts)` ladder every product
    funnel query needs.

    Shape: one batch-local filter prunes events to the funnel's types
    before the only exchange (a ``user_col``-keyed group), each user's
    ladder walks vectorized numpy inside its group, and the per-user
    depth reduces through a bincount partial — so the exchange carries
    only funnel-typed events and the driver sees ``len(stages)``
    numbers, never user ids.  Returns a ``len(stages)``-row
    ``pyarrow.Table`` (stage_idx, stage, users) where ``users`` counts
    users reaching AT LEAST that stage.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    n_stages = len(stages)
    stage_of = {s: i for i, s in enumerate(stages)}

    def _prune(batch: pa.Table) -> pa.Table:
        batch = batch.select([user_col, type_col, ts_col])
        return batch.filter(pc.is_in(batch.column(type_col), pa.array(stages)))

    def _depth(group: pd.DataFrame) -> pd.DataFrame:
        ts = group[ts_col].astype("datetime64[us]").astype("int64").to_numpy()
        kind = group[type_col].map(stage_of).to_numpy()
        depth = 0
        prev = -(2**62)
        for i in range(n_stages):
            sel = ts[(kind == i) & (ts > prev)]
            if sel.size == 0:
                break
            prev = sel.min()
            depth += 1
        return pd.DataFrame({"depth": [depth]})

    def _partial(batch: pa.Table) -> pa.Table:
        counts = np.bincount(
            batch.column("depth").to_numpy(zero_copy_only=False),
            minlength=n_stages + 1,
        )
        return pa.table(
            {
                "depth": pa.array(np.arange(n_stages + 1), type=pa.int64()),
                "n": pa.array(counts, type=pa.int64()),
            }
        )

    from dots_ocr_ray.util import bounded_blocks

    per_depth = (
        bounded_blocks(events.map_batches(_prune, batch_format="pyarrow"))
        .groupby(user_col)
        .map_groups(_depth, batch_format="pandas")
        .map_batches(_partial, batch_format="pyarrow")
        .groupby("depth")
        .sum("n")
    )
    # bounded: n_stages+1 rows at most
    rows = {int(r["depth"]): int(r["sum(n)"]) for r in per_depth.take_all()}
    total = np.zeros(n_stages + 1, dtype=np.int64)
    for d, n in rows.items():
        total[d] = n
    at_least = np.cumsum(total[::-1])[::-1]  # users with depth >= i
    return pa.table(
        {
            "stage_idx": pa.array(np.arange(1, n_stages + 1), type=pa.int64()),
            "stage": pa.array(stages, type=pa.string()),
            "users": pa.array(at_least[1:], type=pa.int64()),
        }
    )
