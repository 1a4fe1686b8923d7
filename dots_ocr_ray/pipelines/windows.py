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
