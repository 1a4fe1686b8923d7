"""Stream-shaped operators over the events table: session windows,
LAG/LEAD, cumulative windows and as-of joins.

Ray Data has no event-time windows.  Two implementation tiers here:

* the hot per-event ops (``sessionize``, ``user_event_sequence``,
  ``event_gaps``) use ONE range-partitioned sort on (user_id, ts, …)
  plus vectorized per-batch segment logic — user groups fully inside
  a batch never touch per-group Python; only a batch's first/last
  user groups (O(batches) total) divert to a tiny keyed resolution
  running the sequential pandas logic (``_sorted_user_apply``, the
  ``sorted_group_first`` boundary discipline).  At 10^9-key
  cardinality this removes the ~0.2 ms/key ``map_groups`` dispatch
  that the VERDICT-r2 review flagged as the window family's cost.
* the per-user reduces (``asof_last_event``, ``funnel_counts``,
  ``interval_coverage``, ``nearby_event_counts``) take ONE coarse
  256-way hash exchange on user and resolve EVERY user inside a
  bucket vectorized — per-run-size-class matrix passes (prefix-max,
  masked-min ladders, row-wise cummax) or row-base-offset flat
  searchsorted — one Python call per coarse bucket, never per user.

Float caution, learned bit-exactly: running sums must accumulate in
the SAME order AND algorithm as the oracle — np.cumsum over a stitched
array (base-subtraction trick) drifts ~1e-13, and pandas
groupby.cumsum is Kahan-compensated; per-segment np.cumsum matches the
sequential SQL window accumulation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def sessionize(
    sf_dir: str,
    gap_minutes: int = 30,
) -> ray.data.Dataset:
    """Gap-based session windows per user: a new session starts when
    the gap to the previous event EXCEEDS ``gap_minutes`` (events
    exactly ``gap_minutes`` apart stay in one session — strict ``>``
    break, the DuckDB-oracle-pinned convention).

    Output: (user_id, session_id, n_events, session_start, session_end)
    where session_id numbers a user's sessions in time order from 1.

    Scale shape: one range-partitioned sort on (user_id, ts), then
    every user group fully inside a batch sessionizes VECTORIZED
    (diff-based break detection + ``reduceat``-style segment bounds) —
    no per-user Python call.  Only a batch's first and last user
    groups (≤2 per batch, however many batches a hot user spans)
    divert their raw events into a tiny keyed resolution running the
    sequential pandas logic — O(batches) group calls instead of
    O(distinct users), the same boundary discipline as
    ``dedup.sorted_group_first``.  At 10^9-user cardinality this
    removes ~0.2 ms of Python per user from the hot path."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from dots_ocr_ray.util import bounded_blocks

    events = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    gap = pd.Timedelta(minutes=gap_minutes)
    gap_us = gap_minutes * 60_000_000

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

    sorted_ds = bounded_blocks(events).sort(["user_id", "ts"])

    TS = pa.timestamp("us")
    OUT = [
        ("user_id", pa.int64()),
        ("session_id", pa.int64()),
        ("n_events", pa.int64()),
        ("session_start", TS),
        ("session_end", TS),
        ("ts", TS),
        ("__b", pa.bool_()),
    ]

    def _segment_sessions(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({n: pa.array([], type=t) for n, t in OUT})
        batch = batch.sort_by([("user_id", "ascending"), ("ts", "ascending")])
        n = batch.num_rows
        u = batch.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)

        brk = np.ones(n, dtype=bool)
        if n > 1:
            brk[1:] = (u[1:] != u[:-1]) | ((ts[1:] - ts[:-1]) > gap_us)
        ss = np.flatnonzero(brk)  # session starts (event index)
        ends = np.concatenate([ss[1:], [n]]) - 1
        sess_user = u[ss]
        n_events = np.diff(np.concatenate([ss, [n]]))

        user_new = np.ones(len(ss), dtype=bool)
        if len(ss) > 1:
            user_new[1:] = sess_user[1:] != sess_user[:-1]
        useg = np.flatnonzero(user_new)  # user starts (session index)
        counts = np.diff(np.concatenate([useg, [len(ss)]]))
        sid = np.arange(len(ss)) - np.repeat(useg, counts) + 1

        # interior users only: a batch's first/last user group may
        # continue in a neighboring batch (split sessions, wrong ids)
        direct_user = np.ones(len(useg), dtype=bool)
        direct_user[0] = False
        direct_user[-1] = False
        sess_direct = np.repeat(direct_user, counts)
        d = np.flatnonzero(sess_direct)
        zero_ts = pa.array(np.zeros(len(d), np.int64)).cast(TS)
        direct_tbl = pa.table(
            {
                "user_id": pa.array(sess_user[d], type=pa.int64()),
                "session_id": pa.array(sid[d], type=pa.int64()),
                "n_events": pa.array(n_events[d], type=pa.int64()),
                "session_start": pa.array(ts[ss[d]]).cast(TS),
                "session_end": pa.array(ts[ends[d]]).cast(TS),
                "ts": zero_ts,
                "__b": pa.array([False] * len(d), type=pa.bool_()),
            }
        )
        ev_boundary = (u == u[0]) | (u == u[-1])
        b = np.flatnonzero(ev_boundary)
        zeros = np.zeros(len(b), np.int64)
        zero_ts_b = pa.array(zeros).cast(TS)
        boundary_tbl = pa.table(
            {
                "user_id": pa.array(u[b], type=pa.int64()),
                "session_id": pa.array(zeros, type=pa.int64()),
                "n_events": pa.array(zeros, type=pa.int64()),
                "session_start": zero_ts_b,
                "session_end": zero_ts_b,
                "ts": pa.array(ts[b]).cast(TS),
                "__b": pa.array([True] * len(b), type=pa.bool_()),
            }
        )
        return pa.concat_tables([direct_tbl, boundary_tbl])

    marked = sorted_ds.map_batches(_segment_sessions, batch_format="pyarrow").materialize()

    def _keep_direct(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.invert(batch.column("__b"))).select(
            ["user_id", "session_id", "n_events", "session_start", "session_end"]
        )

    def _keep_boundary(batch: pa.Table) -> pa.Table:
        return batch.filter(batch.column("__b")).select(["user_id", "ts"])

    direct = marked.map_batches(_keep_direct, batch_format="pyarrow")
    resolved = (
        bounded_blocks(marked.map_batches(_keep_boundary, batch_format="pyarrow"))
        .groupby("user_id")
        .map_groups(_sessions, batch_format="pandas")
        # coerce to arrow blocks: union requires both sides homogeneous
        .map_batches(lambda t: t, batch_format="pyarrow")
    )
    return direct.union(resolved)


def _default_array(t: "pa.DataType", n: int):
    """Neutral filler column for the unused half of a marked row."""
    import numpy as np
    import pyarrow as pa

    if pa.types.is_string(t):
        return pa.array([""] * n, type=t)
    if pa.types.is_timestamp(t):
        return pa.array(np.zeros(n, np.int64)).cast(t)
    if pa.types.is_floating(t):
        return pa.array(np.zeros(n, np.float64), type=t)
    return pa.array(np.zeros(n, np.int64), type=t)


def _sorted_user_apply(
    events: "ray.data.Dataset",
    *,
    sort_cols: list[str],
    vec_fn,
    pandas_fn,
    out_fields: list[tuple],
) -> "ray.data.Dataset":
    """Per-event windowed transform without per-user Python: one
    range-partitioned sort on (user_id, *sort_cols), then ``vec_fn``
    computes the output columns for a whole batch vectorized (it
    receives the locally re-sorted batch plus the user array and the
    user-group-start mask).  Rows of user groups fully inside the
    batch emit directly; a batch's first and last user groups (≤2)
    divert their RAW input rows into a keyed resolution running
    ``pandas_fn`` — O(batches) group calls instead of O(users).
    Shared scaffold for the LAG/LEAD / cumulative-window family."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from dots_ocr_ray.util import bounded_blocks

    in_schema = events.schema()
    in_fields = list(zip(in_schema.names, in_schema.types))
    out_names = [n for n, _ in out_fields]
    extra_in = [(n, t) for n, t in in_fields if n not in out_names]
    MARKED = out_fields + extra_in + [("__b", pa.bool_())]

    sorted_ds = bounded_blocks(events).sort(["user_id"] + sort_cols)

    def _segment(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({n: pa.array([], type=t) for n, t in MARKED})
        batch = batch.sort_by([("user_id", "ascending")] + [(c, "ascending") for c in sort_cols])
        n = batch.num_rows
        u = batch.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        new_user = np.ones(n, dtype=bool)
        if n > 1:
            new_user[1:] = u[1:] != u[:-1]
        out_tbl = vec_fn(batch, u, new_user)

        interior = (u != u[0]) & (u != u[-1])
        d = pa.array(np.flatnonzero(interior))
        b = pa.array(np.flatnonzero(~interior))
        direct_cols = {name: out_tbl.column(name).take(d) for name, _ in out_fields}
        for name, t in extra_in:
            direct_cols[name] = _default_array(t, len(d))
        direct_cols["__b"] = pa.array([False] * len(d), type=pa.bool_())
        boundary_cols = {}
        for name, t in out_fields:
            boundary_cols[name] = (
                batch.column(name).take(b)
                if name in batch.column_names
                else _default_array(t, len(b))
            )
        for name, t in extra_in:
            boundary_cols[name] = batch.column(name).take(b)
        boundary_cols["__b"] = pa.array([True] * len(b), type=pa.bool_())
        names = [n for n, _ in MARKED]
        return pa.concat_tables(
            [
                pa.table({k: direct_cols[k] for k in names}),
                pa.table({k: boundary_cols[k] for k in names}),
            ]
        )

    marked = sorted_ds.map_batches(_segment, batch_format="pyarrow").materialize()

    def _keep_direct(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.invert(batch.column("__b"))).select(out_names)

    def _keep_boundary(batch: pa.Table) -> pa.Table:
        return batch.filter(batch.column("__b")).select([n for n, _ in in_fields])

    direct = marked.map_batches(_keep_direct, batch_format="pyarrow")
    resolved = (
        bounded_blocks(marked.map_batches(_keep_boundary, batch_format="pyarrow"))
        .groupby("user_id")
        .map_groups(pandas_fn, batch_format="pandas")
        # coerce to arrow blocks: union requires both sides homogeneous
        .map_batches(lambda t: t, batch_format="pyarrow")
    )
    return direct.union(resolved)


def user_event_sequence(sf_dir: str) -> ray.data.Dataset:
    """Cumulative window per key: events numbered in time order per
    user with a running value sum — the ROW_NUMBER / cumulative-SUM
    OVER (PARTITION BY … ORDER BY …) surface.  One global sort on
    (user_id, ts, value); interior users run as a vectorized
    segment-cumsum (no per-user Python), boundary users through the
    sequential pandas fallback (see :func:`_sorted_user_apply`)."""
    import numpy as np
    import pyarrow as pa

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

    def _vec(batch: pa.Table, u: np.ndarray, new_user: np.ndarray) -> pa.Table:
        n = batch.num_rows
        value = batch.column("value").to_numpy(zero_copy_only=False).astype(np.float64)
        starts = np.flatnonzero(new_user)
        counts = np.diff(np.concatenate([starts, [n]]))
        seq = np.arange(n) - np.repeat(starts, counts) + 1
        # per-segment np.cumsum, NOT the vectorized cs - base trick
        # (order-sensitive float addition drifts ~1e-13 from the
        # sequential accumulation the SQL window oracle computes) and
        # NOT pandas groupby.cumsum (Kahan-compensated, also drifts):
        # one slim numpy call per user segment, bit-exact and free of
        # per-user pandas dispatch
        running = np.empty(n, dtype=np.float64)
        bounds = np.concatenate([starts, [n]])
        for i in range(len(starts)):
            sl = slice(bounds[i], bounds[i + 1])
            running[sl] = np.cumsum(value[sl])
        return pa.table(
            {
                "user_id": pa.array(u, type=pa.int64()),
                "ts": batch.column("ts"),
                "seq": pa.array(seq, type=pa.int64()),
                "running_value": pa.array(running, type=pa.float64()),
            }
        )

    return _sorted_user_apply(
        events,
        sort_cols=["ts", "value"],
        vec_fn=_vec,
        pandas_fn=_seq,
        out_fields=[
            ("user_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("seq", pa.int64()),
            ("running_value", pa.float64()),
        ],
    )


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
        # k-1 windows before it also contain ts (every one of the k
        # hops satisfies ts < start + window by construction, so each
        # event explodes to exactly k rows — no filtering needed)
        base = (ts // hop_us) * hop_us
        starts = (base[:, None] - hop_us * np.arange(k)[None, :]).ravel()  # (n*k,)
        idx = np.repeat(np.arange(len(ts)), k)
        return (
            pa.table(
                {
                    "event_type": pa.array(types[idx], type=pa.string()),
                    "window_start": pa.array(starts, type=pa.int64()).cast(
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
    SAME user (backward as-of semantics, ``allow_exact_matches=False``).

    Output: (user_id, ts, prior_ts) — prior_ts is null when no earlier
    right-side event exists.

    Scale shape: rows filter to the two event types, ONE coarse
    256-way exchange on hash(user), and each bucket resolves every
    user with a single lexsort + per-user-run-size-class vectorized
    prefix-max (rights sort after lefts at equal ts, so the running
    right-max BEFORE a left row is exactly the strictly-earlier
    semantics) — no Python call and no pandas merge per user."""
    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_type"]
    )
    _MIX = np.uint64(0x9E3779B97F4A7C15)
    TS_MIN = np.int64(np.iinfo(np.int64).min)

    def _tag(batch: pa.Table) -> pa.Table:
        keep = pc.is_in(
            batch.column("event_type"),
            value_set=pa.array([left_type, right_type]),
        )
        batch = batch.filter(pc.fill_null(keep, False))
        u = batch.column("user_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            bkt = (u * _MIX) % np.uint64(256)
        return batch.append_column(
            "__bucket", pa.array(bkt.astype(np.int32), type=pa.int32())
        )

    def _asof_fold(group: pa.Table) -> pa.Table:
        ts_type = group.schema.field("ts").type
        empty = pa.table(
            {
                "user_id": pa.array([], type=pa.int64()),
                "ts": pa.array([], type=ts_type),
                "prior_ts": pa.array([], type=ts_type),
            }
        )
        if group.num_rows == 0:
            return empty
        u = group.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = (
            group.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .view(np.int64)
        )
        is_right = (
            pc.equal(group.column("event_type"), right_type)
            .to_numpy(zero_copy_only=False)
            .astype(np.int8)
        )
        # rights AFTER lefts at equal ts → the prefix max over rights
        # before a left row can never include a same-ts right
        order = np.lexsort((is_right, ts, u))
        u, ts, is_right = u[order], ts[order], is_right[order]
        new_run = np.ones(len(u), dtype=bool)
        new_run[1:] = u[1:] != u[:-1]
        starts = np.flatnonzero(new_run)
        lens = np.diff(np.concatenate([starts, [len(u)]]))
        out_u: list[np.ndarray] = []
        out_ts: list[np.ndarray] = []
        out_prior: list[np.ndarray] = []
        for size in np.unique(lens):
            runs = starts[lens == size]
            idx = runs[:, None] + np.arange(size)[None, :]
            mu, mt, mr = u[idx], ts[idx], is_right[idx].astype(bool)
            lr = np.where(mr, mt, TS_MIN)
            pm = np.maximum.accumulate(lr, axis=1)
            prefix = np.concatenate(
                [np.full((len(runs), 1), TS_MIN, dtype=np.int64), pm[:, :-1]],
                axis=1,
            )
            lmask = ~mr
            out_u.append(mu[lmask])
            out_ts.append(mt[lmask])
            out_prior.append(prefix[lmask])
        uu = np.concatenate(out_u)
        tts = np.concatenate(out_ts)
        pri = np.concatenate(out_prior)
        if not len(uu):
            return empty
        return pa.table(
            {
                "user_id": pa.array(uu, type=pa.int64()),
                "ts": pa.array(tts.view("datetime64[us]")).cast(ts_type),
                "prior_ts": pa.array(
                    pri.view("datetime64[us]"), mask=pri == TS_MIN
                ).cast(ts_type),
            }
        )

    return (
        events.map_batches(_tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(_asof_fold, batch_format="pyarrow")
    )


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

    def _pairs(batch: pa.Table) -> pa.Table:
        ts = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        users = batch.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        widx = ts // window_us
        # exact 2-key dedup via lexsort + boundary diff — NO packing
        # constant (a multiplicative pack silently corrupted counts for
        # any user_id at or above it, fabricating phantom windows)
        order = np.lexsort((users, widx))
        w, u = widx[order], users[order]
        if len(w):
            keep = np.concatenate([[True], (w[1:] != w[:-1]) | (u[1:] != u[:-1])])
            w, u = w[keep], u[keep]
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
    (PARTITION BY ... ORDER BY ...) surface.  One global sort on
    (user_id, ts, event_id); interior users run as vectorized shifts
    (no per-user Python), boundary users through the sequential
    pandas fallback (see :func:`_sorted_user_apply`)."""
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

    import numpy as np
    import pyarrow as pa

    def _vec(batch: pa.Table, u: np.ndarray, new_user: np.ndarray) -> pa.Table:
        n = batch.num_rows
        us = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        gap = np.empty(n, dtype=np.int64)
        gap[0] = -1
        if n > 1:
            gap[1:] = us[1:] - us[:-1]
        gap[new_user] = -1
        import pyarrow.compute as pc

        # nulls -> '' BEFORE the shift: the pandas boundary path
        # fillna('')s every null, and the two paths must agree or a
        # row's next_type would depend on its batch placement
        etype = pc.fill_null(batch.column("event_type"), "")
        if isinstance(etype, pa.ChunkedArray):
            etype = etype.combine_chunks()
        # LEAD: next row's type, '' at user ends (positions where the
        # NEXT row starts a new user, and the batch's last row)
        last_of_user = np.zeros(n, dtype=bool)
        if n > 1:
            last_of_user[:-1] = new_user[1:]
        last_of_user[-1] = True
        next_type = pa.concat_arrays(
            [etype.slice(1), pa.array([""], type=pa.string())]
        )
        next_type = pa.array(
            np.where(
                last_of_user, "", next_type.to_numpy(zero_copy_only=False)
            ).astype(object),
            type=pa.string(),
        )
        return pa.table(
            {
                "user_id": pa.array(u, type=pa.int64()),
                "event_id": batch.column("event_id").cast(pa.int64()),
                "gap_us": pa.array(gap, type=pa.int64()),
                "next_type": next_type,
            }
        )

    return _sorted_user_apply(
        events,
        sort_cols=["ts", "event_id"],
        vec_fn=_vec,
        pandas_fn=_gaps,
        out_fields=[
            ("user_id", pa.int64()),
            ("event_id", pa.int64()),
            ("gap_us", pa.int64()),
            ("next_type", pa.string()),
        ],
    )


def nearby_event_counts(
    sf_dir: str, *, window_s: int = 300
) -> ray.data.Dataset:
    """Stream-stream windowed self-join, aggregated: for every event,
    how many OTHER events of the same user fall within ± ``window_s``
    seconds — the `a JOIN b ON |a.ts-b.ts| <= w` surface, computed
    with two searchsorted passes instead of the quadratic match set
    (same never-materialize discipline as interval_agg_join).

    Shape: ONE coarse 256-way exchange on hash(user); inside a bucket
    every user's window counts come from TWO flat searchsorted passes
    over a row-base-offset view (each user-run's timestamps shift by
    run_index · (span + 2w + 1), keeping the flat array sorted and
    runs non-overlapping), so no Python executes per user.  If the
    offset arithmetic would overflow int64 (astronomically wide ts
    ranges × many runs) the fold falls back to a per-run searchsorted
    loop — same counts, stated not silent."""
    import numpy as np

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "ts", "event_id"]
    )
    _MIX = np.uint64(0x9E3779B97F4A7C15)
    w_us = np.int64(window_s * 1_000_000)

    def _tag(batch: pa.Table) -> pa.Table:
        u = batch.column("user_id").to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            bkt = (u * _MIX) % np.uint64(256)
        return batch.append_column(
            "__bucket", pa.array(bkt.astype(np.int32), type=pa.int32())
        )

    def _nearby_fold(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "user_id": pa.array([], type=pa.int64()),
                "event_id": pa.array([], type=pa.int64()),
                "n_nearby": pa.array([], type=pa.int64()),
            }
        )
        if group.num_rows == 0:
            return empty
        u = group.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        ts = (
            group.column("ts")
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .view(np.int64)
        )
        ev = group.column("event_id").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ev, ts, u))
        u, ts, ev = u[order], ts[order], ev[order]
        new_run = np.ones(len(u), dtype=bool)
        new_run[1:] = u[1:] != u[:-1]
        run_id = np.cumsum(new_run) - 1
        n_runs = int(run_id[-1]) + 1
        span = int(ts.max()) - int(ts.min())
        stride = span + 2 * int(w_us) + 1
        if n_runs * stride < (1 << 62):
            # shift each run into its own disjoint sorted range; the
            # flat array stays globally sorted so ONE searchsorted pair
            # answers every run at once
            base = ts.min()
            flat = (ts - base) + run_id * np.int64(stride)
            lo = np.searchsorted(flat, flat - w_us, side="left")
            hi = np.searchsorted(flat, flat + w_us, side="right")
            n_nearby = (hi - lo - 1).astype(np.int64)
        else:
            starts = np.flatnonzero(new_run)
            bounds = np.concatenate([starts, [len(u)]])
            n_nearby = np.empty(len(u), dtype=np.int64)
            for i in range(len(starts)):
                sl = slice(bounds[i], bounds[i + 1])
                us_ = ts[sl]
                lo = np.searchsorted(us_, us_ - w_us, side="left")
                hi = np.searchsorted(us_, us_ + w_us, side="right")
                n_nearby[sl] = hi - lo - 1
        return pa.table(
            {
                "user_id": pa.array(u, type=pa.int64()),
                "event_id": pa.array(ev, type=pa.int64()),
                "n_nearby": pa.array(n_nearby, type=pa.int64()),
            }
        )

    return (
        events.map_batches(_tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(_nearby_fold, batch_format="pyarrow")
    )


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

    # coarse 256-way exchange on hash(user); each bucket walks EVERY
    # user's ladder vectorized per user-run-size class (the stage loop
    # is len(stages) masked-min passes over (n_runs, size) matrices)
    # and emits one depth-histogram partial — no Python call per user
    _MIX = np.uint64(0x9E3779B97F4A7C15)
    TS_MIN = np.int64(np.iinfo(np.int64).min)
    TS_MAX = np.int64(np.iinfo(np.int64).max)

    def _tag(batch: pa.Table) -> pa.Table:
        u = batch.column(user_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            bkt = (u * _MIX) % np.uint64(256)
        return batch.append_column(
            "__bucket", pa.array(bkt.astype(np.int32), type=pa.int32())
        )

    def _depth_fold(group: pa.Table) -> pa.Table:
        hist = np.zeros(n_stages + 1, dtype=np.int64)
        if group.num_rows:
            u = group.column(user_col).to_numpy(zero_copy_only=False).astype(np.int64)
            ts = (
                group.column(ts_col)
                .to_numpy(zero_copy_only=False)
                .astype("datetime64[us]")
                .view(np.int64)
            )
            kind = pc.index_in(
                group.column(type_col), value_set=pa.array(stages)
            ).to_numpy(zero_copy_only=False).astype(np.int64)
            order = np.lexsort((ts, u))
            u, ts, kind = u[order], ts[order], kind[order]
            new_run = np.ones(len(u), dtype=bool)
            new_run[1:] = u[1:] != u[:-1]
            starts = np.flatnonzero(new_run)
            lens = np.diff(np.concatenate([starts, [len(u)]]))
            for size in np.unique(lens):
                runs = starts[lens == size]
                idx = runs[:, None] + np.arange(size)[None, :]
                mt, mk = ts[idx], kind[idx]
                prev = np.full(len(runs), TS_MIN, dtype=np.int64)
                depth = np.zeros(len(runs), dtype=np.int64)
                alive = np.ones(len(runs), dtype=bool)
                for i in range(n_stages):
                    cand = np.where((mk == i) & (mt > prev[:, None]), mt, TS_MAX)
                    m = cand.min(axis=1)
                    ok = alive & (m != TS_MAX)
                    prev = np.where(ok, m, prev)
                    depth += ok
                    alive = ok
                hist += np.bincount(depth, minlength=n_stages + 1)
        return pa.table(
            {
                "depth": pa.array(np.arange(n_stages + 1), type=pa.int64()),
                "n": pa.array(hist, type=pa.int64()),
            }
        )

    from dots_ocr_ray.util import bounded_blocks

    per_depth = (
        bounded_blocks(events.map_batches(_prune, batch_format="pyarrow"))
        .map_batches(_tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(_depth_fold, batch_format="pyarrow")
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


def cohort_retention(sf_dir: str) -> ray.data.Dataset:
    """Weekly cohort retention matrix: users grouped by their
    first-activity week (the cohort), counted in every later week they
    return — the product-analytics staple.

    Exchange budget at 10^12 events / 10^9 users:
    1. per-batch DISTINCT (user_id, week) partials → one multi-key
       groupby — the input collapses to user-weeks BEFORE any join;
    2. per-user cohort = built-in vectorized ``groupby.min`` over the
       user-week table (no per-group Python);
    3. user-week ⋈ cohort via :func:`~.relational.attach_int_column`
       (budget-tiered: broadcast gather while the cohort table fits,
       one bucket-keyed hash-join exchange above — both sides are
       user-cardinality at 10^9 users);
    4. final (cohort_week, offset) count: per-batch partials into a
       ≤ weeks² tiny sum.

    Output: (cohort_week, offset_weeks, n_users); counts are exact
    because step 1's groupby makes user-weeks globally distinct.
    Weeks travel as INT64 microseconds through every exchange — Ray's
    groupby/sort aggregators round-trip timestamp keys through numpy
    and lose the us unit (timestamp[s] blocks + schema-mismatch
    warnings); the cast back to timestamp happens once at the end."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from dots_ocr_ray.pipelines.relational import attach_int_column

    events = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def _partial(batch: pa.Table) -> pa.Table:
        week = pc.floor_temporal(batch.column("ts"), unit="week").cast(
            pa.timestamp("us")
        ).cast(pa.int64())
        t = pa.table({"user_id": batch.column("user_id"), "week": week})
        return t.group_by(["user_id", "week"]).aggregate([])

    uw = (
        events.map_batches(_partial, batch_format="pyarrow")
        .groupby(["user_id", "week"])
        .count()
        .select_columns(["user_id", "week"])
    )

    def _rename_cohort(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(["user_id", "cohort_week"])

    cohort = (
        uw.groupby("user_id").min("week").map_batches(_rename_cohort, batch_format="pyarrow")
    )

    joined = attach_int_column(
        uw,
        cohort,
        on="user_id",
        value_col="cohort_week",
        left_schema=pa.schema([("user_id", pa.int64()), ("week", pa.int64())]),
        side_schema=pa.schema([("user_id", pa.int64()), ("cohort_week", pa.int64())]),
    )

    US_PER_WEEK = 7 * 86400 * 10**6

    def _count(batch: pa.Table) -> pa.Table:
        w = batch.column("week").to_numpy(zero_copy_only=False)
        c = batch.column("cohort_week").to_numpy(zero_copy_only=False)
        off = (w - c) // US_PER_WEEK
        t = pa.table(
            {
                "cohort_week": batch.column("cohort_week"),
                "offset_weeks": pa.array(off, type=pa.int64()),
                "n": pa.array(np.ones(len(off), np.int64)),
            }
        )
        return t.group_by(["cohort_week", "offset_weeks"]).aggregate([("n", "sum")])

    agg = (
        joined.map_batches(_count, batch_format="pyarrow")
        .groupby(["cohort_week", "offset_weeks"])
        .sum("n_sum")
    )

    def _finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "cohort_week": batch.column("cohort_week").cast(pa.timestamp("us")),
                "offset_weeks": batch.column("offset_weeks"),
                "n_users": batch.column("sum(n_sum)").cast(pa.int64()),
            }
        )

    return agg.map_batches(_finish, batch_format="pyarrow")


def decayed_counts(
    ds: ray.data.Dataset,
    *,
    key_col: str,
    ts_col: str = "ts",
    half_life_days: float = 7.0,
    micro: int = 1_000_000,
) -> pa.Table:
    """Exponentially time-decayed counts per key → ``(key,
    decayed_micro, n)`` — the freshness-weighted popularity signal
    (recrawl priority, trending detection) where an event ``d`` days
    before the corpus max-timestamp contributes ``2^(-d/half_life)``.

    Exactness contract: each row's weight quantizes to
    ``floor(2^(-age/hl) · 1e6)`` int64 BEFORE summing (the micro-unit
    discipline), so per-key totals are integer sums — bit-identical
    to the SQL mirror and to any partitioning.  Two stateless passes:
    max-timestamp, then per-batch per-key int64 partials into one tiny
    keyed exchange."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    # pass 1: corpus reference timestamp (µs)
    def _us(col: pa.ChunkedArray) -> pa.ChunkedArray:
        # pin the unit: [ns]/[s] inputs would silently scale ages
        return col.cast(pa.timestamp("us")).cast(pa.int64())

    ref_us = None
    for b in ds.map_batches(
        lambda t: pa.table(
            {"m": pa.array([pc.max(_us(t.column(ts_col))).as_py()], type=pa.int64())}
        ),
        batch_format="pyarrow",
    ).iter_batches(batch_format="pyarrow"):
        for r in range(b.num_rows):
            v = b.column("m")[r].as_py()
            if v is not None:
                ref_us = v if ref_us is None else max(ref_us, v)
    if ref_us is None:
        return pa.table(
            {
                key_col: pa.array([], pa.string()),
                "decayed_micro": pa.array([], pa.int64()),
                "n": pa.array([], pa.int64()),
            }
        )

    def _partial(batch: pa.Table, _ref=ref_us) -> pa.Table:
        us = (
            batch.column(ts_col)
            .cast(pa.timestamp("us"))
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        age_days = (_ref - us) / 86400000000.0
        w = np.floor(np.power(2.0, -age_days / half_life_days) * micro).astype(np.int64)
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(keys, return_inverse=True)
        sums = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(sums, inv, w)
        ns = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {
                key_col: pa.array(uniq.tolist()),
                "d": pa.array(sums, type=pa.int64()),
                "n": pa.array(ns, type=pa.int64()),
            }
        )

    agg = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(key_col)
        .sum(["d", "n"])
    )
    out = pa.concat_tables(
        [
            pa.table(
                {
                    key_col: b.column(key_col),
                    "decayed_micro": b.column("sum(d)").cast(pa.int64()),
                    "n": b.column("sum(n)").cast(pa.int64()),
                }
            )
            for b in agg.iter_batches(batch_format="pyarrow")
            if b.num_rows
        ]
        or [
            pa.table(
                {
                    key_col: pa.array([], pa.string()),
                    "decayed_micro": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        ]
    )
    import pyarrow.compute as _pc

    return out.take(_pc.sort_indices(out, sort_keys=[(key_col, "ascending")]))


def ohlc_bars(
    events: ray.data.Dataset,
    *,
    key_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    val_col: str = "value",
    bar_us: int = 3_600_000_000,
) -> ray.data.Dataset:
    """Time-bar downsampling (OHLC resample): per (key, bar) emit
    open / high / low / close / n / integer-cent sum, where open and
    close are the values of the first / last event in deterministic
    (ts, id) order — the metrics-rollup / market-bar operator that
    turns 10^12 raw events into a bounded keys x bars table.

    Scale shape: a stateless per-batch partial collapses every batch
    to <= (keys x bars present in the batch) rows carrying mergeable
    stats (open/close ride with their (ts, id) coordinate, so partials
    fold associatively under ANY partitioning); the single keyed
    exchange then moves partials, never events.  The final per-group
    fold is a vectorized lexsort over a handful of partial rows —
    group count is bounded by keys x bars (time-bounded), not corpus
    size.  Sums quantize to int64 cents BEFORE summing (the repo-wide
    micro-unit rule) so totals are bit-identical to the SQL mirror."""
    import numpy as np
    import pyarrow as pa

    def _partial(batch: "pa.Table") -> "pa.Table":
        ts = batch.column(ts_col).to_numpy(zero_copy_only=False).astype(np.int64)
        eid = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        val = batch.column(val_col).to_numpy(zero_copy_only=False).astype(np.float64)
        keys = batch.column(key_col).to_numpy(zero_copy_only=False)
        bar = ts // bar_us
        cents = np.round(val * 100).astype(np.int64)
        # group in-batch by (key, bar) via lexsort + run boundaries
        order = np.lexsort((eid, ts, bar, keys))
        ts, eid, val, keys, bar, cents = (
            ts[order], eid[order], val[order], keys[order], bar[order], cents[order]
        )
        new_grp = np.ones(len(keys), dtype=bool)
        if len(keys) > 1:
            new_grp[1:] = (keys[1:] != keys[:-1]) | (bar[1:] != bar[:-1])
        starts = np.flatnonzero(new_grp)
        ends = np.concatenate([starts[1:], [len(keys)]])
        lo = np.minimum.reduceat(val, starts) if len(keys) else np.empty(0)
        hi = np.maximum.reduceat(val, starts) if len(keys) else np.empty(0)
        return pa.table(
            {
                key_col: pa.array(keys[starts]),
                "bar": pa.array(bar[starts], type=pa.int64()),
                "open_ts": pa.array(ts[starts], type=pa.int64()),
                "open_id": pa.array(eid[starts], type=pa.int64()),
                "open": pa.array(val[starts], type=pa.float64()),
                "close_ts": pa.array(ts[ends - 1], type=pa.int64()),
                "close_id": pa.array(eid[ends - 1], type=pa.int64()),
                "close": pa.array(val[ends - 1], type=pa.float64()),
                "lo": pa.array(lo, type=pa.float64()),
                "hi": pa.array(hi, type=pa.float64()),
                "sum_cents": pa.array(np.add.reduceat(cents, starts), type=pa.int64()),
                "n": pa.array((ends - starts).astype(np.int64), type=pa.int64()),
            }
        )

    def _fold(group: pd.DataFrame) -> pd.DataFrame:
        import numpy as _np

        o = _np.lexsort((group["open_id"].to_numpy(), group["open_ts"].to_numpy()))[0]
        c = _np.lexsort((-group["close_id"].to_numpy(), -group["close_ts"].to_numpy()))[0]
        return pd.DataFrame(
            {
                key_col: [group[key_col].iloc[0]],
                "bar": [int(group["bar"].iloc[0])],
                "open": [float(group["open"].iloc[o])],
                "high": [float(group["hi"].max())],
                "low": [float(group["lo"].min())],
                "close": [float(group["close"].iloc[c])],
                "n": [int(group["n"].sum())],
                "sum_cents": [int(group["sum_cents"].sum())],
            }
        )

    return (
        events.map_batches(_partial, batch_format="pyarrow")
        .groupby([key_col, "bar"])
        .map_groups(_fold, batch_format="pandas")
    )


def late_event_audit(sf_dir: str) -> "ray.data.Dataset":
    """Watermark / out-of-order audit — the late-data accounting a
    streaming ingest runs before choosing a watermark delay: per user,
    how many events ARRIVED (ingest order = ``event_id``) with an
    event-time ``ts`` older than the running event-time high-water
    mark, and by how much at worst.

    One range-partitioned sort on (user_id, event_id) + vectorized
    per-batch segment logic (``_sorted_user_apply``): the per-event
    watermark is a segmented cummax of the previous event's timestamp
    (one Cython ``groupby.cummax`` call per BATCH, never per user).
    The per-user rollup then folds per-batch partials through one
    bucket-keyed exchange — Python cost O(buckets), not O(users).
    Output: (user_id, n_events, n_late, max_late_us), all int64 —
    hash-exact against the SQL window oracle.
    """
    import numpy as np
    import pyarrow as pa

    events = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_id", "ts"]
    )

    def _pd_late(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values("event_id").reset_index(drop=True)
        us = g["ts"].astype("datetime64[us]").astype("int64")
        wm = us.cummax().shift(1)
        late = (wm - us).clip(lower=0).fillna(0).astype("int64")
        return pd.DataFrame(
            {"user_id": g["user_id"], "event_id": g["event_id"], "late_us": late}
        )

    def _vec(batch: pa.Table, u: np.ndarray, new_user: np.ndarray) -> pa.Table:
        n = batch.num_rows
        us = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        seg = np.cumsum(new_user) - 1
        prev = np.empty(n, dtype=np.float64)
        prev[0] = -np.inf
        if n > 1:
            prev[1:] = us[:-1]
        prev[new_user] = -np.inf
        wm = pd.Series(prev).groupby(seg).cummax().to_numpy()
        late = np.where(np.isfinite(wm), np.maximum(wm - us, 0), 0).astype(np.int64)
        return pa.table(
            {
                "user_id": batch.column("user_id").cast(pa.int64()),
                "event_id": batch.column("event_id").cast(pa.int64()),
                "late_us": pa.array(late, type=pa.int64()),
            }
        )

    per_event = _sorted_user_apply(
        events,
        sort_cols=["event_id"],
        vec_fn=_vec,
        pandas_fn=_pd_late,
        out_fields=[
            ("user_id", pa.int64()),
            ("event_id", pa.int64()),
            ("late_us", pa.int64()),
        ],
    )

    def _partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "user_id": pa.array([], type=pa.int64()),
                    "n_events": pa.array([], type=pa.int64()),
                    "n_late": pa.array([], type=pa.int64()),
                    "max_late_us": pa.array([], type=pa.int64()),
                    "__bucket": pa.array([], type=pa.int32()),
                }
            )
        uid = batch.column("user_id").to_numpy(zero_copy_only=False).astype(np.int64)
        late = batch.column("late_us").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(uid, kind="stable")
        uid, late = uid[order], late[order]
        starts = np.concatenate([[0], np.nonzero(np.diff(uid))[0] + 1])
        ends = np.concatenate([starts[1:], [len(uid)]])
        n = (ends - starts).astype(np.int64)
        n_late = np.add.reduceat((late > 0).astype(np.int64), starts)
        max_late = np.maximum.reduceat(late, starts)
        with np.errstate(over="ignore"):
            bkt = (uid[starts].astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(64)
        return pa.table(
            {
                "user_id": pa.array(uid[starts], type=pa.int64()),
                "n_events": pa.array(n, type=pa.int64()),
                "n_late": pa.array(n_late, type=pa.int64()),
                "max_late_us": pa.array(max_late, type=pa.int64()),
                "__bucket": pa.array(bkt.astype(np.int32), type=pa.int32()),
            }
        )

    def _fold(group: pa.Table) -> pa.Table:
        uid = group.column("user_id").to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(uid, return_inverse=True)
        n = np.zeros(len(uniq), dtype=np.int64)
        nl = np.zeros(len(uniq), dtype=np.int64)
        ml = np.zeros(len(uniq), dtype=np.int64)
        np.add.at(n, inv, group.column("n_events").to_numpy(zero_copy_only=False))
        np.add.at(nl, inv, group.column("n_late").to_numpy(zero_copy_only=False))
        np.maximum.at(ml, inv, group.column("max_late_us").to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "user_id": pa.array(uniq, type=pa.int64()),
                "n_events": pa.array(n, type=pa.int64()),
                "n_late": pa.array(nl, type=pa.int64()),
                "max_late_us": pa.array(ml, type=pa.int64()),
            }
        )

    return (
        per_event.map_batches(_partial, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(_fold, batch_format="pyarrow")
    )


def interval_coverage(
    events: "ray.data.Dataset",
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> "ray.data.Dataset":
    """Per-user interval UNION (gaps-and-islands merge): each event
    opens the interval ``[ts, ts + dur)`` with the deterministic
    duration ``((|cents| % 3600) + 60) seconds`` (cents = value·100
    rounded; the abs keeps numpy's floored ``%`` and SQL's
    sign-keeping ``%`` on the same non-negative operand, so negative
    values cannot silently diverge from the oracle or open an
    end-before-start interval); overlapping intervals merge into
    islands, and the rollup reports ``(user_id, n_events, n_islands,
    covered_us)`` — the distinct-busy-time aggregate interval joins
    can't express.

    Shape: ONE coarse 256-way exchange on hash(user); each bucket
    resolves every user with a single lexsort + per-user-run-size-class
    row-wise cummax (an island starts where start > cummax of previous
    ends; every run starts an island at column 0, so islands never span
    rows and the per-island covered spans reduce through one bincount)
    — identical in effect to the SQL mirror's ``max(e) OVER (... 1
    PRECEDING)`` windows, no Python call per user.  All int64 µs
    arithmetic — hash-exact under any partitioning."""
    import numpy as np
    import pyarrow as pa

    _MIX = np.uint64(0x9E3779B97F4A7C15)

    def _tag(batch: pa.Table) -> pa.Table:
        u = batch.column(user_col).to_numpy(zero_copy_only=False).astype(np.uint64)
        with np.errstate(over="ignore"):
            bkt = (u * _MIX) % np.uint64(256)
        return batch.append_column(
            "__bucket", pa.array(bkt.astype(np.int32), type=pa.int32())
        )

    def _cover_fold(group: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                user_col: pa.array([], type=pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "n_islands": pa.array([], pa.int64()),
                "covered_us": pa.array([], pa.int64()),
            }
        )
        if group.num_rows == 0:
            return empty
        u = group.column(user_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ts = group.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        val = group.column(value_col).to_numpy(zero_copy_only=False)
        cents = np.round(val * 100).astype(np.int64)
        dur_us = ((np.abs(cents) % 3600) + 60) * 1_000_000
        s = ts
        e = ts + dur_us
        order = np.lexsort((e, s, u))
        u, s, e = u[order], s[order], e[order]
        new_run = np.ones(len(u), dtype=bool)
        new_run[1:] = u[1:] != u[:-1]
        rstarts = np.flatnonzero(new_run)
        lens = np.diff(np.concatenate([rstarts, [len(u)]]))
        out_u: list[np.ndarray] = []
        out_ev: list[np.ndarray] = []
        out_is: list[np.ndarray] = []
        out_cov: list[np.ndarray] = []
        for size in np.unique(lens):
            runs = rstarts[lens == size]
            idx = runs[:, None] + np.arange(size)[None, :]
            ms, me = s[idx], e[idx]
            run = np.maximum.accumulate(me, axis=1)
            new_island = np.empty_like(ms, dtype=bool)
            new_island[:, 0] = True
            if size > 1:
                new_island[:, 1:] = ms[:, 1:] > run[:, :-1]
            fm = new_island.ravel()
            fs = ms.ravel()
            frun = run.ravel()
            isl_starts = np.flatnonzero(fm)
            isl_ends = np.append(isl_starts[1:], len(fs)) - 1
            cov = frun[isl_ends] - fs[isl_starts]
            rows = isl_starts // int(size)
            out_u.append(u[runs])
            out_ev.append(np.full(len(runs), int(size), dtype=np.int64))
            out_is.append(np.bincount(rows, minlength=len(runs)).astype(np.int64))
            out_cov.append(
                np.bincount(rows, weights=cov, minlength=len(runs)).astype(np.int64)
            )
        return pa.table(
            {
                user_col: pa.array(np.concatenate(out_u), type=pa.int64()),
                "n_events": pa.array(np.concatenate(out_ev), pa.int64()),
                "n_islands": pa.array(np.concatenate(out_is), pa.int64()),
                "covered_us": pa.array(np.concatenate(out_cov), pa.int64()),
            }
        )

    return (
        events.select_columns([user_col, ts_col, value_col])
        .map_batches(_tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(_cover_fold, batch_format="pyarrow")
    )


# --- timing-regularity bot detection ---------------------------------------------

def bot_regularity_scores(
    ds: "ray.data.Dataset",
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    min_events: int = 5,
    cv_threshold_micro: int = 200_000,
):
    """Behavioral bot screen: a client whose inter-event gaps are TOO
    REGULAR (coefficient of variation below threshold) is a scheduler,
    not a human — the standard crawl-log heuristic.

    Exactness contract: per-user gap sufficient stats (n, Σgap, Σgap²)
    in exact int64 microseconds; ``cv_micro = floor(1e6 ·
    sqrt(n·Σg² − (Σg)²) / Σg)`` computed from ARBITRARY-PRECISION
    python ints on the bounded per-user fold (the int64 regime would
    overflow at Σg² ≈ 10^18 — day-long gaps do that in µs), one float
    sqrt mirrored by the SQL oracle's operand order.  Users with
    < ``min_events`` events (i.e. < min_events−1 gaps) are not
    judged.

    Scale shape: ONE user-keyed exchange; within each group a
    vectorized sort + diff; output one row per judged user."""
    import numpy as np
    import pyarrow as pa

    def _tag(batch: pa.Table) -> pa.Table:
        ids = batch.column(user_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ts = (
            batch.column(ts_col)
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        with np.errstate(over="ignore"):
            bkt = (ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(64)
        return pa.table(
            {
                "u": pa.array(ids, type=pa.int64()),
                "t": pa.array(ts, type=pa.int64()),
                "__bucket": pa.array(bkt.astype(np.int32), type=pa.int32()),
            }
        )

    def _fold(group: pa.Table) -> pa.Table:
        import math

        u = group.column("u").to_numpy(zero_copy_only=False)
        t = group.column("t").to_numpy(zero_copy_only=False)
        order = np.lexsort((t, u))
        u, t = u[order], t[order]
        starts = np.concatenate([[0], np.nonzero(np.diff(u))[0] + 1])
        ends = np.concatenate([starts[1:], [len(u)]])
        users, ns, cvs, bots = [], [], [], []
        for s, e in zip(starts, ends):
            n_ev = e - s
            if n_ev < min_events:
                continue
            gaps = np.diff(t[s:e]).astype(object)  # python ints: exact Σg²
            n = len(gaps)
            sg = int(sum(gaps))
            sgg = int(sum(g * g for g in gaps))
            if sg == 0:
                cv = 0
            else:
                var_num = n * sgg - sg * sg  # ≥ 0 by Cauchy-Schwarz
                cv = int(math.floor(1_000_000.0 * math.sqrt(float(var_num)) / sg))
            users.append(int(u[s]))
            ns.append(int(n_ev))
            cvs.append(cv)
            bots.append(cv < cv_threshold_micro)
        return pa.table(
            {
                "user_id": pa.array(users, type=pa.int64()),
                "n_events": pa.array(ns, type=pa.int64()),
                "cv_micro": pa.array(cvs, type=pa.int64()),
                "is_bot": pa.array(bots, type=pa.bool_()),
            }
        )

    out = (
        ds.select_columns([user_col, ts_col])
        .map_batches(_tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(_fold, batch_format="pyarrow")
    )
    parts = [b for b in out.iter_batches(batch_format="pyarrow") if b.num_rows]
    if not parts:
        return pa.table(
            {
                "user_id": pa.array([], type=pa.int64()),
                "n_events": pa.array([], type=pa.int64()),
                "cv_micro": pa.array([], type=pa.int64()),
                "is_bot": pa.array([], type=pa.bool_()),
            }
        )
    return pa.concat_tables(parts)


def event_trigrams(
    ds: "ray.data.Dataset",
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    min_count: int = 2,
) -> pa.Table:
    """Frequent 3-step behavioral sequences: (t1, t2, t3, n) for
    consecutive event-type triples within a user's stream in
    (ts, event_id) order, kept when seen >= min_count times — the
    sequence-mining table one step past the Markov transition counts.

    Scale shape: ONE user-keyed exchange; per-group vectorized sort +
    two shifts emits trigram partials (a user's triples never span
    groups); bounded trigram table merged with one groupby; min_count
    bounds the output."""
    import numpy as np
    import pyarrow as pa

    def _tag(batch: pa.Table) -> pa.Table:
        ids = batch.column(user_col).to_numpy(zero_copy_only=False).astype(np.int64)
        with np.errstate(over="ignore"):
            bkt = (ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) % np.uint64(64)
        ts = (
            batch.column(ts_col)
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype(np.int64)
        )
        return pa.table(
            {
                "u": pa.array(ids, type=pa.int64()),
                "t": pa.array(ts, type=pa.int64()),
                "e": batch.column(id_col).cast(pa.int64()),
                "ty": batch.column(type_col).cast(pa.string()),
                "__bucket": pa.array(bkt.astype(np.int32), type=pa.int32()),
            }
        )

    def _fold(group: pa.Table) -> pa.Table:
        u = group.column("u").to_numpy(zero_copy_only=False)
        t = group.column("t").to_numpy(zero_copy_only=False)
        e = group.column("e").to_numpy(zero_copy_only=False)
        ty = np.array(group.column("ty").to_pylist())
        order = np.lexsort((e, t, u))
        u, ty = u[order], ty[order]
        if len(u) < 3:
            return pa.table(
                {"tri": pa.array([], type=pa.string()), "n": pa.array([], type=pa.int64())}
            )
        same = (u[2:] == u[1:-1]) & (u[1:-1] == u[:-2])
        tris = np.array(
            [f"{a}\x1f{b}\x1f{c}" for a, b, c in zip(ty[:-2], ty[1:-1], ty[2:])]
        )[same]
        if not len(tris):
            return pa.table(
                {"tri": pa.array([], type=pa.string()), "n": pa.array([], type=pa.int64())}
            )
        uniq, cnt = np.unique(tris, return_counts=True)
        return pa.table(
            {
                "tri": pa.array(uniq.tolist(), type=pa.string()),
                "n": pa.array(cnt.astype(np.int64), type=pa.int64()),
            }
        )

    folded = (
        ds.select_columns([user_col, ts_col, id_col, type_col])
        .map_batches(_tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(_fold, batch_format="pyarrow")
        .groupby("tri")
        .sum("n")
        .to_pandas()
    )
    folded = folded[folded["sum(n)"] >= min_count].sort_values("tri")
    parts = [s.split("\x1f") for s in folded["tri"]]
    return pa.table(
        {
            "t1": pa.array([p[0] for p in parts], type=pa.string()),
            "t2": pa.array([p[1] for p in parts], type=pa.string()),
            "t3": pa.array([p[2] for p in parts], type=pa.string()),
            "n": pa.array([int(x) for x in folded["sum(n)"]], type=pa.int64()),
        }
    )
