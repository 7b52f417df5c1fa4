"""Stream-shaped operators over the ``events`` table.

Ray Data has no event-time windows; per the engine's streaming
contract (SURVEY.md §2.9) the input is treated as an ordered,
partitioned log: tumbling windows are a plain groupby on the truncated
timestamp; sessionization is a per-user ``map_groups`` over the
ts-sorted group (gap > 30 min ⇒ new session) — the same ordered
per-group scan shape as the reference's span clustering
(/root/reference/scoring/core.py:139-170) and reuse-decay counter
(/root/reference/enhanced_pipeline.py:607-647).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Sum

SESSION_GAP_MIN = 30


def _read_events(sf_dir: str):
    return ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"))


def q_windowed_agg(sf_dir: str) -> pa.Table:
    """Tumbling 1-hour windows per event_type: count + sum(value)."""
    import pyarrow.compute as pc

    def add_window(batch: pa.Table) -> pa.Table:
        # Arrow-native window assignment: floor_temporal is a zero-copy
        # kernel over the ts column (the former pandas detour converted
        # every batch just to call .dt.floor)
        return pa.table(
            {
                "event_type": batch["event_type"],
                "window_start": pc.floor_temporal(batch["ts"], unit="hour"),
                "value": batch["value"],
            }
        )

    out = (
        _read_events(sf_dir)
        .map_batches(add_window, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="sum_value"))
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    out["sum_value"] = np.round(out["sum_value"].astype(np.float64), 6)
    return pa.Table.from_pandas(out, preserve_index=False)


def q_sessionize(sf_dir: str) -> pa.Table:
    """Gap-based sessionization per user (gap > 30 min ⇒ new session):
    (user_id, session_id, n_events, session_start, session_end)."""
    gap_us = np.int64(SESSION_GAP_MIN) * 60 * 1_000_000

    def sessions(g: pa.Table) -> pa.Table:
        # Arrow-native ordered scan: sort by (ts, event_id), break a
        # session where the gap exceeds the threshold, then per-session
        # aggregates fall out of the break positions — first/last of the
        # sorted timestamps — with no pandas conversion or sub-groupby
        ts = g["ts"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((eid, ts))
        ts = ts[order]
        us = ts.astype("datetime64[us]").astype(np.int64)
        brk = np.r_[True, np.diff(us) > gap_us]
        starts = np.flatnonzero(brk)
        ends = np.r_[starts[1:], us.size]
        uid = int(g["user_id"][0].as_py())
        sid = np.arange(starts.size, dtype=np.int64)
        return pa.table(
            {
                "user_id": pa.array(np.full(starts.size, uid, dtype=np.int64)),
                "session_id": pa.array(sid),
                "n_events": pa.array((ends - starts).astype(np.int64)),
                "session_start": pa.array(ts[starts]),
                "session_end": pa.array(ts[ends - 1]),
                # composite string key: natural session identifier, and keeps
                # the output out of the all-fixed-width layout (ROADMAP.md §6b)
                "session_key": pa.array([f"{uid}:{s}" for s in sid], type=pa.string()),
            }
        )

    sessions.__name__ = "sessions"
    out = (
        _read_events(sf_dir)
        .select_columns(["user_id", "ts", "event_id"])
        .groupby("user_id")
        .map_groups(sessions, batch_format="pyarrow")
        .to_pandas()
    )
    out["user_id"] = out["user_id"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def q_asof_join(sf_dir: str) -> pa.Table:
    """AS-OF join (a custom operator Ray Data lacks): each 'purchase'
    event picks up the MOST RECENT prior 'click' (click.ts ≤
    purchase.ts) of the same user — the classic point-in-time
    enrichment. Expressed as a per-user ``map_groups`` over the
    ts-sorted group (the same user-partitioning assumption as
    sessionize: one user's history fits a worker); inside, the match is
    one vectorized ``searchsorted`` of purchase timestamps into the
    user's click timeline. Purchases with no prior click keep nulls
    (left semantics). Ties on ts resolve to the LAST click in
    (ts, event_id) order — matching the SQL oracle's max-ts pick."""

    def asof(g: pd.DataFrame) -> pd.DataFrame:
        p = g[g.event_type == "purchase"].sort_values(["ts", "event_id"])
        c = g[g.event_type == "click"].sort_values(["ts", "event_id"])
        if p.empty:
            return pd.DataFrame({
                "event_id": pd.Series(dtype="int64"),
                "user_id": pd.Series(dtype="int64"),
                "ts": pd.Series(dtype="datetime64[us]"),
                "value": pd.Series(dtype="float64"),
                "click_event_id": pd.Series(dtype="float64"),
                "click_ts": pd.Series(dtype="datetime64[us]"),
                "click_value": pd.Series(dtype="float64"),
            })
        if c.empty:
            # a purchase-only user: all left rows, no clicks to index
            # (np.where would eagerly index the empty click arrays)
            return pd.DataFrame({
                "event_id": p["event_id"].to_numpy(),
                "user_id": p["user_id"].to_numpy(),
                "ts": p["ts"].to_numpy(),
                "value": np.round(p["value"].to_numpy(), 6),
                "click_event_id": np.full(len(p), np.nan),
                "click_ts": pd.Series([pd.NaT] * len(p), dtype="datetime64[us]"),
                "click_value": np.full(len(p), np.nan),
            })
        idx = np.searchsorted(c["ts"].to_numpy(), p["ts"].to_numpy(), side="right") - 1
        has = idx >= 0
        out = pd.DataFrame({
            "event_id": p["event_id"].to_numpy(),
            "user_id": p["user_id"].to_numpy(),
            "ts": p["ts"].to_numpy(),
            "value": np.round(p["value"].to_numpy(), 6),
            "click_event_id": np.where(
                has, c["event_id"].to_numpy()[np.maximum(idx, 0)], np.nan
            ),
            "click_ts": pd.Series(
                np.where(has, c["ts"].to_numpy()[np.maximum(idx, 0)],
                         np.datetime64("NaT")),
                dtype="datetime64[us]",
            ),
            "click_value": np.where(
                has, np.round(c["value"].to_numpy()[np.maximum(idx, 0)], 6), np.nan
            ),
        })
        return out

    asof.__name__ = "asof"
    import pyarrow.compute as pc

    wanted = pa.array(["purchase", "click"], type=pa.string())
    out = (
        _read_events(sf_dir)
        .select_columns(["event_id", "ts", "user_id", "event_type", "value"])
        .map_batches(  # vectorized Arrow predicate, not a per-row filter
            lambda t: t.filter(pc.is_in(t["event_type"], value_set=wanted)),
            batch_format="pyarrow",
        )
        .groupby("user_id")
        .map_groups(asof, batch_format="pandas")
        .to_pandas()
    )
    return pa.Table.from_pandas(
        out.sort_values("event_id").reset_index(drop=True), preserve_index=False
    )


# Fixed OVERLAPPING interval table for the range join (an event can
# fall in up to two intervals): 5-day windows starting every 3 days.
RANGE_INTERVALS: list[tuple[int, str, str]] = [
    (i, f"2024-01-{1 + 3 * i:02d} 00:00:00", f"2024-01-{6 + 3 * i:02d} 00:00:00")
    for i in range(8)
]


def q_range_join(sf_dir: str) -> pa.Table:
    """RANGE join (interval containment — a custom operator Ray Data
    lacks): events joined to every interval with start ≤ ts < end,
    aggregated per interval. Implemented as a BROADCAST range join —
    the interval table is the small side (shipped in the task closure;
    at scale: ``ray.put`` once, read per task), so no all-to-all
    shuffle of the events at all: each batch computes vectorized
    per-interval partial aggregates (the combiner) and only the tiny
    (interval_id, n, sum) partials hit the final groupby."""
    import pyarrow.compute as pc

    starts = np.array([np.datetime64(s) for _, s, _ in RANGE_INTERVALS])
    ends = np.array([np.datetime64(e) for _, _, e in RANGE_INTERVALS])
    iids = np.array([i for i, _, _ in RANGE_INTERVALS], dtype=np.int64)

    def partials(batch: pa.Table) -> pa.Table:
        ts = batch["ts"].combine_chunks().to_numpy(zero_copy_only=False)
        val = batch["value"].combine_chunks().to_numpy(zero_copy_only=False)
        out_i, out_n, out_s = [], [], []
        for j in range(iids.size):  # small broadcast side: O(intervals) vec ops
            m = (ts >= starts[j]) & (ts < ends[j])
            n = int(m.sum())
            if n:
                out_i.append(iids[j])
                out_n.append(n)
                out_s.append(float(val[m].sum()))
        return pa.table(
            {
                "interval_id": pa.array(out_i, type=pa.int64()),
                "n_events": pa.array(out_n, type=pa.int64()),
                "sum_value": pa.array(out_s, type=pa.float64()),
            }
        )

    out = (
        _read_events(sf_dir)
        .select_columns(["ts", "value"])
        .map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("interval_id")
        .aggregate(Sum("n_events", alias_name="n_events"), Sum("sum_value", alias_name="sum_value"))
        .to_pandas()
    )
    out["n_events"] = out["n_events"].astype("int64")
    out["sum_value"] = np.round(out["sum_value"].astype(np.float64), 6)
    return pa.Table.from_pandas(out.sort_values("interval_id").reset_index(drop=True),
                                preserve_index=False)


_RANGE_VALUES = ", ".join(
    f"({i}, TIMESTAMP '{s}', TIMESTAMP '{e}')" for i, s, e in RANGE_INTERVALS
)

FUNNEL_STEPS = ("signup", "click", "purchase")


def q_event_funnel(sf_dir: str) -> pa.Table:
    """Ordered event-sequence FUNNEL per user: how deep each user gets
    through signup → click → purchase, where each step must occur
    STRICTLY AFTER the earliest completion of the previous step (the
    product-analytics conversion funnel; the per-group ordered-scan
    shape sessionize already relies on — one user's history fits a
    worker). n_steps ∈ 0..3; the string key keeps the output off the
    all-fixed-width block layout (ROADMAP.md §6b)."""

    def funnel(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        ts = g["ts"].to_numpy()
        et = g["event_type"].to_numpy()
        n_steps = 0
        t_prev = None
        for step in FUNNEL_STEPS:
            mask = et == step if t_prev is None else (et == step) & (ts > t_prev)
            idx = np.flatnonzero(mask)
            if idx.size == 0:
                break
            t_prev = ts[idx[0]]
            n_steps += 1
        uid = int(g["user_id"].iloc[0])
        return pd.DataFrame(
            {
                "user_id": np.array([uid], dtype=np.int64),
                "n_steps": np.array([n_steps], dtype=np.int64),
                "funnel_key": [f"{uid}:{n_steps}"],
            }
        )

    funnel.__name__ = "funnel"
    out = (
        _read_events(sf_dir)
        .select_columns(["user_id", "ts", "event_id", "event_type"])
        .groupby("user_id")
        .map_groups(funnel, batch_format="pandas")
        .to_pandas()
    )
    out = out.sort_values("user_id").reset_index(drop=True)
    return pa.table(
        {
            "user_id": pa.array(out["user_id"].astype(np.int64), type=pa.int64()),
            "n_steps": pa.array(out["n_steps"].astype(np.int64), type=pa.int64()),
            "funnel_key": pa.array(out["funnel_key"], type=pa.string()),
        }
    )


def q_event_transitions(sf_dir: str) -> pa.Table:
    """Per-user ordered event-type TRANSITION counts (the Markov /
    bigram statistics a sequence model trains on): for each user's
    (ts, event_id)-ordered stream, count (cur_type → next_type) pairs,
    then sum across users. Same per-group ordered-scan partitioning as
    sessionize; the transition matrix is bounded (|types|²), so the
    final combine is a tiny groupby."""

    def transitions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        et = g["event_type"].to_numpy()
        if et.size < 2:
            return pd.DataFrame(
                {"cur_type": pd.Series(dtype="object"),
                 "next_type": pd.Series(dtype="object"),
                 "cnt": pd.Series(dtype="int64")}
            )
        out = (
            pd.DataFrame({"cur_type": et[:-1], "next_type": et[1:]})
            .groupby(["cur_type", "next_type"], as_index=False)
            .size()
            .rename(columns={"size": "cnt"})
        )
        out["cnt"] = out["cnt"].astype("int64")
        return out

    transitions.__name__ = "transitions"
    out = (
        _read_events(sf_dir)
        .select_columns(["user_id", "ts", "event_id", "event_type"])
        .groupby("user_id")
        .map_groups(transitions, batch_format="pandas")
        .to_pandas()
        .groupby(["cur_type", "next_type"], as_index=False)["cnt"]
        .sum()
        .sort_values(["cur_type", "next_type"])
        .reset_index(drop=True)
    )
    return pa.table(
        {
            "cur_type": pa.array(out["cur_type"], type=pa.string()),
            "next_type": pa.array(out["next_type"], type=pa.string()),
            "cnt": pa.array(out["cnt"].astype(np.int64), type=pa.int64()),
        }
    )


SLIDE_MIN = 15
WINDOW_MIN = 60
_N_SLIDES = WINDOW_MIN // SLIDE_MIN


def q_sliding_agg(sf_dir: str) -> pa.Table:
    """SLIDING 1-hour windows advancing every 15 min, per event_type:
    count + sum(value). The overlapping-window analogue of
    ``windowed_agg`` (tumbling): each event belongs to exactly
    WINDOW/SLIDE = 4 windows, so the map stage REPLICATES the row into
    its windows (vectorized repeat/take — bounded 4× amplification,
    decided per row with no shuffle) and the downstream groupby-agg is
    identical to the tumbling path. Window starts are epoch-aligned
    15-min boundaries (DuckDB time_bucket's origin is a 15-min multiple
    from epoch, so the two agree bucket-for-bucket)."""
    slide_us = SLIDE_MIN * 60 * 1_000_000
    win_us = WINDOW_MIN * 60 * 1_000_000

    def explode(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ts_us = pc.cast(batch["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        n = len(ts_us)
        last = (ts_us // slide_us) * slide_us  # latest window containing ts
        offs = np.arange(_N_SLIDES, dtype=np.int64) * slide_us
        ws = np.repeat(last, _N_SLIDES) - np.tile(offs, n)
        idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), _N_SLIDES))
        assert int(win_us // slide_us) == _N_SLIDES  # every row lands in exactly 4 windows
        return pa.table(
            {
                "event_type": pc.take(batch["event_type"], idx),
                "window_start": pc.cast(pa.array(ws, type=pa.int64()), pa.timestamp("us")),
                "value": pc.take(batch["value"], idx),
            }
        )

    out = (
        _read_events(sf_dir)
        .select_columns(["event_type", "ts", "value"])
        .map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="sum_value"))
        .to_pandas()
    )
    out["n"] = out["n"].astype("int64")
    out["sum_value"] = np.round(out["sum_value"].astype(np.float64), 6)
    return pa.Table.from_pandas(out, preserve_index=False)


MODE_BUCKETS = 64


def q_top_event_type(sf_dir: str) -> pa.Table:
    """Per-group MODE: each user's most frequent event_type (ties →
    lexicographically first). Scale shape: per-batch partial
    (user, type) counts bound what leaves every batch at
    users-in-batch × |types|; the shuffle groups by a COARSENED bucket
    key (user_id % 64 — thousands of tiny Ray groups cost ~1 ms each,
    ROADMAP §7), and the in-bucket pandas argmax is exact."""

    def partial_counts(batch: pa.Table) -> pa.Table:
        # composite-key factorize + one np.unique — no pandas block
        et_uniq, et_inv = np.unique(
            batch["event_type"].to_numpy(zero_copy_only=False), return_inverse=True
        )
        uid = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        key, cnt = np.unique(uid * np.int64(len(et_uniq)) + et_inv, return_counts=True)
        out_uid = key // len(et_uniq)
        return pa.table(
            {
                "user_id": pa.array(out_uid, type=pa.int64()),
                "event_type": pa.array(et_uniq[key % len(et_uniq)], type=pa.string()),
                "cnt": pa.array(cnt.astype(np.int64), type=pa.int64()),
                "bucket": pa.array(out_uid % MODE_BUCKETS, type=pa.int64()),
            }
        )

    def bucket_mode(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby(["user_id", "event_type"], as_index=False)["cnt"].sum()
        tot = tot.sort_values(["user_id", "cnt", "event_type"], ascending=[True, False, True])
        top = tot.groupby("user_id", sort=False).head(1).reset_index(drop=True)
        top["ukey"] = top["user_id"].astype(str) + ":" + top["event_type"]
        return top

    bucket_mode.__name__ = "bucket_mode"
    out = (
        _read_events(sf_dir)
        .select_columns(["user_id", "event_type"])
        .map_batches(partial_counts, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(bucket_mode, batch_format="pandas")
        .to_pandas()
    )
    out["user_id"] = out["user_id"].astype("int64")
    out["cnt"] = out["cnt"].astype("int64")
    return pa.Table.from_pandas(
        out.sort_values("user_id").reset_index(drop=True), preserve_index=False
    )


def q_user_cum_spend(sf_dir: str) -> pa.Table:
    """Running total per user (window-function shape): purchases
    ordered by (ts, event_id) with cumulative spend and 0-based seq.

    Per-user ordered scan via ``groupby(user_id).map_groups`` — the
    same partitioning contract as sessionize (a user's events co-locate
    after the key shuffle; group size is bounded by per-user activity,
    never corpus size). Spend is integer cents (round-half-away, the
    relational module's exactness discipline) so the running sum is
    order-exact regardless of aggregation order."""

    def running(g: pa.Table) -> pa.Table:
        # Arrow-native ordered prefix scan: sort, integer-cents cumsum
        ts = g["ts"].to_numpy(zero_copy_only=False)
        eid = g["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((eid, ts))
        ts, eid = ts[order], eid[order]
        vals = g["value"].to_numpy(zero_copy_only=False).astype(np.float64)[order]
        cents = np.floor(vals * 100.0 + 0.5).astype(np.int64)
        uid = int(g["user_id"][0].as_py())
        seq = np.arange(eid.size, dtype=np.int64)
        return pa.table(
            {
                "user_id": pa.array(np.full(eid.size, uid, dtype=np.int64)),
                "event_id": pa.array(eid),
                "ts": pa.array(ts),
                "spend_cents": pa.array(cents),
                "cum_spend_cents": pa.array(np.cumsum(cents)),
                "seq": pa.array(seq),
                # composite string key: keeps the output out of the
                # all-fixed-width layout (ROADMAP.md §6b) and is the natural row id
                "ukey": pa.array([f"{uid}:{s}" for s in seq], type=pa.string()),
            }
        )

    running.__name__ = "running"
    out = (
        _read_events(sf_dir)
        .filter(expr="event_type == 'purchase'")
        .select_columns(["user_id", "ts", "event_id", "value"])
        .groupby("user_id")
        .map_groups(running, batch_format="pyarrow")
        .to_pandas()
    )
    return pa.Table.from_pandas(out, preserve_index=False)


ORACLE_SQL = {
    "sliding_agg": f"""
        WITH w AS (
          SELECT e.event_type, e.value,
                 time_bucket(INTERVAL '{SLIDE_MIN} minutes', e.ts)
                     - k.i * INTERVAL '{SLIDE_MIN} minutes' AS window_start
          FROM events e CROSS JOIN (VALUES (0),(1),(2),(3)) k(i)
        )
        SELECT event_type, window_start, count(*)::BIGINT AS n,
               round(sum(value), 6) AS sum_value
        FROM w GROUP BY event_type, window_start
    """,
    "top_event_type": """
        WITH c AS (
          SELECT user_id, event_type, count(*)::BIGINT AS cnt
          FROM events GROUP BY user_id, event_type
        ), r AS (
          SELECT *, row_number() OVER (PARTITION BY user_id
                                       ORDER BY cnt DESC, event_type ASC) AS rn
          FROM c
        )
        SELECT user_id, event_type, cnt,
               user_id::VARCHAR || ':' || event_type AS ukey
        FROM r WHERE rn = 1 ORDER BY user_id
    """,
    "user_cum_spend": """
        SELECT user_id, event_id, ts,
               floor(value * 100 + 0.5)::BIGINT AS spend_cents,
               sum(floor(value * 100 + 0.5)::BIGINT)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_spend_cents,
               (row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1)::BIGINT AS seq,
               user_id::VARCHAR || ':' ||
                   (row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1)::VARCHAR AS ukey
        FROM events WHERE event_type = 'purchase'
    """,
    "event_transitions": """
        WITH s AS (
          SELECT user_id, event_type AS cur_type,
                 lead(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS next_type
          FROM events
        )
        SELECT cur_type, next_type, count(*)::BIGINT AS cnt
        FROM s WHERE next_type IS NOT NULL
        GROUP BY cur_type, next_type
    """,
    "event_funnel": """
        WITH s1 AS (
          SELECT user_id, min(ts) AS t1 FROM events
          WHERE event_type = 'signup' GROUP BY user_id
        ),
        s2 AS (
          SELECT e.user_id, min(e.ts) AS t2
          FROM events e JOIN s1 ON s1.user_id = e.user_id
          WHERE e.event_type = 'click' AND e.ts > s1.t1
          GROUP BY e.user_id
        ),
        s3 AS (
          SELECT e.user_id, min(e.ts) AS t3
          FROM events e JOIN s2 ON s2.user_id = e.user_id
          WHERE e.event_type = 'purchase' AND e.ts > s2.t2
          GROUP BY e.user_id
        ),
        u AS (SELECT DISTINCT user_id FROM events),
        d AS (
          SELECT u.user_id,
                 CASE WHEN s3.user_id IS NOT NULL THEN 3
                      WHEN s2.user_id IS NOT NULL THEN 2
                      WHEN s1.user_id IS NOT NULL THEN 1
                      ELSE 0 END AS n_steps
          FROM u
          LEFT JOIN s1 ON s1.user_id = u.user_id
          LEFT JOIN s2 ON s2.user_id = u.user_id
          LEFT JOIN s3 ON s3.user_id = u.user_id
        )
        SELECT user_id, n_steps::BIGINT AS n_steps,
               user_id::VARCHAR || ':' || n_steps::VARCHAR AS funnel_key
        FROM d
    """,
    "range_join": f"""
        WITH iv(interval_id, ts_start, ts_end) AS (VALUES {_RANGE_VALUES})
        SELECT iv.interval_id, count(*)::BIGINT AS n_events,
               round(sum(e.value), 6) AS sum_value
        FROM iv JOIN events e ON e.ts >= iv.ts_start AND e.ts < iv.ts_end
        GROUP BY iv.interval_id
    """,
    "asof_join": """
        SELECT p.event_id, p.user_id, p.ts, round(p.value, 6) AS value,
               c.event_id::DOUBLE AS click_event_id,
               c.ts AS click_ts,
               round(c.value, 6) AS click_value
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
    "windowed_agg": """
        SELECT event_type, date_trunc('hour', ts) AS window_start,
               count(*)::BIGINT AS n, round(sum(value), 6) AS sum_value
        FROM events GROUP BY event_type, date_trunc('hour', ts)
    """,
    "sessionize": f"""
        WITH e AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN lag(ts) OVER w IS NULL
                           OR ts - lag(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTE
                      THEN 1 ELSE 0 END AS brk
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), s AS (
          SELECT user_id, ts,
                 sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) - 1 AS session_id
          FROM e
        )
        SELECT user_id, session_id::BIGINT AS session_id, count(*)::BIGINT AS n_events,
               min(ts) AS session_start, max(ts) AS session_end,
               user_id::VARCHAR || ':' || session_id::VARCHAR AS session_key
        FROM s GROUP BY user_id, session_id
    """,
    "event_retention": """
        WITH act AS (
          SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
        ), coh AS (
          SELECT user_id, min(day) AS cohort_day FROM act GROUP BY user_id
        )
        SELECT c.cohort_day,
               date_diff('day', c.cohort_day, a.day)::BIGINT AS period,
               strftime(c.cohort_day, '%Y-%m-%d') || ':'
                 || date_diff('day', c.cohort_day, a.day)::VARCHAR AS cohort_key,
               count(*)::BIGINT AS n_users
        FROM act a JOIN coh c USING (user_id)
        GROUP BY 1, 2, 3
    """,
    "windowed_delta": """
        WITH w AS (
          SELECT event_type, date_trunc('hour', ts) AS window_start,
                 count(*)::BIGINT AS n, round(sum(value), 6) AS sum_value
          FROM events GROUP BY 1, 2
        ), d AS (
          SELECT event_type, window_start,
                 n - lag(n) OVER (PARTITION BY event_type ORDER BY window_start) AS delta_n,
                 round(sum_value - lag(sum_value) OVER (PARTITION BY event_type ORDER BY window_start), 6) AS delta_sum_value
          FROM w
        )
        SELECT event_type, window_start, delta_n::BIGINT AS delta_n, delta_sum_value
        FROM d WHERE delta_n IS NOT NULL
    """,
}

def q_windowed_delta(sf_dir: str) -> pa.Table:
    """Derivative pipeline aggregation (Elasticsearch ``derivative``
    over a date_histogram): per event_type, the change in hourly event
    count and value sum versus the previous PRESENT bucket. Scale
    shape: the tumbling aggregation shrinks the stream to hours×types
    rows first (same stages as windowed_agg), then a per-type
    ``map_groups`` ordered scan computes consecutive differences —
    group size is bounded by the time range, never event count. The
    first bucket of each type has no predecessor and is omitted
    (Elasticsearch emits no derivative there)."""
    import pyarrow.compute as pc

    def add_window(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_type": batch["event_type"],
                "window_start": pc.floor_temporal(batch["ts"], unit="hour"),
                "value": batch["value"],
            }
        )

    def delta(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("window_start").reset_index(drop=True)
        out = pd.DataFrame(
            {
                "event_type": g["event_type"],
                "window_start": g["window_start"],
                "delta_n": g["n"].diff(),
                "delta_sum_value": np.round(g["sum_value"].diff(), 6),
            }
        ).iloc[1:]
        out["delta_n"] = out["delta_n"].astype("int64")
        return out

    delta.__name__ = "delta"
    out = (
        _read_events(sf_dir)
        .map_batches(add_window, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="sum_value"))
        .map_batches(
            lambda t: t.set_column(
                t.column_names.index("sum_value"), "sum_value",
                pa.array(np.round(t["sum_value"].to_numpy(zero_copy_only=False), 6)),
            ),
            batch_format="pyarrow",
        )
        .groupby("event_type")
        .map_groups(delta, batch_format="pandas")
        .to_pandas()
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def q_event_retention(sf_dir: str) -> pa.Table:
    """Retention cohorts (the classic product-analytics triangle): users
    cohorted by FIRST active day; for each (cohort_day, period) the
    count of cohort users active `period` days after their first day.

    Scale shape, three narrow stages: (1) per-batch local distinct of
    (user_id, day) — what leaves each batch is bounded by users×days in
    the batch, never event count; (2) per-user ``map_groups`` (the
    module's partitioning contract) emits one (cohort_day, period) row
    per active day from the user's deduplicated day set; (3) a small
    groupby((cohort_day, period)).count — output is cohorts×periods
    rows, independent of corpus size. The string cohort_key keeps the
    output off the all-fixed-width block layout (ROADMAP.md §6b)."""
    import pyarrow.compute as pc

    def day_distinct(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "user_id": batch["user_id"],
                "day": pc.floor_temporal(batch["ts"], unit="day"),
            }
        )
        return t.group_by(["user_id", "day"]).aggregate([])  # local distinct

    def retention(g: pd.DataFrame) -> pd.DataFrame:
        days = pd.Series(g["day"].unique()).sort_values().reset_index(drop=True)
        cohort = days.iloc[0]
        period = (days - cohort).dt.days.astype("int64")
        out = pd.DataFrame({"cohort_day": cohort, "period": period})
        out["cohort_key"] = cohort.strftime("%Y-%m-%d") + ":" + out["period"].astype(str)
        return out

    retention.__name__ = "retention"
    out = (
        _read_events(sf_dir)
        .select_columns(["user_id", "ts"])
        .map_batches(day_distinct, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("user_id")
        .map_groups(retention, batch_format="pandas")
        .groupby(["cohort_day", "period", "cohort_key"])
        .aggregate(Count(alias_name="n_users"))
        .to_pandas()
    )
    out["n_users"] = out["n_users"].astype("int64")
    out["period"] = out["period"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


QUERIES = {
    "event_funnel": q_event_funnel,
    "event_transitions": q_event_transitions,
    "windowed_agg": q_windowed_agg,
    "sessionize": q_sessionize,
    "asof_join": q_asof_join,
    "range_join": q_range_join,
    "user_cum_spend": q_user_cum_spend,
    "sliding_agg": q_sliding_agg,
    "top_event_type": q_top_event_type,
    "event_retention": q_event_retention,
    "windowed_delta": q_windowed_delta,
}
