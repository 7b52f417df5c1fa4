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
    gap = pd.Timedelta(minutes=SESSION_GAP_MIN)

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        brk = (g["ts"].diff() > gap) | g["ts"].diff().isna()
        sid = brk.cumsum() - 1
        out = g.assign(session_id=sid.astype("int64")).groupby("session_id").agg(
            n_events=("event_id", "size"),
            session_start=("ts", "min"),
            session_end=("ts", "max"),
        )
        out = out.reset_index()
        out.insert(0, "user_id", g["user_id"].iloc[0])
        out["n_events"] = out["n_events"].astype("int64")
        # composite string key: natural session identifier, and keeps
        # the output out of the all-fixed-width layout (ROADMAP.md §6b)
        out["session_key"] = out["user_id"].astype(str) + ":" + out["session_id"].astype(str)
        return out

    out = (
        _read_events(sf_dir)
        .select_columns(["user_id", "ts", "event_id"])
        .groupby("user_id")
        .map_groups(sessions, batch_format="pandas")
        .to_pandas()
    )
    out["user_id"] = out["user_id"].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


ORACLE_SQL = {
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
}

QUERIES = {
    "windowed_agg": q_windowed_agg,
    "sessionize": q_sessionize,
}
