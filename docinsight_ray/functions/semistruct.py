"""Semi-structured (JSON) column extraction over the ``events`` table.

Schema-on-read for JSON payload columns — the training-data analogue
of pulling typed fields out of crawl/metadata sidecars (WARC headers,
provenance blobs) before the relational stages. The reference keeps
its metadata as Python dicts serialized to SQLite
(/root/reference/storage/db.py); here the payload stays a string
column until a vectorized ``map_batches`` stage projects the fields a
downstream pipeline actually needs.

Scale shape: stateless per-row projection, embarrassingly parallel,
no shuffle for the extraction itself; the demo aggregate is a bounded
groupby(event_type) over pre-aggregated per-batch partials. Parsing is
vectorized through polars' Rust JSON path kernel when available, with
a stdlib ``json.loads`` fallback (same semantics, slower) so the op
has no hard dependency outside the baked-in stack.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..collect import collect_table

try:  # vectorized JSON path (Rust) — present in the baked image
    import polars as pl

    _HAVE_POLARS = True
except ImportError:  # pragma: no cover - baked image always has polars
    _HAVE_POLARS = False


def _extract_k(props: pd.Series) -> np.ndarray:
    """props is a JSON object string like '{"k": 87}'; return int64 k
    (-1 for missing/null — the fixture always carries k)."""
    if _HAVE_POLARS:
        s = pl.Series("props", props.tolist(), dtype=pl.String)
        k = s.str.json_path_match("$.k").cast(pl.Int64, strict=False)
        return k.fill_null(-1).to_numpy()
    out = np.empty(len(props), dtype=np.int64)
    for i, p in enumerate(props.tolist()):
        try:
            v = json.loads(p).get("k")
            out[i] = -1 if v is None else int(v)
        except (ValueError, TypeError, AttributeError):
            out[i] = -1
    return out


def q_props_extract(sf_dir: str) -> pa.Table:
    """Typed extraction of ``props.k`` per event (schema-on-read)."""

    def extract(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_id": batch["event_id"].astype("int64"),
                "event_type": batch["event_type"],
                "k": _extract_k(batch["props"]),
            }
        )

    empty = pa.schema(
        [("event_id", pa.int64()), ("event_type", pa.string()), ("k", pa.int64())]
    )
    return collect_table(
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"),
            columns=["event_id", "event_type", "props"],
        ).map_batches(extract, batch_format="pandas"),
        empty,
    )


def q_props_agg(sf_dir: str) -> pa.Table:
    """Per-event_type stats over the extracted field: count, sum(k),
    max(k). Partial aggregation happens inside ``map_batches`` (one
    row per (batch, event_type)); the final groupby moves only the
    bounded partials — the pre-aggregate-before-shuffle pattern."""
    from ray.data.aggregate import Max, Sum

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        k = _extract_k(batch["props"])
        g = (
            pd.DataFrame({"event_type": batch["event_type"], "k": k})
            .groupby("event_type", sort=False, as_index=False)
            .agg(n=("k", "size"), sum_k=("k", "sum"), max_k=("k", "max"))
        )
        return g.astype({"n": "int64", "sum_k": "int64", "max_k": "int64"})

    out = (
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"), columns=["event_type", "props"]
        )
        .map_batches(partial, batch_format="pandas")
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n"), Sum("sum_k", alias_name="sum_k"), Max("max_k", alias_name="max_k"))
        .to_pandas()
    )
    for c in ("n", "sum_k", "max_k"):
        out[c] = out[c].astype("int64")
    return pa.Table.from_pandas(
        out.sort_values("event_type").reset_index(drop=True), preserve_index=False
    )


ORACLE_SQL = {
    "props_extract": """
        SELECT event_id, event_type,
               coalesce((props->>'k')::BIGINT, -1) AS k
        FROM events
    """,
    "props_agg": """
        SELECT event_type, count(*)::BIGINT AS n,
               sum(coalesce((props->>'k')::BIGINT, -1))::BIGINT AS sum_k,
               max(coalesce((props->>'k')::BIGINT, -1))::BIGINT AS max_k
        FROM events GROUP BY event_type
    """,
}

QUERIES = {
    "props_extract": q_props_extract,
    "props_agg": q_props_agg,
}
