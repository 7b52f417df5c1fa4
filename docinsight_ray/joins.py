"""Key-set filters: broadcast fast path + hash-partitioned anti-join.

Every "drop rows whose key is in this set" site in the engine (dedup
losers, already-seen shas) uses ``key_set_filter``: below
``EngineConfig.broadcast_limit`` keys the set ships once via
``ray.put`` and each task filters with Arrow's C hash-set ``is_in``
(zero shuffle — the right answer while the set fits comfortably in
every worker's heap); above it, the filter becomes a hash-partitioned
``Dataset.join`` anti-join, which shuffles both sides by key but never
holds the key set in any single process. The threshold-0 tests prove
both paths produce identical output.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


def anti_join(
    ds: "ray.data.Dataset",
    keys: "ray.data.Dataset",
    on: str,
    num_partitions: int,
) -> "ray.data.Dataset":
    """Rows of ``ds`` whose ``on`` value does NOT appear in ``keys``
    (a Dataset whose only required column is ``on``; duplicates fine).

    Hash-partitioned left-outer join + null-marker filter — the scale
    path when the key set is too large to broadcast."""
    marker = keys.map_batches(
        lambda t: pa.table(
            {on: t[on], "__anti": pa.array(np.ones(t.num_rows, dtype=np.int8))}
        ),
        batch_format="pyarrow",
    )
    # Ray 2.49 hazard: Dataset.join SIGABRTs with "No match ... for key
    # field on right side" when the right side contains EMPTY blocks
    # (the shuffle builds a schema-less partition table). repartition
    # consolidates away empty blocks; the key set must shuffle for the
    # hash join anyway, so this adds one linear pass, not a new wide op.
    marker = marker.repartition(num_partitions)
    joined = ds.join(marker, join_type="left_outer", num_partitions=num_partitions, on=(on,))

    def keep_misses(t: pa.Table) -> pa.Table:
        keep = pc.is_null(t["__anti"])
        return t.filter(keep).drop_columns(["__anti"])

    return joined.map_batches(keep_misses, batch_format="pyarrow")


def key_set_filter(
    ds: "ray.data.Dataset",
    keys: "ray.data.Dataset",
    on: str,
    *,
    n_keys: int,
    broadcast_limit: int,
    num_partitions: int,
) -> "ray.data.Dataset":
    """Anti-filter ``ds`` by the key set in ``keys[on]``.

    ``n_keys`` (the caller usually has it from an aggregate already)
    picks the path: broadcast ``is_in`` below ``broadcast_limit``,
    hash-partitioned anti-join above."""
    if n_keys == 0:
        return ds
    if n_keys <= broadcast_limit:
        key_tbl = keys.select_columns([on]).to_pandas()
        vals = pa.array(sorted(set(key_tbl[on])))
        ref = ray.put(vals)

        def drop_in(t: pa.Table, _r=ref) -> pa.Table:
            col = t[on]
            vs = ray.get(_r)
            if col.type != vs.type:
                col = pc.cast(col, vs.type)
            return t.filter(pc.invert(pc.is_in(col, value_set=vs)))

        return ds.map_batches(drop_in, batch_format="pyarrow")
    return anti_join(ds, keys, on, num_partitions)
