"""Key-set filters: broadcast fast path + hash-partitioned anti-join
+ a Bloom-prefiltered tier for the wide regime.

Every "drop rows whose key is in this set" site in the engine (dedup
losers, already-seen shas) uses ``key_set_filter``: below
``EngineConfig.broadcast_limit`` keys the set ships once via
``ray.put`` and each task filters with Arrow's C hash-set ``is_in``
(zero shuffle — the right answer while the set fits comfortably in
every worker's heap); above it, the filter becomes a hash-partitioned
``Dataset.join`` anti-join, which shuffles both sides by key but never
holds the key set in any single process. The threshold-0 tests prove
both paths produce identical output.

``bloom_key_set_filter`` is the third tier for the regime where the
key set is far too big to broadcast but most left rows are NEW (the
100-TB incremental-dedup shape): a Bloom filter of the key set —
workers hash, only bit INDICES travel, the packed bitmap (bounded,
e.g. ~9.6 bits/key at 1% FPR) broadcasts once — routes
definitely-new rows straight through with ZERO shuffle and sends only
the maybe-seen sliver (true dupes + FPR·|left|) into the exact
anti-join, so the all-to-all moves a fraction of the left side. The
left lineage executes twice (once per branch of the union) — callers
hand it a cheap re-readable lineage (a column-pruned parquet read),
which trades a second linear scan for removing the corpus-wide
shuffle. Output is EXACT (the Bloom has no false negatives; every
maybe-row is verified by the join) — identity tests prove it equals
``anti_join``.
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


def semi_join(
    ds: "ray.data.Dataset",
    keys: "ray.data.Dataset",
    on: str,
    *,
    n_keys: int,
    broadcast_limit: int,
    num_partitions: int,
) -> "ray.data.Dataset":
    """Rows of ``ds`` whose ``on`` value DOES appear in ``keys`` (the
    EXISTS / IN semi-join; duplicates in ``keys`` are fine, output rows
    are never multiplied).

    Same two-tier shape as ``key_set_filter``: below
    ``broadcast_limit`` the deduplicated key set ships once via
    ``ray.put`` and each task keeps hits with Arrow ``is_in`` (no
    shuffle); above it, the keys deduplicate with a hash groupby and
    the filter is a hash-partitioned inner join on the distinct key
    set — inner join against DISTINCT keys is exactly semi-join
    semantics, and no process ever holds the whole set."""
    if n_keys == 0:
        return ds.limit(0)
    if n_keys <= broadcast_limit:
        key_tbl = keys.select_columns([on]).to_pandas()
        vals = pa.array(sorted(set(key_tbl[on])))
        ref = ray.put(vals)

        def keep_in(t: pa.Table, _r=ref) -> pa.Table:
            col = t[on]
            vs = ray.get(_r)
            if col.type != vs.type:
                col = pc.cast(col, vs.type)
            return t.filter(pc.is_in(col, value_set=vs))

        return ds.map_batches(keep_in, batch_format="pyarrow")
    distinct = keys.select_columns([on]).groupby(on).count().select_columns([on])
    # same Ray 2.49 empty-right-block join hazard as anti_join
    distinct = distinct.repartition(num_partitions)
    return ds.join(distinct, join_type="inner", num_partitions=num_partitions, on=(on,))


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


# ---- Bloom-prefiltered anti-filter (third tier) ---------------------------

_BLOOM_SEED1 = 0xB100A  # fixed seeds: builders and probers must agree
_BLOOM_SEED2 = 0xB100B  # within one run (the bitmap never persists)


def _bloom_hashes(col: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit hash streams for a key column (strings
    hash Arrow-native under two fixed polars seeds — no per-key Python
    object, this runs inside every batch of the bypass filter;
    fixed-width values mix the first stream with a splitmix64 round
    for the second). h2 is forced odd so double hashing h1 + i*h2
    walks distinct bit slots."""
    if pa.types.is_string(col.type) or pa.types.is_large_string(col.type) or pa.types.is_binary(col.type):
        import polars as pl

        s = pl.from_arrow(col if isinstance(col, pa.ChunkedArray) else pa.chunked_array([col]))
        h1 = s.hash(seed=_BLOOM_SEED1).to_numpy()
        h2 = s.hash(seed=_BLOOM_SEED2).to_numpy()
    else:
        import pandas as pd

        raw = col.to_numpy(zero_copy_only=False)
        h1 = pd.util.hash_array(np.ascontiguousarray(raw))
        z = h1 + np.uint64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        h2 = z ^ (z >> np.uint64(31))
    return h1, h2 | np.uint64(1)


def build_bloom(
    keys: "ray.data.Dataset",
    on: str,
    n_keys: int,
    *,
    target_fpr: float = 0.01,
    max_bytes: int = 64 << 20,
) -> tuple[bytes, int, int]:
    """(packed bitmap bytes, m bits, k hashes) for the key set.

    Workers hash their batches and emit only DEDUPLICATED bit indices
    (uint32 blobs, ≤ k·rows each); the driver ORs them into the single
    bounded bitmap — it never sees the keys themselves, and bitmap
    memory is capped at ``max_bytes`` regardless of n_keys (FPR
    degrades gracefully past the cap instead of memory growing)."""
    import math

    n = max(int(n_keys), 1)
    m = int(-n * math.log(target_fpr) / (math.log(2) ** 2))
    m = 1 << max(10, min((m - 1).bit_length(), (max_bytes * 8).bit_length() - 1))
    k = max(1, min(8, round(m / n * math.log(2))))
    mask = np.uint64(m - 1)

    def idx_blob(t: pa.Table) -> pa.Table:
        h1, h2 = _bloom_hashes(t[on])
        idx = np.unique(
            np.concatenate(
                [(h1 + np.uint64(i) * h2) & mask for i in range(k)]
            ).astype(np.uint32)
        )
        return pa.table({"idx": pa.array([idx.tobytes()], type=pa.binary())})

    bm = np.zeros(m >> 3, dtype=np.uint8)
    for batch in keys.select_columns([on]).map_batches(
        idx_blob, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        for blob in batch["idx"].to_pylist():
            idx = np.frombuffer(blob, dtype=np.uint32)
            np.bitwise_or.at(bm, idx >> 3, np.uint8(1) << (idx & 7).astype(np.uint8))
    return bm.tobytes(), m, k


def bloom_might_contain(col: pa.ChunkedArray | pa.Array, bm: np.ndarray, m: int, k: int) -> np.ndarray:
    """Boolean mask: True where the key is POSSIBLY in the set (no
    false negatives). Vectorized k-probe over the packed bitmap."""
    h1, h2 = _bloom_hashes(col)
    mask = np.uint64(m - 1)
    out = np.ones(len(h1), dtype=bool)
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) & mask
        out &= (bm[(idx >> np.uint64(3)).astype(np.int64)] >> (idx & np.uint64(7)).astype(np.uint8)) & 1 == 1
    return out


def bloom_key_set_filter(
    ds_factory,
    keys: "ray.data.Dataset",
    on: str,
    *,
    n_keys: int,
    num_partitions: int,
    target_fpr: float = 0.01,
    max_bytes: int = 64 << 20,
) -> "ray.data.Dataset":
    """Exact anti-filter with a Bloom shuffle-bypass: rows whose key is
    definitely absent stream straight through; only maybe-seen rows
    enter the hash-partitioned anti-join.

    ``ds_factory`` is a zero-arg callable returning the left Dataset —
    called twice (one lineage per branch), so hand it a cheap
    re-readable source (column-pruned parquet read), not an expensive
    computed pipeline."""
    if n_keys == 0:
        return ds_factory()
    bm_bytes, m, k = build_bloom(keys, on, n_keys, target_fpr=target_fpr, max_bytes=max_bytes)
    ref = ray.put(bm_bytes)

    def keep(maybe: bool):
        def f(t: pa.Table, _r=ref) -> pa.Table:
            bm = np.frombuffer(ray.get(_r), dtype=np.uint8)
            hit = bloom_might_contain(t[on], bm, m, k)
            return t.filter(pa.array(hit if maybe else ~hit))

        f.__name__ = f"bloom_{'maybe' if maybe else 'new'}"
        return f

    sure_new = ds_factory().map_batches(keep(False), batch_format="pyarrow")
    maybe = ds_factory().map_batches(keep(True), batch_format="pyarrow")
    verified = anti_join(maybe, keys, on, num_partitions)
    return sure_new.union(verified)
