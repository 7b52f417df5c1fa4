"""Distributed graph ops over candidate-pair edge sets.

A near-dup pipeline's output — pairs — is only half the answer: dedup
policies act on duplicate CLUSTERS (keep one doc per connected
component of the near-dup graph). The reference resolves duplicates
pairwise at ingest (/root/reference/ingestion/pipeline_ingest.py:266-269,
exact-hash only); at training-data scale the standard shape is
connected components over the candidate edges (the MinHashLSH → CC
step of web-scale dedup pipelines).

``connected_components`` implements the alternating large-star /
small-star contraction of Kiveris et al., "Connected Components in
MapReduce and Beyond" (SoCC'14): each round re-wires neighborhoods
onto their minima, so the driver never holds the graph and convergence
takes O(log n) rounds in practice. No joins and no per-vertex label
table — the edge list IS the state, which is what makes this the
100-TB-shaped CC (every round is a narrow int64-pair shuffle).

Two repo-specific disciplines (see ROADMAP.md §6b / §7):
- groups are COARSENED to ``NBUCKETS`` hash buckets and each bucket is
  processed with vectorized numpy segment ops — never one Ray group
  per vertex (per-tiny-group overhead is ~1 ms);
- every edge table carries a ``ck`` provenance STRING column
  (str(u ^ v)), asserted inside every consumer and once more at the
  driver: the round-1 block-transport row-repair hazard fired only on
  tables of exactly two fixed-width columns, and a variable-width
  column both suppresses it and makes any silent re-pairing loud.

Gate ``embedding_dup_clusters`` runs CC over the exact embedding-cosine near-dup
edges (same threshold as gate ``embedding_near_dup``) and labels every
vector with its component's min vec_id; the DuckDB oracle recomputes
components with a recursive-CTE reachability closure.
"""

from __future__ import annotations

import warnings

import numpy as np
import pyarrow as pa
import ray
import ray.data

MAX_CC_ROUNDS = 30
NBUCKETS = 64


def _edge_table(u: np.ndarray, v: np.ndarray) -> pa.Table:
    x = (u ^ v).astype(np.int64)
    return pa.table(
        {
            "u": pa.array(u.astype(np.int64), type=pa.int64()),
            "v": pa.array(v.astype(np.int64), type=pa.int64()),
            "ck": pa.array(x.astype("U20"), type=pa.string()),
        }
    )


def _checked_uv(t: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """Extract (u, v) after verifying the provenance column — a failed
    assert here means rows were re-paired in transit (ROADMAP §6b)."""
    u = t["u"].to_numpy(zero_copy_only=False).astype(np.int64)
    v = t["v"].to_numpy(zero_copy_only=False).astype(np.int64)
    ck = t["ck"].to_numpy(zero_copy_only=False).astype(np.int64)
    if not np.array_equal(ck, u ^ v):
        raise AssertionError("edge provenance mismatch: rows re-paired in transit")
    return u, v


def _sorted_unique_pairs(u: np.ndarray, v: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    idx = np.lexsort((v, u))
    su, sv = u[idx], v[idx]
    if su.size:
        keep = np.r_[True, (su[1:] != su[:-1]) | (sv[1:] != sv[:-1])]
        su, sv = su[keep], sv[keep]
    return su, sv


def _star_rewire(g: pa.Table, large: bool) -> pa.Table:
    """Vectorized star re-wiring for ONE hash bucket of edge rows
    (all rows whose key endpoint hashes to this bucket). Dedupes the
    bucket's pairs, splits into per-vertex segments, and emits the
    large-star (hook v>u onto min(Γ⁺)) or small-star (re-wire the
    whole ≤-neighborhood onto its min) edges."""
    u, v = _checked_uv(g)
    su, sv = _sorted_unique_pairs(u, v)
    if not su.size:
        return _edge_table(su, sv)
    new_seg = np.r_[True, su[1:] != su[:-1]]
    starts = np.flatnonzero(new_seg)
    seg_id = np.cumsum(new_seg) - 1
    minv = sv[starts][seg_id]  # per-row: min neighbor of this row's u
    if large:
        m = np.minimum(minv, su)
        mask = sv > su
        out_u, out_v = sv[mask], m[mask]
    else:
        # small-star input is oriented larger-first, so sv < su and
        # m = min(N ∪ {u}) = min(N) = minv
        mask = sv != minv
        out_u = np.concatenate([sv[mask], su[starts]])
        out_v = np.concatenate([minv[mask], sv[starts]])
    keep = out_u != out_v
    return _edge_table(out_u[keep], out_v[keep])


def _large_star_bucket(g: pa.Table) -> pa.Table:
    return _star_rewire(g, large=True)


def _small_star_bucket(g: pa.Table) -> pa.Table:
    return _star_rewire(g, large=False)


_large_star_bucket.__name__ = "_large_star_bucket"
_small_star_bucket.__name__ = "_small_star_bucket"


def _both_orient(batch: pa.Table) -> pa.Table:
    u, v = _checked_uv(batch)
    ou = np.concatenate([u, v])
    ov = np.concatenate([v, u])
    t = _edge_table(ou, ov)
    return t.append_column("bucket", pa.array(ou % NBUCKETS, type=pa.int64()))


def _larger_first(batch: pa.Table) -> pa.Table:
    u, v = _checked_uv(batch)
    ou, ov = np.maximum(u, v), np.minimum(u, v)
    t = _edge_table(ou, ov)
    return t.append_column("bucket", pa.array(ou % NBUCKETS, type=pa.int64()))


def _dedup_bucket(g: pa.Table) -> pa.Table:
    u, v = _checked_uv(g)
    su, sv = _sorted_unique_pairs(u, v)
    return _edge_table(su, sv)


_dedup_bucket.__name__ = "_dedup_bucket"


def _canon_distinct(edges: "ray.data.Dataset") -> "ray.data.Dataset":
    """Canonical (larger-first) distinct edge set — one coarse-bucket
    groupby; same-pair rows always share a bucket, so in-bucket dedup
    is global dedup."""
    return (
        edges.map_batches(_larger_first, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(_dedup_bucket, batch_format="pyarrow")
    )


def _edge_checksum(edges: "ray.data.Dataset") -> tuple[int, int]:
    """(row count, order-insensitive hash-sum) of a distinct edge set —
    the fixpoint fingerprint compared across star rounds."""

    def h(batch: pa.Table) -> pa.Table:
        u, v = _checked_uv(batch)
        with np.errstate(over="ignore"):
            hv = u * np.int64(-7046029254386353131) ^ (v + np.int64(98765431))
        return pa.table(
            {
                "h": pa.array(hv, type=pa.int64()),
                "n": pa.array(np.ones(u.size, dtype=np.int64), type=pa.int64()),
            }
        )

    agg = edges.map_batches(h, batch_format="pyarrow", batch_size=8192).sum(
        ["h", "n"], ignore_nulls=True
    )
    if agg is None or agg.get("sum(n)") is None:
        return 0, 0
    return int(agg["sum(n)"]), int(agg["sum(h)"]) & ((1 << 64) - 1)


def connected_components(
    edges: "ray.data.Dataset", max_rounds: int = MAX_CC_ROUNDS
) -> "ray.data.Dataset":
    """Star edges (node → component-min root) for every non-root node
    of every component of the undirected graph ``edges`` (int64
    columns ``u``/``v`` plus the ``ck`` provenance column — build rows
    with ``_edge_table``; orientation and duplicate pairs are fine,
    self-loops are not).

    Alternates large-star and small-star until the canonical distinct
    edge set reaches a fixpoint — exactly the forest of single-level
    stars rooted at component minima. Each round materializes the
    (distinct, bounded-by-|E|) edge set, never the vertex closure."""
    cur = _canon_distinct(edges).materialize()
    prev_sig = _edge_checksum(cur)
    if prev_sig[0] == 0:
        return cur
    for _ in range(max_rounds):
        ls = (
            cur.map_batches(_both_orient, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(_large_star_bucket, batch_format="pyarrow")
        )
        cur = _canon_distinct(ls.map_batches(_larger_first, batch_format="pyarrow")
                              .groupby("bucket")
                              .map_groups(_small_star_bucket, batch_format="pyarrow")).materialize()
        sig = _edge_checksum(cur)
        if sig == prev_sig:
            return cur
        prev_sig = sig
    warnings.warn(
        f"connected_components: no fixpoint after {max_rounds} rounds; "
        "returning the current contraction (labels may be multi-level)",
        stacklevel=2,
    )
    return cur


def _min_label_bucket(g: pa.Table) -> pa.Table:
    """Per-vertex min label inside one hash bucket (vertex rows always
    share a bucket, so the in-bucket min is the global min)."""
    u, v = _checked_uv(g)
    su, sv = _sorted_unique_pairs(u, v)
    if not su.size:
        return _edge_table(su, sv)
    starts = np.flatnonzero(np.r_[True, su[1:] != su[:-1]])
    return _edge_table(su[starts], sv[starts])


_min_label_bucket.__name__ = "_min_label_bucket"


def q_dup_clusters(sf_dir: str, tile_rows: int = 256) -> pa.Table:
    """(vec_id, cluster_id) for every embedding row: cluster_id is the
    min vec_id of the row's connected component in the exact
    embedding-cosine near-dup graph (cos ≥ COS_DUP_T — the edge set
    gate ``embedding_near_dup`` checks pairwise). Singletons label
    themselves.

    Edges come from the tile-pair sweep (no driver materialization),
    components from the alternating-star contraction, and the final
    labeling is ONE union + bucketed min: every vertex contributes
    (vec_id, vec_id), every star edge contributes (node, root), and
    the per-vertex min picks the root because roots are component
    minima."""
    import shutil
    import tempfile

    from docinsight_ray.collect import collect_table
    from docinsight_ray.functions.knn import TilePairCosine, _stage_tiles

    work = tempfile.mkdtemp(prefix="dupcc-tiles-", dir="/tmp")
    try:
        _, n_tiles = _stage_tiles(sf_dir, work, tile_rows)
        pair_ds = ray.data.from_items(
            [{"i": i, "j": j} for i in range(n_tiles) for j in range(i, n_tiles)]
        ).map_batches(
            TilePairCosine,
            fn_constructor_args=(work,),
            batch_format="pyarrow",
            batch_size=4,
            concurrency=4,
        )

        def to_edges(b: pa.Table) -> pa.Table:
            return _edge_table(
                b["a_id"].to_numpy(zero_copy_only=False).astype(np.int64),
                b["b_id"].to_numpy(zero_copy_only=False).astype(np.int64),
            )

        stars = connected_components(
            pair_ds.map_batches(to_edges, batch_format="pyarrow")
        )

        def self_labels(batch: pa.Table) -> pa.Table:
            vid = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            t = _edge_table(vid, vid.copy())
            # self-labels are intentional u == v rows (not graph edges)
            return t.append_column("bucket", pa.array(vid % NBUCKETS, type=pa.int64()))

        def star_labels(batch: pa.Table) -> pa.Table:
            u, v = _checked_uv(batch)
            t = _edge_table(u, v)
            return t.append_column("bucket", pa.array(u % NBUCKETS, type=pa.int64()))

        verts = ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id"]
        ).map_batches(self_labels, batch_format="pyarrow")
        labels = (
            verts.union(stars.map_batches(star_labels, batch_format="pyarrow"))
            .groupby("bucket")
            .map_groups(_min_label_bucket, batch_format="pyarrow")
        )
        out = collect_table(labels)
    finally:
        shutil.rmtree(work, ignore_errors=True)
    u, v = _checked_uv(out)  # driver-side provenance re-check
    order = np.argsort(u)
    return pa.table(
        {
            "vec_id": pa.array(u[order], type=pa.int64()),
            "cluster_id": pa.array(v[order], type=pa.int64()),
        }
    )


def _dup_clusters_sql() -> str:
    from docinsight_ray.functions.knn import COS_DUP_T

    cos = (
        "list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])"
        " / sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))"
        " / sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))"
    )
    return f"""
        WITH RECURSIVE pairs AS (
          SELECT a.vec_id AS u, b.vec_id AS v
          FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
          WHERE {cos} >= {{T}}
        ),
        edges AS (
          SELECT u, v FROM pairs UNION SELECT v, u FROM pairs
        ),
        walk(u, lbl) AS (
          SELECT vec_id, vec_id FROM embeddings
          UNION
          SELECT e.v, w.lbl FROM walk w JOIN edges e ON e.u = w.u
        )
        SELECT u AS vec_id, min(lbl) AS cluster_id FROM walk GROUP BY u
    """.replace("{T}", str(COS_DUP_T))


ORACLE_SQL: dict[str, str] = {"embedding_dup_clusters": _dup_clusters_sql()}
QUERIES = {
    "embedding_dup_clusters": q_dup_clusters,
}
