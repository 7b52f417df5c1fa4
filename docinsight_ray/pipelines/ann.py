"""Persisted IVF vector index + partition-pruned ANN serving.

The in-memory kNN family (``functions/knn.py``) recomputes its
structure per call — right for one-shot pipeline stages, wrong for a
serving deployment. This module gives the embedding column the same
lifecycle the BM25 postings already have (the reference's FAISS index
persistence analogue, /root/reference/index/faiss_index.py:61-120,
re-expressed as a partitioned parquet layout instead of a binary blob):

    <root>/centroids.json     normalized k-means centroids (small)
    <root>/ann_stats.json     n_vectors / dim / n_centroids / seed
    <root>/lists/cid=<c>/*.parquet   (vec_id int64, embedding list<float>)

Build is ONE broadcast-assign ``map_batches`` pass + a hive-partitioned
write (centroid training reads only a bounded seeded sample). Serving
INVERTS the parallelism: brute-force kNN is corpus-parallel (every
batch of vectors scores every query), while an index lookup is
query-parallel — each query reads ONLY its ``nprobe`` probed lists
(partition prune, the vector analogue of the BM25 term→bucket
routing), so adding serving actors scales queries/s without touching
the corpus. ``nprobe = n_centroids`` degrades gracefully to the exact
brute-force ranking — that identity is the gate's full SQL oracle and
the recall knob's calibration point.

Gate-exactness: cosine in float64 from the stored float32 lists,
ranking by (round6 cos desc, vec_id asc) — identical to
``functions/knn.py`` and the DuckDB oracle.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

ANN_STATS = "ann_stats.json"
ANN_CENTROIDS = "centroids.json"


def train_centroids_ds(
    ds: "ray.data.Dataset",
    n_centroids: int = 8,
    iters: int = 4,
    seed: int = 42,
    max_train: int = 65536,
) -> np.ndarray:
    """Seeded mini k-means over a BOUNDED sample of a Dataset's
    ``embedding`` column (same contract as ``knn.train_centroids``,
    which delegates here — the driver never holds more than
    ``max_train`` rows; sampling runs in workers via the seeded
    ``random_sample``). Returns UN-normalized centroid means; callers
    normalize for cosine routing."""
    ds = ds.select_columns(["embedding"])
    n = ds.count()
    if n > max_train:
        ds = ds.random_sample(min(1.0, 1.1 * max_train / n), seed=seed).limit(max_train)
    X = np.stack(ds.to_pandas()["embedding"].to_numpy()).astype(np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    rng = np.random.default_rng(seed)
    C = Xn[rng.choice(len(Xn), size=n_centroids, replace=False)]
    for _ in range(iters):
        assign = np.argmax(Xn @ (C / np.linalg.norm(C, axis=1, keepdims=True)).T, axis=1)
        for j in range(n_centroids):
            members = Xn[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
    return C


def build_ann_index(
    emb_ds: "ray.data.Dataset",
    out_dir: str,
    n_centroids: int = 8,
    seed: int = 42,
    train_iters: int = 4,
    max_train: int = 65536,
) -> dict:
    """embeddings Dataset (vec_id, embedding) → persisted IVF index.

    Single-pass shape: bounded-sample centroid training, then one
    broadcast-assign scan writing hive-partitioned inverted lists.
    Re-running overwrites (cheap single-pass build; the BM25 index,
    which is expensive, carries the per-partition resume manifests).
    Returns the stats dict (also persisted as ``ann_stats.json``)."""
    from ..state import fsio

    C = train_centroids_ds(
        emb_ds, n_centroids=n_centroids, iters=train_iters, seed=seed, max_train=max_train
    )
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    c_ref = ray.put(Cn)

    def assign(batch: pa.Table) -> pa.Table:
        cn = ray.get(c_ref)
        X = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        # metadata columns ride along into the lists so serving can
        # filter inside probed lists (ES-style filtered kNN)
        out = batch.set_column(
            batch.schema.get_field_index("vec_id"), "vec_id",
            batch["vec_id"].cast(pa.int64()),
        )
        return out.append_column(
            "cid", pa.array(np.argmax(Xn @ cn.T, axis=1), type=pa.int64())
        )

    lists_dir = os.path.join(out_dir, "lists")
    fsio.rmtree(lists_dir)
    fsio.makedirs(lists_dir)
    assigned = emb_ds.map_batches(assign, batch_format="pyarrow", batch_size=1024)
    assigned.write_parquet(lists_dir, partition_cols=["cid"])

    n_vectors = emb_ds.count()
    dim = int(Cn.shape[1])
    stats = {
        "n_vectors": int(n_vectors),
        "dim": dim,
        "n_centroids": int(n_centroids),
        "seed": int(seed),
        "train_iters": int(train_iters),
    }
    fsio.write_bytes_atomic(
        os.path.join(out_dir, ANN_CENTROIDS),
        json.dumps([[float(x) for x in row] for row in Cn]).encode(),
    )
    fsio.write_bytes_atomic(os.path.join(out_dir, ANN_STATS), json.dumps(stats).encode())
    return stats


def append_ann_index(emb_ds: "ray.data.Dataset", root: str) -> dict:
    """Append a batch of NEW vectors to an existing index: assign with
    the STORED centroids (routing stays consistent with what serving
    probes), write additional list files alongside the existing ones
    (parquet dirs compose; no rewrite), bump ``n_vectors``. The
    incremental path of a streaming embedding pipeline — centroids are
    deliberately not retrained (exhaustive serving is exact regardless
    of routing; pruned recall degrades only if the data distribution
    drifts, at which point a rebuild re-trains). Caller contract: the
    appended vec_ids are disjoint from the resident ones
    (``validate_ann_index`` enforces global uniqueness)."""
    from ..state import fsio

    raw = fsio.read_bytes(os.path.join(root, ANN_STATS))
    if raw is None:
        raise FileNotFoundError(f"{root}/{ANN_STATS}: not a built ANN index")
    stats = json.loads(raw)
    Cn = np.asarray(json.loads(fsio.read_bytes(os.path.join(root, ANN_CENTROIDS))))
    c_ref = ray.put(Cn)

    def assign(batch: pa.Table) -> pa.Table:
        cn = ray.get(c_ref)
        X = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        out = batch.set_column(
            batch.schema.get_field_index("vec_id"), "vec_id",
            batch["vec_id"].cast(pa.int64()),
        )
        return out.append_column(
            "cid", pa.array(np.argmax(Xn @ cn.T, axis=1), type=pa.int64())
        )

    n_new = emb_ds.count()
    lists_dir = os.path.join(root, "lists")
    # Ray's default filenames embed the write run's uuid, so appended
    # files never collide with the resident ones — parquet dirs compose
    emb_ds.map_batches(assign, batch_format="pyarrow", batch_size=1024).write_parquet(
        lists_dir, partition_cols=["cid"]
    )
    stats["n_vectors"] = int(stats["n_vectors"]) + int(n_new)
    fsio.write_bytes_atomic(os.path.join(root, ANN_STATS), json.dumps(stats).encode())
    return stats


class AnnIndex:
    """Serving handle: centroids resident, inverted lists loaded
    lazily with a bounded LRU — actor RSS is capped by ``cache_lists``
    regardless of corpus size, the same residency discipline as the
    partition-lazy BM25 scorer. Use one instance per serving actor
    (``AnnTopK`` below wires it into a ``map_batches`` pool)."""

    def __init__(self, root: str, nprobe: int = 4, cache_lists: int = 16):
        from collections import OrderedDict

        from ..state.fsio import read_bytes

        raw = read_bytes(os.path.join(root, ANN_STATS))
        if raw is None:
            raise FileNotFoundError(f"{root}/{ANN_STATS}: not a built ANN index")
        self.stats = json.loads(raw)
        self.Cn = np.asarray(json.loads(read_bytes(os.path.join(root, ANN_CENTROIDS))))
        self.root = root
        self.nprobe = min(nprobe, int(self.stats["n_centroids"]))
        self.cache_lists = cache_lists
        self._lists: OrderedDict[int, tuple[np.ndarray, np.ndarray]] = OrderedDict()
        self.lists_loaded = 0  # cumulative loads (cache misses), for tests/metrics

    def _load_list(
        self, cid: int
    ) -> tuple[np.ndarray, np.ndarray, dict[str, np.ndarray]]:
        hit = self._lists.get(cid)
        if hit is not None:
            self._lists.move_to_end(cid)
            return hit
        from ..state.fsio import glob_parquet

        files = glob_parquet(os.path.join(self.root, "lists", f"cid={cid}"))
        if not files:
            out = (np.empty(0, dtype=np.int64), np.empty((0, self.stats["dim"])), {})
        else:
            t = pa.concat_tables([pq.read_table(f) for f in files])
            vids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            X = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
            Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
            order = np.argsort(vids)
            meta = {
                c: t[c].take(pa.array(order)).to_numpy(zero_copy_only=False)
                for c in t.column_names
                if c not in ("vec_id", "embedding")
            }
            out = (vids[order], Xn[order], meta)
        self._lists[cid] = out
        self.lists_loaded += 1
        if len(self._lists) > self.cache_lists:
            self._lists.popitem(last=False)
        return out

    def topk(
        self,
        qids: np.ndarray,
        Q: np.ndarray,
        k: int,
        vec_filter: tuple[str, tuple] | None = None,
        exclude_vec_ids: np.ndarray | None = None,
    ) -> pa.Table:
        """Exact-within-probed-lists cosine top-k per query row of Q
        (raw, un-normalized float vectors). Self-matches (vec_id ==
        query_id) are excluded, matching the kNN gate convention.
        ``vec_filter=(column, allowed_values)`` restricts candidates by
        a metadata column stored in the lists (ES filtered-kNN shape;
        the predicate applies inside each probed list, never loading
        unprobed partitions). ``exclude_vec_ids`` drops a tombstoned
        set at serve time — the vector analogue of the BM25 scorer's
        ``exclude_doc_ids``."""
        excl = (
            np.unique(np.asarray(exclude_vec_ids, dtype=np.int64))
            if exclude_vec_ids is not None and len(exclude_vec_ids)
            else None
        )
        Qn = Q.astype(np.float64)
        Qn = Qn / np.linalg.norm(Qn, axis=1, keepdims=True)
        probe = np.argsort(-(Qn @ self.Cn.T), axis=1)[:, : self.nprobe]
        out_q, out_r, out_v, out_c = [], [], [], []
        for qi in range(len(qids)):
            vid_parts, cos_parts = [], []
            for cid in probe[qi]:
                vids, Xn, meta = self._load_list(int(cid))
                if not vids.size:
                    continue
                keep = vids != qids[qi]
                if excl is not None:
                    # sorted-membership test against the sorted vids
                    pos = np.searchsorted(excl, vids)
                    pos[pos == excl.size] = 0
                    keep &= excl[pos] != vids
                if vec_filter is not None:
                    col, allowed = vec_filter
                    if col not in meta:
                        raise KeyError(
                            f"filter column {col!r} not stored in this index's lists"
                        )
                    keep &= np.isin(meta[col], np.asarray(list(allowed)))
                vid_parts.append(vids[keep])
                cos_parts.append(Xn[keep] @ Qn[qi])
            if not vid_parts:
                continue
            vids = np.concatenate(vid_parts)
            cos = np.concatenate(cos_parts)
            cos6 = np.round(cos, 6)
            order = np.lexsort((vids, -cos6))[:k]
            out_q.append(np.full(order.size, qids[qi], dtype=np.int64))
            out_r.append(np.arange(order.size, dtype=np.int64))
            out_v.append(vids[order])
            out_c.append(cos6[order])
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "rank": pa.array([], type=pa.int64()),
                    "vec_id": pa.array([], type=pa.int64()),
                    "cos": pa.array([], type=pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
                "rank": pa.array(np.concatenate(out_r), type=pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), type=pa.int64()),
                "cos": pa.array(np.concatenate(out_c), type=pa.float64()),
            }
        )


class AnnTopK:
    """Actor-pool serving stage: one ``AnnIndex`` per actor (centroids
    loaded once, list LRU warm across batches); each batch of query
    rows (query_id, embedding) is answered to completion — an index
    lookup is query-parallel, so no cross-batch merge exists."""

    def __init__(
        self,
        root: str,
        k: int,
        nprobe: int,
        cache_lists: int = 16,
        vec_filter: tuple[str, tuple] | None = None,
    ):
        self.idx = AnnIndex(root, nprobe=nprobe, cache_lists=cache_lists)
        self.k = k
        self.vec_filter = vec_filter

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids = batch["query_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        Q = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        return self.idx.topk(qids, Q, self.k, vec_filter=self.vec_filter)


def query_ann_index(
    queries_ds: "ray.data.Dataset",
    root: str,
    k: int = 10,
    nprobe: int = 4,
    concurrency: int = 2,
    vec_filter: tuple[str, tuple] | None = None,
) -> "ray.data.Dataset":
    """Serve a Dataset of (query_id, embedding) rows through the
    ``AnnTopK`` actor pool."""
    return queries_ds.map_batches(
        AnnTopK,
        fn_constructor_args=(root, k, nprobe),
        fn_constructor_kwargs={"vec_filter": vec_filter},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=concurrency,
    )


def validate_ann_index(root: str) -> dict:
    """Invariant checks for a persisted ANN index (the ``cli validate``
    hook, mirroring the BM25/positional validators): stats/centroids
    readable and consistent, Σ list rows == n_vectors, vec_ids unique
    across lists, every row routed to its true argmax centroid, and
    every stored embedding has the declared dim. Returns a JSON-able
    summary; raises ValueError naming the first violated invariant."""
    from ..state.fsio import glob_parquet, read_bytes

    raw = read_bytes(os.path.join(root, ANN_STATS))
    if raw is None:
        raise ValueError(f"{root}/{ANN_STATS}: missing (not a built ANN index)")
    stats = json.loads(raw)
    Cn = np.asarray(json.loads(read_bytes(os.path.join(root, ANN_CENTROIDS))))
    if Cn.shape != (stats["n_centroids"], stats["dim"]):
        raise ValueError(
            f"centroids shape {Cn.shape} != (n_centroids, dim) "
            f"({stats['n_centroids']}, {stats['dim']})"
        )
    total = 0
    seen: list[np.ndarray] = []
    misrouted = 0
    for cid in range(stats["n_centroids"]):
        files = glob_parquet(os.path.join(root, "lists", f"cid={cid}"))
        if not files:
            continue
        t = pa.concat_tables([pq.read_table(f, columns=["vec_id", "embedding"]) for f in files])
        total += t.num_rows
        vids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        seen.append(vids)
        X = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        if X.shape[1] != stats["dim"]:
            raise ValueError(f"cid={cid}: embedding dim {X.shape[1]} != {stats['dim']}")
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        misrouted += int((np.argmax(Xn @ Cn.T, axis=1) != cid).sum())
    if total != stats["n_vectors"]:
        raise ValueError(f"list rows {total} != n_vectors {stats['n_vectors']}")
    allv = np.concatenate(seen) if seen else np.empty(0, dtype=np.int64)
    if allv.size != np.unique(allv).size:
        raise ValueError("duplicate vec_id across lists")
    if misrouted:
        raise ValueError(f"{misrouted} rows routed to a non-argmax centroid list")
    return {
        "ok": True,
        "n_vectors": int(total),
        "n_centroids": int(stats["n_centroids"]),
        "dim": int(stats["dim"]),
    }


def _ensure_ann_index(sf_dir: str, n_centroids: int) -> str:
    """Build-once cache of the gate's index for an sf_dir (fresh per
    process; parameters keyed into the path)."""
    import hashlib

    # v2: lists carry metadata passthrough columns (filtered serving)
    key = hashlib.sha256(f"{sf_dir}:{n_centroids}:v2".encode()).hexdigest()[:12]
    root = f"/tmp/docinsight_ray_ann/{key}"
    from ..state.fsio import read_bytes

    if read_bytes(os.path.join(root, ANN_STATS)) is None:
        ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
        build_ann_index(ds, root, n_centroids=n_centroids)
    return root


def q_ann_ivf_topk(sf_dir: str, n_centroids: int = 8) -> pa.Table:
    """Persisted-IVF cosine top-10 served EXHAUSTIVELY (nprobe =
    n_centroids): probing every list makes the index path exactly the
    brute-force ranking, so this gate carries the full SQL oracle —
    it proves the whole persisted lifecycle (train → partitioned
    write → lazy list loads → query-parallel serving) is lossless.
    The pruned configuration (nprobe < n_centroids) is the same code
    path; its recall is measured in RECALL.json and floored in
    pytest."""
    from docinsight_ray.functions.knn import KNN_K, N_QUERIES

    root = _ensure_ann_index(sf_dir, n_centroids)
    qds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    ).filter(expr=f"vec_id < {N_QUERIES}").map_batches(
        lambda b: pa.table({"query_id": b["vec_id"], "embedding": b["embedding"]}),
        batch_format="pyarrow",
    )
    out = (
        query_ann_index(qds, root, k=KNN_K, nprobe=n_centroids, concurrency=2)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def q_ann_ivf_filtered(sf_dir: str, n_centroids: int = 8) -> pa.Table:
    """Filtered kNN from the PERSISTED index (label predicate applied
    inside probed lists), served exhaustively so the gate carries the
    same full SQL oracle as ``knn_cosine_filtered`` — proves metadata
    columns survive the index round trip and the in-list predicate is
    lossless."""
    from docinsight_ray.functions.knn import KNN_FILTER_LABELS, KNN_K, N_QUERIES

    root = _ensure_ann_index(sf_dir, n_centroids)
    qds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    ).filter(expr=f"vec_id < {N_QUERIES}").map_batches(
        lambda b: pa.table({"query_id": b["vec_id"], "embedding": b["embedding"]}),
        batch_format="pyarrow",
    )
    out = (
        query_ann_index(
            qds, root, k=KNN_K, nprobe=n_centroids, concurrency=2,
            vec_filter=("label", KNN_FILTER_LABELS),
        )
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False)


def _ann_sql() -> str:
    from docinsight_ray.functions.knn import KNN_K, N_QUERIES

    return f"""
        WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < {N_QUERIES}),
        s AS (
          SELECT q.qid AS query_id, e.vec_id,
                 round(
                   list_dot_product(q.qe::DOUBLE[], e.embedding::DOUBLE[])
                   / sqrt(list_dot_product(q.qe::DOUBLE[], q.qe::DOUBLE[]))
                   / sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])), 6) AS cos
          FROM q, embeddings e WHERE e.vec_id != q.qid
        ),
        r AS (
          SELECT query_id, vec_id, cos,
                 row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) - 1 AS rank
          FROM s
        )
        SELECT query_id, rank, vec_id, cos FROM r WHERE rank < {KNN_K}
    """


def _ann_filtered_sql() -> str:
    from docinsight_ray.functions.knn import KNN_FILTER_LABELS, KNN_K, N_QUERIES

    labels = ", ".join(str(x) for x in KNN_FILTER_LABELS)
    return f"""
        WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < {N_QUERIES}),
        s AS (
          SELECT q.qid AS query_id, e.vec_id,
                 round(
                   list_dot_product(q.qe::DOUBLE[], e.embedding::DOUBLE[])
                   / sqrt(list_dot_product(q.qe::DOUBLE[], q.qe::DOUBLE[]))
                   / sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])), 6) AS cos
          FROM q, embeddings e
          WHERE e.vec_id != q.qid AND e.label IN ({labels})
        ),
        r AS (
          SELECT query_id, vec_id, cos,
                 row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) - 1 AS rank
          FROM s
        )
        SELECT query_id, rank, vec_id, cos FROM r WHERE rank < {KNN_K}
    """


ORACLE_SQL = {"ann_ivf_topk": _ann_sql(), "ann_ivf_filtered": _ann_filtered_sql()}
QUERIES = {"ann_ivf_topk": q_ann_ivf_topk, "ann_ivf_filtered": q_ann_ivf_filtered}
