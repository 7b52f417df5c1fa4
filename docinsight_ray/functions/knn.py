"""Similarity search over the ``embeddings`` table.

Brute-force cosine top-k as the exact baseline (numpy matmul per batch
against a broadcast query matrix — the ``ray.put`` once / read in
every task pattern), and an LSH-bucketed approximate variant as the
scale path. This is the Ray-Data-native replacement for the
reference's FAISS ``IndexFlatIP`` search
(/root/reference/index/faiss_index.py:162-199) and its numpy fallback
(/root/reference/index/fallback_index.py:124-164).

Gate-exactness: cosine is computed in float64 from the float32 inputs
and rounded to 6 decimals; ranking uses (rounded cos desc, vec_id asc)
on both sides.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray
import ray.data

N_QUERIES = 5  # queries = vec_id < 5
KNN_K = 10


def _read_embeddings(sf_dir: str):
    return ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _query_matrix(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    vid = t["vec_id"].to_numpy()
    mask = vid < N_QUERIES
    q = np.stack(t["embedding"].to_numpy(zero_copy_only=False)[mask]).astype(np.float64)
    return vid[mask], q


class CosineTopK:
    """Actor-pool stage: holds the (broadcast) query matrix; per batch
    emits each query's local top-k against the batch — the partial
    top-k combiner that keeps the shuffle tiny."""

    def __init__(self, q_ref, k: int):
        self.qids, Q = ray.get(q_ref) if isinstance(q_ref, ray.ObjectRef) else q_ref
        self.Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids = batch["vec_id"].to_numpy(zero_copy_only=False)
        X = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        cos = self.Qn @ Xn.T  # (n_queries, batch)
        out_q, out_v, out_c = [], [], []
        # partial top-k uses the same (round6 desc, vec_id asc) order as
        # the final merge, with a +50 tie margin so boundary ties that
        # the global tie-break would keep are never dropped batch-side
        margin = self.k + 50
        for qi, qid in enumerate(self.qids):
            c = cos[qi]
            idx = np.flatnonzero(vids != qid)  # exclude self
            take = idx[np.lexsort((vids[idx], -np.round(c[idx], 6)))[:margin]]
            out_q.append(np.full(take.size, qid, dtype=np.int64))
            out_v.append(vids[take].astype(np.int64))
            out_c.append(c[take])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), type=pa.int64()),
                "cos": pa.array(np.concatenate(out_c), type=pa.float64()),
            }
        )


def q_knn_cosine(sf_dir: str) -> pa.Table:
    """Exact cosine top-10 per query vector (brute force, partial top-k
    per batch + driver-side final merge)."""
    qmat = _query_matrix(sf_dir)
    q_ref = ray.put(qmat)
    partials = (
        _read_embeddings(sf_dir)
        .map_batches(
            CosineTopK,
            fn_constructor_args=(q_ref, KNN_K),
            batch_format="pyarrow",
            batch_size=1024,
            concurrency=2,
        )
        .to_pandas()
    )
    out_rows = []
    for qid, g in partials.groupby("query_id"):
        cos6 = np.round(g["cos"].to_numpy(), 6)
        vids = g["vec_id"].to_numpy()
        order = np.lexsort((vids, -cos6))[:KNN_K]
        for r, i in enumerate(order):
            out_rows.append((int(qid), r, int(vids[i]), float(cos6[i])))
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in out_rows], type=pa.int64()),
            "rank": pa.array([r[1] for r in out_rows], type=pa.int64()),
            "vec_id": pa.array([r[2] for r in out_rows], type=pa.int64()),
            "cos": pa.array([r[3] for r in out_rows], type=pa.float64()),
        }
    )


class LshBucketCosine:
    """Approximate variant: multi-table random-hyperplane LSH.
    ``n_tables`` independent sign-hash tables of ``n_bits`` planes;
    a vector is a candidate if it shares a bucket with the query in ANY
    table (plus 1-bit multi-probe flips). The 10^12-scale path: each
    table's candidate set is ~|corpus| / 2^bits, and bucket membership
    is a hash-partitionable key."""

    def __init__(self, q_ref, k: int, planes_ref):
        self.qids, Q = ray.get(q_ref) if isinstance(q_ref, ray.ObjectRef) else q_ref
        self.planes = ray.get(planes_ref) if isinstance(planes_ref, ray.ObjectRef) else planes_ref
        self.Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
        self.k = k
        self.n_tables, self.n_bits, _ = self.planes.shape
        # per-query accepted buckets per table: own code + 1-bit flips
        self.buckets: list[list[set[int]]] = []
        for qi in range(self.Qn.shape[0]):
            per_table = []
            for t in range(self.n_tables):
                code = self._codes(self.Qn[qi : qi + 1], t)[0]
                per_table.append({int(code)} | {int(code) ^ (1 << f) for f in range(self.n_bits)})
            self.buckets.append(per_table)

    def _codes(self, Xn: np.ndarray, table: int) -> np.ndarray:
        bits = (Xn @ self.planes[table].T) > 0
        return (bits @ (1 << np.arange(self.n_bits))).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids = batch["vec_id"].to_numpy(zero_copy_only=False)
        X = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        codes = np.stack([self._codes(Xn, t) for t in range(self.n_tables)])  # (T, n)
        out_q, out_v, out_c = [], [], []
        for qi, qid in enumerate(self.qids):
            hit = np.zeros(vids.size, dtype=bool)
            for t in range(self.n_tables):
                hit |= np.isin(codes[t], list(self.buckets[qi][t]))
            cand = np.flatnonzero(hit & (vids != qid))
            if cand.size == 0:
                continue
            c = Xn[cand] @ self.Qn[qi]
            take = cand[np.argsort(-c, kind="stable")[: self.k]]
            out_q.append(np.full(take.size, qid, dtype=np.int64))
            out_v.append(vids[take].astype(np.int64))
            out_c.append(Xn[take] @ self.Qn[qi])
        if not out_q:
            return pa.table(
                {"query_id": pa.array([], type=pa.int64()),
                 "vec_id": pa.array([], type=pa.int64()),
                 "cos": pa.array([], type=pa.float64())}
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), type=pa.int64()),
                "cos": pa.array(np.concatenate(out_c), type=pa.float64()),
            }
        )


def q_knn_cosine_lsh(sf_dir: str, n_tables: int = 8, n_bits: int = 6) -> pa.Table:
    """Approximate multi-table LSH cosine top-10 (rows-only check;
    pytest asserts mean recall vs the exact baseline)."""
    qmat = _query_matrix(sf_dir)
    rng = np.random.default_rng(42)
    dim = qmat[1].shape[1]
    planes = rng.standard_normal((n_tables, n_bits, dim))
    q_ref = ray.put(qmat)
    p_ref = ray.put(planes)
    partials = (
        _read_embeddings(sf_dir)
        .map_batches(
            LshBucketCosine,
            fn_constructor_args=(q_ref, KNN_K, p_ref),
            batch_format="pyarrow",
            batch_size=1024,
            concurrency=2,
        )
        .to_pandas()
    )
    out_rows = []
    for qid, g in partials.groupby("query_id"):
        cos6 = np.round(g["cos"].to_numpy(), 6)
        vids = g["vec_id"].to_numpy()
        order = np.lexsort((vids, -cos6))[:KNN_K]
        for r, i in enumerate(order):
            out_rows.append((int(qid), r, int(vids[i]), float(cos6[i])))
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in out_rows], type=pa.int64()),
            "rank": pa.array([r[1] for r in out_rows], type=pa.int64()),
            "vec_id": pa.array([r[2] for r in out_rows], type=pa.int64()),
            "cos": pa.array([r[3] for r in out_rows], type=pa.float64()),
        }
    )


# real near-dup corpora use ~0.9; the driver's random embeddings max
# out at cos≈0.51, so the gate threshold sits where pairs exist
COS_DUP_T = 0.4


def q_embedding_near_dup(sf_dir: str) -> pa.Table:
    """Embedding-cosine near-duplicate pairs (cos ≥ COS_DUP_T, a < b).

    Per-batch numpy matmul against the full (broadcast) normalized
    matrix — each batch computes its rows' similarities to ALL vectors
    and emits only pairs (i < j) to avoid double-counting. At 10^12
    scale this becomes LSH-bucketed candidate generation (see
    LshBucketCosine) + exact verification; the brute-force pass is the
    exact baseline the gate checks."""
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    vids_all = t["vec_id"].to_numpy()
    M = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    ref = ray.put((vids_all, Mn))

    class NearDup:
        def __init__(self, ref):
            self.vids_all, self.Mn = ray.get(ref)
            self.index_of = {int(v): i for i, v in enumerate(self.vids_all)}

        def __call__(self, batch: pa.Table) -> pa.Table:
            vids = batch["vec_id"].to_numpy(zero_copy_only=False)
            rows = np.array([self.index_of[int(v)] for v in vids])
            cos = self.Mn[rows] @ self.Mn.T  # (batch, all)
            a_out, b_out, c_out = [], [], []
            for bi, va in enumerate(vids):
                hits = np.flatnonzero(cos[bi] >= COS_DUP_T)
                for j in hits:
                    vb = int(self.vids_all[j])
                    if vb > int(va):
                        a_out.append(int(va))
                        b_out.append(vb)
                        c_out.append(np.round(cos[bi, j], 6))
            return pa.table(
                {
                    "a_id": pa.array(a_out, type=pa.int64()),
                    "b_id": pa.array(b_out, type=pa.int64()),
                    "cos": pa.array(c_out, type=pa.float64()),
                }
            )

    out = (
        _read_embeddings(sf_dir)
        .map_batches(NearDup, fn_constructor_args=(ref,), batch_format="pyarrow",
                     batch_size=512, concurrency=2)
        .to_pandas()
    )
    return pa.Table.from_pandas(
        out.sort_values(["a_id", "b_id"]).reset_index(drop=True), preserve_index=False
    )


class IvfCosine:
    """IVF (inverted-file) ANN stage: vectors are bucketed by nearest
    centroid at 'index time'; queries probe only the ``nprobe`` nearest
    centroid buckets. Centroids come from a seeded mini k-means run —
    at 10^12 scale that training runs on a seeded sample and the
    assignment/probe stages shuffle by centroid id."""

    def __init__(self, q_ref, cent_ref, k: int, nprobe: int):
        self.qids, Q = ray.get(q_ref) if isinstance(q_ref, ray.ObjectRef) else q_ref
        self.C = ray.get(cent_ref) if isinstance(cent_ref, ray.ObjectRef) else cent_ref
        self.Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
        Cn = self.C / np.linalg.norm(self.C, axis=1, keepdims=True)
        self.Cn = Cn
        # per-query probe set: nprobe nearest centroids
        sims = self.Qn @ Cn.T
        self.probe = np.argsort(-sims, axis=1)[:, :nprobe]
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids = batch["vec_id"].to_numpy(zero_copy_only=False)
        X = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        assign = np.argmax(Xn @ self.Cn.T, axis=1)  # IVF bucket per vector
        out_q, out_v, out_c = [], [], []
        for qi, qid in enumerate(self.qids):
            cand = np.flatnonzero(np.isin(assign, self.probe[qi]) & (vids != qid))
            if cand.size == 0:
                continue
            c = Xn[cand] @ self.Qn[qi]
            take = cand[np.argsort(-c, kind="stable")[: self.k]]
            out_q.append(np.full(take.size, qid, dtype=np.int64))
            out_v.append(vids[take].astype(np.int64))
            out_c.append(Xn[take] @ self.Qn[qi])
        if not out_q:
            return pa.table(
                {"query_id": pa.array([], type=pa.int64()),
                 "vec_id": pa.array([], type=pa.int64()),
                 "cos": pa.array([], type=pa.float64())}
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), type=pa.int64()),
                "cos": pa.array(np.concatenate(out_c), type=pa.float64()),
            }
        )


def train_centroids(sf_dir: str, n_centroids: int = 8, iters: int = 4, seed: int = 42) -> np.ndarray:
    """Seeded mini k-means on the (sampled) embedding table. Driver-side
    at test scale; a seeded ds.random_sample feeds it at cluster scale."""
    import pyarrow.parquet as pq

    t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding"])
    X = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
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


def q_knn_cosine_ivf(sf_dir: str, n_centroids: int = 8, nprobe: int = 3) -> pa.Table:
    """IVF-bucketed approximate cosine top-10 (rows-only check; pytest
    asserts recall vs the exact baseline)."""
    qmat = _query_matrix(sf_dir)
    C = train_centroids(sf_dir, n_centroids=n_centroids)
    q_ref = ray.put(qmat)
    c_ref = ray.put(C)
    partials = (
        _read_embeddings(sf_dir)
        .map_batches(
            IvfCosine,
            fn_constructor_args=(q_ref, c_ref, KNN_K, nprobe),
            batch_format="pyarrow",
            batch_size=1024,
            concurrency=2,
        )
        .to_pandas()
    )
    out_rows = []
    for qid, g in partials.groupby("query_id"):
        cos6 = np.round(g["cos"].to_numpy(), 6)
        vids = g["vec_id"].to_numpy()
        order = np.lexsort((vids, -cos6))[:KNN_K]
        for r, i in enumerate(order):
            out_rows.append((int(qid), r, int(vids[i]), float(cos6[i])))
    return pa.table(
        {
            "query_id": pa.array([r[0] for r in out_rows], type=pa.int64()),
            "rank": pa.array([r[1] for r in out_rows], type=pa.int64()),
            "vec_id": pa.array([r[2] for r in out_rows], type=pa.int64()),
            "cos": pa.array([r[3] for r in out_rows], type=pa.float64()),
        }
    )


ORACLE_SQL = {
    "embedding_near_dup": f"""
        SELECT a.vec_id AS a_id, b.vec_id AS b_id,
               round(
                 list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                 / sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                 / sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])), 6) AS cos
        FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        WHERE list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
              / sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
              / sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])) >= {COS_DUP_T}
    """,
    "knn_cosine": f"""
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
    """,
    # knn_cosine_lsh: approximate → rows-only check
}

QUERIES = {
    "knn_cosine": q_knn_cosine,
    "knn_cosine_lsh": q_knn_cosine_lsh,
    "knn_cosine_ivf": q_knn_cosine_ivf,
    "embedding_near_dup": q_embedding_near_dup,
}
