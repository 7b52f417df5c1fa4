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

    # predicate + projection pushed into the read: only the N_QUERIES
    # query rows' row groups leave storage, not the whole table
    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", N_QUERIES)],
    )
    vid = t["vec_id"].to_numpy()
    q = np.stack(t["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
    return vid, q


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


def _final_topk(g: pa.Table) -> pa.Table:
    """Exact global top-k merge for ONE query's per-batch partials
    ((round6 cos desc, vec_id asc) — same order the partials used, so
    the tie margin guarantees no boundary candidate was dropped)."""
    cos6 = np.round(g["cos"].to_numpy(zero_copy_only=False), 6)
    vids = g["vec_id"].to_numpy(zero_copy_only=False)
    order = np.lexsort((vids, -cos6))[:KNN_K]
    return pa.table(
        {
            "query_id": pa.array(
                np.full(order.size, g["query_id"][0].as_py(), dtype=np.int64),
                type=pa.int64(),
            ),
            "rank": pa.array(np.arange(order.size, dtype=np.int64), type=pa.int64()),
            "vec_id": pa.array(vids[order].astype(np.int64), type=pa.int64()),
            "cos": pa.array(cos6[order], type=pa.float64()),
        }
    )


_final_topk.__name__ = "_final_topk"


def _merge_topk(partials: "ray.data.Dataset") -> pa.Table:
    """Distributed per-query merge: partials shuffle by query_id (a few
    groups, each ≤ margin × n_batches rows) instead of materializing
    every partial row on the driver — the driver only ever holds the
    final n_queries × k table."""
    out = (
        partials.groupby("query_id")
        .map_groups(_final_topk, batch_format="pyarrow")
        .to_pandas()
    )
    if out.empty:
        return pa.table({"query_id": pa.array([], type=pa.int64()),
                         "rank": pa.array([], type=pa.int64()),
                         "vec_id": pa.array([], type=pa.int64()),
                         "cos": pa.array([], type=pa.float64())})
    return pa.Table.from_pandas(
        out.sort_values(["query_id", "rank"]).reset_index(drop=True), preserve_index=False
    )


def q_knn_cosine(sf_dir: str) -> pa.Table:
    """Exact cosine top-10 per query vector (brute force, partial top-k
    per batch + distributed per-query merge)."""
    qmat = _query_matrix(sf_dir)
    q_ref = ray.put(qmat)
    return _merge_topk(
        _read_embeddings(sf_dir).map_batches(
            CosineTopK,
            fn_constructor_args=(q_ref, KNN_K),
            batch_format="pyarrow",
            batch_size=1024,
            concurrency=2,
        )
    )


RANGE_TAU = 0.25


def q_knn_range(sf_dir: str) -> pa.Table:
    """Vector RANGE search (the FAISS range_search / ES similarity-
    threshold shape): ALL vectors with cosine ≥ τ per query — the
    radius query a near-duplicate or recall-sensitive pipeline runs
    when top-k is the wrong contract. Per-batch stage emits only the
    matches (output bounded by the true result set, never the corpus),
    one per-query rank pass at the end. Threshold compares round-6
    cosine so the SQL oracle's predicate is bit-identical."""
    qmat = _query_matrix(sf_dir)
    q_ref = ray.put(qmat)

    class RangeMatch:
        def __init__(self, q_ref, tau: float):
            self.qids, Q = ray.get(q_ref) if isinstance(q_ref, ray.ObjectRef) else q_ref
            self.Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
            self.tau = tau
            self.__name__ = "RangeMatch"

        def __call__(self, batch: pa.Table) -> pa.Table:
            vids = batch["vec_id"].to_numpy(zero_copy_only=False)
            X = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
            Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
            cos6 = np.round(self.Qn @ Xn.T, 6)
            out_q, out_v, out_c = [], [], []
            for qi, qid in enumerate(self.qids):
                hit = np.flatnonzero((cos6[qi] >= self.tau) & (vids != qid))
                out_q.append(np.full(hit.size, qid, dtype=np.int64))
                out_v.append(vids[hit].astype(np.int64))
                out_c.append(cos6[qi][hit])
            return pa.table(
                {
                    "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
                    "vec_id": pa.array(np.concatenate(out_v), type=pa.int64()),
                    "cos": pa.array(np.concatenate(out_c), type=pa.float64()),
                }
            )

    from ..collect import collect_table

    empty = pa.schema(
        [("query_id", pa.int64()), ("vec_id", pa.int64()), ("cos", pa.float64())]
    )
    out = collect_table(
        _read_embeddings(sf_dir).map_batches(
            RangeMatch,
            fn_constructor_args=(q_ref, RANGE_TAU),
            batch_format="pyarrow",
            batch_size=1024,
            concurrency=2,
        ),
        empty,
    ).to_pandas()
    out = out.sort_values(["query_id", "cos", "vec_id"],
                          ascending=[True, False, True]).reset_index(drop=True)
    out["rank"] = out.groupby("query_id").cumcount().astype("int64")
    return pa.Table.from_pandas(
        out[["query_id", "rank", "vec_id", "cos"]], preserve_index=False
    )


MMR_LAMBDA = 0.7
MMR_W = 30  # exact-relevance candidate window fed to the greedy selector


def q_knn_mmr(sf_dir: str) -> pa.Table:
    """Diversified top-k — Maximal Marginal Relevance (Carbonell &
    Goldstein 1998): ``mmr(d) = λ·cos(q,d) − (1−λ)·max_{s∈S} cos(d,s)``
    greedily over an exact cosine top-``MMR_W`` candidate window.

    Scale shape: candidate generation is the distributed brute-force
    stage (partial top-W per batch, per-query shuffle merge — swap in
    the LSH/IVF generators at sizes where brute force stops paying);
    the inherently-sequential greedy loop then runs on a driver-held
    sliver of W rows per query whose embeddings hydrate via a
    ``vec_id IN (...)`` pushdown read. Rows-only gate (greedy
    selection is not SQL-expressible); pytest proves equality with an
    independent reference implementation."""
    import pyarrow.dataset as pads

    qids, Q = _query_matrix(sf_dir)
    q_ref = ray.put((qids, Q))

    def head_w(g: pa.Table) -> pa.Table:
        cos6 = np.round(g["cos"].to_numpy(zero_copy_only=False), 6)
        vids = g["vec_id"].to_numpy(zero_copy_only=False)
        order = np.lexsort((vids, -cos6))[:MMR_W]
        return pa.table(
            {
                "query_id": pa.array(
                    np.full(order.size, g["query_id"][0].as_py(), dtype=np.int64),
                    type=pa.int64(),
                ),
                "vec_id": pa.array(vids[order].astype(np.int64), type=pa.int64()),
                "cos": pa.array(cos6[order], type=pa.float64()),
            }
        )

    head_w.__name__ = "head_w"
    cands = (
        _read_embeddings(sf_dir)
        .map_batches(
            CosineTopK,
            fn_constructor_args=(q_ref, MMR_W),
            batch_format="pyarrow",
            batch_size=1024,
            concurrency=2,
        )
        .groupby("query_id")
        .map_groups(head_w, batch_format="pyarrow")
        .to_pandas()
    )

    need = sorted(set(cands["vec_id"].astype(int)))
    t = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filter=pads.field("vec_id").isin(need),
    ).to_pandas()
    vid = t["vec_id"].to_numpy().astype(np.int64)
    X = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    pos = {int(v): i for i, v in enumerate(vid)}

    out_q, out_r, out_v, out_m, out_c = [], [], [], [], []
    for qid in (int(q) for q in qids):
        g = cands[cands.query_id == qid]
        cv = g["vec_id"].to_numpy().astype(np.int64)
        rel = g["cos"].to_numpy().astype(np.float64)  # already round-6
        E = Xn[np.array([pos[int(v)] for v in cv], dtype=np.int64)]
        sim = E @ E.T  # (W, W) pairwise candidate similarity
        sel: list[int] = []
        max_sim = np.zeros(cv.size, dtype=np.float64)
        picked = np.zeros(cv.size, dtype=bool)
        for r in range(min(KNN_K, cv.size)):
            mmr6 = np.round(MMR_LAMBDA * rel - (1.0 - MMR_LAMBDA) * max_sim, 6)
            mmr6[picked] = -np.inf
            order = np.lexsort((cv, -mmr6))
            i = int(order[0])
            picked[i] = True
            sel.append(i)
            out_q.append(qid)
            out_r.append(r)
            out_v.append(int(cv[i]))
            out_m.append(float(mmr6[i]))
            out_c.append(float(rel[i]))
            max_sim = np.maximum(max_sim, sim[:, i])
    return pa.table(
        {
            "query_id": pa.array(out_q, type=pa.int64()),
            "rank": pa.array(out_r, type=pa.int64()),
            "vec_id": pa.array(out_v, type=pa.int64()),
            "mmr": pa.array(out_m, type=pa.float64()),
            "cos": pa.array(out_c, type=pa.float64()),
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
    return _merge_topk(
        _read_embeddings(sf_dir).map_batches(
            LshBucketCosine,
            fn_constructor_args=(q_ref, KNN_K, p_ref),
            batch_format="pyarrow",
            batch_size=1024,
            concurrency=2,
        )
    )


# real near-dup corpora use ~0.9; the driver's random embeddings max
# out at cos≈0.51, so the gate threshold sits where pairs exist
COS_DUP_T = 0.4
# per-(table,bucket) candidate cap: a bucket shared by more vectors
# than this is the embedding analogue of a stop-shingle (dedup.py
# MAX_GROUP) — at 10^12 scale a duplicate-heavy corpus would otherwise
# collapse into one O(b²) bucket; dropped buckets WARN, never silent
MAX_BUCKET = 2000


def _stage_tiles(sf_dir: str, tiles_dir: str, tile_rows: int) -> tuple[int, int]:
    """Stage the NORMALIZED embedding matrix as hive-partitioned row
    tiles (tile = vec_id % n_tiles) via one Dataset pass — the driver
    never materializes the matrix; workers later read exactly the
    tiles they pair (state lives on disk, resumable, and on a real
    cluster ``tiles_dir`` sits on shared storage like the build's
    fragment side-channel). Returns (n_rows, n_tiles)."""
    import shutil

    ds = _read_embeddings(sf_dir)
    n = ds.count()
    n_tiles = max(1, (n + tile_rows - 1) // tile_rows)

    def assign(batch: pa.Table) -> pa.Table:
        vids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        X = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        return pa.table(
            {
                "vec_id": pa.array(vids, type=pa.int64()),
                "emb": pa.array(list(Xn)),
                "tile": pa.array((vids % n_tiles).astype(np.int32), type=pa.int32()),
            }
        )

    shutil.rmtree(tiles_dir, ignore_errors=True)
    os.makedirs(tiles_dir, exist_ok=True)
    ds.map_batches(assign, batch_format="pyarrow", batch_size=1024).write_parquet(
        tiles_dir, partition_cols=["tile"]
    )
    return n, n_tiles


def _load_tile(tiles_dir: str, i: int) -> tuple[np.ndarray, np.ndarray]:
    """(sorted vec_ids, normalized rows) of one staged tile."""
    import pyarrow.parquet as pq

    path = os.path.join(tiles_dir, f"tile={i}")
    if not os.path.isdir(path):
        return np.empty(0, dtype=np.int64), np.empty((0, 0))
    t = pq.read_table(path)
    vids = t["vec_id"].to_numpy(zero_copy_only=False)
    Xn = np.stack(t["emb"].to_numpy(zero_copy_only=False))
    order = np.argsort(vids)
    return vids[order], Xn[order]


class _TileCache:
    """Small per-worker LRU of loaded tiles (tile-pair tasks touching
    the same tile re-read from page cache otherwise; this skips even
    the parquet decode for the common sequential (i, i+1), (i, i+2)
    enumeration order)."""

    def __init__(self, tiles_dir: str, cap: int = 8):
        from collections import OrderedDict

        self.tiles_dir = tiles_dir
        self.cap = cap
        self._c: OrderedDict[int, tuple[np.ndarray, np.ndarray]] = OrderedDict()

    def get(self, i: int) -> tuple[np.ndarray, np.ndarray]:
        t = self._c.get(i)
        if t is None:
            t = _load_tile(self.tiles_dir, i)
            self._c[i] = t
            if len(self._c) > self.cap:
                self._c.popitem(last=False)
        else:
            self._c.move_to_end(i)
        return t


class TilePairCosine:
    """Actor-pool stage for the exact all-pairs sweep: each task holds
    at most ``cap`` tiles (2 live + LRU reuse) regardless of corpus
    size."""

    def __init__(self, tiles_dir: str):
        self.cache = _TileCache(tiles_dir)

    def __call__(self, batch: pa.Table) -> pa.Table:
        a_out, b_out, c_out = [], [], []
        for i, j in zip(batch["i"].to_pylist(), batch["j"].to_pylist()):
            va, A = self.cache.get(i)
            vb, B = self.cache.get(j)
            if not va.size or not vb.size:
                continue
            cos = A @ B.T
            if i == j:
                r, c = np.triu_indices(len(va), k=1)
            else:
                r, c = np.indices(cos.shape).reshape(2, -1)
            keep = cos[r, c] >= COS_DUP_T
            r, c = r[keep], c[keep]
            lo = np.minimum(va[r], vb[c])
            hi = np.maximum(va[r], vb[c])
            a_out.append(lo.astype(np.int64))
            b_out.append(hi.astype(np.int64))
            c_out.append(np.round(cos[r, c], 6))
        if not a_out:
            return pa.table({"a_id": pa.array([], type=pa.int64()),
                             "b_id": pa.array([], type=pa.int64()),
                             "cos": pa.array([], type=pa.float64())})
        return pa.table(
            {
                "a_id": pa.array(np.concatenate(a_out), type=pa.int64()),
                "b_id": pa.array(np.concatenate(b_out), type=pa.int64()),
                "cos": pa.array(np.concatenate(c_out), type=pa.float64()),
            }
        )


def q_embedding_near_dup(sf_dir: str, tile_rows: int = 256) -> pa.Table:
    """Embedding-cosine near-duplicate pairs (cos ≥ COS_DUP_T, a < b).

    Exact all-pairs via TILE-PAIR decomposition: the normalized matrix
    is staged as parquet row tiles by a Dataset pass (``_stage_tiles``
    — the driver holds NO rows at any point); a Dataset of (i, j) tile
    index pairs fans out so each task loads exactly two tiles and
    emits that tile-pair's thresholded pairs. Per-task memory is a
    handful of tiles regardless of corpus size. Compute is still O(N²)
    by definition of the exact baseline; ``embedding_near_dup_lsh`` is
    the sub-quadratic approximate path (bucketed candidates + exact
    verification)."""
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="neardup-tiles-", dir="/tmp")
    try:
        _, n_tiles = _stage_tiles(sf_dir, work, tile_rows)
        pairs = ray.data.from_items(
            [{"i": i, "j": j} for i in range(n_tiles) for j in range(i, n_tiles)]
        )
        out = pairs.map_batches(
            TilePairCosine,
            fn_constructor_args=(work,),
            batch_format="pyarrow",
            batch_size=4,
            concurrency=4,
        ).to_pandas()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return pa.Table.from_pandas(
        out.sort_values(["a_id", "b_id"]).reset_index(drop=True), preserve_index=False
    )


def _bucket_candidates(vids: np.ndarray, n_tiles: int, max_bucket: int) -> pa.Table:
    """Candidate (a_id, b_id) pairs for one LSH bucket, keyed by the
    verification tile-pair group (vkey). Buckets above ``max_bucket``
    are stop-buckets: dropped with a WARNING, never silently."""
    empty = pa.table({"a_id": pa.array([], type=pa.int64()),
                      "b_id": pa.array([], type=pa.int64()),
                      "vkey": pa.array([], type=pa.int64())})
    if vids.size < 2:
        return empty
    if vids.size > max_bucket:
        import warnings

        warnings.warn(
            f"embedding_near_dup_lsh: dropped a candidate bucket of "
            f"{vids.size} vectors (> max_bucket={max_bucket}); near-dups "
            f"only co-bucketed there are lost — raise max_bucket or treat "
            f"the bucket as a stop-bucket deliberately",
            stacklevel=2,
        )
        return empty
    r, c = np.triu_indices(vids.size, k=1)
    a, b = vids[r], vids[c]
    vkey = (a % n_tiles) * n_tiles + (b % n_tiles)
    return pa.table(
        {
            "a_id": pa.array(a, type=pa.int64()),
            "b_id": pa.array(b, type=pa.int64()),
            "vkey": pa.array(vkey, type=pa.int64()),
        }
    )


class VerifyPairs:
    """Exact verification of one tile-pair group of candidate pairs:
    load the two tiles, look rows up by vec_id (searchsorted over the
    tile's sorted ids), compute exact cosine row-wise. Candidate
    duplicates across LSH tables collapse here for free — every copy
    of a pair lands in the same (tile_a, tile_b) group."""

    def __init__(self, tiles_dir: str, n_tiles: int):
        self.cache = _TileCache(tiles_dir)
        self.n_tiles = n_tiles
        self.__name__ = "VerifyPairs"  # map_groups reads __name__

    def __call__(self, g: pa.Table) -> pa.Table:
        vkey = int(g["vkey"][0].as_py())
        i, j = divmod(vkey, self.n_tiles)
        pairs = np.unique(
            np.stack([g["a_id"].to_numpy(zero_copy_only=False),
                      g["b_id"].to_numpy(zero_copy_only=False)], axis=1),
            axis=0,
        )
        va, A = self.cache.get(i)
        vb, B = self.cache.get(j)
        ai = np.searchsorted(va, pairs[:, 0])
        bi = np.searchsorted(vb, pairs[:, 1])
        cos = np.einsum("ij,ij->i", A[ai], B[bi])
        keep = cos >= COS_DUP_T
        return pa.table(
            {
                "a_id": pa.array(pairs[keep, 0], type=pa.int64()),
                "b_id": pa.array(pairs[keep, 1], type=pa.int64()),
                "cos": pa.array(np.round(cos[keep], 6), type=pa.float64()),
            }
        )


def q_embedding_near_dup_lsh(
    sf_dir: str,
    n_tables: int = 12,
    n_bits: int = 4,
    tile_rows: int = 256,
    max_bucket: int = MAX_BUCKET,
) -> pa.Table:
    """Approximate near-dup pairs: LSH-bucketed candidate generation +
    EXACT verification (the sub-quadratic scale path the exact baseline
    documents). The bucket shuffle moves ONLY narrow (bkey, vec_id)
    rows — embeddings are never replicated through it (the r2 version
    shipped every normalized vector n_tables×); vectors are read back
    from staged parquet tiles at verification time. Candidate buckets
    larger than ``max_bucket`` are stop-buckets: dropped with a WARNING
    (dedup.py MAX_GROUP discipline) so a duplicate-heavy corpus
    degrades predictably instead of collapsing into one O(b²) group.
    Precision is exact by construction; recall depends on
    (n_tables, n_bits) — pytest + RECALL.json measure it against the
    exact baseline (rows-only gate entry)."""
    import shutil
    import tempfile

    rng = np.random.default_rng(7)
    ds = _read_embeddings(sf_dir)
    import pyarrow.parquet as pq

    # vector dimension from ONE row — not a driver read of the table
    first = next(
        pq.ParquetFile(os.path.join(sf_dir, "embeddings.parquet")).iter_batches(
            batch_size=1, columns=["embedding"]
        )
    )
    dim = len(first["embedding"][0])
    planes = rng.standard_normal((n_tables, n_bits, dim))
    p_ref = ray.put(planes)

    work = tempfile.mkdtemp(prefix="neardup-lsh-", dir="/tmp")
    try:
        _, n_tiles = _stage_tiles(sf_dir, work, tile_rows)

        def bucket_rows(batch: pa.Table, _p=p_ref) -> pa.Table:
            """(bkey, vec_id) membership rows — NARROW; one row per
            (vector, table), 16 bytes each."""
            pl = ray.get(_p)
            vids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            X = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
            Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
            T, B, _ = pl.shape
            out_key, out_vid = [], []
            for t_i in range(T):
                bits = (Xn @ pl[t_i].T) > 0
                codes = (bits @ (1 << np.arange(B))).astype(np.int64)
                out_key.append(t_i * (1 << B) + codes)  # (table, bucket) composite
                out_vid.append(vids)
            return pa.table(
                {
                    "bkey": pa.array(np.concatenate(out_key), type=pa.int64()),
                    "vec_id": pa.array(np.concatenate(out_vid), type=pa.int64()),
                }
            )

        def bucket_cands(g: pa.Table) -> pa.Table:
            return _bucket_candidates(
                np.unique(g["vec_id"].to_numpy(zero_copy_only=False)), n_tiles, max_bucket
            )

        bucket_cands.__name__ = "bucket_cands"
        out = (
            ds.map_batches(bucket_rows, batch_format="pyarrow", batch_size=1024)
            .groupby("bkey")
            .map_groups(bucket_cands, batch_format="pyarrow")
            .groupby("vkey")
            .map_groups(VerifyPairs(work, n_tiles), batch_format="pyarrow")
            .to_pandas()
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    if out.empty:  # no candidate survived (e.g. every bucket capped)
        return pa.table({"a_id": pa.array([], type=pa.int64()),
                         "b_id": pa.array([], type=pa.int64()),
                         "cos": pa.array([], type=pa.float64())})
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


def train_centroids(
    sf_dir: str,
    n_centroids: int = 8,
    iters: int = 4,
    seed: int = 42,
    max_train: int = 65536,
) -> np.ndarray:
    """Seeded mini k-means over a BOUNDED training sample. The driver
    never reads the full embedding table: tables larger than
    ``max_train`` rows are down-sampled with a seeded
    ``Dataset.random_sample`` (workers do the sampling; only ≤max_train
    narrow rows reach the driver). k-means quality needs only a
    representative sample, so the trained index is unaffected by
    corpus size.

    The shared implementation lives in
    ``pipelines.ann.train_centroids_ds`` (same math, same contract:
    UN-normalized centroid means; callers normalize)."""
    from docinsight_ray.pipelines.ann import train_centroids_ds

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding"]
    )
    return train_centroids_ds(
        ds, n_centroids=n_centroids, iters=iters, seed=seed, max_train=max_train
    )


def q_knn_cosine_ivf(sf_dir: str, n_centroids: int = 8, nprobe: int = 4) -> pa.Table:
    """IVF-bucketed approximate cosine top-10 (rows-only check; pytest
    asserts recall vs the exact baseline).

    Recall note (RECALL.json): the driver's synthetic embeddings are
    ISOTROPIC (intra-label cosine ≈ 0), the worst case for IVF —
    without cluster structure recall is bounded by the scanned
    fraction (measured: ≈0.62 at nprobe/n_centroids = 3/8, ≈0.78 at
    4/8, tracking nprobe/n_centroids). The default probes half the
    buckets for ~0.78 recall at half the brute-force FLOPs; on real
    clustered embeddings the same config scans far less than it
    recalls, which is the regime IVF exists for."""
    qmat = _query_matrix(sf_dir)
    C = train_centroids(sf_dir, n_centroids=n_centroids)
    q_ref = ray.put(qmat)
    c_ref = ray.put(C)
    return _merge_topk(
        _read_embeddings(sf_dir).map_batches(
            IvfCosine,
            fn_constructor_args=(q_ref, c_ref, KNN_K, nprobe),
            batch_format="pyarrow",
            batch_size=1024,
            concurrency=2,
        )
    )


KNN_FILTER_LABELS = (2, 5, 9)  # metadata predicate for filtered kNN


def q_knn_cosine_filtered(sf_dir: str) -> pa.Table:
    """Exact cosine top-10 restricted to ``label IN KNN_FILTER_LABELS``
    — the filtered-kNN shape (ANN with a metadata predicate, e.g.
    "nearest English docs only"). The predicate is pushed into the
    parquet read (``read_parquet(filter=...)``) so excluded row groups
    never leave storage; at 100 TB a label-partitioned layout makes
    this a partition prune. Query vectors themselves are NOT required
    to satisfy the predicate (seed-vector convention, as knn_cosine)."""
    import pyarrow.dataset as pads

    qmat = _query_matrix(sf_dir)
    q_ref = ray.put(qmat)
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        filter=pads.field("label").isin(list(KNN_FILTER_LABELS)),
    )
    return _merge_topk(
        ds.map_batches(
            CosineTopK,
            fn_constructor_args=(q_ref, KNN_K),
            batch_format="pyarrow",
            batch_size=1024,
            concurrency=2,
        )
    )


class _DimRange:
    """Per-batch partial per-dimension min/max — the tiny first pass of
    scalar quantization (one 2×dim row per batch reaches the merge)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        X = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        return pa.table(
            {
                "mn": pa.array([X.min(axis=0)], type=pa.list_(pa.float64())),
                "mx": pa.array([X.max(axis=0)], type=pa.list_(pa.float64())),
            }
        )


def _sq8_train(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """Per-dimension (min, max) over the embedding table, computed as a
    distributed partial reduce: each batch emits one min/max vector
    pair and the driver folds the ≤n_batches tiny rows."""
    parts = (
        ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding"])
        .map_batches(_DimRange(), batch_format="pyarrow", batch_size=2048)
        .to_pandas()
    )
    mn = np.min(np.stack(parts["mn"].to_numpy()), axis=0)
    mx = np.max(np.stack(parts["mx"].to_numpy()), axis=0)
    return mn, mx


class Sq8CosineCandidates:
    """SQ8 candidate generation: per batch, quantize embeddings to
    uint8 with the broadcast per-dimension (min, scale), score the
    DEQUANTIZED vectors against the query matrix, and emit each query's
    top-``fetch_k`` — the storage model where only the u8 codes (4×
    smaller, plus one scale vector) are resident at search time. Exact
    float rescoring happens later on the candidate sliver only."""

    def __init__(self, q_ref, range_ref, fetch_k: int):
        self.qids, Q = ray.get(q_ref) if isinstance(q_ref, ray.ObjectRef) else q_ref
        mn, mx = ray.get(range_ref) if isinstance(range_ref, ray.ObjectRef) else range_ref
        self.mn = mn
        self.scale = np.where(mx > mn, (mx - mn) / 255.0, 1.0)
        self.Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
        self.fetch_k = fetch_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids = batch["vec_id"].to_numpy(zero_copy_only=False)
        X = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        # quantize → u8 codes (what a real index stores), then search
        # on the dequantized reconstruction
        codes = np.clip(np.round((X - self.mn) / self.scale), 0, 255).astype(np.uint8)
        Xq = self.mn + codes.astype(np.float64) * self.scale
        n = np.linalg.norm(Xq, axis=1, keepdims=True)
        n[n == 0.0] = 1.0
        Xqn = Xq / n
        cos = self.Qn @ Xqn.T
        out_q, out_v, out_a = [], [], []
        for qi, qid in enumerate(self.qids):
            idx = np.flatnonzero(vids != qid)
            take = idx[np.argsort(-cos[qi][idx], kind="stable")[: self.fetch_k]]
            out_q.append(np.full(take.size, qid, dtype=np.int64))
            out_v.append(vids[take].astype(np.int64))
            out_a.append(cos[qi][take])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), type=pa.int64()),
                "acos": pa.array(np.concatenate(out_a), type=pa.float64()),
            }
        )


def q_knn_cosine_sq8(sf_dir: str, fetch_k: int | None = None) -> pa.Table:
    """Scalar-quantized (int8) approximate kNN with exact rescoring —
    the memory-scale path: u8 codes are 4× smaller than float32
    embeddings, so a 100 TB embedding corpus serves from 25 TB of
    resident codes; candidates (fetch_k per query per batch) are then
    rescored from the EXACT float embeddings, hydrated by a pushed-down
    ``vec_id IN (...)`` parquet read of only the candidate sliver.

    Rows-only gate (quantization error can drop a true neighbor from
    the candidate set); pytest + RECALL.json record measured recall vs
    q_knn_cosine."""
    fetch_k = fetch_k or (3 * KNN_K)
    qids, Q = _query_matrix(sf_dir)
    q_ref = ray.put((qids, Q))
    range_ref = ray.put(_sq8_train(sf_dir))
    cands = (
        _read_embeddings(sf_dir)
        .map_batches(
            Sq8CosineCandidates,
            fn_constructor_args=(q_ref, range_ref, fetch_k),
            batch_format="pyarrow",
            batch_size=1024,
            concurrency=2,
        )
        .to_pandas()
    )
    return _exact_rescore(sf_dir, cands, qids, Q)


def _exact_rescore(sf_dir: str, cands, qids: np.ndarray, Q: np.ndarray) -> pa.Table:
    """Exact rescore of a candidate sliver: hydrate ONLY the candidate
    vectors (predicate-pushdown ``vec_id IN (...)`` parquet read), then
    exact float64 cosine + the gate's (round6 desc, vec_id asc) top-k
    order. Shared by the quantized-candidate paths (SQ8, PQ): the
    quantizer only affects WHICH candidates survive; the scores of the
    survivors are exact."""
    import pyarrow.dataset as pads

    uniq = np.unique(cands["vec_id"].to_numpy()).tolist()
    t = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"],
        filter=pads.field("vec_id").isin(uniq),
    ).to_pandas()
    cvid = t["vec_id"].to_numpy().astype(np.int64)
    CX = np.stack(t["embedding"].to_numpy()).astype(np.float64)
    CXn = CX / np.linalg.norm(CX, axis=1, keepdims=True)
    pos = {int(v): i for i, v in enumerate(cvid)}
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    out_q, out_r, out_v, out_c = [], [], [], []
    for qi, qid in enumerate(qids):
        vs = np.unique(cands.loc[cands.query_id == qid, "vec_id"].to_numpy()).astype(np.int64)
        rows = np.array([pos[int(v)] for v in vs], dtype=np.int64)
        cos6 = np.round(CXn[rows] @ Qn[qi], 6)
        order = np.lexsort((vs, -cos6))[:KNN_K]
        out_q += [int(qid)] * order.size
        out_r += list(range(order.size))
        out_v.append(vs[order])
        out_c.append(cos6[order])
    return pa.table(
        {
            "query_id": pa.array(out_q, type=pa.int64()),
            "rank": pa.array(out_r, type=pa.int64()),
            "vec_id": pa.array(np.concatenate(out_v), type=pa.int64()),
            "cos": pa.array(np.concatenate(out_c), type=pa.float64()),
        }
    )


# ---- Product quantization (PQ) with ADC scoring ----------------------------

PQ_M = 8       # subspaces (dim 64 → 8 dims each)
PQ_KS = 32     # centroids per subspace (5-bit codes)


def _pq_train(
    sf_dir: str,
    m: int = PQ_M,
    ks: int = PQ_KS,
    iters: int = 8,
    seed: int = 42,
    max_train: int = 65536,
) -> np.ndarray:
    """Train PQ sub-codebooks (Jégou et al. 2011): split the NORMALIZED
    embedding space into ``m`` contiguous subspaces and run a seeded
    k-means in each. Training uses the same bounded seeded-sample
    discipline as :func:`train_centroids` — only ≤``max_train`` rows
    ever reach the driver, so codebook training cost is independent of
    corpus size. Returns ``(m, ks, dsub)`` float64 codebooks."""
    from docinsight_ray.pipelines.ann import pq_train_books, sample_embeddings_ds

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding"]
    )
    X = sample_embeddings_ds(ds, seed=seed, max_train=max_train)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    return pq_train_books(Xn, m, ks, iters=iters, seed=seed)


class PqAdcCandidates:
    """PQ candidate generation with asymmetric-distance (ADC) scoring:
    per batch, encode each normalized vector to ``m`` sub-codebook ids
    (the ``m × log2(ks)``-bit code a real PQ index stores — 64 float32
    dims → 5 B/vector here, a 51× compression), then score candidates
    as ``q · x̂ / ‖x̂‖`` where both the dot product and the
    reconstruction norm are TABLE LOOKUPS: per-query LUTs
    ``lut[m, ks] = q_sub · codebook`` and per-code sub-norms are
    precomputed once in ``__init__``, so scoring a vector is ``m``
    gathers + a sum, never a float matmul over the raw matrix."""

    def __init__(self, q_ref, books_ref, fetch_k: int):
        self.qids, Q = ray.get(q_ref) if isinstance(q_ref, ray.ObjectRef) else q_ref
        books = ray.get(books_ref) if isinstance(books_ref, ray.ObjectRef) else books_ref
        self.books = books  # (m, ks, dsub)
        m, ks, dsub = books.shape
        self.m, self.dsub = m, dsub
        Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
        # luts[q, j, c] = Qn[q, sub_j] · books[j, c]
        self.luts = np.einsum("qjd,jcd->qjc", Qn.reshape(len(Qn), m, dsub), books)
        self.cnorm2 = (books * books).sum(axis=2)  # (m, ks) sub-norm²
        self.fetch_k = fetch_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        vids = batch["vec_id"].to_numpy(zero_copy_only=False)
        X = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        from docinsight_ray.pipelines.ann import pq_encode

        codes = pq_encode(Xn, self.books).astype(np.int64)
        # reconstruction norm from the code sub-norms (subspaces are
        # orthogonal coordinate slices, so norms² add)
        rnorm = np.sqrt(self.cnorm2[np.arange(self.m), codes].sum(axis=1))
        rnorm[rnorm == 0.0] = 1.0
        out_q, out_v, out_a = [], [], []
        for qi, qid in enumerate(self.qids):
            adot = self.luts[qi][np.arange(self.m), codes].sum(axis=1)  # (n,)
            acos = adot / rnorm
            idx = np.flatnonzero(vids != qid)
            take = idx[np.argsort(-acos[idx], kind="stable")[: self.fetch_k]]
            out_q.append(np.full(take.size, qid, dtype=np.int64))
            out_v.append(vids[take].astype(np.int64))
            out_a.append(acos[take])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
                "vec_id": pa.array(np.concatenate(out_v), type=pa.int64()),
                "acos": pa.array(np.concatenate(out_a), type=pa.float64()),
            }
        )


def q_knn_cosine_pq(sf_dir: str, fetch_k: int | None = None) -> pa.Table:
    """Product-quantized approximate kNN with exact rescoring — the
    extreme-compression scale path beyond SQ8: vectors are stored as
    ``m`` sub-codebook ids (here 8×5 bits ≈ 5 B vs 256 B float32, 51×)
    and scored by ADC table lookups; the quantizer replaces the FAISS
    ``IndexPQ``/``IndexIVFPQ`` storage model the reference's FAISS
    backend would use at scale (/root/reference/index/faiss_index.py).
    Candidates (``fetch_k`` per query per batch) are rescored from the
    exact float embeddings via the shared pushdown-hydration rescorer.

    Rows-only gate (coarse 5-bit codes can drop a true neighbor from
    the candidate set); pytest + RECALL.json record measured recall vs
    q_knn_cosine."""
    fetch_k = fetch_k or (5 * KNN_K)
    qids, Q = _query_matrix(sf_dir)
    q_ref = ray.put((qids, Q))
    books_ref = ray.put(_pq_train(sf_dir))
    cands = (
        _read_embeddings(sf_dir)
        .map_batches(
            PqAdcCandidates,
            fn_constructor_args=(q_ref, books_ref, fetch_k),
            batch_format="pyarrow",
            batch_size=1024,
            concurrency=2,
        )
        .to_pandas()
    )
    return _exact_rescore(sf_dir, cands, qids, Q)


# ---- SemDeDup: cluster-then-dedup semantic deduplication -------------------

SEM_MAX_CLUSTER = 4096  # per-cluster pairwise cap (MAX_BUCKET discipline)


class _SemDedupCluster:
    """map_groups worker for one k-means cluster: greedy keep-first
    (vec_id asc) cosine dedup — SemDeDup (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication") with this repo's exact-near-dup keeper convention
    (lowest vec_id survives its duplicate group). Clusters above
    ``SEM_MAX_CLUSTER`` degrade predictably: every member is kept and
    a WARNING fires (the stop-bucket discipline of
    ``_bucket_candidates`` / dedup.py's MAX_GROUP) — at true scale
    such a cluster gets the tile-pair decomposition of
    ``q_embedding_near_dup`` instead of silent loss."""

    def __init__(self, eps: float):
        self.eps = float(eps)
        self.__name__ = "_SemDedupCluster"  # map_groups reads __name__

    def __call__(self, g: "pd.DataFrame") -> "pd.DataFrame":
        import pandas as pd

        g = g.sort_values("vec_id").reset_index(drop=True)
        n = len(g)
        kept = np.ones(n, dtype=bool)
        if n > SEM_MAX_CLUSTER:
            import warnings

            warnings.warn(
                f"semdedup: cluster of {n} vectors exceeds "
                f"SEM_MAX_CLUSTER={SEM_MAX_CLUSTER}; keeping all members "
                f"(near-dups inside it are NOT removed) — raise the cap or "
                f"route the cluster through the tile-pair exact path",
                stacklevel=2,
            )
        elif n > 1:
            X = np.stack(g["embedding"].to_numpy()).astype(np.float64)
            Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
            S = Xn @ Xn.T
            # greedy scan in vec_id order: drop i iff an already-kept
            # earlier member is within eps (sequential by construction;
            # the inner comparison is a vectorized row slice)
            for i in range(1, n):
                prior = kept[:i]
                if prior.any() and (S[i, :i][prior] >= self.eps).any():
                    kept[i] = False
        return pd.DataFrame(
            {
                "vec_id": g["vec_id"].astype("int64"),
                "cluster": g["cluster"].astype("int64"),
                "kept": kept.astype(np.int64),
            }
        )


def q_semdedup(
    sf_dir: str, n_clusters: int = 8, eps: float = COS_DUP_T
) -> pa.Table:
    """SemDeDup semantic deduplication: seeded k-means clusters over
    the embedding column (``train_centroids`` — bounded sample, never
    a full driver read), nearest-centroid assignment as a shuffle-free
    broadcast scan, then ONE groupby(cluster) shuffle with exact
    greedy cosine dedup inside each bounded cluster. Sub-quadratic by
    construction: pairwise work is Σ c_i² over cluster sizes, not N².

    Rows-only gate (iterative k-means is not SQL-expressible); pytest
    proves n_clusters=1 equals a brute-force greedy reference, the
    kept/dropped partition, and determinism. Cross-cluster near-dups
    are the approximation loss, exactly as in the paper — measured in
    RECALL.json against the exact near-dup pair set."""
    C = train_centroids(sf_dir, n_centroids=n_clusters)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    c_ref = ray.put(Cn)

    def assign(batch: pa.Table) -> pa.Table:
        cn = ray.get(c_ref)
        X = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        return batch.append_column(
            "cluster", pa.array(np.argmax(Xn @ cn.T, axis=1), type=pa.int64())
        )

    out = (
        _read_embeddings(sf_dir)
        .map_batches(assign, batch_format="pyarrow", batch_size=1024)
        .groupby("cluster")
        .map_groups(_SemDedupCluster(eps), batch_format="pandas")
        .to_pandas()
    )
    return pa.Table.from_pandas(
        out.sort_values("vec_id").reset_index(drop=True), preserve_index=False
    )


GRAPH_K = 5  # mutual-kNN graph degree


class _TileRowKNN:
    """Actor-pool stage for the exact kNN-graph sweep: a batch of tile
    indices; for each tile i the task streams every other tile through
    the per-worker LRU cache and keeps a running per-row top-(k+margin)
    candidate set, so per-task memory is O(tile_rows × margin)
    regardless of corpus size. Emits the DIRECTED top-k edges of tile
    i's rows ((round6 cos desc, nbr asc) — the gate's tie order)."""

    MARGIN = 50

    def __init__(self, tiles_dir: str, n_tiles: int, k: int):
        self.cache = _TileCache(tiles_dir)
        self.n_tiles = n_tiles
        self.k = k

    def _tile_topk(self, i: int):
        va, A = self.cache.get(i)
        if not va.size:
            return None
        cap = self.k + self.MARGIN
        n = len(va)
        # running 2D candidate buffers (rows × ≤cap) — the whole tile's
        # prune is one row-wise lexsort per visited tile, no Python
        # loop over rows. Self-matches and pad slots sink to the tail
        # via -inf scores and are dropped at emission.
        c_ids = np.full((n, 0), -1, dtype=np.int64)
        c_cos = np.full((n, 0), -np.inf, dtype=np.float64)
        for j in range(self.n_tiles):
            vb, B = self.cache.get(j)
            if not vb.size:
                continue
            cos = A @ B.T
            ids = np.broadcast_to(vb[None, :], cos.shape).copy()
            cos = cos.copy()
            cos[ids == va[:, None]] = -np.inf  # exclude self
            all_ids = np.concatenate([c_ids, ids], axis=1)
            all_cos = np.concatenate([c_cos, cos], axis=1)
            order = np.lexsort((all_ids, -np.round(all_cos, 6)), axis=1)[:, :cap]
            c_ids = np.take_along_axis(all_ids, order, axis=1)
            c_cos = np.take_along_axis(all_cos, order, axis=1)
        take = min(self.k, c_ids.shape[1])
        src = np.repeat(va, take)
        dst = c_ids[:, :take].ravel()
        cs = c_cos[:, :take].ravel()
        real = np.isfinite(cs)
        return src[real], dst[real], np.round(cs[real], 6)

    def __call__(self, batch: pa.Table) -> pa.Table:
        srcs, dsts, coss = [], [], []
        for i in batch["i"].to_pylist():
            got = self._tile_topk(int(i))
            if got is None:
                continue
            srcs.append(got[0])
            dsts.append(got[1])
            coss.append(got[2])
        if not srcs:
            return pa.table({"src": pa.array([], type=pa.int64()),
                             "dst": pa.array([], type=pa.int64()),
                             "cos": pa.array([], type=pa.float64())})
        return pa.table(
            {
                "src": pa.array(np.concatenate(srcs), type=pa.int64()),
                "dst": pa.array(np.concatenate(dsts), type=pa.int64()),
                "cos": pa.array(np.concatenate(coss), type=pa.float64()),
            }
        )


def _mutual_edges(g: pa.Table) -> pa.Table:
    """One (lo, hi) pair-key group: keep the edge iff BOTH directions
    survived their endpoint's top-k (mutual-kNN condition)."""
    if g.num_rows < 2:
        return pa.table({"a_id": pa.array([], type=pa.int64()),
                         "b_id": pa.array([], type=pa.int64()),
                         "cos": pa.array([], type=pa.float64())})
    src = g["src"].to_numpy(zero_copy_only=False)
    dst = g["dst"].to_numpy(zero_copy_only=False)
    lo, hi = min(src[0], dst[0]), max(src[0], dst[0])
    return pa.table(
        {
            "a_id": pa.array([int(lo)], type=pa.int64()),
            "b_id": pa.array([int(hi)], type=pa.int64()),
            "cos": pa.array([float(g["cos"][0].as_py())], type=pa.float64()),
        }
    )


def q_knn_graph_mutual(sf_dir: str, k: int = GRAPH_K, tile_rows: int = 256) -> pa.Table:
    """Mutual-kNN graph edges (a—b kept iff a ∈ topk(b) AND b ∈
    topk(a)) — the candidate graph that graph-based semantic dedup /
    clustering pipelines (e.g. connected-components over near-dup
    edges) consume downstream of SemDeDup.

    Shape: the normalized matrix is staged as parquet row tiles by a
    Dataset pass (``_stage_tiles`` — no driver materialization); a
    Dataset of tile indices fans out so each task computes its tile's
    exact top-k against all tiles with bounded memory (running
    per-row candidate prune); the directed edge table (N×k rows, tiny
    vs N²) shuffles ONCE by the canonical (lo, hi) pair key and each
    group keeps the edge iff both directions are present. Compute is
    O(N²/P) per task by definition of the exact baseline; the
    sub-quadratic scale path reuses the LSH/IVF candidate generators
    upstream of the same mutual filter."""
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="knngraph-tiles-", dir="/tmp")
    try:
        n, n_tiles = _stage_tiles(sf_dir, work, tile_rows)
        directed = ray.data.from_items([{"i": i} for i in range(n_tiles)]).map_batches(
            _TileRowKNN,
            fn_constructor_args=(work, n_tiles, k),
            batch_format="pyarrow",
            batch_size=2,
            concurrency=4,
        )

        def pair_key(batch: pa.Table) -> pa.Table:
            src = batch["src"].to_numpy(zero_copy_only=False)
            dst = batch["dst"].to_numpy(zero_copy_only=False)
            lo = np.minimum(src, dst)
            hi = np.maximum(src, dst)
            return batch.append_column(
                "pk", pa.array(lo.astype(np.int64) * (2**32) + hi, type=pa.int64())
            )

        out = (
            directed.map_batches(pair_key, batch_format="pyarrow", batch_size=4096)
            .groupby("pk")
            .map_groups(_mutual_edges, batch_format="pyarrow")
            .to_pandas()
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    if out.empty:
        return pa.table({"a_id": pa.array([], type=pa.int64()),
                         "b_id": pa.array([], type=pa.int64()),
                         "cos": pa.array([], type=pa.float64())})
    return pa.Table.from_pandas(
        out.sort_values(["a_id", "b_id"]).reset_index(drop=True), preserve_index=False
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
    "knn_range": f"""
        WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < {N_QUERIES}),
        s AS (
          SELECT q.qid AS query_id, e.vec_id,
                 round(
                   list_dot_product(q.qe::DOUBLE[], e.embedding::DOUBLE[])
                   / sqrt(list_dot_product(q.qe::DOUBLE[], q.qe::DOUBLE[]))
                   / sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])), 6) AS cos
          FROM q, embeddings e WHERE e.vec_id != q.qid
        )
        SELECT query_id,
               row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) - 1 AS rank,
               vec_id, cos
        FROM s WHERE cos >= {RANGE_TAU!r}
    """,
    # knn_cosine_lsh: approximate → rows-only check
    "knn_cosine_filtered": f"""
        WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < {N_QUERIES}),
        s AS (
          SELECT q.qid AS query_id, e.vec_id,
                 round(
                   list_dot_product(q.qe::DOUBLE[], e.embedding::DOUBLE[])
                   / sqrt(list_dot_product(q.qe::DOUBLE[], q.qe::DOUBLE[]))
                   / sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])), 6) AS cos
          FROM q, embeddings e
          WHERE e.vec_id != q.qid AND e.label IN ({", ".join(str(x) for x in KNN_FILTER_LABELS)})
        ),
        r AS (
          SELECT query_id, vec_id, cos,
                 row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) - 1 AS rank
          FROM s
        )
        SELECT query_id, rank, vec_id, cos FROM r WHERE rank < {KNN_K}
    """,
    # knn_cosine_sq8 / knn_cosine_pq: approximate candidates →
    # rows-only check (recall measured in RECALL.json and floored in
    # pytest; overlap scores exact by the shared rescorer)
    "knn_graph_mutual": f"""
        WITH s AS (
          SELECT a.vec_id AS src, b.vec_id AS dst,
                 round(
                   list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                   / sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                   / sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])), 6) AS cos
          FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
        ),
        r AS (
          SELECT src, dst, cos,
                 row_number() OVER (PARTITION BY src ORDER BY cos DESC, dst ASC) AS rn
          FROM s
        ),
        k AS (SELECT src, dst, cos FROM r WHERE rn <= {GRAPH_K})
        SELECT k1.src AS a_id, k1.dst AS b_id, k1.cos AS cos
        FROM k k1 JOIN k k2 ON k1.src = k2.dst AND k1.dst = k2.src
        WHERE k1.src < k1.dst
    """,
}

QUERIES = {
    "knn_cosine": q_knn_cosine,
    "knn_range": q_knn_range,
    "knn_mmr": q_knn_mmr,
    "knn_cosine_filtered": q_knn_cosine_filtered,
    "knn_cosine_sq8": q_knn_cosine_sq8,
    "knn_cosine_pq": q_knn_cosine_pq,
    "knn_cosine_lsh": q_knn_cosine_lsh,
    "knn_cosine_ivf": q_knn_cosine_ivf,
    "embedding_near_dup": q_embedding_near_dup,
    "embedding_near_dup_lsh": q_embedding_near_dup_lsh,
    "semdedup": q_semdedup,
    "knn_graph_mutual": q_knn_graph_mutual,
}
