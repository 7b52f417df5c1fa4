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
ANN_PQ_BOOKS = "pq_books.json"


def sample_embeddings_ds(
    ds: "ray.data.Dataset", seed: int = 42, max_train: int = 65536
) -> np.ndarray:
    """Bounded, seeded, ORDER-CANONICAL sample of a Dataset's
    ``embedding`` column as a float64 matrix. The driver never holds
    more than ``max_train`` rows (workers down-sample via the seeded
    ``random_sample``), and rows are lexsorted so downstream seeded
    trainers (k-means inits pick BY ROW POSITION) are pure functions
    of the sampled row SET — block arrival order is
    scheduling-dependent (streaming executor, preserve_order=False)."""
    ds = ds.select_columns(["embedding"])
    n = ds.count()
    if n > max_train:
        ds = ds.random_sample(min(1.0, 1.1 * max_train / n), seed=seed).limit(max_train)
    X = np.stack(ds.to_pandas()["embedding"].to_numpy()).astype(np.float64)
    return X[np.lexsort(X.T[::-1])]


def pq_train_books(
    Xn: np.ndarray, m: int, ks: int, iters: int = 8, seed: int = 42
) -> np.ndarray:
    """Seeded PQ sub-codebook training (Jégou et al. 2011) over an
    already-normalized sample matrix: split into ``m`` contiguous
    subspaces, k-means each. Returns ``(m, ks, dsub)`` float64."""
    dim = Xn.shape[1]
    if dim % m:
        raise ValueError(f"PQ: dim {dim} not divisible by m={m}")
    dsub = dim // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, ks, dsub), dtype=np.float64)
    for j in range(m):
        S = Xn[:, j * dsub : (j + 1) * dsub]
        C = S[rng.choice(len(S), size=min(ks, len(S)), replace=False)]
        if len(C) < ks:  # tiny-corpus degenerate case: pad by repetition
            C = np.concatenate([C, C[np.zeros(ks - len(C), dtype=np.int64)]])
        for _ in range(iters):
            # L2 assignment via the expanded form (‖s‖² is rank-constant)
            d = -2.0 * (S @ C.T) + (C * C).sum(axis=1)
            assign = np.argmin(d, axis=1)
            for c in range(ks):
                members = S[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        books[j] = C
    return books


def pq_encode(Xn: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Encode normalized rows to ``(n, m)`` uint8 sub-codebook ids
    (nearest codeword per subspace, L2)."""
    m, ks, dsub = books.shape
    codes = np.empty((len(Xn), m), dtype=np.uint8)
    for j in range(m):
        S = Xn[:, j * dsub : (j + 1) * dsub]
        C = books[j]
        codes[:, j] = np.argmin(-2.0 * (S @ C.T) + (C * C).sum(axis=1), axis=1)
    return codes


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
    X = sample_embeddings_ds(ds, seed=seed, max_train=max_train)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    return kmeans_cosine(Xn, n_centroids, iters=iters, seed=seed)


def kmeans_cosine(
    Xn: np.ndarray, n_centroids: int, iters: int = 4, seed: int = 42
) -> np.ndarray:
    """Seeded k-means with cosine (argmax-dot) assignment over an
    already-normalized sample. Returns UN-normalized means."""
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
    if stats.get("kind") == "ivfpq":
        # same append contract, but encode with the STORED codebooks
        books = np.asarray(json.loads(fsio.read_bytes(os.path.join(root, ANN_PQ_BOOKS))))
        n_new = emb_ds.count()
        emb_ds.map_batches(
            _ivfpq_assign_encode(Cn, books), batch_format="pyarrow", batch_size=1024
        ).write_parquet(os.path.join(root, "lists"), partition_cols=["cid"])
        stats["n_vectors"] = int(stats["n_vectors"]) + int(n_new)
        fsio.write_bytes_atomic(
            os.path.join(root, ANN_STATS), json.dumps(stats).encode()
        )
        return stats
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


def _ivfpq_assign_encode(Cn: np.ndarray, books: np.ndarray):
    """Batch fn: route each vector to its argmax coarse centroid and
    encode it to PQ codes. Centroids/codebooks broadcast ONCE via
    ray.put; metadata columns pass through for filtered serving.
    Codes are variable-width ``binary`` deliberately — an
    all-fixed-width map_batches output trips the Ray 2.49 block
    transport row re-pairing hazard (ROADMAP §6b)."""
    c_ref, b_ref = ray.put(Cn), ray.put(books)

    def assign_encode(batch: pa.Table) -> pa.Table:
        cn, bk = ray.get(c_ref), ray.get(b_ref)
        Xb = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        Xbn = Xb / np.linalg.norm(Xb, axis=1, keepdims=True)
        codes = pq_encode(Xbn, bk)
        cols = {
            "vec_id": batch["vec_id"].cast(pa.int64()),
            "pq_code": pa.array([r.tobytes() for r in codes], type=pa.binary()),
        }
        for name in batch.column_names:  # metadata passthrough
            if name not in ("vec_id", "embedding"):
                cols[name] = batch[name]
        cols["cid"] = pa.array(np.argmax(Xbn @ cn.T, axis=1), type=pa.int64())
        return pa.table(cols)

    return assign_encode


def build_ivfpq_index(
    emb_ds: "ray.data.Dataset",
    out_dir: str,
    n_centroids: int = 8,
    pq_m: int = 8,
    pq_ks: int = 32,
    seed: int = 42,
    train_iters: int = 4,
    pq_iters: int = 8,
    max_train: int = 65536,
) -> dict:
    """IVF-PQ persisted index (Jégou et al. 2011; the FAISS
    ``IndexIVFPQ`` storage model the reference's backend would use at
    billion-vector scale, /root/reference/index/faiss_index.py): the
    inverted lists store ``pq_m``-byte PQ CODES instead of float
    vectors — here 8 B vs 256 B float32 (32×), which is what lets a
    node's list cache hold lists for a corpus whose raw embeddings
    would not fit in cluster RAM.

    Same single-pass shape as :func:`build_ann_index`: bounded-sample
    training (coarse centroids AND sub-codebooks from one sample),
    then ONE assign+encode scan writing hive-partitioned code lists.
    Non-embedding metadata columns ride along for filtered serving.
    Codes are stored as variable-width ``binary`` deliberately: an
    all-fixed-width map_batches output trips the Ray 2.49 block
    transport row re-pairing hazard (ROADMAP §6b)."""
    from ..state import fsio

    # ONE sample pass feeds both trainers (coarse centroids + books)
    X = sample_embeddings_ds(emb_ds, seed=seed, max_train=max_train)
    Xn_s = X / np.linalg.norm(X, axis=1, keepdims=True)
    C = kmeans_cosine(Xn_s, n_centroids, iters=train_iters, seed=seed)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    books = pq_train_books(Xn_s, pq_m, pq_ks, iters=pq_iters, seed=seed)
    lists_dir = os.path.join(out_dir, "lists")
    fsio.rmtree(lists_dir)
    fsio.makedirs(lists_dir)
    emb_ds.map_batches(
        _ivfpq_assign_encode(Cn, books), batch_format="pyarrow", batch_size=1024
    ).write_parquet(lists_dir, partition_cols=["cid"])
    stats = {
        "kind": "ivfpq",
        "n_vectors": int(emb_ds.count()),
        "dim": int(Cn.shape[1]),
        "n_centroids": int(n_centroids),
        "pq_m": int(pq_m),
        "pq_ks": int(pq_ks),
        "seed": int(seed),
        "train_iters": int(train_iters),
        "pq_iters": int(pq_iters),
    }
    fsio.write_bytes_atomic(
        os.path.join(out_dir, ANN_CENTROIDS),
        json.dumps([[float(x) for x in row] for row in Cn]).encode(),
    )
    fsio.write_bytes_atomic(
        os.path.join(out_dir, ANN_PQ_BOOKS),
        json.dumps([[[float(x) for x in cw] for cw in bk] for bk in books]).encode(),
    )
    fsio.write_bytes_atomic(os.path.join(out_dir, ANN_STATS), json.dumps(stats).encode())
    return stats


class IvfPqIndex:
    """IVF-PQ serving handle: centroids + sub-codebooks resident,
    CODE lists lazily LRU-loaded (same residency discipline as
    :class:`AnnIndex`, but each cached list costs ``pq_m`` bytes per
    vector instead of ``4·dim``). Returns approximate-candidate
    tables; callers refine the sliver with an exact rescore from the
    source embedding column (``functions.knn._exact_rescore``), so
    the quantizer only decides WHICH candidates survive — surviving
    scores are exact."""

    def __init__(self, root: str, nprobe: int = 4, cache_lists: int = 64):
        from collections import OrderedDict

        from ..state.fsio import read_bytes

        raw = read_bytes(os.path.join(root, ANN_STATS))
        if raw is None:
            raise FileNotFoundError(f"{root}/{ANN_STATS}: not a built ANN index")
        self.stats = json.loads(raw)
        if self.stats.get("kind") != "ivfpq":
            raise ValueError(f"{root}: not an IVF-PQ index (use AnnIndex)")
        self.Cn = np.asarray(json.loads(read_bytes(os.path.join(root, ANN_CENTROIDS))))
        self.books = np.asarray(json.loads(read_bytes(os.path.join(root, ANN_PQ_BOOKS))))
        self.m = int(self.stats["pq_m"])
        # per-code sub-norm² — reconstruction norms are table lookups
        self.cnorm2 = (self.books * self.books).sum(axis=2)
        self.root = root
        self.nprobe = min(nprobe, int(self.stats["n_centroids"]))
        self.cache_lists = cache_lists
        self._lists: "OrderedDict[int, tuple]" = OrderedDict()
        self.lists_loaded = 0

    def _load_list(self, cid: int):
        hit = self._lists.get(cid)
        if hit is not None:
            self._lists.move_to_end(cid)
            return hit
        from ..state.fsio import glob_parquet

        files = glob_parquet(os.path.join(self.root, "lists", f"cid={cid}"))
        if not files:
            out = (
                np.empty(0, dtype=np.int64),
                np.empty((0, self.m), dtype=np.uint8),
                np.empty(0),
                {},
            )
        else:
            t = pa.concat_tables([pq.read_table(f) for f in files])
            vids = t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            codes = np.frombuffer(
                b"".join(t["pq_code"].to_pylist()), dtype=np.uint8
            ).reshape(len(vids), self.m)
            order = np.argsort(vids)
            vids, codes = vids[order], codes[order]
            rnorm = np.sqrt(self.cnorm2[np.arange(self.m), codes].sum(axis=1))
            rnorm[rnorm == 0.0] = 1.0
            meta = {
                c: t[c].take(pa.array(order)).to_numpy(zero_copy_only=False)
                for c in t.column_names
                if c not in ("vec_id", "pq_code")
            }
            out = (vids, codes, rnorm, meta)
        self._lists[cid] = out
        self.lists_loaded += 1
        if len(self._lists) > self.cache_lists:
            self._lists.popitem(last=False)
        return out

    def candidates(
        self,
        qids: np.ndarray,
        Q: np.ndarray,
        fetch_k: int,
        vec_filter: tuple[str, tuple] | None = None,
        exclude_vec_ids: np.ndarray | None = None,
    ) -> pa.Table:
        """ADC candidate generation: per query, probe ``nprobe``
        lists and score codes via per-query LUTs (``m`` gathers + a
        sum per vector — no float matmul over stored vectors).
        Returns (query_id, vec_id, acos) — the approximate sliver an
        exact rescorer refines. ``exclude_vec_ids`` drops a
        tombstoned set at serve time (same contract as
        :meth:`AnnIndex.topk`)."""
        excl = (
            np.unique(np.asarray(exclude_vec_ids, dtype=np.int64))
            if exclude_vec_ids is not None and len(exclude_vec_ids)
            else None
        )
        Qn = Q.astype(np.float64)
        Qn = Qn / np.linalg.norm(Qn, axis=1, keepdims=True)
        m, ks, dsub = self.books.shape
        # luts[q, j, c] = Qn[q, sub_j] · books[j, c]
        luts = np.einsum("qjd,jcd->qjc", Qn.reshape(len(Qn), m, dsub), self.books)
        probe = np.argsort(-(Qn @ self.Cn.T), axis=1)[:, : self.nprobe]
        jj = np.arange(m)
        out_q, out_v, out_a = [], [], []
        for qi in range(len(qids)):
            vid_parts, acos_parts = [], []
            for cid in probe[qi]:
                vids, codes, rnorm, meta = self._load_list(int(cid))
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
                adot = luts[qi][jj, codes[keep]].sum(axis=1)
                vid_parts.append(vids[keep])
                acos_parts.append(adot / rnorm[keep])
            if not vid_parts:
                continue
            vids = np.concatenate(vid_parts)
            acos = np.concatenate(acos_parts)
            take = np.lexsort((vids, -acos))[:fetch_k]
            out_q.append(np.full(take.size, qids[qi], dtype=np.int64))
            out_v.append(vids[take])
            out_a.append(acos[take])
        empty = np.empty(0, dtype=np.int64)
        return pa.table(
            {
                "query_id": pa.array(
                    np.concatenate(out_q) if out_q else empty, type=pa.int64()
                ),
                "vec_id": pa.array(
                    np.concatenate(out_v) if out_v else empty, type=pa.int64()
                ),
                "acos": pa.array(
                    np.concatenate(out_a) if out_a else empty.astype(np.float64),
                    type=pa.float64(),
                ),
            }
        )


class IvfPqCandidates:
    """Actor-pool stage: one :class:`IvfPqIndex` per actor; each batch
    of (query_id, embedding) rows yields its ADC candidate sliver."""

    def __init__(
        self,
        root: str,
        fetch_k: int,
        nprobe: int,
        cache_lists: int = 64,
        vec_filter: tuple[str, tuple] | None = None,
    ):
        self.idx = IvfPqIndex(root, nprobe=nprobe, cache_lists=cache_lists)
        self.fetch_k = fetch_k
        self.vec_filter = vec_filter

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids = batch["query_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        Q = np.stack(batch["embedding"].to_numpy(zero_copy_only=False)).astype(np.float64)
        return self.idx.candidates(qids, Q, self.fetch_k, vec_filter=self.vec_filter)


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
        if self.stats.get("kind") == "ivfpq":
            raise ValueError(f"{root}: IVF-PQ index (use IvfPqIndex)")
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
    if stats.get("kind") == "ivfpq":
        return _validate_ivfpq(root, stats)
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


def _validate_ivfpq(root: str, stats: dict) -> dict:
    """IVF-PQ variant of the validator: codebook shapes consistent
    with stats, Σ list rows == n_vectors, vec_ids globally unique,
    every stored code exactly ``pq_m`` bytes with ids < ``pq_ks``.
    (Routing can't be re-checked from codes alone — PQ is lossy — so
    the argmax invariant is enforced at build time by construction.)"""
    from ..state.fsio import glob_parquet, read_bytes

    Cn = np.asarray(json.loads(read_bytes(os.path.join(root, ANN_CENTROIDS))))
    books = np.asarray(json.loads(read_bytes(os.path.join(root, ANN_PQ_BOOKS))))
    if Cn.shape != (stats["n_centroids"], stats["dim"]):
        raise ValueError(
            f"centroids shape {Cn.shape} != ({stats['n_centroids']}, {stats['dim']})"
        )
    m, ks = int(stats["pq_m"]), int(stats["pq_ks"])
    if books.shape != (m, ks, stats["dim"] // m):
        raise ValueError(
            f"pq books shape {books.shape} != ({m}, {ks}, {stats['dim'] // m})"
        )
    total = 0
    seen: list[np.ndarray] = []
    for cid in range(stats["n_centroids"]):
        files = glob_parquet(os.path.join(root, "lists", f"cid={cid}"))
        if not files:
            continue
        t = pa.concat_tables([pq.read_table(f, columns=["vec_id", "pq_code"]) for f in files])
        total += t.num_rows
        seen.append(t["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64))
        for blob in t["pq_code"].to_pylist():
            if len(blob) != m:
                raise ValueError(f"cid={cid}: pq_code width {len(blob)} != pq_m {m}")
        codes = np.frombuffer(b"".join(t["pq_code"].to_pylist()), dtype=np.uint8)
        if codes.size and int(codes.max()) >= ks:
            raise ValueError(f"cid={cid}: code id {int(codes.max())} >= pq_ks {ks}")
    if total != stats["n_vectors"]:
        raise ValueError(f"list rows {total} != n_vectors {stats['n_vectors']}")
    allv = np.concatenate(seen) if seen else np.empty(0, dtype=np.int64)
    if allv.size != np.unique(allv).size:
        raise ValueError("duplicate vec_id across lists")
    return {
        "ok": True,
        "kind": "ivfpq",
        "n_vectors": int(total),
        "n_centroids": int(stats["n_centroids"]),
        "dim": int(stats["dim"]),
        "pq_m": m,
        "pq_ks": ks,
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


def _ensure_ivfpq_index(sf_dir: str, n_centroids: int) -> str:
    """Build-once cache of the IVF-PQ gate index for an sf_dir."""
    import hashlib

    key = hashlib.sha256(f"{sf_dir}:{n_centroids}:ivfpq-v1".encode()).hexdigest()[:12]
    root = f"/tmp/docinsight_ray_ann/{key}"
    from ..state.fsio import read_bytes

    if read_bytes(os.path.join(root, ANN_STATS)) is None:
        ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
        build_ivfpq_index(ds, root, n_centroids=n_centroids)
    return root


def ivfpq_search(
    sf_dir: str,
    root: str,
    nprobe: int,
    fetch_k: int,
    vec_filter: tuple[str, tuple] | None = None,
) -> pa.Table:
    """Serve the gate query set through the IVF-PQ index: ADC
    candidates from an :class:`IvfPqCandidates` actor pool, then the
    shared exact rescorer (pushdown hydration of the sliver only)."""
    from docinsight_ray.functions.knn import _exact_rescore, _query_matrix

    qids, Q = _query_matrix(sf_dir)
    qds = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    ).filter(expr=f"vec_id < {len(qids)}").map_batches(
        lambda b: pa.table({"query_id": b["vec_id"], "embedding": b["embedding"]}),
        batch_format="pyarrow",
    )
    cands = (
        qds.map_batches(
            IvfPqCandidates,
            fn_constructor_args=(root, fetch_k, nprobe),
            fn_constructor_kwargs={"vec_filter": vec_filter},
            batch_format="pyarrow",
            batch_size=256,
            concurrency=2,
        )
        .to_pandas()
    )
    return _exact_rescore(sf_dir, cands, qids, Q)


def q_ann_ivfpq_topk(sf_dir: str, n_centroids: int = 8) -> pa.Table:
    """Persisted IVF-PQ cosine top-10 served EXHAUSTIVELY (nprobe =
    n_centroids, fetch_k = n_vectors): probing every list with no
    candidate cut makes the exact rescore see the full corpus, so the
    gate carries the same full SQL oracle as ``ann_ivf_topk`` — it
    proves the code-list lifecycle (train → encode → partitioned
    write → lazy loads → ADC serving → rescore hydration) loses no
    vector. The PRUNED configuration (nprobe < n_centroids, small
    fetch_k) is the same code path; its recall is measured in
    RECALL.json and floored in pytest (test_ann.py)."""
    root = _ensure_ivfpq_index(sf_dir, n_centroids)
    from ..state.fsio import read_bytes

    stats = json.loads(read_bytes(os.path.join(root, ANN_STATS)))
    return ivfpq_search(sf_dir, root, nprobe=n_centroids, fetch_k=int(stats["n_vectors"]))


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


ORACLE_SQL = {
    "ann_ivf_topk": _ann_sql(),
    "ann_ivf_filtered": _ann_filtered_sql(),
    "ann_ivfpq_topk": _ann_sql(),
}
QUERIES = {
    "ann_ivf_topk": q_ann_ivf_topk,
    "ann_ivf_filtered": q_ann_ivf_filtered,
    "ann_ivfpq_topk": q_ann_ivfpq_topk,
}
