"""BM25 query scoring: stateful actor-pool stage.

The Ray-Data-native replacement for the reference's per-process
singleton search engine (SBERT + FAISS loaded once,
/root/reference/enhanced_pipeline.py:214-362, index/index_manager.py:203-286):
``BM25Scorer`` is a callable CLASS passed to ``map_batches`` — index
partitions, corpus stats and doc lengths are loaded ONCE per actor in
``__init__``; ``__call__`` scores a whole Arrow batch of queries.

Three execution strategies, all proven rank-identical (docs AND
bitwise scores) by tests:

- ``taat`` — exact term-at-a-time: vectorized numpy accumulation over
  the decoded postings of the query's terms (the exhaustive baseline;
  analogue of the reference's fallback scorer,
  /root/reference/index/fallback_index.py:124-164).
- ``maxscore`` — vectorized MaxScore dynamic pruning: high-UB (rare)
  lists generate candidates, low-UB (hot) lists are only probed — the
  default serving mode (~2x TAAT at Zipfian skew, more at scale).
- ``bmw`` — block-max WAND document-at-a-time with skip pointers and
  per-block upper bounds (the classic 10^12-scale skipping algorithm,
  kept as the per-posting-block pruning demonstration; its Python
  cursor loop makes it the slowest mode at this index size).

Scale note: a single actor here holds the whole (test-sized) index.
On a real cluster each actor would load an assigned subset of term
partitions (same parquet layout, `bucket` column = shard key) and a
``groupby(query_id).map_groups(merge_topk)`` stage would combine
per-shard candidates — SURVEY.md §2.6 T1.
"""

from __future__ import annotations

import glob
import heapq
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .bm25 import idf as idf_fn
from .bm25 import tf_sat_weight, topk_order
from .codec import decode_posting
from .config import EngineConfig
from .tokenizer import tokenize_text

RESULTS_SCHEMA = pa.schema(
    [
        ("query_id", pa.int64()),
        ("rank", pa.uint32()),
        ("doc_id", pa.uint64()),
        ("score", pa.float64()),
    ]
)


class BM25Scorer:
    def __init__(self, index_dir: str, cfg: EngineConfig | None = None, mode: str = "taat"):
        self.cfg = cfg or EngineConfig()
        self.mode = mode
        with open(os.path.join(index_dir, "corpus_stats.json")) as f:
            stats = json.load(f)
        self.n_docs = int(stats["n_docs"])
        self.avgdl = float(stats["avgdl"])

        # doc lengths (narrow columns only)
        docs = pq.ParquetDataset(os.path.join(index_dir, "docs")).read(columns=["doc_id", "doc_len"])
        did = docs["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        dl = docs["doc_len"].to_numpy(zero_copy_only=False).astype(np.uint32)
        order = np.argsort(did, kind="stable")
        self._dl_docid = did[order]
        self._dl = dl[order]

        # postings partitions
        files = sorted(glob.glob(os.path.join(index_dir, "parts", "**", "*.parquet"), recursive=True))
        if not files:
            raise FileNotFoundError(f"no postings partitions under {index_dir}/parts")
        tbl = pa.concat_tables([pq.read_table(f) for f in files])
        self._terms: dict[str, int] = {t: i for i, t in enumerate(tbl["term"].to_pylist())}
        self._df = tbl["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        # doc-sharded serving: idf must use corpus-wide df, which the
        # shard build distributes as global_df.parquet (pipelines/sharded.py).
        # Kept separate from self._df — the local df is the posting-list
        # length (decode count); only idf uses the global one.
        self._idf_df = self._df
        gdf_path = os.path.join(index_dir, "global_df.parquet")
        if os.path.exists(gdf_path):
            g = pq.read_table(gdf_path)
            gmap = dict(zip(g["term"].to_pylist(), g["df"].to_pylist()))
            self._idf_df = self._df.copy()
            for t, i in self._terms.items():
                self._idf_df[i] = int(gmap.get(t, self._df[i]))
        self._doc_vb = tbl["doc_ids_vb"].to_pylist()
        self._tf_vb = tbl["tfs_vb"].to_pylist()
        self._bmax = tbl["block_max_w"].to_pylist()
        self._blast = tbl["block_last_doc"].to_pylist()
        from collections import OrderedDict

        self.cache_terms = 512
        self._cache: OrderedDict[str, tuple[np.ndarray, np.ndarray]] = OrderedDict()

    # ---- shared helpers -------------------------------------------------

    def _doc_len_of(self, doc_ids: np.ndarray) -> np.ndarray:
        pos = np.searchsorted(self._dl_docid, doc_ids)
        return self._dl[pos]

    def _term_arrays(self, term: str):
        """Decode one term's postings → (doc_ids, contribs float64).

        LRU-cached per actor: a term's contribution vector depends only
        on the term (idf, tfs, doc lens, avgdl are all fixed at build),
        so hot terms — which recur in most queries — decode once per
        actor instead of once per query. Bounded by cache_terms entries
        (a hot list at n_docs postings is 16 B/posting decoded)."""
        cached = self._cache.get(term)
        if cached is not None:
            self._cache.move_to_end(term)
            return cached
        i = self._terms[term]
        df = int(self._df[i])  # local posting length (decode count)
        doc_ids, tfs = decode_posting(self._doc_vb[i], self._tf_vb[i], df)
        w = tf_sat_weight(tfs, self._doc_len_of(doc_ids), self.avgdl, self.cfg.k1, self.cfg.b)
        contrib = (idf_fn(int(self._idf_df[i]), self.n_docs) * (self.cfg.k1 + 1.0)) * w
        # block upper bounds for WAND, derived from the live contribution
        # vector (correct by construction even when global stats differ
        # from shard-build stats — pipelines/sharded.py; the stored
        # block_max_w is the no-decode scale path and is validated by
        # tests + `cli validate`)
        bs = self.cfg.block_size
        starts = np.arange(0, doc_ids.size, bs)
        block_ub = np.maximum.reduceat(contrib, starts) if doc_ids.size else np.empty(0)
        blast = doc_ids[np.minimum(starts + bs, doc_ids.size) - 1] if doc_ids.size else doc_ids
        entry = (doc_ids, contrib, block_ub, blast)
        self._cache[term] = entry
        if len(self._cache) > self.cache_terms:
            self._cache.popitem(last=False)
        return entry

    def query_terms(self, text: str) -> list[str]:
        return sorted({t for t in tokenize_text(text, self.cfg) if t in self._terms})

    # ---- exact TAAT -----------------------------------------------------

    def score_taat(self, text: str, k: int) -> tuple[np.ndarray, np.ndarray]:
        terms = self.query_terms(text)
        if not terms:
            return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.float64)
        per_term = [self._term_arrays(t)[:2] for t in terms]
        cand = np.unique(np.concatenate([d for d, _ in per_term]))
        acc = np.zeros(cand.size, dtype=np.float64)
        for d, c in per_term:  # sorted-term order → deterministic float sums
            acc[np.searchsorted(cand, d)] += c
        sel = topk_order(cand, acc, k)
        return cand[sel], acc[sel]

    # ---- MaxScore (vectorized dynamic pruning) --------------------------

    def score_maxscore(self, text: str, k: int) -> tuple[np.ndarray, np.ndarray]:
        """Exact MaxScore-style pruning, batch-vectorized.

        Lists ordered by upper bound (max contribution) descending are
        opened as candidate *generators* one at a time; after each
        round every candidate is fully scored (accumulating in sorted-
        term order — the determinism contract) and θ = current k-th
        best. A doc outside the opened lists can score at most the sum
        of the remaining lists' upper bounds, so once that falls
        STRICTLY below θ no unopened list needs to generate candidates
        — its postings are only probed via searchsorted for docs
        already in the candidate set. For rare∧hot queries the hot
        (low-idf ⇒ low-UB) lists are therefore never scanned, which is
        the practical pruning win at Zipfian skew. Strict `<` keeps
        doc_id-ascending tie-breaks exact (an unopened doc could tie θ
        with a smaller doc_id and deserve the slot)."""
        terms = self.query_terms(text)
        if not terms:
            return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.float64)
        k = int(k)
        arrays = {t: self._term_arrays(t) for t in terms}  # sorted-term order
        ubs = {t: (float(arrays[t][1].max()) if arrays[t][1].size else 0.0) for t in terms}
        by_ub = sorted(terms, key=lambda t: (-ubs[t], t))
        # rem_ub[i] = max possible score using only lists i+1..m
        rem = np.cumsum([ubs[t] for t in by_ub][::-1])[::-1]

        def score_full(cands: np.ndarray) -> np.ndarray:
            acc = np.zeros(cands.size, dtype=np.float64)
            for t in terms:  # alphabetical — bitwise-identical to TAAT/oracle
                docs_t, contrib_t = arrays[t][0], arrays[t][1]
                pos = np.searchsorted(docs_t, cands)
                pos_c = np.minimum(pos, docs_t.size - 1)
                hit = docs_t[pos_c] == cands
                acc[hit] += contrib_t[pos_c[hit]]
            return acc

        cands = np.empty(0, dtype=np.uint64)
        scores = np.empty(0, dtype=np.float64)
        for i, t in enumerate(by_ub):
            new = np.setdiff1d(arrays[t][0], cands, assume_unique=False)
            if new.size:
                cands = np.concatenate([cands, new])
                scores = np.concatenate([scores, score_full(new)])
            if cands.size >= k:
                theta = np.partition(scores, -k)[-k]
                if i + 1 < len(by_ub) and rem[i + 1] < theta:
                    break  # unopened lists cannot produce a winner
        sel = topk_order(cands, scores, k)
        return cands[sel], scores[sel]

    # ---- block-max WAND -------------------------------------------------

    def score_bmw(self, text: str, k: int) -> tuple[np.ndarray, np.ndarray]:
        terms = self.query_terms(text)
        if not terms:
            return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.float64)
        k = int(k)
        lists = []
        for t in terms:
            doc_ids, contrib, block_ub, blast = self._term_arrays(t)
            lists.append(
                {
                    "order": len(lists),  # term-sorted position (score-sum order)
                    "docs": doc_ids,
                    "contrib": contrib,
                    "pos": 0,
                    "n": doc_ids.size,
                    "ub": float(block_ub.max()),
                    "block_ub": block_ub,
                    "blast": blast,
                }
            )
        heap: list[tuple[float, int]] = []  # (score, -doc_id) min-heap

        def theta() -> float:
            return heap[0][0] if len(heap) >= k else -np.inf

        live = [l for l in lists if l["n"] > 0]
        while live:
            live.sort(key=lambda l: int(l["docs"][l["pos"]]))
            th = theta()
            # pivot: first prefix whose Σ global-UB can beat θ
            ub_sum, pivot_idx = 0.0, -1
            for j, l in enumerate(live):
                ub_sum += l["ub"]
                if ub_sum > th:
                    pivot_idx = j
                    break
            if pivot_idx < 0:
                break  # nothing can beat θ → done
            pivot_doc = int(live[pivot_idx]["docs"][live[pivot_idx]["pos"]])
            # extend pivot group to every list currently at pivot_doc
            while (
                pivot_idx + 1 < len(live)
                and int(live[pivot_idx + 1]["docs"][live[pivot_idx + 1]["pos"]]) == pivot_doc
            ):
                pivot_idx += 1
            first_doc = int(live[0]["docs"][live[0]["pos"]])
            if first_doc == pivot_doc:
                # shallow (block-max) check over the pivot group.
                # All doc_id arithmetic in exact ints — float conversion of
                # 64-bit hash doc_ids loses low bits and breaks skipping.
                block_sum = 0.0
                next_boundary: int | None = None
                for l in live[: pivot_idx + 1]:
                    bi = int(np.searchsorted(l["blast"], np.uint64(pivot_doc), side="left"))
                    block_sum += float(l["block_ub"][bi])
                    blast_i = int(l["blast"][bi])
                    next_boundary = blast_i if next_boundary is None else min(next_boundary, blast_i)
                if block_sum <= th and len(heap) >= k:
                    # the aligned block region can't beat θ → skip past it,
                    # but never past the next list's current doc (docs in
                    # between may score together with lists outside the
                    # pivot group)
                    skip_to = next_boundary + 1
                    if pivot_idx + 1 < len(live):
                        nxt = int(live[pivot_idx + 1]["docs"][live[pivot_idx + 1]["pos"]])
                        skip_to = min(skip_to, nxt)
                    for l in live[: pivot_idx + 1]:
                        l["pos"] = int(np.searchsorted(l["docs"], np.uint64(skip_to)))
                else:
                    # full evaluation — accumulate in term-sorted order
                    group = sorted(live[: pivot_idx + 1], key=lambda l: l["order"])
                    score = 0.0
                    for l in group:
                        score += float(l["contrib"][l["pos"]])
                    # tie-break: among equal scores the LARGEST doc_id is
                    # the worst (exact int comparison — no float doc_ids)
                    if len(heap) < k:
                        heapq.heappush(heap, (score, -pivot_doc))
                    elif score > heap[0][0]:
                        heapq.heapreplace(heap, (score, -pivot_doc))
                    for l in live[: pivot_idx + 1]:
                        l["pos"] += 1
            else:
                # advance lists before the pivot up to pivot_doc (galloping)
                for l in live[:pivot_idx]:
                    if int(l["docs"][l["pos"]]) < pivot_doc:
                        l["pos"] = int(np.searchsorted(l["docs"], np.uint64(pivot_doc)))
            live = [l for l in live if l["pos"] < l["n"]]

        if not heap:
            return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.float64)
        docs = np.array([-h[1] for h in heap], dtype=np.uint64)
        scores = np.array([h[0] for h in heap], dtype=np.float64)
        sel = topk_order(docs, scores, k)
        return docs[sel], scores[sel]

    # ---- map_batches entry ---------------------------------------------

    def __call__(self, batch: pa.Table) -> pa.Table:
        score = {
            "bmw": self.score_bmw,
            "maxscore": self.score_maxscore,
        }.get(self.mode, self.score_taat)
        qids, ranks, docs, scores = [], [], [], []
        ks = batch["k"].to_pylist() if "k" in batch.column_names else [10] * batch.num_rows
        for qid, text, k in zip(batch["query_id"].to_pylist(), batch["text"].to_pylist(), ks):
            d, s = score(text, int(k))
            qids.append(np.full(d.size, qid, dtype=np.int64))
            ranks.append(np.arange(d.size, dtype=np.uint32))
            docs.append(d)
            scores.append(s)
        if not qids:
            return RESULTS_SCHEMA.empty_table()
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(qids), type=pa.int64()),
                "rank": pa.array(np.concatenate(ranks), type=pa.uint32()),
                "doc_id": pa.array(np.concatenate(docs), type=pa.uint64()),
                "score": pa.array(np.concatenate(scores), type=pa.float64()),
            }
        )


def query_index(
    queries,
    index_dir: str,
    cfg: EngineConfig | None = None,
    mode: str = "taat",
    concurrency: int | None = None,
):
    """queries Dataset (query_id, text, k) → results Dataset via the
    scorer actor pool."""
    cfg = cfg or EngineConfig()
    return queries.map_batches(
        BM25Scorer,
        fn_constructor_args=(index_dir, cfg, mode),
        batch_format="pyarrow",
        batch_size=cfg.query_batch_size,
        concurrency=concurrency or cfg.scorer_concurrency,
        num_cpus=1,
    )
