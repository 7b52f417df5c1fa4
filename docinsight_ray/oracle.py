"""Exhaustive oracle BM25 scorer (trusted, slow, driver-side).

The test-time ground truth for rank-identity (SURVEY.md §5.2 item 2):
scores every document containing any query term by brute force over an
in-memory (term → [(doc_id, tf)]) dict built straight from the corpus
table with the same tokenizer — it never touches SPIMI fragments, the
merge shuffle, the varbyte codec, block-max metadata or WAND, so a bug
in any of those shows up as a mismatch. Plays the role the reference's
exhaustive numpy fallback plays for FAISS
(/root/reference/index/fallback_index.py:124-164,
enhanced_pipeline.py:307-322).
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np
import pyarrow as pa

from .bm25 import idf, tf_sat_weight, topk_order
from .config import EngineConfig
from .ids import doc_id_from_key
from .tokenizer import tokenize_text


class OracleIndex:
    def __init__(self, corpus: pa.Table, cfg: EngineConfig | None = None):
        self.cfg = cfg or EngineConfig()
        cfg = self.cfg
        contents = corpus["content"].to_pylist()
        if cfg.doc_id_mode == "column":
            doc_ids = corpus["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        else:
            doc_ids = doc_id_from_key(
                corpus["repo"].to_pylist(), corpus["path"].to_pylist(), corpus["commit"].to_pylist()
            )
        # exact dedup, keep-first by min doc_id (same rule as the build)
        if cfg.dedup:
            seen: dict[str, int] = {}
            for i, c in enumerate(contents):
                j = seen.get(c)
                if j is None or doc_ids[i] < doc_ids[j]:
                    seen[c] = i
            keep = sorted(seen.values())
            contents = [contents[i] for i in keep]
            doc_ids = doc_ids[keep]
        order = np.argsort(doc_ids, kind="stable")
        doc_ids = doc_ids[order]
        contents = [contents[i] for i in order]

        self.postings: dict[str, list[tuple[int, int]]] = defaultdict(list)
        self.doc_len: dict[int, int] = {}
        for did, text in zip(doc_ids.tolist(), contents):
            toks = tokenize_text(text, cfg)
            self.doc_len[did] = len(toks)
            counts: dict[str, int] = {}
            for t in toks:
                counts[t] = counts.get(t, 0) + 1
            for t, tf in counts.items():
                self.postings[t].append((did, tf))
        self.n_docs = len(self.doc_len)
        self.avgdl = (sum(self.doc_len.values()) / self.n_docs) if self.n_docs else 1.0

    def score(self, text: str, k: int = 10) -> tuple[np.ndarray, np.ndarray]:
        cfg = self.cfg
        acc: dict[int, float] = {}
        for term in sorted({t for t in tokenize_text(text, cfg) if t in self.postings}):
            plist = self.postings[term]
            term_idf = float(idf(len(plist), self.n_docs))
            for did, tf in plist:
                w = float(tf_sat_weight(tf, self.doc_len[did], self.avgdl, cfg.k1, cfg.b))
                acc[did] = acc.get(did, 0.0) + term_idf * (cfg.k1 + 1.0) * w
        if not acc:
            return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.float64)
        docs = np.fromiter(acc.keys(), dtype=np.uint64)
        scores = np.fromiter(acc.values(), dtype=np.float64)
        sel = topk_order(docs, scores, k)
        return docs[sel], scores[sel]

    def score_bm25plus(self, text: str, k: int = 10) -> tuple[np.ndarray, np.ndarray]:
        """Brute-force BM25+ (Lv & Zhai 2011): the plain BM25
        contribution plus a per-matched-term idf·delta floor, in the
        same float64 op order as scorer.score_bm25plus (contribution
        computed first, then the floor added, then accumulated in
        sorted-term order)."""
        cfg = self.cfg
        delta = float(cfg.delta)
        acc: dict[int, float] = {}
        for term in sorted({t for t in tokenize_text(text, cfg) if t in self.postings}):
            plist = self.postings[term]
            term_idf = float(idf(len(plist), self.n_docs))
            floor = term_idf * delta
            for did, tf in plist:
                w = float(tf_sat_weight(tf, self.doc_len[did], self.avgdl, cfg.k1, cfg.b))
                acc[did] = acc.get(did, 0.0) + (term_idf * (cfg.k1 + 1.0) * w + floor)
        if not acc:
            return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.float64)
        docs = np.fromiter(acc.keys(), dtype=np.uint64)
        scores = np.fromiter(acc.values(), dtype=np.float64)
        sel = topk_order(docs, scores, k)
        return docs[sel], scores[sel]

    def score_lmdir(self, text: str, k: int = 10) -> tuple[np.ndarray, np.ndarray]:
        """Brute-force LM Dirichlet query likelihood (the sparse
        rewrite scorer.score_lmdir implements); candidates are docs
        matching >=1 indexed query term, accumulation runs in
        sorted-term order — the same determinism contract as BM25."""
        cfg = self.cfg
        mu = float(cfg.mu)
        total_len = float(sum(self.doc_len.values()))
        terms = sorted({t for t in tokenize_text(text, cfg) if t in self.postings})
        acc: dict[int, float] = {}
        for term in terms:
            plist = self.postings[term]
            ctf = float(sum(tf for _, tf in plist))
            for did, tf in plist:
                acc[did] = acc.get(did, 0.0) + float(
                    np.log(1.0 + np.float64(tf) / (mu * (ctf / total_len)))
                )
        if not acc:
            return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.float64)
        docs = np.fromiter(acc.keys(), dtype=np.uint64)
        scores = np.fromiter(acc.values(), dtype=np.float64)
        dl = np.array([self.doc_len[int(d)] for d in docs], dtype=np.float64)
        scores = scores + len(terms) * np.log(mu / (dl + mu))
        sel = topk_order(docs, scores, k)
        return docs[sel], scores[sel]

    def results_table(self, queries: list[tuple[int, str, int]]) -> pa.Table:
        qids, ranks, docs, scores = [], [], [], []
        for qid, text, k in queries:
            d, s = self.score(text, k)
            qids += [qid] * d.size
            ranks += list(range(d.size))
            docs += d.tolist()
            scores += s.tolist()
        return pa.table(
            {
                "query_id": pa.array(qids, type=pa.int64()),
                "rank": pa.array(ranks, type=pa.uint32()),
                "doc_id": pa.array(docs, type=pa.uint64()),
                "score": pa.array(scores, type=pa.float64()),
            }
        )
