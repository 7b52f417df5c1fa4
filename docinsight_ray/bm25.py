"""The BM25 scoring contract (k1=1.2, b=0.75 per the north rule).

These two functions ARE the rank-identity contract: build (block-max
metadata), scorer (TAAT and block-max WAND) and the exhaustive oracle
all compute per-term contributions through the same float64
expressions, and accumulate per-document scores in sorted-term order —
so scores are bitwise identical across execution strategies and
parallelism levels (SURVEY.md §7.4).

    idf(t)     = ln(1 + (N - df + 0.5) / (df + 0.5))
    w(tf, dl)  = tf / (tf + k1 * (1 - b + b * dl / avgdl))
    score(q,d) = Σ_{t ∈ sorted(set(tokens(q))), t ∈ d} idf(t) * (k1+1) * w

Query terms contribute once each (set semantics, sorted order fixed).
Ties in top-k are broken by ascending doc_id.
"""

from __future__ import annotations

import numpy as np


def idf(df, n_docs: int):
    return np.log(1.0 + (n_docs - np.asarray(df, dtype=np.float64) + 0.5) / (np.asarray(df, dtype=np.float64) + 0.5))


def tf_sat_weight(tfs, doc_lens, avgdl: float, k1: float, b: float) -> np.ndarray:
    tf = np.asarray(tfs, dtype=np.float64)
    dl = np.asarray(doc_lens, dtype=np.float64)
    return tf / (tf + k1 * (1.0 - b + b * dl / avgdl))


def topk_order(doc_ids: np.ndarray, scores: np.ndarray, k: int) -> np.ndarray:
    """Indices of the top-k by (score desc, doc_id asc) — the global
    tie-break rule (reference analogue: fused-score sort,
    /root/reference/scoring/core.py:92 + retrieval dedup sort
    /root/reference/retrieval/retrieval.py:106-110)."""
    order = np.lexsort((doc_ids, -scores))
    return order[: int(k)]
