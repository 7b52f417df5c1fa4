"""Distributed unigram-LM (SentencePiece-style) tokenizer training.

The OTHER major subword algorithm next to BPE (Kudo 2018, "Subword
Regularization": the unigram language model tokenizer used by
T5/Llama-family vocabularies) — completing the tokenizer-training
suite in ``functions/bpe.py``. Neither exists in the reference
(DocInsight retrieves; it does not train tokenizers).

Scale shape (same contract as BPE):

- **ONE corpus pass** — the shared ``word_histogram`` partial-count
  pass (vocabulary-bounded per-batch partials, driver combine).
- **Training runs on the histogram only**: seed-substring scoring, the
  hard-EM (Viterbi-count) iterations and the prune-to-target step are
  pure functions of the ``(word, count)`` table, so the trainer never
  touches the corpus again.
- **Encoding is an actor pool**: the learned ``(piece → logprob)``
  table ships once per actor via ``ray.put``; each actor memoizes the
  Viterbi segmentation per distinct word (Zipf head → dict hit).

Determinism contract: every selection is ordered — seed pieces by
(score desc, piece asc), pruning by (count desc, piece asc), and the
Viterbi DP breaks float ties by (longer piece, then lexicographically
smaller piece) — so two runs (and two cluster sizes) produce identical
vocabularies and segmentations. Training is the standard PRACTICAL
simplification: hard EM (Viterbi counts, the argmax limit of full EM)
with a single prune straight to the target size, documented here so
the gate artifact is reproducible from this file alone.

Gates are rows-only by design (iterative EM is not SQL-expressible);
tests/test_unigram.py proves Viterbi optimality against a brute-force
segmentation search, lossless round-trips, determinism, and that the
learned vocabulary compresses below the character baseline.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..collect import collect_table
from .bpe import word_histogram

SEED_SIZE = 2000       # candidate pieces after seed scoring
TARGET_VOCAB = 300     # pieces kept after the prune (plus single chars)
MAX_PIECE_LEN = 6
N_EM = 2               # hard-EM iterations before and after the prune
UNK_LOGP = -23.0       # floor logprob for never-seen single chars


# ---- trainer (driver-side, histogram-only) ---------------------------------


def _seed_pieces(hist: pd.DataFrame) -> dict[str, int]:
    """Candidate substring scores: freq[s] = Σ_word count(word) ×
    occurrences(s, word) for every substring up to MAX_PIECE_LEN."""
    freq: dict[str, int] = {}
    for word, cnt in zip(hist["word"], hist["count"]):
        n = len(word)
        c = int(cnt)
        for i in range(n):
            for j in range(i + 1, min(i + MAX_PIECE_LEN, n) + 1):
                s = word[i:j]
                freq[s] = freq.get(s, 0) + c
    return freq


def viterbi(word: str, logp: dict[str, float]) -> list[str]:
    """Best segmentation of ``word`` under piece log-probs: maximize
    Σ logp(piece); single chars absent from the vocab cost UNK_LOGP
    (full coverage by construction). Float ties break deterministically
    toward the LONGER last piece, then the lexicographically smaller
    one."""
    n = len(word)
    best = np.full(n + 1, -np.inf)
    best[0] = 0.0
    back: list[tuple[int, str] | None] = [None] * (n + 1)
    for j in range(1, n + 1):
        for i in range(max(0, j - MAX_PIECE_LEN), j):
            piece = word[i:j]
            lp = logp.get(piece)
            if lp is None:
                if j - i > 1:
                    continue
                lp = UNK_LOGP
            cand = best[i] + lp
            prev = back[j]
            if (
                cand > best[j]
                or (
                    cand == best[j]
                    and prev is not None
                    and (len(piece) > len(prev[1])
                         or (len(piece) == len(prev[1]) and piece < prev[1]))
                )
            ):
                best[j] = cand
                back[j] = (i, piece)
    out: list[str] = []
    j = n
    while j > 0:
        i, piece = back[j]  # type: ignore[misc]
        out.append(piece)
        j = i
    out.reverse()
    return out


def _em_counts(hist: pd.DataFrame, logp: dict[str, float]) -> dict[str, int]:
    """Hard-EM E-step: Viterbi-count every distinct word, weighted by
    its corpus count."""
    counts: dict[str, int] = {}
    for word, cnt in zip(hist["word"], hist["count"]):
        for piece in viterbi(word, logp):
            counts[piece] = counts.get(piece, 0) + int(cnt)
    return counts


def _normalize(counts: dict[str, int]) -> dict[str, float]:
    total = float(sum(counts.values()))
    return {p: math.log(c / total) for p, c in counts.items() if c > 0}


def train_unigram(hist: pd.DataFrame) -> list[tuple[str, float]]:
    """Seed → hard-EM ×N → prune to TARGET_VOCAB (single chars always
    kept for coverage) → hard-EM ×N. Returns ``(piece, logprob)``
    sorted by (logprob desc, piece asc)."""
    chars = sorted({ch for w in hist["word"] for ch in w})
    seed = _seed_pieces(hist)
    keep = sorted(seed.items(), key=lambda kv: (-kv[1], kv[0]))[:SEED_SIZE]
    counts = dict(keep)
    for ch in chars:
        counts.setdefault(ch, seed.get(ch, 1))
    logp = _normalize(counts)
    for _ in range(N_EM):
        counts = _em_counts(hist, logp)
        for ch in chars:          # coverage floor survives zero counts
            counts.setdefault(ch, 1)
        logp = _normalize(counts)
    # prune: multi-char pieces ranked by Viterbi usage
    multi = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[:TARGET_VOCAB]
    counts = dict(multi)
    for ch in chars:
        counts.setdefault(ch, 1)
    logp = _normalize(counts)
    for _ in range(N_EM):
        counts = _em_counts(hist, logp)
        for ch in chars:
            counts.setdefault(ch, 1)
        logp = _normalize(counts)
    return sorted(logp.items(), key=lambda kv: (-kv[1], kv[0]))


# ---- encoding (actor pool) --------------------------------------------------


class UnigramEncoder:
    """map_batches actor: Viterbi-encode every document under the
    learned piece table (ray.put once per pool), memoizing per distinct
    word. Emits (doc_id, n_words, unigram_tokens)."""

    def __init__(self, vocab_ref):
        v = ray.get(vocab_ref) if isinstance(vocab_ref, ray.ObjectRef) else vocab_ref
        self._logp = dict(v)
        self._memo: dict[str, int] = {}
        self.__name__ = "UnigramEncoder"

    def _n_pieces(self, word: str) -> int:
        n = self._memo.get(word)
        if n is None:
            n = len(viterbi(word, self._logp))
            if len(self._memo) > 2_000_000:
                self._memo.clear()
            self._memo[word] = n
        return n

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .bpe import _split_words

        flat, parents = _split_words(batch["text"])
        n = batch.num_rows
        n_words = np.zeros(n, dtype=np.int64)
        n_tok = np.zeros(n, dtype=np.int64)
        par = parents.to_numpy(zero_copy_only=False)
        for w, p in zip(flat.to_pylist(), par):
            n_words[p] += 1
            n_tok[p] += self._n_pieces(w)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_words": pa.array(n_words, type=pa.int64()),
                "unigram_tokens": pa.array(n_tok, type=pa.int64()),
            }
        )


# ---- gates ------------------------------------------------------------------

_VOCAB_CACHE: dict[str, list[tuple[str, float]]] = {}


def _vocab_for(sf_dir: str) -> list[tuple[str, float]]:
    if sf_dir not in _VOCAB_CACHE:
        _VOCAB_CACHE[sf_dir] = train_unigram(word_histogram(sf_dir))
    return _VOCAB_CACHE[sf_dir]


def q_unigram_vocab(sf_dir: str) -> pa.Table:
    """Learned piece table: (rank, piece, logprob_micro) — the integer
    micro rendering keeps the artifact hash-stable across engines."""
    vocab = _vocab_for(sf_dir)
    return pa.table(
        {
            "rank": pa.array(np.arange(len(vocab), dtype=np.int64)),
            "piece": pa.array([p for p, _ in vocab], type=pa.string()),
            "logprob_micro": pa.array(
                [int(round(lp * 1e6)) for _, lp in vocab], type=pa.int64()
            ),
        }
    )


def q_unigram_token_count(sf_dir: str) -> pa.Table:
    """Per-document token count under the learned unigram vocabulary —
    the mixture-sizing pass, unigram edition."""
    vocab_ref = ray.put(_vocab_for(sf_dir))
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).map_batches(
        UnigramEncoder,
        fn_constructor_args=(vocab_ref,),
        concurrency=2,
        batch_format="pyarrow",
    )
    empty = pa.schema(
        [("doc_id", pa.int64()), ("n_words", pa.int64()), ("unigram_tokens", pa.int64())]
    )
    return collect_table(ds, empty).sort_by([("doc_id", "ascending")])


QUERIES = {
    "unigram_vocab": q_unigram_vocab,
    "unigram_token_count": q_unigram_token_count,
}

# iterative EM is not SQL-expressible → rows-only gates; correctness is
# pytest-proven in tests/test_unigram.py
ORACLE_SQL: dict[str, str] = {}
