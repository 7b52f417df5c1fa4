"""Distributed byte-pair-encoding (BPE) vocabulary training + encoding.

The tokenizer-training pass an LLM data pipeline runs after cleaning:
learn subword merges from corpus statistics, then encode every document
with the learned vocabulary. Neither exists in the reference
(DocInsight retrieves, it does not train tokenizers); this extends the
training-corpus suite in ``functions/corpusops.py``.

Scale shape (the part that must hold at 100 TB):

- **Word histogram is the ONLY full-corpus pass.** ``map_batches``
  emits per-batch partial ``(word, count)`` tables (bounded by the
  batch vocabulary, not the batch token count); the partials — a
  vocabulary-sized table, orders of magnitude smaller than the corpus —
  are combined driver-side exactly like the df sidecars in
  ``build.py``. At real scale the combine would be one small
  ``groupby(word).sum`` and a ``min_count`` threshold caps the
  histogram the trainer sees.
- **Training runs on the histogram only** (Sennrich et al. 2016,
  "Neural Machine Translation of Rare Words with Subword Units": BPE
  merge statistics are a pure function of the word-frequency table).
  The trainer is incremental — pair counts and pair→word inverted
  membership are maintained across merges, so each merge touches only
  the words containing the merged pair, never the whole vocabulary.
- **Encoding is embarrassingly parallel**: learned ranks are
  ``ray.put`` once and read per actor; each actor memoizes the
  segmentation of every distinct word it has seen, so per-document
  cost collapses to a dict lookup for the Zipf-heavy head.

Both gates are rows-only by design (iterative merge selection is not
SQL-expressible); correctness is pytest-proven in
``tests/test_bpe.py``: the incremental trainer is equal to a
from-scratch recount reference, greedy rank-ordered encoding reproduces
the trainer's own segmentation for every trained word, and encode is a
lossless round-trip.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..collect import collect_table

EOW = "</w>"  # end-of-word sentinel symbol (no [a-z0-9] char collision)

NUM_MERGES = 200
MIN_PAIR_COUNT = 2


# ---- word histogram (the one corpus pass) ---------------------------------


def _split_words(text: pa.ChunkedArray | pa.Array) -> tuple[pa.Array, pa.Array]:
    """Vectorized tokenization: lowercase → split on non-[a-z0-9] runs.
    Returns ``(flat_words, parent_row_indices)`` with boundary empties
    removed (split-based equivalent of ``findall(_WORD_RE)``)."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()  # chunk-local parent indices otherwise
    lists = pc.split_pattern_regex(pc.utf8_lower(text), "[^a-z0-9]+")
    flat = pc.list_flatten(lists)
    parents = pc.list_parent_indices(lists)
    keep = pc.not_equal(flat, "")
    return flat.filter(keep), parents.filter(keep)


def word_histogram(sf_dir: str) -> pd.DataFrame:
    """``(word, count)`` over documents.text — per-batch partial counts,
    driver combine of the vocabulary-bounded partial table."""

    def partial(batch: pa.Table) -> pa.Table:
        flat, _parents = _split_words(batch["text"])
        vc = flat.value_counts()
        return pa.table(
            {"word": vc.field("values"), "count": pc.cast(vc.field("counts"), pa.int64())}
        )

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["text"]
    ).map_batches(partial, batch_format="pyarrow")
    empty = pa.schema([("word", pa.string()), ("count", pa.int64())])
    return (
        collect_table(ds, empty)
        .to_pandas()
        .groupby("word", as_index=False)["count"]
        .sum()
        .sort_values("word")
        .reset_index(drop=True)
    )


# ---- trainer ---------------------------------------------------------------


def _word_pairs(syms: list[str]) -> list[tuple[str, str]]:
    return list(zip(syms, syms[1:]))


def train_bpe(
    words: list[str],
    counts: list[int] | np.ndarray,
    num_merges: int = NUM_MERGES,
    min_pair_count: int = MIN_PAIR_COUNT,
) -> tuple[list[tuple[str, str, str, int]], dict[str, list[str]]]:
    """Learn ``num_merges`` BPE merges from a word-frequency table.

    Returns ``(merges, segmentation)`` where merges rows are
    ``(left, right, merged, pair_count_at_merge)`` in rank order and
    ``segmentation`` maps each input word to its final symbol list.

    Deterministic: ties on pair count break to the lexicographically
    smallest ``(left, right)`` pair. Incremental: pair counts and a
    pair→word-index inverted map are updated in place, so each merge
    costs O(words containing the pair), not O(vocabulary).
    """
    syms: list[list[str]] = [list(w) + [EOW] for w in words]
    wc = [int(c) for c in counts]

    pair_counts: dict[tuple[str, str], int] = {}
    pair_words: dict[tuple[str, str], set[int]] = {}
    for i, s in enumerate(syms):
        for p in _word_pairs(s):
            pair_counts[p] = pair_counts.get(p, 0) + wc[i]
            pair_words.setdefault(p, set()).add(i)

    merges: list[tuple[str, str, str, int]] = []
    for _ in range(num_merges):
        if not pair_counts:
            break
        maxc = max(pair_counts.values())
        if maxc < min_pair_count:
            break
        best = min(p for p, c in pair_counts.items() if c == maxc)
        a, b = best
        merged = a + b
        merges.append((a, b, merged, maxc))
        for i in sorted(pair_words.get(best, ())):
            old = syms[i]
            # retire the word's current pair contributions
            for p in _word_pairs(old):
                pair_counts[p] -= wc[i]
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                ws = pair_words.get(p)
                if ws is not None:
                    ws.discard(i)
                    if not ws:
                        del pair_words[p]
            # left-to-right non-overlapping merge of (a, b)
            new: list[str] = []
            j = 0
            while j < len(old):
                if j + 1 < len(old) and old[j] == a and old[j + 1] == b:
                    new.append(merged)
                    j += 2
                else:
                    new.append(old[j])
                    j += 1
            syms[i] = new
            for p in _word_pairs(new):
                pair_counts[p] = pair_counts.get(p, 0) + wc[i]
                pair_words.setdefault(p, set()).add(i)

    segmentation = {w: syms[i] for i, w in enumerate(words)}
    return merges, segmentation


def merge_ranks(merges: list[tuple[str, str, str, int]]) -> dict[tuple[str, str], int]:
    return {(a, b): r for r, (a, b, _m, _c) in enumerate(merges)}


# ---- encoder ---------------------------------------------------------------


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy rank-ordered BPE encode: repeatedly merge every
    occurrence of the lowest-rank adjacent pair present. Applying
    merges in learned-rank order reproduces the trainer's segmentation
    for any word drawn from the training distribution."""
    syms: list[str] = list(word) + [EOW]
    while len(syms) > 1:
        best_rank = -1
        best_pair: tuple[str, str] | None = None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best_pair is None or r < best_rank):
                best_rank, best_pair = r, p
        if best_pair is None:
            break
        a, b = best_pair
        merged = a + b
        new: list[str] = []
        j = 0
        while j < len(syms):
            if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                new.append(merged)
                j += 2
            else:
                new.append(syms[j])
                j += 1
        syms = new
    return syms


class BPEEncoder:
    """Actor-pool encode stage: ranks read once per actor from the
    object store, per-distinct-word segmentation memoized across
    batches (the Zipf head amortizes to a dict hit). The Python loop
    runs over the batch's DISTINCT unseen words only; everything else
    (tokenize, unique, scatter-add back to rows) is Arrow/numpy."""

    def __init__(self, ranks_ref) -> None:
        self.ranks: dict[tuple[str, str], int] = ray.get(ranks_ref)
        self._memo: dict[str, int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        flat, parents = _split_words(batch["text"])
        words = flat.to_numpy(zero_copy_only=False)
        rows = parents.to_numpy(zero_copy_only=False).astype(np.int64)
        uniq, inv = np.unique(words, return_inverse=True)
        uniq_len = np.empty(len(uniq), dtype=np.int64)
        memo = self._memo
        for i, w in enumerate(uniq):
            m = memo.get(w)
            if m is None:
                m = len(encode_word(w, self.ranks))
                memo[w] = m
            uniq_len[i] = m
        n_tokens = np.bincount(rows, weights=uniq_len[inv], minlength=n).astype(np.int64)
        n_words = np.bincount(rows, minlength=n).astype(np.int64)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_words": pa.array(n_words, type=pa.int64()),
                "bpe_tokens": pa.array(n_tokens, type=pa.int64()),
            }
        )


# ---- gate entries ----------------------------------------------------------

_BPE_CACHE: dict[str, list[tuple[str, str, str, int]]] = {}


def _merges_for(sf_dir: str) -> list[tuple[str, str, str, int]]:
    key = os.path.abspath(sf_dir)
    if key not in _BPE_CACHE:
        hist = word_histogram(sf_dir)
        merges, _seg = train_bpe(
            hist["word"].tolist(), hist["count"].to_numpy(dtype=np.int64)
        )
        _BPE_CACHE[key] = merges
    return _BPE_CACHE[key]


def q_bpe_vocab(sf_dir: str) -> pa.Table:
    """Learned merge table: ``(rank, left, right, merged, pair_count)``
    in rank order. The EOW sentinel renders as ``_`` for a readable,
    hash-stable gate artifact."""
    merges = _merges_for(sf_dir)
    disp = lambda s: s.replace(EOW, "_")  # noqa: E731
    return pa.table(
        {
            "rank": pa.array(np.arange(len(merges), dtype=np.int64)),
            "left": pa.array([disp(a) for a, _b, _m, _c in merges], type=pa.string()),
            "right": pa.array([disp(b) for _a, b, _m, _c in merges], type=pa.string()),
            "merged": pa.array([disp(m) for _a, _b, m, _c in merges], type=pa.string()),
            "pair_count": pa.array([c for _a, _b, _m, c in merges], type=pa.int64()),
        }
    )


def q_bpe_token_count(sf_dir: str) -> pa.Table:
    """Per-document token count under the learned vocabulary —
    the pass that sizes a training mixture in tokens."""
    merges = _merges_for(sf_dir)
    ranks_ref = ray.put(merge_ranks(merges))
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    ).map_batches(
        BPEEncoder,
        fn_constructor_args=(ranks_ref,),
        concurrency=2,
        batch_format="pyarrow",
    )
    empty = pa.schema(
        [("doc_id", pa.int64()), ("n_words", pa.int64()), ("bpe_tokens", pa.int64())]
    )
    out = collect_table(ds, empty)
    return out.sort_by([("doc_id", "ascending")])


QUERIES = {
    "bpe_vocab": q_bpe_vocab,
    "bpe_token_count": q_bpe_token_count,
}

# iterative merge selection is not SQL-expressible → rows-only gates;
# trainer/encoder correctness is pytest-proven (tests/test_bpe.py)
ORACLE_SQL: dict[str, str] = {}
