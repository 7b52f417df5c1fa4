"""Structured query language: one string → a composed retrieval plan.

The user-facing entry point tying the engine's retrieval primitives
together (the reference exposes a single search box feeding its whole
pipeline — enhanced_pipeline.py:524-566; this is that surface for the
inverted-index engine):

    parse_structured_query('data stream -join lang:en,fr "key value"')

- bare words       → BM25-scored positive terms
- ``+word``        → REQUIRED term (Lucene MUST clause: docs lacking it
  are excluded; still contributes to the BM25 score)
- ``word^2.5``     → boosted positive term (Lucene term^W; contribution
  scaled by W, pruning stays exact)
- ``-word``        → boolean NOT (docs containing it are excluded)
- ``col:v1,v2``    → metadata filter on the docs registry (OR within a
  column, AND across columns)
- ``"..."``        → exact phrase the doc must contain (positional index)
- ``-"..."``       → exact phrase the doc must NOT contain

``structured_search`` composes them through the one ``_allowed``-set
mechanism the scorer already uses for filtered / negated / tombstoned
retrieval, so every pruning mode (taat / maxscore / bmw / conjunctive)
stays exact: the metadata filter and phrase candidates intersect, the
negated docs subtract, and BM25 statistics stay corpus-global (the
standard filtered-search semantics). Scale shape: phrase candidates
resolve from the positional index ONCE (never a text scan), the id set
broadcasts to scorer actors with the constructor, and scoring runs on
the normal actor-pool serving path.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np

from .config import EngineConfig

_TOKEN_RE = re.compile(r'(-?)"([^"]*)"|(\S+)')


_BOOST_RE = re.compile(r"^(.+)\^(\d+(?:\.\d+)?)$")


@dataclass(frozen=True)
class StructuredQuery:
    terms: str = ""
    must_terms: tuple[str, ...] = ()
    exclude_terms: tuple[str, ...] = ()
    field_filters: tuple[tuple[str, tuple[str, ...]], ...] = ()
    phrases: tuple[str, ...] = ()
    exclude_phrases: tuple[str, ...] = ()
    boosts: tuple[tuple[str, float], ...] = ()

    @property
    def field_filter(self) -> tuple[str, tuple[str, ...]] | None:
        """First metadata filter (the one the scorer applies natively)."""
        return self.field_filters[0] if self.field_filters else None


def parse_structured_query(text: str) -> StructuredQuery:
    """Parse the query grammar above. Multiple ``col:`` filters on the
    SAME column merge their value lists (OR within a column); filters
    on different columns AND together — the first rides the scorer's
    native doc_filter, the rest resolve into the include set."""
    terms: list[str] = []
    musts: list[str] = []
    excludes: list[str] = []
    filters: dict[str, list[str]] = {}
    phrases: list[str] = []
    neg_phrases: list[str] = []
    boosts: dict[str, float] = {}
    for m in _TOKEN_RE.finditer(text):
        neg, quoted, bare = m.group(1), m.group(2), m.group(3)
        if quoted is not None:
            if quoted.strip():
                (neg_phrases if neg else phrases).append(quoted.strip())
            continue
        if bare.startswith("-") and len(bare) > 1:
            word = bare[1:]
            bm = _BOOST_RE.match(word)
            if bm:  # '-word^2': strip the (meaningless) boost so the
                word = bm.group(1)  # exclusion hits 'word', not 'word^2'
            excludes.append(word.lower())
        elif bare.startswith("+") and len(bare) > 1:
            word = bare[1:]
            bm = _BOOST_RE.match(word)
            if bm:  # '+word^2.5' → REQUIRED and boosted; the bare word
                word = bm.group(1)  # is both the must and scoring term
                boosts[word.lower()] = float(bm.group(2))
            musts.append(word.lower())
            terms.append(word)  # must terms still score
        elif ":" in bare and not bare.startswith(":"):
            col, _, vals = bare.partition(":")
            filters.setdefault(col, []).extend(v for v in vals.split(",") if v)
        else:
            bm = _BOOST_RE.match(bare)
            if bm:  # word^2.5 → boosted positive term
                terms.append(bm.group(1))
                boosts[bm.group(1).lower()] = float(bm.group(2))
            else:
                terms.append(bare)
    return StructuredQuery(
        terms=" ".join(terms),
        must_terms=tuple(musts),
        exclude_terms=tuple(excludes),
        field_filters=tuple((col, tuple(vals)) for col, vals in filters.items()),
        phrases=tuple(phrases),
        exclude_phrases=tuple(neg_phrases),
        boosts=tuple(sorted(boosts.items())),
    )


def phrase_candidates(
    phrases: tuple[str, ...], pos_dir: str, cfg: EngineConfig
) -> np.ndarray:
    """doc_ids (sorted uint64) containing EVERY phrase, from the
    positional index — the AND of the per-phrase match sets."""
    from .pipelines.positional import PhraseScorer

    ps = PhraseScorer(pos_dir, cfg)
    allowed: np.ndarray | None = None
    for ph in phrases:
        docs, _occ = ps.phrase_occurrences(ph, k=1 << 31)
        docs = np.sort(np.asarray(docs, dtype=np.uint64))
        allowed = docs if allowed is None else np.intersect1d(allowed, docs)
        if allowed.size == 0:
            break
    return allowed if allowed is not None else np.empty(0, dtype=np.uint64)


def structured_search(
    text: str,
    index_dir: str,
    cfg: EngineConfig | None = None,
    *,
    k: int = 10,
    mode: str = "maxscore",
    pos_dir: str | None = None,
    min_should_match: int | None = None,
    synonyms: dict[str, tuple[str, ...]] | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """One-shot structured search (driver-side scorer; for the
    actor-pool serving path pass the same pieces to ``query_index``).
    Returns (doc_ids, scores) of the top-k."""
    from .scorer import BM25Scorer

    cfg = cfg or EngineConfig()
    sq = parse_structured_query(text)
    if not sq.terms:
        raise ValueError("structured query needs at least one positive term")
    if min_should_match and int(min_should_match) > 1:
        mode = "taat"  # a match-count floor needs the exhaustive path
    include = exclude = None
    if sq.phrases or sq.exclude_phrases:
        if pos_dir is None:
            raise ValueError("phrase constraints need pos_dir (a positional index)")
        if sq.phrases:
            include = phrase_candidates(sq.phrases, pos_dir, cfg)
        if sq.exclude_phrases:
            # union of the negated phrases' match sets (OR of NOTs)
            exclude = np.unique(
                np.concatenate(
                    [phrase_candidates((ph,), pos_dir, cfg) for ph in sq.exclude_phrases]
                )
            )
    if sq.must_terms:
        # MUST clauses: intersect the required terms' posting doc_ids
        # into the include set — resolved once per query through a
        # partition-LAZY scorer (only the touched buckets load), the
        # same exactness mechanism as phrase candidates. Each must term
        # runs through the ANALYZER first (tokenize_text): the index
        # stores stems/split tokens, so looking up the raw surface form
        # ('+tables' with stemmer='s') would silently miss the indexed
        # stem and return zero results. A must term that analyzes to
        # several tokens requires ALL of them; one that analyzes to
        # nothing (a configured stopword) is dropped, Lucene-style.
        from .tokenizer import tokenize_text

        must_tokens: list[str] = []
        for t in sq.must_terms:
            must_tokens.extend(tokenize_text(t, cfg))
        lazy = BM25Scorer(index_dir, cfg, max_loaded_parts=2)
        ids: np.ndarray | None = None
        for t in must_tokens:
            docs = (
                lazy._term_arrays(t)[0]
                if lazy.has_term(t)
                else np.empty(0, dtype=np.uint64)
            )
            ids = docs if ids is None else np.intersect1d(ids, docs)
            if ids.size == 0:
                break
        if ids is not None:
            include = ids if include is None else np.intersect1d(include, ids)
    if len(sq.field_filters) > 1:
        # beyond the first filter (the scorer's native doc_filter), the
        # remaining columns resolve here from the docs registry — one
        # narrow column-pruned read per query — and AND into the
        # include set. Same mechanism as phrase candidates, so every
        # pruning mode stays exact.
        import os as _os

        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        extra_cols = [c for c, _ in sq.field_filters[1:]]
        ft = pq.read_table(
            _os.path.join(index_dir, "docs"), columns=["doc_id", *extra_cols]
        )
        mask = None
        for col, vals in sq.field_filters[1:]:
            m = pc.is_in(ft[col].combine_chunks(), value_set=pa.array(list(vals)))
            mask = m if mask is None else pc.and_(mask, m)
        ids = np.sort(
            ft.filter(mask)["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        )
        include = ids if include is None else np.intersect1d(include, ids)
    sc = BM25Scorer(
        index_dir,
        cfg,
        mode=mode,
        doc_filter=sq.field_filter,
        exclude_terms=sq.exclude_terms or None,
        include_doc_ids=include,
        exclude_doc_ids=exclude,
        boosts=dict(sq.boosts) or None,
        min_should_match=min_should_match,
        synonyms=synonyms,
    )
    score = {
        "bmw": sc.score_bmw,
        "maxscore": sc.score_maxscore,
        "conjunctive": sc.score_conjunctive,
    }.get(mode, sc.score_taat)
    return score(sq.terms, k)
