"""Training-corpus preparation operators over the ``documents`` table.

The ops an LLM training-data pipeline runs between ingest and the
tokenizer: deterministic dataset splitting, sequence packing
(document-concatenation order assignment — a distributed prefix scan),
exact per-group length quantiles via a histogram combiner, and
per-document top-TF-IDF terms served from the built inverted index.

None of these exist in the reference (DocInsight prepares a retrieval
corpus, not a training corpus); they extend SURVEY.md §2's coverage in
the direction the 100-TB use case needs. Scale notes per op:

- ``dataset_split``: stateless per-row map — embarrassingly parallel.
- ``sequence_pack``: the classic two-phase distributed scan: bounded
  per-bucket token sums (tiny groupby) → driver cumsum over the bucket
  table only → broadcast offsets → per-bucket local prefix sums.
  Nothing wider than the bucket-sum table ever reaches the driver.
- ``length_quantiles``: per-batch partial (lang, n_chars) histograms;
  only the bounded histogram (distinct lengths × langs) is combined,
  never the rows. Exact quantiles from counts — no sampling sketch
  needed while value cardinality is bounded; swap in a t-digest if the
  quantile column were unbounded-cardinality floats.
- ``tfidf_top_terms``: decode postings → per-batch LOCAL top-k per doc
  (combiner bounds shuffle rows at k × docs-per-batch) → final per-doc
  top-k via groupby(doc_id).
- ``decontaminate``: eval-set n-gram overlap flagging — distributed
  reduce of the (small) eval side, one ``ray.put`` broadcast of its
  n-gram set, shuffle-free corpus scan.
- ``repetition_stats``: stateless per-row token-multiplicity stats
  (the Gopher repetition-filter inputs) — embarrassingly parallel.
"""

from __future__ import annotations

import json
import math
import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..collect import collect_table
from ..ids import sha256_hex

# ---- deterministic dataset split -----------------------------------------

# Hex-prefix thresholds: fixed-width lowercase hex compares
# lexicographically == numerically, so the SAME string comparison runs
# in pandas and in the DuckDB oracle. 0xcccccccc/2^32 = 0.8,
# 0xe6666666/2^32 = 0.9 → 80/10/10 expected split, deterministic in
# content (stable under re-runs, re-partitioning, and corpus growth).
SPLIT_TRAIN_MAX = "cccccccc"
SPLIT_VAL_MAX = "e6666666"


def _read(sf_dir: str, cols: list[str]) -> "ray.data.Dataset":
    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=cols
    )


def q_dataset_split(sf_dir: str) -> pa.Table:
    """Deterministic content-hash train/val/test split (80/10/10).

    Split membership is a pure function of sha256(text), so it is
    reproducible across runs and stable when the corpus grows — the
    property a training pipeline needs so that yesterday's val docs
    don't leak into today's train set.
    """

    def assign(batch: pd.DataFrame) -> pd.DataFrame:
        pref = np.array([s[:8] for s in sha256_hex(batch["text"].tolist())], dtype=object)
        split = np.where(
            pref < SPLIT_TRAIN_MAX, "train", np.where(pref < SPLIT_VAL_MAX, "val", "test")
        )
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype("int64"),
                "split": split,
                "sha_prefix": pref,
            }
        )

    empty = pa.schema(
        [("doc_id", pa.int64()), ("split", pa.string()), ("sha_prefix", pa.string())]
    )
    return collect_table(
        _read(sf_dir, ["doc_id", "text"]).map_batches(assign, batch_format="pandas"),
        empty,
    )


# ---- sequence packing (distributed prefix scan) --------------------------

PACK_BUDGET = 256  # tokens per training sequence
PACK_BUCKET_W = 64  # doc_ids per scan bucket

# Token rule == SIMPLE_TOK_SQL (pipelines/documents.py): lowercase
# [a-z0-9]+ maximal runs of length >= 2. A maximal run matches
# `[a-z0-9]{2,}` exactly once iff its length >= 2.
_TOK2_RE = re.compile(r"[a-z0-9]{2,}")


def q_sequence_pack(sf_dir: str) -> pa.Table:
    """GPT-style sequence packing: concatenate documents in doc_id
    order and assign each doc its global start-token offset and the
    id of the PACK_BUDGET-token training sequence it starts in.

    The global prefix sum runs as a two-phase distributed scan:
      1. map_batches → (doc_id, n_tokens, bucket=doc_id // W); a tiny
         groupby(bucket).sum gives per-bucket totals,
      2. the driver cumsums the BUCKET table only (|buckets| rows) and
         broadcasts the offsets via ray.put,
      3. each bucket group sorts locally by doc_id and adds its offset.
    At 10^12 docs the driver holds |docs|/W offsets — choose W so that
    table stays in memory; no row-level data ever reaches the driver.
    """

    def count_tokens(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        # Arrow RE2 match counting — zero-copy, no pandas block, no
        # materialized token lists when only the COUNT is needed; the
        # greedy [a-z0-9]{2,} yields the same maximal runs as findall
        doc_id = pc.cast(batch["doc_id"], pa.int64())
        n = pc.cast(
            pc.count_substring_regex(pc.utf8_lower(batch["text"]), _TOK2_RE.pattern),
            pa.int64(),
        )
        bucket = pc.divide(doc_id, pa.scalar(PACK_BUCKET_W, type=pa.int64()))
        return pa.table({"doc_id": doc_id, "n_tokens": n, "bucket": bucket})

    counted = _read(sf_dir, ["doc_id", "text"]).map_batches(
        count_tokens, batch_format="pyarrow"
    ).materialize()

    # Phase 1+2: bucket totals → driver-side cumsum over buckets only.
    sums = counted.groupby("bucket").sum("n_tokens").to_pandas()
    sums = sums.sort_values("bucket").reset_index(drop=True)
    tot = sums["sum(n_tokens)"].to_numpy(dtype=np.int64)
    offsets = dict(
        zip(sums["bucket"].astype(np.int64), np.concatenate([[0], np.cumsum(tot)[:-1]]))
    )
    offsets_ref = ray.put(offsets)

    # Phase 3: per-bucket local scan + broadcast offset.
    def bucket_scan(g: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(offsets_ref)
        g = g.sort_values("doc_id").reset_index(drop=True)
        n = g["n_tokens"].to_numpy(dtype=np.int64)
        start = int(offs[int(g["bucket"].iloc[0])]) + np.concatenate(
            [[0], np.cumsum(n)[:-1]]
        )
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"],
                "n_tokens": n,
                "start_token": start,
                "pack_id": start // PACK_BUDGET,
            }
        )

    empty = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_tokens", pa.int64()),
            ("start_token", pa.int64()),
            ("pack_id", pa.int64()),
        ]
    )
    return collect_table(
        counted.groupby("bucket").map_groups(bucket_scan, batch_format="pandas"),
        empty,
    )


# ---- exact per-group quantiles via histogram combine ---------------------

QUANTILES = (0.25, 0.5, 0.75, 0.95)


def _disc_quantile(values: np.ndarray, counts: np.ndarray, q: float) -> int:
    """SQL percentile_disc: the 1-based ceil(q*n)-th smallest element.
    ``values`` ascending, ``counts`` their multiplicities."""
    n = int(counts.sum())
    k = max(1, math.ceil(q * n))  # 1-based rank
    idx = int(np.searchsorted(np.cumsum(counts), k))
    return int(values[idx])


def q_length_quantiles(sf_dir: str) -> pa.Table:
    """Exact per-lang n_chars quantiles (p25/p50/p75/p95) from a
    distributed histogram: each batch emits its partial
    (lang, n_chars) → count table; only the bounded histogram is
    combined. Equivalent to percentile_disc and exact — the counting-
    sort trick that sidesteps both a global sort and an approximate
    sketch whenever the value column has bounded cardinality."""

    def partial_hist(batch: pd.DataFrame) -> pd.DataFrame:
        out = (
            batch.groupby(["lang", "n_chars"], sort=False, as_index=False)
            .size()
            .rename(columns={"size": "cnt"})
        )
        out["n_chars"] = out["n_chars"].astype("int64")
        out["cnt"] = out["cnt"].astype("int64")
        return out[["lang", "n_chars", "cnt"]]

    empty = pa.schema([("lang", pa.string()), ("n_chars", pa.int64()), ("cnt", pa.int64())])
    hist = (
        collect_table(
            _read(sf_dir, ["lang", "n_chars"]).map_batches(
                partial_hist, batch_format="pandas"
            ),
            empty,
        )
        .to_pandas()
        .groupby(["lang", "n_chars"], as_index=False)["cnt"]
        .sum()
    )

    rows: list[dict] = []
    for lang, g in hist.groupby("lang"):
        g = g.sort_values("n_chars")
        v = g["n_chars"].to_numpy(dtype=np.int64)
        c = g["cnt"].to_numpy(dtype=np.int64)
        row = {"lang": lang, "n": int(c.sum())}
        for q in QUANTILES:
            row[f"q{int(q * 100)}"] = _disc_quantile(v, c, q)
        rows.append(row)
    out = pd.DataFrame(rows).sort_values("lang").reset_index(drop=True)
    return pa.table(
        {
            "lang": pa.array(out["lang"], type=pa.string()),
            "n": pa.array(out["n"].astype(np.int64), type=pa.int64()),
            **{
                f"q{int(q * 100)}": pa.array(
                    out[f"q{int(q * 100)}"].astype(np.int64), type=pa.int64()
                )
                for q in QUANTILES
            },
        }
    )


# ---- per-document top TF-IDF terms from the index ------------------------

TFIDF_K = 5


def q_tfidf_top_terms(sf_dir: str) -> pa.Table:
    """Top-``TFIDF_K`` TF-IDF terms per document, SERVED FROM THE
    BUILT INDEX: decode the merged postings (term, df, doc_ids, tfs),
    score tfidf = tf * ln(n_docs / df), and keep each doc's top terms
    via a local-top-k combiner + per-doc final top-k. The analytic
    sibling of BM25 serving — the index as a queryable Dataset.

    Shuffle bound: each postings batch emits at most K rows per doc it
    mentions, so the groupby moves O(batches × docs × K) rows, never
    the full decoded postings.
    """
    from ..codec import decode_posting
    from ..pipelines.documents import _postings_ds, ensure_index

    idx = ensure_index(sf_dir)
    with open(os.path.join(idx, "corpus_stats.json")) as f:
        n_docs = float(json.load(f)["n_docs"])

    def explode_score(batch: pa.Table) -> pd.DataFrame:
        terms, dids, scores = [], [], []
        for t, df, dvb, tvb in zip(
            batch["term"].to_pylist(),
            batch["df"].to_pylist(),
            batch["doc_ids_vb"].to_pylist(),
            batch["tfs_vb"].to_pylist(),
        ):
            d, f = decode_posting(dvb, tvb, df)
            idf = math.log(n_docs / float(df))
            terms += [t] * d.size
            dids.append(d.astype(np.int64))
            scores.append(np.round(f.astype(np.float64) * idf, 6))
        if not terms:
            return pd.DataFrame({"doc_id": [], "term": [], "tfidf": []}).astype(
                {"doc_id": "int64", "term": "object", "tfidf": "float64"}
            )
        out = pd.DataFrame(
            {
                "doc_id": np.concatenate(dids),
                "term": np.array(terms, dtype=object),
                "tfidf": np.concatenate(scores),
            }
        )
        # local combiner: only each doc's in-batch top-K continue
        out = out.sort_values(
            ["doc_id", "tfidf", "term"], ascending=[True, False, True]
        )
        return out.groupby("doc_id", sort=False).head(TFIDF_K)

    def final_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["tfidf", "term"], ascending=[False, True]).head(TFIDF_K)
        return g.assign(rank=np.arange(len(g), dtype=np.int64))

    final_topk.__name__ = "final_topk"
    empty = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("term", pa.string()),
            ("tfidf", pa.float64()),
            ("rank", pa.int64()),
        ]
    )
    return collect_table(
        _postings_ds(idx)
        .map_batches(explode_score, batch_format="pyarrow")
        .groupby("doc_id")
        .map_groups(final_topk, batch_format="pandas"),
        empty,
    )


# ---- benchmark decontamination (n-gram overlap) --------------------------

# Benchmark set: a deterministic pseudo-eval-set drawn from the corpus
# itself — the first DECON_PREFIX tokens of every doc_id ≡ 0
# (mod DECON_MOD) document. Self-drawn so the op demonstrably fires
# (benchmark docs and their near-duplicates are contaminated by
# construction) while staying a pure function of the input tables.
DECON_MOD = 97
DECON_PREFIX = 12
DECON_N = 3  # n-gram width


def _grams(tokens: list[str], n: int) -> set[str]:
    return {" ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)}


def gram_hit_counts(
    texts: "pd.Series", grams, n: int = DECON_N, token_re: re.Pattern = _TOK2_RE
) -> np.ndarray:
    """Per-row count of DISTINCT token ``n``-grams present in ``grams``
    (== ``len(_grams(tokens, n) & grams)`` per document), fully
    columnar: explode the token lists, build grams via shifted
    concat_str over the flat child (row-boundary windows masked by an
    owner check), hash-join membership with ``is_in``, dedup with
    ``unique`` — no Python loop over documents or grams (VERDICT r3,
    What's wrong #3)."""
    import polars as pl

    n_rows = len(texts)
    out = np.zeros(n_rows, dtype=np.int64)
    if not n_rows:
        return out
    toks = (
        pl.Series("tok", texts.to_numpy(), dtype=pl.String)
        .str.to_lowercase()
        .str.extract_all(token_re.pattern)
    )
    lf = (
        pl.LazyFrame({"o": pl.Series(np.arange(n_rows, dtype=np.int64)), "tok": toks})
        .explode("tok", empty_as_null=False)
        .drop_nulls("tok")
        .with_columns(
            [pl.col("tok").shift(-i).alias(f"t{i}") for i in range(1, n)]
            + [pl.col("o").shift(-(n - 1)).alias("oe")]
        )
        .filter(pl.col("o") == pl.col("oe"))
        .with_columns(
            pl.concat_str(
                [pl.col("tok")] + [pl.col(f"t{i}") for i in range(1, n)],
                separator=" ",
            ).alias("gram")
        )
        .filter(pl.col("gram").is_in(list(grams)))
        .unique(subset=["o", "gram"])
        .group_by("o")
        .len()
    )
    g = lf.collect()
    if g.height:
        out[g["o"].to_numpy()] = g["len"].to_numpy()
    return out


def q_decontaminate(sf_dir: str) -> pa.Table:
    """Benchmark decontamination: flag documents sharing any token
    ``DECON_N``-gram with the eval set (the GPT-3/Llama training-data
    hygiene pass — eval n-gram overlap → drop from the training set).

    Scale shape: the eval side is SMALL by definition, so it is
    reduced distributed (filter + prefix-slice run inside
    ``map_batches``; only eval rows reach the driver), built into one
    frozen n-gram set, and broadcast once via ``ray.put`` — the
    corpus-side scan is then an embarrassingly parallel membership
    count with no shuffle at all. At 10^12 docs the only driver state
    is the eval-gram set.
    """

    def bench_prefixes(batch: pd.DataFrame) -> pa.Table:
        sel = batch[batch["doc_id"] % DECON_MOD == 0]
        toks = (
            sel["text"].str.lower().str.findall(_TOK2_RE).str.slice(0, DECON_PREFIX)
        )
        return pa.table({"toks": pa.array(toks.str.join(" ").tolist(), type=pa.string())})

    bench_empty = pa.schema([("toks", pa.string())])
    bench = collect_table(
        _read(sf_dir, ["doc_id", "text"]).map_batches(
            bench_prefixes, batch_format="pandas"
        ),
        bench_empty,
    )
    gram_set: set[str] = set()
    for row in bench["toks"].to_pylist():
        gram_set |= _grams(row.split(), DECON_N)
    grams_ref = ray.put(frozenset(gram_set))

    def scan(batch: pd.DataFrame) -> pd.DataFrame:
        grams = ray.get(grams_ref)
        n_hits = gram_hit_counts(batch["text"], grams, DECON_N)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype("int64"),
                "n_hits": n_hits,
                "contaminated": (n_hits > 0).astype("int64"),
            }
        )

    empty = pa.schema(
        [("doc_id", pa.int64()), ("n_hits", pa.int64()), ("contaminated", pa.int64())]
    )
    return collect_table(
        _read(sf_dir, ["doc_id", "text"]).map_batches(scan, batch_format="pandas"),
        empty,
    )


# ---- intra-document repetition stats --------------------------------------


def q_repetition_stats(sf_dir: str) -> pa.Table:
    """Per-doc repetition signals (the Gopher/C4-style quality-filter
    inputs): total tokens, distinct tokens, and the top token's
    multiplicity. Emitted as integers so the gate hash is exact; the
    filter-side ratios (``n_distinct/n_tokens``, ``top_tf/n_tokens``)
    derive trivially. Stateless per-row map — embarrassingly parallel.
    """

    def stats(batch: pd.DataFrame) -> pd.DataFrame:
        import polars as pl

        n_rows = len(batch)
        toks = (
            pl.Series("tok", batch["text"].to_numpy(), dtype=pl.String)
            .str.to_lowercase()
            .str.extract_all(_TOK2_RE.pattern)
        )
        # distinct count + top multiplicity from one grouped pass over
        # the exploded child array (no per-doc Counter)
        g = (
            pl.LazyFrame(
                {"o": pl.Series(np.arange(n_rows, dtype=np.int64)), "tok": toks}
            )
            .explode("tok", empty_as_null=False)
            .drop_nulls("tok")
            .group_by(["o", "tok"])
            .len()
            .group_by("o")
            .agg(n_distinct=pl.len(), top_tf=pl.col("len").max())
            .collect()
        )
        n_distinct = np.zeros(n_rows, dtype=np.int64)
        top_tf = np.zeros(n_rows, dtype=np.int64)
        if g.height:
            o = g["o"].to_numpy()
            n_distinct[o] = g["n_distinct"].to_numpy()
            top_tf[o] = g["top_tf"].to_numpy()
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype("int64"),
                "n_tokens": toks.list.len().to_numpy().astype("int64"),
                "n_distinct": n_distinct,
                "top_tf": top_tf,
            }
        )

    empty = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_tokens", pa.int64()),
            ("n_distinct", pa.int64()),
            ("top_tf", pa.int64()),
        ]
    )
    return collect_table(
        _read(sf_dir, ["doc_id", "text"]).map_batches(stats, batch_format="pandas"),
        empty,
    )


# ---- stratified sampling --------------------------------------------------

STRAT_K = 40  # sample size per stratum


def q_stratified_sample(sf_dir: str) -> pa.Table:
    """Deterministic stratified sample: ``STRAT_K`` docs per lang,
    chosen by content-hash order (sha256(text) asc, doc_id asc) — the
    balanced-rebalancing pass a training pipeline runs over skewed
    language/source distributions, reproducible across runs and
    engines because the 'random' order is a pure function of content.

    Scale shape: the local-top-k combiner — each batch forwards at
    most groups × K rows, the final per-group head runs over those
    partials, so the shuffle moves O(blocks × langs × K) rows
    regardless of corpus size.
    """

    def local_head(batch: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype("int64"),
                "lang": batch["lang"],
                "sha": sha256_hex(batch["text"].tolist()),
            }
        )
        return (
            out.sort_values(["lang", "sha", "doc_id"])
            .groupby("lang", sort=False)
            .head(STRAT_K)
        )

    def final_head(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["sha", "doc_id"]).head(STRAT_K)
        return g.assign(rank=np.arange(len(g), dtype=np.int64))

    final_head.__name__ = "final_head"
    empty = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("lang", pa.string()),
            ("sha", pa.string()),
            ("rank", pa.int64()),
        ]
    )
    return collect_table(
        _read(sf_dir, ["doc_id", "lang", "text"])
        .map_batches(local_head, batch_format="pandas")
        .groupby("lang")
        .map_groups(final_head, batch_format="pandas"),
        empty,
    )


# ---- term co-occurrence over a bounded vocabulary -------------------------

COOC_VOCAB = 32  # top-df terms admitted to the pair matrix
COOC_TOPK = 50  # reported pairs


def q_term_cooccurrence(sf_dir: str) -> pa.Table:
    """Document-level term co-occurrence counts over the top-``COOC_VOCAB``
    df terms (the word2vec/PMI feature-extraction pass). Counts are
    emitted as integers (n_ab, n_a, n_b; PMI = ln(N·n_ab/(n_a·n_b))
    derives driver-side) so the gate hash is float-free.

    Scale shape: two bounded passes — (1) distributed df partials →
    tiny groupby → driver top-M vocab (M fixed), (2) vocab broadcast
    via ``ray.put``; each batch folds its docs into one M×M upper-
    triangle count matrix and emits ONLY the matrix (≤ M(M-1)/2 rows
    per batch), so the final pair groupby moves O(blocks · M²) rows —
    never a per-doc or per-token pair explosion.
    """

    def df_partial(batch: pd.DataFrame) -> pd.DataFrame:
        # exploded-token factorize path: flatten, code, dedupe the
        # (doc, code) pairs with one np.unique, bincount per code — no
        # per-document set() or Python counting loop
        toks = batch["text"].str.lower().str.findall(_TOK2_RE)
        lens = toks.str.len().to_numpy(dtype=np.int64)
        if not lens.sum():
            return pd.DataFrame({"term": pd.Series([], dtype=object),
                                 "df": pd.Series([], dtype=np.int64)})
        from itertools import chain

        flat = pd.Series(list(chain.from_iterable(toks)), dtype=object)
        codes, uniques = pd.factorize(flat, sort=False)
        doc_idx = np.repeat(np.arange(len(toks), dtype=np.int64), lens)
        pair_keys = np.unique(doc_idx * np.int64(len(uniques)) + codes)
        cnt = np.bincount(pair_keys % len(uniques), minlength=len(uniques))
        return pd.DataFrame({"term": uniques, "df": cnt.astype(np.int64)})

    df_empty = pa.schema([("term", pa.string()), ("df", pa.int64())])
    df_tbl = (
        collect_table(
            _read(sf_dir, ["text"]).map_batches(df_partial, batch_format="pandas"),
            df_empty,
        )
        .to_pandas()
        .groupby("term", as_index=False)["df"]
        .sum()
        .sort_values(["df", "term"], ascending=[False, True])
        .head(COOC_VOCAB)
        .reset_index(drop=True)
    )
    vocab = {t: i for i, t in enumerate(df_tbl["term"])}
    n_a = df_tbl["df"].to_numpy(dtype=np.int64)
    vocab_ref = ray.put(vocab)

    def pair_partial(batch: pd.DataFrame) -> pd.DataFrame:
        v = ray.get(vocab_ref)
        m = len(v)
        mat = np.zeros((m, m), dtype=np.int64)
        toks = batch["text"].str.lower().str.findall(_TOK2_RE)
        for ts in toks:
            idx = np.array(sorted({v[t] for t in ts if t in v}), dtype=np.int64)
            if idx.size >= 2:
                mat[np.repeat(idx, idx.size), np.tile(idx, idx.size)] += 1
        ia, ib = np.triu_indices(m, k=1)
        keep = mat[ia, ib] > 0
        return pd.DataFrame(
            {
                "ia": ia[keep].astype(np.int64),
                "ib": ib[keep].astype(np.int64),
                "n_ab": mat[ia[keep], ib[keep]],
            }
        )

    pair_empty = pa.schema([("ia", pa.int64()), ("ib", pa.int64()), ("n_ab", pa.int64())])
    pairs = (
        collect_table(
            _read(sf_dir, ["text"]).map_batches(pair_partial, batch_format="pandas"),
            pair_empty,
        )
        .to_pandas()
        .groupby(["ia", "ib"], as_index=False)["n_ab"]
        .sum()
    )
    terms = list(vocab)
    pairs["term_a"] = [terms[i] for i in pairs["ia"]]
    pairs["term_b"] = [terms[i] for i in pairs["ib"]]
    # vocab index order is (df desc, term asc) — NOT lexicographic; the
    # oracle's pair key is (term_a < term_b), so reorder each pair
    swap = pairs["term_a"] > pairs["term_b"]
    pairs.loc[swap, ["term_a", "term_b", "ia", "ib"]] = pairs.loc[
        swap, ["term_b", "term_a", "ib", "ia"]
    ].to_numpy()
    pairs["n_a"] = n_a[pairs["ia"].to_numpy(dtype=np.int64)]
    pairs["n_b"] = n_a[pairs["ib"].to_numpy(dtype=np.int64)]
    pairs = (
        pairs.sort_values(["n_ab", "term_a", "term_b"], ascending=[False, True, True])
        .head(COOC_TOPK)
        .reset_index(drop=True)
    )
    pairs["rank"] = np.arange(len(pairs), dtype=np.int64)
    return pa.table(
        {
            "term_a": pa.array(pairs["term_a"], type=pa.string()),
            "term_b": pa.array(pairs["term_b"], type=pa.string()),
            "n_ab": pa.array(pairs["n_ab"].astype(np.int64), type=pa.int64()),
            "n_a": pa.array(pairs["n_a"].astype(np.int64), type=pa.int64()),
            "n_b": pa.array(pairs["n_b"].astype(np.int64), type=pa.int64()),
            "rank": pa.array(pairs["rank"], type=pa.int64()),
        }
    )


def cooccurrence_pmi(sf_dir: str, n_docs: int | None = None) -> pd.DataFrame:
    """Library API: PMI scores derived from q_term_cooccurrence counts."""
    t = q_term_cooccurrence(sf_dir).to_pandas()
    if n_docs is None:
        import pyarrow.parquet as pq

        n_docs = pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows
    t["pmi"] = np.log(n_docs * t["n_ab"] / (t["n_a"] * t["n_b"]))
    return t


# ---- hot (repeated) n-gram passages ---------------------------------------

# Passage width, the cross-doc threshold that makes a gram "hot", and
# the size of the reported head. Hot passages are the boilerplate /
# template signal an LLM data pipeline removes (the n-gram analogue of
# CCNet's duplicated-line filter for corpora without line structure).
HOT_N = 4
HOT_MIN_DOCS = 2
HOT_TOPK = 50


def _gram_counts(tokens: list[str], n: int) -> dict[str, int]:
    out: dict[str, int] = {}
    for i in range(len(tokens) - n + 1):
        g = " ".join(tokens[i : i + n])
        out[g] = out.get(g, 0) + 1
    return out


def _hot_partials(batch: pd.DataFrame) -> pd.DataFrame:
    """Per-batch partial (gram, n_docs, n_occ). Each doc lives in
    exactly one batch, so per-batch doc counts sum to exact global
    distinct-doc counts — the SPIMI-style combiner that bounds the
    gram shuffle at O(batches × distinct grams per batch)."""
    nd: dict[str, int] = {}
    no: dict[str, int] = {}
    for ts in batch["text"].str.lower().str.findall(_TOK2_RE):
        for g, c in _gram_counts(list(ts), HOT_N).items():
            nd[g] = nd.get(g, 0) + 1
            no[g] = no.get(g, 0) + c
    return pd.DataFrame(
        {
            "gram": list(nd),
            "n_docs": np.fromiter(nd.values(), dtype=np.int64, count=len(nd)),
            "n_occ": np.fromiter(no.values(), dtype=np.int64, count=len(no)),
        }
    )


HOT_BUCKETS = 16  # gram-hash shuffle key: bounded group count

_HOT_CACHE: dict[str, pd.DataFrame] = {}


def _hot_table(sf_dir: str) -> pd.DataFrame:
    """Global hot-gram table: distributed partials → shuffle by gram
    HASH BUCKET (a per-gram groupby would pay Ray's ~1 ms-per-group
    overhead on an unbounded vocabulary — see ROADMAP #7) → vectorized
    pandas aggregation inside each bucket, which holds every partial of
    its grams, so the in-bucket (filter ≥ HOT_MIN_DOCS, local top-K) is
    globally exact per bucket. The driver merges ≤ HOT_BUCKETS × TOPK
    rows regardless of corpus size. Memoized per sf_dir: the two hot
    gates (table + coverage) share one computation."""
    if sf_dir in _HOT_CACHE:
        return _HOT_CACHE[sf_dir]

    def add_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket"] = (
            pd.util.hash_array(df["gram"].to_numpy(dtype=object)) % HOT_BUCKETS
        ).astype("int64")
        return df

    def bucket_agg(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("gram", as_index=False)[["n_docs", "n_occ"]].sum()
        out = out[out["n_docs"] >= HOT_MIN_DOCS]
        return out.sort_values(
            ["n_docs", "n_occ", "gram"], ascending=[False, False, True]
        ).head(HOT_TOPK)

    bucket_agg.__name__ = "bucket_agg"
    empty = pa.schema(
        [("gram", pa.string()), ("n_docs", pa.int64()), ("n_occ", pa.int64())]
    )
    out = collect_table(
        _read(sf_dir, ["text"])
        .map_batches(_hot_partials, batch_format="pandas")
        .map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(bucket_agg, batch_format="pandas"),
        empty,
    ).to_pandas()
    out = (
        out.sort_values(["n_docs", "n_occ", "gram"], ascending=[False, False, True])
        .head(HOT_TOPK)
        .reset_index(drop=True)
    )
    out["n_docs"] = out["n_docs"].astype("int64")
    out["n_occ"] = out["n_occ"].astype("int64")
    out["rank"] = np.arange(len(out), dtype=np.int64)
    _HOT_CACHE[sf_dir] = out
    return out


def q_hot_ngrams(sf_dir: str) -> pa.Table:
    """Top repeated token ``HOT_N``-gram passages across the corpus:
    (gram, n_docs, n_occ, rank) for grams in ≥ ``HOT_MIN_DOCS`` docs —
    duplicated-passage detection over documents with no line structure.
    """
    out = _hot_table(sf_dir)
    return pa.table(
        {
            "gram": pa.array(out["gram"], type=pa.string()),
            "n_docs": pa.array(out["n_docs"].astype(np.int64), type=pa.int64()),
            "n_occ": pa.array(out["n_occ"].astype(np.int64), type=pa.int64()),
            "rank": pa.array(out["rank"], type=pa.int64()),
        }
    )


def q_hot_ngram_coverage(sf_dir: str) -> pa.Table:
    """Per-document hot-passage coverage: how many of a doc's
    ``HOT_N``-gram occurrences are corpus-hot (members of the
    ``q_hot_ngrams`` head) — the per-doc filter signal derived from the
    corpus-level table. The hot set is bounded (≤ HOT_TOPK) by
    construction, so it broadcasts via ``ray.put`` and the scan is
    shuffle-free."""
    hot = frozenset(_hot_table(sf_dir)["gram"])
    hot_ref = ray.put(hot)

    def scan(batch: pd.DataFrame) -> pd.DataFrame:
        hs = ray.get(hot_ref)
        toks = batch["text"].str.lower().str.findall(_TOK2_RE)
        n_grams, n_hot = [], []
        for ts in toks:
            gc = _gram_counts(list(ts), HOT_N)
            n_grams.append(sum(gc.values()))
            n_hot.append(sum(c for g, c in gc.items() if g in hs))
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype("int64"),
                "n_grams": np.array(n_grams, dtype=np.int64),
                "n_hot": np.array(n_hot, dtype=np.int64),
            }
        )

    empty = pa.schema(
        [("doc_id", pa.int64()), ("n_grams", pa.int64()), ("n_hot", pa.int64())]
    )
    return collect_table(
        _read(sf_dir, ["doc_id", "text"]).map_batches(scan, batch_format="pandas"),
        empty,
    )


# ---- temperature-scaled domain mixture sampling ---------------------------

# Keep rate per domain (lang): sqrt(c_min / c_lang) — temperature
# alpha = 0.5 rebalancing toward uniform (the multilingual-training
# mixture law: small domains keep everything, large domains are
# down-sampled toward the smallest). sqrt and the int ratio division
# are exactly rounded under IEEE-754, so numpy and DuckDB compute
# bit-identical thresholds — which keeps the hash-threshold keep
# decision deterministic across engines (a pow() exponent would NOT
# guarantee that: libm pow differs by ulps across implementations).
MIX_SCALE = 4294967296.0  # 2^32: hash prefix domain


# ---- unigram-LM surprisal (CCNet-style quality scoring) -------------------

LM_VOCAB = 16  # top-tf terms admitted to the unigram LM; the rest → OOV


def q_unigram_surprisal(sf_dir: str) -> pa.Table:
    """CCNet-style unigram-LM quality scoring: train a unigram language
    model on the corpus itself (top-``LM_VOCAB`` terms by total tf,
    deterministic (tf desc, term asc) truncation; all remaining mass
    folds into one OOV symbol), then score every document by its total
    token surprisal. Documents full of rare/OOV tokens score high —
    the classic perplexity-bucket quality filter of a web-scale
    training-data pipeline (CCNet; Gopher's quality pipeline).

    Gate exactness: the per-token cost is the INTEGER
    ``round(ln(total/tf)·1e6)`` so the per-doc sum is an int64 —
    order-independent and float-rounding-free across engines (the only
    float op is one ln per DISTINCT vocab term, identical expression
    in the SQL oracle).

    Scale shape: pass 1 emits vocab-bounded per-batch partial tf
    counts and merges the bounded (term, tf) table driver-side —
    while vocab is bounded this is exact and cheap; at true web scale
    the merge swaps to the same distributed ``groupby(term).sum`` the
    index build's global-df pass already uses (build.py), truncation
    semantics unchanged. Pass 2 broadcasts the ≤(LM_VOCAB+1)-entry
    cost map once via ``ray.put`` and streams the corpus with a
    flattened vectorized lookup + segment-sum — no shuffle.
    """
    import itertools

    def tf_partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.lower().str.findall(_TOK2_RE)
        cnt: dict[str, int] = {}
        for ts in toks:
            for t in ts:
                cnt[t] = cnt.get(t, 0) + 1
        return pd.DataFrame(
            {"term": list(cnt), "tf": np.fromiter(cnt.values(), dtype=np.int64, count=len(cnt))}
        )

    tf_empty = pa.schema([("term", pa.string()), ("tf", pa.int64())])
    tf_tbl = (
        collect_table(
            _read(sf_dir, ["text"]).map_batches(tf_partial, batch_format="pandas"),
            tf_empty,
        )
        .to_pandas()
        .groupby("term", as_index=False)["tf"]
        .sum()
    )
    total = int(tf_tbl["tf"].sum())
    top = (
        tf_tbl.sort_values(["tf", "term"], ascending=[False, True])
        .head(LM_VOCAB)
        .reset_index(drop=True)
    )
    oov_tf = max(total - int(top["tf"].sum()), 1)
    denom = float(total) if total else 1.0
    cmap = {
        t: int(np.round(np.log(denom / float(tf)) * 1e6))
        for t, tf in zip(top["term"], top["tf"])
    }
    oov_cost = int(np.round(np.log(denom / float(oov_tf)) * 1e6))
    cmap_ref = ray.put(cmap)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        cm: dict[str, int] = ray.get(cmap_ref)
        toks = batch["text"].str.lower().str.findall(_TOK2_RE)
        lens = toks.str.len().to_numpy(dtype=np.int64)
        flat = list(itertools.chain.from_iterable(toks))
        costs = np.fromiter(
            (cm.get(t, oov_cost) for t in flat), dtype=np.int64, count=len(flat)
        )
        oovs = np.fromiter((t not in cm for t in flat), dtype=np.int64, count=len(flat))
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        # np.add.reduceat misbehaves on zero-length segments: guard by
        # masking them to 0 afterwards
        cost_sum = np.where(
            lens > 0, np.add.reduceat(np.concatenate((costs, [0])), starts), 0
        ).astype(np.int64)
        oov_sum = np.where(
            lens > 0, np.add.reduceat(np.concatenate((oovs, [0])), starts), 0
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype("int64"),
                "lang": batch["lang"],
                "n_tokens": lens,
                "n_oov": oov_sum,
                "cost_micro": cost_sum,
            }
        )

    empty = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("lang", pa.string()),
            ("n_tokens", pa.int64()),
            ("n_oov", pa.int64()),
            ("cost_micro", pa.int64()),
        ]
    )
    return collect_table(
        _read(sf_dir, ["doc_id", "lang", "text"]).map_batches(score, batch_format="pandas"),
        empty,
    )


BG_VOCAB = 256  # kept bigrams (bc desc, pair asc); the rest back off
BG_INV_ALPHA = 2.5  # stupid-backoff 1/α (α = 0.4, Brants et al. 2007)
LM_OOV = "<oov>"


def q_bigram_surprisal(sf_dir: str) -> pa.Table:
    """Bigram-LM quality scoring with STUPID BACKOFF (Brants et al.
    2007, "Large Language Models in Machine Translation") — the step
    past :func:`q_unigram_surprisal` that a KenLM-style perplexity
    filter actually runs: tokens fold into the same top-``LM_VOCAB``
    + OOV alphabet, a bigram table over the folded alphabet keeps the
    top ``BG_VOCAB`` pairs, and each token costs
      - pos 0:            ln(total / tf(cur))          (unigram start)
      - kept bigram:      ln(tf(prev) / bc(prev,cur))  (conditional)
      - otherwise:        ln((1/α) · total / tf(cur))  (backoff)
    in integer micro-nats, so per-doc sums are order-independent
    int64s and the only float op per DISTINCT symbol/pair is one ln —
    the same exactness discipline as the unigram gate.

    Scale shape: pass 1 merges vocab-bounded per-batch tf partials;
    pass 2 merges per-batch bigram partials BOUNDED BY THE FOLDED
    ALPHABET (≤ (LM_VOCAB+1)² pairs per batch, no raw-vocabulary
    blowup — folding happens before counting); pass 3 broadcasts the
    three bounded cost maps once and streams the corpus shuffle-free.
    At web scale passes 1-2 swap their driver merges for the same
    ``groupby().sum`` the build's global-df pass uses; truncation
    semantics unchanged."""

    # pass 1: unigram tf → vocab + folded counts (total stays exact)
    def tf_partial(batch: pd.DataFrame) -> pd.DataFrame:
        cnt: dict[str, int] = {}
        for ts in batch["text"].str.lower().str.findall(_TOK2_RE):
            for t in ts:
                cnt[t] = cnt.get(t, 0) + 1
        return pd.DataFrame(
            {"term": list(cnt), "tf": np.fromiter(cnt.values(), dtype=np.int64, count=len(cnt))}
        )

    tf_empty = pa.schema([("term", pa.string()), ("tf", pa.int64())])
    tf_tbl = (
        collect_table(
            _read(sf_dir, ["text"]).map_batches(tf_partial, batch_format="pandas"),
            tf_empty,
        )
        .to_pandas()
        .groupby("term", as_index=False)["tf"]
        .sum()
    )
    total = float(int(tf_tbl["tf"].sum()))
    top = (
        tf_tbl.sort_values(["tf", "term"], ascending=[False, True])
        .head(LM_VOCAB)
        .reset_index(drop=True)
    )
    vocab = set(top["term"])
    ftf = {t: int(tf) for t, tf in zip(top["term"], top["tf"])}
    ftf[LM_OOV] = max(int(total) - int(top["tf"].sum()), 1)
    vocab_ref = ray.put(vocab)

    # pass 2: bigram counts over the FOLDED alphabet (bounded partials)
    def bg_partial(batch: pd.DataFrame) -> pd.DataFrame:
        vset: set[str] = ray.get(vocab_ref)
        cnt: dict[tuple[str, str], int] = {}
        for ts in batch["text"].str.lower().str.findall(_TOK2_RE):
            prev = None
            for t in ts:
                cur = t if t in vset else LM_OOV
                if prev is not None:
                    cnt[(prev, cur)] = cnt.get((prev, cur), 0) + 1
                prev = cur
        return pd.DataFrame(
            {
                "prev": [p for p, _ in cnt],
                "cur": [c for _, c in cnt],
                "bc": np.fromiter(cnt.values(), dtype=np.int64, count=len(cnt)),
            }
        )

    bg_empty = pa.schema([("prev", pa.string()), ("cur", pa.string()), ("bc", pa.int64())])
    bgc = (
        collect_table(
            _read(sf_dir, ["text"]).map_batches(bg_partial, batch_format="pandas"),
            bg_empty,
        )
        .to_pandas()
        .groupby(["prev", "cur"], as_index=False)["bc"]
        .sum()
        .sort_values(["bc", "prev", "cur"], ascending=[False, True, True])
        .head(BG_VOCAB)
    )

    # bounded integer cost maps, broadcast once
    uni_c = {t: int(np.round(np.log(total / float(tf)) * 1e6)) for t, tf in ftf.items()}
    back_c = {
        t: int(np.round(np.log(BG_INV_ALPHA * total / float(tf)) * 1e6))
        for t, tf in ftf.items()
    }
    bg_c = {
        (p, c): int(np.round(np.log(float(ftf[p]) / float(bc)) * 1e6))
        for p, c, bc in zip(bgc["prev"], bgc["cur"], bgc["bc"])
    }
    model_ref = ray.put((vocab, uni_c, back_c, bg_c))

    # pass 3: shuffle-free scoring scan
    def score(batch: pd.DataFrame) -> pd.DataFrame:
        vset, uc, bkc, bc = ray.get(model_ref)
        doc_ids, n_toks, n_backs, costs = [], [], [], []
        for doc_id, ts in zip(
            batch["doc_id"].astype("int64"),
            batch["text"].str.lower().str.findall(_TOK2_RE),
        ):
            if not len(ts):
                continue  # empty docs have no rows in the SQL oracle
            cost = 0
            n_back = 0
            prev = None
            for t in ts:
                cur = t if t in vset else LM_OOV
                if prev is None:
                    cost += uc[cur]
                elif (prev, cur) in bc:
                    cost += bc[(prev, cur)]
                else:
                    cost += bkc[cur]
                    n_back += 1
                prev = cur
            doc_ids.append(int(doc_id))
            n_toks.append(len(ts))
            n_backs.append(n_back)
            costs.append(cost)
        return pd.DataFrame(
            {
                "doc_id": pd.Series(doc_ids, dtype="int64"),
                "n_tokens": pd.Series(n_toks, dtype="int64"),
                "n_backoff": pd.Series(n_backs, dtype="int64"),
                "cost_micro": pd.Series(costs, dtype="int64"),
            }
        )

    empty = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_tokens", pa.int64()),
            ("n_backoff", pa.int64()),
            ("cost_micro", pa.int64()),
        ]
    )
    return collect_table(
        _read(sf_dir, ["doc_id", "text"]).map_batches(score, batch_format="pandas"),
        empty,
    )


def q_mixture_sample(sf_dir: str) -> pa.Table:
    """Deterministic domain-mixture rebalancing: per-lang keep
    threshold from the temperature-scaled rate, membership decided by
    the first 8 hex digits of sha256(text) — reproducible across runs,
    engines, and corpus repartitioning.

    Scale shape: pass 1 is a per-batch bounded (lang → count) partial
    reduced on the driver (|langs| rows); thresholds broadcast via
    ``ray.put``; pass 2 is a shuffle-free embarrassingly parallel scan.
    """

    def lang_counts(batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.groupby("lang", sort=False, as_index=False).size()
        return out.rename(columns={"size": "cnt"})

    cnt_empty = pa.schema([("lang", pa.string()), ("cnt", pa.int64())])
    counts = (
        collect_table(
            _read(sf_dir, ["lang"]).map_batches(lang_counts, batch_format="pandas"),
            cnt_empty,
        )
        .to_pandas()
        .groupby("lang", as_index=False)["cnt"]
        .sum()
    )
    cmin = float(counts["cnt"].min())
    thr = {
        r["lang"]: int(np.floor(np.sqrt(cmin / float(r["cnt"])) * MIX_SCALE))
        for _, r in counts.iterrows()
    }
    thr_ref = ray.put(thr)

    def scan(batch: pd.DataFrame) -> pd.DataFrame:
        t = ray.get(thr_ref)
        hv = np.array(
            [int(s[:8], 16) for s in sha256_hex(batch["text"].tolist())],
            dtype=np.int64,
        )
        thr_col = batch["lang"].map(t).to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype("int64"),
                "lang": batch["lang"],
                "kept": (hv < thr_col).astype("int64"),
            }
        )

    empty = pa.schema(
        [("doc_id", pa.int64()), ("lang", pa.string()), ("kept", pa.int64())]
    )
    return collect_table(
        _read(sf_dir, ["doc_id", "lang", "text"]).map_batches(
            scan, batch_format="pandas"
        ),
        empty,
    )


# ---- token-budget data selection ------------------------------------------

BUDGET_NUM, BUDGET_DEN = 2, 5  # keep the best 40% of corpus tokens
BUDGET_SCORE_W = 1024          # score-range width per selection bucket


def q_budget_select(sf_dir: str) -> pa.Table:
    """Quality-ordered data selection under a global TOKEN BUDGET: rank
    every document by an integer quality score (token density,
    micro-tokens-per-char — deterministic, engine-portable) and keep
    the maximal prefix of the (score desc, doc_id asc) ordering whose
    cumulative token count fits ``2/5`` of the corpus's total tokens.
    This is the "spend my training budget on the best data" selection
    pass (e.g. phi-style quality-first curation) that follows scoring.

    Scale shape — the same two-phase distributed ordered scan as
    ``sequence_pack``, but ordered by SCORE instead of doc_id:
      1. one corpus pass emits (doc_id, n_tokens, score, sbucket =
         score // W); a tiny groupby(sbucket).sum gives per-bucket
         token totals,
      2. the driver cumsums the BUCKET table in descending-score order
         only (|score range|/W rows) and broadcasts (offsets, budget),
      3. each bucket group sorts locally by (score desc, doc_id),
         adds its global offset, and cuts at the budget; buckets whose
         offset already exceeds the budget emit nothing (pruned).
    No row-level data reaches the driver; the cut lands mid-bucket
    without any global sort or shuffle of the rows themselves."""

    def stats(batch: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.compute as _pc

        doc_id = batch["doc_id"].astype("int64")
        # count-only tokenization via the Arrow RE2 kernel (greedy runs
        # == findall's maximal runs); the rest stays integer numpy
        toks = pd.Series(
            _pc.count_substring_regex(
                _pc.utf8_lower(pa.array(batch["text"])), _TOK2_RE.pattern
            ).to_numpy(zero_copy_only=False).astype(np.int64),
            index=batch.index,
        )
        nch = batch["n_chars"].astype("int64").clip(lower=1)
        score = (toks * 1_000_000) // nch
        return pd.DataFrame(
            {
                "doc_id": doc_id,
                "n_tokens": toks,
                "score": score,
                "sbucket": (score // BUDGET_SCORE_W).astype("int64"),
            }
        )

    scored = _read(sf_dir, ["doc_id", "text", "n_chars"]).map_batches(
        stats, batch_format="pandas"
    ).materialize()

    sums = scored.groupby("sbucket").sum("n_tokens").to_pandas()
    sums = sums.sort_values("sbucket", ascending=False).reset_index(drop=True)
    tot = sums["sum(n_tokens)"].to_numpy(dtype=np.int64)
    budget = int(tot.sum()) * BUDGET_NUM // BUDGET_DEN
    offsets = dict(
        zip(
            sums["sbucket"].astype(np.int64),
            np.concatenate([[0], np.cumsum(tot)[:-1]]),
        )
    )
    ctx_ref = ray.put((offsets, budget))

    def bucket_cut(g: pd.DataFrame) -> pd.DataFrame:
        offs, bud = ray.get(ctx_ref)
        start = int(offs[int(g["sbucket"].iloc[0])])
        cols = ["doc_id", "n_tokens", "score"]
        if start >= bud:  # bucket entirely past the budget cut
            return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols + ["cum_tokens"]})
        g = g.sort_values(["score", "doc_id"], ascending=[False, True]).reset_index(drop=True)
        cum = start + np.cumsum(g["n_tokens"].to_numpy(dtype=np.int64))
        keep = cum <= bud
        out = g.loc[keep, cols].copy()
        out["cum_tokens"] = cum[keep]
        return out

    empty = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_tokens", pa.int64()),
            ("score", pa.int64()),
            ("cum_tokens", pa.int64()),
        ]
    )
    return collect_table(
        scored.groupby("sbucket").map_groups(bucket_cut, batch_format="pandas"),
        empty,
    )


# ---- registration --------------------------------------------------------

# SIMPLE_TOK_SQL is re-declared here (not imported) to avoid a cycle
# with pipelines.documents at module-import time.
_TOK_SQL = "list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), t -> length(t) >= 2)"

ORACLE_SQL = {
    "dataset_split": f"""
        SELECT doc_id,
               CASE WHEN substr(sha256(text), 1, 8) < '{SPLIT_TRAIN_MAX}' THEN 'train'
                    WHEN substr(sha256(text), 1, 8) < '{SPLIT_VAL_MAX}' THEN 'val'
                    ELSE 'test' END AS split,
               substr(sha256(text), 1, 8) AS sha_prefix
        FROM documents
    """,
    "sequence_pack": f"""
        WITH t AS (
          SELECT doc_id, len({_TOK_SQL})::BIGINT AS n_tokens FROM documents
        ), s AS (
          SELECT doc_id, n_tokens,
                 coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
                   AS start_token
          FROM t
        )
        SELECT doc_id, n_tokens, start_token,
               (start_token // {PACK_BUDGET})::BIGINT AS pack_id
        FROM s
    """,
    "budget_select": f"""
        WITH t AS (
          SELECT doc_id,
                 len({_TOK_SQL})::BIGINT AS n_tokens,
                 ((len({_TOK_SQL})::BIGINT * 1000000) // greatest(n_chars, 1))::BIGINT AS score
          FROM documents
        ), b AS (
          SELECT (SELECT sum(n_tokens) FROM t) * {BUDGET_NUM} // {BUDGET_DEN} AS budget
        ), c AS (
          SELECT doc_id, n_tokens, score,
                 sum(n_tokens) OVER (ORDER BY score DESC, doc_id ASC
                          ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_tokens
          FROM t
        )
        SELECT doc_id, n_tokens, score, cum_tokens FROM c, b WHERE cum_tokens <= budget
    """,
    "length_quantiles": f"""
        SELECT lang, count(*)::BIGINT AS n,
               {", ".join(
                   f"percentile_disc({q}) WITHIN GROUP (ORDER BY n_chars)::BIGINT AS q{int(q * 100)}"
                   for q in QUANTILES
               )}
        FROM documents GROUP BY lang
    """,
    "tfidf_top_terms": f"""
        WITH tok AS (
          SELECT doc_id, t.term FROM documents, unnest({_TOK_SQL}) AS t(term)
        ),
        tf AS (SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok GROUP BY doc_id, term),
        df AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df FROM tok GROUP BY term),
        n AS (SELECT count(*)::DOUBLE AS n FROM documents),
        s AS (
          SELECT tf.doc_id, tf.term, round(tf.tf * ln(n.n / df.df), 6) AS tfidf
          FROM tf JOIN df USING (term) CROSS JOIN n
        ),
        r AS (
          SELECT doc_id, term, tfidf,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY tfidf DESC, term ASC) - 1 AS rank
          FROM s
        )
        SELECT doc_id::BIGINT AS doc_id, term, tfidf, rank::BIGINT AS rank
        FROM r WHERE rank < {TFIDF_K}
    """,
    "decontaminate": f"""
        WITH qdoc AS (
          SELECT list_slice({_TOK_SQL}, 1, {DECON_PREFIX}) AS toks
          FROM documents WHERE doc_id % {DECON_MOD} = 0
        ),
        qgram AS (
          SELECT DISTINCT g FROM (
            SELECT unnest(list_transform(
                     generate_series(1, greatest(len(toks) - {DECON_N - 1}, 0)),
                     i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS g
            FROM qdoc
          )
        ),
        ddoc AS (SELECT doc_id, {_TOK_SQL} AS toks FROM documents),
        dgram AS (
          SELECT DISTINCT doc_id, g FROM (
            SELECT doc_id,
                   unnest(list_transform(
                     generate_series(1, greatest(len(toks) - {DECON_N - 1}, 0)),
                     i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS g
            FROM ddoc
          )
        ),
        h AS (
          SELECT doc_id, count(*)::BIGINT AS n_hits
          FROM dgram JOIN qgram USING (g) GROUP BY doc_id
        )
        SELECT d.doc_id, coalesce(h.n_hits, 0)::BIGINT AS n_hits,
               (coalesce(h.n_hits, 0) > 0)::BIGINT AS contaminated
        FROM documents d LEFT JOIN h USING (doc_id)
    """,
    "repetition_stats": f"""
        WITH t AS (
          SELECT doc_id, unnest({_TOK_SQL}) AS term FROM documents
        ),
        c AS (SELECT doc_id, term, count(*)::BIGINT AS cnt FROM t GROUP BY doc_id, term),
        a AS (
          SELECT doc_id, sum(cnt)::BIGINT AS n_tokens, count(*)::BIGINT AS n_distinct,
                 max(cnt)::BIGINT AS top_tf
          FROM c GROUP BY doc_id
        )
        SELECT d.doc_id, coalesce(a.n_tokens, 0)::BIGINT AS n_tokens,
               coalesce(a.n_distinct, 0)::BIGINT AS n_distinct,
               coalesce(a.top_tf, 0)::BIGINT AS top_tf
        FROM documents d LEFT JOIN a USING (doc_id)
    """,
    "stratified_sample": f"""
        SELECT doc_id, lang, sha, rank FROM (
          SELECT doc_id, lang, sha256(text) AS sha,
                 row_number() OVER (PARTITION BY lang
                                    ORDER BY sha256(text) ASC, doc_id ASC) - 1 AS rank
          FROM documents
        ) WHERE rank < {STRAT_K}
    """,
    "term_cooccurrence": f"""
        WITH tok AS (
          SELECT DISTINCT doc_id, term FROM (
            SELECT doc_id, unnest({_TOK_SQL}) AS term FROM documents
          )
        ),
        df AS (SELECT term, count(*)::BIGINT AS df FROM tok GROUP BY term),
        vocab AS (SELECT term, df FROM df ORDER BY df DESC, term ASC LIMIT {COOC_VOCAB}),
        vt AS (SELECT t.doc_id, t.term FROM tok t JOIN vocab USING (term)),
        pairs AS (
          SELECT a.term AS term_a, b.term AS term_b, count(*)::BIGINT AS n_ab
          FROM vt a JOIN vt b ON a.doc_id = b.doc_id AND a.term < b.term
          GROUP BY a.term, b.term
        ),
        ranked AS (
          SELECT term_a, term_b, n_ab,
                 row_number() OVER (ORDER BY n_ab DESC, term_a ASC, term_b ASC) - 1 AS rank
          FROM pairs
        )
        SELECT r.term_a, r.term_b, r.n_ab, va.df AS n_a, vb.df AS n_b, r.rank
        FROM ranked r
        JOIN vocab va ON va.term = r.term_a
        JOIN vocab vb ON vb.term = r.term_b
        WHERE r.rank < {COOC_TOPK}
    """,
}

# shared n-gram CTE body for the hot-passage oracles (HOT_N-wide
# concatenation built programmatically so the constant stays in one place)
_HOT_CONCAT = " || ' ' || ".join(f"toks[i + {j}]" for j in range(HOT_N))
_HOT_GRAMS_CTE = f"""
d AS (SELECT doc_id, {_TOK_SQL} AS toks FROM documents),
g AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, greatest(len(toks) - {HOT_N - 1}, 0)),
           i -> {_HOT_CONCAT})) AS gram
  FROM d
),
agg AS (
  SELECT gram, count(DISTINCT doc_id)::BIGINT AS n_docs, count(*)::BIGINT AS n_occ
  FROM g GROUP BY gram
),
ranked AS (
  SELECT gram, n_docs, n_occ,
         row_number() OVER (ORDER BY n_docs DESC, n_occ DESC, gram ASC) - 1 AS rank
  FROM agg WHERE n_docs >= {HOT_MIN_DOCS}
)
"""

ORACLE_SQL["hot_ngrams"] = f"""
WITH {_HOT_GRAMS_CTE}
SELECT gram, n_docs, n_occ, rank FROM ranked WHERE rank < {HOT_TOPK}
"""

ORACLE_SQL["hot_ngram_coverage"] = f"""
WITH {_HOT_GRAMS_CTE},
hot AS (SELECT gram FROM ranked WHERE rank < {HOT_TOPK}),
cov AS (SELECT g.doc_id, count(*)::BIGINT AS n_hot FROM g JOIN hot USING (gram) GROUP BY g.doc_id),
tot AS (SELECT doc_id, count(*)::BIGINT AS n_grams FROM g GROUP BY doc_id)
SELECT d0.doc_id, coalesce(tot.n_grams, 0)::BIGINT AS n_grams,
       coalesce(cov.n_hot, 0)::BIGINT AS n_hot
FROM documents d0
LEFT JOIN tot USING (doc_id)
LEFT JOIN cov USING (doc_id)
"""

ORACLE_SQL["unigram_surprisal"] = f"""
    WITH tok AS (
      SELECT doc_id, t.term FROM documents, unnest({_TOK_SQL}) AS t(term)
    ),
    tf AS (SELECT term, count(*)::BIGINT AS tf FROM tok GROUP BY term),
    tot AS (SELECT sum(tf)::DOUBLE AS total FROM tf),
    ranked AS (
      SELECT term, tf, row_number() OVER (ORDER BY tf DESC, term ASC) AS r FROM tf
    ),
    vocab AS (SELECT term, tf FROM ranked WHERE r <= {LM_VOCAB}),
    oov AS (
      SELECT greatest((SELECT sum(tf) FROM tf) - (SELECT sum(tf) FROM vocab), 1)::DOUBLE AS otf
    ),
    cost AS (
      SELECT term, round(ln(total / tf::DOUBLE) * 1000000)::BIGINT AS c
      FROM vocab CROSS JOIN tot
    ),
    oov_cost AS (
      SELECT round(ln(total / otf) * 1000000)::BIGINT AS oc FROM oov CROSS JOIN tot
    ),
    scored AS (
      SELECT t.doc_id,
             coalesce(c.c, (SELECT oc FROM oov_cost)) AS c,
             CASE WHEN c.c IS NULL THEN 1 ELSE 0 END AS is_oov
      FROM tok t LEFT JOIN cost c USING (term)
    ),
    per_doc AS (
      SELECT doc_id, count(*)::BIGINT AS n_tokens, sum(is_oov)::BIGINT AS n_oov,
             sum(c)::BIGINT AS cost_micro
      FROM scored GROUP BY doc_id
    )
    SELECT d.doc_id, d.lang,
           coalesce(p.n_tokens, 0)::BIGINT AS n_tokens,
           coalesce(p.n_oov, 0)::BIGINT AS n_oov,
           coalesce(p.cost_micro, 0)::BIGINT AS cost_micro
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""

ORACLE_SQL["bigram_surprisal"] = f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOK_SQL}) AS term,
             generate_subscripts({_TOK_SQL}, 1) AS pos
      FROM documents
    ),
    tf AS (SELECT term, count(*)::BIGINT AS tf FROM tok GROUP BY term),
    tot AS (SELECT sum(tf)::DOUBLE AS total FROM tf),
    ranked AS (
      SELECT term, tf, row_number() OVER (ORDER BY tf DESC, term ASC) AS r FROM tf
    ),
    vocab AS (SELECT term, tf FROM ranked WHERE r <= {LM_VOCAB}),
    ftok AS (
      SELECT t.doc_id, t.pos,
             CASE WHEN v.term IS NULL THEN '{LM_OOV}' ELSE t.term END AS term
      FROM tok t LEFT JOIN vocab v USING (term)
    ),
    funi AS (
      SELECT term, greatest(count(*), 1)::BIGINT AS tf FROM ftok GROUP BY term
    ),
    bg AS (
      SELECT a.doc_id, a.pos, b.term AS prev, a.term AS cur
      FROM ftok a JOIN ftok b ON a.doc_id = b.doc_id AND a.pos = b.pos + 1
    ),
    bgc AS (SELECT prev, cur, count(*)::BIGINT AS bc FROM bg GROUP BY prev, cur),
    rankedb AS (
      SELECT prev, cur, bc,
             row_number() OVER (ORDER BY bc DESC, prev ASC, cur ASC) AS r
      FROM bgc
    ),
    kept AS (SELECT prev, cur, bc FROM rankedb WHERE r <= {BG_VOCAB}),
    scored AS (
      SELECT f.doc_id,
             CASE
               WHEN f.pos = 1
                 THEN round(ln(total / fu.tf::DOUBLE) * 1000000)::BIGINT
               WHEN k.bc IS NOT NULL
                 THEN round(ln(fp.tf::DOUBLE / k.bc::DOUBLE) * 1000000)::BIGINT
               ELSE round(ln({BG_INV_ALPHA} * total / fu.tf::DOUBLE) * 1000000)::BIGINT
             END AS c,
             CASE WHEN f.pos > 1 AND k.bc IS NULL THEN 1 ELSE 0 END AS is_backoff
      FROM ftok f
      CROSS JOIN tot
      JOIN funi fu ON fu.term = f.term
      LEFT JOIN bg g ON g.doc_id = f.doc_id AND g.pos = f.pos
      LEFT JOIN funi fp ON fp.term = g.prev
      LEFT JOIN kept k ON k.prev = g.prev AND k.cur = f.term
    )
    SELECT doc_id, count(*)::BIGINT AS n_tokens,
           sum(is_backoff)::BIGINT AS n_backoff,
           sum(c)::BIGINT AS cost_micro
    FROM scored GROUP BY doc_id
"""

# ---- corpus data card -------------------------------------------------------


VOCAB_GROWTH_STEPS = (50, 100, 200, 300, 400, 500, 1000, 5000, 50000)


def q_vocab_growth(sf_dir: str) -> pa.Table:
    """Vocabulary-growth curve (Heaps' law): distinct terms among the
    first N documents (doc_id < N), for a fixed threshold ladder — the
    corpus-analysis pass that tells a pipeline when vocabulary stops
    growing. The inherently-sequential prefix scan is rewritten as a
    pure aggregation: a term's FIRST-SEEN doc_id (groupby(term).min)
    turns each threshold into a count, so the shuffle is bounded by
    the vocabulary and the thresholds cost one vectorized histogram."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows: dict[str, int] = {}
        for did, toks in zip(
            batch["doc_id"].astype("int64"),
            batch["text"].str.lower().str.findall(r"[a-z0-9]{2,}"),
        ):
            for t in set(toks):
                cur = rows.get(t)
                if cur is None or did < cur:
                    rows[t] = int(did)
        return pd.DataFrame(
            {"term": list(rows), "first_seen": np.fromiter(rows.values(), dtype=np.int64,
                                                           count=len(rows))}
        )

    from ..collect import collect_table

    empty = pa.schema([("term", pa.string()), ("first_seen", pa.int64())])
    parts = collect_table(
        _read(sf_dir, ["doc_id", "text"]).map_batches(partial, batch_format="pandas"),
        empty,
    ).to_pandas()
    first = parts.groupby("term")["first_seen"].min().to_numpy(dtype="int64")
    steps = np.asarray(VOCAB_GROWTH_STEPS, dtype=np.int64)
    counts = (first[None, :] < steps[:, None]).sum(axis=1).astype("int64")
    return pa.table(
        {
            "n_docs": pa.array(steps, type=pa.int64()),
            "n_distinct_terms": pa.array(counts, type=pa.int64()),
        }
    )


def q_term_freq_spectrum(sf_dir: str) -> pa.Table:
    """Term-frequency spectrum: how many distinct terms occur exactly
    k times in the corpus, k = 1..10 plus an 11+ bucket (hapax/dis
    legomena counts — the lexicographic health check for tokenizer and
    dedup decisions). One (term → total tf) aggregation bounded by the
    vocabulary, then a constant histogram."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        cnt: dict[str, int] = {}
        for toks in batch["text"].str.lower().str.findall(r"[a-z0-9]{2,}"):
            for t in toks:
                cnt[t] = cnt.get(t, 0) + 1
        return pd.DataFrame(
            {"term": list(cnt), "tf": np.fromiter(cnt.values(), dtype=np.int64,
                                                  count=len(cnt))}
        )

    from ..collect import collect_table

    empty = pa.schema([("term", pa.string()), ("tf", pa.int64())])
    parts = collect_table(
        _read(sf_dir, ["text"]).map_batches(partial, batch_format="pandas"), empty
    ).to_pandas()
    tf = parts.groupby("term")["tf"].sum().to_numpy(dtype="int64")
    k = np.clip(tf, 1, 11)
    ks = np.arange(1, 12, dtype=np.int64)
    counts = (k[None, :] == ks[:, None]).sum(axis=1).astype("int64")
    return pa.table(
        {"tf_bucket": pa.array(ks, type=pa.int64()),
         "n_terms": pa.array(counts, type=pa.int64())}
    )


PMI_MIN_COUNT = 25
PMI_TOPK = 20


def q_pmi_collocations(sf_dir: str) -> pa.Table:
    """Collocation extraction: top adjacent-bigram associations by
    pointwise mutual information — ``pmi = ln(N·c_xy / (c_x·c_y))``
    over within-document adjacent token pairs (N = total bigram count)
    — the phrase-mining pass that feeds tokenizer merge candidates and
    stopword diagnostics. Bigrams below ``PMI_MIN_COUNT`` are dropped
    (the standard sparsity floor, part of the definition and the
    oracle). Integer exactness: pmi is reported as int64 micro-nats
    computed from exact integer counts by one identical float
    expression on both engines.

    Scale shape: per-batch partial (x, y, count) tables are bounded by
    the batch's bigram vocabulary (combined like the df sidecars);
    unigram counts ride the same pass. The testdata vocabulary is
    tiny, so the driver combine is the honest gate shape — at 100 TB
    the combine is the hot_ngrams bucket groupby."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        uni: dict[str, int] = {}
        bi: dict[tuple[str, str], int] = {}
        for toks in batch["text"].str.lower().str.findall(r"[a-z0-9]{2,}"):
            for t in toks:
                uni[t] = uni.get(t, 0) + 1
            for a, b in zip(toks, toks[1:]):
                bi[(a, b)] = bi.get((a, b), 0) + 1
        rows_x, rows_y, rows_c, kind = [], [], [], []
        for t, c in uni.items():
            rows_x.append(t); rows_y.append(""); rows_c.append(c); kind.append(0)
        for (a, b), c in bi.items():
            rows_x.append(a); rows_y.append(b); rows_c.append(c); kind.append(1)
        return pd.DataFrame(
            {"x": rows_x, "y": rows_y,
             "c": np.asarray(rows_c, dtype=np.int64),
             "kind": np.asarray(kind, dtype=np.int64)}
        )

    from ..collect import collect_table

    empty = pa.schema([("x", pa.string()), ("y", pa.string()),
                       ("c", pa.int64()), ("kind", pa.int64())])
    parts = collect_table(
        _read(sf_dir, ["text"]).map_batches(partial, batch_format="pandas"), empty
    ).to_pandas()
    uni = parts[parts.kind == 0].groupby("x")["c"].sum()
    bi = parts[parts.kind == 1].groupby(["x", "y"])["c"].sum().reset_index()
    bi = bi[bi["c"] >= PMI_MIN_COUNT]
    n_bi = int(parts.loc[parts.kind == 1, "c"].sum())
    cx = uni.reindex(bi["x"]).to_numpy(dtype="int64")
    cy = uni.reindex(bi["y"]).to_numpy(dtype="int64")
    cxy = bi["c"].to_numpy(dtype="int64")
    # one float expression over exact ints — identical on both engines
    pmi_micro = np.round(
        np.log(n_bi * cxy.astype(np.float64) / (cx.astype(np.float64) * cy)) * 1e6
    ).astype(np.int64)
    out = pd.DataFrame(
        {"left": bi["x"].to_numpy(), "right": bi["y"].to_numpy(),
         "pair_count": cxy, "pmi_micro": pmi_micro}
    ).sort_values(["pmi_micro", "left", "right"],
                  ascending=[False, True, True]).head(PMI_TOPK).reset_index(drop=True)
    out["rank"] = np.arange(len(out), dtype=np.int64)
    return pa.Table.from_pandas(
        out[["rank", "left", "right", "pair_count", "pmi_micro"]], preserve_index=False
    )


MASK_MUL, MASK_STEP, MASK_MOD, MASK_PCT = 2654435761, 40503, 1000, 150


def q_span_corruption(sf_dir: str) -> pa.Table:
    """Masked-LM / span-corruption example statistics (the BERT/T5
    data-generation pass): each token position masks deterministically
    — ``(doc_id·{mul} + pos·{step}) % {mod} < {pct}`` (15 % noise
    density), pure integer arithmetic so the mask is reproducible
    across runs, engines and cluster sizes — and adjacent masked
    positions merge into SPANS (the T5 objective's sentinel unit).
    Emits per doc: n_tokens, n_masked, n_spans, corruption ppm.
    Fully vectorized; one streaming map, no shuffle."""

    def stats(batch: pd.DataFrame) -> pd.DataFrame:
        out_n, out_m, out_s = [], [], []
        dids = batch["doc_id"].astype("int64").to_numpy()
        for did, toks in zip(
            dids, batch["text"].str.lower().str.findall(r"[a-z0-9]{2,}")
        ):
            n = len(toks)
            pos = np.arange(n, dtype=np.int64)
            masked = (did * MASK_MUL + pos * MASK_STEP) % MASK_MOD < MASK_PCT
            n_m = int(masked.sum())
            # span starts: masked positions whose predecessor is unmasked
            starts = masked & ~np.concatenate([[False], masked[:-1]])
            out_n.append(n)
            out_m.append(n_m)
            out_s.append(int(starts.sum()))
        n_arr = np.asarray(out_n, dtype=np.int64)
        m_arr = np.asarray(out_m, dtype=np.int64)
        return pd.DataFrame(
            {
                "doc_id": dids,
                "n_tokens": n_arr,
                "n_masked": m_arr,
                "n_spans": np.asarray(out_s, dtype=np.int64),
                "corruption_ppm": np.where(
                    n_arr > 0, m_arr * 1_000_000 // np.maximum(n_arr, 1), 0
                ).astype(np.int64),
            }
        )

    out = (
        _read(sf_dir, ["doc_id", "text"])
        .map_batches(stats, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(out, preserve_index=False)


SHUFFLE_SEED = "ep0"


def q_corpus_shuffle(sf_dir: str) -> pa.Table:
    """Deterministic SEEDED corpus shuffle — the training-order pass
    that fixes an epoch's document order reproducibly across runs,
    engines and cluster sizes (``ds.random_shuffle`` is none of
    those): the shuffle key is sha256(seed ':' text), the order is
    (key asc, doc_id asc), and changing the seed re-deals the order.

    Scale shape: one map_batches computes keys, ``Dataset.sort`` does
    the all-to-all range exchange, and a training writer would stream
    the sorted blocks straight to partitioned output (ranks implicit
    in file order) — the final explicit rank column here is gate
    protocol over the collected (small) result."""

    def keyed(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype("int64"),
                "shuffle_key": [
                    s[:16]
                    for s in sha256_hex(
                        [f"{SHUFFLE_SEED}:{t}" for t in batch["text"].tolist()]
                    )
                ],
            }
        )

    ds = (
        _read(sf_dir, ["doc_id", "text"])
        .map_batches(keyed, batch_format="pandas")
        .sort(["shuffle_key", "doc_id"])
    )
    empty = pa.schema([("doc_id", pa.int64()), ("shuffle_key", pa.string())])
    out = collect_table(ds, empty).to_pandas()
    out = out.sort_values(["shuffle_key", "doc_id"]).reset_index(drop=True)
    out["rank"] = np.arange(len(out), dtype=np.int64)
    return pa.Table.from_pandas(out[["rank", "doc_id", "shuffle_key"]],
                                preserve_index=False)


def q_corpus_report(sf_dir: str) -> pa.Table:
    """The corpus DATA CARD: one (metric, value) table summarizing the
    ingest — doc/lang/source counts, token and char totals, exact-dup
    count, empty-doc count, token-length extremes. The single-pass
    summary a training-data pipeline publishes next to the corpus.

    Scale shape: ONE scan emits constant-size per-batch partials
    (counts, sums, maxima, the bounded lang/source sets) plus the
    batch's content sha256 digests; the driver folds partials and
    counts distinct hashes. At 10^12 docs the sha-distinct fold swaps
    to the exact ``groupby(sha).count`` the dedup pass already runs
    (or the HLL sketch when ±1.6 % suffices) — every other metric
    stays a constant-size combiner. Full SQL oracle."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.lower().str.findall(_TOK2_RE)
        lens = toks.str.len().to_numpy(dtype=np.int64)
        # full digests: a truncated prefix could collide and disagree
        # with the oracle's count(DISTINCT sha256(text))
        shas = sha256_hex(batch["text"].tolist())
        return pd.DataFrame(
            {
                "n_docs": np.array([len(batch)], dtype=np.int64),
                "total_tokens": np.array([int(lens.sum())], dtype=np.int64),
                "total_chars": np.array(
                    [int(batch["n_chars"].to_numpy(dtype=np.int64).sum())], dtype=np.int64
                ),
                "n_empty": np.array([int((lens == 0).sum())], dtype=np.int64),
                "max_tokens": np.array([int(lens.max()) if lens.size else 0], dtype=np.int64),
                "min_tokens": np.array(
                    [int(lens.min()) if lens.size else 0], dtype=np.int64
                ),
                "langs": [" ".join(sorted(set(batch["lang"])))],
                "sources": [" ".join(sorted(set(batch["source"])))],
                "shas": [" ".join(shas)],
            }
        )

    empty = pa.schema(
        [
            ("n_docs", pa.int64()),
            ("total_tokens", pa.int64()),
            ("total_chars", pa.int64()),
            ("n_empty", pa.int64()),
            ("max_tokens", pa.int64()),
            ("min_tokens", pa.int64()),
            ("langs", pa.string()),
            ("sources", pa.string()),
            ("shas", pa.string()),
        ]
    )
    parts = collect_table(
        _read(sf_dir, ["doc_id", "text", "lang", "source", "n_chars"]).map_batches(
            partial, batch_format="pandas"
        ),
        empty,
    ).to_pandas()
    langs: set[str] = set()
    sources: set[str] = set()
    shas: set[str] = set()
    for ls, ss, hs in zip(parts["langs"], parts["sources"], parts["shas"]):
        langs.update(ls.split())
        sources.update(ss.split())
        shas.update(hs.split())
    n_docs = int(parts["n_docs"].sum())
    metrics = [
        ("max_tokens", int(parts["max_tokens"].max()) if len(parts) else 0),
        ("min_tokens", int(parts["min_tokens"].min()) if len(parts) else 0),
        ("n_docs", n_docs),
        ("n_dup_docs", n_docs - len(shas)),
        ("n_empty", int(parts["n_empty"].sum())),
        ("n_langs", len(langs)),
        ("n_sources", len(sources)),
        ("total_chars", int(parts["total_chars"].sum())),
        ("total_tokens", int(parts["total_tokens"].sum())),
    ]
    return pa.table(
        {
            "metric": pa.array([m for m, _ in metrics], type=pa.string()),
            "value": pa.array([v for _, v in metrics], type=pa.int64()),
        }
    )


ORACLE_SQL["pmi_collocations"] = f"""
WITH toks AS (
  SELECT doc_id, list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), x -> length(x) >= 2) AS tl
  FROM documents
),
pt AS (
  SELECT doc_id, unnest(tl) AS term, unnest(range(len(tl))) AS pos FROM toks
),
uni AS (SELECT term, count(*)::BIGINT AS c FROM pt GROUP BY term),
bi AS (
  SELECT a.term AS left_t, b.term AS right_t, count(*)::BIGINT AS c
  FROM pt a JOIN pt b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  GROUP BY a.term, b.term
),
nb AS (SELECT sum(c)::BIGINT AS n FROM bi),
p AS (
  SELECT bi.left_t, bi.right_t, bi.c,
         round(ln((SELECT n FROM nb) * bi.c::DOUBLE / (ux.c::DOUBLE * uy.c::DOUBLE)) * 1000000)::BIGINT AS pmi_micro
  FROM bi JOIN uni ux ON ux.term = bi.left_t JOIN uni uy ON uy.term = bi.right_t
  WHERE bi.c >= {PMI_MIN_COUNT}
)
SELECT row_number() OVER (ORDER BY pmi_micro DESC, left_t ASC, right_t ASC) - 1 AS rank,
       left_t AS left, right_t AS right, c AS pair_count, pmi_micro
FROM p ORDER BY pmi_micro DESC, left_t ASC, right_t ASC LIMIT {PMI_TOPK}
"""

ORACLE_SQL["span_corruption"] = f"""
WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), x -> length(x) >= 2)) AS term,
         unnest(range(len(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), x -> length(x) >= 2)))) AS pos
  FROM documents
),
m AS (
  SELECT doc_id, pos,
         ((doc_id * {MASK_MUL} + pos * {MASK_STEP}) % {MASK_MOD}) < {MASK_PCT} AS masked
  FROM tok
),
w AS (
  SELECT doc_id, masked,
         masked AND NOT coalesce(lag(masked) OVER (PARTITION BY doc_id ORDER BY pos), FALSE) AS span_start
  FROM m
),
agg AS (
  SELECT doc_id,
         count(*)::BIGINT AS n_tokens,
         count(*) FILTER (masked)::BIGINT AS n_masked,
         count(*) FILTER (span_start)::BIGINT AS n_spans
  FROM w GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(a.n_tokens, 0)::BIGINT AS n_tokens,
       coalesce(a.n_masked, 0)::BIGINT AS n_masked,
       coalesce(a.n_spans, 0)::BIGINT AS n_spans,
       CASE WHEN coalesce(a.n_tokens, 0) > 0
            THEN a.n_masked * 1000000 // a.n_tokens ELSE 0 END::BIGINT AS corruption_ppm
FROM documents d LEFT JOIN agg a USING (doc_id)
"""

ORACLE_SQL["vocab_growth"] = f"""
WITH tok AS (
  SELECT doc_id, t.term
  FROM documents, unnest(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), x -> length(x) >= 2)) AS t(term)
),
first_seen AS (SELECT term, min(doc_id) AS fs FROM tok GROUP BY term),
steps(n_docs) AS (VALUES {", ".join(f"({s})" for s in VOCAB_GROWTH_STEPS)})
SELECT s.n_docs::BIGINT AS n_docs,
       (SELECT count(*) FROM first_seen f WHERE f.fs < s.n_docs)::BIGINT AS n_distinct_terms
FROM steps s
"""

ORACLE_SQL["term_freq_spectrum"] = """
WITH tok AS (
  SELECT t.term
  FROM documents, unnest(list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), x -> length(x) >= 2)) AS t(term)
),
tf AS (SELECT term, count(*)::BIGINT AS tf FROM tok GROUP BY term),
ks(tf_bucket) AS (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9),(10),(11))
SELECT ks.tf_bucket::BIGINT AS tf_bucket,
       (SELECT count(*) FROM tf
        WHERE least(tf.tf, 11) = ks.tf_bucket)::BIGINT AS n_terms
FROM ks
"""

# seeded deterministic shuffle: same sha256(seed ':' text) key contract
# as dataset_split (DuckDB sha256 == hashlib, proven by the split gate)
ORACLE_SQL["corpus_shuffle"] = f"""
WITH keyed AS (
  SELECT doc_id,
         substr(sha256('{SHUFFLE_SEED}' || ':' || text), 1, 16) AS shuffle_key
  FROM documents
)
SELECT row_number() OVER (ORDER BY shuffle_key, doc_id) - 1 AS rank,
       doc_id, shuffle_key
FROM keyed
"""

ORACLE_SQL["corpus_report"] = f"""
WITH t AS (SELECT doc_id, lang, source, n_chars, {_TOK_SQL} AS toks, sha256(text) AS sha
           FROM documents)
SELECT 'max_tokens' AS metric, coalesce(max(len(toks)), 0)::BIGINT AS value FROM t
UNION ALL SELECT 'min_tokens', coalesce(min(len(toks)), 0)::BIGINT FROM t
UNION ALL SELECT 'n_docs', count(*)::BIGINT FROM t
UNION ALL SELECT 'n_dup_docs', (count(*) - count(DISTINCT sha))::BIGINT FROM t
UNION ALL SELECT 'n_empty', sum(CASE WHEN len(toks) = 0 THEN 1 ELSE 0 END)::BIGINT FROM t
UNION ALL SELECT 'n_langs', count(DISTINCT lang)::BIGINT FROM t
UNION ALL SELECT 'n_sources', count(DISTINCT source)::BIGINT FROM t
UNION ALL SELECT 'total_chars', sum(n_chars)::BIGINT FROM t
UNION ALL SELECT 'total_tokens', sum(len(toks))::BIGINT FROM t
"""


# ---- duplicated-substring coverage (exact substring dedup) ----------------

WIN_K = 4  # winnowing k-gram size (tokens per fingerprinted gram)
WIN_W = 4  # winnowing window: every W consecutive grams yield ≥1 print


def q_winnow_fingerprints(sf_dir: str) -> pa.Table:
    """WINNOWING document fingerprints (Schleimer, Wilkerson & Aiken
    2003, "Winnowing: Local Algorithms for Document Fingerprinting" —
    the MOSS algorithm, i.e. exactly the robust plagiarism-detection
    fingerprinting the reference's domain is about): hash every
    ``WIN_K``-token gram (first 16 hex chars of sha256, portable
    across engines), slide a ``WIN_W``-gram window, and select each
    window's minimal hash with RIGHTMOST tie-breaking. The guarantee:
    any shared substring of ≥ WIN_K+WIN_W-1 tokens yields at least one
    shared fingerprint, at expected density 2/(W+1) — so matching is
    position-independent and storage is a fraction of the gram count.

    Scale shape: a pure stateless scan — each doc's fingerprints are
    computed inside its batch with a vectorized sliding-window argmin
    (no shuffle at all); the selected (doc_id, pos, h) rows are the
    op's output and the input to any downstream shared-fingerprint
    join (which groups by ``h``, the usual LSH-style bounded-bucket
    shuffle — see :func:`q_winnow_pairs`). Docs with fewer than W
    complete grams emit nothing (the winnowing guarantee is defined
    from that length up)."""
    empty = pa.schema([("doc_id", pa.int64()), ("pos", pa.int64()), ("h", pa.string())])
    return collect_table(
        _read(sf_dir, ["doc_id", "text"]).map_batches(
            _winnow_batch, batch_format="pandas"
        ),
        empty,
    )


def _winnow_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Per-batch winnowing scan → (doc_id, pos, h) fingerprint rows.
    A document's grams live entirely inside its batch row, so every
    selection decision is local — no shuffle."""
    import hashlib

    from numpy.lib.stride_tricks import sliding_window_view

    def _h16(gram: str) -> str:
        return hashlib.sha256(gram.encode("utf-8")).hexdigest()[:16]

    d_ids, poss, hs = [], [], []
    for did, ts in zip(
        batch["doc_id"].astype("int64"),
        batch["text"].str.lower().str.findall(_TOK2_RE),
    ):
        n = len(ts) - WIN_K + 1
        if n < WIN_W:  # no complete window
            continue
        hexes = [_h16(" ".join(ts[i : i + WIN_K])) for i in range(n)]
        harr = np.array([int(x, 16) for x in hexes], dtype=np.uint64)
        sw = sliding_window_view(harr, WIN_W)
        # first argmin of the REVERSED window = rightmost min
        j_rev = np.argmin(sw[:, ::-1], axis=1)
        pos = np.unique(np.arange(n - WIN_W + 1) + (WIN_W - 1 - j_rev))
        d_ids.extend([int(did)] * pos.size)
        poss.extend(pos.tolist())
        hs.extend(hexes[p] for p in pos)
    return pd.DataFrame(
        {
            "doc_id": pd.Series(d_ids, dtype="int64"),
            "pos": pd.Series(poss, dtype="int64"),
            "h": pd.Series(hs, dtype="string"),
        }
    )


WIN_MAX_DF = 16     # stop-fingerprints: hashes in more docs are boilerplate
WIN_MIN_SHARED = 2  # report pairs sharing at least this many fingerprints
WIN_NBUCKETS = 64   # fingerprint-hash buckets bounding the pair shuffle


def q_winnow_pairs(sf_dir: str) -> pa.Table:
    """MOSS-style plagiarism candidate pairs: document pairs ranked by
    the number of DISTINCT fingerprint hashes they share. Fingerprints
    appearing in more than ``WIN_MAX_DF`` documents are
    stop-fingerprints (boilerplate — MOSS's "ignore very common
    fingerprints" rule), so the per-hash pair expansion is bounded at
    C(WIN_MAX_DF, 2) and the exclusion is part of the op's DEFINITION
    (shared by the SQL oracle), not a lossy approximation.

    Scale shape: the fingerprint scan is shuffle-free; distinct
    (doc_id, h) rows shuffle ONCE by hash bucket (``WIN_NBUCKETS``
    groups — the dedup.py bucketed-shingle discipline); in-bucket pair
    partials (bounded per hash) shuffle a second time by pair bucket
    for the final per-pair sum. The full pair matrix never
    materializes anywhere."""

    def distinct_fp(batch: pd.DataFrame) -> pd.DataFrame:
        g = _winnow_batch(batch)[["doc_id", "h"]].drop_duplicates()
        g = g.reset_index(drop=True)
        g["bucket"] = (
            pd.util.hash_pandas_object(g["h"], index=False).to_numpy() % WIN_NBUCKETS
        ).astype(np.int64)
        return g

    def pair_partial(g: pd.DataFrame) -> pd.DataFrame:
        from itertools import combinations

        a_ids, b_ids = [], []
        for _, sub in g.groupby("h"):
            docs = np.sort(np.unique(sub["doc_id"].to_numpy(np.int64)))
            if 2 <= docs.size <= WIN_MAX_DF:
                for a, b in combinations(docs.tolist(), 2):
                    a_ids.append(a)
                    b_ids.append(b)
        out = pd.DataFrame(
            {
                "a_id": pd.Series(a_ids, dtype="int64"),
                "b_id": pd.Series(b_ids, dtype="int64"),
            }
        )
        out = out.groupby(["a_id", "b_id"], as_index=False).size().rename(columns={"size": "n_shared"})
        out["n_shared"] = out["n_shared"].astype("int64")
        out["pbucket"] = ((out["a_id"] * 31 + out["b_id"]) % WIN_NBUCKETS).astype("int64")
        return out

    def pair_final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["a_id", "b_id"], as_index=False)["n_shared"].sum()
        return out[out["n_shared"] >= WIN_MIN_SHARED].astype("int64")

    pair_partial.__name__ = "pair_partial"
    pair_final.__name__ = "pair_final"

    fp = _read(sf_dir, ["doc_id", "text"]).map_batches(
        distinct_fp, batch_format="pandas"
    )
    partials = fp.groupby("bucket").map_groups(pair_partial, batch_format="pandas")
    empty = pa.schema([("a_id", pa.int64()), ("b_id", pa.int64()), ("n_shared", pa.int64())])
    out = collect_table(
        partials.groupby("pbucket").map_groups(pair_final, batch_format="pandas"),
        empty,
    ).to_pandas()
    return pa.Table.from_pandas(
        out.sort_values(["n_shared", "a_id", "b_id"], ascending=[False, True, True])
        .reset_index(drop=True),
        preserve_index=False,
    )


DUP_K = 5  # token window: a K-gram shared by >=2 docs marks its span
DUP_NBUCKETS = 64  # gram-hash buckets bounding shuffle group count


def _merge_cover(pos: np.ndarray, k: int) -> tuple[int, int]:
    """Union length + maximal-run count of intervals [p, p+k) over
    sorted unique start positions — vectorized interval merge."""
    if pos.size == 0:
        return 0, 0
    s = np.sort(pos)
    e = s + k
    run_end = np.maximum.accumulate(e)
    new_span = np.concatenate(([True], s[1:] > run_end[:-1]))
    starts = s[new_span]
    # each merged span ends at the running max just before the next span
    ends = np.concatenate((run_end[:-1][new_span[1:]], [int(run_end[-1])]))
    return int((ends - starts).sum()), int(new_span.sum())


def q_dup_spans(sf_dir: str) -> pa.Table:
    """Exact duplicated-substring coverage per document — the
    computation behind substring-level training-data dedup (Lee et
    al. 2021, "Deduplicating Training Data Makes Language Models
    Better"): every ``DUP_K``-token window shared by ≥2 DISTINCT
    documents marks its token span; a doc's output is the UNION
    coverage of all marked spans (``n_dup_positions``) and the number
    of maximal spans (``n_spans``) — the spans a removal pass would
    cut. Full SQL oracle.

    Scale shape (vs a true suffix array): (1) explode (gram, doc_id,
    pos) with grams HASH-BUCKETED so the wide shuffle has ≤
    ``DUP_NBUCKETS`` groups, each reduced by a vectorized in-bucket
    pandas pass (the dedup.py bucketed-shingle discipline); (2) the
    surviving (doc_id, pos) rows — proportional to actual duplication,
    not corpus size — shuffle once by doc-bucket for the per-doc
    interval union; (3) n_tokens rides a stateless scan, merged on the
    bounded per-doc table. Raw gram strings shuffle here for oracle
    exactness; at 100 TB the gram key is a 64-bit hash (collisions
    only over-mark, as in the paper) and step 2's output is the only
    data-sized exchange.
    """

    def explode(batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch["text"].str.lower().str.findall(_TOK2_RE)
        d_ids, grams, poss = [], [], []
        for did, ts in zip(batch["doc_id"].astype("int64"), toks):
            n = len(ts) - DUP_K + 1
            if n <= 0:
                continue
            d_ids.extend([did] * n)
            grams.extend(" ".join(ts[i : i + DUP_K]) for i in range(n))
            poss.extend(range(n))
        g = pd.DataFrame(
            {
                "doc_id": np.array(d_ids, dtype=np.int64),
                "gram": grams,
                "pos": np.array(poss, dtype=np.int64),
            }
        )
        g["bucket"] = pd.util.hash_pandas_object(g["gram"], index=False).to_numpy() % DUP_NBUCKETS
        return g

    def dup_positions(g: pd.DataFrame) -> pd.DataFrame:
        # grams present in >= 2 distinct docs, vectorized in-bucket
        nd = g.drop_duplicates(["gram", "doc_id"]).groupby("gram").size()
        dup = set(nd[nd >= 2].index)
        hit = g[g["gram"].isin(dup)]
        return hit[["doc_id", "pos"]].reset_index(drop=True)

    def cover(g: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for did, sub in g.groupby("doc_id"):
            n_cov, n_spans = _merge_cover(sub["pos"].to_numpy(np.int64), DUP_K)
            rows.append((int(did), n_cov, n_spans))
        return pd.DataFrame(
            rows, columns=["doc_id", "n_dup_positions", "n_spans"]
        ).astype("int64")

    dup_positions.__name__ = "dup_positions"
    cover.__name__ = "cover"

    exploded = _read(sf_dir, ["doc_id", "text"]).map_batches(
        explode, batch_format="pandas"
    )
    hits = exploded.groupby("bucket").map_groups(
        dup_positions, batch_format="pandas"
    )
    hits = hits.add_column(
        "dbucket", lambda b: b["doc_id"] % DUP_NBUCKETS, batch_format="pandas"
    )
    cov_empty = pa.schema(
        [("doc_id", pa.int64()), ("n_dup_positions", pa.int64()), ("n_spans", pa.int64())]
    )
    cov = collect_table(
        hits.groupby("dbucket").map_groups(cover, batch_format="pandas"), cov_empty
    ).to_pandas()

    def ntok(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype("int64"),
                "n_tokens": batch["text"]
                .str.lower()
                .str.findall(_TOK2_RE)
                .str.len()
                .astype("int64"),
            }
        )

    nt_empty = pa.schema([("doc_id", pa.int64()), ("n_tokens", pa.int64())])
    nt = collect_table(
        _read(sf_dir, ["doc_id", "text"]).map_batches(ntok, batch_format="pandas"),
        nt_empty,
    ).to_pandas()
    out = nt.merge(cov, on="doc_id", how="left").fillna(0).astype("int64")
    return pa.Table.from_pandas(
        out.sort_values("doc_id").reset_index(drop=True), preserve_index=False
    )


_DUP_CONCAT = " || ' ' || ".join(f"toks[i + {j}]" for j in range(DUP_K))

ORACLE_SQL["dup_spans"] = f"""
WITH d AS (SELECT doc_id, {_TOK_SQL} AS toks FROM documents),
g AS (
  SELECT doc_id, i.i - 1 AS pos, {_DUP_CONCAT} AS gram
  FROM d, unnest(generate_series(1, greatest(len(toks) - {DUP_K - 1}, 0))) AS i(i)
),
dup AS (SELECT gram FROM g GROUP BY gram HAVING count(DISTINCT doc_id) >= 2),
cov AS (
  SELECT DISTINCT o.doc_id, p.p AS cpos
  FROM g o JOIN dup USING (gram),
       unnest(generate_series(o.pos, o.pos + {DUP_K - 1})) AS p(p)
),
runs AS (
  SELECT doc_id, cpos,
         lag(cpos) OVER (PARTITION BY doc_id ORDER BY cpos) AS prev
  FROM cov
),
spans AS (
  SELECT doc_id, count(*)::BIGINT AS n_spans
  FROM runs WHERE prev IS NULL OR cpos > prev + 1 GROUP BY doc_id
),
ncov AS (SELECT doc_id, count(*)::BIGINT AS n_dup_positions FROM cov GROUP BY doc_id),
nt AS (SELECT doc_id, len(toks)::BIGINT AS n_tokens FROM d)
SELECT nt.doc_id, nt.n_tokens,
       coalesce(ncov.n_dup_positions, 0)::BIGINT AS n_dup_positions,
       coalesce(spans.n_spans, 0)::BIGINT AS n_spans
FROM nt LEFT JOIN ncov USING (doc_id) LEFT JOIN spans USING (doc_id)
"""

_WIN_CONCAT = " || ' ' || ".join(f"toks[i + {j}]" for j in range(WIN_K))

_WINNOW_CTE = f"""
WITH d AS (SELECT doc_id, {_TOK_SQL} AS toks FROM documents),
g AS (
  SELECT doc_id, i.i - 1 AS pos, substr(sha256({_WIN_CONCAT}), 1, 16) AS h
  FROM d, unnest(generate_series(1, greatest(len(toks) - {WIN_K - 1}, 0))) AS i(i)
),
n AS (SELECT doc_id, max(pos) AS maxpos FROM g GROUP BY doc_id),
win AS (
  SELECT g1.doc_id, g1.pos AS s, g2.pos AS p, g2.h
  FROM g g1
  JOIN n ON n.doc_id = g1.doc_id AND g1.pos + {WIN_W - 1} <= n.maxpos
  JOIN g g2 ON g2.doc_id = g1.doc_id
           AND g2.pos BETWEEN g1.pos AND g1.pos + {WIN_W - 1}
),
wmin AS (SELECT doc_id, s, min(h) AS mh FROM win GROUP BY doc_id, s),
selw AS (
  SELECT w.doc_id, w.s, max(w.p) AS pos
  FROM win w JOIN wmin m ON m.doc_id = w.doc_id AND m.s = w.s AND w.h = m.mh
  GROUP BY w.doc_id, w.s
)
"""

ORACLE_SQL["winnow_fingerprints"] = _WINNOW_CTE + """
SELECT DISTINCT s.doc_id, s.pos::BIGINT AS pos, g.h
FROM selw s JOIN g ON g.doc_id = s.doc_id AND g.pos = s.pos
"""

ORACLE_SQL["winnow_pairs"] = _WINNOW_CTE + f"""
, fp AS (
  SELECT DISTINCT s.doc_id, g.h
  FROM selw s JOIN g ON g.doc_id = s.doc_id AND g.pos = s.pos
),
elig AS (SELECT h FROM fp GROUP BY h HAVING count(*) BETWEEN 2 AND {WIN_MAX_DF}),
pairs AS (
  SELECT f1.doc_id AS a_id, f2.doc_id AS b_id, count(*)::BIGINT AS n_shared
  FROM fp f1
  JOIN elig e USING (h)
  JOIN fp f2 ON f2.h = f1.h AND f1.doc_id < f2.doc_id
  GROUP BY f1.doc_id, f2.doc_id
)
SELECT a_id, b_id, n_shared FROM pairs WHERE n_shared >= {WIN_MIN_SHARED}
"""

ORACLE_SQL["mixture_sample"] = f"""
WITH c AS (SELECT lang, count(*)::DOUBLE AS c FROM documents GROUP BY lang),
m AS (SELECT min(c) AS cmin FROM c),
t AS (SELECT c.lang, floor(sqrt(m.cmin / c.c) * {MIX_SCALE!r})::BIGINT AS thr FROM c, m),
h AS (
  SELECT doc_id, lang,
         ('0x' || substr(sha256(text), 1, 8))::UBIGINT::BIGINT AS hv
  FROM documents
)
SELECT h.doc_id, h.lang, (h.hv < t.thr)::BIGINT AS kept
FROM h JOIN t USING (lang)
"""

QUERIES = {
    "dataset_split": q_dataset_split,
    "sequence_pack": q_sequence_pack,
    "budget_select": q_budget_select,
    "length_quantiles": q_length_quantiles,
    "tfidf_top_terms": q_tfidf_top_terms,
    "decontaminate": q_decontaminate,
    "repetition_stats": q_repetition_stats,
    "stratified_sample": q_stratified_sample,
    "term_cooccurrence": q_term_cooccurrence,
    "hot_ngrams": q_hot_ngrams,
    "hot_ngram_coverage": q_hot_ngram_coverage,
    "mixture_sample": q_mixture_sample,
    "unigram_surprisal": q_unigram_surprisal,
    "bigram_surprisal": q_bigram_surprisal,
    "dup_spans": q_dup_spans,
    "winnow_fingerprints": q_winnow_fingerprints,
    "winnow_pairs": q_winnow_pairs,
    "corpus_report": q_corpus_report,
    "corpus_shuffle": q_corpus_shuffle,
    "vocab_growth": q_vocab_growth,
    "term_freq_spectrum": q_term_freq_spectrum,
    "span_corruption": q_span_corruption,
    "pmi_collocations": q_pmi_collocations,
}
