"""Text-analysis operators over the ``documents`` table.

The training-data-pipeline analysis suite: token counting, quality
scoring (stopword/char ratios — the BM25-relevant subset of the
reference's stylometry features, /root/reference/stylometry/features.py:28-203
and enhanced_pipeline.py:136-211), n-gram-profile language ID
(replacing the reference's langdetect call,
/root/reference/ingestion/pipeline_ingest.py:63-75), and rolling-hash
document fingerprinting. All vectorized ``map_batches`` stages;
SQL-parity entries round floats to 6 decimals on both sides.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

# Fixed stopword profiles (deterministic heuristic language ID).
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is"),
    "es": ("el", "la", "de", "que", "los", "es"),
    "de": ("der", "die", "und", "das", "ist", "ein"),
    "fr": ("le", "la", "les", "des", "est", "une"),
}
EN_STOP = LANG_PROFILES["en"]

_TOKEN_RE = re.compile(r"[a-z0-9]+")
_WS_RE = re.compile(r"\S+")


# -- columnar per-token kernels (polars list ops) --------------------------
# The per-document stat loops (`Series.map(lambda ts: ...)`) were the last
# Python row loops in the quality/textstats family (VERDICT r3, What's
# wrong #3); these helpers run the same counts over the flattened child
# array of a list<str> column — no Python per-document work.


def pl_token_lists(text: pd.Series | np.ndarray | list) -> "object":
    """Lowercased ``[a-z0-9]+`` token lists as a polars list<str> Series."""
    import polars as pl

    vals = text.to_numpy() if isinstance(text, pd.Series) else text
    return (
        pl.Series("text", vals, dtype=pl.String)
        .str.to_lowercase()
        .str.extract_all(_TOKEN_RE.pattern)
    )


def count_tokens_in_set(toks, words) -> np.ndarray:
    """Per-row count of token OCCURRENCES in ``words``
    (== ``sum(1 for t in ts if t in words)``)."""
    import polars as pl

    return (
        toks.list.eval(pl.element().is_in(list(words)).cast(pl.Int64))
        .list.sum()
        .to_numpy()
    )


def count_distinct_in_set(toks, words) -> np.ndarray:
    """Per-row count of DISTINCT tokens in ``words``
    (== ``len(set(ts) & set(words))``; list.set_intersection dedups)."""
    import polars as pl

    return (
        toks.list.set_intersection(list(words)).list.len().cast(pl.Int64).to_numpy()
    )


def total_token_len(toks) -> np.ndarray:
    """Per-row Σ len(token) (== ``sum(len(t) for t in ts)``; tokens are
    ASCII runs so len_bytes == len)."""
    import polars as pl

    return (
        toks.list.eval(pl.element().str.len_bytes().cast(pl.Int64))
        .list.sum()
        .to_numpy()
    )


def _read_documents(sf_dir: str) -> "ray.data.Dataset":
    return ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"))


def q_token_count(sf_dir: str) -> pa.Table:
    """Whitespace + alnum-run token counts per document (SURVEY.md §2.8 F3:
    replaces the reference's len//4 token estimate with real counts)."""

    def counts(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        text = batch["text"]
        # `lang` kept as a (string) column: useful output, and it keeps
        # this table out of the all-fixed-width shape vulnerable to the
        # Ray row re-pairing hazard (ROADMAP.md §6b). Counts come from
        # the Arrow RE2 kernel — no token lists materialize when only
        # the count is needed (greedy runs == findall's maximal runs).
        return pa.table(
            {
                "doc_id": pc.cast(batch["doc_id"], pa.int64()),
                "lang": batch["lang"],
                "n_ws_tokens": pc.cast(
                    pc.count_substring_regex(text, _WS_RE.pattern), pa.int64()
                ),
                "n_alnum_tokens": pc.cast(
                    pc.count_substring_regex(pc.utf8_lower(text), _TOKEN_RE.pattern),
                    pa.int64(),
                ),
            }
        )

    return pa.Table.from_pandas(
        _read_documents(sf_dir).map_batches(counts, batch_format="pyarrow").to_pandas(),
        preserve_index=False,
    )


def q_quality_score(sf_dir: str) -> pa.Table:
    """Per-doc quality features. Gate-exactness: ratios are emitted as
    integer numerator/denominator pairs (n_stop/n_tokens,
    total_token_len/n_tokens) — cross-engine float rounding (numpy
    half-even vs DuckDB half-away-from-zero) can flip a 6th-decimal
    boundary, integers cannot. ``quality_ratios`` (non-gate) derives
    the float ratios."""

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        toks = pl_token_lists(batch["text"])
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype("int64"),
                "lang": batch["lang"],
                "n_tokens": toks.list.len().to_numpy().astype("int64"),
                "n_stop": count_tokens_in_set(toks, EN_STOP),
                "total_token_len": total_token_len(toks),
            }
        )

    return pa.Table.from_pandas(
        _read_documents(sf_dir).map_batches(score, batch_format="pandas").to_pandas(),
        preserve_index=False,
    )


def quality_ratios(sf_dir: str) -> pd.DataFrame:
    """Library API: float quality ratios derived from q_quality_score."""
    t = q_quality_score(sf_dir).to_pandas()
    n = t["n_tokens"].replace(0, 1)
    t["stop_ratio"] = t["n_stop"] / n
    t["mean_token_len"] = t["total_token_len"] / n
    return t


def q_lang_id(sf_dir: str) -> pa.Table:
    """Heuristic language ID: stopword-profile hit counts, argmax with
    fixed priority order en > es > de > fr."""

    def lid(batch: pd.DataFrame) -> pd.DataFrame:
        toks = pl_token_lists(batch["text"])
        hits = {
            lang: count_tokens_in_set(toks, words)
            for lang, words in LANG_PROFILES.items()
        }
        en, es, de, fr = hits["en"], hits["es"], hits["de"], hits["fr"]
        pred = np.where(
            (en >= es) & (en >= de) & (en >= fr), "en",
            np.where((es >= de) & (es >= fr), "es", np.where(de >= fr, "de", "fr")),
        )
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype("int64"),
                "en_hits": en, "es_hits": es, "de_hits": de, "fr_hits": fr,
                "pred_lang": pred,
            }
        )

    return pa.Table.from_pandas(
        _read_documents(sf_dir).map_batches(lid, batch_format="pandas").to_pandas(),
        preserve_index=False,
    )


_FP_MOD = (1 << 61) - 1
_FP_BASE = 1_000_003


def rolling_fingerprint(tokens: list[str]) -> int:
    """Polynomial rolling hash over the token sequence (order-sensitive
    document fingerprint; mod 2^61-1)."""
    h = 0
    for t in tokens:
        th = 0
        for ch in t.encode("utf-8"):
            th = (th * 131 + ch) % _FP_MOD
        h = (h * _FP_BASE + th + 1) % _FP_MOD
    return h


def q_doc_fingerprint(sf_dir: str) -> pa.Table:
    """Order-sensitive rolling-hash fingerprint per document (not
    SQL-expressible → rows-only check; invariants tested in pytest)."""

    def fp(batch: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        toks = batch["text"].str.lower().str.findall(_TOKEN_RE)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype("int64"),
                "fingerprint": toks.map(rolling_fingerprint).astype("uint64"),
                # provenance ties each fingerprint to its content AND
                # avoids the two-fixed-width-column hazard (ROADMAP §6b)
                "content_sha8": batch["text"].map(
                    lambda t: hashlib.sha256(t.encode()).hexdigest()[:8]
                ),
            }
        )

    return pa.Table.from_pandas(
        _read_documents(sf_dir).map_batches(fp, batch_format="pandas").to_pandas(),
        preserve_index=False,
    )


PHRASES: tuple[str, ...] = ("data query", "merge sort", "the fast", "order line")


def q_phrase_match(sf_dir: str) -> pa.Table:
    """Exact-phrase (substring) search: occurrence counts of a fixed
    phrase set per document, matches only. The grep/phrase-query
    primitive of a fulltext engine, run as a pure streaming
    ``map_batches`` with the vectorized Arrow ``count_substring``
    kernel — no tokenization, no shuffle, trivially 100-TB-shaped
    (reference analogue: candidate keyword scan,
    /root/reference/retrieval/retrieval.py:60-83)."""
    import pyarrow.compute as pc

    def scan(batch: pa.Table) -> pa.Table:
        text = batch["text"].combine_chunks()
        dids = batch["doc_id"].to_numpy(zero_copy_only=False)
        phrases, out_ids, hits = [], [], []
        for ph in PHRASES:
            # vectorized Arrow kernel over the whole batch, one pass
            # per (small, fixed) phrase list entry
            n = pc.count_substring(text, ph).to_numpy(zero_copy_only=False)
            keep = np.flatnonzero(n > 0)
            phrases += [ph] * keep.size
            out_ids.append(dids[keep])
            hits.append(n[keep].astype(np.int64))
        return pa.table(
            {
                "phrase": pa.array(phrases, type=pa.string()),
                "doc_id": pa.array(
                    np.concatenate(out_ids) if out_ids else np.empty(0, np.int64),
                    type=pa.int64(),
                ),
                "n_hits": pa.array(
                    np.concatenate(hits) if hits else np.empty(0, np.int64),
                    type=pa.int64(),
                ),
            }
        )

    from ..collect import collect_table

    empty = pa.schema([("phrase", pa.string()), ("doc_id", pa.int64()), ("n_hits", pa.int64())])
    return collect_table(
        _read_documents(sf_dir).map_batches(scan, batch_format="pyarrow", zero_copy_batch=True),
        empty,
    )


# ---- PII redaction --------------------------------------------------------

# RE2-compatible patterns (no lookaround) so the Arrow kernels and the
# DuckDB oracle compile the IDENTICAL regex; no single quotes so they
# embed directly in SQL literals.
PII_EMAIL = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\+?\d[\d\- ]{7,}\d"


def q_pii_redact(sf_dir: str) -> pa.Table:
    """PII redaction — the compliance pass every training-data pipeline
    runs before anything else: emails, IPv4 addresses, then phone-like
    digit runs are counted and replaced with typed placeholders, in
    that fixed order (each count/replace operates on the output of the
    previous category, mirrored exactly by the SQL oracle's CTE
    chain). Pure streaming ``map_batches`` over zero-copy Arrow
    batches using the RE2-backed ``count_substring_regex`` /
    ``replace_substring_regex`` kernels — no Python row loop, no
    shuffle, trivially 100-TB-shaped.

    The TPC-H-ish documents table is word soup (no real PII), so —
    like ``decontaminate``'s self-drawn benchmark — the gate first
    SEEDS deterministic doc_id-derived PII into 2/3 of the rows
    (identically in the SQL oracle), making the cross-engine check
    cover real redaction, not just the identity path."""
    import pyarrow.compute as pc

    def augment(batch: pd.DataFrame) -> pd.DataFrame:
        did = batch["doc_id"].astype("int64")
        email = " contact user" + did.astype(str) + "@example.com"
        phone = (
            " from 10.0." + (did % 256).astype(str) + "." + (did % 100).astype(str)
            + " call 415-555-" + (did % 10000).astype(str).str.zfill(4)
        )
        suffix = np.where(did % 3 == 0, email, np.where(did % 3 == 1, phone, ""))
        return pd.DataFrame({"doc_id": did, "text": batch["text"] + suffix})

    def redact(batch: pa.Table) -> pa.Table:
        text = batch["text"]
        cols: dict[str, pa.Array | pa.ChunkedArray] = {"doc_id": batch["doc_id"]}
        for name, pat, token in (
            ("n_email", PII_EMAIL, "<EMAIL>"),
            ("n_ip", PII_IPV4, "<IP>"),
            ("n_phone", PII_PHONE, "<PHONE>"),
        ):
            cols[name] = pc.cast(pc.count_substring_regex(text, pat), pa.int64())
            text = pc.replace_substring_regex(text, pat, token)
        cols["clean_text"] = text
        return pa.table(cols)

    from ..collect import collect_table

    empty = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_email", pa.int64()),
            ("n_ip", pa.int64()),
            ("n_phone", pa.int64()),
            ("clean_text", pa.string()),
        ]
    )
    return collect_table(
        _read_documents(sf_dir)
        .map_batches(augment, batch_format="pandas")
        .map_batches(redact, batch_format="pyarrow", zero_copy_batch=True),
        empty,
    )


def redact_pii_table(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Library API: redact PII in ``text_col`` of an arbitrary Arrow
    table in place (same sequential category semantics as
    q_pii_redact); used by tests on the synthetic PII fixture."""
    import pyarrow.compute as pc

    text = t[text_col]
    for pat, token in ((PII_EMAIL, "<EMAIL>"), (PII_IPV4, "<IP>"), (PII_PHONE, "<PHONE>")):
        text = pc.replace_substring_regex(text, pat, token)
    return t.set_column(t.schema.get_field_index(text_col), text_col, text)


# ---- Gopher-style quality-rule filter --------------------------------------
#
# The document-level rule battery of Rae et al. 2021 ("Scaling Language
# Models: ... Gopher", §A1.1), the standard pre-training quality gate:
# word-count bounds, mean-word-length bounds, symbol-to-word ratio,
# bullet-line and ellipsis-line fractions, and a required-word check.
# Every rule is evaluated in INTEGER arithmetic (e.g. mean word length
# in [3,10] is checked as 3·n ≤ total_len ≤ 10·n), so the DuckDB oracle
# matches bit-for-bit with no float-rounding hazard.
GOPHER_MIN_WORDS = 15
GOPHER_MAX_WORDS = 5000
# Gopher requires ≥2 hits from a small "common English words" list; the
# synthetic corpus is database word soup, so the list is drawn from its
# vocabulary (the rule SHAPE is what's under test, the list is config).
GOPHER_REQUIRED_WORDS = ("the", "a", "row", "table", "value", "key", "part", "hash")


def _gopher_augment(batch: pd.DataFrame) -> pd.DataFrame:
    """Deterministic doc_id-keyed augmentation so every rule has both
    outcomes on the single-line word-soup corpus (same CASE chain as
    the SQL oracle; precedent: q_pii_redact's seeded PII)."""
    did = batch["doc_id"].astype("int64")
    heavy_bullets = "\n- filler bullet" * 10
    light_bullets = "\n- alpha\n- beta\n* gamma\nplain tail"
    hashes = "\n#### ## # heading noise"
    ellipses = "\nto be continued ...\nmore soon ...\nthe end"
    suffix = np.where(
        did % 10 == 0, heavy_bullets,
        np.where(did % 5 == 0, light_bullets,
                 np.where(did % 7 == 0, hashes,
                          np.where(did % 3 == 0, ellipses, ""))),
    )
    return pd.DataFrame({"doc_id": did, "text": batch["text"] + suffix})


def gopher_rule_counts(batch: pd.DataFrame) -> pd.DataFrame:
    """Per-document integer rule counters (columnar polars kernels over
    the token/line list children — no per-document Python)."""
    import polars as pl

    text = batch["text"]
    toks = pl_token_lists(text)
    pls = pl.Series("text", text.to_numpy(), dtype=pl.String)
    lines = pls.str.split("\n")
    # ltrim/rtrim strip SPACES only (DuckDB default), not \t
    start = pl.element().str.strip_chars_start(" ")
    n_bullet = (
        lines.list.eval(
            (start.str.starts_with("-") | start.str.starts_with("*")).cast(pl.Int64)
        )
        .list.sum()
        .to_numpy()
    )
    n_ell_lines = (
        lines.list.eval(
            pl.element().str.strip_chars_end(" ").str.ends_with("...").cast(pl.Int64)
        )
        .list.sum()
        .to_numpy()
    )
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"].astype("int64"),
            "n_words": toks.list.len().to_numpy().astype("int64"),
            "total_word_len": total_token_len(toks),
            "n_hash": text.str.count("#").astype("int64"),
            # non-overlapping left-to-right, same as the oracle's
            # (len - len(replace(text,'...','')))/3
            "n_ellipsis": pls.str.count_matches("...", literal=True)
            .to_numpy()
            .astype("int64"),
            "n_lines": lines.list.len().to_numpy().astype("int64"),
            "n_bullet_lines": n_bullet,
            "n_ellipsis_lines": n_ell_lines,
            "n_required_hits": count_distinct_in_set(toks, GOPHER_REQUIRED_WORDS),
        }
    )


def gopher_rule_flags(c: pd.DataFrame) -> pd.DataFrame:
    """Boolean rules + keep from the integer counters (integer-exact)."""
    out = c.copy()
    out["r_word_count"] = (c.n_words >= GOPHER_MIN_WORDS) & (c.n_words <= GOPHER_MAX_WORDS)
    out["r_mean_word_len"] = (3 * c.n_words <= c.total_word_len) & (
        c.total_word_len <= 10 * c.n_words
    )
    out["r_symbol_ratio"] = 10 * (c.n_hash + c.n_ellipsis) <= c.n_words
    out["r_bullet_lines"] = 10 * c.n_bullet_lines <= 9 * c.n_lines
    out["r_ellipsis_lines"] = 10 * c.n_ellipsis_lines <= 3 * c.n_lines
    out["r_required_words"] = c.n_required_hits >= 2
    out["keep"] = (
        out.r_word_count & out.r_mean_word_len & out.r_symbol_ratio
        & out.r_bullet_lines & out.r_ellipsis_lines & out.r_required_words
    )
    return out


def q_gopher_rules(sf_dir: str) -> pa.Table:
    """Gopher-style quality-rule filter (SURVEY.md §2: the quality gate
    a large-scale training-data pipeline runs between language ID and
    dedup). Emits per-doc integer counters, per-rule booleans and the
    final ``keep`` flag; one streaming ``map_batches`` pass, no
    shuffle, no Python row loop in the fixed-width counters."""

    def rules(batch: pd.DataFrame) -> pd.DataFrame:
        return gopher_rule_flags(gopher_rule_counts(_gopher_augment(batch)))

    return pa.Table.from_pandas(
        _read_documents(sf_dir).map_batches(rules, batch_format="pandas").to_pandas(),
        preserve_index=False,
    )


def q_extended_stats(sf_dir: str) -> pa.Table:
    """Elasticsearch ``extended_stats`` aggregation per language over
    ``n_chars``: count / min / max / sum / sum-of-squares / variance /
    stddev. The distributed reduce is a constant-size per-batch partial
    of INTEGER sums (count, sum, sumsq, min, max) — exactly mergeable
    in any order, no float-accumulation drift — and the float variance
    derives from those integers by one identical expression on both
    engines: ((n·sumsq − sum²) / n²), so the result is bit-stable."""
    import numpy as np

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("lang")["n_chars"]
        v = batch.assign(sq=batch["n_chars"].astype("int64") ** 2).groupby("lang")["sq"]
        return pd.DataFrame(
            {
                "lang": g.count().index,
                "n": g.count().to_numpy(dtype=np.int64),
                "s": g.sum().to_numpy(dtype=np.int64),
                "sq": v.sum().to_numpy(dtype=np.int64),
                "mn": g.min().to_numpy(dtype=np.int64),
                "mx": g.max().to_numpy(dtype=np.int64),
            }
        )

    from ..collect import collect_table

    empty = pa.schema(
        [("lang", pa.string()), ("n", pa.int64()), ("s", pa.int64()),
         ("sq", pa.int64()), ("mn", pa.int64()), ("mx", pa.int64())]
    )
    parts = collect_table(
        _read_documents(sf_dir).map_batches(partial, batch_format="pandas"), empty
    ).to_pandas()
    agg = parts.groupby("lang").agg(
        n=("n", "sum"), s=("s", "sum"), sq=("sq", "sum"),
        mn=("mn", "min"), mx=("mx", "max"),
    ).reset_index().sort_values("lang")
    n = agg["n"].to_numpy(dtype="int64")
    s = agg["s"].to_numpy(dtype="int64")
    sq = agg["sq"].to_numpy(dtype="int64")
    # integer numerator/denominator first, ONE float division — the
    # oracle computes the identical expression
    var = (n * sq - s * s).astype("float64") / (n * n).astype("float64")
    import numpy as np

    return pa.table(
        {
            "lang": pa.array(agg["lang"], type=pa.string()),
            "n_docs": pa.array(n, type=pa.int64()),
            "min_chars": pa.array(agg["mn"].to_numpy(dtype="int64"), type=pa.int64()),
            "max_chars": pa.array(agg["mx"].to_numpy(dtype="int64"), type=pa.int64()),
            "sum_chars": pa.array(s, type=pa.int64()),
            "sumsq_chars": pa.array(sq, type=pa.int64()),
            "variance": pa.array(var, type=pa.float64()),
            "stddev": pa.array(np.sqrt(var), type=pa.float64()),
        }
    )


def _in_list_sql(words: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in words)


ORACLE_SQL = {
    # same integer-sums-then-one-float-division expression as the
    # engine: variance = (n*sumsq - sum^2) / n^2, bit-stable
    "extended_stats": """
        WITH a AS (
          SELECT lang,
                 count(*)::BIGINT AS n_docs,
                 min(n_chars)::BIGINT AS min_chars,
                 max(n_chars)::BIGINT AS max_chars,
                 sum(n_chars)::BIGINT AS sum_chars,
                 sum(n_chars::BIGINT * n_chars::BIGINT)::BIGINT AS sumsq_chars
          FROM documents GROUP BY lang
        )
        SELECT lang, n_docs, min_chars, max_chars, sum_chars, sumsq_chars,
               (n_docs * sumsq_chars - sum_chars * sum_chars)::DOUBLE
                 / (n_docs * n_docs)::DOUBLE AS variance,
               sqrt((n_docs * sumsq_chars - sum_chars * sum_chars)::DOUBLE
                 / (n_docs * n_docs)::DOUBLE) AS stddev
        FROM a
    """,
    "token_count": """
        SELECT doc_id, lang,
               len(regexp_extract_all(text, '\\S+'))::BIGINT AS n_ws_tokens,
               len(regexp_extract_all(lower(text), '[a-z0-9]+'))::BIGINT AS n_alnum_tokens
        FROM documents
    """,
    "quality_score": f"""
        WITH t AS (
          SELECT doc_id, lang, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents
        )
        SELECT doc_id, lang,
               len(toks)::BIGINT AS n_tokens,
               len(list_filter(toks, x -> x IN ({_in_list_sql(EN_STOP)})))::BIGINT AS n_stop,
               coalesce(list_sum(list_transform(toks, x -> length(x))), 0)::BIGINT AS total_token_len
        FROM t
    """,
    "lang_id": f"""
        WITH t AS (
          SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents
        ), h AS (
          SELECT doc_id,
               len(list_filter(toks, x -> x IN ({_in_list_sql(LANG_PROFILES['en'])})))::BIGINT AS en_hits,
               len(list_filter(toks, x -> x IN ({_in_list_sql(LANG_PROFILES['es'])})))::BIGINT AS es_hits,
               len(list_filter(toks, x -> x IN ({_in_list_sql(LANG_PROFILES['de'])})))::BIGINT AS de_hits,
               len(list_filter(toks, x -> x IN ({_in_list_sql(LANG_PROFILES['fr'])})))::BIGINT AS fr_hits
          FROM t
        )
        SELECT doc_id, en_hits, es_hits, de_hits, fr_hits,
               CASE WHEN en_hits >= es_hits AND en_hits >= de_hits AND en_hits >= fr_hits THEN 'en'
                    WHEN es_hits >= de_hits AND es_hits >= fr_hits THEN 'es'
                    WHEN de_hits >= fr_hits THEN 'de'
                    ELSE 'fr' END AS pred_lang
        FROM h
    """,
    "pii_redact": """
        WITH t0 AS (
          SELECT doc_id,
                 text || CASE
                   WHEN doc_id % 3 = 0 THEN ' contact user' || doc_id || '@example.com'
                   WHEN doc_id % 3 = 1 THEN ' from 10.0.' || (doc_id % 256) || '.' || (doc_id % 100)
                        || ' call 415-555-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
                   ELSE '' END AS text
          FROM documents
        ), t1 AS (
          SELECT doc_id,
                 len(regexp_extract_all(text, '{E}'))::BIGINT AS n_email,
                 regexp_replace(text, '{E}', '<EMAIL>', 'g') AS text
          FROM t0
        ), t2 AS (
          SELECT doc_id, n_email,
                 len(regexp_extract_all(text, '{I}'))::BIGINT AS n_ip,
                 regexp_replace(text, '{I}', '<IP>', 'g') AS text
          FROM t1
        ), t3 AS (
          SELECT doc_id, n_email, n_ip,
                 len(regexp_extract_all(text, '{P}'))::BIGINT AS n_phone,
                 regexp_replace(text, '{P}', '<PHONE>', 'g') AS text
          FROM t2
        )
        SELECT doc_id, n_email, n_ip, n_phone, text AS clean_text FROM t3
    """.format(E=PII_EMAIL, I=PII_IPV4, P=PII_PHONE),
    "gopher_rules": f"""
        WITH t0 AS (
          SELECT doc_id,
            text || CASE
              WHEN doc_id % 10 = 0 THEN repeat(chr(10) || '- filler bullet', 10)
              WHEN doc_id % 5 = 0 THEN chr(10) || '- alpha' || chr(10) || '- beta'
                   || chr(10) || '* gamma' || chr(10) || 'plain tail'
              WHEN doc_id % 7 = 0 THEN chr(10) || '#### ## # heading noise'
              WHEN doc_id % 3 = 0 THEN chr(10) || 'to be continued ...'
                   || chr(10) || 'more soon ...' || chr(10) || 'the end'
              ELSE '' END AS text
          FROM documents
        ), t AS (
          SELECT doc_id, text,
            regexp_extract_all(lower(text), '[a-z0-9]+') AS toks,
            string_split(text, chr(10)) AS lines
          FROM t0
        ), c AS (
          SELECT doc_id,
            len(toks)::BIGINT AS n_words,
            coalesce(list_sum(list_transform(toks, x -> length(x))), 0)::BIGINT AS total_word_len,
            (length(text) - length(replace(text, '#', '')))::BIGINT AS n_hash,
            ((length(text) - length(replace(text, '...', ''))) / 3)::BIGINT AS n_ellipsis,
            len(lines)::BIGINT AS n_lines,
            len(list_filter(lines, x -> ltrim(x, ' ') LIKE '-%' OR ltrim(x, ' ') LIKE '*%'))::BIGINT AS n_bullet_lines,
            len(list_filter(lines, x -> rtrim(x, ' ') LIKE '%...'))::BIGINT AS n_ellipsis_lines,
            len(list_filter([{_in_list_sql(GOPHER_REQUIRED_WORDS)}], w -> list_contains(toks, w)))::BIGINT AS n_required_hits
          FROM t
        )
        SELECT doc_id, n_words, total_word_len, n_hash, n_ellipsis, n_lines,
          n_bullet_lines, n_ellipsis_lines, n_required_hits,
          (n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS}) AS r_word_count,
          (3*n_words <= total_word_len AND total_word_len <= 10*n_words) AS r_mean_word_len,
          (10*(n_hash + n_ellipsis) <= n_words) AS r_symbol_ratio,
          (10*n_bullet_lines <= 9*n_lines) AS r_bullet_lines,
          (10*n_ellipsis_lines <= 3*n_lines) AS r_ellipsis_lines,
          (n_required_hits >= 2) AS r_required_words,
          (n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS}
           AND 3*n_words <= total_word_len AND total_word_len <= 10*n_words
           AND 10*(n_hash + n_ellipsis) <= n_words
           AND 10*n_bullet_lines <= 9*n_lines
           AND 10*n_ellipsis_lines <= 3*n_lines
           AND n_required_hits >= 2) AS keep
        FROM c
    """,
    # doc_fingerprint: intentionally no SQL (order-sensitive rolling hash)
    "phrase_match": f"""
        WITH ph(phrase) AS (VALUES {", ".join(f"('{p}')" for p in PHRASES)})
        SELECT ph.phrase, d.doc_id,
               ((len(d.text) - len(replace(d.text, ph.phrase, ''))) / len(ph.phrase))::BIGINT AS n_hits
        FROM documents d, ph
        WHERE position(ph.phrase IN d.text) > 0
    """,
}

QUERIES = {
    "token_count": q_token_count,
    "quality_score": q_quality_score,
    "lang_id": q_lang_id,
    "doc_fingerprint": q_doc_fingerprint,
    "phrase_match": q_phrase_match,
    "pii_redact": q_pii_redact,
    "gopher_rules": q_gopher_rules,
    "extended_stats": q_extended_stats,
}
