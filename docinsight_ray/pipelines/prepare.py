"""The composed LLM training-corpus PREPARATION pipeline.

Chains the engine's standalone training-data ops into the end-to-end
flow a real 100-TB pipeline runs between raw ingest and the tokenizer:

    length filter → exact dedup (keep-first) → near-dup cluster
    canonicals → benchmark decontamination → temperature-scaled
    mixture sampling → train/val/test split → sequence packing

Every stage is the deterministic rule its standalone gate already
proves (see each op's module for the distributed form and its scale
notes):

- length filter: ``n_chars >= PREP_MIN_CHARS`` — stateless map.
- exact dedup: winner = min doc_id per sha256(text) AMONG the
  length-surviving population — Ray ``groupby(sha).min`` (the
  build-pipeline dedup shape; ``joins.key_set_filter`` is the
  broadcast/anti-join scale path for applying the loser set).
- near-dup: connected components over the exact-Jaccard pair graph
  (``functions.dedup.q_ngram_jaccard_pairs``) RESTRICTED to the
  current survivors; canonical = component min doc_id. Pairs ≪ docs
  by construction (see ``q_dup_clusters``).
- decontamination: eval n-gram set from the full corpus (broadcast),
  survivors with any overlap dropped (``corpusops.q_decontaminate``).
- mixture sampling: per-lang keep threshold
  floor(sqrt(c_min/c_lang)·2³²) computed over the POST-decontamination
  population; membership by sha prefix (``corpusops.q_mixture_sample``
  — sqrt/div are IEEE-exact, thresholds bit-identical across engines).
- split: content-hash thresholds (``corpusops.q_dataset_split``).
- packing: per-SPLIT prefix scan in doc_id order, PACK_BUDGET-token
  sequences (``corpusops.q_sequence_pack`` holds the bucketed
  two-phase distributed-scan form).

The expensive text work (sha256, tokenize + count, n-gram hits) runs
ONCE, distributed, in a single ``map_batches`` pass producing a narrow
per-doc decision table; the set algebra over that narrow table is
bounded per stage and mirrors the standalone ops' distributed shapes.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..collect import collect_table
from ..functions.corpusops import (
    DECON_MOD,
    DECON_N,
    DECON_PREFIX,
    MIX_SCALE,
    PACK_BUDGET,
    SPLIT_TRAIN_MAX,
    SPLIT_VAL_MAX,
    _grams,
    _TOK2_RE,
    gram_hit_counts,
)
from ..ids import sha256_hex

PREP_MIN_CHARS = 100


def _eval_gram_set(sf_dir: str) -> frozenset[str]:
    """Eval-set n-grams from the FULL corpus (q_decontaminate's rule):
    first DECON_PREFIX tokens of every doc_id ≡ 0 (mod DECON_MOD)."""

    def bench_prefixes(batch: pd.DataFrame) -> pa.Table:
        sel = batch[batch["doc_id"] % DECON_MOD == 0]
        toks = sel["text"].str.lower().str.findall(_TOK2_RE).str.slice(0, DECON_PREFIX)
        return pa.table({"toks": pa.array(toks.str.join(" ").tolist(), type=pa.string())})

    bench = collect_table(
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        ).map_batches(bench_prefixes, batch_format="pandas"),
        pa.schema([("toks", pa.string())]),
    )
    grams: set[str] = set()
    for row in bench["toks"].to_pylist():
        grams |= _grams(row.split(), DECON_N)
    return frozenset(grams)


def _narrow_table(sf_dir: str) -> pd.DataFrame:
    """ONE distributed pass over the text: per-doc
    (doc_id, lang, n_chars, sha, sha8, hexv, n_tokens, n_eval_hits)."""
    grams_ref = ray.put(_eval_gram_set(sf_dir))

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        gs = ray.get(grams_ref)
        shas = sha256_hex(batch["text"].tolist())
        toks = batch["text"].str.lower().str.findall(_TOK2_RE)
        n_hits = gram_hit_counts(batch["text"], gs, DECON_N)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype("int64"),
                "lang": batch["lang"],
                "n_chars": batch["n_chars"].astype("int64"),
                "sha": shas,
                "sha8": [s[:8] for s in shas],
                "hexv": np.array([int(s[:8], 16) for s in shas], dtype=np.int64),
                "n_tokens": toks.str.len().astype("int64"),
                "n_eval_hits": n_hits,
            }
        )

    empty = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("lang", pa.string()),
            ("n_chars", pa.int64()),
            ("sha", pa.string()),
            ("sha8", pa.string()),
            ("hexv", pa.int64()),
            ("n_tokens", pa.int64()),
            ("n_eval_hits", pa.int64()),
        ]
    )
    return collect_table(
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "lang", "n_chars", "text"],
        ).map_batches(project, batch_format="pandas"),
        empty,
    ).to_pandas()


_POPS_CACHE: dict[str, tuple] = {}


def _stage_populations(sf_dir: str):
    """Run the decision chain; returns (narrow, dict of stage →
    surviving populations). Memoized per sf_dir so the two gate
    entries share one execution."""
    if sf_dir in _POPS_CACHE:
        return _POPS_CACHE[sf_dir]
    from ..functions.dedup import q_ngram_jaccard_pairs

    t = _narrow_table(sf_dir)

    p1 = t[t["n_chars"] >= PREP_MIN_CHARS]
    winners = p1.groupby("sha")["doc_id"].transform("min")
    p2 = p1[p1["doc_id"] == winners]

    # near-dup CC restricted to current survivors
    pairs = q_ngram_jaccard_pairs(sf_dir).to_pandas()
    alive = set(p2["doc_id"].astype(int))
    pairs = pairs[pairs["a_id"].isin(alive) & pairs["b_id"].isin(alive)]
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pairs["a_id"].astype(int), pairs["b_id"].astype(int)):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = set(pairs["a_id"].astype(int)) | set(pairs["b_id"].astype(int))
    members: dict[int, list[int]] = {}
    for n in nodes:
        members.setdefault(find(n), []).append(n)
    label = {n: min(ms) for ms in members.values() for n in ms}
    keep3 = p2["doc_id"].map(lambda d: label.get(int(d), int(d)) == int(d))
    p3 = p2[keep3]

    p4 = p3[p3["n_eval_hits"] == 0]

    counts = p4.groupby("lang")["doc_id"].size()
    cmin = float(counts.min())
    thr = {
        lang: int(np.floor(np.sqrt(cmin / float(c)) * MIX_SCALE))
        for lang, c in counts.items()
    }
    p5 = p4[p4["hexv"] < p4["lang"].map(thr).astype(np.int64)]

    _POPS_CACHE[sf_dir] = (t, {"p1": p1, "p2": p2, "p3": p3, "p4": p4, "p5": p5})
    return _POPS_CACHE[sf_dir]


def q_prepare_corpus(sf_dir: str) -> pa.Table:
    """Kept rows of the composed preparation pipeline with their split
    assignment and training-sequence packing:
    (doc_id, lang, split, n_tokens, start_token, pack_id)."""
    _, pops = _stage_populations(sf_dir)
    out = pops["p5"].copy()
    out["split"] = np.where(
        out["sha8"] < SPLIT_TRAIN_MAX,
        "train",
        np.where(out["sha8"] < SPLIT_VAL_MAX, "val", "test"),
    )
    out = out.sort_values("doc_id").reset_index(drop=True)
    # per-split prefix scan in doc_id order (distributed form:
    # corpusops.q_sequence_pack's bucketed two-phase scan per split)
    start = np.zeros(len(out), dtype=np.int64)
    for split, g in out.groupby("split"):
        n = g["n_tokens"].to_numpy(dtype=np.int64)
        start[g.index.to_numpy()] = np.concatenate([[0], np.cumsum(n)[:-1]])
    out["start_token"] = start
    out["pack_id"] = out["start_token"] // PACK_BUDGET
    return pa.table(
        {
            "doc_id": pa.array(out["doc_id"].astype(np.int64), type=pa.int64()),
            "lang": pa.array(out["lang"], type=pa.string()),
            "split": pa.array(out["split"], type=pa.string()),
            "n_tokens": pa.array(out["n_tokens"].astype(np.int64), type=pa.int64()),
            "start_token": pa.array(out["start_token"].astype(np.int64), type=pa.int64()),
            "pack_id": pa.array(out["pack_id"].astype(np.int64), type=pa.int64()),
        }
    )


def q_prepare_corpus_stats(sf_dir: str) -> pa.Table:
    """Per-stage attrition of the composed pipeline:
    (stage, n_docs) — input, then docs dropped by each stage in order,
    then the final kept count."""
    t, pops = _stage_populations(sf_dir)
    rows = [
        ("0_input", len(t)),
        ("1_len_filtered", len(t) - len(pops["p1"])),
        ("2_exact_dup", len(pops["p1"]) - len(pops["p2"])),
        ("3_near_dup", len(pops["p2"]) - len(pops["p3"])),
        ("4_contaminated", len(pops["p3"]) - len(pops["p4"])),
        ("5_sampled_out", len(pops["p4"]) - len(pops["p5"])),
        ("6_kept", len(pops["p5"])),
    ]
    return pa.table(
        {
            "stage": pa.array([s for s, _ in rows], type=pa.string()),
            "n_docs": pa.array([n for _, n in rows], type=pa.int64()),
        }
    )


# ---- oracle SQL -----------------------------------------------------------

from ..functions.dedup import _PAIRS_SQL  # noqa: E402

_TOK_SQL = "list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), t -> length(t) >= 2)"

_GRAM3 = "toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]"

_PREP_CTES = f"""
d AS (
  SELECT doc_id, lang, n_chars, sha256(text) AS sha,
         substr(sha256(text), 1, 8) AS sha8,
         ('0x' || substr(sha256(text), 1, 8))::UBIGINT::BIGINT AS hexv,
         {_TOK_SQL} AS toks
  FROM documents
),
p1 AS (SELECT * FROM d WHERE n_chars >= {PREP_MIN_CHARS}),
w AS (SELECT sha, min(doc_id) AS win FROM p1 GROUP BY sha),
p2 AS (SELECT p1.* FROM p1 JOIN w ON w.sha = p1.sha AND w.win = p1.doc_id),
pr AS ({_PAIRS_SQL}),
e2 AS (
  SELECT pr.a_id, pr.b_id FROM pr
  JOIN p2 a ON a.doc_id = pr.a_id
  JOIN p2 b ON b.doc_id = pr.b_id
),
edges AS (
  SELECT a_id AS a, b_id AS b FROM e2
  UNION ALL
  SELECT b_id AS a, a_id AS b FROM e2
),
nodes AS (SELECT DISTINCT a AS doc_id FROM edges),
reach(doc_id, other) AS (
  SELECT doc_id, doc_id FROM nodes
  UNION
  SELECT r.doc_id, e.b FROM reach r JOIN edges e ON e.a = r.other
),
lab AS (SELECT doc_id, min(other) AS cluster_id FROM reach GROUP BY doc_id),
p3 AS (
  SELECT p2.* FROM p2
  LEFT JOIN lab ON lab.doc_id = p2.doc_id
  WHERE coalesce(lab.cluster_id, p2.doc_id) = p2.doc_id
),
qdoc AS (
  SELECT list_slice(toks, 1, {DECON_PREFIX}) AS toks FROM d
  WHERE doc_id % {DECON_MOD} = 0
),
qgram AS (
  SELECT DISTINCT g FROM (
    SELECT unnest(list_transform(
             generate_series(1, greatest(len(toks) - {DECON_N - 1}, 0)),
             i -> {_GRAM3})) AS g
    FROM qdoc
  )
),
dgr AS (
  SELECT doc_id,
         unnest(list_transform(
           generate_series(1, greatest(len(toks) - {DECON_N - 1}, 0)),
           i -> {_GRAM3})) AS g
  FROM p3
),
hits AS (SELECT DISTINCT dgr.doc_id FROM dgr JOIN qgram USING (g)),
p4 AS (SELECT p3.* FROM p3 WHERE p3.doc_id NOT IN (SELECT doc_id FROM hits)),
c AS (SELECT lang, count(*)::DOUBLE AS c FROM p4 GROUP BY lang),
m AS (SELECT min(c) AS cmin FROM c),
thr AS (SELECT c.lang, floor(sqrt(m.cmin / c.c) * {MIX_SCALE!r})::BIGINT AS thr FROM c, m),
p5 AS (SELECT p4.* FROM p4 JOIN thr ON thr.lang = p4.lang WHERE p4.hexv < thr.thr)
"""

ORACLE_SQL = {
    "prepare_corpus": f"""
WITH RECURSIVE {_PREP_CTES},
s AS (
  SELECT doc_id, lang, len(toks)::BIGINT AS n_tokens,
         CASE WHEN sha8 < '{SPLIT_TRAIN_MAX}' THEN 'train'
              WHEN sha8 < '{SPLIT_VAL_MAX}' THEN 'val'
              ELSE 'test' END AS split
  FROM p5
),
packed AS (
  SELECT doc_id, lang, split, n_tokens,
         coalesce(sum(n_tokens) OVER (PARTITION BY split ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
           AS start_token
  FROM s
)
SELECT doc_id, lang, split, n_tokens, start_token,
       (start_token // {PACK_BUDGET})::BIGINT AS pack_id
FROM packed
""",
    "prepare_corpus_stats": f"""
WITH RECURSIVE {_PREP_CTES}
SELECT '0_input' AS stage, count(*)::BIGINT AS n_docs FROM d
UNION ALL
SELECT '1_len_filtered', (SELECT count(*) FROM d) - count(*) FROM p1
UNION ALL
SELECT '2_exact_dup', (SELECT count(*) FROM p1) - count(*) FROM p2
UNION ALL
SELECT '3_near_dup', (SELECT count(*) FROM p2) - count(*) FROM p3
UNION ALL
SELECT '4_contaminated', (SELECT count(*) FROM p3) - count(*) FROM p4
UNION ALL
SELECT '5_sampled_out', (SELECT count(*) FROM p4) - count(*) FROM p5
UNION ALL
SELECT '6_kept', count(*)::BIGINT FROM p5
""",
}

QUERIES = {
    "prepare_corpus": q_prepare_corpus,
    "prepare_corpus_stats": q_prepare_corpus_stats,
}
