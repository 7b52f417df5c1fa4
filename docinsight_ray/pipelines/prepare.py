"""The composed LLM training-corpus PREPARATION pipeline.

Chains the engine's standalone training-data ops into the end-to-end
flow a real 100-TB pipeline runs between raw ingest and the tokenizer:

    length filter → exact dedup (keep-first) → near-dup cluster
    canonicals → benchmark decontamination → temperature-scaled
    mixture sampling → train/val/test split → sequence packing

Every stage is the deterministic rule its standalone gate already
proves, AND runs in that op's distributed shape — the per-doc decision
table stays a Ray Dataset end to end; the driver only ever holds
result-bounded artifacts (dup-sha rows, near-dup pair-graph labels,
per-lang counts, per-bucket scan offsets):

- length filter: ``n_chars >= PREP_MIN_CHARS`` — stateless Arrow
  predicate, no exchange.
- exact dedup: winner = min doc_id per sha AMONG the length-surviving
  population. Duplicate shas are detected with ONE hash groupby whose
  output is bounded by the duplicate count; losers resolve inside that
  bounded set and apply via ``joins.key_set_filter`` (broadcast
  ``is_in`` below ``PREP_BROADCAST_LIMIT``, hash-partitioned anti-join
  above — no process ever holds the full loser set on the big path).
- near-dup: connected components over the exact-Jaccard pair graph
  (``functions.dedup.q_ngram_jaccard_pairs`` — bounded output by
  construction) RESTRICTED to the current survivors; canonical =
  component min doc_id. Survivor restriction broadcasts the SMALL pair
  node set and filters the big side (never the reverse). Labeling is
  driver union-find below ``CC_DRIVER_PAIR_LIMIT`` pairs and the
  alternating-star contraction (``functions.graph``) above — the same
  two-tier switch ``q_dup_clusters`` proves. Losers (≤ pair-graph
  nodes) broadcast via ``ray.put``.
- decontamination: eval n-gram set from the full corpus (broadcast),
  survivors with any overlap dropped (``corpusops.q_decontaminate``).
- mixture sampling: per-lang keep threshold
  floor(sqrt(c_min/c_lang)·2³²) from a |langs|-row groupby over the
  POST-decontamination population; membership by sha prefix — applied
  as a vectorized per-lang OR mask (``corpusops.q_mixture_sample`` —
  sqrt/div are IEEE-exact, thresholds bit-identical across engines).
- split: content-hash thresholds, stateless Arrow string compares
  (``corpusops.q_dataset_split``).
- packing: per-SPLIT prefix scan in doc_id order, PACK_BUDGET-token
  sequences, as the bucketed two-phase distributed scan of
  ``corpusops.q_sequence_pack``: per-(split, bucket) token sums →
  driver cumsum over the |buckets| table only → broadcast offsets →
  per-bucket local scan.

The expensive text work (sha256, tokenize + count, n-gram hits) runs
ONCE, distributed, in a single ``map_batches`` pass producing the
narrow per-doc decision Dataset; each stage materializes only its
narrow survivor rows in the object store (spillable), never on the
driver. ``prepare_corpus_ds`` is the streaming core; the two gate
entries collect its result-sized outputs for the parity harness.
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
from ..functions.corpusops import (
    DECON_MOD,
    DECON_N,
    DECON_PREFIX,
    MIX_SCALE,
    PACK_BUCKET_W,
    PACK_BUDGET,
    SPLIT_TRAIN_MAX,
    SPLIT_VAL_MAX,
    _grams,
    _TOK2_RE,
    gram_hit_counts,
)
from ..ids import sha256_hex

PREP_MIN_CHARS = 100
# two-tier switches (same roles as EngineConfig.broadcast_limit and
# dedup.CC_DRIVER_PAIR_LIMIT; standalone constants so the pipeline has
# no index-config dependency)
PREP_BROADCAST_LIMIT = 1_000_000
PREP_MAX_PARTITIONS = 32


def _num_partitions() -> int:
    """Hash-join/shuffle partition count, capped by cluster CPUs: Ray's
    hash shuffle spins one aggregator actor per partition, so asking
    for 32 partitions inside a 4-CPU session stalls the pool (seen in
    the pytest session); at scale the cap simply tracks the cluster."""
    import ray as _ray

    cpus = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
    return max(2, min(PREP_MAX_PARTITIONS, cpus))


def _eval_gram_set(sf_dir: str) -> frozenset[str]:
    """Eval-set n-grams from the FULL corpus (q_decontaminate's rule):
    first DECON_PREFIX tokens of every doc_id ≡ 0 (mod DECON_MOD).
    Eval benchmarks are small by design — the gram set broadcasts."""

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


def _narrow_ds(sf_dir: str) -> "ray.data.Dataset":
    """ONE distributed pass over the text: per-doc
    (doc_id, lang, n_chars, sha, sha8, hexv, n_tokens, n_eval_hits).
    Materialized (object store, spillable) so the stage chain and both
    gates share the single expensive pass."""
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

    return (
        ray.data.read_parquet(
            os.path.join(sf_dir, "documents.parquet"),
            columns=["doc_id", "lang", "n_chars", "text"],
        )
        .map_batches(project, batch_format="pandas")
        .materialize()
    )


def _exact_dedup(p1: "ray.data.Dataset") -> "ray.data.Dataset":
    """Keep-first exact dedup: drop every row whose doc_id is not the
    min of its sha group. One hash groupby bounded-output dup-sha
    detection; loser resolution inside the bounded dup subset; loser
    application via the two-tier ``key_set_filter``."""
    from ray.data.aggregate import Count as RayCount
    from ray.data.aggregate import Min as RayMin

    from ..joins import key_set_filter, semi_join

    sha_counts = (
        p1.select_columns(["sha"]).groupby("sha").aggregate(RayCount(alias_name="n"))
    )
    dup_ds = sha_counts.map_batches(
        lambda t: t.filter(pc.greater(t["n"], pa.scalar(1))),
        batch_format="pyarrow",
    ).materialize()  # bounded by the duplicate-sha count
    n_dup_shas = dup_ds.count()
    if n_dup_shas == 0:
        return p1
    losers_count = int(dup_ds.sum("n")) - n_dup_shas
    parts = _num_partitions()
    # rows of duplicated shas only — bounded by the duplicate row count.
    # The broadcast-filter path leaves one (mostly EMPTY) block per
    # input block; consolidate before joining — Ray 2.49's hash join
    # SIGABRTs/ArrowInvalids on schema-less empty partition tables on
    # EITHER side (the joins.anti_join hazard, seen left-side at sf0.1)
    dup_rows = semi_join(
        p1.select_columns(["sha", "doc_id"]),
        dup_ds,
        on="sha",
        n_keys=n_dup_shas,
        broadcast_limit=PREP_BROADCAST_LIMIT,
        num_partitions=parts,
    ).repartition(parts)
    winners = dup_rows.groupby("sha").aggregate(RayMin("doc_id", alias_name="__win"))
    winners = winners.repartition(parts)  # empty-block join hazard
    losers_ds = (
        dup_rows.join(
            winners,
            join_type="inner",
            num_partitions=parts,
            on=("sha",),
        )
        .map_batches(
            lambda t: t.filter(pc.not_equal(t["doc_id"], t["__win"])).select(["doc_id"]),
            batch_format="pyarrow",
        )
    )
    return key_set_filter(
        p1,
        losers_ds,
        on="doc_id",
        n_keys=losers_count,
        broadcast_limit=PREP_BROADCAST_LIMIT,
        num_partitions=parts,
    )


def _near_dup_losers(sf_dir: str, p2: "ray.data.Dataset") -> list[int]:
    """Non-canonical members of near-dup components among the current
    survivors: cluster over the exact-Jaccard pair graph restricted to
    ``p2``; canonical = component min doc_id.

    Everything here is bounded by the pair graph (pairs ≪ docs by the
    near-dup op's construction): the SMALL pair node set broadcasts to
    filter the big survivor Dataset down to ≤|nodes| alive ids, the
    restriction then happens on the bounded pair list, and labeling
    takes the union-find / star-contraction two-tier switch that
    ``dedup.q_dup_clusters`` proves."""
    from ..functions.dedup import (
        CC_DRIVER_PAIR_LIMIT,
        _cc_labels_distributed,
        _cc_labels_union_find,
        q_ngram_jaccard_pairs,
    )

    pairs = q_ngram_jaccard_pairs(sf_dir).to_pandas()
    if not len(pairs):
        return []
    nodes = pa.array(
        sorted(set(pairs["a_id"].astype(int)) | set(pairs["b_id"].astype(int))),
        type=pa.int64(),
    )
    nodes_ref = ray.put(nodes)

    def only_pair_nodes(t: pa.Table, _r=nodes_ref) -> pa.Table:
        return t.select(["doc_id"]).filter(pc.is_in(t["doc_id"], value_set=ray.get(_r)))

    alive_tbl = collect_table(
        p2.map_batches(only_pair_nodes, batch_format="pyarrow"),
        pa.schema([("doc_id", pa.int64())]),
    )  # ≤ |pair nodes| rows
    alive = set(alive_tbl["doc_id"].to_pylist())
    pairs = pairs[pairs["a_id"].isin(alive) & pairs["b_id"].isin(alive)]
    if not len(pairs):
        return []
    if len(pairs) > CC_DRIVER_PAIR_LIMIT:
        label, _ = _cc_labels_distributed(pairs)
    else:
        label, _ = _cc_labels_union_find(pairs)
    return sorted(n for n, lab in label.items() if lab != n)


def _mixture_filter(p4: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-lang keep thresholds from a |langs|-row groupby; membership
    ``hexv < thr[lang]`` applied as a vectorized per-lang OR mask."""
    counts = p4.groupby("lang").count().to_pandas()  # |langs| rows
    cmin = float(counts["count()"].min())
    thr = {
        str(lang): int(np.floor(np.sqrt(cmin / float(c)) * MIX_SCALE))
        for lang, c in zip(counts["lang"], counts["count()"])
    }
    thr_ref = ray.put(thr)

    def keep_sampled(t: pa.Table, _r=thr_ref) -> pa.Table:
        th = ray.get(_r)
        mask = pa.array(np.zeros(t.num_rows, dtype=bool))
        for lang, cut in th.items():
            mask = pc.or_(
                mask,
                pc.and_(
                    pc.equal(t["lang"], pa.scalar(lang)),
                    pc.less(t["hexv"], pa.scalar(cut, type=pa.int64())),
                ),
            )
        return t.filter(mask)

    return p4.map_batches(keep_sampled, batch_format="pyarrow")


_POPS_CACHE: dict[str, tuple] = {}


def _stage_populations(sf_dir: str):
    """Run the decision chain; returns (per-stage survivor counts, the
    final materialized survivor Dataset). Memoized per sf_dir so the
    two gate entries share one execution. Each intermediate stage
    materializes narrow survivor rows in the OBJECT STORE (spillable);
    the driver holds only the counts."""
    if sf_dir in _POPS_CACHE:
        return _POPS_CACHE[sf_dir]

    narrow = _narrow_ds(sf_dir)
    n_input = narrow.count()

    p1 = narrow.map_batches(
        lambda t: t.filter(
            pc.greater_equal(t["n_chars"], pa.scalar(PREP_MIN_CHARS, type=pa.int64()))
        ),
        batch_format="pyarrow",
    ).materialize()
    c1 = p1.count()

    p2 = _exact_dedup(p1).materialize()
    c2 = p2.count()

    losers3 = _near_dup_losers(sf_dir, p2)
    if losers3:
        l3_ref = ray.put(pa.array(losers3, type=pa.int64()))

        def drop_near_dups(t: pa.Table, _r=l3_ref) -> pa.Table:
            return t.filter(pc.invert(pc.is_in(t["doc_id"], value_set=ray.get(_r))))

        p3 = p2.map_batches(drop_near_dups, batch_format="pyarrow").materialize()
    else:
        p3 = p2
    c3 = p3.count()

    p4 = p3.map_batches(
        lambda t: t.filter(pc.equal(t["n_eval_hits"], pa.scalar(0, type=pa.int64()))),
        batch_format="pyarrow",
    ).materialize()
    c4 = p4.count()

    p5 = _mixture_filter(p4).materialize()
    c5 = p5.count()

    counts = {"input": n_input, "p1": c1, "p2": c2, "p3": c3, "p4": c4, "p5": c5}
    _POPS_CACHE[sf_dir] = (counts, p5)
    return _POPS_CACHE[sf_dir]


def prepare_corpus_ds(sf_dir: str) -> "ray.data.Dataset":
    """The streaming core: kept rows of the composed preparation
    pipeline with their split assignment and training-sequence packing
    — (doc_id, lang, split, n_tokens, start_token, pack_id) as a Ray
    Dataset (one narrow row per kept doc; consume with write_parquet
    at scale).

    Packing is ``q_sequence_pack``'s bucketed two-phase distributed
    scan, partitioned by split: per-(split, bucket) token sums → the
    driver cumsums the |buckets|-row table only → broadcast offsets →
    per-bucket local doc_id-ordered scan."""
    _, p5 = _stage_populations(sf_dir)

    def assign_split(t: pa.Table) -> pa.Table:
        sha8 = t["sha8"]
        split = pc.if_else(
            pc.less(sha8, pa.scalar(SPLIT_TRAIN_MAX)),
            pa.scalar("train"),
            pc.if_else(
                pc.less(sha8, pa.scalar(SPLIT_VAL_MAX)),
                pa.scalar("val"),
                pa.scalar("test"),
            ),
        )
        doc_id = t["doc_id"]
        bucket = pc.divide(doc_id, pa.scalar(PACK_BUCKET_W, type=pa.int64()))
        return pa.table(
            {
                "doc_id": doc_id,
                "lang": t["lang"],
                "split": split,
                "n_tokens": t["n_tokens"],
                "bucket": bucket,
            }
        )

    counted = p5.map_batches(assign_split, batch_format="pyarrow").materialize()

    # Phase 1+2: per-(split, bucket) totals → driver cumsum over the
    # bucket table only (|docs|/PACK_BUCKET_W rows — never row-level).
    sums = counted.groupby(["split", "bucket"]).sum("n_tokens").to_pandas()
    sums = sums.sort_values(["split", "bucket"]).reset_index(drop=True)
    offsets: dict[tuple[str, int], int] = {}
    for split, g in sums.groupby("split"):
        tot = g["sum(n_tokens)"].to_numpy(dtype=np.int64)
        starts = np.concatenate([[0], np.cumsum(tot)[:-1]])
        offsets.update(
            ((str(split), int(b)), int(s))
            for b, s in zip(g["bucket"].astype(np.int64), starts)
        )
    offsets_ref = ray.put(offsets)

    # Phase 3: per-bucket local scan + broadcast offset. (split, bucket)
    # groups co-locate, so the in-group doc_id-ordered cumsum plus the
    # bucket's split-prefix offset is the global per-split prefix sum.
    def bucket_scan(g: pd.DataFrame) -> pd.DataFrame:
        offs = ray.get(offsets_ref)
        g = g.sort_values("doc_id").reset_index(drop=True)
        n = g["n_tokens"].to_numpy(dtype=np.int64)
        start = int(offs[(str(g["split"].iloc[0]), int(g["bucket"].iloc[0]))])
        start_token = start + np.concatenate([[0], np.cumsum(n)[:-1]])
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].astype(np.int64),
                "lang": g["lang"],
                "split": g["split"],
                "n_tokens": n,
                "start_token": start_token,
                "pack_id": start_token // PACK_BUDGET,
            }
        )

    return counted.groupby(["split", "bucket"]).map_groups(
        bucket_scan, batch_format="pandas"
    )


def q_prepare_corpus(sf_dir: str) -> pa.Table:
    """Gate tail: collect the streaming core's result (one narrow row
    per kept doc) for the parity harness, ordered by doc_id."""
    empty = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("lang", pa.string()),
            ("split", pa.string()),
            ("n_tokens", pa.int64()),
            ("start_token", pa.int64()),
            ("pack_id", pa.int64()),
        ]
    )
    return collect_table(prepare_corpus_ds(sf_dir), empty).sort_by("doc_id")


def q_prepare_corpus_stats(sf_dir: str) -> pa.Table:
    """Per-stage attrition of the composed pipeline:
    (stage, n_docs) — input, then docs dropped by each stage in order,
    then the final kept count."""
    c, _ = _stage_populations(sf_dir)
    rows = [
        ("0_input", c["input"]),
        ("1_len_filtered", c["input"] - c["p1"]),
        ("2_exact_dup", c["p1"] - c["p2"]),
        ("3_near_dup", c["p2"] - c["p3"]),
        ("4_contaminated", c["p3"] - c["p4"]),
        ("5_sampled_out", c["p4"] - c["p5"]),
        ("6_kept", c["p5"]),
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
