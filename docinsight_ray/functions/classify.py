"""Model-based data-selection operators over the ``documents`` table.

The two classifier-shaped selection passes a web-scale training-data
pipeline runs after heuristic cleaning (CCNet / FineWeb-edu / DSIR):

- ``nb_classify``: train a Naive-Bayes quality classifier on a
  deterministic in-corpus seed set (docs from ``NB_SEED_SOURCES`` are
  the positive / "curated" class — the fastText-classifier shape of
  CCNet and FineWeb-edu, with the model small enough to train by pure
  aggregation) and score EVERY document with an integer micro
  log-odds. Training is one corpus pass of per-batch partial
  ``(term, tf_pos, tf_neg)`` tables (bounded by batch vocabulary,
  merged like the df sidecars); the model (≤ NB_VOCAB+1 weights)
  broadcasts via ``ray.put`` and scoring is a shuffle-free vectorized
  scan. Full SQL oracle.

- ``dsir_weights``: DSIR-style importance resampling (Xie et al. 2023,
  "Data Selection for Language Models via Importance Resampling"):
  hashed unigram bucket distributions for the target (seed docs) and
  raw corpus, per-document importance weight
  ``Σ_tokens ln(p_target(bucket)/p_raw(bucket))`` as an int64 micro
  sum, and a deterministic keep set — the top ``DSIR_KEEP_FRAC`` of
  documents by per-token importance rate. One pass of per-batch
  partial bucket histograms (bounded: 2×DSIR_BUCKETS rows per batch),
  a 256-entry weight table broadcast, then a shuffle-free scoring
  scan. Full SQL oracle.

Exactness discipline (shared with ``corpusops.q_unigram_surprisal``):
every per-term / per-bucket weight is ONE ``round(ln(int_ratio)·1e6)``
over exact integer products (all < 2^53 at gate scale), so per-doc
sums are order-independent int64 adds and the DuckDB oracle computes
the bitwise-identical value. At 10^12-token scale the integer products
in the ln ratio would exceed 2^53 — the weight then becomes
``ln(a)+ln(b)-ln(c)-ln(d)`` with the SAME expression mirrored in any
oracle; the pipeline shape is unchanged.

Scale shape (100 TB): both trainers reduce BOUNDED histograms (vocab-
truncated terms / fixed 256 buckets) via per-batch partials — the raw
token stream never shuffles; scoring is embarrassingly parallel. The
DSIR keep-set threshold is computed here from the collected per-doc
score table (the gate returns that table anyway); at scale the
threshold comes from a distributed quantile (histogram combiner, as
``corpusops.q_length_quantiles``) and the kept flag is a second
broadcast-compare scan — no sort, no driver materialization.

Reference provenance: the reference has no trained data-selection
pass (DocInsight prepares a retrieval corpus); these extend SURVEY.md
§2 toward the LLM-pipeline operators the 100-TB use case needs, per
the round-2 verdict's "LLM-data-pipeline operators" table.
"""

from __future__ import annotations

import hashlib
import itertools
import math
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..collect import collect_table
from .corpusops import _TOK2_RE, _TOK_SQL

# positive-class seed: a deterministic "curated sources" set (the
# FineWeb-edu convention: a small trusted slice labels the classifier)
NB_SEED_SOURCES = ("src0", "src1", "src2", "src3")
NB_VOCAB = 32  # top-total-tf terms admitted; everything else → OOV
_NB_V1 = NB_VOCAB + 1  # Laplace denominator add: vocab + OOV symbol

DSIR_BUCKETS = 256  # hashed unigram feature buckets
DSIR_KEEP_FRAC = 0.25  # keep the top quarter by per-token importance

_SEED_SQL = "(" + ", ".join(f"'{s}'" for s in NB_SEED_SOURCES) + ")"


def _read(sf_dir: str, cols: list[str]) -> "ray.data.Dataset":
    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=cols
    )


def _micro_ln_ratio(num: int, den: int) -> int:
    """round(ln(num/den)·1e6) over exact integer operands — the one
    float expression shared bit-for-bit with the SQL oracle."""
    return int(np.round(np.log(float(num) / float(den)) * 1e6))


# ---- Naive-Bayes quality classifier ---------------------------------------


def _nb_model(sf_dir: str) -> tuple[dict[str, int], int, int]:
    """Train the NB model: (term → micro weight, oov weight, prior).

    One corpus pass of bounded per-batch (term, tf_pos, tf_neg)
    partials; doc priors from a narrow ``source``-only scan."""

    def tf_partial(batch: pd.DataFrame) -> pd.DataFrame:
        pos = batch["source"].isin(NB_SEED_SOURCES).to_numpy()
        toks = batch["text"].str.lower().str.findall(_TOK2_RE)
        cp: dict[str, int] = {}
        cn: dict[str, int] = {}
        for is_pos, ts in zip(pos, toks):
            c = cp if is_pos else cn
            for t in ts:
                c[t] = c.get(t, 0) + 1
        terms = sorted(set(cp) | set(cn))
        return pd.DataFrame(
            {
                "term": terms,
                "tf_pos": np.array([cp.get(t, 0) for t in terms], dtype=np.int64),
                "tf_neg": np.array([cn.get(t, 0) for t in terms], dtype=np.int64),
            }
        )

    tf_empty = pa.schema(
        [("term", pa.string()), ("tf_pos", pa.int64()), ("tf_neg", pa.int64())]
    )
    tf = (
        collect_table(
            _read(sf_dir, ["text", "source"]).map_batches(
                tf_partial, batch_format="pandas"
            ),
            tf_empty,
        )
        .to_pandas()
        .groupby("term", as_index=False)[["tf_pos", "tf_neg"]]
        .sum()
    )
    t_pos = int(tf["tf_pos"].sum())
    t_neg = int(tf["tf_neg"].sum())
    tf["tf_total"] = tf["tf_pos"] + tf["tf_neg"]
    vocab = (
        tf.sort_values(["tf_total", "term"], ascending=[False, True])
        .head(NB_VOCAB)
        .reset_index(drop=True)
    )
    wmap = {
        t: _micro_ln_ratio((tp + 1) * (t_neg + _NB_V1), (tn + 1) * (t_pos + _NB_V1))
        for t, tp, tn in zip(vocab["term"], vocab["tf_pos"], vocab["tf_neg"])
    }
    w_oov = _micro_ln_ratio(t_neg + _NB_V1, t_pos + _NB_V1)

    def prior_partial(batch: pd.DataFrame) -> pd.DataFrame:
        pos = batch["source"].isin(NB_SEED_SOURCES).to_numpy()
        return pd.DataFrame(
            {
                "n_pos": np.array([int(pos.sum())], dtype=np.int64),
                "n_neg": np.array([int((~pos).sum())], dtype=np.int64),
            }
        )

    pr_empty = pa.schema([("n_pos", pa.int64()), ("n_neg", pa.int64())])
    pr = collect_table(
        _read(sf_dir, ["source"]).map_batches(prior_partial, batch_format="pandas"),
        pr_empty,
    ).to_pandas()
    w0 = _micro_ln_ratio(
        max(int(pr["n_pos"].sum()), 1), max(int(pr["n_neg"].sum()), 1)
    )
    return wmap, w_oov, w0


def _nb_score_texts(
    wm: dict[str, int], w_oov: int, w0: int, texts: pd.Series
) -> tuple[np.ndarray, np.ndarray]:
    """(n_tokens, logodds_micro) per text — the shared vectorized
    scoring kernel of q_nb_classify and q_nb_pr_curve."""
    toks = texts.str.lower().str.findall(_TOK2_RE)
    lens = toks.str.len().to_numpy(dtype=np.int64)
    flat = list(itertools.chain.from_iterable(toks))
    ws = np.fromiter(
        (wm.get(t, w_oov) for t in flat), dtype=np.int64, count=len(flat)
    )
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    wsum = np.where(
        lens > 0, np.add.reduceat(np.concatenate((ws, [0])), starts), 0
    ).astype(np.int64)
    return lens, w0 + wsum


def q_nb_classify(sf_dir: str) -> pa.Table:
    """Naive-Bayes quality score for every document: int64 micro
    log-odds (prior + Σ per-token class-likelihood ratio) and the
    binary prediction. See module docstring for the training shape."""
    wmap, w_oov, w0 = _nb_model(sf_dir)
    w_ref = ray.put(wmap)

    def score(batch: pd.DataFrame) -> pd.DataFrame:
        wm: dict[str, int] = ray.get(w_ref)
        lens, logodds = _nb_score_texts(wm, w_oov, w0, batch["text"])
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype("int64"),
                "n_tokens": lens,
                "logodds_micro": logodds,
                "pred": (logodds >= 0).astype(np.int64),
            }
        )

    empty = pa.schema(
        [
            ("doc_id", pa.int64()),
            ("n_tokens", pa.int64()),
            ("logodds_micro", pa.int64()),
            ("pred", pa.int64()),
        ]
    )
    return collect_table(
        _read(sf_dir, ["doc_id", "text"]).map_batches(score, batch_format="pandas"),
        empty,
    )


PR_DECILES = 10  # thresholds: exact score deciles (i = 0..9)


def q_nb_pr_curve(sf_dir: str) -> pa.Table:
    """Classifier evaluation: exact confusion counts (tp/fp/fn/tn) at
    the ``PR_DECILES`` exact decile thresholds of the score
    distribution — the precision/recall sweep a pipeline runs before
    picking the quality-filter cutoff (FineWeb-edu's threshold
    selection step). Full SQL oracle; all-int64 output.

    Two distributed passes: pass A is the scoring scan (per-doc
    logodds — the bounded per-doc table every gate collects), from
    which the driver takes the 10 exact decile VALUES (at 10^12 docs
    the thresholds come from the MRL quantile sketch instead —
    functions/sketches.py — rank error there shifts a cutpoint, never
    a count); pass B broadcasts (model, thresholds) and reduces
    constant-size per-batch confusion partials (10×4 ints)."""
    wmap, w_oov, w0 = _nb_model(sf_dir)

    # pass A: score distribution → exact decile thresholds
    w_ref = ray.put(wmap)

    def score_only(batch: pd.DataFrame) -> pd.DataFrame:
        wm = ray.get(w_ref)
        _, lo = _nb_score_texts(wm, w_oov, w0, batch["text"])
        return pd.DataFrame({"lo": lo})

    lo_empty = pa.schema([("lo", pa.int64())])
    lo = np.sort(
        collect_table(
            _read(sf_dir, ["text"]).map_batches(score_only, batch_format="pandas"),
            lo_empty,
        )["lo"].to_numpy()
    )
    n = lo.size
    idx = [max(int(math.ceil(i * n / PR_DECILES)), 1) - 1 for i in range(PR_DECILES)]
    thrs = lo[idx].astype(np.int64)

    # pass B: broadcast thresholds, constant-size confusion partials
    t_ref = ray.put(thrs)

    def confusion(batch: pd.DataFrame) -> pd.DataFrame:
        wm = ray.get(w_ref)
        ts = ray.get(t_ref)
        _, lo_b = _nb_score_texts(wm, w_oov, w0, batch["text"])
        pos = batch["source"].isin(NB_SEED_SOURCES).to_numpy()
        pred = lo_b[None, :] >= ts[:, None]  # (deciles, batch)
        tp = (pred & pos[None, :]).sum(axis=1)
        fp = (pred & ~pos[None, :]).sum(axis=1)
        fn = (~pred & pos[None, :]).sum(axis=1)
        tn = (~pred & ~pos[None, :]).sum(axis=1)
        return pd.DataFrame(
            {
                "decile": np.arange(PR_DECILES, dtype=np.int64),
                "thr_micro": ts.astype(np.int64),
                "tp": tp.astype(np.int64),
                "fp": fp.astype(np.int64),
                "fn": fn.astype(np.int64),
                "tn": tn.astype(np.int64),
            }
        )

    c_empty = pa.schema(
        [
            ("decile", pa.int64()),
            ("thr_micro", pa.int64()),
            ("tp", pa.int64()),
            ("fp", pa.int64()),
            ("fn", pa.int64()),
            ("tn", pa.int64()),
        ]
    )
    out = (
        collect_table(
            _read(sf_dir, ["text", "source"]).map_batches(
                confusion, batch_format="pandas"
            ),
            c_empty,
        )
        .to_pandas()
        .groupby(["decile", "thr_micro"], as_index=False)[["tp", "fp", "fn", "tn"]]
        .sum()
        .sort_values("decile")
        .reset_index(drop=True)
    )
    return pa.Table.from_pandas(out.astype("int64"), preserve_index=False)


# ---- DSIR hashed-ngram importance weights ----------------------------------


def _dsir_bucket(term: str) -> int:
    """sha256-prefix bucket — the identical expression runs in the SQL
    oracle (``('0x' || substr(sha256(term),1,8))::UBIGINT % B``)."""
    return int(hashlib.sha256(term.encode()).hexdigest()[:8], 16) % DSIR_BUCKETS


class _DsirTokens:
    """Shared per-actor term→bucket memo (the Zipf head amortizes the
    sha256 to a dict hit); used by both the histogram and scoring
    passes."""

    def __init__(self):
        self._memo: dict[str, int] = {}

    def buckets(self, texts: pd.Series) -> tuple[list[np.ndarray], np.ndarray]:
        toks = texts.str.lower().str.findall(_TOK2_RE)
        memo = self._memo
        out = []
        for ts in toks:
            bks = np.empty(len(ts), dtype=np.int64)
            for i, t in enumerate(ts):
                b = memo.get(t)
                if b is None:
                    b = memo[t] = _dsir_bucket(t)
                bks[i] = b
            out.append(bks)
        return out, toks.str.len().to_numpy(dtype=np.int64)


class _DsirHist(_DsirTokens):
    """Per-batch partial bucket histograms: (bucket, c_raw, c_tgt)."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        pos = batch["source"].isin(NB_SEED_SOURCES).to_numpy()
        per_doc, _ = self.buckets(batch["text"])
        raw = np.zeros(DSIR_BUCKETS, dtype=np.int64)
        tgt = np.zeros(DSIR_BUCKETS, dtype=np.int64)
        for is_pos, bks in zip(pos, per_doc):
            if bks.size:
                cnt = np.bincount(bks, minlength=DSIR_BUCKETS)
                raw += cnt
                if is_pos:
                    tgt += cnt
        return pd.DataFrame(
            {
                "bucket": np.arange(DSIR_BUCKETS, dtype=np.int64),
                "c_raw": raw,
                "c_tgt": tgt,
            }
        )


class _DsirScore(_DsirTokens):
    """Shuffle-free scoring scan: per-doc Σ bucket weights."""

    def __init__(self, w_ref):
        super().__init__()
        self.w = np.asarray(ray.get(w_ref), dtype=np.int64)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        per_doc, lens = self.buckets(batch["text"])
        s = np.array(
            [int(self.w[bks].sum()) if bks.size else 0 for bks in per_doc],
            dtype=np.int64,
        )
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"].astype("int64"),
                "n_tokens": lens,
                "dsir_micro": s,
            }
        )


def q_dsir_weights(sf_dir: str) -> pa.Table:
    """DSIR importance weights + deterministic keep set (top
    ``DSIR_KEEP_FRAC`` by per-token importance rate, doc_id
    tie-break). See module docstring."""
    hist_empty = pa.schema(
        [("bucket", pa.int64()), ("c_raw", pa.int64()), ("c_tgt", pa.int64())]
    )
    hist = (
        collect_table(
            _read(sf_dir, ["text", "source"]).map_batches(
                _DsirHist, batch_format="pandas", concurrency=2
            ),
            hist_empty,
        )
        .to_pandas()
        .groupby("bucket", as_index=False)[["c_raw", "c_tgt"]]
        .sum()
        .set_index("bucket")
        .reindex(range(DSIR_BUCKETS), fill_value=0)
    )
    c_raw = hist["c_raw"].to_numpy(dtype=np.int64)
    c_tgt = hist["c_tgt"].to_numpy(dtype=np.int64)
    t_raw = int(c_raw.sum())
    t_tgt = int(c_tgt.sum())
    w = np.array(
        [
            _micro_ln_ratio(
                (int(ct) + 1) * (t_raw + DSIR_BUCKETS),
                (int(cr) + 1) * (t_tgt + DSIR_BUCKETS),
            )
            for ct, cr in zip(c_tgt, c_raw)
        ],
        dtype=np.int64,
    )
    w_ref = ray.put(w)

    empty = pa.schema(
        [("doc_id", pa.int64()), ("n_tokens", pa.int64()), ("dsir_micro", pa.int64())]
    )
    per_doc = collect_table(
        _read(sf_dir, ["doc_id", "text"]).map_batches(
            _DsirScore,
            fn_constructor_args=(w_ref,),
            batch_format="pandas",
            concurrency=2,
        ),
        empty,
    ).to_pandas()

    # keep set: rank docs WITH tokens by exact-rounded per-token rate
    # (int/int double division — deterministic across engines)
    ranked = per_doc[per_doc["n_tokens"] > 0]
    rate = ranked["dsir_micro"].to_numpy(dtype=np.float64) / ranked[
        "n_tokens"
    ].to_numpy(dtype=np.float64)
    order = np.lexsort((ranked["doc_id"].to_numpy(), -rate))
    n_keep = int(math.ceil(DSIR_KEEP_FRAC * len(ranked)))
    kept_ids = set(ranked["doc_id"].to_numpy()[order[:n_keep]].tolist())
    per_doc["kept"] = (
        per_doc["doc_id"].isin(kept_ids).astype(np.int64)
    )
    per_doc = per_doc.sort_values("doc_id").reset_index(drop=True)
    return pa.Table.from_pandas(per_doc, preserve_index=False)


ORACLE_SQL = {
    "nb_classify": f"""
WITH lab AS (
  SELECT doc_id, text, (source IN {_SEED_SQL})::INT AS pos FROM documents
),
tok AS (
  SELECT doc_id, pos, t.term FROM lab, unnest({_TOK_SQL}) AS t(term)
),
tf AS (
  SELECT term, sum(pos)::BIGINT AS tfp, sum(1 - pos)::BIGINT AS tfn
  FROM tok GROUP BY term
),
tot AS (SELECT sum(tfp)::BIGINT AS tp, sum(tfn)::BIGINT AS tn FROM tf),
ranked AS (
  SELECT term, tfp, tfn,
         row_number() OVER (ORDER BY (tfp + tfn) DESC, term ASC) AS r
  FROM tf
),
w AS (
  SELECT term,
         round(ln(((tfp + 1) * (tn + {_NB_V1}))::DOUBLE
                / ((tfn + 1) * (tp + {_NB_V1}))) * 1000000)::BIGINT AS w
  FROM ranked CROSS JOIN tot WHERE r <= {NB_VOCAB}
),
oovw AS (
  SELECT round(ln((tn + {_NB_V1})::DOUBLE / (tp + {_NB_V1})) * 1000000)::BIGINT AS w
  FROM tot
),
prior AS (
  SELECT round(ln(greatest(sum(pos), 1)::DOUBLE
             / greatest(sum(1 - pos), 1)) * 1000000)::BIGINT AS w0
  FROM lab
),
scored AS (
  SELECT t.doc_id, coalesce(w.w, (SELECT w FROM oovw)) AS w
  FROM tok t LEFT JOIN w USING (term)
),
per_doc AS (
  SELECT doc_id, count(*)::BIGINT AS n_tokens, sum(w)::BIGINT AS sw
  FROM scored GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(p.n_tokens, 0)::BIGINT AS n_tokens,
       ((SELECT w0 FROM prior) + coalesce(p.sw, 0))::BIGINT AS logodds_micro,
       (((SELECT w0 FROM prior) + coalesce(p.sw, 0)) >= 0)::BIGINT AS pred
FROM documents d LEFT JOIN per_doc p USING (doc_id)
""",
    "nb_pr_curve": f"""
WITH lab AS (
  SELECT doc_id, text, (source IN {_SEED_SQL})::INT AS pos FROM documents
),
tok AS (
  SELECT doc_id, pos, t.term FROM lab, unnest({_TOK_SQL}) AS t(term)
),
tf AS (
  SELECT term, sum(pos)::BIGINT AS tfp, sum(1 - pos)::BIGINT AS tfn
  FROM tok GROUP BY term
),
tot AS (SELECT sum(tfp)::BIGINT AS tp, sum(tfn)::BIGINT AS tn FROM tf),
ranked AS (
  SELECT term, tfp, tfn,
         row_number() OVER (ORDER BY (tfp + tfn) DESC, term ASC) AS r
  FROM tf
),
w AS (
  SELECT term,
         round(ln(((tfp + 1) * (tn + {_NB_V1}))::DOUBLE
                / ((tfn + 1) * (tp + {_NB_V1}))) * 1000000)::BIGINT AS w
  FROM ranked CROSS JOIN tot WHERE r <= {NB_VOCAB}
),
oovw AS (
  SELECT round(ln((tn + {_NB_V1})::DOUBLE / (tp + {_NB_V1})) * 1000000)::BIGINT AS w
  FROM tot
),
prior AS (
  SELECT round(ln(greatest(sum(pos), 1)::DOUBLE
             / greatest(sum(1 - pos), 1)) * 1000000)::BIGINT AS w0
  FROM lab
),
scored AS (
  SELECT t.doc_id, coalesce(w.w, (SELECT w FROM oovw)) AS w
  FROM tok t LEFT JOIN w USING (term)
),
per_doc AS (
  SELECT doc_id, sum(w)::BIGINT AS sw FROM scored GROUP BY doc_id
),
scores AS (
  SELECT l.doc_id, l.pos,
         ((SELECT w0 FROM prior) + coalesce(p.sw, 0))::BIGINT AS lo
  FROM lab l LEFT JOIN per_doc p USING (doc_id)
),
nn AS (SELECT count(*)::BIGINT AS n FROM scores),
sranked AS (
  SELECT lo, row_number() OVER (ORDER BY lo ASC, doc_id ASC) AS r FROM scores
),
dec AS (SELECT unnest(generate_series(0, {PR_DECILES - 1}))::BIGINT AS decile),
thr AS (
  SELECT d.decile, s.lo AS thr_micro
  FROM dec d, nn, sranked s
  WHERE s.r = greatest(ceil(d.decile * nn.n / {PR_DECILES}.0)::BIGINT, 1)
),
cnt AS (
  SELECT t.decile, t.thr_micro,
         sum(CASE WHEN s.lo >= t.thr_micro AND s.pos = 1 THEN 1 ELSE 0 END)::BIGINT AS tp,
         sum(CASE WHEN s.lo >= t.thr_micro AND s.pos = 0 THEN 1 ELSE 0 END)::BIGINT AS fp,
         sum(CASE WHEN s.lo <  t.thr_micro AND s.pos = 1 THEN 1 ELSE 0 END)::BIGINT AS fn,
         sum(CASE WHEN s.lo <  t.thr_micro AND s.pos = 0 THEN 1 ELSE 0 END)::BIGINT AS tn
  FROM thr t CROSS JOIN scores s GROUP BY t.decile, t.thr_micro
)
SELECT decile, thr_micro, tp, fp, fn, tn FROM cnt
""",
    "dsir_weights": f"""
WITH tok AS (
  SELECT doc_id, (source IN {_SEED_SQL}) AS pos, t.term
  FROM documents, unnest({_TOK_SQL}) AS t(term)
),
b AS (
  SELECT doc_id, pos,
         (('0x' || substr(sha256(term), 1, 8))::UBIGINT % {DSIR_BUCKETS})::BIGINT AS bk
  FROM tok
),
cr AS (SELECT bk, count(*)::BIGINT AS c FROM b GROUP BY bk),
ct AS (SELECT bk, count(*)::BIGINT AS c FROM b WHERE pos GROUP BY bk),
tots AS (
  SELECT (SELECT count(*) FROM b WHERE pos)::BIGINT AS tt,
         (SELECT count(*) FROM b)::BIGINT AS tr
),
w AS (
  SELECT g.bk,
         round(ln(((coalesce(ct.c, 0) + 1) * (tr + {DSIR_BUCKETS}))::DOUBLE
                / ((coalesce(cr.c, 0) + 1) * (tt + {DSIR_BUCKETS}))) * 1000000)::BIGINT AS w
  FROM (SELECT unnest(generate_series(0, {DSIR_BUCKETS - 1}))::BIGINT AS bk) g
  LEFT JOIN ct ON ct.bk = g.bk
  LEFT JOIN cr ON cr.bk = g.bk
  CROSS JOIN tots
),
scored AS (SELECT b.doc_id, w.w FROM b JOIN w ON w.bk = b.bk),
per_doc AS (
  SELECT doc_id, count(*)::BIGINT AS n_tokens, sum(w)::BIGINT AS s
  FROM scored GROUP BY doc_id
),
nd AS (SELECT count(*)::BIGINT AS n FROM per_doc),
rk AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY (s::DOUBLE / n_tokens) DESC, doc_id ASC) AS r
  FROM per_doc
)
SELECT d.doc_id,
       coalesce(p.n_tokens, 0)::BIGINT AS n_tokens,
       coalesce(p.s, 0)::BIGINT AS dsir_micro,
       (CASE WHEN rk.r IS NOT NULL
              AND rk.r <= ceil({DSIR_KEEP_FRAC} * (SELECT n FROM nd))
             THEN 1 ELSE 0 END)::BIGINT AS kept
FROM documents d
LEFT JOIN per_doc p USING (doc_id)
LEFT JOIN rk USING (doc_id)
""",
}

QUERIES = {
    "nb_classify": q_nb_classify,
    "nb_pr_curve": q_nb_pr_curve,
    "dsir_weights": q_dsir_weights,
}
