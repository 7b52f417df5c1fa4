"""Bounded-memory sketches over the ``documents`` token stream.

The 100-TB alternatives to exact wide ops: when an exact distinct
count or exact global top-k would shuffle the full vocabulary
(``groupby(term)`` moves every distinct key), a sketch keeps a
CONSTANT-size summary per batch and combines by elementwise max/sum —
no key shuffle at all, one tiny driver-side merge.

- ``distinct_terms_hll`` — HyperLogLog (p=12, 4096 registers):
  per-batch register arrays combined by elementwise max. Standard
  error ≈ 1.04/sqrt(4096) ≈ 1.6 %.
- ``heavy_hitters_cms`` — Count-Min (4 × 8192) + per-batch exact
  local top candidates: the merged CMS answers point queries with
  one-sided error (est ≥ true, est ≤ true + εN w.h.p.,
  ε = e/8192 ≈ 3.3e-4); candidates are the union of per-batch local
  top-``CMS_LOCAL_K`` terms, so any term that is globally heavy is a
  local heavy hitter in at least one batch.

Both are deterministic (fixed hash seeds, content-only inputs), so
the gate rows are stable across runs; accuracy vs the exact answers
is asserted in pytest (rows-only gate entries — the estimates are
approximate by design, so no value-hash SQL oracle).

Hashing uses blake2b with fixed per-use keys (stdlib, stable across
processes and platforms — NOT Python's salted ``hash``).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..collect import collect_table

HLL_P = 12
HLL_M = 1 << HLL_P  # registers

CMS_D = 4
CMS_W = 8192
CMS_LOCAL_K = 64  # per-batch candidate emission
CMS_TOPK = 20

_TOK_RE = r"[a-z0-9]+"


def _tokens_of(batch: pd.DataFrame) -> pd.Series:
    import re

    rx = re.compile(r"[a-z0-9]{2,}")
    return batch["text"].str.lower().str.findall(rx)


def _hash64(terms: np.ndarray, key: bytes) -> np.ndarray:
    """Stable 64-bit hashes of a string array (blake2b, fixed key)."""
    out = np.empty(terms.size, dtype=np.uint64)
    for i, t in enumerate(terms):
        out[i] = np.frombuffer(
            hashlib.blake2b(t.encode(), digest_size=8, key=key).digest(), dtype=np.uint64
        )[0]
    return out


def _read(sf_dir: str, cols: list[str]) -> "ray.data.Dataset":
    return ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=cols
    )


# ---- HyperLogLog distinct terms -------------------------------------------


def _hll_regs(vocab: set[str]) -> np.ndarray:
    """HLL register array for one set of distinct values."""
    regs = np.zeros(HLL_M, dtype=np.uint8)
    if vocab:
        h = _hash64(np.array(sorted(vocab), dtype=object), key=b"hll-seed-0")
        idx = (h >> np.uint64(64 - HLL_P)).astype(np.int64)
        rest = (h << np.uint64(HLL_P)) | np.uint64((1 << HLL_P) - 1)
        # rank = leading zeros of the remaining 64-p bits + 1
        lz = np.zeros(h.size, dtype=np.uint8)
        cur = rest.copy()
        for _ in range(64 - HLL_P + 1):
            top = (cur >> np.uint64(63)).astype(bool)
            lz[~top] += 1
            cur = cur << np.uint64(1)
            if top.all():
                break
        rank = np.minimum(lz + 1, 64 - HLL_P + 1).astype(np.uint8)
        np.maximum.at(regs, idx, rank)
    return regs


def _hll_partial(batch: pd.DataFrame) -> pd.DataFrame:
    """One row per batch: the 4096-register array (int64 list col would
    re-enter the two-fixed-col transport hazard — ship as bytes plus a
    checksum provenance column, ROADMAP §6b discipline)."""
    vocab: set[str] = set()
    for ts in _tokens_of(batch):
        vocab.update(ts)
    blob = _hll_regs(vocab).tobytes()
    return pd.DataFrame(
        {
            "regs": [blob],
            "n_regs": np.array([HLL_M], dtype=np.int64),
            "checksum": [hashlib.sha256(blob).hexdigest()[:16]],
        }
    )


def hll_estimate(regs: np.ndarray) -> float:
    """Bias-corrected HLL cardinality estimate (Flajolet et al. 2007,
    with the small-range linear-counting correction)."""
    m = float(HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    if e <= 2.5 * m:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            e = m * np.log(m / zeros)
    return float(e)


def q_distinct_terms_hll(sf_dir: str) -> pa.Table:
    """Approximate distinct-term count via HyperLogLog: per-batch
    register partials (constant 4 KiB each), elementwise-max merge on
    the driver (|batches| rows, not |vocabulary|), bias-corrected
    estimate. The exact comparison for test corpora ships alongside in
    pytest, never in the pipeline."""
    empty = pa.schema(
        [("regs", pa.binary()), ("n_regs", pa.int64()), ("checksum", pa.string())]
    )
    parts = collect_table(
        _read(sf_dir, ["text"]).map_batches(_hll_partial, batch_format="pandas"),
        empty,
    )
    regs = np.zeros(HLL_M, dtype=np.uint8)
    for blob, chk in zip(parts["regs"].to_pylist(), parts["checksum"].to_pylist()):
        assert hashlib.sha256(blob).hexdigest()[:16] == chk  # transport integrity
        regs = np.maximum(regs, np.frombuffer(blob, dtype=np.uint8))
    est = hll_estimate(regs)
    return pa.table(
        {
            "n_distinct_est": pa.array([int(round(est))], type=pa.int64()),
            "n_registers": pa.array([HLL_M], type=pa.int64()),
            "n_partials": pa.array([parts.num_rows], type=pa.int64()),
        }
    )


def _hll_group_partial(batch: pd.DataFrame) -> pd.DataFrame:
    """≤|langs in batch| rows: per-lang register partials — the
    Elasticsearch ``cardinality`` SUB-aggregation shape (terms bucket ×
    distinct count). Group count is bounded (languages), so partials
    stay constant-size per batch."""
    vocabs: dict[str, set] = {}
    for lang, ts in zip(batch["lang"].tolist(), _tokens_of(batch)):
        vocabs.setdefault(lang, set()).update(ts)
    rows = []
    for lang in sorted(vocabs):
        blob = _hll_regs(vocabs[lang]).tobytes()
        rows.append((lang, blob, hashlib.sha256(blob).hexdigest()[:16]))
    return pd.DataFrame(
        {
            "lang": [r[0] for r in rows],
            "regs": [r[1] for r in rows],
            "checksum": [r[2] for r in rows],
        }
    )


def q_distinct_terms_by_lang(sf_dir: str) -> pa.Table:
    """Approximate distinct-term count PER LANGUAGE (ES terms agg with
    a cardinality sub-agg): per-batch per-lang register partials merge
    by elementwise max on the driver (|batches|·|langs| rows). Same
    HLL as the global gate; exact comparison lives in pytest."""
    empty = pa.schema(
        [("lang", pa.string()), ("regs", pa.binary()), ("checksum", pa.string())]
    )
    parts = collect_table(
        _read(sf_dir, ["lang", "text"]).map_batches(
            _hll_group_partial, batch_format="pandas"
        ),
        empty,
    )
    merged: dict[str, np.ndarray] = {}
    for lang, blob, chk in zip(
        parts["lang"].to_pylist(), parts["regs"].to_pylist(), parts["checksum"].to_pylist()
    ):
        assert hashlib.sha256(blob).hexdigest()[:16] == chk  # transport integrity
        cur = merged.setdefault(lang, np.zeros(HLL_M, dtype=np.uint8))
        np.maximum(cur, np.frombuffer(blob, dtype=np.uint8), out=cur)
    langs = sorted(merged)
    return pa.table(
        {
            "lang": pa.array(langs, type=pa.string()),
            "n_distinct_est": pa.array(
                [int(round(hll_estimate(merged[l]))) for l in langs], type=pa.int64()
            ),
        }
    )


# ---- Count-Min heavy hitters ----------------------------------------------

_CMS_KEYS = [f"cms-row-{d}".encode() for d in range(CMS_D)]


def _cms_partial(batch: pd.DataFrame) -> pd.DataFrame:
    """One row per batch: the flattened d×w count matrix (as bytes)
    plus the batch's exact local top-``CMS_LOCAL_K`` candidate terms."""
    cnt: dict[str, int] = {}
    for ts in _tokens_of(batch):
        for t in ts:
            cnt[t] = cnt.get(t, 0) + 1
    mat = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    if cnt:
        terms = np.array(list(cnt), dtype=object)
        vals = np.fromiter(cnt.values(), dtype=np.int64, count=len(cnt))
        for d in range(CMS_D):
            idx = (_hash64(terms, key=_CMS_KEYS[d]) % np.uint64(CMS_W)).astype(np.int64)
            np.add.at(mat[d], idx, vals)
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:CMS_LOCAL_K]
    blob = mat.tobytes()
    return pd.DataFrame(
        {
            "mat": [blob],
            "cands": [" ".join(t for t, _ in top)],
            "checksum": [hashlib.sha256(blob).hexdigest()[:16]],
        }
    )


def cms_query(mat: np.ndarray, terms: list[str]) -> np.ndarray:
    """Point-query the merged CMS: min over the d row estimates."""
    if not terms:
        return np.zeros(0, dtype=np.int64)
    arr = np.array(terms, dtype=object)
    est = np.full(arr.size, np.iinfo(np.int64).max, dtype=np.int64)
    for d in range(CMS_D):
        idx = (_hash64(arr, key=_CMS_KEYS[d]) % np.uint64(CMS_W)).astype(np.int64)
        est = np.minimum(est, mat[d][idx])
    return est


def q_heavy_hitters_cms(sf_dir: str) -> pa.Table:
    """Global heavy-hitter terms (by total tf) via Count-Min sketch:
    constant-size per-batch matrices summed on the driver + local-top
    candidate union — no vocabulary shuffle anywhere. Estimates carry
    the CMS one-sided guarantee (est ≥ true); accuracy vs the exact
    counts is pytest-asserted."""
    empty = pa.schema(
        [("mat", pa.binary()), ("cands", pa.string()), ("checksum", pa.string())]
    )
    parts = collect_table(
        _read(sf_dir, ["text"]).map_batches(_cms_partial, batch_format="pandas"),
        empty,
    )
    mat = np.zeros((CMS_D, CMS_W), dtype=np.int64)
    cands: set[str] = set()
    for blob, cs, chk in zip(
        parts["mat"].to_pylist(), parts["cands"].to_pylist(), parts["checksum"].to_pylist()
    ):
        assert hashlib.sha256(blob).hexdigest()[:16] == chk  # transport integrity
        mat += np.frombuffer(blob, dtype=np.int64).reshape(CMS_D, CMS_W)
        cands.update(cs.split())
    cand_list = sorted(cands)
    est = cms_query(mat, cand_list)
    order = np.lexsort((np.array(cand_list, dtype=object), -est))[:CMS_TOPK]
    return pa.table(
        {
            "term": pa.array([cand_list[i] for i in order], type=pa.string()),
            "est_tf": pa.array(est[order], type=pa.int64()),
            "rank": pa.array(np.arange(order.size, dtype=np.int64), type=pa.int64()),
        }
    )


# ---- MRL quantile sketch over events.value ---------------------------------

QSK_K = 256  # per-level buffer capacity
QSK_QS = (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)


class MRLSketch:
    """Deterministic MRL-family mergeable quantile sketch (Manku,
    Rajagopalan & Lindsay 1998): levels of ≤k sorted buffers; a full
    buffer compacts by keeping alternate elements (offset alternates
    per level-compaction — deterministic, no coin flips) and promoting
    them with doubled weight. Rank error is O(levels/k)·n; with
    k=256 over sf0.1-scale streams measured error is well under 1 %.
    Merge = concatenate levels, recompact — associative enough that
    per-batch partial sketches combine on the driver, the
    HLL/CMS-style constant-size-summary discipline (no sort shuffle
    for a quantile, ever)."""

    def __init__(self, k: int = QSK_K):
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self._parity: list[int] = [0]

    def _ensure(self, lvl: int) -> None:
        while len(self.levels) <= lvl:
            self.levels.append(np.empty(0, dtype=np.float64))
            self._parity.append(0)

    def _compact_level(self, lvl: int) -> None:
        buf = np.sort(self.levels[lvl])
        off = self._parity[lvl]
        self._parity[lvl] ^= 1
        promoted = buf[off::2]
        self.levels[lvl] = np.empty(0, dtype=np.float64)
        self._ensure(lvl + 1)
        self.levels[lvl + 1] = np.concatenate((self.levels[lvl + 1], promoted))
        if self.levels[lvl + 1].size > self.k:
            self._compact_level(lvl + 1)

    def add(self, values: np.ndarray) -> None:
        values = np.asarray(values, dtype=np.float64)
        # chunked insertion keeps level-0 at ≤k between compactions
        i = 0
        while i < values.size:
            room = self.k - self.levels[0].size
            take = values[i : i + max(room, 1)]
            self.levels[0] = np.concatenate((self.levels[0], take))
            i += take.size
            if self.levels[0].size >= self.k:
                self._compact_level(0)

    def merge_rows(self, lvls: np.ndarray, vals: np.ndarray) -> None:
        for lvl in np.unique(lvls):
            self._ensure(int(lvl))
            self.levels[int(lvl)] = np.concatenate(
                (self.levels[int(lvl)], vals[lvls == lvl])
            )
        for lvl in range(len(self.levels)):
            if self.levels[lvl].size > self.k:
                self._compact_level(lvl)

    def rows(self) -> tuple[np.ndarray, np.ndarray]:
        lv = np.concatenate(
            [np.full(b.size, i, dtype=np.int64) for i, b in enumerate(self.levels)]
        ) if any(b.size for b in self.levels) else np.empty(0, dtype=np.int64)
        va = np.concatenate(self.levels) if any(b.size for b in self.levels) else np.empty(0)
        return lv, va

    def query(self, qs: tuple[float, ...]) -> np.ndarray:
        lv, va = self.rows()
        if va.size == 0:
            return np.full(len(qs), np.nan)
        w = (np.int64(1) << lv.astype(np.int64)).astype(np.float64)
        order = np.argsort(va, kind="mergesort")
        va, w = va[order], w[order]
        cw = np.cumsum(w)
        total = cw[-1]
        out = np.empty(len(qs))
        for i, q in enumerate(qs):
            t = q * total
            out[i] = va[int(np.searchsorted(cw, t, side="left"))]
        return out


def _qsk_partial(batch: pd.DataFrame) -> pd.DataFrame:
    sk = MRLSketch()
    sk.add(batch["value"].to_numpy(dtype=np.float64))
    lv, va = sk.rows()
    blob_l, blob_v = lv.tobytes(), va.tobytes()
    return pd.DataFrame(
        {
            "lvls": [blob_l],
            "vals": [blob_v],
            "checksum": [hashlib.sha256(blob_l + blob_v).hexdigest()[:16]],
        }
    )


def q_value_quantiles_sketch(sf_dir: str) -> pa.Table:
    """Approximate quantiles of ``events.value`` via per-batch MRL
    partial sketches merged on the driver — the bounded-memory,
    shuffle-free alternative to a distributed sort when the value
    column has unbounded cardinality (``corpusops.length_quantiles``
    is the exact-histogram path for bounded-cardinality ints).
    Rows-only gate (approximate by design); pytest asserts rank error
    vs the exact empirical quantiles and determinism."""
    empty = pa.schema(
        [("lvls", pa.binary()), ("vals", pa.binary()), ("checksum", pa.string())]
    )
    parts = collect_table(
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"), columns=["value"]
        ).map_batches(_qsk_partial, batch_format="pandas", batch_size=4096),
        empty,
    )
    sk = MRLSketch()
    for bl, bv, chk in zip(
        parts["lvls"].to_pylist(), parts["vals"].to_pylist(), parts["checksum"].to_pylist()
    ):
        assert hashlib.sha256(bl + bv).hexdigest()[:16] == chk  # transport integrity
        sk.merge_rows(np.frombuffer(bl, dtype=np.int64), np.frombuffer(bv, dtype=np.float64))
    est = sk.query(QSK_QS)
    return pa.table(
        {
            "q": pa.array(np.array(QSK_QS, dtype=np.float64), type=pa.float64()),
            "est": pa.array(np.round(est, 9), type=pa.float64()),
        }
    )


def _qsk_group_partial(batch: pd.DataFrame) -> pd.DataFrame:
    """Per-batch per-group MRL partials — one constant-size sketch row
    per (batch, event_type); group count is bounded (event types), so
    the driver merge is |types| × blocks rows."""
    rows = []
    for et, sub in batch.groupby("event_type"):
        sk = MRLSketch()
        sk.add(sub["value"].to_numpy(dtype=np.float64))
        lv, va = sk.rows()
        bl, bv = lv.tobytes(), va.tobytes()
        rows.append((str(et), bl, bv, hashlib.sha256(bl + bv).hexdigest()[:16]))
    return pd.DataFrame(rows, columns=["event_type", "lvls", "vals", "checksum"])


def q_value_quantiles_by_type(sf_dir: str) -> pa.Table:
    """Per-event-type approximate quantiles (the Elasticsearch
    percentiles-aggregation shape): per-batch per-group MRL partials
    merged on the driver — grouped quantiles with NO sort and no
    per-value shuffle, only |types| × blocks constant-size sketch
    rows. Rows-only gate; pytest asserts per-group rank error."""
    empty = pa.schema(
        [
            ("event_type", pa.string()),
            ("lvls", pa.binary()),
            ("vals", pa.binary()),
            ("checksum", pa.string()),
        ]
    )
    parts = collect_table(
        ray.data.read_parquet(
            os.path.join(sf_dir, "events.parquet"), columns=["event_type", "value"]
        ).map_batches(_qsk_group_partial, batch_format="pandas", batch_size=4096),
        empty,
    ).to_pandas()
    out_t, out_q, out_e = [], [], []
    for et in sorted(parts["event_type"].unique()):
        sk = MRLSketch()
        sub = parts[parts["event_type"] == et]
        for bl, bv, chk in zip(sub["lvls"], sub["vals"], sub["checksum"]):
            assert hashlib.sha256(bl + bv).hexdigest()[:16] == chk
            sk.merge_rows(
                np.frombuffer(bl, dtype=np.int64), np.frombuffer(bv, dtype=np.float64)
            )
        est = sk.query(QSK_QS)
        out_t.extend([et] * len(QSK_QS))
        out_q.extend(QSK_QS)
        out_e.extend(np.round(est, 9).tolist())
    return pa.table(
        {
            "event_type": pa.array(out_t, type=pa.string()),
            "q": pa.array(np.array(out_q, dtype=np.float64), type=pa.float64()),
            "est": pa.array(out_e, type=pa.float64()),
        }
    )


# ---- terms aggregation with per-shard error bounds --------------------------

TA_SHARDS = 16  # deterministic doc_id shards (partitioning-independent)
TA_M = 32  # per-shard reported top-M
TA_TOPN = 20


def _ta_partial(batch: pd.DataFrame) -> pd.DataFrame:
    """Per-batch partial (shard, term, cnt) — bounded by batch vocab."""
    shards = (batch["doc_id"].to_numpy(dtype=np.int64) % TA_SHARDS)
    cnt: dict[tuple[int, str], int] = {}
    for sh, ts in zip(shards, _tokens_of(batch)):
        for t in ts:
            key = (int(sh), t)
            cnt[key] = cnt.get(key, 0) + 1
    keys = sorted(cnt)
    return pd.DataFrame(
        {
            "shard": np.array([k[0] for k in keys], dtype=np.int64),
            "term": [k[1] for k in keys],
            "cnt": np.array([cnt[k] for k in keys], dtype=np.int64),
        }
    )


def _ta_shard_top(g: pd.DataFrame) -> pd.DataFrame:
    """One shard's exact counts → its reported top-M plus the M-th
    count (the shard's contribution to every unreported term's error
    bound — Elasticsearch's ``doc_count_error_upper_bound`` rule)."""
    agg = g.groupby("term", as_index=False)["cnt"].sum()
    agg = agg.sort_values(["cnt", "term"], ascending=[False, True]).head(TA_M)
    kth = int(agg["cnt"].min()) if len(agg) >= TA_M else 0
    agg["shard"] = int(g["shard"].iloc[0])
    agg["kth"] = np.int64(kth)
    return agg[["shard", "term", "cnt", "kth"]].reset_index(drop=True)


_ta_shard_top.__name__ = "_ta_shard_top"


def q_terms_agg_approx(sf_dir: str) -> pa.Table:
    """Distributed approximate top-``TA_TOPN`` terms with the
    Elasticsearch error-bound contract: each deterministic doc_id
    shard reports only its local top-``TA_M`` (term, count); the
    merged estimate is the sum of reported counts (est ≤ true), and
    ``err_bound`` sums the M-th local count of every shard that did
    NOT report the term — so true ∈ [est, est + err_bound], pytest-
    asserted against the exact counts. The scale win: per-shard
    reports are M rows regardless of vocabulary size, so the final
    merge is TA_SHARDS × TA_M rows instead of a full vocabulary
    shuffle."""
    empty = pa.schema(
        [
            ("shard", pa.int64()),
            ("term", pa.string()),
            ("cnt", pa.int64()),
            ("kth", pa.int64()),
        ]
    )
    reports = collect_table(
        _read(sf_dir, ["doc_id", "text"])
        .map_batches(_ta_partial, batch_format="pandas")
        .groupby("shard")
        .map_groups(_ta_shard_top, batch_format="pandas"),
        empty,
    ).to_pandas()
    kth_by_shard = reports.groupby("shard")["kth"].first()
    total_kth = int(kth_by_shard.sum())
    est = reports.groupby("term")["cnt"].sum()
    reported_kth = reports.groupby("term")["kth"].sum()
    bound = total_kth - reported_kth  # shards missing the term
    df = pd.DataFrame(
        {"term": est.index, "est_tf": est.to_numpy(dtype=np.int64),
         "err_bound": bound.reindex(est.index).to_numpy(dtype=np.int64)}
    )
    order = np.lexsort((df["term"].to_numpy(dtype=object), -df["est_tf"].to_numpy()))
    df = df.iloc[order[:TA_TOPN]].reset_index(drop=True)
    df["rank"] = np.arange(len(df), dtype=np.int64)
    return pa.Table.from_pandas(df, preserve_index=False)


QUERIES = {
    "distinct_terms_hll": q_distinct_terms_hll,
    "distinct_terms_by_lang": q_distinct_terms_by_lang,
    "heavy_hitters_cms": q_heavy_hitters_cms,
    "value_quantiles_sketch": q_value_quantiles_sketch,
    "value_quantiles_by_type": q_value_quantiles_by_type,
    "terms_agg_approx": q_terms_agg_approx,
}

# approximate by design → rows-only gate entries; accuracy bounds are
# asserted against exact answers in tests/test_sketches.py
ORACLE_SQL: dict[str, str] = {}
