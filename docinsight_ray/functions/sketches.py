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


def _hll_partial(batch: pd.DataFrame) -> pd.DataFrame:
    """One row per batch: the 4096-register array (int64 list col would
    re-enter the two-fixed-col transport hazard — ship as bytes plus a
    checksum provenance column, ROADMAP §6b discipline)."""
    regs = np.zeros(HLL_M, dtype=np.uint8)
    vocab: set[str] = set()
    for ts in _tokens_of(batch):
        vocab.update(ts)
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
    blob = regs.tobytes()
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


QUERIES = {
    "distinct_terms_hll": q_distinct_terms_hll,
    "heavy_hitters_cms": q_heavy_hitters_cms,
}

# approximate by design → rows-only gate entries; accuracy bounds are
# asserted against exact answers in tests/test_sketches.py
ORACLE_SQL: dict[str, str] = {}
