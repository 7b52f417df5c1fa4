"""Python oracles for the gates DuckDB cannot express.

Each entry in ``PY_ORACLES`` is an INDEPENDENT single-process
reimplementation (pyarrow.parquet + numpy/pandas, no Ray) of one
rows-only gate, used by ``scripts/check_parity.py`` to assert
exactness — not just row counts — for the ``no_oracle`` entries.

What each oracle validates: the engine side runs distributed
(map_batches partials, groupby shuffles, actor pools); the oracle
recomputes the same contract sequentially from the raw parquet, so
any bug in partial/merge algebra, shuffle grouping, block transport,
or actor plumbing shows up as a frame mismatch. Driver-side pure
trainers that the gate itself runs on the driver (the unigram EM
loop) are imported rather than duplicated — for those gates the
oracle's value is validating the DISTRIBUTED stages around them
(histograms, encoder actor pools), which it recomputes independently.

Two check styles:

- **exact** — the gate output must equal the oracle frame exactly
  (after canonical row/column ordering); used whenever the gate's
  result is a pure function of the input set (most are — the repo's
  partial/merge algebra is deliberately batch-independent).
- **bound** — for estimates whose exact value depends on batch
  boundaries (CMS candidate union, MRL compaction splits, quantized
  candidate pre-cuts), the oracle asserts the op's published
  quantitative contract against exact ground truth: one-sided CMS
  error, MRL rank error, SQ8/PQ recall floors plus exact-score-on-
  overlap.
"""

from __future__ import annotations

import hashlib
import math
import os
import re
from collections.abc import Callable

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

_TOKEN_RE = re.compile(r"[a-z0-9]+")
_TOK2_RE = re.compile(r"[a-z0-9]{2,}")


def _docs(sf_dir: str, cols=("doc_id", "text")) -> pd.DataFrame:
    return pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=list(cols)
    ).to_pandas()


def _emb(sf_dir: str, cols=("vec_id", "embedding")) -> pd.DataFrame:
    return pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=list(cols)
    ).to_pandas()


def _emb_matrix(sf_dir: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(vec_ids, float64 rows, normalized rows) in vec_id order."""
    t = _emb(sf_dir)
    order = np.argsort(t["vec_id"].to_numpy())
    vids = t["vec_id"].to_numpy()[order].astype(np.int64)
    X = np.stack(t["embedding"].to_numpy()[order]).astype(np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    return vids, X, Xn


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == np.uint64:
            continue
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def frame_equal(
    got: pd.DataFrame, want: pd.DataFrame, float_tol: float = 0.0
) -> tuple[bool, str]:
    g, w = _canon(got), _canon(want)
    if list(g.columns) != list(w.columns):
        return False, f"cols {list(g.columns)} != {list(w.columns)}"
    if len(g) != len(w):
        return False, f"rows {len(g)} != {len(w)}"
    for c in g.columns:
        gv, wv = g[c].to_numpy(), w[c].to_numpy()
        if float_tol and pd.api.types.is_float_dtype(g[c]):
            bad = ~np.isclose(gv.astype(np.float64), wv.astype(np.float64),
                              atol=float_tol, rtol=0.0, equal_nan=True)
        else:
            bad = ~((gv == wv) | (pd.isna(gv) & pd.isna(wv)))
        if bad.any():
            i = int(np.flatnonzero(bad)[0])
            return False, f"{c}[{i}]: {gv[i]!r} != {wv[i]!r}"
    return True, f"{len(g)} rows exact"


def _exact(expected_fn: Callable[[str], pd.DataFrame], float_tol: float = 0.0):
    def check(sf_dir: str, got: pd.DataFrame) -> tuple[bool, str]:
        return frame_equal(got, expected_fn(sf_dir), float_tol=float_tol)

    return check


# ---- text hashing family ----------------------------------------------------


def _simhash_of(text: str) -> int:
    toks = _TOKEN_RE.findall(text.lower())
    if not toks:
        return 0
    uniq, tf = np.unique(np.asarray(toks, dtype=object), return_counts=True)
    h = pd.util.hash_array(uniq)
    bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(np.int64)
    acc = ((2 * bits - 1) * tf[:, None].astype(np.int64)).sum(axis=0)
    return int(np.bitwise_or.reduce(
        (acc > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)
    ))


def e_simhash64(sf_dir: str) -> pd.DataFrame:
    d = _docs(sf_dir)
    return pd.DataFrame(
        {
            "doc_id": d["doc_id"].astype("int64"),
            "simhash": np.array([_simhash_of(t) for t in d["text"]], dtype=np.uint64),
            "content_sha8": [
                hashlib.sha256(t.encode()).hexdigest()[:8] for t in d["text"]
            ],
        }
    )


def e_simhash_near_dup(sf_dir: str, max_hamming: int = 3) -> pd.DataFrame:
    """All-pairs brute force over the per-doc SimHashes — validates the
    band-pigeonhole blocking end to end."""
    d = _docs(sf_dir)
    ids = d["doc_id"].to_numpy().astype(np.int64)
    h = np.array([_simhash_of(t) for t in d["text"]], dtype=np.uint64)
    a, b = np.triu_indices(ids.size, k=1)
    x = h[a] ^ h[b]
    lut = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)
    ham = lut[np.ascontiguousarray(x).view(np.uint8).reshape(-1, 8)].sum(axis=1).astype(np.int64)
    keep = ham <= max_hamming
    lo = np.minimum(ids[a[keep]], ids[b[keep]])
    hi = np.maximum(ids[a[keep]], ids[b[keep]])
    return pd.DataFrame({"a_id": lo, "b_id": hi, "hamming": ham[keep]})


_FP_MOD = (1 << 61) - 1
_FP_BASE = 1_000_003


def e_doc_fingerprint(sf_dir: str) -> pd.DataFrame:
    d = _docs(sf_dir)
    fps = []
    for t in d["text"]:
        hsh = 0
        for tok in _TOKEN_RE.findall(t.lower()):
            th = 0
            for ch in tok.encode("utf-8"):
                th = (th * 131 + ch) % _FP_MOD
            hsh = (hsh * _FP_BASE + th + 1) % _FP_MOD
        fps.append(hsh)
    return pd.DataFrame(
        {
            "doc_id": d["doc_id"].astype("int64"),
            "fingerprint": np.array(fps, dtype=np.uint64),
            "content_sha8": [
                hashlib.sha256(t.encode()).hexdigest()[:8] for t in d["text"]
            ],
        }
    )


# ---- tokenizer training family ----------------------------------------------


def _word_hist(sf_dir: str) -> pd.DataFrame:
    """Sequential (word, count) histogram — the independent twin of
    ``bpe.word_histogram``'s distributed partial-count pass."""
    d = _docs(sf_dir, cols=("text",))
    cnt: dict[str, int] = {}
    for t in d["text"]:
        for w in _TOKEN_RE.findall(t.lower()):
            cnt[w] = cnt.get(w, 0) + 1
    return pd.DataFrame(
        {"word": sorted(cnt), "count": [cnt[w] for w in sorted(cnt)]}
    )


_EOW = "</w>"


def _naive_bpe(words: list[str], counts: list[int], num_merges=200, min_pair=2):
    """From-scratch-recount BPE reference (no incremental bookkeeping):
    every merge recounts all pairs — slow but unarguable."""
    syms = [list(w) + [_EOW] for w in words]
    merges = []
    for _ in range(num_merges):
        pc: dict[tuple[str, str], int] = {}
        for s, c in zip(syms, counts):
            for p in zip(s, s[1:]):
                pc[p] = pc.get(p, 0) + c
        if not pc:
            break
        maxc = max(pc.values())
        if maxc < min_pair:
            break
        a, b = min(p for p, c in pc.items() if c == maxc)
        merged = a + b
        merges.append((a, b, merged, maxc))
        for i, s in enumerate(syms):
            new, j = [], 0
            while j < len(s):
                if j + 1 < len(s) and s[j] == a and s[j + 1] == b:
                    new.append(merged)
                    j += 2
                else:
                    new.append(s[j])
                    j += 1
            syms[i] = new
    return merges


def e_bpe_vocab(sf_dir: str) -> pd.DataFrame:
    hist = _word_hist(sf_dir)
    merges = _naive_bpe(hist["word"].tolist(), hist["count"].tolist())
    disp = lambda s: s.replace(_EOW, "_")  # noqa: E731
    return pd.DataFrame(
        {
            "rank": np.arange(len(merges), dtype=np.int64),
            "left": [disp(a) for a, _b, _m, _c in merges],
            "right": [disp(b) for _a, b, _m, _c in merges],
            "merged": [disp(m) for _a, _b, m, _c in merges],
            "pair_count": np.array([c for *_x, c in merges], dtype=np.int64),
        }
    )


def _greedy_encode_len(word: str, ranks: dict[tuple[str, str], int]) -> int:
    syms = list(word) + [_EOW]
    while len(syms) > 1:
        best_r, best_p = -1, None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best_p is None or r < best_r):
                best_r, best_p = r, p
        if best_p is None:
            break
        a, b = best_p
        new, j = [], 0
        while j < len(syms):
            if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                new.append(a + b)
                j += 2
            else:
                new.append(syms[j])
                j += 1
        syms = new
    return len(syms)


def e_bpe_token_count(sf_dir: str) -> pd.DataFrame:
    hist = _word_hist(sf_dir)
    merges = _naive_bpe(hist["word"].tolist(), hist["count"].tolist())
    ranks = {(a, b): r for r, (a, b, _m, _c) in enumerate(merges)}
    memo: dict[str, int] = {}
    d = _docs(sf_dir)
    n_words, n_tok = [], []
    for t in d["text"]:
        ws = _TOKEN_RE.findall(t.lower())
        n_words.append(len(ws))
        s = 0
        for w in ws:
            m = memo.get(w)
            if m is None:
                m = memo[w] = _greedy_encode_len(w, ranks)
            s += m
        n_tok.append(s)
    return pd.DataFrame(
        {
            "doc_id": d["doc_id"].astype("int64"),
            "n_words": np.array(n_words, dtype=np.int64),
            "bpe_tokens": np.array(n_tok, dtype=np.int64),
        }
    )


def e_unigram_vocab(sf_dir: str) -> pd.DataFrame:
    # trainer is a driver-side pure function in the gate too; the
    # oracle's independence is the sequential histogram (validating
    # the distributed partial-count pass)
    from docinsight_ray.functions.unigram import train_unigram

    vocab = train_unigram(_word_hist(sf_dir))
    return pd.DataFrame(
        {
            "rank": np.arange(len(vocab), dtype=np.int64),
            "piece": [p for p, _ in vocab],
            "logprob_micro": np.array(
                [int(round(lp * 1e6)) for _, lp in vocab], dtype=np.int64
            ),
        }
    )


def e_unigram_token_count(sf_dir: str) -> pd.DataFrame:
    from docinsight_ray.functions.unigram import train_unigram, viterbi

    logp = dict(train_unigram(_word_hist(sf_dir)))
    memo: dict[str, int] = {}
    d = _docs(sf_dir)
    n_words, n_tok = [], []
    for t in d["text"]:
        ws = _TOKEN_RE.findall(t.lower())
        n_words.append(len(ws))
        s = 0
        for w in ws:
            m = memo.get(w)
            if m is None:
                m = memo[w] = len(viterbi(w, logp))
            s += m
        n_tok.append(s)
    return pd.DataFrame(
        {
            "doc_id": d["doc_id"].astype("int64"),
            "n_words": np.array(n_words, dtype=np.int64),
            "unigram_tokens": np.array(n_tok, dtype=np.int64),
        }
    )


# ---- sketches ----------------------------------------------------------------

_HLL_P = 12
_HLL_M = 1 << _HLL_P


def _hll_registers(vocab: set[str]) -> np.ndarray:
    """Independent HLL register computation (python-int bit math)."""
    regs = np.zeros(_HLL_M, dtype=np.uint8)
    for term in vocab:
        h = int.from_bytes(
            hashlib.blake2b(term.encode(), digest_size=8, key=b"hll-seed-0").digest(),
            "little",
        )
        idx = h >> (64 - _HLL_P)
        rest = ((h << _HLL_P) | ((1 << _HLL_P) - 1)) & ((1 << 64) - 1)
        lz = 64 - rest.bit_length()
        rank = min(lz + 1, 64 - _HLL_P + 1)
        if rank > regs[idx]:
            regs[idx] = rank
    return regs


def _hll_est(regs: np.ndarray) -> float:
    m = float(_HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    if e <= 2.5 * m:
        zeros = int(np.count_nonzero(regs == 0))
        if zeros:
            e = m * np.log(m / zeros)
    return float(e)


def _vocab_sets(sf_dir: str) -> dict[str, set[str]]:
    d = _docs(sf_dir, cols=("lang", "text"))
    out: dict[str, set[str]] = {}
    for lang, t in zip(d["lang"], d["text"]):
        out.setdefault(str(lang), set()).update(_TOK2_RE.findall(t.lower()))
    return out


def e_distinct_terms_hll(sf_dir: str) -> pd.DataFrame:
    vocab = set().union(*_vocab_sets(sf_dir).values())
    return pd.DataFrame(
        {
            "n_distinct_est": np.array(
                [int(round(_hll_est(_hll_registers(vocab))))], dtype=np.int64
            ),
            "n_registers": np.array([_HLL_M], dtype=np.int64),
        }
    )


def c_distinct_terms_hll(sf_dir: str, got: pd.DataFrame) -> tuple[bool, str]:
    # n_partials is a batching artifact (block count) — exclude it;
    # the ESTIMATE must be exact (register max-merge is batch-independent)
    return frame_equal(got.drop(columns=["n_partials"]), e_distinct_terms_hll(sf_dir))


def e_distinct_terms_by_lang(sf_dir: str) -> pd.DataFrame:
    vocabs = _vocab_sets(sf_dir)
    langs = sorted(vocabs)
    return pd.DataFrame(
        {
            "lang": langs,
            "n_distinct_est": np.array(
                [int(round(_hll_est(_hll_registers(vocabs[l])))) for l in langs],
                dtype=np.int64,
            ),
        }
    )


def _exact_tf(sf_dir: str) -> dict[str, int]:
    d = _docs(sf_dir, cols=("text",))
    cnt: dict[str, int] = {}
    for t in d["text"]:
        for w in _TOK2_RE.findall(t.lower()):
            cnt[w] = cnt.get(w, 0) + 1
    return cnt


def c_heavy_hitters_cms(sf_dir: str, got: pd.DataFrame) -> tuple[bool, str]:
    """CMS contract vs exact ground truth: one-sided (est ≥ true),
    bounded error (est ≤ true + 3·(e/W)·N), descending est order, and
    the exact-head agreement the gate's pytest asserts (top-3 terms
    match the exact top-3)."""
    true = _exact_tf(sf_dir)
    n_total = sum(true.values())
    eps = math.e / 8192.0
    bound = 3.0 * eps * n_total
    got = got.sort_values("rank").reset_index(drop=True)
    for _, row in got.iterrows():
        t, est = str(row["term"]), int(row["est_tf"])
        tv = true.get(t, 0)
        if est < tv:
            return False, f"CMS underestimated {t!r}: {est} < {tv}"
        if est > tv + bound:
            return False, f"CMS error for {t!r}: {est} > {tv} + {bound:.1f}"
    ests = got["est_tf"].to_numpy()
    if not (np.diff(ests) <= 0).all():
        return False, "est_tf not descending by rank"
    exact_top3 = [
        t for t, _ in sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
    ]
    if list(got["term"].head(3)) != exact_top3:
        return False, f"top-3 {list(got['term'].head(3))} != exact {exact_top3}"
    return True, f"{len(got)} rows within CMS bound; top-3 exact"


_QSK_QS = (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)
_QSK_TOL = 0.02  # rank error — the gate's pytest contract


def _rank_error_ok(values: np.ndarray, q: float, est: float) -> float:
    sv = np.sort(values)
    r = np.searchsorted(sv, est, side="right") / sv.size
    return abs(r - q)


def c_value_quantiles_sketch(sf_dir: str, got: pd.DataFrame) -> tuple[bool, str]:
    vals = pq.read_table(
        os.path.join(sf_dir, "events.parquet"), columns=["value"]
    )["value"].to_numpy().astype(np.float64)
    if sorted(np.round(got["q"].to_numpy(), 9)) != sorted(_QSK_QS):
        return False, f"q column {sorted(got['q'])} != {sorted(_QSK_QS)}"
    worst = 0.0
    for _, row in got.iterrows():
        err = _rank_error_ok(vals, float(row["q"]), float(row["est"]))
        worst = max(worst, err)
        if err > _QSK_TOL:
            return False, f"rank error {err:.4f} > {_QSK_TOL} at q={row['q']}"
    return True, f"{len(got)} rows within {_QSK_TOL} rank error (worst {worst:.4f})"


def c_value_quantiles_by_type(sf_dir: str, got: pd.DataFrame) -> tuple[bool, str]:
    ev = pq.read_table(
        os.path.join(sf_dir, "events.parquet"), columns=["event_type", "value"]
    ).to_pandas()
    worst = 0.0
    for et, g in got.groupby("event_type"):
        vals = ev.loc[ev["event_type"] == et, "value"].to_numpy().astype(np.float64)
        if not vals.size:
            return False, f"unknown event_type {et!r}"
        for _, row in g.iterrows():
            err = _rank_error_ok(vals, float(row["q"]), float(row["est"]))
            worst = max(worst, err)
            if err > _QSK_TOL:
                return False, f"rank error {err:.4f} > {_QSK_TOL} at ({et}, q={row['q']})"
    if set(got["event_type"]) != set(ev["event_type"].astype(str)):
        return False, "event_type sets differ"
    return True, f"{len(got)} rows within {_QSK_TOL} rank error (worst {worst:.4f})"


_TA_SHARDS, _TA_M, _TA_TOPN = 16, 32, 20


def e_terms_agg_approx(sf_dir: str) -> pd.DataFrame:
    """Full independent reimplementation of the sharded-terms-agg merge
    rule (ES doc_count_error_upper_bound)."""
    d = _docs(sf_dir)
    shard_cnt: dict[int, dict[str, int]] = {s: {} for s in range(_TA_SHARDS)}
    for did, t in zip(d["doc_id"].astype(int), d["text"]):
        c = shard_cnt[did % _TA_SHARDS]
        for w in _TOK2_RE.findall(t.lower()):
            c[w] = c.get(w, 0) + 1
    est: dict[str, int] = {}
    kth_of: dict[int, int] = {}
    reported: dict[str, int] = {}
    for s, c in shard_cnt.items():
        top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:_TA_M]
        kth_of[s] = top[-1][1] if len(top) >= _TA_M else 0
        for t, n in top:
            est[t] = est.get(t, 0) + n
            reported[t] = reported.get(t, 0) + kth_of[s]
    total_kth = sum(kth_of.values())
    rows = sorted(est.items(), key=lambda kv: (-kv[1], kv[0]))[:_TA_TOPN]
    return pd.DataFrame(
        {
            "term": [t for t, _ in rows],
            "est_tf": np.array([n for _, n in rows], dtype=np.int64),
            "err_bound": np.array(
                [total_kth - reported[t] for t, _ in rows], dtype=np.int64
            ),
            "rank": np.arange(len(rows), dtype=np.int64),
        }
    )


def e_pca_eigs(sf_dir: str) -> pd.DataFrame:
    _, X, _ = _emb_matrix(sf_dir)
    cov = np.cov(X, rowvar=False, ddof=1)
    w = np.linalg.eigvalsh(cov)[::-1]
    top = w[:5]
    return pd.DataFrame(
        {
            "component": np.arange(top.size, dtype=np.int64),
            "eigenvalue": np.round(top, 9),
            "explained_frac": np.round(top / float(w.sum()), 9),
        }
    )


# ---- vector family ------------------------------------------------------------


def _query_matrix(sf_dir: str, n_queries: int = 5) -> tuple[np.ndarray, np.ndarray]:
    t = _emb(sf_dir)
    sel = t[t["vec_id"] < n_queries].sort_values("vec_id")
    Q = np.stack(sel["embedding"].to_numpy()).astype(np.float64)
    return sel["vec_id"].to_numpy().astype(np.int64), Q


def _kmeans_cosine(Xn: np.ndarray, k: int, iters: int = 4, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    C = Xn[rng.choice(len(Xn), size=k, replace=False)]
    for _ in range(iters):
        assign = np.argmax(Xn @ (C / np.linalg.norm(C, axis=1, keepdims=True)).T, axis=1)
        for j in range(k):
            members = Xn[assign == j]
            if len(members):
                C[j] = members.mean(axis=0)
    return C


def _train_sample(sf_dir: str) -> np.ndarray:
    """Twin of ann.sample_embeddings_ds at ≤65536 rows: the full
    embedding matrix, rows lexsorted (order-canonical)."""
    _, X, _ = _emb_matrix(sf_dir)
    assert len(X) <= 65536, "oracle assumes the no-downsample regime"
    return X[np.lexsort(X.T[::-1])]


def _topk_frame(qids, Qn, vids, Xn, cand_mask_fn, k=10) -> pd.DataFrame:
    out = []
    for qi, qid in enumerate(qids):
        cand = cand_mask_fn(qi) & (vids != qid)
        idx = np.flatnonzero(cand)
        cos6 = np.round(Xn[idx] @ Qn[qi], 6)
        order = np.lexsort((vids[idx], -cos6))[:k]
        for r, o in enumerate(order):
            out.append((int(qid), r, int(vids[idx[o]]), float(cos6[o])))
    return pd.DataFrame(out, columns=["query_id", "rank", "vec_id", "cos"])


def e_knn_cosine_lsh(sf_dir: str, n_tables=8, n_bits=6) -> pd.DataFrame:
    qids, Q = _query_matrix(sf_dir)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    vids, _, Xn = _emb_matrix(sf_dir)
    rng = np.random.default_rng(42)
    planes = rng.standard_normal((n_tables, n_bits, Xn.shape[1]))

    def codes(M, t):
        bits = (M @ planes[t].T) > 0
        return (bits @ (1 << np.arange(n_bits))).astype(np.int64)

    xcodes = np.stack([codes(Xn, t) for t in range(n_tables)])
    qcodes = np.stack([codes(Qn, t) for t in range(n_tables)])

    def mask(qi):
        hit = np.zeros(vids.size, dtype=bool)
        for t in range(n_tables):
            accept = {int(qcodes[t, qi])} | {
                int(qcodes[t, qi]) ^ (1 << f) for f in range(n_bits)
            }
            hit |= np.isin(xcodes[t], list(accept))
        return hit

    return _topk_frame(qids, Qn, vids, Xn, mask)


def e_knn_cosine_ivf(sf_dir: str, n_centroids=8, nprobe=4) -> pd.DataFrame:
    qids, Q = _query_matrix(sf_dir)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    vids, _, Xn = _emb_matrix(sf_dir)
    S = _train_sample(sf_dir)
    Sn = S / np.linalg.norm(S, axis=1, keepdims=True)
    C = _kmeans_cosine(Sn, n_centroids)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    probe = np.argsort(-(Qn @ Cn.T), axis=1)[:, :nprobe]
    assign = np.argmax(Xn @ Cn.T, axis=1)
    return _topk_frame(qids, Qn, vids, Xn, lambda qi: np.isin(assign, probe[qi]))


def e_knn_mmr(sf_dir: str, w=30, k=10, lam=0.7) -> pd.DataFrame:
    qids, Q = _query_matrix(sf_dir)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    vids, _, Xn = _emb_matrix(sf_dir)
    out = []
    for qi, qid in enumerate(qids):
        idx = np.flatnonzero(vids != qid)
        cos6 = np.round(Xn[idx] @ Qn[qi], 6)
        order = np.lexsort((vids[idx], -cos6))[:w]
        cv = vids[idx[order]]
        rel = cos6[order]
        E = Xn[idx[order]]
        sim = E @ E.T
        max_sim = np.zeros(cv.size)
        picked = np.zeros(cv.size, dtype=bool)
        for r in range(min(k, cv.size)):
            mmr6 = np.round(lam * rel - (1.0 - lam) * max_sim, 6)
            mmr6[picked] = -np.inf
            i = int(np.lexsort((cv, -mmr6))[0])
            picked[i] = True
            out.append((int(qid), r, int(cv[i]), float(mmr6[i]), float(rel[i])))
            max_sim = np.maximum(max_sim, sim[:, i])
    return pd.DataFrame(out, columns=["query_id", "rank", "vec_id", "mmr", "cos"])


def e_embedding_near_dup_lsh(
    sf_dir: str, n_tables=12, n_bits=4, max_bucket=2000, tau=0.4
) -> pd.DataFrame:
    vids, _, Xn = _emb_matrix(sf_dir)
    rng = np.random.default_rng(7)
    planes = rng.standard_normal((n_tables, n_bits, Xn.shape[1]))
    cand: set[tuple[int, int]] = set()
    for t in range(n_tables):
        bits = (Xn @ planes[t].T) > 0
        codes = (bits @ (1 << np.arange(n_bits))).astype(np.int64)
        for code in np.unique(codes):
            members = np.sort(vids[codes == code])
            if members.size < 2 or members.size > max_bucket:
                continue
            r, c = np.triu_indices(members.size, k=1)
            cand.update(zip(members[r].tolist(), members[c].tolist()))
    pos = {int(v): i for i, v in enumerate(vids)}
    rows = []
    for a, b in sorted(cand):
        cos = float(Xn[pos[a]] @ Xn[pos[b]])
        if cos >= tau:
            rows.append((a, b, round(cos, 6)))
    return pd.DataFrame(rows, columns=["a_id", "b_id", "cos"])


def e_semdedup(sf_dir: str, n_clusters=8, eps=0.4) -> pd.DataFrame:
    vids, _, Xn = _emb_matrix(sf_dir)
    S = _train_sample(sf_dir)
    Sn = S / np.linalg.norm(S, axis=1, keepdims=True)
    C = _kmeans_cosine(Sn, n_clusters)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    assign = np.argmax(Xn @ Cn.T, axis=1)
    rows = []
    for cl in np.unique(assign):
        members = np.flatnonzero(assign == cl)  # vids sorted → vec_id order
        kept = np.ones(members.size, dtype=bool)
        if 1 < members.size <= 4096:
            S2 = Xn[members] @ Xn[members].T
            for i in range(1, members.size):
                prior = kept[:i]
                if prior.any() and (S2[i, :i][prior] >= eps).any():
                    kept[i] = False
        for m, kp in zip(members, kept):
            rows.append((int(vids[m]), int(cl), int(kp)))
    return pd.DataFrame(rows, columns=["vec_id", "cluster", "kept"])


def _recall_check(
    sf_dir: str, got: pd.DataFrame, floor: float, k: int = 10
) -> tuple[bool, str]:
    """Quantized-candidate contract: every emitted score is the EXACT
    round-6 cosine (quantization may only change WHICH candidates
    survive, never their scores), ranks are dense per query in (cos
    desc, vec_id asc) order, and mean recall@k vs the exact brute
    force clears the gate's pytest floor."""
    qids, Q = _query_matrix(sf_dir)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    vids, _, Xn = _emb_matrix(sf_dir)
    pos = {int(v): i for i, v in enumerate(vids)}
    exact = _topk_frame(qids, Qn, vids, Xn, lambda qi: np.ones(vids.size, dtype=bool), k=k)
    recalls = []
    for qi, qid in enumerate(qids):
        g = got[got["query_id"] == qid].sort_values("rank")
        if g.empty:
            return False, f"query {qid}: no rows"
        want_cos = np.round(
            Xn[np.array([pos[int(v)] for v in g["vec_id"]])] @ Qn[qi], 6
        )
        if not np.array_equal(np.round(g["cos"].to_numpy(), 6), want_cos):
            return False, f"query {qid}: emitted cos is not the exact rescore"
        c = g["cos"].to_numpy()
        v = g["vec_id"].to_numpy()
        if not all(
            (c[i] > c[i + 1]) or (c[i] == c[i + 1] and v[i] < v[i + 1])
            for i in range(len(g) - 1)
        ):
            return False, f"query {qid}: rank order violates (cos desc, vec_id asc)"
        truth = set(exact.loc[exact["query_id"] == qid, "vec_id"])
        recalls.append(len(truth & set(v)) / max(1, len(truth)))
    mean_recall = float(np.mean(recalls))
    if mean_recall < floor:
        return False, f"mean recall {mean_recall:.3f} < floor {floor}"
    return True, f"scores exact; mean recall {mean_recall:.3f} >= {floor}"


def c_knn_cosine_sq8(sf_dir: str, got: pd.DataFrame) -> tuple[bool, str]:
    return _recall_check(sf_dir, got, floor=0.8)


def c_knn_cosine_pq(sf_dir: str, got: pd.DataFrame) -> tuple[bool, str]:
    return _recall_check(sf_dir, got, floor=0.5)


def e_multimodal_real(sf_dir: str) -> pd.DataFrame:
    """Closed-form ground truth from the synthesis rules alone:
    image (doc_id%3==0) → 16×16 after resize = 256 px; audio (==1) →
    400 samples; video (==2) → 2 + doc_id%3 = 4 frames."""
    d = _docs(sf_dir, cols=("doc_id",))
    ids = d["doc_id"].astype(int).to_numpy()
    modality = np.array(["image", "audio", "video"], dtype=object)[ids % 3]
    n_units = np.select([ids % 3 == 0, ids % 3 == 1], [256, 400], default=4)
    return pd.DataFrame(
        {
            "media_id": ids.astype(np.int64),
            "modality": modality,
            "n_units": n_units.astype(np.int64),
        }
    )


PY_ORACLES: dict[str, Callable[[str, pd.DataFrame], tuple[bool, str]]] = {
    # exact frame equality
    "simhash64": _exact(e_simhash64),
    "simhash_near_dup": _exact(e_simhash_near_dup),
    "doc_fingerprint": _exact(e_doc_fingerprint),
    "bpe_vocab": _exact(e_bpe_vocab),
    "bpe_token_count": _exact(e_bpe_token_count),
    "unigram_vocab": _exact(e_unigram_vocab),
    "unigram_token_count": _exact(e_unigram_token_count),
    "distinct_terms_hll": c_distinct_terms_hll,
    "distinct_terms_by_lang": _exact(e_distinct_terms_by_lang),
    "terms_agg_approx": _exact(e_terms_agg_approx),
    "pca_eigs": _exact(e_pca_eigs, float_tol=2e-9),
    "knn_cosine_lsh": _exact(e_knn_cosine_lsh),
    "knn_cosine_ivf": _exact(e_knn_cosine_ivf),
    "knn_mmr": _exact(e_knn_mmr),
    "embedding_near_dup_lsh": _exact(e_embedding_near_dup_lsh),
    "semdedup": _exact(e_semdedup),
    "multimodal_real": _exact(e_multimodal_real),
    # quantitative contracts vs exact ground truth (outputs whose exact
    # membership legitimately depends on batch boundaries)
    "heavy_hitters_cms": c_heavy_hitters_cms,
    "value_quantiles_sketch": c_value_quantiles_sketch,
    "value_quantiles_by_type": c_value_quantiles_by_type,
    "knn_cosine_sq8": c_knn_cosine_sq8,
    "knn_cosine_pq": c_knn_cosine_pq,
}
# not covered: reference_topk (ignores sf_dir; bitwise rank-identity +
# graded-relevance floors live in tests/test_reference_corpus.py and
# CONFORMANCE.json)
