"""Reference-corpus conformance: the north rule's query set, for real.

The north rule pins "rank-identical top-k on the reference query set".
The reference ships that query set as
/root/reference/data/sourcecode/case-0{1..7}/ — 467 Java files per
IR-Plag layout (7 cases × one ``original`` + L1-L6 plagiarized
variants + non-plagiarized distractors) — but never wires it to tests.
This module indexes the REAL corpus through the full engine (SPIMI →
merge shuffle → compressed postings → actor-pool scorers) and runs
each case's original as a query.

Two contracts, both asserted by tests/test_reference_corpus.py and
recorded in the CONFORMANCE.json artifact (scripts/run_conformance.py):

- rank-identity: engine top-k (docs AND bitwise scores) equals the
  exhaustive OracleIndex on every case query, in all three serving
  modes;
- plagiarism conformance (the reference's intended behavior,
  /root/reference/data/sourcecode + README.md evaluation framing):
  per case, the top hit is from the SAME case, the original itself
  ranks in the top-3 (BM25 may rank an L1/L2 near-copy above the
  original), and ≥8 of the top-10 are same-case plagiarized variants.

Measured on the real data (2026-08-17): 467 files → 453 docs after
exact dedup (14 L1 byte-copies), own_rank ≤ 2 and same-case ≥ 9/10 on
all 7 cases.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..build import build_index
from ..config import EngineConfig
from ..ids import doc_id_from_key
from ..scorer import query_index
from ..sources.sourcecode import (
    REFERENCE_SOURCECODE_DIR,
    case_originals,
    load_sourcecode_corpus,
)

TOPK = 10

_CONF_CACHE: dict[str, tuple[str, pa.Table]] = {}


def conformance_config() -> EngineConfig:
    # the flagship code-corpus configuration: code tokenizer with
    # identifier splitting, hash doc ids, exact dedup on
    return EngineConfig(num_buckets=8)


def ensure_reference_index(root: str = REFERENCE_SOURCECODE_DIR) -> tuple[str, pa.Table]:
    """Build (or resume) the index over the reference corpus; returns
    (index_dir, corpus table)."""
    cfg = conformance_config()
    key = f"{root}:{cfg.config_hash()}"
    if key in _CONF_CACHE:
        return _CONF_CACHE[key]
    corpus = load_sourcecode_corpus(root)
    index_dir = os.path.join("/tmp", "docinsight_ray_idx", f"refconf-{cfg.config_hash()}")
    build_index(ray.data.from_arrow(corpus), index_dir, cfg, fingerprint=f"refconf:{root}")
    _CONF_CACHE[key] = (index_dir, corpus)
    return index_dir, corpus


def reference_query_table(corpus: pa.Table, k: int = TOPK) -> tuple[pa.Table, list[str]]:
    """(query table for the actor pool, case id per query_id)."""
    origs = case_originals(corpus)
    cases = [r for r, _, _ in origs]
    qtbl = pa.table(
        {
            "query_id": pa.array(range(len(origs)), type=pa.int64()),
            "text": pa.array([c for _, _, c in origs], type=pa.string()),
            "k": pa.array([k] * len(origs), type=pa.uint32()),
        }
    )
    return qtbl, cases


def q_reference_topk(sf_dir: str = "", mode: str = "maxscore") -> pa.Table:
    """The reference query set through the full serving path: 7 case
    originals → actor-pool scorers → top-10, hydrated with case/path
    metadata. ``sf_dir`` is ignored — this entry runs on the reference
    corpus itself (no SQL oracle; rank-identity + conformance are
    asserted by tests/test_reference_corpus.py)."""
    index_dir, corpus = ensure_reference_index()
    qtbl, cases = reference_query_table(corpus)
    cfg = conformance_config()
    res = (
        query_index(ray.data.from_arrow(qtbl), index_dir, cfg, mode=mode, concurrency=2)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    # hydrate doc metadata (tiny result; broadcast-free driver join)
    doc_ids = doc_id_from_key(
        corpus["repo"].to_pylist(), corpus["path"].to_pylist(), corpus["commit"].to_pylist()
    )
    meta = {
        int(d): (r, p)
        for d, r, p in zip(doc_ids, corpus["repo"].to_pylist(), corpus["path"].to_pylist())
    }
    hit_repo = [meta[int(d)][0] for d in res["doc_id"]]
    hit_path = [meta[int(d)][1] for d in res["doc_id"]]
    return pa.table(
        {
            "case_id": pa.array([cases[q] for q in res["query_id"]], type=pa.string()),
            "rank": pa.array(res["rank"].to_numpy().astype(np.int64), type=pa.int64()),
            "hit_repo": pa.array(hit_repo, type=pa.string()),
            "hit_path": pa.array(hit_path, type=pa.string()),
            "score": pa.array(np.round(res["score"].to_numpy(), 6), type=pa.float64()),
        }
    )


# IR-Plag obfuscation levels as GRADED relevance for a case query:
# the original itself is a perfect hit, L1 (verbatim copy) is the
# easiest plagiarism grade, L6 (heaviest obfuscation) the hardest;
# everything outside the case (and its non-plagiarized distractors)
# is irrelevant.
_LEVEL_GRADE = {"original": 7, "L1": 6, "L2": 5, "L3": 4, "L4": 3, "L5": 2, "L6": 1}


def _doc_grade(case_id: str, repo: str, path: str) -> int:
    if repo != case_id:
        return 0
    if path.startswith("original"):
        return _LEVEL_GRADE["original"]
    if path.startswith("plagiarized/"):
        return _LEVEL_GRADE.get(path.split("/", 2)[1], 0)
    return 0


def _dcg(grades: np.ndarray) -> float:
    return float(np.sum((2.0 ** grades - 1.0) / np.log2(np.arange(2, grades.size + 2))))


def _ap_at_k(rel_mask: np.ndarray, n_rel_total: int, k: int) -> float:
    """Binary average precision at k (TREC denominator min(R, k))."""
    if n_rel_total == 0:
        return 0.0
    pos = np.nonzero(rel_mask)[0]
    hits = np.arange(1, pos.size + 1, dtype=np.float64)
    return float(np.sum(hits / (pos + 1)) / min(n_rel_total, k))


def conformance_quality(k: int = 50) -> dict:
    """Graded retrieval-quality metrics on the real reference corpus —
    the quantitative complement to ``conformance_report``'s boolean
    checks (VERDICT r3 #7): per-case nDCG@10 with L1–L6 graded
    relevance, binary MAP@k over all same-case plagiarized docs, and
    per-level recall@k / AP@k so a rank-quality regression on hard
    levels (L5/L6) is visible even while the boolean contract holds.
    Labels and ideal pools come from the DEDUPED docs registry (dup
    losers can never appear in results)."""
    import pyarrow.parquet as pq

    index_dir, corpus = ensure_reference_index()
    cfg = conformance_config()
    qtbl, cases = reference_query_table(corpus, k=k)
    res = (
        query_index(ray.data.from_arrow(qtbl), index_dir, cfg, mode="maxscore", concurrency=2)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )
    docs = pq.read_table(
        os.path.join(index_dir, "docs"), columns=["doc_id", "repo", "path"]
    ).to_pandas()
    meta = {int(d): (r, p) for d, r, p in zip(docs.doc_id, docs.repo, docs.path)}

    per_case: dict[str, dict] = {}
    for qi, case in enumerate(cases):
        g = res[res.query_id == qi].sort_values("rank")
        grades = np.array(
            [_doc_grade(case, *meta[int(d)]) for d in g.doc_id], dtype=np.float64
        )
        pool = np.array(
            [_doc_grade(case, r, p) for r, p in zip(docs.repo, docs.path)],
            dtype=np.float64,
        )
        ideal10 = np.sort(pool)[::-1][:10]
        ndcg10 = _dcg(grades[:10]) / _dcg(ideal10) if _dcg(ideal10) > 0 else 0.0
        ap = _ap_at_k(grades > 0, int((pool > 0).sum()), k)
        levels: dict[str, dict] = {}
        for lvl, grade in _LEVEL_GRADE.items():
            if lvl == "original":
                continue
            n_l = int((pool == grade).sum())
            if n_l == 0:
                continue
            lmask = grades == grade
            levels[lvl] = {
                "n_rel": n_l,
                "recall_at_k": round(float(lmask.sum()) / n_l, 6),
                "ap_at_k": round(_ap_at_k(lmask, n_l, k), 6),
            }
        per_case[case] = {
            "ndcg_at_10": round(ndcg10, 6),
            "ap_at_k": round(ap, 6),
            "levels": levels,
        }

    lvl_names = [l for l in _LEVEL_GRADE if l != "original"]
    by_level = {
        lvl: {
            "map_at_k": round(
                float(np.mean([c["levels"][lvl]["ap_at_k"] for c in per_case.values()
                               if lvl in c["levels"]])), 6),
            "mean_recall_at_k": round(
                float(np.mean([c["levels"][lvl]["recall_at_k"] for c in per_case.values()
                               if lvl in c["levels"]])), 6),
        }
        for lvl in lvl_names
        if any(lvl in c["levels"] for c in per_case.values())
    }
    return {
        "k": k,
        "mean_ndcg_at_10": round(float(np.mean([c["ndcg_at_10"] for c in per_case.values()])), 6),
        "map_at_k": round(float(np.mean([c["ap_at_k"] for c in per_case.values()])), 6),
        "by_level": by_level,
        "per_case": per_case,
    }


def conformance_report(top: pa.Table) -> dict:
    """Evaluate the plagiarism-conformance contract on a q_reference_topk
    result; returns the CONFORMANCE.json payload."""
    cases: dict[str, dict] = {}
    df = top.to_pandas()
    ok_all = True
    for case_id, g in df.groupby("case_id"):
        g = g.sort_values("rank")
        hits = list(zip(g["hit_repo"], g["hit_path"]))
        own_rank = next(
            (i for i, (r, p) in enumerate(hits) if r == case_id and p.startswith("original")),
            None,
        )
        same_case = sum(
            1 for r, p in hits if r == case_id and not p.startswith("non-plagiarized")
        )
        checks = {
            "top_hit_same_case": bool(hits and hits[0][0] == case_id),
            "original_in_top3": own_rank is not None and own_rank < 3,
            "same_case_ge8_of_top10": same_case >= 8,
        }
        ok = all(checks.values())
        ok_all &= ok
        cases[str(case_id)] = {
            "own_rank": own_rank,
            "same_case_in_top10": int(same_case),
            "checks": checks,
            "ok": ok,
            "top": [
                {"rank": int(rk), "repo": r, "path": p, "score": float(s)}
                for rk, r, p, s in zip(g["rank"], g["hit_repo"], g["hit_path"], g["score"])
            ],
        }
    return {"corpus": REFERENCE_SOURCECODE_DIR, "n_cases": len(cases), "ok": ok_all, "cases": cases}
