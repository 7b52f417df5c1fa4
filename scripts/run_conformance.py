"""Produce CONFORMANCE.json: the reference-query-set gate artifact.

Indexes the real reference corpus (/root/reference/data/sourcecode,
467 Java files) through the full engine, runs the 7 case originals as
queries via the actor-pool serving path, checks rank-identity vs the
exhaustive oracle in all three modes, evaluates the plagiarism
conformance contract, and writes everything to CONFORMANCE.json at the
repo root.

Run: python scripts/run_conformance.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from docinsight_ray.oracle import OracleIndex
    from docinsight_ray.pipelines.conformance import (
        conformance_config,
        conformance_quality,
        conformance_report,
        ensure_reference_index,
        q_reference_topk,
    )
    from docinsight_ray.scorer import BM25Scorer
    from docinsight_ray.sources.sourcecode import case_originals

    index_dir, corpus = ensure_reference_index()
    cfg = conformance_config()
    oracle = OracleIndex(corpus, cfg)

    rank_identity = {}
    scorers = {m: BM25Scorer(index_dir, cfg, mode=m) for m in ("taat", "maxscore", "bmw")}
    for case, _path, content in case_originals(corpus):
        od, osc = oracle.score(content, 10)
        per_mode = {}
        for m, sc in scorers.items():
            fn = {"taat": sc.score_taat, "maxscore": sc.score_maxscore, "bmw": sc.score_bmw}[m]
            d, s = fn(content, 10)
            per_mode[m] = bool(np.array_equal(d, od) and np.array_equal(s, osc))
        rank_identity[case] = per_mode

    report = conformance_report(q_reference_topk())
    report["rank_identity_vs_oracle"] = rank_identity
    report["rank_identity_ok"] = all(all(v.values()) for v in rank_identity.values())
    report["n_files"] = int(corpus.num_rows)
    # graded rank-quality metrics (nDCG@10 with L1-L6 graded relevance,
    # MAP@50, per-level recall/AP) — catches rank-quality regressions
    # the boolean checks above can't; floors are asserted in
    # tests/test_reference_corpus.py
    report["retrieval_quality"] = conformance_quality()

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "CONFORMANCE.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
    print(f"wrote {out}: ok={report['ok']} rank_identity_ok={report['rank_identity_ok']}")
    ray.shutdown()
    return 0 if (report["ok"] and report["rank_identity_ok"]) else 1


if __name__ == "__main__":
    raise SystemExit(main())
