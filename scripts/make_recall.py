"""Produce RECALL.json: quantitative evidence for the approximate
(no-oracle) similarity ops.

The driver's correctness gate records `knn_cosine_lsh`,
`knn_cosine_ivf` and `embedding_near_dup_lsh` as rows-only entries
(approximate results have no SQL oracle). This script measures each
against its EXACT counterpart on the same input and records:

- `knn_cosine_lsh` / `knn_cosine_ivf`: mean top-10 recall per query
  vs `knn_cosine` (brute-force cosine);
- `embedding_near_dup_lsh`: pair recall and precision vs
  `embedding_near_dup` (exact all-pairs) — precision must be 1.0 by
  construction (candidates are exactly verified).

Run: python scripts/make_recall.py  [sf_dir]  (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    from docinsight_ray.functions.knn import (
        q_embedding_near_dup,
        q_embedding_near_dup_lsh,
        q_knn_cosine,
        q_knn_cosine_ivf,
        q_knn_cosine_lsh,
        q_knn_cosine_pq,
        q_knn_cosine_sq8,
    )

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out: dict = {"sf_dir": sf}

    exact = q_knn_cosine(sf).to_pandas()
    for name, fn in [
        ("knn_cosine_lsh", q_knn_cosine_lsh),
        ("knn_cosine_ivf", q_knn_cosine_ivf),
        ("knn_cosine_sq8", q_knn_cosine_sq8),
        ("knn_cosine_pq", q_knn_cosine_pq),
    ]:
        approx = fn(sf).to_pandas()
        recalls = []
        for qid, e in exact.groupby("query_id"):
            a = approx[approx.query_id == qid]
            es, as_ = set(e.vec_id.astype(int)), set(a.vec_id.astype(int))
            recalls.append(len(es & as_) / len(es))
        out[name] = {
            "metric": "mean top-k recall vs exact knn_cosine",
            "k": 10,
            "n_queries": len(recalls),
            "recall": round(sum(recalls) / len(recalls), 4),
            "per_query": [round(r, 4) for r in recalls],
        }
        if name == "knn_cosine_sq8":
            out[name]["note"] = (
                "uint8 scalar quantization selects candidates (3k per "
                "query per batch); survivors are rescored with exact "
                "float64 cosine, so overlap scores equal brute force"
            )
        if name == "knn_cosine_ivf":
            # context for the number: the synthetic embeddings are
            # isotropic (no cluster structure), the IVF worst case —
            # recall is then bounded by the scanned bucket fraction.
            out[name]["scan_fraction"] = 0.5  # nprobe=4 of n_centroids=8
            out[name]["note"] = (
                "input embeddings are isotropic (intra-label cosine ~0); "
                "IVF recall tracks the scanned fraction on such data and "
                "exceeds it only on clustered corpora"
            )
        if name == "knn_cosine_pq":
            out[name]["note"] = (
                "8x5-bit product-quantization codes (51x compression) "
                "select candidates by ADC table lookups (5k per query "
                "per batch); survivors rescored with exact float64 "
                "cosine. Isotropic inputs are PQ's worst case (no "
                "subspace structure to exploit)"
            )

    truth = q_embedding_near_dup(sf).to_pandas()
    approx = q_embedding_near_dup_lsh(sf).to_pandas()
    tset = set(zip(truth.a_id.astype(int), truth.b_id.astype(int)))
    aset = set(zip(approx.a_id.astype(int), approx.b_id.astype(int)))
    out["embedding_near_dup_lsh"] = {
        "metric": "pair recall/precision vs exact embedding_near_dup",
        "true_pairs": len(tset),
        "found_pairs": len(aset),
        "recall": round(len(tset & aset) / len(tset), 4) if tset else None,
        "precision": round(len(tset & aset) / len(aset), 4) if aset else None,
    }

    # semdedup: fraction of exact near-dup pairs RESOLVED (at least one
    # member dropped) — the paper's deduplication effectiveness; the
    # loss mode is a dup pair split across k-means clusters.
    from docinsight_ray.functions.knn import q_semdedup

    sd = q_semdedup(sf).to_pandas()
    kept = dict(zip(sd.vec_id.astype(int), sd.kept.astype(int)))
    resolved = sum(1 for a, b in tset if kept[a] == 0 or kept[b] == 0)
    out["semdedup"] = {
        "metric": "exact near-dup pairs resolved (one member dropped)",
        "true_pairs": len(tset),
        "resolved_pairs": resolved,
        "resolved_frac": round(resolved / len(tset), 4) if tset else None,
        "n_dropped": int((sd.kept == 0).sum()),
        "n_vectors": len(sd),
        "note": (
            "isotropic test embeddings + the low COS_DUP_T=0.4 threshold "
            "are SemDeDup's worst case: moderate-similarity pairs often "
            "straddle k-means cluster boundaries; at the paper's "
            "eps≈0.95 regime near-identical vectors co-cluster and the "
            "resolved fraction approaches 1 (n_clusters=1 equals exact "
            "greedy dedup — proven in tests/test_classify.py)"
        ),
    }

    # persisted IVF index, PRUNED serving (nprobe=4 of 8): the gate
    # (ann_ivf_topk) proves the exhaustive path against the full SQL
    # oracle; this records what the pruned configuration costs.
    from docinsight_ray.functions.knn import KNN_K, N_QUERIES
    from docinsight_ray.pipelines.ann import AnnIndex, _ensure_ann_index

    import numpy as np
    import pyarrow.parquet as pq

    root = _ensure_ann_index(sf, 8)
    t = pq.read_table(os.path.join(sf, "embeddings.parquet"))
    vids = t["vec_id"].to_numpy()
    mask = vids < N_QUERIES
    Q = np.stack(t["embedding"].to_numpy(zero_copy_only=False)[mask])
    idx = AnnIndex(root, nprobe=4)
    pruned = idx.topk(vids[mask].astype(np.int64), Q, KNN_K).to_pandas()
    recalls = []
    for qid, e in exact.groupby("query_id"):
        a = pruned[pruned.query_id == qid]
        es, as_ = set(e.vec_id.astype(int)), set(a.vec_id.astype(int))
        recalls.append(len(es & as_) / len(es))
    out["ann_ivf_pruned"] = {
        "metric": "mean top-k recall vs exact knn_cosine (persisted index, nprobe=4/8)",
        "k": KNN_K,
        "n_queries": len(recalls),
        "recall": round(sum(recalls) / len(recalls), 4),
        "per_query": [round(r, 4) for r in recalls],
        "lists_loaded": int(idx.lists_loaded),
        "scan_fraction": 0.5,
        "note": (
            "same isotropic-input caveat as knn_cosine_ivf; the gate "
            "entry ann_ivf_topk serves nprobe=n_centroids, which is "
            "exact and carries the full SQL oracle"
        ),
    }

    # persisted IVF-PQ, PRUNED serving (nprobe=4 of 8, fetch_k=5k):
    # the gate (ann_ivfpq_topk) proves the exhaustive+full-fetch path
    # against the full SQL oracle; this records the pruned config.
    from docinsight_ray.pipelines.ann import _ensure_ivfpq_index, ivfpq_search

    pq_root = _ensure_ivfpq_index(sf, 8)
    pruned = ivfpq_search(sf, pq_root, nprobe=4, fetch_k=5 * KNN_K).to_pandas()
    recalls = []
    for qid, e in exact.groupby("query_id"):
        a = pruned[pruned.query_id == qid]
        es, as_ = set(e.vec_id.astype(int)), set(a.vec_id.astype(int))
        recalls.append(len(es & as_) / len(es))
    out["ann_ivfpq_pruned"] = {
        "metric": (
            "mean top-k recall vs exact knn_cosine (persisted IVF-PQ, "
            "nprobe=4/8, fetch_k=50, exact rescore)"
        ),
        "k": KNN_K,
        "n_queries": len(recalls),
        "recall": round(sum(recalls) / len(recalls), 4),
        "per_query": [round(r, 4) for r in recalls],
        "scan_fraction": 0.5,
        "note": (
            "code lists store 8 B/vector (8x5-bit PQ) instead of 256 B "
            "floats; recall compounds the IVF scan fraction with PQ "
            "candidate error — both worst-case on isotropic inputs"
        ),
    }

    # HLL cardinality sketches (global + per-lang): relative error vs
    # the exact DuckDB distinct counts — the rows-only gates'
    # quantitative evidence (4096 registers → ~1.6 % standard error)
    import duckdb

    from docinsight_ray.functions.sketches import (
        q_distinct_terms_by_lang,
        q_distinct_terms_hll,
    )

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    tok = "list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'), t -> length(t) >= 2)"
    exact_g = con.sql(
        f"SELECT count(DISTINCT term) FROM (SELECT unnest({tok}) AS term FROM documents)"
    ).fetchone()[0]
    est_g = int(q_distinct_terms_hll(sf).to_pandas()["n_distinct_est"].iloc[0])
    out["distinct_terms_hll"] = {
        "metric": "relative error vs exact distinct-term count",
        "exact": int(exact_g), "estimate": est_g,
        "rel_error": round(abs(est_g - exact_g) / exact_g, 4),
    }
    exact_l = dict(con.sql(
        f"SELECT lang, count(DISTINCT term) FROM "
        f"(SELECT lang, unnest({tok}) AS term FROM documents) GROUP BY lang"
    ).fetchall())
    bylang = q_distinct_terms_by_lang(sf).to_pandas()
    errs = {
        str(lang): round(abs(int(est) - exact_l[lang]) / exact_l[lang], 4)
        for lang, est in zip(bylang["lang"], bylang["n_distinct_est"])
    }
    out["distinct_terms_by_lang"] = {
        "metric": "per-lang relative error vs exact distinct-term counts",
        "rel_error_by_lang": errs,
        "max_rel_error": max(errs.values()),
    }

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "RECALL.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(json.dumps(out, indent=1, sort_keys=True))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
