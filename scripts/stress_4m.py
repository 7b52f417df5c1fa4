"""4M-doc stress rung: extend the BASELINE.md linearity ladder past
2×10^6. Builds the cached 4M bench corpus single-index AND sharded
(S=4), then spot-checks MaxScore/BMW serving p50. Prints one JSON line.

Run: python scripts/stress_4m.py   (expects the corpus cache from
bench.py's gen_corpus(4_000_000, seed=42); generates it if missing —
~4.2 GB under /tmp/docinsight_bench.)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("STRESS_DOCS", "4000000"))


def main() -> int:
    import numpy as np
    import ray
    import ray.data

    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, logging_level="ERROR")
    ray.data.DataContext.get_current().enable_progress_bars = False

    from bench import bench_corpus_path
    from docinsight_ray import EngineConfig
    from docinsight_ray.build import build_index
    from docinsight_ray.fixtures import gen_corpus, gen_queries, queries_table
    from docinsight_ray.pipelines.sharded import build_sharded_index

    out: dict = {"n_docs": N_DOCS}
    corpus = bench_corpus_path(N_DOCS)
    cfg = EngineConfig()

    idx = f"/tmp/docinsight_stress/idx-{N_DOCS}"
    t0 = time.monotonic()
    res = build_index(ray.data.read_parquet(corpus), idx, cfg,
                      fingerprint=f"stress-{N_DOCS}")
    out["single_build_sec"] = round(time.monotonic() - t0, 1)
    out["docs_per_sec"] = round(res.n_docs / out["single_build_sec"], 1)
    out["n_indexed"] = res.n_docs

    # serving spot check: 20 queries drawn from a small corpus slice
    qtbl = queries_table(gen_queries(gen_corpus(2000, seed=42), 20, seed=7))
    from docinsight_ray.scorer import BM25Scorer

    for mode, fn_name in (("maxscore", "score_maxscore"), ("bmw", "score_bmw")):
        sc = BM25Scorer(idx, cfg, mode=mode)
        lat = []
        for q in qtbl["text"].to_pylist():
            t1 = time.monotonic()
            getattr(sc, fn_name)(q, 10)
            lat.append(time.monotonic() - t1)
        out[f"{mode}_p50_ms"] = round(float(np.median(lat)) * 1000, 1)
        del sc

    sh = f"/tmp/docinsight_stress/sharded-{N_DOCS}"
    t0 = time.monotonic()
    build_sharded_index(ray.data.read_parquet(corpus), sh, 4, cfg,
                        fingerprint=f"stress-sh-{N_DOCS}")
    out["sharded4_build_sec"] = round(time.monotonic() - t0, 1)

    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
