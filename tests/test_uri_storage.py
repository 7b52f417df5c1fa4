"""Object-store plumbing: the whole index lifecycle on pyarrow.fs URIs.

Exercised via file:// (the container has no real object store): build,
query, resume, sharded build + serving, and incremental windows all
run with index roots given as URIs — proving no code path depends on
POSIX-only operations (state/fsio.py handles both)."""

import numpy as np
import pytest

from docinsight_ray.config import EngineConfig
from docinsight_ray.fixtures import gen_corpus, gen_queries, queries_table
from docinsight_ray.oracle import OracleIndex
from docinsight_ray.scorer import BM25Scorer

CFG = EngineConfig(num_buckets=8)


def test_uri_index_build_query_resume(ray_session, tmp_path):
    import ray.data

    from docinsight_ray.build import build_index

    corpus = gen_corpus(200, seed=91)
    uri = f"file://{tmp_path}/uri_index"
    res = build_index(ray.data.from_arrow(corpus), uri, CFG, fingerprint="uri")
    oracle = OracleIndex(corpus, CFG)
    assert res.n_docs == oracle.n_docs
    sc = BM25Scorer(uri, CFG, mode="maxscore")
    for qid, text, k in gen_queries(corpus, n_keyword=6, seed=91):
        od, osc = oracle.score(text, k)
        d, s = sc.score_maxscore(text, k)
        np.testing.assert_array_equal(d, od)
        np.testing.assert_array_equal(s, osc)
    # resume is a no-op through the URI manifest path
    import glob
    import os

    parts = sorted(glob.glob(str(tmp_path / "uri_index" / "parts" / "**" / "*.parquet"),
                             recursive=True))
    before = {p: os.path.getmtime(p) for p in parts}
    build_index(ray.data.from_arrow(corpus), uri, CFG, fingerprint="uri")
    for p, mt in before.items():
        assert os.path.getmtime(p) == mt, f"{p} rewritten on resume"


def test_uri_sharded_and_windows(ray_session, tmp_path):
    import ray.data

    from docinsight_ray.pipelines.incremental import append_window, query_windows
    from docinsight_ray.pipelines.sharded import build_sharded_index, query_sharded

    corpus = gen_corpus(150, seed=93, with_cases=False)
    queries = gen_queries(corpus, n_keyword=5, seed=93)
    qds_tbl = queries_table(queries)
    oracle = OracleIndex(corpus, CFG)

    sh_uri = f"file://{tmp_path}/sh"
    build_sharded_index(ray.data.from_arrow(corpus), sh_uri, 2, CFG, fingerprint="u")
    out = query_sharded(
        ray.data.from_arrow(qds_tbl), sh_uri, 2, CFG, mode="taat"
    ).to_pandas()
    for qid, text, k in queries:
        od, osc = oracle.score(text, k)
        sub = out[out.query_id == qid].sort_values("rank")
        np.testing.assert_array_equal(sub.doc_id.to_numpy(dtype=np.uint64), od)
        np.testing.assert_array_equal(sub.score.to_numpy(), osc)

    win_uri = f"file://{tmp_path}/win"
    n = corpus.num_rows
    append_window(ray.data.from_arrow(corpus.slice(0, n // 2)), win_uri, "000", CFG)
    append_window(ray.data.from_arrow(corpus.slice(n // 2)), win_uri, "001", CFG)
    wout = query_windows(ray.data.from_arrow(qds_tbl), win_uri, CFG, mode="taat").to_pandas()
    for qid, text, k in queries:
        od, osc = oracle.score(text, k)
        sub = wout[wout.query_id == qid].sort_values("rank")
        np.testing.assert_array_equal(sub.doc_id.to_numpy(dtype=np.uint64), od)
        np.testing.assert_array_equal(sub.score.to_numpy(), osc)


def test_uri_compaction(ray_session, tmp_path):
    """Window compaction through a file:// root: decode-restage-rebuild
    and the marker cutover work on pyarrow.fs URIs, results unchanged."""
    import ray.data

    from docinsight_ray.pipelines.incremental import (
        append_window,
        compact_windows,
        query_windows,
    )

    corpus = gen_corpus(120, seed=97, with_cases=False)
    root = f"file://{tmp_path}/cwin"
    append_window(ray.data.from_arrow(corpus.slice(0, 60)), root, "a", CFG)
    append_window(ray.data.from_arrow(corpus.slice(60)), root, "b", CFG)
    queries = gen_queries(corpus, n_keyword=4, seed=97)
    qds = ray.data.from_arrow(queries_table(queries))
    before = query_windows(qds, root, CFG).to_pandas().sort_values(
        ["query_id", "rank"]).reset_index(drop=True)
    compact_windows(root, cfg=CFG)
    after = query_windows(qds, root, CFG).to_pandas().sort_values(
        ["query_id", "rank"]).reset_index(drop=True)
    assert before.equals(after)
    import os

    wins = [n for n in os.listdir(str(tmp_path / "cwin")) if n.startswith("window=")]
    assert len(wins) == 1 and wins[0].startswith("window=compact-")
